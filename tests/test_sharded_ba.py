"""Distributed BA on the 8-virtual-device CPU mesh: must match the
single-device solver bit-for-bit-ish and respect gauge fixing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops import ba
from mast3r_slam_tpu.parallel.mesh import make_mesh
from mast3r_slam_tpu.parallel.sharded_ba import sharded_gauss_newton

from test_ba import identity_scene, perturb, pose_err, K, P, W, H


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_sharded_matches_single_device():
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=10, chunk_points=128)

    T_single, *_ = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "ray", (W, H),
        cfg,
    )

    # pad edges to a multiple of 8 for the mesh
    E = ii.shape[0]
    n_dev = len(jax.devices())
    E_pad = ((E + n_dev - 1) // n_dev) * n_dev
    pad = E_pad - E

    def padE(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    mesh = make_mesh(n_edge=n_dev, n_model=1)
    T_sharded = sharded_gauss_newton(
        mesh, T0, Xs, Cs, padE(ii), padE(jj), padE(idx), padE(vm, False),
        padE(Q), padE(ev, False), jnp.asarray(K), "ray", (W, H), cfg,
    )

    np.testing.assert_allclose(
        np.asarray(T_sharded), np.asarray(T_single), atol=2e-4
    )
    assert pose_err(T_sharded, T_true) < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
def test_mapshard_matches_single_device():
    """Keyframe-axis-sharded BA (multi-host map sharding tier, SURVEY
    §2.4): pointmaps sharded over the mesh, one psum_scatter exchange per
    side, GN result equals the single-device solver."""
    from mast3r_slam_tpu.parallel.sharded_ba import (
        sharded_gauss_newton_mapshard,
    )

    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=10, chunk_points=128)

    T_single, *_ = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "ray", (W, H),
        cfg,
    )

    n_dev = len(jax.devices())
    # pad poses and edges to multiples of the mesh axis
    P_pad = ((P + n_dev - 1) // n_dev) * n_dev
    padP = P_pad - P
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    if padP:
        T0p = jnp.concatenate(
            [T0, jnp.broadcast_to(sim3.identity(), (padP, 8))], axis=0
        )
        Xsp = jnp.concatenate(
            [Xs, jnp.zeros((padP,) + Xs.shape[1:], Xs.dtype)], axis=0
        )
        Csp = jnp.concatenate(
            [Cs, jnp.zeros((padP,) + Cs.shape[1:], Cs.dtype)], axis=0
        )
    else:
        T0p, Xsp, Csp = T0, Xs, Cs

    E = ii.shape[0]
    E_pad = ((E + n_dev - 1) // n_dev) * n_dev
    pad = E_pad - E

    def padE(a, fill=0):
        return jnp.concatenate(
            [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    mesh = make_mesh(n_edge=n_dev, n_model=1)
    T_shard = sharded_gauss_newton_mapshard(
        mesh, T0p, Xsp, Csp, padE(ii), padE(jj), padE(idx),
        padE(vm, False), padE(Q), padE(ev, False), jnp.asarray(K), "ray",
        (W, H), cfg,
    )

    np.testing.assert_allclose(
        np.asarray(T_shard)[:P], np.asarray(T_single), atol=2e-4
    )
    assert pose_err(T_shard[:P], T_true) < 1e-3


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")
@pytest.mark.parametrize("mode", ["edge", "map"])
def test_sharded_ba_in_pipeline(mode):
    """local_opt.sharded_ba wires the distributed solver into the full
    SLAMSystem (FactorGraph mesh path): same trajectory as the
    single-device run on the oracle clip."""
    from mast3r_slam_tpu.pipeline import SLAMSystem
    from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
    from mast3r_slam_tpu.utils.config import load_config

    seq = SyntheticSequence(n_frames=12, h=48, w=64, seed=3, traj_scale=0.5)

    def run(shard):
        cfg = load_config("config/eval_no_calib.yaml")
        cfg["dataset"]["img_size"] = 64
        cfg["local_opt"]["sharded_ba"] = shard
        system = SLAMSystem(cfg, OracleEngine(seq), (seq.h, seq.w),
                            buffer=32)
        for i in range(len(seq)):
            system.process_frame(i, seq.images[i])
        system.terminate()
        return system

    ref = run(None)
    sharded = run(mode)
    assert sharded.graph.mesh is not None
    assert sharded.stats == ref.stats
    n = int(ref.arena.n_size)
    np.testing.assert_allclose(
        np.asarray(sharded.arena.T_WC[:n]), np.asarray(ref.arena.T_WC[:n]),
        atol=2e-4,
    )
