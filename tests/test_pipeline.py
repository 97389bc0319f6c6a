"""End-to-end pipeline tests on the synthetic oracle harness: the full SLAM
system (tracking, keyframing, backend BA, export) runs on a rendered clip
with known ground truth and is ATE-scored with the built-in evaluator."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu import evaluate
from mast3r_slam_tpu.pipeline import SLAMSystem
from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
from mast3r_slam_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=16, h=48, w=64, seed=0,
                             traj_scale=0.5)


def run_system(seq, cfg, noise=0.0, use_calib=False):
    engine = OracleEngine(seq, noise_std=noise)
    K = seq.K if use_calib else None
    system = SLAMSystem(cfg, engine, (seq.h, seq.w), K=K, buffer=32)
    for i in range(len(seq)):
        system.process_frame(i, seq.images[i])
    system.terminate()
    return system


def test_pipeline_tracks_and_keyframes(tmp_path, seq):
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64
    system = run_system(seq, cfg)

    assert system.stats["keyframes"] >= 2
    assert system.stats["tracked"] + system.stats["keyframes"] >= len(seq) - 2
    assert system.stats["skipped"] == 0
    assert system.stats["ba_rounds"] >= 1

    # export + score
    traj = tmp_path / "est.txt"
    gt = tmp_path / "gt.txt"
    evaluate.save_traj(tmp_path, "est.txt", seq.timestamps, system.arena)
    seq.write_gt(gt)
    ate = evaluate.ate_rmse(gt, traj, max_diff=0.05)
    # oracle geometry: trajectory should be recovered to sub-centimeter
    # (scene scale ~4m)
    assert ate < 0.05, ate

    # reconstruction export
    evaluate.save_reconstruction(tmp_path, "map.ply", system.arena, 0.5)
    pts, cols = evaluate.load_ply(tmp_path / "map.ply")
    assert len(pts) > 1000
    assert np.isfinite(pts).all()


def test_pipeline_calib_mode(tmp_path, seq):
    cfg = load_config("config/eval_calib.yaml")
    cfg["dataset"]["img_size"] = 64
    system = run_system(seq, cfg, use_calib=True)
    assert system.stats["keyframes"] >= 2
    traj = tmp_path / "est.txt"
    gt = tmp_path / "gt.txt"
    evaluate.save_traj(tmp_path, "est.txt", seq.timestamps, system.arena)
    seq.write_gt(gt)
    ate = evaluate.ate_rmse(gt, traj, max_diff=0.05)
    assert ate < 0.1, ate


def test_pipeline_with_noise(seq):
    """Small pointmap noise must not break tracking."""
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64
    system = run_system(seq, cfg, noise=0.005)
    assert system.stats["skipped"] == 0
    assert system.stats["keyframes"] >= 2


def test_pipeline_threaded_mode(seq):
    cfg = load_config("config/base.yaml")
    cfg["dataset"]["img_size"] = 64
    assert cfg["single_thread"] is False
    system = run_system(seq, cfg)
    system.terminate()
    assert system.stats["tracked"] > 0


def test_ate_evaluator_selfcheck(tmp_path):
    """ATE of a trajectory against a Sim3-transformed copy of itself must
    be ~0 (alignment removes the transform)."""
    rng = np.random.default_rng(0)
    n = 30
    t = np.arange(n) * 0.1
    pos = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    q = np.tile([0, 0, 0, 1.0], (n, 1))

    def write(path, p):
        with open(path, "w") as f:
            for i in range(n):
                f.write(f"{t[i]} {p[i,0]} {p[i,1]} {p[i,2]} "
                        f"{q[i,0]} {q[i,1]} {q[i,2]} {q[i,3]}\n")

    # random similarity transform
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    T = sim3.exp(jnp.asarray(rng.standard_normal(7) * 0.5, jnp.float32))
    pos2 = np.asarray(sim3.act(T, jnp.asarray(pos, jnp.float32)))
    write(tmp_path / "a.txt", pos)
    write(tmp_path / "b.txt", pos2)
    ate = evaluate.ate_rmse(tmp_path / "a.txt", tmp_path / "b.txt")
    assert ate < 1e-4, ate


def test_state_checkpoint_resume(tmp_path, seq):
    """Mid-run save_state/load_state roundtrip: a resumed system continues
    tracking and matches the uninterrupted run's final keyframe count."""
    from mast3r_slam_tpu.testing import OracleEngine

    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64

    # uninterrupted run
    full = run_system(seq, cfg)

    # interrupted + resumed run
    engine = OracleEngine(seq)
    sys_a = SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=32)
    half = len(seq) // 2
    for i in range(half):
        sys_a.process_frame(i, seq.images[i])
    sys_a.save_state(tmp_path / "state.npz")

    engine_b = OracleEngine(seq)
    engine_b._encode_counter = half  # resume frame-id alignment
    sys_b = SLAMSystem(cfg, engine_b, (seq.h, seq.w), buffer=32)
    sys_b.load_state(tmp_path / "state.npz")
    for i in range(half, len(seq)):
        sys_b.process_frame(i, seq.images[i])
    sys_b.terminate()

    assert sys_b.stats["keyframes"] == full.stats["keyframes"]
    import jax.numpy as jnp

    n = int(sys_b.arena.n_size)
    assert n == int(full.arena.n_size)
    # final poses close to the uninterrupted run
    err = float(jnp.abs(sys_b.arena.T_WC[:n] - full.arena.T_WC[:n]).max())
    assert err < 1e-3, err


def test_reuse_track_matches_equivalent(seq):
    """local_opt.reuse_track_matches: completing the consecutive edge from
    the tracker's direction + one asymmetric match must give the same
    graph and trajectory as the full symmetric path (the oracle matcher is
    warm-start independent, so results are identical)."""
    import numpy as np

    def run(flag):
        cfg = load_config("config/eval_no_calib.yaml")
        cfg["dataset"]["img_size"] = 64
        cfg["local_opt"]["reuse_track_matches"] = flag
        return run_system(seq, cfg)

    on, off = run(True), run(False)
    assert on.stats == off.stats
    g_on, g_off = on.graph, off.graph
    assert g_on.n_edges == g_off.n_edges
    assert (g_on.ii[:g_on.n_edges] == g_off.ii[:g_off.n_edges]).all()
    np.testing.assert_allclose(
        np.asarray(g_on.Q_ii2jj[:g_on.n_edges]),
        np.asarray(g_off.Q_ii2jj[:g_off.n_edges]), atol=1e-5)
    n = int(on.arena.n_size)
    np.testing.assert_allclose(
        np.asarray(on.arena.T_WC[:n]), np.asarray(off.arena.T_WC[:n]),
        atol=1e-5)


def test_arena_grows_past_capacity(seq):
    """A run producing more keyframes than the arena's initial capacity
    must complete via power-of-two growth (frame.py::arena_grow) and be
    bitwise-equivalent to the same run with ample capacity.  The reference
    would index-error at its fixed 512 slots (frame.py:220-327); silent
    scatter-clamping (pre-fix behavior) corrupted rows instead."""
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64

    big = run_system(seq, cfg)  # buffer=32, never grows
    n_kf = int(big.arena.n_size)
    assert n_kf >= 2  # growth must actually trigger below

    engine = OracleEngine(seq)
    small = SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=1)
    for i in range(len(seq)):
        small.process_frame(i, seq.images[i])
    small.terminate()

    assert small.arena.buffer >= n_kf  # grew
    assert small.arena.buffer == 1 << (n_kf - 1).bit_length() or \
        small.arena.buffer == max(1, 1 << (n_kf - 1).bit_length())
    assert int(small.arena.n_size) == n_kf
    assert small.stats == big.stats
    err = float(jnp.abs(small.arena.T_WC[:n_kf]
                        - big.arena.T_WC[:n_kf]).max())
    assert err == 0.0, err
    err_x = float(jnp.abs(small.arena.X[:n_kf] - big.arena.X[:n_kf]).max())
    assert err_x == 0.0, err_x


def test_load_state_legacy_stats_layout(tmp_path, seq):
    """Pre-schema snapshots carried exactly five stats values in their
    sorted order; loading one must map them by THAT order, not the new
    sorted order (which interleaves retrieval_edges and would scramble
    skipped/tracked)."""
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64
    from mast3r_slam_tpu.testing import OracleEngine

    engine = OracleEngine(seq)
    sys_a = SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=32)
    for i in range(6):
        sys_a.process_frame(i, seq.images[i])
    sys_a.save_state(tmp_path / "state.npz")

    # forge the legacy layout: drop stats_keys, keep the five legacy
    # entries in their historical sorted order with distinctive values
    d = dict(np.load(tmp_path / "state.npz"))
    del d["stats_keys"]
    legacy = {"ba_rounds": 11, "keyframes": 22, "reloc": 33,
              "skipped": 44, "tracked": 55}
    d["stats"] = np.asarray([legacy[k] for k in sorted(legacy)], np.int64)
    np.savez_compressed(tmp_path / "legacy.npz", **d)

    sys_b = SLAMSystem(cfg, OracleEngine(seq), (seq.h, seq.w), buffer=32)
    sys_b.load_state(tmp_path / "legacy.npz")
    for k, v in legacy.items():
        assert sys_b.stats[k] == v, (k, sys_b.stats)
    assert sys_b.stats["retrieval_edges"] == 0


def test_associate_unique_nearest_neighbor():
    """evo-semantics association (VERDICT r3 next #7): default 0.01 s
    window and one-to-one matching — a single gt stamp near two estimate
    stamps pairs only with the closer one."""
    t_a = np.array([0.0, 0.004, 1.0])
    t_b = np.array([0.001, 1.002])
    ia, ib = evaluate.associate(t_a, t_b)
    # b[0] is nearest to both a[0] (diff 1 ms) and a[1] (diff 3 ms):
    # uniqueness keeps the closer pair only
    assert list(zip(ia, ib)) == [(0, 0), (2, 1)]
    # window: 20 ms away is outside the 0.01 default
    ia, ib = evaluate.associate(np.array([0.021]), t_b)
    assert len(ia) == 0
    # but inside an explicit (synthetic-clip) override
    ia, ib = evaluate.associate(np.array([0.021]), t_b, max_diff=0.05)
    assert list(zip(ia, ib)) == [(0, 0)]


def test_ate_rmse_hand_computed_sim3_case(tmp_path):
    """Cross-check ate_rmse against a closed-form Sim(3)-aligned case.

    gt = the 6 axis unit vectors (mean 0); est adds a perturbation that is
    mean-zero, orthogonal to every gt point, and has zero gt-cross-
    covariance, so the optimal Umeyama alignment is R=I, t=0 and
    c = 1 / (1 + 2 e^2 / 3) exactly (var_x = 1 + 4e^2/6, trace(D) = 1).
    The expected RMSE follows in closed form without calling the
    evaluator's own alignment code."""
    e = 1e-3
    gt = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                   [0, -1, 0], [0, 0, 1], [0, 0, -1]], float)
    d = np.zeros_like(gt)
    d[0] = [0, 0, e]
    d[1] = [0, 0, e]
    d[2] = [0, 0, -e]
    d[3] = [0, 0, -e]
    est = gt + d

    def write(path, p):
        with open(path, "w") as f:
            for i in range(len(p)):
                f.write(f"{i * 0.1} {p[i, 0]} {p[i, 1]} {p[i, 2]} "
                        f"0 0 0 1\n")

    write(tmp_path / "gt.txt", gt)
    write(tmp_path / "est.txt", est)
    c = 1.0 / (1.0 + 2.0 * e * e / 3.0)
    err = np.linalg.norm(c * est - gt, axis=-1)
    expected = float(np.sqrt((err ** 2).mean()))
    ate = evaluate.ate_rmse(tmp_path / "gt.txt", tmp_path / "est.txt")
    assert np.isclose(ate, expected, rtol=1e-6), (ate, expected)
    # sanity: the closed form is ~ e * sqrt(2/3) for small e
    assert np.isclose(expected, e * np.sqrt(2 / 3), rtol=1e-3)
