"""Two-device frontend/backend split (pipeline.py backend_device): the
backend's edge state + solves live on a second device (mirror arena,
incremental row sync, pose-only write-back) and results match the
single-device run exactly.

This is the multi-chip form of the reference's frontend/backend process
split (/root/reference/main.py:87-165,213-218) — validated here on the
8-virtual-device CPU mesh from conftest."""

import jax
import numpy as np
import pytest

from mast3r_slam_tpu.pipeline import SLAMSystem
from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
from mast3r_slam_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=16, h=48, w=64, seed=0,
                             traj_scale=0.5)


def run(seq, cfg, backend_device=None, single_thread=True):
    cfg = dict(cfg)
    cfg["single_thread"] = single_thread
    engine = OracleEngine(seq)
    system = SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=32,
                        backend_device=backend_device)
    for i in range(len(seq)):
        system.process_frame(i, seq.images[i])
    system.terminate()
    return system


def test_backend_device_matches_single_device(seq):
    assert len(jax.devices()) >= 2, "conftest must provide 8 virtual devices"
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64

    ref = run(seq, cfg, backend_device=None)
    split = run(seq, cfg, backend_device=1)

    assert split.stats == ref.stats
    n = int(ref.arena.n_size)
    np.testing.assert_allclose(
        np.asarray(split.arena.T_WC[:n]), np.asarray(ref.arena.T_WC[:n]),
        atol=1e-5,
    )
    # the backend's device work actually lives on device 1
    dev1 = jax.devices()[1]
    assert list(split.graph.idx_ii2jj.devices()) == [dev1]
    assert list(split._marena.X.devices()) == [dev1]
    # while the live arena stays on the frontend device
    dev0 = jax.devices()[0]
    assert list(split.arena.X.devices()) == [dev0]


def test_backend_device_threaded(seq, tmp_path):
    """Threaded mode + backend chip: the mirror isolates the backend from
    frontend donation entirely.  Thread interleaving makes the run
    timing-dependent, so assert trajectory quality (ATE) rather than
    bitwise pose equality."""
    from mast3r_slam_tpu import evaluate

    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64

    split = run(seq, cfg, backend_device=1, single_thread=False)
    split.drain()

    assert split.stats["keyframes"] >= 2
    assert split.stats["ba_rounds"] >= 1
    gt = tmp_path / "gt.txt"
    evaluate.save_traj(tmp_path, "est.txt", seq.timestamps, split.arena)
    seq.write_gt(gt)
    ate = evaluate.ate_rmse(gt, tmp_path / "est.txt", max_diff=0.05)
    assert ate < 0.05, ate


def test_backend_device_unavailable_falls_back(seq):
    """Asking for a device index that does not exist degrades to the
    single-device path instead of crashing."""
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64
    system = run(seq, cfg, backend_device=99)
    assert system._bdev is None
    assert system.stats["ba_rounds"] >= 1
