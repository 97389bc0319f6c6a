"""Threaded-mode arena safety (VERDICT r1 weak #1).

The frontend's arena writes donate the old device buffers; the backend
thread works on snapshots of the arena pytree.  Pre-fix, a donated append
overlapping a backend BA deleted the snapshot's buffers ("array has been
deleted").  These tests force that interleaving deterministically (the
reference avoids the problem with per-access RLocks over shared CUDA
memory, /root/reference/mast3r_slam/frame.py:131,222 — here snapshots +
donation gating give lock-free reads instead).
"""

import threading

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.frame import arena_get
from mast3r_slam_tpu.pipeline import SLAMSystem
from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
from mast3r_slam_tpu.utils.config import load_config


@pytest.fixture(scope="module")
def seq():
    return SyntheticSequence(n_frames=12, h=32, w=32, seed=1,
                             traj_scale=0.4)


def _make_system(seq, single_thread, buffer=32):
    cfg = load_config("config/base.yaml")
    cfg["dataset"]["img_size"] = 32
    cfg["single_thread"] = single_thread
    engine = OracleEngine(seq)
    return SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=buffer)


def test_arena_snapshot_vs_donation_stress(seq):
    """>=500 donated arena writes racing a snapshot-holding reader thread:
    no deleted-buffer errors, reads stay finite.  (The pre-fix pipeline
    donated the snapshot's buffers and this crashed within a few
    iterations.)"""
    system = _make_system(seq, single_thread=True)
    for i in range(2):  # seed the arena
        system.process_frame(i, seq.images[i])
    system.drain()

    errors = []
    stop = threading.Event()
    reads = [0]

    def reader():
        try:
            while not stop.is_set():
                snap = system._acquire_arena()
                try:
                    s = float(jnp.sum(snap.X)) + float(jnp.sum(snap.feat))
                    assert np.isfinite(s)
                    reads[0] += 1
                finally:
                    system._release_arena()
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    t = threading.Thread(target=reader)
    t.start()
    try:
        for _ in range(600):
            kf = arena_get(system.arena, system.arena.n_size - 1)
            system._arena_set_last(kf)  # donated unless a snapshot is live
    finally:
        stop.set()
        t.join(timeout=30)
    assert not errors, errors
    assert reads[0] > 0  # the reader actually overlapped the writes


def test_threaded_backend_stress_and_single_thread_equivalence(seq):
    """Full-pipeline stress: threaded mode with a per-frame drain barrier is
    deterministic and must equal single-thread mode exactly; free-running
    threaded mode must complete without backend errors."""
    ref = _make_system(seq, single_thread=True)
    for i in range(len(seq)):
        ref.process_frame(i, seq.images[i])
    ref.terminate()

    drained = _make_system(seq, single_thread=False)
    for i in range(len(seq)):
        drained.process_frame(i, seq.images[i])
        drained.drain()  # barrier -> same sequencing as single_thread
    drained.terminate()

    assert drained.stats["keyframes"] == ref.stats["keyframes"]
    n = int(ref.arena.n_size)
    assert int(drained.arena.n_size) == n
    err = float(jnp.abs(drained.arena.T_WC[:n] - ref.arena.T_WC[:n]).max())
    assert err < 1e-5, err

    # free-running threaded mode on a longer clip: sustained interleaved
    # appends/solves, no donation crashes (drain() re-raises any
    # backend-thread exception)
    long_seq = SyntheticSequence(n_frames=48, h=32, w=32, seed=2,
                                 traj_scale=0.4)
    free = _make_system(long_seq, single_thread=False, buffer=64)
    for i in range(len(long_seq)):
        free.process_frame(i, long_seq.images[i])
    free.terminate()
    assert free.stats["tracked"] > 0
    assert free.stats["ba_rounds"] >= 2
    n = int(free.arena.n_size)
    assert bool(jnp.isfinite(free.arena.T_WC[:n]).all())


def test_poisoned_backend_task_fails_fast(seq):
    """After a backend exception the loop must stop consuming tasks
    (dropping them unprocessed) and surface the error on drain()
    (VERDICT r2 weak #6: pre-fix it kept optimizing on a potentially
    inconsistent graph until drain finally re-raised)."""
    system = _make_system(seq, single_thread=False)
    for i in range(2):
        system.process_frame(i, seq.images[i])
    system.drain()

    calls = []

    def boom(idx):
        calls.append(idx)
        raise RuntimeError("poisoned task")

    system._process_task = boom
    for _ in range(3):
        system.tasks.put(0)
    with pytest.raises(RuntimeError, match="poisoned"):
        system.drain()
    assert len(calls) == 1, calls  # tasks after the failure were dropped

    # the queue is drained and the system recovers once the error is
    # cleared (drain() already reset _backend_error by re-raising)
    assert system._backend_error is None
    system.terminate()
