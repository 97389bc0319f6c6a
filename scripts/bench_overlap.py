#!/usr/bin/env python
"""Frontend/backend overlap measurement (STATUS gap #5).

Runs the oracle synthetic clip through the full SLAM pipeline twice:

  single_thread=True   — reference eval semantics: every backend round
                         (factor-graph decode/match + GN BA) runs inline
                         and blocks the next frame;
  single_thread=False  — the backend consumes the keyframe queue on a host
                         thread, overlapping its work with frontend frames
                         (the TPU-native replacement for the reference's
                         separate backend process, main.py:87-165).

Reports wall time, mean/p95/max frame latency, and the stall profile.
The quantity of interest is the FRAME LATENCY distribution: threaded mode
must absorb backend rounds without blocking the frame cadence (keyframe
appends stay, BA leaves the critical path).

Usage: python scripts/bench_overlap.py [n_frames h w] (default 60 96 128)
Env: CPU=0 to run on the default device (TPU); default forces CPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("CPU", "1") == "1":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mast3r_slam_tpu.pipeline import SLAMSystem
    from mast3r_slam_tpu.testing import (
        OracleEngine, SyntheticSequence, make_oracle_retrieval,
    )
    from mast3r_slam_tpu.utils.config import load_config

    args = sys.argv[1:]
    n_frames = int(args[0]) if args else 60
    h = int(args[1]) if len(args) > 1 else 96
    w = int(args[2]) if len(args) > 2 else 128

    # gentle trajectory: both modes must track cleanly (no reloc episodes)
    # or the latency comparison is apples-to-oranges
    seq = SyntheticSequence(n_frames=n_frames, h=h, w=w, seed=0,
                            traj_scale=float(os.environ.get("TRAJ", "0.2")))

    def run(single_thread):
        cfg = load_config("config/base.yaml")
        cfg["dataset"]["img_size"] = max(h, w)
        cfg["single_thread"] = single_thread
        engine = OracleEngine(seq)
        system = SLAMSystem(cfg, engine, (h, w), buffer=64)
        system.retrieval = make_oracle_retrieval(seq, engine)
        lat = []
        t_all = time.perf_counter()
        for i in range(len(seq)):
            t0 = time.perf_counter()
            system.process_frame(i, seq.images[i])
            lat.append(time.perf_counter() - t0)
        system.drain()
        wall = time.perf_counter() - t_all
        system.terminate()
        lat = np.asarray(lat[2:])  # drop compile-heavy first frames
        return wall, lat, system.stats

    # warm both code paths' jit caches with a short run first
    run(True)

    w_st, lat_st, stats_st = run(True)
    w_th, lat_th, stats_th = run(False)

    def pct(a, q):
        return float(np.percentile(a, q))

    print(f"single_thread: wall {w_st:.2f}s  frame mean "
          f"{lat_st.mean()*1e3:.1f} p95 {pct(lat_st,95)*1e3:.1f} "
          f"max {lat_st.max()*1e3:.1f} ms  stats {stats_st}")
    print(f"threaded:      wall {w_th:.2f}s  frame mean "
          f"{lat_th.mean()*1e3:.1f} p95 {pct(lat_th,95)*1e3:.1f} "
          f"max {lat_th.max()*1e3:.1f} ms  stats {stats_th}")
    print(f"overlap gain: wall {w_st/w_th:.2f}x, p95 frame latency "
          f"{pct(lat_st,95)/max(pct(lat_th,95),1e-9):.2f}x")


if __name__ == "__main__":
    main()
