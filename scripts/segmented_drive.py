#!/usr/bin/env python
"""Run a long drive as a chain of fresh processes with SLAM-state
checkpoints between segments.

Why: XLA:CPU's LLVM JIT accumulates kernel-code memory mappings for the
life of the process; long full-pixel (`reference_exact`) drives at
production resolution exhaust the kernel's per-process mapping budget
(`vm.max_map_count` 65530 on this harness) and die with "LLVM
compilation error: Cannot allocate memory" followed by SIGSEGV —
measured around protocol frame ~90-100 of the 224-frame 384x512 exact
drive, with >120 GB RAM free (r4 blocker, VERDICT r4 next #4; malloc
arena tuning does not help because the maps are LLVM's, not glibc's).
Chaining fresh processes via ``main.py --resume-state/--state-out``
bounds the per-process map count; the retrieval index is replayed from
the restored arena on resume (pipeline.load_state).

Usage: python scripts/segmented_drive.py --dataset D --config C
         [--segment 40] [main.py passthrough args...]
"""

import argparse
import pathlib
import subprocess
import sys
import tempfile

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--config", required=True)
    p.add_argument("--segment", type=int, default=40,
                   help="protocol frames per process")
    p.add_argument("--save-as", default="segmented")
    p.add_argument("--gt", default="")
    p.add_argument("--ate-max-diff", type=float, default=0.05)
    p.add_argument("--rates-out", default="")
    args, passthrough = p.parse_known_args()

    # count protocol frames: dataset frames / config subsample
    sys.path.insert(0, str(ROOT))
    from mast3r_slam_tpu.utils.config import load_config

    cfg = load_config(args.config)
    sub = int(cfg["dataset"].get("subsample", 1))
    n_raw = len(list(pathlib.Path(args.dataset).glob("*.png")))
    n = -(-n_raw // sub)

    state = pathlib.Path(tempfile.mkdtemp()) / "seg_state.npz"
    seg_starts = list(range(0, n, args.segment))
    for k, s0 in enumerate(seg_starts):
        last = k == len(seg_starts) - 1
        cmd = [sys.executable, str(ROOT / "main.py"),
               "--dataset", args.dataset, "--config", args.config,
               "--no-viz", "--cpu",
               "--start-frame", str(s0),
               "--max-frames", str(min(s0 + args.segment, n)),
               "--save-as", args.save_as,
               ] + passthrough
        if k > 0:
            cmd += ["--resume-state", str(state)]
        if not last:
            cmd += ["--state-out", str(state)]
        else:
            if args.gt:
                cmd += ["--gt", args.gt,
                        "--ate-max-diff", str(args.ate_max_diff)]
            if args.rates_out:
                cmd += ["--rates-out", args.rates_out]
        print(f"[segment {k + 1}/{len(seg_starts)}] frames "
              f"{s0}..{min(s0 + args.segment, n) - 1}", flush=True)
        subprocess.run(cmd, check=True, cwd=ROOT)


if __name__ == "__main__":
    main()
