#!/usr/bin/env python
"""Produce the committed ``bench_rates.json`` protocol-rate measurement
(VERDICT r3 next #2): a DEDICATED >=150-frame loop-closure drive with the
oracle retrieval database active, so the keyframe cadence, the
retrieval-proposal cadence (the cost-bearing weight of the symmetric
decode+match stage in bench.py's protocol composition) and the accepted
loop-closure edge rate are all real measurements — not the structural
zeros of a retrieval-less test fixture.

Usage: python scripts/make_rates.py [--frames 160] [--res H W]
         [--out bench_rates.json] [--clip /tmp/rates_clip]

Runs on CPU (the oracle engine needs no network weights; rates are
cadence statistics, not timings).
"""

import argparse
import json
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=160)
    p.add_argument("--res", type=int, nargs=2, default=[384, 512],
                   metavar=("H", "W"))
    p.add_argument("--out", default="bench_rates.json")
    p.add_argument("--clip", default="/tmp/rates_clip")
    p.add_argument("--traj-scale", type=float, default=0.35,
                   help="trajectory amplitude scale (larger scene -> "
                        "realistic keyframe cadence)")
    p.add_argument("--cycles", type=int, default=0,
                   help="scene sweeps (0 = auto ~ frames/40: bounded "
                        "amplitude + genuine revisits)")
    args = p.parse_args()
    cycles = args.cycles or max(1, round(args.frames / 40))
    h, w = args.res

    clip = pathlib.Path(args.clip)
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/make_synthetic_clip.py"),
         str(clip), str(args.frames), str(h), str(w),
         "--loop", "--traj-scale", str(args.traj_scale),
         "--cycles", str(cycles)],
        check=True, cwd=ROOT,
    )
    rates_path = clip / "rates.json"
    subprocess.run(
        [sys.executable, str(ROOT / "main.py"),
         "--dataset", str(clip),
         "--config", "config/eval_no_calib.yaml",
         "--no-viz", "--oracle", "--oracle-desc", "--oracle-retrieval",
         "--cpu",
         "--gt", str(clip / "gt.txt"), "--ate-max-diff", "0.05",
         "--rates-out", str(rates_path),
         "--save-as", "rates_run"],
        check=True, cwd=ROOT,
    )
    with open(rates_path) as f:
        rates = json.load(f)
    # sanity gate: a drive that lost tracking (reloc storm / diverged
    # trajectory) measures a RELOC cadence, not the protocol cadence —
    # refuse to produce the bench artifact from it
    sys.path.insert(0, str(ROOT))
    from mast3r_slam_tpu.evaluate import ate_rmse

    ate = ate_rmse(clip / "gt.txt", ROOT / "logs/rates_run" /
                   f"{clip.name}.txt", max_diff=0.05)
    rates["ate_rmse"] = round(ate, 5)
    if ate > 0.2:
        raise SystemExit(
            f"rates drive diverged (ATE {ate:.3f} m) — not writing "
            f"{args.out}; adjust --traj-scale/--cycles")
    rates["provenance"] = (
        f"scripts/make_rates.py: {args.frames}-frame closed-loop clip at "
        f"{h}x{w} ({cycles} scene sweeps), oracle engine + oracle ASMK "
        f"retrieval, config/eval_no_calib.yaml"
    )
    out = ROOT / args.out
    with open(out, "w") as f:
        json.dump(rates, f, indent=1)
    print(f"wrote {out}: {rates}")


if __name__ == "__main__":
    main()
