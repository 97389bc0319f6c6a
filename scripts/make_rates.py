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
    args = p.parse_args()
    h, w = args.res

    clip = pathlib.Path(args.clip)
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/make_synthetic_clip.py"),
         str(clip), str(args.frames), str(h), str(w),
         "--loop", "--traj-scale", str(args.traj_scale)],
        check=True, cwd=ROOT,
    )
    rates_path = clip / "rates.json"
    subprocess.run(
        [sys.executable, str(ROOT / "main.py"),
         "--dataset", str(clip),
         "--config", "config/eval_no_calib.yaml",
         "--no-viz", "--oracle", "--oracle-retrieval", "--cpu",
         "--gt", str(clip / "gt.txt"), "--ate-max-diff", "0.05",
         "--rates-out", str(rates_path),
         "--save-as", "rates_run"],
        check=True, cwd=ROOT,
    )
    with open(rates_path) as f:
        rates = json.load(f)
    rates["provenance"] = (
        f"scripts/make_rates.py: {args.frames}-frame closed-loop clip at "
        f"{h}x{w}, oracle engine + oracle ASMK retrieval, "
        f"config/eval_no_calib.yaml"
    )
    out = ROOT / args.out
    with open(out, "w") as f:
        json.dump(rates, f, indent=1)
    print(f"wrote {out}: {rates}")


if __name__ == "__main__":
    main()
