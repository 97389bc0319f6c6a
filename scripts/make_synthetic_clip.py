#!/usr/bin/env python
"""Render a synthetic clip (PNG folder + TUM ground truth + calibration) for
driving the CLI pipeline without external datasets.

Usage: python scripts/make_synthetic_clip.py OUTDIR [n_frames] [h] [w]
         [--loop] [--scene smooth|cliff|occluder] [--traj-scale S] [--seed N]

``--loop`` closes the trajectory (integer-cycle sinusoids return to the
start) so retrieval proposes genuine loop-closure edges — the fixture for
the dedicated protocol-rates run (scripts/make_rates.py).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

# rendering is host-side work; never trickle eager ops onto a TPU
jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("out", nargs="?", default="/tmp/clip")
    p.add_argument("n_frames", nargs="?", type=int, default=30)
    p.add_argument("h", nargs="?", type=int, default=96)
    p.add_argument("w", nargs="?", type=int, default=128)
    p.add_argument("--loop", action="store_true",
                   help="closed trajectory (loop-closure clip)")
    p.add_argument("--scene", default="smooth",
                   choices=["smooth", "cliff", "occluder"])
    p.add_argument("--traj-scale", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cycles", type=int, default=1,
                   help="trajectory sweeps of the scene (bounded "
                        "amplitude for long clips; see make_trajectory)")
    args = p.parse_args()
    out = pathlib.Path(args.out)

    from mast3r_slam_tpu.testing import SyntheticSequence

    seq = SyntheticSequence(n_frames=args.n_frames, h=args.h, w=args.w,
                            seed=args.seed, traj_scale=args.traj_scale,
                            loop=args.loop, scene=args.scene,
                            cycles=args.cycles)
    out.mkdir(parents=True, exist_ok=True)
    import cv2

    for i, img in enumerate(seq.images):
        cv2.imwrite(
            str(out / f"{i:06d}.png"),
            cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
        )
    seq.write_gt(out / "gt.txt")
    seq.save(out / "oracle.npz")
    K = seq.K
    np.savetxt(out / "calibration.txt",
               [K[0, 0], K[1, 1], K[0, 2], K[1, 2]], fmt="%.6f")
    print(f"wrote {args.n_frames} frames to {out} "
          f"(gt.txt, calibration.txt, loop={args.loop}, "
          f"scene={args.scene})")


if __name__ == "__main__":
    main()
