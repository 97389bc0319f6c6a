#!/usr/bin/env python
"""Render a synthetic clip (PNG folder + TUM ground truth + calibration) for
driving the CLI pipeline without external datasets.

Usage: python scripts/make_synthetic_clip.py OUTDIR [n_frames] [h] [w]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

# rendering is host-side work; never trickle eager ops onto a TPU
jax.config.update("jax_platforms", "cpu")


def main():
    out = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/clip")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 96
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 128

    from mast3r_slam_tpu.testing import SyntheticSequence

    seq = SyntheticSequence(n_frames=n, h=h, w=w, seed=0, traj_scale=0.1)
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
    print(f"wrote {n} frames to {out} (gt.txt, calibration.txt)")


if __name__ == "__main__":
    main()
