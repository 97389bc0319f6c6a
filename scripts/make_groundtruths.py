#!/usr/bin/env python
"""Generate TUM-format ground-truth trajectories for EuRoC and 7-Scenes.

The reference bundles these pre-derived (`groundtruths/euroc/*.txt`,
`groundtruths/7-scenes/*.txt`); this script derives the same files from the
raw dataset downloads so nothing opaque needs shipping:

* EuRoC: `mav0/state_groundtruth_estimate0/data.csv` rows
  (timestamp[ns], p_xyz, q_wxyz, ...) -> `t x y z qx qy qz qw` with the
  nanosecond timestamp (matching the EuRoC camera timestamps the estimated
  trajectory carries).
* 7-Scenes: per-frame `seq-01/frame-XXXXXX.pose.txt` 4x4 camera-to-world
  matrices -> quaternion lines keyed by frame index (the dataloader uses
  frame-index timestamps, dataloader.py SevenScenesDataset).

Usage: python scripts/make_groundtruths.py [--datasets-root datasets]
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), Shepperd's method."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([x, y, z, w])
    return q / np.linalg.norm(q)


def convert_euroc(seq_dir: pathlib.Path, out: pathlib.Path) -> int:
    csv = seq_dir / "mav0/state_groundtruth_estimate0/data.csv"
    if not csv.exists():
        return 0
    rows = np.loadtxt(csv, delimiter=",", dtype=str, comments="#", ndmin=2)
    with open(out, "w") as f:
        for r in rows:
            ns = int(r[0])
            x, y, z = (float(r[i]) for i in (1, 2, 3))
            qw, qx, qy, qz = (float(r[i]) for i in (4, 5, 6, 7))
            f.write(f"{ns}.000000000 {x:.9f} {y:.9f} {z:.9f} "
                    f"{qx:.9f} {qy:.9f} {qz:.9f} {qw:.9f}\n")
    return len(rows)


def convert_7scenes(seq_dir: pathlib.Path, out: pathlib.Path) -> int:
    poses = sorted((seq_dir / "seq-01").glob("frame-*.pose.txt"))
    if not poses:
        return 0
    with open(out, "w") as f:
        for i, p in enumerate(poses):
            T = np.loadtxt(p).reshape(4, 4)
            q = rotmat_to_quat(T[:3, :3])
            t = T[:3, 3]
            f.write(f"{i} {t[0]} {t[1]} {t[2]} "
                    f"{q[0]} {q[1]} {q[2]} {q[3]}\n")
    return len(poses)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--datasets-root", default="datasets")
    ap.add_argument("--out-root", default="groundtruths")
    args = ap.parse_args()
    root = pathlib.Path(args.datasets_root)
    out_root = pathlib.Path(args.out_root)

    for seq_dir in sorted((root / "euroc").glob("*")):
        if not seq_dir.is_dir():
            continue
        out = out_root / "euroc" / f"{seq_dir.name}.txt"
        out.parent.mkdir(parents=True, exist_ok=True)
        n = convert_euroc(seq_dir, out)
        print(f"euroc/{seq_dir.name}: {n} poses -> {out}" if n
              else f"euroc/{seq_dir.name}: no GT csv, skipped")

    for seq_dir in sorted((root / "7-scenes").glob("*")):
        if not seq_dir.is_dir():
            continue
        out = out_root / "7-scenes" / f"{seq_dir.name}.txt"
        out.parent.mkdir(parents=True, exist_ok=True)
        n = convert_7scenes(seq_dir, out)
        print(f"7-scenes/{seq_dir.name}: {n} poses -> {out}" if n
              else f"7-scenes/{seq_dir.name}: no pose files, skipped")


if __name__ == "__main__":
    main()
