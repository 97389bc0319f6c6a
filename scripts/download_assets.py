#!/usr/bin/env python
"""Fetch checkpoints and benchmark datasets (mirror of the reference's
`scripts/download_*.sh` + the checkpoint wgets in README.md:62-65).

Usage:
    python scripts/download_assets.py checkpoints
    python scripts/download_assets.py tum [--sequences rgbd_dataset_freiburg1_xyz]
    python scripts/download_assets.py euroc 7-scenes eth3d
    python scripts/download_assets.py all

After euroc / 7-scenes finish, run `python scripts/make_groundtruths.py`
to derive the TUM-format GT files the eval protocol scores against.
Requires network access; already-present files are skipped.
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys
import tarfile
import urllib.request
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent

CHECKPOINTS = [
    ("https://download.europe.naverlabs.com/ComputerVision/MASt3R/"
     "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth"),
    ("https://download.europe.naverlabs.com/ComputerVision/MASt3R/"
     "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric_retrieval_"
     "trainingfree.pth"),
    ("https://download.europe.naverlabs.com/ComputerVision/MASt3R/"
     "MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric_retrieval_"
     "codebook.pkl"),
]

TUM_BASE = "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/"
TUM = [f"rgbd_dataset_freiburg1_{s}" for s in (
    "360", "floor", "desk", "desk2", "room", "plant", "teddy", "xyz", "rpy")]

EUROC_BASE = ("http://robotics.ethz.ch/~asl-datasets/"
              "ijrr_euroc_mav_dataset/")
EUROC = {
    "V1_01_easy": "vicon_room1", "V1_02_medium": "vicon_room1",
    "V1_03_difficult": "vicon_room1", "V2_01_easy": "vicon_room2",
    "V2_02_medium": "vicon_room2", "V2_03_difficult": "vicon_room2",
    "MH_01_easy": "machine_hall", "MH_02_easy": "machine_hall",
    "MH_03_medium": "machine_hall", "MH_04_difficult": "machine_hall",
    "MH_05_difficult": "machine_hall",
}

SEVEN_SCENES_BASE = ("http://download.microsoft.com/download/2/8/5/"
                     "28564B23-0828-408F-8631-23B1EFF1DAC8/")
SEVEN_SCENES = ["chess", "fire", "heads", "office", "pumpkin",
                "redkitchen", "stairs"]

ETH3D_BASE = "https://cvg-data.inf.ethz.ch/SLAM_benchmark_2019/datasets/"


def fetch(url: str, dest: pathlib.Path) -> bool:
    if dest.exists():
        print(f"[have] {dest}")
        return True
    dest.parent.mkdir(parents=True, exist_ok=True)
    tmp = dest.with_suffix(dest.suffix + ".part")
    print(f"[get ] {url}")
    try:
        with urllib.request.urlopen(url, timeout=60) as r, open(tmp, "wb") as f:
            shutil.copyfileobj(r, f)
        tmp.rename(dest)
        return True
    except Exception as e:
        print(f"[fail] {url}: {e}", file=sys.stderr)
        tmp.unlink(missing_ok=True)
        return False


def extract(archive: pathlib.Path, dest: pathlib.Path):
    print(f"[untar] {archive} -> {dest}")
    if archive.suffix == ".zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(dest)
    else:
        with tarfile.open(archive) as t:
            t.extractall(dest)


def do_checkpoints(_args):
    for url in CHECKPOINTS:
        fetch(url, REPO / "checkpoints" / url.rsplit("/", 1)[1])


def do_tum(args):
    dest = REPO / "datasets/tum"
    for seq in args.sequences or TUM:
        tgz = dest / f"{seq}.tgz"
        if (dest / seq).exists():
            print(f"[have] {dest / seq}")
            continue
        if fetch(TUM_BASE + f"{seq}.tgz", tgz):
            extract(tgz, dest)


def do_euroc(args):
    dest = REPO / "datasets/euroc"
    for seq in args.sequences or list(EUROC):
        if (dest / seq).exists():
            print(f"[have] {dest / seq}")
            continue
        z = dest / f"{seq}.zip"
        if fetch(EUROC_BASE + f"{EUROC[seq]}/{seq}/{seq}.zip", z):
            extract(z, dest / seq)


def do_7scenes(args):
    dest = REPO / "datasets/7-scenes"
    for seq in args.sequences or SEVEN_SCENES:
        if (dest / seq).exists():
            print(f"[have] {dest / seq}")
            continue
        z = dest / f"{seq}.zip"
        if fetch(SEVEN_SCENES_BASE + f"{seq}.zip", z):
            extract(z, dest)
            # each scene zip nests per-sequence zips; the protocol uses seq-01
            inner = dest / seq / "seq-01.zip"
            if inner.exists():
                extract(inner, dest / seq)


def do_eth3d(args):
    from eval_protocol import ETH3D_SEQUENCES  # sibling module

    dest = REPO / "datasets/eth3d/train"
    for seq in args.sequences or ETH3D_SEQUENCES:
        if (dest / seq).exists():
            print(f"[have] {dest / seq}")
            continue
        z = dest / f"{seq}.zip"
        if fetch(ETH3D_BASE + f"{seq}_mono.zip", z):
            extract(z, dest)


SUITES = {"checkpoints": do_checkpoints, "tum": do_tum, "euroc": do_euroc,
          "7-scenes": do_7scenes, "eth3d": do_eth3d}


def main():
    sys.path.insert(0, str(REPO / "scripts"))
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("suites", nargs="+",
                    choices=sorted(SUITES) + ["all"])
    ap.add_argument("--sequences", nargs="*", default=None)
    args = ap.parse_args()
    suites = sorted(SUITES) if "all" in args.suites else args.suites
    for s in suites:
        SUITES[s](args)


if __name__ == "__main__":
    main()
