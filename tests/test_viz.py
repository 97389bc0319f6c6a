"""Viz exports: snapshot PNG + offline HTML viewer from a populated arena."""

import numpy as np

from mast3r_slam_tpu import viz
from mast3r_slam_tpu.pipeline import SLAMSystem
from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
from mast3r_slam_tpu.utils.config import load_config


def test_snapshot_and_html(tmp_path):
    seq = SyntheticSequence(n_frames=8, h=32, w=48, seed=0, traj_scale=0.5)
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 48
    system = SLAMSystem(cfg, OracleEngine(seq), (seq.h, seq.w), buffer=16)
    for i in range(len(seq)):
        system.process_frame(i, seq.images[i])
    system.terminate()

    png = tmp_path / "map.png"
    viz.render_snapshot(system.arena, png, conf_threshold=0.5)
    assert png.exists() and png.stat().st_size > 1000
    import cv2

    img = cv2.imread(str(png))
    assert img is not None and img.std() > 1.0  # not a blank frame

    html = tmp_path / "map.html"
    viz.export_html_viewer(system.arena, html, conf_threshold=0.5)
    text = html.read_text()
    assert "webgl" in text and "drawArrays" in text
    assert html.stat().st_size > 10_000  # embedded point data present
