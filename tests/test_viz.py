"""Viz exports: snapshot PNG + offline HTML viewer from a populated arena."""

import numpy as np
import pytest

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


def test_live_viewer_serves_and_controls():
    """LiveViewer: page + meta + binary cloud endpoints, and the WindowMsg
    control channel (pause/step/conf) round-trips."""
    import json
    import struct
    import urllib.request

    from mast3r_slam_tpu.viz_server import LiveViewer

    seq = SyntheticSequence(n_frames=6, h=32, w=48, seed=1, traj_scale=0.5)
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 48
    system = SLAMSystem(cfg, OracleEngine(seq), (seq.h, seq.w), buffer=16)
    for i in range(len(seq)):
        system.process_frame(i, seq.images[i])
    system.terminate()

    viewer = LiveViewer(port=0)
    try:
        g = system.graph
        ne = int(g.n_edges)
        viewer.publish(system.arena, g.ii[:ne], g.jj[:ne],
                       stats=system.stats)
        base = f"http://127.0.0.1:{viewer.port}"

        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "webgl" in page and "/cloud" in page
        # surfelmap.glsl-parity splatting: instanced normal-oriented
        # quads, tangent frame, round-disk discard, Phong + show_normal
        for marker in ("ANGLE_instanced_arrays", "drawArraysInstancedANGLE",
                       "bitangent", "discard", "showNormal", "shownrm"):
            assert marker in page, marker

        meta = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta["version"] == 1 and meta["nkf"] >= 1
        assert meta["npts"] > 0 and meta["nfr"] > 0

        blob = urllib.request.urlopen(f"{base}/cloud").read()
        npts, nfr, nedge, pad1, ntri, pad2 = struct.unpack(
            "<6I", blob[:24]
        )
        assert npts == meta["npts"] and nfr == meta["nfr"]
        assert ntri == meta["ntri"] > 0        # mesh mode has triangles
        assert meta["sradius"] > 0             # surfel mode has a radius
        expect = (24 + npts * 12 + npts * 3 + pad1 + npts * 3 + pad2
                  + (nfr + nedge) * 24 + ntri * 12)
        assert len(blob) == expect
        # normals: unit-ish int8 vectors for every point
        off = 24 + npts * 12 + npts * 3 + pad1
        nrm = np.frombuffer(blob, np.int8, npts * 3, off).reshape(-1, 3)
        ln = np.linalg.norm(nrm.astype(np.float32) / 127.0, axis=-1)
        assert (np.abs(ln - 1.0) < 0.05).mean() > 0.9
        # triangle indices reference valid points
        toff = expect - ntri * 12
        tri = np.frombuffer(blob, np.uint32, ntri * 3, toff)
        assert tri.max() < npts

        # control channel
        urllib.request.urlopen(f"{base}/ctrl?pause=1&conf=2.5")
        urllib.request.urlopen(f"{base}/ctrl?step=1")
        msg = viewer.get_msg()
        assert msg.is_paused and msg.next == 1
        assert abs(msg.C_conf_threshold - 2.5) < 1e-6
        viewer.consume_step()
        assert viewer.get_msg().next == 0

        # conf threshold feeds the next publish
        viewer.publish(system.arena, stats=system.stats)
        meta2 = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta2["version"] == 2 and meta2["conf"] == 2.5

        # current-frame preview mailbox (reference states.set_frame,
        # visualization.py:109-129): /frame serves a PNG, meta bumps
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/frame")  # nothing published yet
        viewer.publish_frame(seq.images[-1])
        png = urllib.request.urlopen(f"{base}/frame").read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        meta3 = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta3["frame_version"] == 1
        viewer.publish(system.arena, stats=system.stats)
        meta4 = json.loads(urllib.request.urlopen(f"{base}/meta").read())
        assert meta4["frame_version"] == 1  # survives a map publish
    finally:
        viewer.close()


def test_incremental_publish_dirty_keyframes_only():
    """VERDICT r3 next #10: publish() re-extracts only keyframes whose
    N_updates version changed, and the incremental blob equals a
    cache-free rebuild."""
    import mast3r_slam_tpu.viz as viz
    from mast3r_slam_tpu.pipeline import SLAMSystem
    from mast3r_slam_tpu.testing import OracleEngine, SyntheticSequence
    from mast3r_slam_tpu.utils.config import load_config
    from mast3r_slam_tpu.viz_server import LiveViewer

    seq = SyntheticSequence(n_frames=10, h=32, w=48, seed=0,
                            traj_scale=0.5)
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 48
    system = SLAMSystem(cfg, OracleEngine(seq), (seq.h, seq.w), buffer=32)
    for i in range(6):
        system.process_frame(i, seq.images[i])
    system.terminate()

    viewer = LiveViewer(port=0)
    try:
        calls = []
        orig = viz.extract_kf_grid

        def counting(Xc, C, N, u, h, w, stride, thr):
            calls.append(1)
            return orig(Xc, C, N, u, h, w, stride, thr)

        viz.extract_kf_grid = counting
        try:
            viewer.publish(system.arena, stats=system.stats)
            n = int(system.arena.n_size)
            assert len(calls) == n  # cold cache: every keyframe extracted
            blob1 = viewer._blob

            calls.clear()
            viewer.publish(system.arena, stats=system.stats)
            assert len(calls) == 0  # warm cache, nothing dirty
            assert viewer._blob == blob1  # identical content

            # fuse into the last keyframe -> exactly one dirty row
            from mast3r_slam_tpu.frame import arena_get, arena_set
            kf = arena_get(system.arena, n - 1)
            kf = kf.replace(N_updates=kf.N_updates + 1)
            system.arena = arena_set(system.arena, n - 1, kf)
            calls.clear()
            viewer.publish(system.arena, stats=system.stats)
            assert len(calls) == 1
        finally:
            viz.extract_kf_grid = orig

        # the incremental blob must equal a cache-free rebuild
        viewer._kf_cache = {}
        viewer._cache_key = None
        blob_incr = viewer._blob
        viewer.publish(system.arena, stats=system.stats)
        assert viewer._blob == blob_incr
    finally:
        viewer.close()
