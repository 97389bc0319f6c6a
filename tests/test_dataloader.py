"""Dataset loader tests over synthetic on-disk fixtures: every dataset
format the factory sniffs (TUM, EuRoC, ETH3D, 7-Scenes, MP4, RGB folder),
the Intrinsics rescale-to-network-frame math, and subsampling."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mast3r_slam_tpu import dataloader as dl
from mast3r_slam_tpu.utils.config import config


@pytest.fixture
def calib_cfg():
    old = config.get("use_calib", False)
    config["use_calib"] = True
    yield
    config["use_calib"] = old


def _write_png(path, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), img)


def _make_tum(root, n=4, freiburg=1):
    d = root / "tum" / f"rgbd_dataset_freiburg{freiburg}_test"
    lines = []
    for i in range(n):
        f = f"rgb/{1000.0 + i:.4f}.png"
        _write_png(d / f, seed=i)
        lines.append(f"{1000.0 + i:.4f} {f}")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    return d


def test_tum_dataset(tmp_path, calib_cfg):
    d = _make_tum(tmp_path, n=4, freiburg=1)
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.TUMDataset)
    assert len(ds) == 4
    # freiburg1 factory calibration is wired in
    assert ds.camera_intrinsics is not None
    assert abs(ds.camera_intrinsics.K_orig[0, 0] - 517.3) < 1e-6
    ts, img = ds[0]
    assert float(ts) == pytest.approx(1000.0)
    # uint8 end-to-end: the float conversion is fused into resize_img
    assert img.dtype == np.uint8 and img.shape[-1] == 3
    ds.subsample(2)
    assert len(ds) == 2


def test_tum_freiburg3_no_distortion(tmp_path, calib_cfg):
    d = _make_tum(tmp_path, n=2, freiburg=3)
    ds = dl.load_dataset(str(d))
    assert np.allclose(ds.camera_intrinsics.distortion, 0)


def test_euroc_dataset(tmp_path):
    d = tmp_path / "euroc" / "MH_01_easy"
    cam = d / "mav0" / "cam0"
    (cam / "data").mkdir(parents=True)
    names = []
    for i in range(3):
        name = f"{i}.png"
        img = np.random.default_rng(i).integers(
            0, 255, size=(48, 64), dtype=np.uint8
        )
        cv2.imwrite(str(cam / "data" / name), img)
        names.append((str(i * 1000), name))
    (cam / "data.csv").write_text(
        "\n".join(f"{t},{n}" for t, n in names) + "\n"
    )
    (cam / "sensor.yaml").write_text(
        "resolution: [64, 48]\n"
        "intrinsics: [60.0, 60.0, 32.0, 24.0]\n"
        "distortion_coefficients: [-0.28, 0.07, 0.0002, 0.00002]\n"
    )
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.EurocDataset)
    assert len(ds) == 3
    # EuRoC always undistorts regardless of use_calib
    assert ds.camera_intrinsics is not None
    _, img = ds[1]
    assert img.shape == (48, 64, 3)  # grayscale promoted to rgb


def test_eth3d_dataset(tmp_path, calib_cfg):
    d = tmp_path / "eth3d" / "train" / "sofa_1"
    lines = []
    for i in range(3):
        f = f"rgb/{i}.png"
        _write_png(d / f, seed=i)
        lines.append(f"{float(i)} {f}")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    (d / "calibration.txt").write_text("60.0 60.0 32.0 24.0\n")
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.ETH3DDataset)
    assert ds.camera_intrinsics is not None
    assert len(ds) == 3


def test_seven_scenes_dataset(tmp_path, calib_cfg):
    d = tmp_path / "7-scenes" / "chess"
    for i in [0, 2, 1, 10]:  # natsort check
        _write_png(d / "seq-01" / f"frame-{i:06d}.color.png", seed=i)
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.SevenScenesDataset)
    assert len(ds) == 4
    assert ds.rgb_files[-1].name == "frame-000010.color.png"


def test_mp4_dataset(tmp_path):
    path = tmp_path / "clip.mp4"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         30.0, (64, 48))
    if not vw.isOpened():
        pytest.skip("cv2 build lacks mp4 encoder")
    rng = np.random.default_rng(0)
    for _ in range(12):
        vw.write(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))
    vw.release()
    ds = dl.load_dataset(str(path))
    assert isinstance(ds, dl.MP4Dataset)
    assert len(ds) == 12
    ds.subsample(3)
    assert len(ds) == 4
    ts, img = ds[1]
    assert ts == pytest.approx(3 / 30.0)
    assert img.shape == (48, 64, 3)


def test_rgb_folder_with_calib_sidecar(tmp_path, calib_cfg):
    d = tmp_path / "myclips"
    for i in range(3):
        _write_png(d / f"{i:04d}.png", seed=i)
    (d / "calibration.txt").write_text("60.0 60.0 32.0 24.0\n")
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.RGBFiles)
    assert len(ds) == 3 and ds.camera_intrinsics is not None


def test_tum_format_folder_without_tum_in_path(tmp_path, calib_cfg):
    d = tmp_path / "somewhere" / "seq_freiburg2"
    lines = []
    for i in range(2):
        f = f"rgb/{i}.png"
        _write_png(d / f, seed=i)
        lines.append(f"{float(i)} {f}")
    (d / "rgb.txt").write_text("\n".join(lines) + "\n")
    ds = dl.load_dataset(str(d))
    assert isinstance(ds, dl.TUMDataset)
    assert abs(ds.camera_intrinsics.K_orig[0, 0] - 520.9) < 1e-6


def test_intrinsics_rescale_to_network_frame(calib_cfg):
    """K_frame must account for the resize_img scale + center crop."""
    intr = dl.Intrinsics.from_calib(512, 640, 480,
                                    [500.0, 510.0, 320.0, 240.0])
    from mast3r_slam_tpu.inference import resize_img

    out, (sw, sh, hcw, hch) = resize_img(
        np.zeros((480, 640, 3), np.float32), 512,
        return_transformation=True,
    )
    hh, ww = out["img"][0].shape[:2]
    # K here is the optimal-new-camera matrix (undistort target), and
    # K_frame is that matrix mapped through the resize/crop transform
    assert intr.K_frame[0, 0] == pytest.approx(intr.K[0, 0] / sw)
    assert intr.K_frame[1, 1] == pytest.approx(intr.K[1, 1] / sh)
    # principal point must land inside the network frame
    assert 0 < intr.K_frame[0, 2] < ww
    assert 0 < intr.K_frame[1, 2] < hh


def test_intrinsics_disabled_without_use_calib():
    old = config.get("use_calib", False)
    config["use_calib"] = False
    try:
        assert dl.Intrinsics.from_calib(
            512, 640, 480, [500.0, 500.0, 320.0, 240.0]
        ) is None
        # always_undistort (EuRoC) overrides
        assert dl.Intrinsics.from_calib(
            512, 640, 480, [500.0, 500.0, 320.0, 240.0],
            always_undistort=True,
        ) is not None
    finally:
        config["use_calib"] = old
