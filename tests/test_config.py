"""Config loader: inherit chain, deep merge, sci-notation floats."""

from mast3r_slam_tpu.utils.config import config, load_config, merge_config


def test_merge_deep():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    child = {"a": {"y": 5}, "c": 6}
    out = merge_config(base, child)
    assert out == {"a": {"x": 1, "y": 5}, "b": 3, "c": 6}


def test_inherit_and_float(tmp_path):
    (tmp_path / "base.yaml").write_text(
        "tracking:\n  sigma_ray: 0.003\n  delta_norm: 1e-3\nuse_calib: False\n"
    )
    (tmp_path / "child.yaml").write_text(
        f"inherit: \"{tmp_path}/base.yaml\"\nuse_calib: True\n"
        "tracking:\n  sigma_ray: 0.01\n"
    )
    cfg = load_config(tmp_path / "child.yaml")
    assert cfg["use_calib"] is True
    assert cfg["tracking"]["sigma_ray"] == 0.01
    assert isinstance(cfg["tracking"]["delta_norm"], float)
    assert cfg["tracking"]["delta_norm"] == 1e-3
    # global updated in place
    assert config["use_calib"] is True


def test_repo_configs_load():
    cfg = load_config("config/base.yaml")
    for key in ["matching", "tracking", "local_opt", "retrieval", "reloc"]:
        assert key in cfg
    ec = load_config("config/eval_calib.yaml")
    assert ec["use_calib"] is True and ec["single_thread"] is True
    assert ec["dataset"]["subsample"] == 2
