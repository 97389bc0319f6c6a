"""YAML config system with `inherit:` chaining.

Capability parity with the reference config loader
(`/root/reference/mast3r_slam/config.py:7-54`): a global config dict, a YAML
loader that resolves an ``inherit`` key by recursively loading the base file
and deep-merging the child on top, and scientific-notation floats parsed as
floats (YAML 1.1 quirk workaround).
"""

from __future__ import annotations

import copy
import re
from pathlib import Path

import yaml

# Process-global config dict, re-hydrated into worker threads/processes.
config: dict = {}


def _sci_float_loader() -> type[yaml.SafeLoader]:
    """SafeLoader that parses '1e-3'-style scalars as floats."""

    class Loader(yaml.SafeLoader):
        pass

    Loader.add_implicit_resolver(
        "tag:yaml.org,2002:float",
        re.compile(
            r"""^(?:
             [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
            |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
            |\.[0-9_]+(?:[eE][-+][0-9]+)?
            |[-+]?\.(?:inf|Inf|INF)
            |\.(?:nan|NaN|NAN))$""",
            re.X,
        ),
        list("-+0123456789."),
    )
    return Loader


def merge_config(base: dict, child: dict) -> dict:
    """Deep-merge ``child`` on top of ``base`` (child wins)."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_config(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_config(path: str | Path, set_global: bool = True) -> dict:
    """Load a YAML config, resolving the ``inherit`` chain relative to cwd
    (reference resolves inherit paths the same way)."""
    path = Path(path)
    with open(path) as f:
        cfg = yaml.load(f, Loader=_sci_float_loader()) or {}
    if "inherit" in cfg:
        base = load_config(cfg.pop("inherit"), set_global=False)
        cfg = merge_config(base, cfg)
    if cfg.get("reference_exact"):
        cfg = apply_reference_exact(cfg)
    if set_global:
        set_global_config(cfg)
    return cfg


# The TPU fast-path approximations and the config values that restore the
# reference-exact behavior.  A single `reference_exact: true` toggle (or
# main.py --reference-exact) switches the whole production bundle off for
# A/B on first real-data contact (VERDICT r2 weak #4).
REFERENCE_EXACT_OVERRIDES = {
    "matching": {
        # full-resolution LM + full dilation ladder at full radius
        # (matching_kernels.cu:26-81 reference behavior)
        "coarse_subsample": 1,
        "final_radius": 0,
        "coarse_radius": 0,
        "dilation_schedule": [],
        "lm_subsample": 0,
        "lm_table_subsample": 1,
        "occlusion_subsample": 1,
        # factor-graph edges matched at every pixel
        "edge_query_subsample": 1,
    },
    "tracking": {
        # per-component huber weights + all pixels in the GN point set
        "joint_ray_huber": False,
        "point_subsample": 1,
    },
    "local_opt": {
        # every pixel contributes a BA residual; every edge pays the full
        # symmetric decode+match (global_opt.py:32-101)
        "points_subsample": 1,
        "reuse_track_matches": False,
        "reuse_warp": False,
        # retrieval edges pay the reference's symmetric 2E-batch decode
        "retrieval_edge_mode": "sym",
    },
}


def apply_reference_exact(cfg: dict) -> dict:
    """Overlay the reference-exact values on ``cfg`` (returns a copy)."""
    out = merge_config(cfg, REFERENCE_EXACT_OVERRIDES)
    out["reference_exact"] = True
    return out


def set_global_config(cfg: dict) -> None:
    """Install cfg into the process-global dict in place (so references
    captured by `from ... import config` observe the update)."""
    config.clear()
    config.update(cfg)
