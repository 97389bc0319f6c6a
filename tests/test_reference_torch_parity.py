"""Numeric parity of the weight converter + Flax model against the ACTUAL
reference torch implementation imported from /root/reference/thirdparty.

Unlike tests/test_convert_parity.py (whose torch side is a hand-written
functional mirror), the torch side here is the real thing:
``mast3r.model.AsymmetricMASt3R`` -> ``dust3r.model.AsymmetricCroCo3DStereo``
(dust3r/model.py:127-196) -> CroCo blocks (croco/models/blocks.py) ->
``Cat_MLP_LocalFeatures_DPT_Pts3d`` (mast3r/catmlp_dpt_head.py:42-123).
A shared misunderstanding between converter and mirror (RoPE phase
convention, DPT hook indices, postprocess) cannot pass here.

Environment plumbing required to run the reference on CPU (it is a
CUDA-first fork): the fork's profiler timers inside the vendored CroCo
blocks call torch.cuda.synchronize (blocks.py:130-134), which raises
without CUDA -> no-op'd; views must carry 'instance' keys
(dust3r/utils/misc.py:34-42); the catmlp head asserts dec_depth > 9
(catmlp_dpt_head.py:104); head feature dims are hardcoded by the factory
(feature_dim=256, last_dim=128, layer_dims=[96,192,384,768]).
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
_REF_PATHS = [
    REF,  # for the fork's mast3r_slam.profiler import inside blocks.py
    f"{REF}/thirdparty/mast3r",
    f"{REF}/thirdparty/mast3r/dust3r",
    f"{REF}/thirdparty/mast3r/dust3r/croco",
]

import os  # noqa: E402

if not os.path.isdir(f"{REF}/thirdparty/mast3r"):
    pytest.skip("reference tree not present", allow_module_level=True)


def _import_reference_model():
    for p in _REF_PATHS:
        if p not in sys.path:
            sys.path.append(p)
    torch.cuda.synchronize = lambda *a, **k: None
    from mast3r.model import AsymmetricMASt3R  # noqa: PLC0415

    return AsymmetricMASt3R


def _build_reference_net(*, img_size, enc_embed_dim, enc_depth, enc_num_heads,
                         dec_embed_dim, dec_num_heads, seed):
    AsymmetricMASt3R = _import_reference_model()
    inf = float("inf")
    torch.manual_seed(seed)
    net = AsymmetricMASt3R(
        output_mode="pts3d+desc24", head_type="catmlp+dpt",
        depth_mode=("exp", -inf, inf), conf_mode=("exp", 1, inf),
        desc_conf_mode=("exp", 0, inf), two_confs=True,
        pos_embed="RoPE100", patch_embed_cls="PatchEmbedDust3R",
        img_size=img_size, patch_size=16,
        enc_embed_dim=enc_embed_dim, enc_depth=enc_depth,
        enc_num_heads=enc_num_heads,
        dec_embed_dim=dec_embed_dim, dec_depth=12,
        dec_num_heads=dec_num_heads,
        landscape_only=False,
    )
    net.eval()
    return net


def _flax_config(*, enc_embed_dim, enc_depth, enc_num_heads, dec_embed_dim,
                 dec_num_heads):
    import jax.numpy as jnp

    from mast3r_slam_tpu.models.mast3r import MASt3RConfig

    # Head dims are what the reference factory hardcodes
    # (catmlp_dpt_head.py:105-123, dpt_block.py:286-287).
    return MASt3RConfig(
        enc_embed_dim=enc_embed_dim, enc_depth=enc_depth,
        enc_num_heads=enc_num_heads,
        dec_embed_dim=dec_embed_dim, dec_depth=12,
        dec_num_heads=dec_num_heads,
        local_feat_dim=24, two_confs=True,
        feature_dim=256, last_dim=128, layer_dims=(96, 192, 384, 768),
        conf_vmin=1.0, desc_conf_vmin=0.0,
        dtype=jnp.float32, head_dtype=jnp.float32,
    )


def _run_parity(net, cfg, img_hw, seed=3, atol=2e-4):
    import jax.numpy as jnp

    from mast3r_slam_tpu.models.convert import (assert_params_cover,
                                                convert_state_dict)
    from mast3r_slam_tpu.models.mast3r import MASt3R

    H, W = img_hw
    rng = np.random.default_rng(seed)
    img1 = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    img2 = rng.standard_normal((1, H, W, 3)).astype(np.float32)

    with torch.no_grad():
        v1 = {"img": torch.from_numpy(img1).permute(0, 3, 1, 2),
              "instance": ["0"]}
        v2 = {"img": torch.from_numpy(img2).permute(0, 3, 1, 2),
              "instance": ["1"]}
        r1, r2 = net(v1, v2)

    params = convert_state_dict(net.state_dict(), cfg.enc_depth,
                                cfg.dec_depth, strict=True)
    model = MASt3R(cfg)
    assert_params_cover(params, model, (H, W))
    res1, res2 = model.apply(params, jnp.asarray(img1), jnp.asarray(img2))

    def chk(a, b, name, **kw):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), atol=atol,
                                   err_msg=name, **kw)

    chk(res1["pts3d"][0], r1["pts3d"][0], "pts3d1", rtol=1e-3)
    chk(res1["conf"][0], r1["conf"][0], "conf1", rtol=1e-3)
    chk(res1["desc"][0], r1["desc"][0], "desc1")
    chk(res1["desc_conf"][0], r1["desc_conf"][0], "desc_conf1", rtol=1e-3)
    chk(res2["pts3d"][0], r2["pts3d_in_other_view"][0], "pts3d2", rtol=1e-3)
    chk(res2["conf"][0], r2["conf"][0], "conf2", rtol=1e-3)
    chk(res2["desc"][0], r2["desc"][0], "desc2")
    chk(res2["desc_conf"][0], r2["desc_conf"][0], "desc_conf2", rtol=1e-3)


@pytest.mark.parametrize("img_hw", [(32, 48), (48, 32)],
                         ids=["landscape", "portrait"])
def test_reference_parity_tiny(img_hw):
    """Tiny-but-head-valid net: dec_depth=12 (hooks [0,6,9,12] like the
    real model, catmlp_dpt_head.py:115), real hardcoded head dims."""
    dims = dict(enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
                dec_embed_dim=64, dec_num_heads=2)
    net = _build_reference_net(img_size=(32, 48), seed=0, **dims)
    _run_parity(net, _flax_config(**dims), img_hw)


def test_reference_parity_vitl_shaped():
    """Reduced-depth ViT-L-shaped config: the real model's widths and head
    counts (enc 1024/16h, dec 768/12h, catmlp idim 1792) with enc_depth=2
    so it runs in seconds on CPU.  Covers the real head dims end to end."""
    dims = dict(enc_embed_dim=1024, enc_depth=2, enc_num_heads=16,
                dec_embed_dim=768, dec_num_heads=12)
    net = _build_reference_net(img_size=(64, 96), seed=1, **dims)
    _run_parity(net, _flax_config(**dims), (64, 96), atol=5e-4)
