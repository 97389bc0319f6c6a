"""Model tests: tiny-model forward shapes/finiteness, RoPE properties, and
numeric parity of the converted weights against a torch-functional reference
implementation built directly from a synthetic state dict."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
from mast3r_slam_tpu.models.rope import rope_2d


def test_rope_preserves_norm_and_relative_phase():
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.standard_normal((2, 3, 8, 16)), dtype=jnp.float32)
    pos = jnp.asarray(rng.integers(0, 12, size=(2, 8, 2)), dtype=jnp.int32)
    out = rope_2d(tok, pos, freq=100.0)
    # Rotation preserves per-pair norms -> overall norm preserved
    np.testing.assert_allclose(
        jnp.linalg.norm(out, axis=-1), jnp.linalg.norm(tok, axis=-1),
        rtol=1e-5,
    )
    # Relative property: <rope(q,p1), rope(k,p2)> depends only on p1-p2
    q = jnp.asarray(rng.standard_normal((1, 1, 1, 16)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 1, 1, 16)), dtype=jnp.float32)

    def score(p1, p2):
        qp = rope_2d(q, jnp.asarray([[p1]]), 100.0)
        kp = rope_2d(k, jnp.asarray([[p2]]), 100.0)
        return float(jnp.sum(qp * kp))

    s1 = score((3, 5), (1, 2))
    s2 = score((7, 9), (5, 6))  # same relative offset (2, 3)
    assert abs(s1 - s2) < 1e-4


@pytest.fixture(scope="module")
def tiny_model():
    cfg = MASt3RConfig.tiny()
    model = MASt3R(cfg)
    img = jnp.zeros((1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), img, img)
    return model, params, cfg


def test_tiny_forward_shapes(tiny_model):
    model, params, cfg = tiny_model
    h, w = 32, 48
    rng = np.random.default_rng(0)
    img1 = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype=jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, h, w, 3)), dtype=jnp.float32)
    res1, res2 = model.apply(params, img1, img2)
    for res in (res1, res2):
        assert res["pts3d"].shape == (1, h, w, 3)
        assert res["conf"].shape == (1, h, w)
        assert res["desc"].shape == (1, h, w, cfg.local_feat_dim)
        assert res["desc_conf"].shape == (1, h, w)
        assert bool(jnp.all(jnp.isfinite(res["pts3d"])))
        # conf >= vmin; desc unit-norm
        assert float(res["conf"].min()) >= cfg.conf_vmin
        np.testing.assert_allclose(
            jnp.linalg.norm(res["desc"], axis=-1), 1.0, atol=1e-5
        )


def test_encode_decode_api(tiny_model):
    model, params, cfg = tiny_model
    img = jnp.zeros((2, 32, 48, 3))
    feat, pos = model.apply(params, img, method=MASt3R.encode)
    n = (32 // 16) * (48 // 16)
    assert feat.shape == (2, n, cfg.enc_embed_dim)
    assert feat.dtype == jnp.float32
    assert pos.shape == (2, n, 2)
    d1, d2 = model.apply(
        params, feat, pos, feat, pos, method=MASt3R.decode
    )
    assert len(d1) == cfg.dec_depth + 1
    assert d1[0].shape[-1] == cfg.enc_embed_dim
    assert d1[-1].shape[-1] == cfg.dec_embed_dim
    res = model.apply(params, 1, d1, (32, 48), method=MASt3R.head)
    assert res["pts3d"].shape == (2, 32, 48, 3)


def test_asymmetric_heads_differ(tiny_model):
    """head1 and head2 have independent parameters (reference
    downstream_head1/2) and the two decoder branches are distinct."""
    model, params, _ = tiny_model
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), dtype=jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, 32, 48, 3)), dtype=jnp.float32)
    res1, res2 = model.apply(params, img1, img2)
    assert float(jnp.abs(res1["pts3d"] - res2["pts3d"]).max()) > 1e-6


def test_flash_attention_matches_xla():
    """Pallas fused attention (interpret mode on CPU) must match
    jax.nn.dot_product_attention, including non-square (cross-attention)
    shapes and bf16 inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.ops.attention import flash_attention

    key = jax.random.PRNGKey(0)
    for (B, H, Nq, Nk, Dh, dt, tol) in [
        (2, 4, 96, 96, 64, jnp.float32, 2e-5),
        (1, 3, 80, 112, 32, jnp.float32, 2e-5),
        (2, 2, 64, 64, 64, jnp.bfloat16, 2e-2),
    ]:
        kq, kk, kv, key = jax.random.split(key, 4)
        q = jax.random.normal(kq, (B, H, Nq, Dh), dt)
        k = jax.random.normal(kk, (B, H, Nk, Dh), dt)
        v = jax.random.normal(kv, (B, H, Nk, Dh), dt)
        ref = jax.nn.dot_product_attention(
            q.swapaxes(1, 2), k.swapaxes(1, 2), v.swapaxes(1, 2)
        ).swapaxes(1, 2)
        out = flash_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=tol,
        )


def test_cast_trunk_params_bf16_identical():
    """bf16 trunk-param storage must be bitwise-identical to fp32 storage
    for a bf16-compute trunk (Flax casts at use either way), and must leave
    the fp32 heads and LayerNorms untouched."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mast3r_slam_tpu.models.mast3r import (
        MASt3R, MASt3RConfig, cast_trunk_params_bf16,
    )

    cfg = MASt3RConfig.tiny(dtype=jnp.bfloat16)
    m = MASt3R(cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), img, img)
    pc = cast_trunk_params_bf16(p)

    assert pc["params"]["enc_block_0"]["attn"]["qkv"]["kernel"].dtype == \
        jnp.bfloat16
    assert pc["params"]["enc_block_0"]["norm1"]["scale"].dtype == \
        jnp.float32
    assert pc["params"]["dpt1"] is p["params"]["dpt1"] or True  # fp32 head
    assert jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a: a.dtype != jnp.bfloat16,
        pc["params"]["dpt1"]))

    r1, _ = jax.jit(m.apply)(p, img, img)
    r2, _ = jax.jit(m.apply)(pc, img, img)
    for k in r1:
        np.testing.assert_array_equal(
            np.asarray(r1[k], np.float32), np.asarray(r2[k], np.float32),
            err_msg=k)


def test_bf16_head_acceptance(tiny_model):
    """head_dtype=bfloat16 (production fast path: bf16 conv compute, fp32
    postprocess) must stay directionally faithful to the fp32 reference
    head: pointmap/descriptor cosine similarity ~1 and small relative depth
    error — the same acceptance methodology as the fork's INT8 encoder
    benchmark (successful_quantizer.py:388-442)."""
    model32, params, cfg = tiny_model
    model16 = MASt3R(
        MASt3RConfig.tiny(head_dtype=jnp.bfloat16))  # same param structure

    h, w = 32, 48
    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    r32, _ = model32.apply(params, img1, img2)
    r16, _ = model16.apply(params, img1, img2)

    def cos(a, b):
        a = np.asarray(a, np.float64).reshape(-1, a.shape[-1])
        b = np.asarray(b, np.float64).reshape(-1, b.shape[-1])
        num = (a * b).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-12
        return (num / den).mean()

    assert r16["pts3d"].dtype == jnp.float32
    assert cos(r32["pts3d"], r16["pts3d"]) > 0.999
    assert cos(r32["desc"], r16["desc"]) > 0.999
    d32 = np.linalg.norm(np.asarray(r32["pts3d"]), axis=-1)
    d16 = np.linalg.norm(np.asarray(r16["pts3d"]), axis=-1)
    rel = np.abs(d32 - d16) / (np.abs(d32) + 1e-6)
    assert rel.mean() < 0.02, rel.mean()
    c32 = np.asarray(r32["conf"])
    c16 = np.asarray(r16["conf"])
    assert np.abs(c32 - c16).mean() / (np.abs(c32).mean() + 1e-9) < 0.05


def test_cast_head_params_bf16_identical():
    """head_bf16=True param storage must be bitwise-identical for a
    bf16-compute head (Flax casts at use either way)."""
    from mast3r_slam_tpu.models.mast3r import cast_trunk_params_bf16

    cfg = MASt3RConfig.tiny(dtype=jnp.bfloat16, head_dtype=jnp.bfloat16)
    m = MASt3R(cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), img, img)
    pc = cast_trunk_params_bf16(p, head_bf16=True)
    assert pc["params"]["local1"]["head_local_features"]["fc1"][
        "kernel"].dtype == jnp.bfloat16

    r1, _ = jax.jit(m.apply)(p, img, img)
    r2, _ = jax.jit(m.apply)(pc, img, img)
    for k in r1:
        np.testing.assert_array_equal(
            np.asarray(r1[k], np.float32), np.asarray(r2[k], np.float32),
            err_msg=k)


def test_network_breakdown_taxonomy():
    """Per-block profiler parity (reference blocks.py:130-134,191-197 +
    profiler.py:37-110): the breakdown measures every taxonomy section and
    the summary prints the encoder/decoder + attn/MLP split."""
    import io
    from contextlib import redirect_stdout

    import jax

    from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
    from mast3r_slam_tpu.utils.breakdown import (
        network_breakdown, print_network_summary,
    )

    cfg = MASt3RConfig.tiny()
    model = MASt3R(cfg)
    img = jnp.zeros((1, 32, 48, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img, img)
    res = network_breakdown(cfg, params, (32, 48), n_chain=4)
    assert set(res) == {
        "PatchEmbed", "Encoder_attn", "Encoder_mlp",
        "Decoder_attn", "Decoder_cross_attn", "Decoder_mlp",
    }
    assert all(v >= 0 for v in res.values())
    buf = io.StringIO()
    with redirect_stdout(buf):
        print_network_summary(res)
    out = buf.getvalue()
    for needle in ("Encoder vs Decoder", "Cross-Attn", "MLP"):
        assert needle in out
