"""INT8 encoder: output must closely match the fp encoder (the fork's own
acceptance methodology — cosine similarity between original and quantized
encoder outputs, successful_quantizer.py:388-442)."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
from mast3r_slam_tpu.models.quant import encode_int8, quantize_encoder_params


def test_int8_encoder_matches_fp():
    cfg = MASt3RConfig.tiny(dtype=jnp.float32)
    model = MASt3R(cfg)
    img0 = jnp.zeros((1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), img0, img0)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 32, 48, 3)), jnp.float32)

    feat_fp, pos_fp = model.apply(params, img, method=MASt3R.encode)
    qparams = quantize_encoder_params(params)
    feat_q, pos_q = encode_int8(params, qparams, img, cfg)

    np.testing.assert_array_equal(pos_fp, pos_q)
    a = np.asarray(feat_fp).reshape(-1)
    b = np.asarray(feat_q).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.15, rel


def test_quantized_weights_shapes():
    cfg = MASt3RConfig.tiny()
    model = MASt3R(cfg)
    img0 = jnp.zeros((1, 32, 48, 3))
    params = model.init(jax.random.PRNGKey(0), img0, img0)
    qp = quantize_encoder_params(params)
    assert len(qp) == cfg.enc_depth
    blk = qp["enc_block_0"]
    assert blk["qkv"].w_int8.dtype == jnp.int8
    assert blk["qkv"].w_int8.shape == (cfg.enc_embed_dim,
                                       3 * cfg.enc_embed_dim)
    assert blk["fc1"].w_int8.shape == (cfg.enc_embed_dim,
                                       cfg.mlp_ratio * cfg.enc_embed_dim)


def test_int8_local_head_acceptance():
    """INT8 catMLP local-feature head (VERDICT r1 next #7): descriptors
    from the quantized head must be near-identical to the fp head (same
    cosine methodology as the encoder acceptance above); the engine path
    with int8_local_head=True produces matched outputs end to end."""
    from mast3r_slam_tpu.inference import InferenceEngine

    cfg = MASt3RConfig.tiny(dtype=jnp.float32, head_dtype=jnp.float32)
    model = MASt3R(cfg)
    h, w = 32, 48
    img0 = jnp.zeros((1, h, w, 3))
    params = model.init(jax.random.PRNGKey(0), img0, img0)

    rng = np.random.default_rng(1)
    img1 = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    img2 = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)

    eng_fp = InferenceEngine(model, params, (h, w))
    eng_q = InferenceEngine(model, params, (h, w), int8_local_head=True)

    f1, p1 = eng_fp.encode(img1)
    f2, p2 = eng_fp.encode(img2)
    (X, C, D, Q), _ = eng_fp.decode_pair(f1, p1, f2, p2)
    (Xq, Cq, Dq, Qq), _ = eng_q.decode_pair(f1, p1, f2, p2)

    # DPT outputs identical (the int8 path only changes the local MLP)
    np.testing.assert_allclose(np.asarray(Xq), np.asarray(X), atol=1e-5)
    np.testing.assert_allclose(np.asarray(Cq), np.asarray(C), atol=1e-5)

    # descriptor cosine acceptance (successful_quantizer.py:388-442)
    a = np.asarray(D).reshape(-1)
    b = np.asarray(Dq).reshape(-1)
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos
    # desc-conf relative error stays small
    rel = np.linalg.norm(np.asarray(Qq) - np.asarray(Q)) / \
        np.linalg.norm(np.asarray(Q))
    assert rel < 0.1, rel
