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
