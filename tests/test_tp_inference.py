"""Tensor-parallel inference through the production InferenceEngine
(mesh= / main.py --tp): Megatron-split param placements must leave every
output numerically equal to the unsharded engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.inference import InferenceEngine
from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
from mast3r_slam_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >= 4 devices")
def test_tp_engine_matches_unsharded():
    cfg = MASt3RConfig.tiny(enc_num_heads=4, dec_num_heads=4)
    model = MASt3R(cfg)
    h, w = 32, 64
    img = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, 3))
    params = model.init(jax.random.PRNGKey(1), img, img)

    ref = InferenceEngine(model, params, (h, w))
    mesh = make_mesh(n_edge=len(jax.devices()) // 2, n_model=2)
    tp = InferenceEngine(model, params, (h, w), mesh=mesh)

    f_ref, p_ref = ref.encode(img)
    f_tp, p_tp = tp.encode(img)
    np.testing.assert_allclose(np.asarray(f_tp), np.asarray(f_ref),
                               atol=1e-4)

    (X1r, C1r, D1r, Q1r), _ = ref.decode_pair(f_ref, p_ref, f_ref, p_ref)
    (X1t, C1t, D1t, Q1t), _ = tp.decode_pair(f_tp, p_tp, f_tp, p_tp)
    # rtol: pts3d goes through an exp postprocess, so collective
    # reduction-order noise scales with magnitude
    np.testing.assert_allclose(np.asarray(X1t), np.asarray(X1r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(D1t), np.asarray(D1r),
                               rtol=1e-4, atol=1e-4)

    # the TP params are actually sharded over the model axis
    qkv_sh = [
        x.sharding
        for path, x in jax.tree_util.tree_leaves_with_path(tp.params)
        if "qkv" in "/".join(str(p) for p in path) and x.ndim == 2
    ]
    assert qkv_sh, "no qkv weights found"
    assert any(not s.is_fully_replicated for s in qkv_sh)
