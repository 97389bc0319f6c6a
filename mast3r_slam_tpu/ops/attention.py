"""Fused Pallas flash-attention for the MASt3R transformer blocks.

Replaces XLA's matmul-softmax-matmul lowering of
``jax.nn.dot_product_attention`` (which materializes the (B, H, N, N)
score tensor in HBM twice per block) for the short fixed sequences this
model uses — at most (512/16)*(384/16) = 768 patch tokens per view
(reference `frame.py:140`; attention at `blocks.py:96-114`).  At N=768,
Dh=64 an entire head's Q/K/V (3 x 96 KB bf16) plus its f32 score tile
(2.4 MB) fit in VMEM, so the kernel needs no streaming/online-softmax
machinery: one grid step per (batch*head) computes the exact softmax in
f32 and writes only the (N, Dh) output back to HBM.

Used by ``models/mast3r._attention`` on single-device TPU; the XLA path
remains for CPU tests and for GSPMD-sharded (tensor-parallel) runs where
the score tensor is partitioned across devices anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0].astype(jnp.float32)          # (N, Dh)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                  # (N, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q, k, v, interpret=False):
    """Exact fused attention.  q: (B, H, Nq, Dh); k, v: (B, H, Nk, Dh).
    Returns (B, H, Nq, Dh) in q's dtype.  softmax in f32.

    Grid is one step per (batch*head); the whole head fits in VMEM for the
    N <= ~2k sequences this model produces.
    """
    B, H, Nq, Dh = q.shape
    Nk = k.shape[2]
    scale = 1.0 / (Dh ** 0.5)
    qf = q.reshape(B * H, Nq, Dh)
    kf = k.reshape(B * H, Nk, Dh)
    vf = v.reshape(B * H, Nk, Dh)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Nq, Dh), q.dtype),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, Nq, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Nk, Dh), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, Nk, Dh), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, Nq, Dh), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Nq, Dh)
