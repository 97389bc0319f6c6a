"""2D rotary position embedding as a pure function.

Capability parity with the reference cuRoPE2D kernel / RoPE2D fallback
(`/root/reference/thirdparty/mast3r/dust3r/croco/models/curope/` and
`dust3r/croco/models/pos_embed.py:112-158`): the head dim is split into a
y-half and an x-half; each half gets 1D RoPE (non-interleaved "rotate-half"
layout) driven by the token's integer (y, x) patch coordinates.

On TPU this is a handful of fused VPU ops — no custom kernel needed; XLA
fuses the sin/cos/multiply into the surrounding attention projections.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_2d(tokens, positions, freq: float = 100.0):
    """Apply 2D RoPE.

    tokens: (B, n_heads, N, D) with D % 4 == 0.
    positions: (B, N, 2) integer (y, x) patch coordinates.
    """
    B, H, N, D = tokens.shape
    half = D // 2   # per-axis feature count
    quarter = half // 2  # rotation pair count per axis

    pos = positions.astype(jnp.float32)  # (B, N, 2)
    inv_freq = 1.0 / (freq ** (jnp.arange(0, quarter, dtype=jnp.float32) * 2.0 / half))

    def rot_half(x, theta):
        # x: (B, N, half) features; theta: (B, N, quarter)
        cos = jnp.cos(theta)
        sin = jnp.sin(theta)
        cos = jnp.concatenate([cos, cos], axis=-1)[:, None].astype(x.dtype)
        sin = jnp.concatenate([sin, sin], axis=-1)[:, None].astype(x.dtype)
        x1, x2 = x[..., :quarter], x[..., quarter:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rotated * sin

    theta_y = pos[..., 0:1] * inv_freq[None, None, :]  # (B, N, quarter)
    theta_x = pos[..., 1:2] * inv_freq[None, None, :]

    y_feat = tokens[..., :half]
    x_feat = tokens[..., half:]
    return jnp.concatenate(
        [rot_half(y_feat, theta_y), rot_half(x_feat, theta_x)], axis=-1
    )
