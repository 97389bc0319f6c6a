"""Image-space ops: Scharr-style gradients via shifted adds.

Capability parity with `/root/reference/mast3r_slam/image.py:5-38` (3x3
Scharr-like kernels [-3 0 3; -10 0 10; -3 0 3]/32 with reflect padding), but
implemented as nine shifted adds instead of a grouped conv — XLA fuses the
shifts into a few vectorized adds, which beats a tiny-channel conv on the
TPU's VPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reflect_pad_hw(x):
    """Reflect-pad (..., h, w, c) by 1 on h and w (torch 'reflect' mode:
    edge pixel not repeated)."""
    pad = [(0, 0)] * x.ndim
    pad[-3] = (1, 1)
    pad[-2] = (1, 1)
    return jnp.pad(x, pad, mode="reflect")


def img_gradient(img):
    """img: (b, h, w, c) -> (gx, gy), each (b, h, w, c).

    Equivalent to the reference grouped conv with the Scharr-like kernels
    (image.py:10-38), channels-last.
    """
    p = _reflect_pad_hw(img)
    h, w = img.shape[-3], img.shape[-2]

    def sh(dy, dx):
        return p[..., 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]

    gx = (1.0 / 32.0) * (
        3.0 * (sh(-1, 1) - sh(-1, -1))
        + 10.0 * (sh(0, 1) - sh(0, -1))
        + 3.0 * (sh(1, 1) - sh(1, -1))
    )
    gy = (1.0 / 32.0) * (
        3.0 * (sh(1, -1) - sh(-1, -1))
        + 10.0 * (sh(1, 0) - sh(-1, 0))
        + 3.0 * (sh(1, 1) - sh(-1, 1))
    )
    return gx, gy
