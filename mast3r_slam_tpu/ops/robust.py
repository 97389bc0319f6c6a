"""Robust-weight functions and convergence checks for Gauss-Newton loops.

Capability parity with `/root/reference/mast3r_slam/nonlinear_optimizer.py`,
expressed as jit-safe ops returning traced booleans (the reference does the
check on the host with `.item()` syncs; here the whole GN loop runs on device
inside `lax.while_loop`).
"""

from __future__ import annotations

import jax.numpy as jnp


def huber(r, k: float = 1.345):
    """IRLS Huber weight w(r): 1 inside |r|<k, k/|r| outside
    (nonlinear_optimizer.py:28-33; gn_kernels.cu:172-175)."""
    r_abs = jnp.abs(r)
    return jnp.where(r_abs < k, 1.0, k / jnp.maximum(r_abs, 1e-12))


def tukey(r, t: float = 4.6851):
    """Tukey biweight (nonlinear_optimizer.py:36-42)."""
    r_abs = jnp.abs(r)
    tmp = 1.0 - jnp.square(r_abs / t)
    return jnp.where(r_abs < t, tmp * tmp, 0.0)


def check_convergence(rel_error_threshold, delta_norm_threshold, old_cost,
                      new_cost, delta):
    """Traced convergence predicate: relative cost decrease below threshold OR
    update norm below threshold (nonlinear_optimizer.py:5-25)."""
    old_safe = jnp.where(jnp.isfinite(old_cost) & (old_cost != 0.0), old_cost, 1.0)
    rel_dec = jnp.abs((old_cost - new_cost) / old_safe)
    rel_ok = jnp.isfinite(old_cost) & (rel_dec < rel_error_threshold)
    delta_norm = jnp.linalg.norm(delta)
    return rel_ok | (delta_norm < delta_norm_threshold)
