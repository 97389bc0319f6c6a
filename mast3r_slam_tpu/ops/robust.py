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


def solve_spd_small(H, g):
    """Unrolled LDL^T solve of a tiny SPD system H x = g (H (n, n), g (n,)
    with n known at trace time, intended for the 7x7 Sim(3) normal
    equations of the frame tracker).

    XLA's generic ``jnp.linalg.cholesky`` lowers small factorizations to a
    sequential While loop with dynamic slices — a fixed ~O(100 us) latency
    that dominates each GN iteration on TPU.  Unrolling the factorization
    at trace time turns it into ~n^3/3 scalar ops that fuse into the
    surrounding iteration.  LDL^T needs no sqrt and matches the Cholesky
    solve exactly for SPD inputs.  Returns (x, ok) where ok is False if a
    pivot is non-positive or non-finite (singular / indefinite H — the
    caller's Cholesky-failure path, reference tracker.py:72-93).

    Jacobi pre-scaling: the Sim(3) normal equations mix dof scales by
    orders of magnitude when scene depths are large (translation rows ~1,
    rotation/scale rows ~depth^2), and the unscaled fp32 factorization
    then loses its pivots to cancellation — measured in-pipeline at
    384x512 on a wide synthetic scene: frames with match_frac 0.82
    failed ok=False and threw the tracker into RELOC.  Scaling by
    D^{-1/2} (exact in infinite precision; the BA solver already does
    this, ops/ba.py) brings every pivot to ~1.
    """
    n = H.shape[0]
    dscale = 1.0 / jnp.sqrt(jnp.clip(jnp.diagonal(H), 1e-30, None))
    g = g * dscale
    H = H * dscale[:, None] * dscale[None, :]
    L = [[None] * n for _ in range(n)]
    d = [None] * n
    dinv = [None] * n
    ok = jnp.ones((), bool)
    for j in range(n):
        dj = H[j, j]
        for k in range(j):
            dj = dj - L[j][k] * L[j][k] * d[k]
        ok = ok & (dj > 0) & jnp.isfinite(dj)
        d[j] = dj
        dinv[j] = 1.0 / jnp.where(dj > 0, dj, 1.0)
        for i in range(j + 1, n):
            s = H[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k] * d[k]
            L[i][j] = s * dinv[j]
    # forward: L z = g
    z = [None] * n
    for i in range(n):
        s = g[i]
        for k in range(i):
            s = s - L[i][k] * z[k]
        z[i] = s
    # diagonal + backward: L^T x = D^{-1} z
    x = [None] * n
    for i in reversed(range(n)):
        xi = z[i] * dinv[i]
        for k in range(i + 1, n):
            xi = xi - L[k][i] * x[k]
        x[i] = xi
    return jnp.stack(x) * dscale, ok
