"""Projective geometry with analytic Jacobians, pure JAX.

Capability parity with `/root/reference/mast3r_slam/geometry.py` (ray+distance
residual, calibrated pinhole projection with log-depth, backprojection,
ray-constrained pointmaps, pixel grids), redesigned as batched jnp ops so the
whole tracker cost function stays inside one XLA computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew_sym(x):
    """(..., 3) -> (..., 3, 3). Mirrors geometry.py:5-9."""
    xx, yy, zz = jnp.moveaxis(x, -1, 0)
    o = jnp.zeros_like(xx)
    return jnp.stack([o, -zz, yy, zz, o, -xx, -yy, xx, o], axis=-1).reshape(
        x.shape[:-1] + (3, 3)
    )


def point_to_dist(X):
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X, jacobian: bool = False):
    """Map points to [unit ray (3), distance (1)] with optional Jacobian
    (..., 4, 3).  Mirrors geometry.py:17-34."""
    d = point_to_dist(X)
    d_safe = jnp.maximum(d, 1e-12)
    d_inv = 1.0 / d_safe
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv_2 = d_inv * d_inv
    eye = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), X.shape[:-1] + (3, 3))
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (eye - d_inv_2[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)
    return rd, drd_dX


def decompose_K(K):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(P, K, img_size, jacobian: bool = False, border: int = 0,
                  z_eps: float = 0.0):
    """Pinhole projection to (u, v, log z) with validity mask and optional
    Jacobian (..., 3, 3).  Mirrors geometry.py:63-104 (including the
    negative-border convention that admits out-of-image pixels)."""
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x, y, z = jnp.moveaxis(P, -1, 0)

    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe

    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid = (valid_u & valid_v & valid_z)[..., None]

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.stack([u, v, logz], axis=-1)

    if not jacobian:
        return pz, valid

    zero = jnp.zeros_like(z_inv)
    # Rows: du/dP, dv/dP, dlogz/dP (all already divided by z as in reference)
    J = jnp.stack(
        [
            jnp.stack([fx * z_inv, zero, -fx * x * z_inv * z_inv], axis=-1),
            jnp.stack([zero, fy * z_inv, -fy * y * z_inv * z_inv], axis=-1),
            jnp.stack([zero, zero, z_inv], axis=-1),
        ],
        axis=-2,
    )
    return pz, J, valid


def backproject(p, z, K):
    """Pixels (...,2) + depth (...,1) -> points (...,3).
    Mirrors geometry.py:107-115."""
    fx, fy, cx, cy = decompose_K(K)
    x = (p[..., 0] - cx) / fx
    y = (p[..., 1] - cy) / fy
    dirs = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return z * dirs


def get_pixel_coords(batch, img_size, dtype=jnp.float32):
    """(b, h, w, 2) pixel grid in (u, v) order. Mirrors geometry.py:118-123."""
    h, w = img_size
    u = jnp.arange(w, dtype=dtype)
    v = jnp.arange(h, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    uv = jnp.stack([uu, vv], axis=-1)
    return jnp.broadcast_to(uv[None], (batch, h, w, 2))


def constrain_points_to_ray(img_size, Xs, K):
    """Reproject pointmaps onto their pixel rays, preserving z.
    Xs: (b, h*w, 3). Mirrors geometry.py:37-42."""
    b = Xs.shape[0]
    uv = get_pixel_coords(b, img_size, dtype=Xs.dtype).reshape(b, -1, 2)
    return backproject(uv, Xs[..., 2:3], K)
