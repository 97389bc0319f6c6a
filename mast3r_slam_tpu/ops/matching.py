"""Dense iterative projective matching, TPU-native.

Capability parity with the reference matcher
(`/root/reference/mast3r_slam/matching.py` driving the CUDA kernels in
`backend/src/matching_kernels.cu`):

* ``iter_proj`` — per-pixel Levenberg-Marquardt on a bilinearly interpolated
  unit-ray field, minimizing the alignment between the ray at the projected
  pixel and the normalized target point (matching_kernels.cu:119-275).
* ``refine_matches`` — coarse-to-fine dilated window argmax of descriptor
  dot products (matching_kernels.cu:26-81).
* ``match`` — the full pipeline with the 3D-distance occlusion check
  (matching.py:52-90).

The reference launches one CUDA thread per pixel with divergent control flow;
here every pixel's LM state is a lane of a vectorized ``fori_loop`` so the
whole solve is a handful of fused VPU ops per iteration, and the descriptor
refinement is expressed as batched gathers + reduction (MXU/VPU-friendly,
bf16).  All shapes static; per-pixel accept/reject is a ``where`` mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import img_gradient


class MatchingConfig(NamedTuple):
    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 1e-1
    radius: int = 3
    dilation_max: int = 5

    @classmethod
    def from_dict(cls, d: dict) -> "MatchingConfig":
        return cls(
            max_iter=int(d["max_iter"]),
            lambda_init=float(d["lambda_init"]),
            convergence_thresh=float(d["convergence_thresh"]),
            dist_thresh=float(d["dist_thresh"]),
            radius=int(d["radius"]),
            dilation_max=int(d["dilation_max"]),
        )


def pixel_to_lin(p, w):
    """(..., 2) int pixels -> linear index u + w*v (matching.py:13-15)."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx, w):
    """linear index -> (..., 2) (u, v) (matching.py:18-22)."""
    u = idx % w
    v = idx // w
    return jnp.stack([u, v], axis=-1)


def _normalize(x, axis=-1):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def prep_for_iter_proj(X11, X21, idx_1_to_2_init):
    """Build the 9-channel ray+gradient image, normalized target points and
    the initial pixel guesses (matching.py:25-49).

    X11, X21: (b, h, w, 3) pointmaps. idx init: (b, h*w) int or None.
    """
    b, h, w, _ = X11.shape
    rays = _normalize(X11)
    gx, gy = img_gradient(rays)
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)  # (b,h,w,9)

    pts3d_norm = _normalize(X21.reshape(b, h * w, 3))

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w)[None], (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(X11.dtype)
    return rays_with_grad, pts3d_norm, p_init


def _bilinear(img_flat, h, w, u, v):
    """Bilinear sample of img_flat (b, h*w, c) at float (u, v) (b, n).

    Caller guarantees u in [1, w-2], v in [1, h-2] (reference clamps), so all
    four corners are in-bounds.  Corner/weight pairing mirrors
    matching_kernels.cu:154-183.
    """
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    def g(vv, uu):
        idx = (vv * w + uu)[..., None]
        return jnp.take_along_axis(img_flat, idx, axis=1)

    w11 = du * dv          # pairs with (v0+1, u0+1)
    w12 = (1 - du) * dv    # (v0+1, u0)
    w21 = du * (1 - dv)    # (v0, u0+1)
    w22 = (1 - du) * (1 - dv)  # (v0, u0)
    return (
        w11 * g(v0 + 1, u0 + 1)
        + w12 * g(v0 + 1, u0)
        + w21 * g(v0, u0 + 1)
        + w22 * g(v0, u0)
    )


def _ray_cost(rays_flat, h, w, u, v, pts3d_norm):
    """Sample+normalize ray at (u,v), return (cost, err, gx, gy)."""
    sample = _bilinear(rays_flat, h, w, u, v)  # (b,n,9)
    r = _normalize(sample[..., 0:3])
    err = r - pts3d_norm
    cost = jnp.sum(err * err, axis=-1)
    return cost, err, sample[..., 3:6], sample[..., 6:9]


@functools.partial(jax.jit, static_argnames=("max_iter",))
def iter_proj(rays_with_grad_img, pts3d_norm, p_init, max_iter=10,
              lambda_init=1e-8, cost_thresh=1e-6):
    """Vectorized per-pixel LM projection solve.

    rays_with_grad_img: (b, h, w, 9); pts3d_norm: (b, n, 3);
    p_init: (b, n, 2) float.  Returns (p_new (b, n, 2) float, converged
    (b, n) bool).  Mirrors matching_kernels.cu:119-275.
    """
    b, h, w, _ = rays_with_grad_img.shape
    flat = rays_with_grad_img.reshape(b, h * w, 9)

    u = jnp.clip(p_init[..., 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, h - 2.0)
    lam = jnp.full_like(u, lambda_init)
    conv = jnp.zeros(u.shape, dtype=bool)

    def body(_, state):
        u, v, lam, conv = state
        cost, err, gx, gy = _ray_cost(flat, h, w, u, v, pts3d_norm)

        # Normal equations of the 2-dof system (J = [gx gy])
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err * gx, axis=-1)
        b1 = -jnp.sum(err * gy, axis=-1)

        det = A00 * A11 - A01 * A01
        det_inv = 1.0 / jnp.where(jnp.abs(det) < 1e-24, 1e-24, det)
        du_ = det_inv * (A11 * b0 - A01 * b1)
        dv_ = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du_, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv_, 1.0, h - 2.0)
        new_cost, _, _, _ = _ray_cost(flat, h, w, u_new, v_new, pts3d_norm)

        accept = new_cost < cost
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        conv = jnp.where(accept, new_cost < cost_thresh, cost < cost_thresh)
        return u, v, lam, conv

    u, v, lam, conv = jax.lax.fori_loop(0, max_iter, body, (u, v, lam, conv))
    return jnp.stack([u, v], axis=-1), conv


@functools.partial(jax.jit, static_argnames=("radius", "dilation_max"))
def refine_matches(D11, D21, p1, radius=3, dilation_max=5):
    """Coarse-to-fine dilated window argmax of descriptor dot products.

    D11: (b, h, w, f) descriptor image; D21: (b, n, f) query descriptors;
    p1: (b, n, 2) int pixel guesses.  Mirrors matching_kernels.cu:26-81
    including iteration order (u-major) and strictly-greater tie-breaking.
    """
    b, h, w, f = D11.shape
    flat = D11.reshape(b, h * w, f)
    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)

    compute = jnp.promote_types(D11.dtype, jnp.float32)

    for d in range(dilation_max, 0, -1):
        rd = radius * d
        best = jnp.zeros(u0.shape, dtype=compute)  # ref inits ~ float-min
        u_best, v_best = u0, v0
        # Offsets in reference order: i (u) outer, j (v) inner
        offsets = [(-rd + i, -rd + j)
                   for i in range(0, 2 * rd + 1, d)
                   for j in range(0, 2 * rd + 1, d)]
        off = jnp.asarray(offsets, dtype=jnp.int32)  # (K, 2)

        def body(k, state):
            best, u_best, v_best = state
            uu = u0 + off[k, 0]
            vv = v0 + off[k, 1]
            inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
            idx = jnp.clip(vv * w + uu, 0, h * w - 1)[..., None]
            cand = jnp.take_along_axis(flat, idx, axis=1)  # (b,n,f)
            score = jnp.sum(
                cand.astype(compute) * D21.astype(compute), axis=-1
            )
            score = jnp.where(inside, score, -jnp.inf)
            better = score > best
            return (
                jnp.where(better, score, best),
                jnp.where(better, uu, u_best),
                jnp.where(better, vv, v_best),
            )

        best, u_best, v_best = jax.lax.fori_loop(
            0, off.shape[0], body, (best, u0, v0)
        )
        u0, v0 = u_best, v_best

    return jnp.stack([u0, v0], axis=-1)


def match(X11, X21, D11, D21, idx_1_to_2_init=None,
          cfg: MatchingConfig = MatchingConfig()):
    """Full dense matching pipeline (matching.py:8-10, 52-90).

    X11, X21: (b, h, w, 3); D11, D21: (b, h, w, fdim).
    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool).
    """
    b, h, w = X21.shape[:3]
    rays_img, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init
    )
    p1, valid_proj2 = iter_proj(
        rays_img, pts3d_norm, p_init,
        max_iter=cfg.max_iter, lambda_init=cfg.lambda_init,
        cost_thresh=cfg.convergence_thresh,
    )
    p1 = p1.astype(jnp.int32)

    # Occlusion check on 3D distance (matching.py:71-76)
    idx = pixel_to_lin(p1, w)
    X11_flat = X11.reshape(b, h * w, 3)
    X11_at = jnp.take_along_axis(X11_flat, idx[..., None], axis=1)
    dists2 = jnp.linalg.norm(X11_at - X21.reshape(b, h * w, 3), axis=-1)
    valid = valid_proj2 & (dists2 < cfg.dist_thresh)

    if cfg.radius > 0:
        D21_flat = D21.reshape(b, h * w, -1)
        p1 = refine_matches(
            D11.astype(jnp.bfloat16), D21_flat.astype(jnp.bfloat16), p1,
            radius=cfg.radius, dilation_max=cfg.dilation_max,
        )

    idx_1_to_2 = pixel_to_lin(p1, w)
    return idx_1_to_2, valid[..., None]
