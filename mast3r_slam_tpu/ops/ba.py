"""Pointmap bundle adjustment: second-order Gauss-Newton over Sim(3) poses.

Capability parity with the reference CUDA+Eigen backend
(`/root/reference/mast3r_slam/backend/src/gn_kernels.cu`): three residual
flavors over factor-graph edges —

* point alignment (point_align_kernel, :455-723)
* ray + distance alignment (ray_align_kernel, :813-1138)
* calibrated pixel + log-depth (calib_proj_kernel, :1231-1543)

— each accumulating per-edge 14x14 Hessian blocks and 14-d gradients over
all pixels with Huber + confidence weighting, followed by a sparse pose
solve and a Sim(3) retraction (pose_retr_kernel, :415-453).

TPU-first redesign:

* The reference's one-CUDA-block-per-edge accumulation becomes batched
  einsum contractions over (edges x point-chunks): the Hessian build is
  (E, C*R, 14)^T @ (E, C*R, 14) batch matmuls on the MXU, scanned over
  point chunks to bound memory.
* The reference's device->host->device round trip through an Eigen
  SimplicialLLT on CPU doubles (SparseBlock, gn_kernels.cu:57-159) is
  ELIMINATED: the pose system is scatter-assembled into a dense
  (7F x 7F) matrix on device and solved with a Jacobi-preconditioned,
  lightly damped fp32 Cholesky.  The pose-graph H is tiny (7*511 at the
  512-keyframe capacity), so dense beats sparse on the MXU.
* The GN loop is a lax.while_loop with a traced ||dx|| early exit
  (reference: .item() sync per iteration, gn_kernels.cu:1219-1222).
* Everything is padded/masked (edge validity masks) so one compiled
  executable serves the whole run; edges shard cleanly across devices
  (see parallel/sharded_ba.py).

Gauge fixing matches the reference: the first ``pin`` poses are frozen
(num_fix=1, gn_kernels.cu:741,1157,1566).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie_sim3 as sim3
from .robust import huber


class BAConfig(NamedTuple):
    pin: int = 1
    C_conf: float = 0.0
    Q_conf: float = 1.5
    max_iters: int = 10
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    sigma_point: float = 0.05
    delta_norm: float = 1e-8
    pixel_border: int = -10
    depth_eps: float = 1e-6
    chunk_points: int = 8192
    damping: float = 1e-6     # relative LM damping for the fp32 solve
    huber_k: float = 1.345
    points_subsample: int = 1  # stride-s subset of each edge's pixels

    @classmethod
    def from_config(cls, cfg: dict) -> "BAConfig":
        lo = cfg["local_opt"]
        return cls(
            pin=int(lo["pin"]),
            C_conf=float(lo["C_conf"]),
            Q_conf=float(lo["Q_conf"]),
            max_iters=int(lo["max_iters"]),
            sigma_ray=float(lo["sigma_ray"]),
            sigma_dist=float(lo["sigma_dist"]),
            sigma_pixel=float(lo["sigma_pixel"]),
            sigma_depth=float(lo["sigma_depth"]),
            sigma_point=float(lo["sigma_point"]),
            delta_norm=float(lo["delta_norm"]),
            pixel_border=int(lo["pixel_border"]),
            depth_eps=float(lo["depth_eps"]),
            chunk_points=int(lo.get("chunk_points", 8192)),
            points_subsample=int(lo.get("points_subsample", 1)),
        )


def _skew(v):
    x, y, z = jnp.moveaxis(v, -1, 0)
    o = jnp.zeros_like(x)
    return jnp.stack([o, -z, y, z, o, -x, -y, x, o], axis=-1).reshape(
        v.shape[:-1] + (3, 3)
    )


# ---------------------------------------------------------------------------
# Residual builders.  Each returns (err (E,C,R), J_local (E,C,R,7),
# valid (E,C), w_sigma (R,) inverse-sigma per residual row).
# J_local is wrt a LEFT perturbation in camera-i's frame at Xj_Ci.
# ---------------------------------------------------------------------------

def _residual_point(Tij, Xi, Xj, ind_Xi, K, img_wh, cfg: BAConfig):
    """Point-alignment residual (gn_kernels.cu:455-723)."""
    Xj_Ci = sim3.act(Tij[:, None, :], Xj)
    err = Xj_Ci - Xi
    E, C = err.shape[:2]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=err.dtype), (E, C, 3, 3))
    J = jnp.concatenate(
        [eye, -_skew(Xj_Ci), Xj_Ci[..., :, None]], axis=-1
    )  # (E,C,3,7)
    valid = jnp.ones((E, C), dtype=bool)
    sig = jnp.full((3,), 1.0 / cfg.sigma_point)
    return err, J, valid, sig


def _residual_ray(Tij, Xi, Xj, ind_Xi, K, img_wh, cfg: BAConfig):
    """Ray+distance residual (gn_kernels.cu:813-1138)."""
    Xj_Ci = sim3.act(Tij[:, None, :], Xj)
    norm_i = jnp.maximum(jnp.linalg.norm(Xi, axis=-1, keepdims=True), 1e-12)
    norm_j = jnp.maximum(
        jnp.linalg.norm(Xj_Ci, axis=-1, keepdims=True), 1e-12
    )
    ri = Xi / norm_i
    rj = Xj_Ci / norm_j

    err = jnp.concatenate([rj - ri, norm_j - norm_i], axis=-1)  # (E,C,4)

    E, C = err.shape[:2]
    eye = jnp.eye(3, dtype=err.dtype)
    # dr/dP = (I - r r^T)/|P|
    dr_dP = (eye - rj[..., :, None] * rj[..., None, :]) / norm_j[..., None]
    zeros1 = jnp.zeros((E, C, 3, 1), dtype=err.dtype)
    J_ray = jnp.concatenate([dr_dP, -_skew(rj), zeros1], axis=-1)  # (E,C,3,7)
    J_dist = jnp.concatenate(
        [rj, jnp.zeros_like(rj), norm_j], axis=-1
    )[..., None, :]  # (E,C,1,7)
    J = jnp.concatenate([J_ray, J_dist], axis=-2)  # (E,C,4,7)
    valid = jnp.ones((E, C), dtype=bool)
    sig = jnp.asarray(
        [1.0 / cfg.sigma_ray] * 3 + [1.0 / cfg.sigma_dist]
    )
    return err, J, valid, sig


def _residual_calib(Tij, Xi, Xj, ind_Xi, K, img_wh, cfg: BAConfig):
    """Calibrated pixel + log-depth residual (gn_kernels.cu:1231-1543)."""
    width, height = img_wh
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    Xj_Ci = sim3.act(Tij[:, None, :], Xj)
    zi = Xi[..., 2]
    zj = Xj_Ci[..., 2]
    valid_z = (zj > cfg.depth_eps) & (zi > cfg.depth_eps)
    zj_safe = jnp.where(valid_z, zj, 1.0)
    zi_safe = jnp.where(valid_z, zi, 1.0)
    zj_inv = 1.0 / zj_safe

    x_div_z = Xj_Ci[..., 0] * zj_inv
    y_div_z = Xj_Ci[..., 1] * zj_inv
    u = fx * x_div_z + cx
    v = fy * y_div_z + cy

    u_t = (ind_Xi % width).astype(u.dtype)
    v_t = (ind_Xi // width).astype(u.dtype)

    valid_u = (u > cfg.pixel_border) & (u < width - 1 - cfg.pixel_border)
    valid_v = (v > cfg.pixel_border) & (v < height - 1 - cfg.pixel_border)
    valid = valid_z & valid_u & valid_v

    err = jnp.stack(
        [u - u_t, v - v_t, jnp.log(zj_safe) - jnp.log(zi_safe)], axis=-1
    )

    o = jnp.zeros_like(zj_inv)
    one = jnp.ones_like(zj_inv)
    Ju = jnp.stack(
        [fx * zj_inv, o, -fx * x_div_z * zj_inv,
         -fx * x_div_z * y_div_z, fx * (1 + x_div_z * x_div_z),
         -fx * y_div_z, o], axis=-1,
    )
    Jv = jnp.stack(
        [o, fy * zj_inv, -fy * y_div_z * zj_inv,
         -fy * (1 + y_div_z * y_div_z), fy * x_div_z * y_div_z,
         fy * x_div_z, o], axis=-1,
    )
    Jz = jnp.stack(
        [o, o, zj_inv, y_div_z, -x_div_z, o, one], axis=-1
    )
    J = jnp.stack([Ju, Jv, Jz], axis=-2)  # (E,C,3,7)
    sig = jnp.asarray(
        [1.0 / cfg.sigma_pixel] * 2 + [1.0 / cfg.sigma_depth]
    )
    return err, J, valid, sig


_RESIDUALS = {
    "point": (_residual_point, 3),
    "ray": (_residual_ray, 4),
    "calib": (_residual_calib, 3),
}


# ---------------------------------------------------------------------------
# SoA residual rows (points in the 128-lane axis).
#
# Each builder returns a list of residual rows
#     (sig, r (E,C), J [7 entries: (E,C) | python scalar | None], valid)
# where None marks a STRUCTURAL zero of the Jacobian (skipped in the
# normal-equation products) and `valid` an optional (E,C) row mask.  The
# einsum formulation materialized (E,C,R,7) Jacobian/weight tensors —
# ~0.7 GB of HBM traffic per GN iteration at production scale; writing the
# 28 unique H entries + 7 g entries as explicit sum-of-products over (E,C)
# lanes lets XLA multi-output-fuse each iteration into one pass over the
# ~160 MB of pregathered inputs (same trick as the frame tracker's GN).
# ---------------------------------------------------------------------------

def _act_soa(Tij, Xj):
    """Sim(3) action on SoA points Xj (E, 3, C) -> (px, py, pz) lanes."""
    # (E,) rotation entries -> (E, 1) for broadcasting against (E, C)
    R = tuple(tuple(e[:, None] for e in row)
              for row in sim3.quat_rot_entries(Tij[:, 3:7]))
    s = Tij[:, 7:8]
    xj, yj, zj = Xj[:, 0], Xj[:, 1], Xj[:, 2]
    px = s * (R[0][0] * xj + R[0][1] * yj + R[0][2] * zj) + Tij[:, 0:1]
    py = s * (R[1][0] * xj + R[1][1] * yj + R[1][2] * zj) + Tij[:, 1:2]
    pz = s * (R[2][0] * xj + R[2][1] * yj + R[2][2] * zj) + Tij[:, 2:3]
    return px, py, pz


def _soa_point(Tij, Xi, Xj, ind, K, img_wh, cfg: BAConfig):
    """SoA point-alignment rows (J = [I | -skew(p) | p])."""
    px, py, pz = _act_soa(Tij, Xj)
    sp = 1.0 / cfg.sigma_point
    return [
        (sp, px - Xi[:, 0], [1.0, None, None, None, pz, -py, px], None),
        (sp, py - Xi[:, 1], [None, 1.0, None, -pz, None, px, py], None),
        (sp, pz - Xi[:, 2], [None, None, 1.0, py, -px, None, pz], None),
    ]


def _soa_ray(Tij, Xi, Xj, ind, K, img_wh, cfg: BAConfig):
    """SoA ray+distance rows (J_ray = [(I - r r^T)/d | -skew(r) | 0],
    J_dist = [r | 0 | d])."""
    px, py, pz = _act_soa(Tij, Xj)
    d = jnp.maximum(jnp.sqrt(px * px + py * py + pz * pz), 1e-12)
    dinv = 1.0 / d
    rx, ry, rz = px * dinv, py * dinv, pz * dinv

    xi, yi, zi = Xi[:, 0], Xi[:, 1], Xi[:, 2]
    di = jnp.maximum(jnp.sqrt(xi * xi + yi * yi + zi * zi), 1e-12)
    di_inv = 1.0 / di
    rix, riy, riz = xi * di_inv, yi * di_inv, zi * di_inv

    d3 = dinv * dinv * dinv
    axx = dinv - px * px * d3
    ayy = dinv - py * py * d3
    azz = dinv - pz * pz * d3
    axy = -px * py * d3
    axz = -px * pz * d3
    ayz = -py * pz * d3

    sr, sd = 1.0 / cfg.sigma_ray, 1.0 / cfg.sigma_dist
    return [
        (sr, rx - rix, [axx, axy, axz, None, rz, -ry, None], None),
        (sr, ry - riy, [axy, ayy, ayz, -rz, None, rx, None], None),
        (sr, rz - riz, [axz, ayz, azz, ry, -rx, None, None], None),
        (sd, d - di, [rx, ry, rz, None, None, None, d], None),
    ]


def _soa_calib(Tij, Xi, Xj, ind, K, img_wh, cfg: BAConfig):
    """SoA calibrated pixel + log-depth rows."""
    width, height = img_wh
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    px, py, pz = _act_soa(Tij, Xj)
    zi = Xi[:, 2]
    valid_z = (pz > cfg.depth_eps) & (zi > cfg.depth_eps)
    pz_safe = jnp.where(valid_z, pz, 1.0)
    zi_safe = jnp.where(valid_z, zi, 1.0)
    zj_inv = 1.0 / pz_safe
    xz = px * zj_inv
    yz = py * zj_inv
    u = fx * xz + cx
    v = fy * yz + cy
    u_t = (ind % width).astype(u.dtype)
    v_t = (ind // width).astype(u.dtype)
    valid = (
        valid_z
        & (u > cfg.pixel_border) & (u < width - 1 - cfg.pixel_border)
        & (v > cfg.pixel_border) & (v < height - 1 - cfg.pixel_border)
    )
    sp, sz = 1.0 / cfg.sigma_pixel, 1.0 / cfg.sigma_depth
    return [
        (sp, u - u_t,
         [fx * zj_inv, None, -fx * xz * zj_inv,
          -fx * xz * yz, fx * (1 + xz * xz), -fx * yz, None], valid),
        (sp, v - v_t,
         [None, fy * zj_inv, -fy * yz * zj_inv,
          -fy * (1 + yz * yz), fy * xz * yz, fy * xz, None], valid),
        (sz, jnp.log(pz_safe) - jnp.log(zi_safe),
         [None, None, zj_inv, yz, -xz, None, 1.0], valid),
    ]


_SOA_RESIDUALS = {
    _residual_point: _soa_point,
    _residual_ray: _soa_ray,
    _residual_calib: _soa_calib,
}


def _soa_accumulate(rows, sqw_c, huber_k):
    """Fused normal equations over SoA rows: returns H7 (E, 7, 7),
    g7 (E, 7) accumulated in fp32 (g = sum w J^T err, matching the einsum
    formulation this replaces)."""
    E = sqw_c.shape[0]
    H = [[0.0] * 7 for _ in range(7)]
    g = [0.0] * 7
    for sig, r, J, vmask in rows:
        sw = sig * sqw_c
        if vmask is not None:
            sw = jnp.where(vmask, sw, 0.0)
        w = huber(sw * r, k=huber_k) * (sw * sw)
        wr = w * r
        for k in range(7):
            Jk = J[k]
            if Jk is None:
                continue
            g[k] = g[k] + jnp.sum(wr * Jk, axis=-1)
            wJk = w * Jk
            for l in range(k, 7):
                Jl = J[l]
                if Jl is None:
                    continue
                H[k][l] = H[k][l] + jnp.sum(wJk * Jl, axis=-1)

    z = jnp.zeros((E,), jnp.float32)
    ent = lambda k, l: (H[k][l] if l >= k else H[l][k]) + z
    H7 = jnp.stack(
        [jnp.stack([ent(k, l) for l in range(7)], axis=-1)
         for k in range(7)], axis=-2,
    )
    g7 = jnp.stack([gk + z for gk in g], axis=-1)
    return H7, g7


# ---------------------------------------------------------------------------
# Accumulation + assembly + solve
# ---------------------------------------------------------------------------

class EdgeData(NamedTuple):
    """Iteration-invariant per-edge point data, pregathered ONCE per solve.

    The idx_ii2jj permutation gather (E x N random rows) and the gating
    products do not depend on the pose iterate; re-running them inside the
    GN loop made the gather engine (~90 Mrows/s) the BA bottleneck.
    Layout is SoA — (E, 3, Np) with points in the 128-lane axis — so the
    per-iteration accumulation reads full vectors (the transpose runs once
    per solve, outside the GN loop).  All arrays are padded along the point
    axis to a multiple of the chunk size with zero static weight, so the
    chunk scan needs no range masking."""
    Xi: jnp.ndarray    # (E, 3, Np) gathered i-side points (matched order)
    Xj: jnp.ndarray    # (E, 3, Np) j-side points (raster order)
    sqw: jnp.ndarray   # (E, Np) sqrt(Q) with all static gates folded in
    ind: jnp.ndarray   # (E, Np) matched linear indices (calib target px)


_flat_fallback_warned: set = set()


def _warn_flat_fallback(why: str):
    """One-time warning when subsample_points degrades to the flat
    column-biased stride — a resolution/config change that breaks the
    (h, w) divisibility would otherwise silently reintroduce the 3.2x
    cliff-scene ATE loss the 2D pattern exists to prevent (ADVICE r3).
    Shapes are static, so this fires at trace time, not per step."""
    if why not in _flat_fallback_warned:
        _flat_fallback_warned.add(why)
        import warnings

        warnings.warn(
            f"subsample_points: falling back to the flat [:, ::s] stride "
            f"({why}) — column-biased BA residual coverage; pick a "
            f"resolution divisible by the stride factors", stacklevel=3)


def subsample_points(a, s: int, img_wh):
    """Spatially balanced stride-``s`` subset along the flat raster axis 1.

    A flat ``[:, ::s]`` covers only every s-th image COLUMN (all rows) —
    systematically blind to (1 - 1/s) of the columns, which measurably
    degrades BA accuracy on depth-discontinuity scenes (cliff-scene
    oracle ATE 3.2x worse at s=4, tests/test_adversarial.py).  Factoring
    s into near-square strides (sv, su) and taking the (::sv, ::su) 2D
    grid keeps the same residual count (same TPU gather rows) with
    unbiased coverage.  Falls back to the flat stride when the factors
    don't divide (h, w)."""
    if s <= 1:
        return a
    if img_wh is None:
        _warn_flat_fallback("img_wh=None")
        return a[:, ::s]
    w, h = img_wh
    sv = int(s ** 0.5)
    while s % sv:
        sv -= 1
    su = s // sv
    if a.shape[1] != h * w or h % sv or w % su:
        _warn_flat_fallback(
            f"shape[1]={a.shape[1]} vs h*w={h * w}, "
            f"(h, w)=({h}, {w}) not divisible by (sv, su)=({sv}, {su})"
        )
        return a[:, ::s]
    E = a.shape[0]
    rest = a.shape[2:]
    return a.reshape(E, h, w, *rest)[:, ::sv, ::su].reshape(
        E, (h // sv) * (w // su), *rest)


def _pregather_edges(Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                     edge_valid, cfg: BAConfig, C: int,
                     img_wh=None) -> EdgeData:
    s = max(int(cfg.points_subsample), 1)
    if s > 1:
        # Statistical point subsampling (config local_opt.points_subsample):
        # the BA residual set is a balanced stride-s subset of each edge's
        # pixels (subsample_points).  The pregather row gather is the BA
        # round's dominant cost on TPU (row-count-bound gather engine), so
        # cost drops ~1/s; the pose system keeps N/s >= ~49k residuals per
        # edge at s=4.
        sub = lambda a: subsample_points(a, s, img_wh)  # noqa: E731
        idx_ii2jj = sub(idx_ii2jj)
        valid_match = sub(valid_match)
        Q = sub(Q)
    E, N = idx_ii2jj.shape
    P, Nx = Xs.shape[0], Xs.shape[1]
    ind = jnp.where(valid_match, idx_ii2jj, 0)
    # ONE packed random gather for the i side (rows are the cost on TPU)
    src_i = jnp.concatenate(
        [Xs.reshape(P * Nx, 3), Cs.reshape(P * Nx, 1)], axis=-1
    )
    gi = src_i[ii[:, None] * Nx + ind]                # (E, N, 4)
    Xi, ci = jnp.moveaxis(gi[..., :3], -1, 1), gi[..., 3]
    Xj = jnp.moveaxis(subsample_points(Xs[jj], s, img_wh), -1, 1)
    cj = subsample_points(Cs[jj], s, img_wh)          # (E, N)
    static_valid = (
        valid_match & (Q > cfg.Q_conf) & (ci > cfg.C_conf)
        & (cj > cfg.C_conf) & edge_valid[:, None]
    )
    sqw = jnp.where(static_valid, jnp.sqrt(jnp.maximum(Q, 0.0)), 0.0)

    pad = (-N) % C
    if pad:
        pz = lambda A: jnp.pad(
            A, ((0, 0),) * (A.ndim - 1) + ((0, pad),))
        Xi, Xj, sqw, ind = pz(Xi), pz(Xj), pz(sqw), pz(ind)
    return EdgeData(Xi, Xj, sqw, ind)


def _accumulate_pre(residual, R, Twc, ii, jj, pre: EdgeData, K, img_wh,
                    cfg: BAConfig):
    """Scan over point chunks of pregathered edge data, returning
    Hs (E, 14, 14) and gs (E, 14).

    Accumulates in the LOCAL (camera-i) frame: the world-frame adjoint is
    constant per edge, so H_w = A^T H_loc A is applied ONCE per edge after
    the point reduction; and since Ji = -Jj exactly, only one 7x7 block is
    unique — the 14x14 edge system is assembled at the end.  The normal
    equations are built as fused per-entry SoA reductions (_soa_accumulate)
    rather than einsum over a materialized (E, C*R, 7) Jacobian."""
    E, Np = pre.sqw.shape
    C = min(cfg.chunk_points, Np)
    n_chunks = Np // C
    soa = _SOA_RESIDUALS[residual]

    Ti = Twc[ii]  # (E,8)
    Tij = sim3.rel(Ti, Twc[jj])

    def chunk(carry, c0):
        H_acc, g_acc = carry
        sl = lambda A: jax.lax.dynamic_slice_in_dim(A, c0, C, axis=-1)
        Xi, Xj, sqw_c, ind_c = sl(pre.Xi), sl(pre.Xj), sl(pre.sqw), \
            sl(pre.ind)

        # Row weights (gn_kernels.cu:949-978): sqrt_w = sig*sqrt(q);
        # w = huber(sqrt_w * err) * sqrt_w^2; static gates are already
        # folded into sqw (zero weight kills padded/invalid points).
        rows = soa(Tij, Xi, Xj, ind_c, K, img_wh, cfg)
        H7, g7 = _soa_accumulate(rows, sqw_c, cfg.huber_k)
        return (H_acc + H7, g_acc + g7), None

    H0 = jnp.zeros((E, 7, 7), jnp.float32)
    g0 = jnp.zeros((E, 7), jnp.float32)
    starts = jnp.arange(n_chunks) * C
    (H_loc, g_loc), _ = jax.lax.scan(chunk, (H0, g0), starts)

    # Per-edge congruence to world frame: row k of A is e_k @ Adj^{-1}
    A = sim3.apply_adj_inv(
        Ti[:, None, :],
        jnp.broadcast_to(jnp.eye(7, dtype=H_loc.dtype), (E, 7, 7)),
    )                                                   # (E, 7, 7)
    At = A.transpose(0, 2, 1)
    H7 = At @ H_loc @ A                                 # (E, 7, 7)
    g7 = (At @ g_loc[..., None])[..., 0]                # (E, 7)

    Hs = jnp.concatenate(
        [jnp.concatenate([H7, -H7], axis=-1),
         jnp.concatenate([-H7, H7], axis=-1)], axis=-2,
    )                                                   # (E, 14, 14)
    gs = jnp.concatenate([-g7, g7], axis=-1)            # (E, 14)
    return Hs, gs


def _accumulate_edge_systems(residual, R, Twc, Xs, Cs, ii, jj, idx_ii2jj,
                             valid_match, Q, edge_valid, K, img_wh,
                             cfg: BAConfig):
    """Pregather + accumulate (kept for single-shot callers/tests; the GN
    loops pregather once and call _accumulate_pre per iteration)."""
    N = idx_ii2jj.shape[1]
    C = min(cfg.chunk_points, N)
    pre = _pregather_edges(Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                           edge_valid, cfg, C, img_wh)
    return _accumulate_pre(residual, R, Twc, ii, jj, pre, K, img_wh, cfg)


def _assemble_dense(Hs, gs, ii, jj, P, pin):
    """Scatter per-edge 14x14 blocks into the dense free-pose system.

    Returns (H (7F, 7F), g (7F,)) with F = P - pin.  Mirrors the triplet
    assembly of SparseBlock.update_lhs/rhs (gn_kernels.cu:71-113)."""
    F = P - pin
    io = ii - pin  # free index or negative (fixed)
    jo = jj - pin

    def safe(idx):
        return jnp.where(idx >= 0, idx, F)  # F = dump row

    Hb = jnp.zeros((F + 1, F + 1, 7, 7), jnp.float32)
    H_ii = Hs[:, :7, :7]
    H_ij = Hs[:, :7, 7:]
    H_ji = Hs[:, 7:, :7]
    H_jj = Hs[:, 7:, 7:]
    Hb = Hb.at[safe(io), safe(io)].add(H_ii)
    Hb = Hb.at[safe(io), safe(jo)].add(
        jnp.where((io >= 0) & (jo >= 0), 1.0, 0.0)[:, None, None] * H_ij
    )
    Hb = Hb.at[safe(jo), safe(io)].add(
        jnp.where((io >= 0) & (jo >= 0), 1.0, 0.0)[:, None, None] * H_ji
    )
    Hb = Hb.at[safe(jo), safe(jo)].add(H_jj)
    # note: fixed-index contributions land in the dump row/col and are cut
    H = Hb[:F, :F].transpose(0, 2, 1, 3).reshape(7 * F, 7 * F)

    gb = jnp.zeros((F + 1, 7), jnp.float32)
    gb = gb.at[safe(io)].add(gs[:, :7])
    gb = gb.at[safe(jo)].add(gs[:, 7:])
    g = gb[:F].reshape(7 * F)
    return H, g


def _solve_scaled(H, g, damping):
    """Jacobi-preconditioned damped Cholesky solve of H dx = g, fp32.

    Empty rows (padded poses with no edges) get unit diagonal so the
    factorization stays PD; their dx is 0 because g is 0 there."""
    d = jnp.diag(H)
    empty = d <= 0.0
    s = jnp.where(empty, 1.0, 1.0 / jnp.sqrt(jnp.maximum(d, 1e-20)))
    Hs = H * s[:, None] * s[None, :]
    Hs = Hs + jnp.diag(empty.astype(H.dtype) + damping)
    L = jnp.linalg.cholesky(Hs)
    y = jax.scipy.linalg.cho_solve((L, True), (s * g)[:, None])
    dx = s * y[:, 0]
    ok = jnp.all(jnp.isfinite(dx))
    return jnp.where(ok, dx, 0.0), ok


@functools.partial(
    jax.jit, static_argnames=("residual_type", "img_wh", "cfg")
)
def gauss_newton(Twc, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                 edge_valid, K, residual_type: str, img_wh,
                 cfg: BAConfig):
    """Full GN pose-graph solve (gauss_newton_{points,rays,calib}_cuda,
    gn_kernels.cu:725-811, 1140-1228, 1546-1638).

    Twc: (P, 8) Sim3 poses; Xs: (P, N, 3); Cs: (P, N, 1) or (P, N);
    ii, jj: (E,) int32 edge endpoints (two-way edges prepared by caller);
    idx_ii2jj: (E, N); valid_match: (E, N) or (E, N, 1); Q: (E, N);
    edge_valid: (E,) padding mask.  Returns (Twc', iters, delta_norm, ok).
    """
    residual, R = _RESIDUALS[residual_type]
    Cs2 = Cs[..., 0] if Cs.ndim == 3 else Cs
    vm2 = valid_match[..., 0] if valid_match.ndim == 3 else valid_match
    Q2 = Q[..., 0] if Q.ndim == 3 else Q

    # The idx_ii2jj permutation gather is pose-independent: gather ONCE,
    # outside the GN loop (it was ~E*N rows per iteration otherwise).
    C = min(cfg.chunk_points, idx_ii2jj.shape[1])
    pre = _pregather_edges(Xs, Cs2, ii, jj, idx_ii2jj, vm2, Q2,
                           edge_valid, cfg, C, img_wh)
    return gauss_newton_from_pre(Twc, pre, ii, jj, K, residual_type,
                                 img_wh, cfg)


def gauss_newton_from_pre(Twc, pre: EdgeData, ii, jj, K,
                          residual_type: str, img_wh, cfg: BAConfig):
    """The GN pose-graph loop on prebuilt :class:`EdgeData` — the entry
    point for the FactorGraph's incremental pregather cache (keyframe
    pointmaps are immutable once a newer keyframe exists, so the expensive
    permutation gather is cached across backend rounds and only refreshed
    for edges whose endpoint changed; global_opt.py)."""
    residual, R = _RESIDUALS[residual_type]
    P = Twc.shape[0]

    def body(state):
        Twc, it, delta, ok, done = state
        Hs, gs = _accumulate_pre(
            residual, R, Twc, ii, jj, pre, K, img_wh, cfg,
        )
        H, g = _assemble_dense(Hs, gs, ii, jj, P, cfg.pin)
        dx, solve_ok = _solve_scaled(H, g, cfg.damping)
        dx = -dx
        dx_pose = jnp.concatenate(
            [jnp.zeros((cfg.pin, 7), dx.dtype),
             dx.reshape(P - cfg.pin, 7)], axis=0
        )
        Twc_new = sim3.retr(Twc, dx_pose)
        delta_norm = jnp.linalg.norm(dx)
        converged = delta_norm < cfg.delta_norm
        return (
            jnp.where(solve_ok, Twc_new, Twc),
            it + 1, delta_norm, ok & solve_ok,
            converged | ~solve_ok,
        )

    def cond(state):
        _, it, _, _, done = state
        return (it < cfg.max_iters) & ~done

    init = (Twc, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf),
            jnp.ones((), bool), jnp.zeros((), bool))
    Twc, iters, delta, ok, _ = jax.lax.while_loop(cond, body, init)
    return Twc, iters, delta, ok
