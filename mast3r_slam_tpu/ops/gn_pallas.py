"""Pallas TPU kernel for the ray+dist Gauss-Newton normal equations.

One GN iteration of the frame tracker's Sim(3) solve needs 27 reductions
over the ~196k matched points (19 unique Hessian entries + 7 gradient
entries + cost — the closed form of tracker.opt_pose_ray_dist_sim3).
XLA emits them as a string of separate reduce kernels whose launch /
drain latency dominates the iteration (~88 us measured where the pure
VPU+HBM floor is ~30 us).  This kernel computes ALL accumulators in one
pass: each grid step loads a row-block of the SoA point data, evaluates
the residual/Jacobian closed form on the VPU, and writes 32 lane-vector
partial sums; the host-side wrapper folds the tiny (G, 32, 128) partial
tensor and solves the 7x7 system.

Mirrors the math of ``tracker.opt_pose_ray_dist_sim3`` (joint ray huber);
equivalence is asserted by tests/test_tracker.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import lie_sim3 as sim3

# accumulator layout in the (32, 128) output block
# 0..5   H_tt: xx, xy, xz, yy, yz, zz
# 6..8   s: sum w_r*r/d (x, y, z)         (the -skew(r)/d trans-rot block)
# 9..14  H_ww: xx, xy, xz, yy, yz, zz
# 15..17 H_ts: sum w_d*p (x, y, z)
# 18     H_ss: sum w_d*d^2
# 19..25 g (t xyz, w xyz, s)
# 26     cost (sum w_r e2 + w_d ed^2)
N_ACC = 32


def _gn_kernel(scal_ref, xf_ref, yf_ref, zf_ref, rkx_ref, rky_ref,
               rkz_ref, rkd_ref, wray_ref, wdist_ref, out_ref, *,
               huber_k):
    # scal: [R00..R22, tx, ty, tz, s] (13,) in SMEM
    R00, R01, R02 = scal_ref[0], scal_ref[1], scal_ref[2]
    R10, R11, R12 = scal_ref[3], scal_ref[4], scal_ref[5]
    R20, R21, R22 = scal_ref[6], scal_ref[7], scal_ref[8]
    tx, ty, tz, sc = scal_ref[9], scal_ref[10], scal_ref[11], scal_ref[12]

    xf = xf_ref[:]
    yf = yf_ref[:]
    zf = zf_ref[:]

    px = sc * (R00 * xf + R01 * yf + R02 * zf) + tx
    py = sc * (R10 * xf + R11 * yf + R12 * zf) + ty
    pz = sc * (R20 * xf + R21 * yf + R22 * zf) + tz

    d2 = px * px + py * py + pz * pz
    d = jnp.sqrt(jnp.maximum(d2, 1e-24))
    dinv = 1.0 / d
    rx, ry, rz = px * dinv, py * dinv, pz * dinv

    ex = rkx_ref[:] - rx
    ey = rky_ref[:] - ry
    ez = rkz_ref[:] - rz
    ed = rkd_ref[:] - d

    w_ray = wray_ref[:]
    w_dist = wdist_ref[:]
    e2 = ex * ex + ey * ey + ez * ez

    def huber(r):
        ra = jnp.abs(r)
        return jnp.where(ra < huber_k, 1.0,
                         huber_k / jnp.maximum(ra, 1e-12))

    w_r = huber(w_ray * jnp.sqrt(e2)) * w_ray * w_ray
    w_d = huber(w_dist * ed) * w_dist * w_dist

    qxx, qyy, qzz = rx * rx, ry * ry, rz * rz
    qxy, qxz, qyz = rx * ry, rx * rz, ry * rz
    wrd2 = w_r * (dinv * dinv)
    wrd = w_r * dinv
    rTe = rx * ex + ry * ey + rz * ez

    rows = [
        wrd2 * (1 - qxx) + w_d * qxx,        # 0  H_tt xx
        (w_d - wrd2) * qxy,                  # 1
        (w_d - wrd2) * qxz,                  # 2
        wrd2 * (1 - qyy) + w_d * qyy,        # 3
        (w_d - wrd2) * qyz,                  # 4
        wrd2 * (1 - qzz) + w_d * qzz,        # 5
        wrd * rx,                            # 6  s
        wrd * ry,                            # 7
        wrd * rz,                            # 8
        w_r * (1 - qxx),                     # 9  H_ww
        -w_r * qxy,                          # 10
        -w_r * qxz,                          # 11
        w_r * (1 - qyy),                     # 12
        -w_r * qyz,                          # 13
        w_r * (1 - qzz),                     # 14
        w_d * px,                            # 15 H_ts
        w_d * py,                            # 16
        w_d * pz,                            # 17
        w_d * d2,                            # 18 H_ss
        w_r * (ex - rx * rTe) * dinv + w_d * ed * rx,   # 19 g_t
        w_r * (ey - ry * rTe) * dinv + w_d * ed * ry,   # 20
        w_r * (ez - rz * rTe) * dinv + w_d * ed * rz,   # 21
        w_r * (ry * ez - rz * ey),           # 22 g_w
        w_r * (rz * ex - rx * ez),           # 23
        w_r * (rx * ey - ry * ex),           # 24
        w_d * ed * d,                        # 25 g_s
        w_r * e2 + w_d * ed * ed,            # 26 cost*2
    ]
    acc = jnp.stack([jnp.sum(r, axis=0) for r in rows])   # (27, 128)
    pad = jnp.zeros((N_ACC - len(rows), acc.shape[1]), acc.dtype)
    out_ref[0] = jnp.concatenate([acc, pad], axis=0)


class GNPointData:
    """SoA (rows, 128) reshapes of the per-point inputs, built once per
    solve and reused by every GN iteration."""

    def __init__(self, Xf, rd_k_t, w_ray, w_dist, block_rows=256):
        n = Xf.shape[0]
        self.n = n
        lanes = 128
        rows = -(-n // lanes)
        rows_pad = -(-rows // block_rows) * block_rows
        self.grid = rows_pad // block_rows
        self.block_rows = block_rows

        def shape2d(v, fill=0.0):
            v = jnp.pad(v, (0, rows_pad * lanes - n),
                        constant_values=fill)
            return v.reshape(rows_pad, lanes)

        self.xf = shape2d(Xf[:, 0])
        self.yf = shape2d(Xf[:, 1])
        self.zf = shape2d(Xf[:, 2])
        self.rkx = shape2d(rd_k_t[0])
        self.rky = shape2d(rd_k_t[1])
        self.rkz = shape2d(rd_k_t[2])
        self.rkd = shape2d(rd_k_t[3])
        # zero weight kills padded points
        self.wray = shape2d(w_ray)
        self.wdist = shape2d(w_dist)

    def tree(self):
        return (self.xf, self.yf, self.zf, self.rkx, self.rky, self.rkz,
                self.rkd, self.wray, self.wdist)


def _rot_scalars(T):
    """[R00..R22, t, s] (13,) from a Sim3 embedding (8,)."""
    Re = sim3.quat_rot_entries(T[3:7])
    return jnp.stack([e for row in Re for e in row] + [T[0], T[1], T[2], T[7]])


def gn_accumulate(pre: GNPointData, T, huber_k, interpret=False):
    """One fused pass: returns (H (7,7), g (7,), cost ()) for the ray+dist
    closed form at pose T."""
    scal = _rot_scalars(T)
    G = pre.grid
    BR = pre.block_rows
    blk = lambda: pl.BlockSpec((BR, 128), lambda i: (i, 0))

    part = pl.pallas_call(
        functools.partial(_gn_kernel, huber_k=huber_k),
        out_shape=jax.ShapeDtypeStruct((G, N_ACC, 128), jnp.float32),
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [blk() for _ in range(9)],
        out_specs=pl.BlockSpec((1, N_ACC, 128), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(scal, *pre.tree())

    a = jnp.sum(part, axis=(0, 2))           # (32,)
    tt = a[0:6]
    s3 = a[6:9]
    ww = a[9:15]
    ts = a[15:18]
    ss = a[18]
    g = a[19:26]
    cost = 0.5 * a[26]

    z = jnp.zeros(())
    sx, sy, sz = s3[0], s3[1], s3[2]
    H = jnp.asarray([
        [tt[0], tt[1], tt[2], z,     sz,   -sy,  ts[0]],
        [tt[1], tt[3], tt[4], -sz,   z,     sx,  ts[1]],
        [tt[2], tt[4], tt[5],  sy,  -sx,   z,    ts[2]],
        [z,     -sz,    sy,   ww[0], ww[1], ww[2], z],
        [sz,    z,     -sx,   ww[1], ww[3], ww[4], z],
        [-sy,    sx,   z,     ww[2], ww[4], ww[5], z],
        [ts[0], ts[1], ts[2], z,     z,     z,    ss],
    ])
    return H, g, cost
