"""Frame tracker: two-view registration against the last keyframe.

Capability parity with `/root/reference/mast3r_slam/tracker.py` (asymmetric
inference + dense match, confidence gating, Gauss-Newton Sim(3) pose solve
in ray+distance or calibrated pixel+log-depth flavors, pointmap fusion
write-back, keyframe selection) — redesigned so the entire per-frame
computation is ONE jitted function: the GN loop runs as a
``lax.while_loop`` on device with traced convergence checks instead of the
reference's per-iteration ``.item()`` host syncs, and the Cholesky-failure
path (tracker.py:72-93) becomes a NaN-guard flag instead of a try/except.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .frame import Frame, FilteringMode, update_pointmap
from .inference import InferenceEngine
from .ops import gn_pallas
from .ops import lie_sim3 as sim3
from .ops.geometry import (
    constrain_points_to_ray,
    get_pixel_coords,
    point_to_ray_dist,
    project_calib,
)
from .ops.robust import check_convergence, huber, solve_spd_small


class TrackerConfig(NamedTuple):
    """Static tracking parameters (config['tracking'])."""
    min_match_frac: float = 0.05
    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber_k: float = 1.345
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: int = -10
    depth_eps: float = 1e-6
    filtering_mode: int = int(FilteringMode.WEIGHTED_POINTMAP)
    use_median_score: bool = True
    use_calib: bool = False
    # Huber weighting of the 3 ray-residual components: True = one weight
    # per point from the whitened ray-error NORM (Mahalanobis huber), which
    # lets the normal equations collapse to closed form (see
    # opt_pose_ray_dist_sim3); False = reference-exact per-component
    # weights.  Identical whenever all components are inliers; validated
    # equivalent on the oracle harness.
    joint_ray_huber: bool = True
    # Grid stride for the points fed to the GN pose solve (1 =
    # reference-exact all-pixels).  2 keeps ~49k gated correspondences for
    # a 7-dof solve — estimator std grows by 2x sqrt-law, far below pixel
    # noise — and cuts the row-bound match gather + the GN reductions 4x.
    # Match/keyframe fractions become subgrid estimates; the uniqueness
    # scatter stays full-res.  Validated ATE-neutral on the oracle.
    point_subsample: int = 1

    @classmethod
    def from_config(cls, cfg: dict) -> "TrackerConfig":
        t = cfg["tracking"]
        return cls(
            min_match_frac=float(t["min_match_frac"]),
            max_iters=int(t["max_iters"]),
            C_conf=float(t["C_conf"]),
            Q_conf=float(t["Q_conf"]),
            rel_error=float(t["rel_error"]),
            delta_norm=float(t["delta_norm"]),
            huber_k=float(t["huber"]),
            match_frac_thresh=float(t["match_frac_thresh"]),
            sigma_ray=float(t["sigma_ray"]),
            sigma_dist=float(t["sigma_dist"]),
            sigma_pixel=float(t["sigma_pixel"]),
            sigma_depth=float(t["sigma_depth"]),
            pixel_border=int(t["pixel_border"]),
            depth_eps=float(t["depth_eps"]),
            filtering_mode=int(
                FilteringMode.from_str(t["filtering_mode"])
            ),
            use_median_score=t.get("filtering_score", "median") == "median",
            use_calib=bool(cfg.get("use_calib", False)),
            joint_ray_huber=bool(t.get("joint_ray_huber", True)),
            point_subsample=int(t.get("point_subsample", 1)),
        )


# ---------------------------------------------------------------------------
# Gauss-Newton Sim(3) solvers (tracker.py:156-266 equivalents)
# ---------------------------------------------------------------------------

def _fuse_pose_jacobian(J_res, pW):
    """J = -(J_res @ [I | -skew(pW) | pW]) computed with elementwise/cross
    ops instead of 196k-batched tiny matmuls (pathological on TPU).

    J_res: (n, R, 3) residual Jacobian wrt the transformed point;
    pW: (n, 3).  Returns (n, R, 7).
    Identity: row a @ skew(p) = a x p.
    """
    p = pW[:, None, :]
    rot = jnp.cross(J_res, p)                      # (n, R, 3)
    scl = jnp.sum(J_res * p, axis=-1, keepdims=True)
    return jnp.concatenate([-J_res, rot, -scl], axis=-1)

def _gn_solve_7x7(sqrt_info, r, J, huber_k):
    """Whiten, robustify, assemble the 7x7 normal equations and solve
    (reference FrameTracker.solve, tracker.py:156-171).

    sqrt_info, r: (n, R); J: (n, R, 7).  Returns (tau (7,), cost, ok).
    """
    whitened_r = sqrt_info * r
    robust = sqrt_info * jnp.sqrt(huber(whitened_r, k=huber_k))
    A = (robust[..., None] * J).reshape(-1, 7)
    b = (robust * r).reshape(-1, 1)
    H = A.T @ A
    g = -(A.T @ b)[:, 0]
    cost = 0.5 * jnp.sum(b * b)

    tau, spd_ok = solve_spd_small(H, g)
    ok = spd_ok & jnp.all(jnp.isfinite(tau))
    return jnp.where(ok, tau, jnp.zeros_like(tau)), cost, ok


def opt_pose_ray_dist_sim3(Xf, Xk, T_init, Qk, valid, cfg: TrackerConfig):
    """Uncalibrated GN: ray + distance residuals
    (tracker.py:173-214). Xf, Xk: (n, 3); Qk, valid: (n, 1).
    Returns (T_CkCf, ok).

    TPU layout: the whole iteration runs in structure-of-arrays form with
    the POINT axis in the 128-lane dimension.  Three bodies, fastest first:
    a single-pass Pallas accumulation of the closed-form normal equations
    (default on TPU; ops/gn_pallas.py), the same closed form as XLA
    reductions (MAST3R_GN_PALLAS=0), and the reference-exact per-component
    huber row expansion (joint_ray_huber=False).
    """
    n = Xf.shape[0]
    vq = (valid * jnp.sqrt(Qk))[:, 0]                # (n,)
    w_ray = (1.0 / cfg.sigma_ray) * vq
    w_dist = (1.0 / cfg.sigma_dist) * vq
    sqrt_info_t = jnp.stack([w_ray, w_ray, w_ray, w_dist])  # (4, n)

    dk = jnp.sqrt(jnp.maximum(jnp.sum(Xk * Xk, axis=-1), 1e-24))
    rd_k_t = jnp.concatenate([Xk.T / dk[None, :], dk[None, :]])  # (4, n)

    def residuals_and_J(T):
        """SoA ray+dist residuals and fused pose Jacobian.

        Jacobian identity (see _fuse_pose_jacobian): for residual-row
        gradient a = d res/d p (3, n) at the transformed point p,
        J_row = [-a | a x p | -(a . p)].
        """
        p = sim3.act(T, Xf)                          # (n, 3) -> transpose
        px, py, pz = p.T
        d2 = px * px + py * py + pz * pz
        d = jnp.sqrt(jnp.maximum(d2, 1e-24))
        dinv = 1.0 / d
        rx, ry, rz = px * dinv, py * dinv, pz * dinv

        # residual rows (4, n): rd_k - rd(p)
        r0 = rd_k_t[0] - rx
        r1 = rd_k_t[1] - ry
        r2 = rd_k_t[2] - rz
        r3 = rd_k_t[3] - d

        # d(r)/dp entries: (I - r r^T)/d, plus d(d)/dp = r
        d3 = dinv * dinv * dinv
        axx = dinv - px * px * d3
        ayy = dinv - py * py * d3
        azz = dinv - pz * pz * d3
        axy = -px * py * d3
        axz = -px * pz * d3
        ayz = -py * pz * d3

        def row(ax, ay, az):
            # [-a | a x p | -(a . p)] as a list of 7 (n,) arrays
            return [-ax, -ay, -az,
                    ay * pz - az * py,
                    az * px - ax * pz,
                    ax * py - ay * px,
                    -(ax * px + ay * py + az * pz)]

        J_rows = [
            row(axx, axy, axz),       # ray x
            row(axy, ayy, ayz),       # ray y
            row(axz, ayz, azz),       # ray z
            row(rx, ry, rz),          # dist
        ]
        return [r0, r1, r2, r3], J_rows

    def cond(state):
        T, old_cost, i, done, ok = state
        return (i < cfg.max_iters) & ~done

    def body_closed_form(state):
        """Closed-form normal equations under per-point (joint) ray Huber.

        With one robust weight per point the ray rows' 3x7 Jacobian block
        J_ray = [-(I - r r^T)/d | skew(r) | 0] (the scale column is
        EXACTLY zero: rays are scale-invariant) and the dist row
        J_dist = [-r | 0 | -d] collapse the 7x7 system to 19 unique H
        reductions + 7 g reductions with ~half the per-point VPU flops of
        the generic row expansion:
          H_tt   = sum  (w_r/d^2) P + w_d q        (P = I - r r^T, q = r r^T)
          H_tw   = sum -w_r skew(r)/d              (3 unique entries)
          H_ts   = sum  w_d p                      (p = d r)
          H_ww   = sum  w_r P
          H_ss   = sum  w_d d^2
          g      = sum [w_r A e + w_d e_d r ; w_r (r x e) ; w_d e_d d]
        (A e = (e - r (r.e))/d; signs follow the g = -J^T W res convention
        of the generic path.)
        """
        T, old_cost, i, done, ok = state
        p = sim3.act(T, Xf)                            # (n, 3)
        px, py, pz = p.T
        d2 = px * px + py * py + pz * pz
        d = jnp.sqrt(jnp.maximum(d2, 1e-24))
        dinv = 1.0 / d
        rx, ry, rz = px * dinv, py * dinv, pz * dinv

        ex = rd_k_t[0] - rx
        ey = rd_k_t[1] - ry
        ez = rd_k_t[2] - rz
        ed = rd_k_t[3] - d

        w_ray = sqrt_info_t[0]
        w_dist = sqrt_info_t[3]
        e2 = ex * ex + ey * ey + ez * ez
        w_r = huber(w_ray * jnp.sqrt(e2), k=cfg.huber_k) * w_ray * w_ray
        w_d = huber(w_dist * ed, k=cfg.huber_k) * w_dist * w_dist
        new_cost = 0.5 * (jnp.sum(w_r * e2) + jnp.sum(w_d * ed * ed))

        qxx, qyy, qzz = rx * rx, ry * ry, rz * rz
        qxy, qxz, qyz = rx * ry, rx * rz, ry * rz
        wrd2 = w_r * (dinv * dinv)
        wrd = w_r * dinv

        # H entries (upper triangle), layout [t(3), w(3), s(1)]
        tt = [
            jnp.sum(wrd2 * (1 - qxx) + w_d * qxx),
            jnp.sum((w_d - wrd2) * qxy),
            jnp.sum((w_d - wrd2) * qxz),
            jnp.sum(wrd2 * (1 - qyy) + w_d * qyy),
            jnp.sum((w_d - wrd2) * qyz),
            jnp.sum(wrd2 * (1 - qzz) + w_d * qzz),
        ]
        sx = jnp.sum(wrd * rx)
        sy = jnp.sum(wrd * ry)
        sz = jnp.sum(wrd * rz)
        ww = [
            jnp.sum(w_r * (1 - qxx)), jnp.sum(-w_r * qxy),
            jnp.sum(-w_r * qxz), jnp.sum(w_r * (1 - qyy)),
            jnp.sum(-w_r * qyz), jnp.sum(w_r * (1 - qzz)),
        ]
        tsx = jnp.sum(w_d * px)
        tsy = jnp.sum(w_d * py)
        tsz = jnp.sum(w_d * pz)
        ss = jnp.sum(w_d * d2)

        zero = jnp.zeros(())
        H = jnp.asarray([
            [tt[0], tt[1], tt[2], zero,  sz,   -sy,  tsx],
            [tt[1], tt[3], tt[4], -sz,   zero,  sx,  tsy],
            [tt[2], tt[4], tt[5],  sy,  -sx,   zero, tsz],
            [zero,  -sz,    sy,   ww[0], ww[1], ww[2], zero],
            [sz,    zero,  -sx,   ww[1], ww[3], ww[4], zero],
            [-sy,    sx,   zero,  ww[2], ww[4], ww[5], zero],
            [tsx,   tsy,   tsz,   zero,  zero,  zero,  ss],
        ])

        rTe = rx * ex + ry * ey + rz * ez
        g = jnp.asarray([
            jnp.sum(w_r * (ex - rx * rTe) * dinv + w_d * ed * rx),
            jnp.sum(w_r * (ey - ry * rTe) * dinv + w_d * ed * ry),
            jnp.sum(w_r * (ez - rz * rTe) * dinv + w_d * ed * rz),
            jnp.sum(w_r * (ry * ez - rz * ey)),
            jnp.sum(w_r * (rz * ex - rx * ez)),
            jnp.sum(w_r * (rx * ey - ry * ex)),
            jnp.sum(w_d * ed * d),
        ])

        tau, spd_ok = solve_spd_small(H, g)
        solve_ok = spd_ok & jnp.all(jnp.isfinite(tau))
        tau = jnp.where(solve_ok, tau, 0.0)
        T_new = sim3.retr(T, tau)
        conv = check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau
        )
        T_out = jnp.where(solve_ok, T_new, T)
        return (T_out, new_cost, i + 1, conv | ~solve_ok, ok & solve_ok)

    def body(state):
        T, old_cost, i, done, ok = state
        r_rows, J_rows = residuals_and_J(T)

        # Normal equations as 28+7+1 explicit fused reductions over n.
        # Stacking J into (4, 7, n) and using einsum materializes ~130 MB
        # of (28, n) temporaries per iteration (A, J_t, einsum operand
        # re-reads); writing each H/g entry as a sum-of-products over the
        # SoA (n,) lanes lets XLA multi-output-fuse the whole iteration
        # into one pass that only reads the ~6 MB of inputs.
        H_acc = [[0.0] * 7 for _ in range(7)]
        g_acc = [0.0] * 7
        cost_acc = 0.0
        for rr in range(4):
            w2 = sqrt_info_t[rr]
            whit = w2 * r_rows[rr]
            rob = w2 * jnp.sqrt(huber(whit, k=cfg.huber_k))
            rob2 = rob * rob
            b_r = rob * r_rows[rr]
            cost_acc = cost_acc + jnp.sum(b_r * b_r)
            jr = J_rows[rr]
            for k in range(7):
                g_acc[k] = g_acc[k] + jnp.sum(rob2 * jr[k] * r_rows[rr])
                for l in range(k, 7):
                    H_acc[k][l] = H_acc[k][l] + jnp.sum(
                        rob2 * jr[k] * jr[l])
        H = jnp.asarray(
            [[H_acc[k][l] if l >= k else H_acc[l][k] for l in range(7)]
             for k in range(7)])
        g = -jnp.asarray(g_acc)
        new_cost = 0.5 * cost_acc

        tau, spd_ok = solve_spd_small(H, g)
        solve_ok = spd_ok & jnp.all(jnp.isfinite(tau))
        tau = jnp.where(solve_ok, tau, 0.0)

        T_new = sim3.retr(T, tau)
        conv = check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau
        )
        T_out = jnp.where(solve_ok, T_new, T)
        return (T_out, new_cost, i + 1, conv | ~solve_ok, ok & solve_ok)

    def body_pallas(state):
        """Closed-form accumulation in ONE fused Pallas pass per iteration
        (ops/gn_pallas.py): XLA emits the 27 closed-form reductions as a
        string of separate kernels whose launch latency dominates the
        iteration; the kernel computes them in a single sweep."""
        T, old_cost, i, done, ok = state
        H, g, new_cost = gn_pallas.gn_accumulate(
            pallas_pre, T, cfg.huber_k,
            interpret=jax.default_backend() != "tpu",
        )
        tau, spd_ok = solve_spd_small(H, g)
        solve_ok = spd_ok & jnp.all(jnp.isfinite(tau))
        tau = jnp.where(solve_ok, tau, 0.0)
        T_new = sim3.retr(T, tau)
        conv = check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau
        )
        T_out = jnp.where(solve_ok, T_new, T)
        return (T_out, new_cost, i + 1, conv | ~solve_ok, ok & solve_ok)

    init = (T_init, jnp.inf, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.ones((), bool))
    if cfg.joint_ray_huber:
        if os.environ.get("MAST3R_GN_PALLAS", "1") != "0":
            pallas_pre = gn_pallas.GNPointData(Xf, rd_k_t, w_ray, w_dist)
            step = body_pallas
        else:
            step = body_closed_form
    else:
        step = body
    T, _, it, _, ok = jax.lax.while_loop(cond, step, init)
    return T, ok, it


def opt_pose_calib_sim3(Xf, Xk, T_init, Qk, valid, meas_k, valid_meas_k, K,
                        img_size, cfg: TrackerConfig):
    """Calibrated GN: pixel + log-depth residuals (tracker.py:216-266)."""
    vq = valid * jnp.sqrt(Qk)
    sqrt_info_pixel = (1.0 / cfg.sigma_pixel) * vq
    sqrt_info_depth = (1.0 / cfg.sigma_depth) * vq
    sqrt_info = jnp.concatenate(
        [jnp.repeat(sqrt_info_pixel, 2, axis=1), sqrt_info_depth], axis=1
    )

    def cond(state):
        T, old_cost, i, done, ok = state
        return (i < cfg.max_iters) & ~done

    def body(state):
        T, old_cost, i, done, ok = state
        Xf_Ck = sim3.act(T, Xf)
        pz, J_pz, valid_proj = project_calib(
            Xf_Ck, K, img_size, jacobian=True,
            border=cfg.pixel_border, z_eps=cfg.depth_eps,
        )
        si = (valid_proj & valid_meas_k) * sqrt_info
        r = meas_k - pz
        J = _fuse_pose_jacobian(J_pz, Xf_Ck)
        tau, new_cost, solve_ok = _gn_solve_7x7(si, r, J, cfg.huber_k)
        T_new = sim3.retr(T, tau)
        conv = check_convergence(
            cfg.rel_error, cfg.delta_norm, old_cost, new_cost, tau
        )
        T_out = jnp.where(solve_ok, T_new, T)
        return (T_out, new_cost, i + 1, conv | ~solve_ok, ok & solve_ok)

    init = (T_init, jnp.inf, jnp.zeros((), jnp.int32),
            jnp.zeros((), bool), jnp.ones((), bool))
    T, _, it, _, ok = jax.lax.while_loop(cond, body, init)
    return T, ok, it


# ---------------------------------------------------------------------------
# Full per-frame tracking step
# ---------------------------------------------------------------------------

class TrackResult(NamedTuple):
    frame: Frame
    keyframe: Frame
    idx_f2k: jnp.ndarray        # (1, hw)
    match_frac: jnp.ndarray     # ()
    new_kf_metric: jnp.ndarray  # () min(match_frac_k, unique_frac_f)
    ok: jnp.ndarray             # () solver healthy
    # The frame->keyframe direction the tracker already computed IS one of
    # the two directions of the consecutive factor-graph edge that
    # add_factors would otherwise recompute from scratch (a full symmetric
    # decode+match) when this frame becomes a keyframe — global_opt.py
    # reuses (idx_f2k, valid_match, Qff, Qkf) for that direction
    # (local_opt.reuse_track_matches).
    valid_match: jnp.ndarray    # (1, hw, 1) bool
    Qff: jnp.ndarray            # (1, hw, 1) frame self desc-conf
    Qkf: jnp.ndarray            # (1, hw, 1) keyframe cross desc-conf
    gn_iters: jnp.ndarray       # () int32 GN iterations actually run
    # (the while_loop exits at convergence like the reference's host-side
    # break, tracker.py:166; the bench pins max_iters as worst case —
    # this field lets the pipeline measure the real cadence)
    desc8_frame: object         # (1, hw, f) int8 q8 descriptors or None
    desc8_kf: object            # (1, hw, f) int8 q8 descriptors or None
    # (exported by the desc-impl engines for the decode-free pose-warped
    # consecutive edge; None for engines without descriptors)


def track_step(engine_match_asym, frame: Frame, keyframe: Frame, idx_init,
               K, cfg: TrackerConfig):
    """The tracking computation (FrameTracker.track, tracker.py:28-127) as a
    pure function.  engine_match_asym is the jitted asymmetric
    inference+match entry point; everything below it is traced into the
    same computation when wrapped by the caller."""
    h, w = frame.uimg.shape[0], frame.uimg.shape[1]
    hw = h * w

    outs = engine_match_asym(
        frame.feat[None], frame.pos[None],
        keyframe.feat[None], keyframe.pos[None],
        idx_init,
    )
    if len(outs) == 10:  # desc-exporting impl (q8 tables for edge reuse)
        (idx_f2k_b, valid_match_k_b, Xff, Cff, Qff, Xkf, Ckf, Qkf,
         desc8_f, desc8_k) = outs
    else:
        (idx_f2k_b, valid_match_k_b, Xff, Cff, Qff, Xkf, Ckf, Qkf) = outs
        desc8_f = desc8_k = None
    if os.environ.get("MAST3R_TRACK_BARRIER", "1") != "0":
        # Semantics-free scheduling fence: without it XLA fuses/schedules
        # the GN+fusion section into the decode+match section and the
        # whole track step costs ~3 ms MORE than the sum of its parts
        # (36.3 vs 33.2 ms measured on v5e, scripts/bench_stages.py
        # track A/B; decode+match alone shows no such penalty).
        # optimization_barrier is the identity on values.
        (idx_f2k_b, valid_match_k_b, Xff, Cff, Qff, Xkf, Ckf, Qkf) = (
            jax.lax.optimization_barrier(
                (idx_f2k_b, valid_match_k_b, Xff, Cff, Qff, Xkf, Ckf,
                 Qkf)))
    idx_f2k = idx_f2k_b[0]
    valid_match_k = valid_match_k_b[0]
    Xff, Cff, Qff = Xff[0], Cff[0], Qff[0]
    Xkf, Ckf, Qkf = Xkf[0], Ckf[0], Qkf[0]

    # Update frame pointmap (tracker.py:44)
    frame = update_pointmap(
        frame, Xff, Cff, FilteringMode(cfg.filtering_mode),
        cfg.use_median_score,
    )

    # Points/poses/confidences (tracker.py:129-154)
    Xf = frame.X_canon
    Xk = keyframe.X_canon
    Cf = frame.get_average_conf()
    Ck = keyframe.get_average_conf()

    if cfg.use_calib:
        img_size = (h, w)
        Xf = constrain_points_to_ray(img_size, Xf[None], K)[0]
        Xk = constrain_points_to_ray(img_size, Xk[None], K)[0]
        uv_k = get_pixel_coords(1, img_size).reshape(-1, 2)
        valid_meas_k = Xk[..., 2:3] > cfg.depth_eps
        z_safe = jnp.where(valid_meas_k, Xk[..., 2:3], 1.0)
        meas_k = jnp.concatenate([uv_k, jnp.log(z_safe)], axis=-1)
        meas_k = jnp.where(valid_meas_k, meas_k, 0.0)
    else:
        meas_k, valid_meas_k = None, None

    # GN point set: full raster or an s x s subgrid (point_subsample).
    # The gather table stays full-res; only the ROWS (the binding cost —
    # TPU gathers are row-count-bound) shrink.
    s = cfg.point_subsample
    if s > 1 and h % s == 0 and w % s == 0:
        sub = lambda A: A.reshape(h, w, -1)[::s, ::s].reshape(
            (h // s) * (w // s), -1)
        idx_gn = idx_f2k.reshape(h, w)[::s, ::s].reshape(-1)
        vm_gn = sub(valid_match_k)
        Qkf_gn, Xk_gn, Ck_gn = sub(Qkf), sub(Xk), sub(Ck)
        if cfg.use_calib:
            meas_k_gn = sub(meas_k)
            valid_meas_k_gn = sub(valid_meas_k)
        else:
            meas_k_gn, valid_meas_k_gn = None, None
    else:
        idx_gn, vm_gn = idx_f2k, valid_match_k
        Qkf_gn, Xk_gn, Ck_gn = Qkf, Xk, Ck
        meas_k_gn, valid_meas_k_gn = meas_k, valid_meas_k

    # One packed gather instead of three (Xf, Cf, Qff share idx_f2k and
    # TPU gathers are row-count-bound: 3 x hw rows -> 1 x hw/s^2 rows)
    g = jnp.concatenate([Xf, Cf, Qff], axis=-1)[idx_gn]   # (n_gn, 5)
    Xf_m = g[:, 0:3]
    Cf_m = g[:, 3:4]
    Qk = jnp.sqrt(g[:, 4:5] * Qkf_gn)

    # Gating (tracker.py:59-66) — on the GN point set
    valid_Cf = Cf_m > cfg.C_conf
    valid_Ck = Ck_gn > cfg.C_conf
    valid_Q = Qk > cfg.Q_conf
    valid_opt = vm_gn & valid_Cf & valid_Ck & valid_Q
    valid_kf = vm_gn & valid_Q

    match_frac = jnp.mean(valid_opt.astype(jnp.float32))

    # Relative pose solve (tracker.py:72-93)
    T_WCf, T_WCk = frame.T_WC, keyframe.T_WC
    T_init = sim3.rel(T_WCk, T_WCf)
    if cfg.use_calib:
        T_CkCf, ok, gn_iters = opt_pose_calib_sim3(
            Xf_m, Xk_gn, T_init, Qk, valid_opt.astype(Xf_m.dtype),
            meas_k_gn, valid_meas_k_gn, K, (h, w), cfg,
        )
    else:
        T_CkCf, ok, gn_iters = opt_pose_ray_dist_sim3(
            Xf_m, Xk_gn, T_init, Qk, valid_opt.astype(Xf_m.dtype), cfg
        )

    # New frame pose (tracker.py:95).  normalize: this mul is the per-
    # frame pose recursion — without re-normalization an fp32 quaternion
    # norm seed compounds geometrically (see lie_sim3.normalize).
    frame = frame.replace(T_WC=sim3.normalize(sim3.mul(T_WCk, T_CkCf)))

    # Keyframe pointmap update in its own frame (tracker.py:97-101)
    Xkk = sim3.act(T_CkCf, Xkf)
    keyframe = update_pointmap(
        keyframe, Xkk, Ckf, FilteringMode(cfg.filtering_mode),
        cfg.use_median_score,
    )

    # Keyframe selection metrics (tracker.py:103-110)
    match_frac_k = jnp.mean(valid_kf.astype(jnp.float32))
    seen = jnp.zeros((hw,), jnp.int32).at[
        jnp.where(valid_match_k[:, 0], idx_f2k, hw)
    ].max(1, mode="drop")
    unique_frac_f = jnp.sum(seen).astype(jnp.float32) / hw
    new_kf_metric = jnp.minimum(match_frac_k, unique_frac_f)

    return TrackResult(
        frame=frame,
        keyframe=keyframe,
        idx_f2k=idx_f2k_b,
        match_frac=match_frac,
        new_kf_metric=new_kf_metric,
        ok=ok,
        valid_match=valid_match_k_b,
        Qff=Qff[None],
        Qkf=Qkf[None],
        gn_iters=gn_iters,
        desc8_frame=desc8_f,
        desc8_kf=desc8_k,
    )


class FrameTracker:
    """Host-side driver mirroring the reference FrameTracker interface
    (tracker.py:15-127): owns the match-index warm start and makes the
    host-visible skip/new-keyframe decisions from the scalars the jitted
    step returns."""

    def __init__(self, engine: InferenceEngine, cfg: TrackerConfig,
                 K=None):
        self.engine = engine
        self.cfg = cfg
        self.K = K if K is not None else jnp.eye(3)
        self.idx_f2k = None
        # measured GN cadence (rates.json; the while_loop exits at
        # convergence, the config max_iters=50 is only the cap)
        self.gn_iters_total = 0
        self.gn_frames = 0

        if hasattr(engine, "_match_asymmetric_impl"):
            # Bind the engine's impl so the whole step
            # (decode+match+GN+fusion) traces into one XLA computation;
            # params passed as an argument so they are not baked into the
            # executable.
            # prefer the desc-exporting impl (q8 tables ride the reuse
            # bundle for the decode-free pose-warped consecutive edge)
            impl = getattr(engine, "_match_asymmetric_desc_impl",
                           engine._match_asymmetric_impl)

            def step_fn(params, frame, keyframe, idx_init, K):
                def matcher(f1, p1, f2, p2, idx):
                    return impl(params, f1, p1, f2, p2, idx)
                return track_step(matcher, frame, keyframe, idx_init, K, cfg)

            jitted = jax.jit(step_fn)
            self._track = lambda frame, kf, idx, K: jitted(
                engine.params, frame, kf, idx, K
            )
        else:
            # host-side engine (oracle harness): eager step
            def matcher(f1, p1, f2, p2, idx):
                return engine.match_asymmetric(f1, p1, f2, p2, idx)

            self._track = lambda frame, kf, idx, K: track_step(
                matcher, frame, kf, idx, K, cfg
            )

    def reset_idx_f2k(self):
        self.idx_f2k = None

    def track(self, frame: Frame, keyframe: Frame):
        """Returns (new_kf: bool, frame, keyframe, try_reloc: bool,
        reuse): ``reuse`` = (idx_f2k, valid_match, Qff, Qkf) — the
        frame->keyframe match direction, which add_factors reuses as one
        direction of the consecutive edge when this frame becomes a
        keyframe (global_opt.py reuse_track_matches)."""
        hw = frame.hw
        idx_init = self.idx_f2k
        if idx_init is None:
            idx_init = jnp.arange(hw, dtype=jnp.int32)[None]

        res = self._track(frame, keyframe, idx_init, self.K)

        # Host decisions (one device->host sync per frame, like the
        # reference's match_frac check at tracker.py:67-70)
        match_frac = float(res.match_frac)
        self.gn_iters_total += int(res.gn_iters)
        self.gn_frames += 1
        ok = bool(res.ok)
        # lightweight per-frame diagnostics (already host-synced scalars);
        # consumed by main.py --diag-out
        self.last_diag = {
            "match_frac": match_frac,
            "gn_iters": int(res.gn_iters),
            "ok": ok,
            "new_kf_metric": float(res.new_kf_metric),
        }
        if match_frac < self.cfg.min_match_frac or not ok:
            self.idx_f2k = res.idx_f2k  # keep warm start
            return False, frame, keyframe, True, None

        self.idx_f2k = res.idx_f2k
        new_kf = float(res.new_kf_metric) < self.cfg.match_frac_thresh
        if new_kf:
            self.reset_idx_f2k()
        reuse = (res.idx_f2k, res.valid_match, res.Qff, res.Qkf,
                 res.desc8_frame, res.desc8_kf)
        return new_kf, res.frame, res.keyframe, False, reuse
