"""Bundle-adjustment tests: exact pose recovery on an oracle scene (ray +
point residuals), convergence on a multiview-consistent plane scene with
real pixel-quantized matching (calib residual), and fp32-scaled-Cholesky
vs fp64 reference solve."""

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import ba
from mast3r_slam_tpu.ops import lie_sim3 as sim3
from mast3r_slam_tpu.ops.geometry import get_pixel_coords

H, W = 16, 20
HW = H * W
K = np.array(
    [[1.5 * W, 0, W / 2], [0, 1.5 * W, H / 2], [0, 0, 1]], dtype=np.float32
)
P = 5


def gt_poses(scale=0.08, seed=0):
    rng = np.random.default_rng(seed)
    xi = rng.standard_normal((P, 7)).astype(np.float32) * scale
    xi[0] = 0  # first pose at identity (gauge)
    return sim3.exp(jnp.asarray(xi))


def world_points(seed=1):
    rng = np.random.default_rng(seed)
    Wpts = rng.standard_normal((HW, 3)).astype(np.float32)
    Wpts[:, 2] += 4.0
    return jnp.asarray(Wpts)


def two_way_edges(pairs):
    ii = [i for i, j in pairs] + [j for i, j in pairs]
    jj = [j for i, j in pairs] + [i for i, j in pairs]
    return jnp.asarray(ii, jnp.int32), jnp.asarray(jj, jnp.int32)


def identity_scene():
    """All cameras index the same world points: identity matching gives
    exactly-zero residuals at ground truth for 3D residual types."""
    T_true = gt_poses()
    Wpts = world_points()
    Xs = jnp.stack(
        [sim3.act(sim3.inv(T_true[p]), Wpts) for p in range(P)]
    )
    Cs = jnp.ones((P, HW))
    pairs = [(p, p + 1) for p in range(P - 1)] + [(0, P - 1)]
    ii, jj = two_way_edges(pairs)
    E = ii.shape[0]
    idx = jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None], (E, HW))
    vm = jnp.ones((E, HW), dtype=bool)
    Q = jnp.full((E, HW), 4.0)
    ev = jnp.ones((E,), dtype=bool)
    return T_true, Xs, Cs, ii, jj, idx, vm, Q, ev


def perturb(T_true, scale=0.05, seed=5):
    rng = np.random.default_rng(seed)
    xi = rng.standard_normal((P, 7)).astype(np.float32) * scale
    xi[0] = 0
    return sim3.mul(sim3.exp(jnp.asarray(xi)), T_true)


def pose_err(Ta, Tb):
    return float(jnp.abs(Ta - Tb).max())


def test_gn_rays_recovers_poses():
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=20, chunk_points=128)
    T_opt, iters, delta, ok = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "ray", (W, H),
        cfg,
    )
    assert bool(ok)
    e0, e1 = pose_err(T0, T_true), pose_err(T_opt, T_true)
    assert e1 < 1e-3, (e0, e1, int(iters))
    # pinned pose untouched
    np.testing.assert_allclose(T_opt[0], T0[0], atol=1e-7)


def test_gn_points_recovers_poses():
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true, scale=0.04, seed=7)
    cfg = ba.BAConfig(max_iters=20, chunk_points=512)
    T_opt, iters, delta, ok = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "point", (W, H),
        cfg,
    )
    assert bool(ok)
    assert pose_err(T_opt, T_true) < 1e-3


def test_gn_edge_padding_is_inert():
    """Padded (edge_valid=False) edges must not affect the solution."""
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=10, chunk_points=128)
    T_a, *_ = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "ray", (W, H),
        cfg,
    )
    # append garbage padded edges
    pad = 4
    ii_p = jnp.concatenate([ii, jnp.zeros((pad,), jnp.int32)])
    jj_p = jnp.concatenate([jj, jnp.ones((pad,), jnp.int32)])
    idx_p = jnp.concatenate([idx, idx[:pad] * 0], axis=0)
    vm_p = jnp.concatenate([vm, jnp.ones((pad, HW), bool)], axis=0)
    Q_p = jnp.concatenate([Q, jnp.full((pad, HW), 9.0)], axis=0)
    ev_p = jnp.concatenate([ev, jnp.zeros((pad,), bool)])
    T_b, *_ = ba.gauss_newton(
        T0, Xs, Cs, ii_p, jj_p, idx_p, vm_p, Q_p, ev_p, jnp.asarray(K),
        "ray", (W, H), cfg,
    )
    np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-5)


# ---------------------------------------------------------------------------
# Multiview-consistent plane scene for the calibrated residual
# ---------------------------------------------------------------------------

def plane_scene(seed=0):
    """Cameras observing a tilted world plane; each camera's pointmap is its
    own ray-constrained surface sample; matches via true projection with
    pixel rounding (mirrors real matcher output quantization)."""
    T_true = gt_poses(scale=0.04, seed=seed)
    n = np.array([0.05, -0.08, 1.0])
    n /= np.linalg.norm(n)
    d = 4.0

    Kinv = np.linalg.inv(K)
    uv = np.asarray(get_pixel_coords(1, (H, W))).reshape(HW, 2)
    dirs_cam = (Kinv @ np.concatenate(
        [uv, np.ones((HW, 1))], axis=1
    ).T).T  # (HW, 3)

    Xs, X_world = [], []
    for p in range(P):
        T = np.asarray(T_true[p])
        t, q, s = T[0:3], T[3:7], T[7]
        Rm = np.asarray(sim3.sim3_matrix(T_true[p]))[:3, :3] / s
        o = t
        d_w = (Rm @ dirs_cam.T).T
        lam = (d - (o @ n)) / (d_w @ n)
        Xw = o[None] + lam[:, None] * d_w
        X_world.append(Xw)
        Xc = np.asarray(sim3.act(sim3.inv(T_true[p]), jnp.asarray(
            Xw, dtype=jnp.float32)))
        Xs.append(Xc)
    Xs = jnp.asarray(np.stack(Xs), dtype=jnp.float32)

    pairs = [(p, p + 1) for p in range(P - 1)]
    ii, jj = two_way_edges(pairs)
    E = ii.shape[0]
    idx = np.zeros((E, HW), np.int32)
    vm = np.zeros((E, HW), bool)
    for e in range(E):
        i, j = int(ii[e]), int(jj[e])
        # project world points of camera j into camera i
        Xw = X_world[j]
        Xc_i = np.asarray(
            sim3.act(sim3.inv(T_true[i]), jnp.asarray(Xw, jnp.float32))
        )
        uvz = (K @ Xc_i.T).T
        u = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
        v = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
        inside = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (Xc_i[:, 2] > 0)
        idx[e] = np.where(inside, v * W + u, 0)
        vm[e] = inside
    Cs = jnp.ones((P, HW))
    Q = jnp.full((E, HW), 4.0)
    ev = jnp.ones((E,), bool)
    return (T_true, Xs, Cs, ii, jj, jnp.asarray(idx), jnp.asarray(vm), Q, ev)


def test_gn_calib_consistent_optimum_on_plane_scene():
    """Integer pixel matching quantizes the measurements (exactly as the
    reference matcher's integer indices do), so the optimum is offset from
    GT on a small scene; the solver must land on the SAME optimum from the
    GT start and from a perturbed start, stay within noise-bounded distance
    of GT, and never touch the pinned pose."""
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = plane_scene()
    cfg = ba.BAConfig(max_iters=20, chunk_points=128)
    args = (Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(K), "calib", (W, H),
            cfg)
    T_a, _, _, ok_a = ba.gauss_newton(T_true, *args)
    T0 = perturb(T_true, scale=0.02, seed=11)
    T_b, _, _, ok_b = ba.gauss_newton(T0, *args)
    assert bool(ok_a) and bool(ok_b)
    assert pose_err(T_a, T_b) < 2e-3, pose_err(T_a, T_b)
    assert pose_err(T_a, T_true) < 0.5
    np.testing.assert_allclose(T_b[0], T0[0], atol=1e-7)


def test_residual_jacobians_match_autodiff():
    """Validate each residual builder's analytic J (including the
    world-frame adjoint transform) against finite differences through the
    FULL chain: perturb T_i or T_j, recompute rel pose and residuals."""
    rng = np.random.default_rng(3)
    E_, C_ = 2, 5
    Ti = sim3.exp(jnp.asarray(rng.standard_normal((E_, 7)) * 0.3,
                              jnp.float32))
    Tj = sim3.exp(jnp.asarray(rng.standard_normal((E_, 7)) * 0.3,
                              jnp.float32))
    Xi = jnp.asarray(rng.standard_normal((E_, C_, 3)), jnp.float32)
    Xi = Xi.at[..., 2].add(4.0)
    Xj = jnp.asarray(rng.standard_normal((E_, C_, 3)), jnp.float32)
    Xj = Xj.at[..., 2].add(4.0)
    ind = jnp.asarray(rng.integers(0, HW, (E_, C_)), jnp.int32)
    cfg = ba.BAConfig()
    Kj = jnp.asarray(K)

    for rtype in ("point", "ray", "calib"):
        residual, R = ba._RESIDUALS[rtype]

        def res_of(Ti_, Tj_):
            Tij = sim3.rel(Ti_, Tj_)
            err, J_local, valid, sig = residual(
                Tij, Xi, Xj, ind, Kj, (W, H), cfg
            )
            return err

        err, J_local, valid, sig = residual(
            sim3.rel(Ti, Tj), Xi, Xj, ind, Kj, (W, H), cfg
        )
        Jj = sim3.apply_adj_inv(Ti[:, None, None, :], J_local)
        Ji = -Jj

        eps = 1e-4
        for d in range(7):
            dxi = np.zeros(7, np.float32)
            dxi[d] = eps
            dxi = jnp.asarray(dxi)[None]
            # perturb pose j
            num_j = (
                res_of(Ti, sim3.retr(Tj, dxi))
                - res_of(Ti, sim3.retr(Tj, -dxi))
            ) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(Jj[..., d]), np.asarray(num_j), atol=5e-2,
                rtol=2e-2, err_msg=f"{rtype} Jj dim {d}",
            )
            # perturb pose i
            num_i = (
                res_of(sim3.retr(Ti, dxi), Tj)
                - res_of(sim3.retr(Ti, -dxi), Tj)
            ) / (2 * eps)
            np.testing.assert_allclose(
                np.asarray(Ji[..., d]), np.asarray(num_i), atol=5e-2,
                rtol=2e-2, err_msg=f"{rtype} Ji dim {d}",
            )


def test_solver_matches_fp64_reference():
    """One-iteration dx from the scaled fp32 solve vs numpy fp64."""
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(chunk_points=128)
    residual, R = ba._RESIDUALS["ray"]
    Hs, gs = ba._accumulate_edge_systems(
        residual, R, T0, Xs, Cs, ii, jj, idx, vm, Q, ev,
        jnp.asarray(K), (W, H), cfg,
    )
    Hm, gm = ba._assemble_dense(Hs, gs, ii, jj, P, cfg.pin)
    dx32, ok = ba._solve_scaled(Hm, gm, cfg.damping)
    assert bool(ok)
    H64 = np.asarray(Hm, dtype=np.float64)
    g64 = np.asarray(gm, dtype=np.float64)
    dx64 = np.linalg.solve(H64, g64)
    denom = np.maximum(np.abs(dx64), 1e-3)
    rel = np.abs(np.asarray(dx32, np.float64) - dx64) / denom
    assert float(rel.max()) < 5e-3, float(rel.max())
