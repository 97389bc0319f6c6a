"""Tracker tests with an oracle 'network': the fake matcher returns decode
outputs synthesized from a known 3D scene and ground-truth relative pose, so
the GN solvers and the full track step are validated for pose recovery
without a checkpoint (SURVEY §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu import tracker as trk
from mast3r_slam_tpu.frame import make_empty_frame
from mast3r_slam_tpu.ops import lie_sim3 as sim3
from mast3r_slam_tpu.ops.geometry import backproject, get_pixel_coords

H, W = 24, 32
HW = H * W
K = jnp.asarray(
    [[2.0 * W, 0, W / 2], [0, 2.0 * W, H / 2], [0, 0, 1]], dtype=jnp.float32
)


def scene_points():
    uv = get_pixel_coords(1, (H, W))
    u, v = uv[..., 0], uv[..., 1]
    z = 2.0 + 0.3 * jnp.sin(2 * jnp.pi * u / W) * jnp.cos(2 * jnp.pi * v / H)
    return backproject(uv, z[..., None], K).reshape(HW, 3)


def fake_matcher(Xk, T_true):
    """Oracle decode+match: frame sees the same world points, expressed in
    its own camera (Xff); the kf pointmap predicted in frame coords (Xkf)
    equals Xff; matches are identity."""
    Xff = sim3.act(sim3.inv(T_true), Xk)
    ones = jnp.ones((HW, 1))

    def matcher(f1, p1, f2, p2, idx_init):
        idx = jnp.arange(HW, dtype=jnp.int32)[None]
        valid = jnp.ones((1, HW, 1), dtype=bool)
        return (
            idx, valid,
            Xff[None], 10.0 * ones[None], 4.0 * ones[None],
            Xff[None], 10.0 * ones[None], 4.0 * ones[None],
        )

    return matcher, Xff


def make_frames(Xk, Xff):
    kf = make_empty_frame(H, W, 6, 8)
    kf = kf.replace(X_canon=Xk, C=jnp.full((HW, 1), 10.0),
                    N=jnp.ones((), jnp.int32),
                    N_updates=jnp.ones((), jnp.int32))
    frame = make_empty_frame(H, W, 6, 8)
    return kf, frame


def rand_pose(scale=0.1, seed=0):
    rng = np.random.default_rng(seed)
    xi = jnp.asarray(
        rng.standard_normal(7) * scale, dtype=jnp.float32
    )
    return sim3.exp(xi)


def test_opt_pose_ray_dist_recovers_pose():
    Xk = scene_points()
    T_true = rand_pose(0.05)
    Xf = sim3.act(sim3.inv(T_true), Xk)
    cfg = trk.TrackerConfig()
    Q = jnp.full((HW, 1), 4.0)
    valid = jnp.ones((HW, 1))
    T, ok, _ = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-4)


def test_opt_pose_calib_recovers_pose():
    Xk = scene_points()
    T_true = rand_pose(0.03, seed=1)
    Xf = sim3.act(sim3.inv(T_true), Xk)
    cfg = trk.TrackerConfig(use_calib=True)
    Q = jnp.full((HW, 1), 4.0)
    valid = jnp.ones((HW, 1))
    uv_k = get_pixel_coords(1, (H, W)).reshape(-1, 2)
    meas_k = jnp.concatenate([uv_k, jnp.log(Xk[:, 2:3])], axis=-1)
    valid_meas = Xk[:, 2:3] > cfg.depth_eps
    T, ok, _ = trk.opt_pose_calib_sim3(
        Xf, Xk, sim3.identity(), Q, valid, meas_k, valid_meas, K, (H, W), cfg
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_true), atol=1e-3)


def test_track_step_full():
    Xk = scene_points()
    T_true = rand_pose(0.05, seed=2)
    matcher, Xff = fake_matcher(Xk, T_true)
    kf, frame = make_frames(Xk, Xff)
    cfg = trk.TrackerConfig()

    res = trk.track_step(
        matcher, frame, kf, jnp.arange(HW, dtype=jnp.int32)[None], K, cfg
    )
    assert bool(res.ok)
    assert float(res.match_frac) > 0.99
    # frame pose = T_WCk * T_CkCf = identity * T_true
    np.testing.assert_allclose(
        np.asarray(res.frame.T_WC), np.asarray(T_true), atol=1e-4
    )
    # identity matches: keyframe metric should say "no new keyframe needed"
    assert float(res.new_kf_metric) > 0.9
    # keyframe pointmap fused: Xkk = T_CkCf(Xkf) should be ~ Xk again
    np.testing.assert_allclose(
        np.asarray(res.keyframe.X_canon), np.asarray(Xk), atol=1e-3
    )


def test_track_step_degenerate_sets_fail_flag():
    """All-zero points make the normal equations singular; the NaN guard
    must flag failure instead of poisoning the pose (reference handles this
    with try/except around Cholesky, tracker.py:72-93)."""
    Xk = jnp.zeros((HW, 3))
    matcher = lambda f1, p1, f2, p2, idx: (
        jnp.arange(HW, dtype=jnp.int32)[None],
        jnp.ones((1, HW, 1), dtype=bool),
        jnp.zeros((1, HW, 3)), jnp.ones((1, HW, 1)), 4.0 * jnp.ones((1, HW, 1)),
        jnp.zeros((1, HW, 3)), jnp.ones((1, HW, 1)), 4.0 * jnp.ones((1, HW, 1)),
    )
    kf = make_empty_frame(H, W, 6, 8)
    frame = make_empty_frame(H, W, 6, 8)
    cfg = trk.TrackerConfig()
    res = trk.track_step(
        matcher, frame, kf, jnp.arange(HW, dtype=jnp.int32)[None], K, cfg
    )
    assert not bool(res.ok)
    # pose unchanged
    np.testing.assert_allclose(
        np.asarray(res.frame.T_WC), np.asarray(sim3.identity()), atol=1e-6
    )


def test_low_match_frac_reported():
    Xk = scene_points()
    T_true = rand_pose(0.05, seed=3)
    Xff = sim3.act(sim3.inv(T_true), Xk)

    def matcher(f1, p1, f2, p2, idx):
        idx_out = jnp.arange(HW, dtype=jnp.int32)[None]
        valid = jnp.zeros((1, HW, 1), dtype=bool).at[:, :10].set(True)
        ones = jnp.ones((1, HW, 1))
        return (idx_out, valid, Xff[None], 10 * ones, 4 * ones,
                Xff[None], 10 * ones, 4 * ones)

    kf, frame = make_frames(Xk, Xff)
    cfg = trk.TrackerConfig()
    res = trk.track_step(
        matcher, frame, kf, jnp.arange(HW, dtype=jnp.int32)[None], K, cfg
    )
    assert float(res.match_frac) < 0.05


def test_opt_pose_ray_closed_form_matches_elementwise():
    """The closed-form (joint-huber) ray GN must agree with the generic
    per-component path: exactly (to float tolerance) on inlier-only data
    where every huber weight is 1, and to the same pose on noisy data with
    outliers (both robust paths converge to the same optimum)."""
    Xk = scene_points()
    T_true = rand_pose(0.05, seed=2)
    Xf = sim3.act(sim3.inv(T_true), Xk)
    Q = jnp.full((HW, 1), 4.0)
    valid = jnp.ones((HW, 1))

    cfg_j = trk.TrackerConfig(joint_ray_huber=True)
    cfg_e = trk.TrackerConfig(joint_ray_huber=False)
    T_j, ok_j, _ = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg_j)
    T_e, ok_e, _ = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg_e)
    assert bool(ok_j) and bool(ok_e)
    np.testing.assert_allclose(np.asarray(T_j), np.asarray(T_e), atol=2e-5)
    np.testing.assert_allclose(np.asarray(T_j), np.asarray(T_true),
                               atol=1e-4)

    # outliers: 5% of points corrupted; both paths must still recover pose
    rng = np.random.default_rng(3)
    mask = rng.random(HW) < 0.05
    Xf_noisy = np.array(Xf)
    Xf_noisy[mask] += rng.standard_normal((mask.sum(), 3)) * 1.0
    Xf_noisy = jnp.asarray(Xf_noisy)
    T_j, ok_j, _ = trk.opt_pose_ray_dist_sim3(
        Xf_noisy, Xk, sim3.identity(), Q, valid, cfg_j)
    T_e, ok_e, _ = trk.opt_pose_ray_dist_sim3(
        Xf_noisy, Xk, sim3.identity(), Q, valid, cfg_e)
    assert bool(ok_j) and bool(ok_e)
    # gross outliers downweighted differently (norm vs per-component huber):
    # both must stay near the true pose, not match each other exactly
    np.testing.assert_allclose(np.asarray(T_j), np.asarray(T_true),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(T_e), np.asarray(T_true),
                               atol=3e-2)


def test_gn_pallas_matches_closed_form():
    """The fused Pallas accumulation (interpret mode on CPU) must produce
    the same H/g/cost as the closed-form XLA path, and the full solver must
    reach the same pose through either body."""
    import os

    from mast3r_slam_tpu.ops import gn_pallas

    Xk = scene_points()
    T_true = rand_pose(0.05, seed=5)
    Xf = sim3.act(sim3.inv(T_true), Xk)
    Q = jnp.full((HW, 1), 4.0)
    valid = jnp.ones((HW, 1))
    cfg = trk.TrackerConfig()

    vq = (valid * jnp.sqrt(Q))[:, 0]
    w_ray = (1.0 / cfg.sigma_ray) * vq
    w_dist = (1.0 / cfg.sigma_dist) * vq
    dk = jnp.sqrt(jnp.maximum(jnp.sum(Xk * Xk, axis=-1), 1e-24))
    rd_k_t = jnp.concatenate([Xk.T / dk[None, :], dk[None, :]])

    pre = gn_pallas.GNPointData(Xf, rd_k_t, w_ray, w_dist, block_rows=8)
    T0 = sim3.identity()
    H, g, cost = gn_pallas.gn_accumulate(pre, T0, cfg.huber_k,
                                         interpret=True)
    # reference: dense accumulation via the generic row expansion with a
    # JOINT per-point ray huber weight
    p = sim3.act(T0, Xf)
    d = jnp.sqrt(jnp.maximum(jnp.sum(p * p, -1), 1e-24))
    r = p / d[:, None]
    e = rd_k_t[:3].T - r
    ed = rd_k_t[3] - d
    from mast3r_slam_tpu.ops.robust import huber as hub
    w_r = hub(w_ray * jnp.linalg.norm(e, axis=-1), k=cfg.huber_k) \
        * w_ray ** 2
    w_d = hub(w_dist * ed, k=cfg.huber_k) * w_dist ** 2
    # J blocks: J_ray = [-(I-rr^T)/d | skew(r) | 0]; J_dist = [-r | 0 | -d]
    n = HW
    eye = jnp.eye(3)
    A = (eye[None] - r[:, :, None] * r[:, None, :]) / d[:, None, None]
    skew_r = jnp.stack([
        jnp.stack([jnp.zeros(n), -r[:, 2], r[:, 1]], -1),
        jnp.stack([r[:, 2], jnp.zeros(n), -r[:, 0]], -1),
        jnp.stack([-r[:, 1], r[:, 0], jnp.zeros(n)], -1)], -2)
    J_ray = jnp.concatenate([-A, skew_r, jnp.zeros((n, 3, 1))], -1)
    J_dist = jnp.concatenate([-r, jnp.zeros((n, 3)), -d[:, None]],
                             -1)[:, None, :]
    H_ref = (
        jnp.einsum("nik,n,nil->kl", J_ray, w_r, J_ray)
        + jnp.einsum("nik,n,nil->kl", J_dist, w_d, J_dist)
    )
    g_ref = -(jnp.einsum("nik,n,ni->k", J_ray, w_r, e)
              + jnp.einsum("nik,n,ni->k", J_dist, w_d, ed[:, None]))
    cost_ref = 0.5 * (jnp.sum(w_r * jnp.sum(e * e, -1))
                      + jnp.sum(w_d * ed * ed))
    scale = float(jnp.max(jnp.abs(H_ref)))
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=3e-5 * float(jnp.max(jnp.abs(g_ref))))
    np.testing.assert_allclose(float(cost), float(cost_ref),
                               rtol=1e-5)

    # full solve equivalence (pallas default on this CPU run -> interpret)
    os.environ["MAST3R_GN_PALLAS"] = "1"
    T_p, ok_p, _ = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg)
    os.environ["MAST3R_GN_PALLAS"] = "0"
    T_x, ok_x, _ = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg)
    os.environ.pop("MAST3R_GN_PALLAS", None)
    assert bool(ok_p) and bool(ok_x)
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_x), atol=2e-5)
