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
    T, ok = trk.opt_pose_ray_dist_sim3(
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
    T, ok = trk.opt_pose_calib_sim3(
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
    T_j, ok_j = trk.opt_pose_ray_dist_sim3(
        Xf, Xk, sim3.identity(), Q, valid, cfg_j)
    T_e, ok_e = trk.opt_pose_ray_dist_sim3(
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
    T_j, ok_j = trk.opt_pose_ray_dist_sim3(
        Xf_noisy, Xk, sim3.identity(), Q, valid, cfg_j)
    T_e, ok_e = trk.opt_pose_ray_dist_sim3(
        Xf_noisy, Xk, sim3.identity(), Q, valid, cfg_e)
    assert bool(ok_j) and bool(ok_e)
    # gross outliers downweighted differently (norm vs per-component huber):
    # both must stay near the true pose, not match each other exactly
    np.testing.assert_allclose(np.asarray(T_j), np.asarray(T_true),
                               atol=3e-2)
    np.testing.assert_allclose(np.asarray(T_e), np.asarray(T_true),
                               atol=3e-2)
