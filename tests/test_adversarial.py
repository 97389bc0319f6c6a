"""Adversarial validation of the TPU fast-path approximation stack
(VERDICT r2 weak #4): occlusion / depth-discontinuity scenes, large-warp
view pairs, and the single `reference_exact` toggle that restores the
exact reference path (reference behaviors: full-res matcher walk
matching_kernels.cu:26-81, per-component huber tracker.py:156-171,
all-pixel BA residuals gn_kernels.cu:813-1138, symmetric consecutive
edges global_opt.py:32-101)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu import evaluate
from mast3r_slam_tpu.ops import lie_sim3 as sim3
from mast3r_slam_tpu.ops import matching
from mast3r_slam_tpu.pipeline import SLAMSystem
from mast3r_slam_tpu.testing import (OracleEngine, SyntheticSequence,
                                     world_descriptors)
from mast3r_slam_tpu.utils.config import (apply_reference_exact,
                                          load_config)

PROD_MATCH = dict(coarse_subsample=2, final_radius=1, coarse_radius=2,
                  dilation_schedule=(4, 2), lm_subsample=4)


# ---------------------------------------------------------------------------
# The reference_exact toggle
# ---------------------------------------------------------------------------


def test_reference_exact_restores_exact_path(tmp_path):
    cfg = load_config("config/eval_no_calib.yaml")
    ex = apply_reference_exact(cfg)
    m = ex["matching"]
    assert m["coarse_subsample"] == 1
    assert m["final_radius"] == 0 and m["coarse_radius"] == 0
    assert list(m["dilation_schedule"]) == []
    assert m["lm_subsample"] == 0 and m["occlusion_subsample"] == 1
    assert ex["tracking"]["joint_ray_huber"] is False
    assert ex["tracking"]["point_subsample"] == 1
    assert ex["local_opt"]["points_subsample"] == 1
    assert ex["local_opt"]["reuse_track_matches"] is False
    assert ex["local_opt"]["reuse_warp"] is False

    # the toggle works from YAML too (load_config applies it)
    p = tmp_path / "exact.yaml"
    p.write_text("inherit: config/eval_no_calib.yaml\nreference_exact: true\n")
    y = load_config(p)
    assert y["matching"]["coarse_subsample"] == 1
    assert y["local_opt"]["points_subsample"] == 1

    # the exact settings flow into the constructed configs
    mc = matching.MatchingConfig.from_dict(y["matching"])
    assert mc.coarse_subsample == 1 and mc.dilation_schedule == ()
    from mast3r_slam_tpu.ops.ba import BAConfig
    assert BAConfig.from_config(y).points_subsample == 1
    from mast3r_slam_tpu.tracker import TrackerConfig
    tc = TrackerConfig.from_config(y)
    assert tc.joint_ray_huber is False and tc.point_subsample == 1


# ---------------------------------------------------------------------------
# Rendered two-view matcher stress: true disocclusions, not just warps
# ---------------------------------------------------------------------------


def _two_view_match_inputs(scene, h=64, w=96, xi=None):
    """Render two views of a scene and build the matcher inputs exactly
    like the tracker does: X11/D11 from view 0 (the table side), X21 =
    view 1's pointmap expressed in view 0's frame, D21 = view 1's
    descriptors.  Returns (X11, X21, D11, D21, idx_gt, valid_gt)."""
    seq = SyntheticSequence.__new__(SyntheticSequence)
    from mast3r_slam_tpu.testing import make_K, render_view

    seq.h, seq.w = h, w
    seq.K = make_K(h, w)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray(xi, jnp.float32))
    rgb0, Xc0, Xw0 = render_view(T0, h, w, seq.K, scene)
    rgb1, Xc1, Xw1 = render_view(T1, h, w, seq.K, scene)

    X11 = jnp.asarray(Xc0[None].reshape(1, h, w, 3))
    X21_pts = sim3.act(sim3.rel(T0, T1), jnp.asarray(Xc1))
    X21 = X21_pts[None].reshape(1, h, w, 3)
    D11 = jnp.asarray(world_descriptors(Xw0).reshape(1, h, w, -1))
    D21 = jnp.asarray(world_descriptors(Xw1).reshape(1, h, w, -1))

    # ground truth: project view-1 world points into view 0 + occlusion
    uvz = (seq.K @ Xc0.T * 0).T  # placeholder not used
    Xc_in0 = np.asarray(X21_pts)
    uvz = (seq.K @ Xc_in0.T).T
    u = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
    v = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (Xc_in0[:, 2] > 0)
    idx_gt = np.where(inside, v * w + u, 0).astype(np.int32)
    seen = Xw0[idx_gt]
    visible = inside & (np.linalg.norm(seen - Xw1, axis=-1) < 0.1)
    return X11, X21, D11, D21, idx_gt, visible


@pytest.mark.parametrize("scene", ["cliff", "occluder"])
@pytest.mark.parametrize("warp", ["small", "reset"])
def test_match_production_vs_exact_rendered(scene, warp):
    """Production matcher vs reference-exact matcher on RENDERED
    occlusion scenes (disoccluded pixels exist, unlike single-pointmap
    warps): both must localize visible surface points equally well, and
    the production bundle's valid set must not admit matches the exact
    path rejects at discontinuities."""
    xi = ([0.05, -0.03, 0.02, 0.03, -0.02, 0.03, 0.0] if warp == "small"
          else [0.22, -0.12, 0.1, 0.12, -0.1, 0.15, 0.06])
    X11, X21, D11, D21, idx_gt, visible = _two_view_match_inputs(
        scene, xi=xi)
    w = X11.shape[2]

    idx_ex, v_ex = matching.match(X11, X21, D11, D21,
                                  cfg=matching.MatchingConfig())
    idx_pr, v_pr = matching.match(X11, X21, D11, D21,
                                  cfg=matching.MatchingConfig(**PROD_MATCH))

    def accuracy(idx, valid):
        """fraction of GT-visible, matcher-valid pixels whose match lies
        within 1 px of the true correspondence."""
        sel = visible & np.asarray(valid[0, :, 0])
        du = np.abs(np.asarray(idx[0]) % w - idx_gt % w)
        dv = np.abs(np.asarray(idx[0]) // w - idx_gt // w)
        good = (du <= 1) & (dv <= 1)
        return float(np.mean(good[sel])), float(np.mean(sel))

    acc_ex, cov_ex = accuracy(idx_ex, v_ex)
    acc_pr, cov_pr = accuracy(idx_pr, v_pr)
    assert acc_ex > 0.9, (acc_ex, cov_ex)
    assert acc_pr > acc_ex - 0.03, (acc_pr, acc_ex)
    assert cov_pr > 0.5 * cov_ex, (cov_pr, cov_ex)

    # occluded pixels that sneak through the valid gate must be rare
    occl_pass = np.asarray(v_pr[0, :, 0]) & ~visible \
        & (np.asarray(X21[0, :, :, 2].reshape(-1)) > 0)
    assert float(np.mean(occl_pass)) < 0.08


# ---------------------------------------------------------------------------
# Pipeline-level A/B on adversarial scenes (production bundle vs exact)
# ---------------------------------------------------------------------------


def _run(seq, cfg):
    engine = OracleEngine(seq)
    system = SLAMSystem(cfg, engine, (seq.h, seq.w), buffer=32)
    for i in range(len(seq)):
        system.process_frame(i, seq.images[i])
    system.terminate()
    return system


def _ate(tmp_path, tag, seq, system):
    traj = tmp_path / f"{tag}.txt"
    gt = tmp_path / "gt.txt"
    evaluate.save_traj(tmp_path, f"{tag}.txt", seq.timestamps, system.arena)
    seq.write_gt(gt)
    return evaluate.ate_rmse(gt, traj, max_diff=0.05)


@pytest.mark.parametrize("scene", ["cliff", "occluder"])
def test_pipeline_adversarial_scene_production_vs_exact(tmp_path, scene):
    """Full oracle pipeline on occlusion/discontinuity scenes: the
    production approximation bundle (points_subsample=4, match reuse,
    joint huber) must hold ATE within 50%% + 5 mm of the reference-exact
    bundle (and both must track)."""
    seq = SyntheticSequence(n_frames=14, h=48, w=64, seed=2,
                            traj_scale=0.45, scene=scene)
    cfg = load_config("config/eval_no_calib.yaml")
    cfg["dataset"]["img_size"] = 64

    prod = _run(seq, cfg)
    exact = _run(seq, apply_reference_exact(cfg))

    assert prod.stats["keyframes"] >= 2
    assert exact.stats["keyframes"] >= 2
    ate_p = _ate(tmp_path, "prod", seq, prod)
    ate_e = _ate(tmp_path, "exact", seq, exact)
    assert ate_e < 0.08, ate_e
    assert ate_p < 1.5 * ate_e + 0.005, (ate_p, ate_e)


# ---------------------------------------------------------------------------
# Pose-warped consecutive edge (decode-free completion, global_opt)
# ---------------------------------------------------------------------------


def test_match_prequantized_bypass_identical():
    """matching.match on pre-quantized int8 descriptors must equal the
    internal q8 path bitwise (the engine quantizes once, exports the
    tables, and the warped edge reuses them)."""
    from mast3r_slam_tpu.ops.matching import _q8_pair

    X11, X21, D11, D21, _, _ = _two_view_match_inputs(
        "cliff", xi=[0.05, -0.03, 0.02, 0.03, -0.02, 0.03, 0.0])
    cfg = matching.MatchingConfig(**PROD_MATCH)
    idx_a, v_a = matching.match(X11, X21, D11, D21, cfg=cfg)
    b, h, w, f = D11.shape
    D8_1, D8_2 = _q8_pair(D11, D21.reshape(b, -1, f))
    idx_b, v_b = matching.match(X11, X21, D8_1,
                                D8_2.reshape(b, h, w, f), cfg=cfg)
    np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
    np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))


def test_pose_warped_consecutive_edge():
    """global_opt's decode-free pose-warped i->j completion: with
    canonical pointmaps + the (j, i) decode's descriptor tables + the
    solved pose, the edge's match indices must localize the true
    correspondences like a fresh match would (rendered occlusion scene),
    and reuse_warp=False must fall back to engine.match_asymmetric."""
    from mast3r_slam_tpu.frame import make_arena
    from mast3r_slam_tpu.global_opt import FactorGraph
    from mast3r_slam_tpu.ops.matching import _q8_pair
    from mast3r_slam_tpu.testing import make_K, render_view

    h, w = 64, 96
    hw = h * w
    K = make_K(h, w)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.03, -0.02, 0.03, 0.0],
                              jnp.float32))
    _, Xc0, Xw0 = render_view(T0, h, w, K, "occluder")
    _, Xc1, Xw1 = render_view(T1, h, w, K, "occluder")
    D0 = world_descriptors(Xw0)
    D1 = world_descriptors(Xw1)
    f = D0.shape[-1]

    class StubEngine:
        """match_arrays_warp like InferenceEngine (borrows its impl);
        fresh decode marks itself."""

        match_cfg = matching.MatchingConfig(**PROD_MATCH)
        fresh_calls = 0

        from mast3r_slam_tpu.inference import InferenceEngine
        match_arrays_warp = InferenceEngine.match_arrays_warp

        def match_asymmetric(self, *a, **kw):
            StubEngine.fresh_calls += 1
            idx = jnp.zeros((1, hw), jnp.int32)
            z = jnp.zeros((1, hw, 1))
            return (idx, jnp.zeros((1, hw, 1), bool), z, z, z, z, z, z)

    cfg = load_config("config/eval_no_calib.yaml")
    arena = make_arena(4, h, w, 16, 32)
    arena = arena.replace(
        X=arena.X.at[0].set(jnp.asarray(Xc0)).at[1].set(jnp.asarray(Xc1)),
        T_WC=arena.T_WC.at[0].set(T0).at[1].set(T1),
        n_size=jnp.asarray(2, jnp.int32),
    )
    D8_1, D8_0 = _q8_pair(jnp.asarray(D1[None]), jnp.asarray(D0[None]))
    ones = jnp.ones((1, hw, 1), jnp.float32) * 4.0
    reuse = {
        "pair": (0, 1),
        "idx_j2i": jnp.zeros((1, hw), jnp.int32),
        "valid_i": jnp.ones((1, hw, 1), bool),
        "Qjj": ones, "Qij": ones,
        "desc8_frame": D8_1, "desc8_kf": D8_0,
    }

    g = FactorGraph(StubEngine(), hw, cfg)
    assert g.reuse_warp
    assert g._add_consecutive_reused(arena, 0, 1, reuse)
    assert StubEngine.fresh_calls == 0  # no decode happened
    idx = np.asarray(g.idx_ii2jj[0])
    vm = np.asarray(g.valid_match_j[0])

    # ground truth: project view-1 points into view 0
    uvz = (K @ np.asarray(sim3.act(sim3.rel(T0, T1),
                                   jnp.asarray(Xc1))).T).T
    u = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
    v = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    visible = inside & (np.linalg.norm(
        Xw0[np.where(inside, v * w + u, 0)] - Xw1, axis=-1) < 0.1)
    sel = visible & vm
    assert sel.mean() > 0.5
    du = np.abs(idx % w - np.where(inside, u, 0))
    dv = np.abs(idx // w - np.where(inside, v, 0))
    acc = float(np.mean(((du <= 1) & (dv <= 1))[sel]))
    assert acc > 0.95, acc

    # reuse_warp off -> fresh decode fallback
    cfg2 = load_config("config/eval_no_calib.yaml")
    cfg2["local_opt"]["reuse_warp"] = False
    g2 = FactorGraph(StubEngine(), hw, cfg2)
    g2._add_consecutive_reused(arena, 0, 1, reuse)
    assert StubEngine.fresh_calls == 1


def test_pose_warp_q_weight_ba_sensitivity():
    """VERDICT r3 weak #8 / next #9: the pose-warp consecutive edge
    stores SWAPPED-SIDE descriptor confidences (Qii <- Qij, Qji <- Qjj,
    global_opt._add_consecutive_reused) in the BA edge weights.  A/B the
    full BA solve on a noisy occlusion scene: the warp-weighted edge
    must recover the pose essentially as well as an edge weighted with
    the true-side confidences a fresh decode would produce."""
    from mast3r_slam_tpu.frame import make_arena
    from mast3r_slam_tpu.global_opt import FactorGraph
    from mast3r_slam_tpu.ops.matching import _q8_pair
    from mast3r_slam_tpu.testing import make_K, render_view

    h, w = 48, 64
    hw = h * w
    K = make_K(h, w)
    rng = np.random.default_rng(5)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray([0.06, -0.04, 0.03, 0.04, -0.03, 0.04, 0.0],
                              jnp.float32))
    _, Xc0, Xw0 = render_view(T0, h, w, K, "occluder")
    _, Xc1, Xw1 = render_view(T1, h, w, K, "occluder")
    noise = 0.01
    Xc0n = Xc0 + rng.normal(0, noise, Xc0.shape).astype(np.float32)
    Xc1n = Xc1 + rng.normal(0, noise, Xc1.shape).astype(np.float32)

    # ground-truth correspondences (j=view1 points into i=view0) + the
    # reverse direction for the reused tracker half
    def project(Xsrc_cam, T_src, T_dst, Xw_dst):
        uvz = (K @ np.asarray(sim3.act(sim3.rel(T_dst, T_src),
                                       jnp.asarray(Xsrc_cam))).T).T
        u = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
        v = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        lin = np.where(inside, v * w + u, 0)
        visible = inside & (np.linalg.norm(Xw_dst[lin]
                                           - sim3_np_world(T_src, Xsrc_cam),
                                           axis=-1) < 0.1)
        return lin.astype(np.int32), visible

    def sim3_np_world(T, Xc):
        return np.asarray(sim3.act(jnp.asarray(T), jnp.asarray(Xc)))

    idx_i2j, vis_j = project(Xc1, T1, T0, Xw0)   # j's pixels -> i coords
    idx_j2i, vis_i = project(Xc0, T0, T1, Xw1)   # i's pixels -> j coords

    # Structured synthetic confidences: SELF confs are high and smooth;
    # CROSS confs drop where the point is occluded in the other view —
    # the self/cross asymmetry is exactly what the warp substitution
    # swaps between the gathered and resident sides of the BA weight.
    uu, vv = np.meshgrid(np.arange(w), np.arange(h))
    smooth = (0.3 * np.sin(uu / 7.0) * np.cos(vv / 5.0)).reshape(-1)
    q = lambda base, vism: (base + smooth + 2.0 * vism.astype(np.float32)
                            + rng.normal(0, 0.05, hw)).astype(np.float32)
    Qii_t = q(3.0, np.ones(hw, bool))          # i self conf ((i,j) decode)
    Qji_t = q(1.5, vis_j)                      # j's points in i: cross
    Qjj_t = q(3.2, np.ones(hw, bool))          # j self conf ((j,i) decode)
    Qij_t = q(1.4, vis_i)                      # i's points in j: cross

    col = lambda a: jnp.asarray(a.reshape(1, hw, 1))

    class StubEngine:
        match_cfg = matching.MatchingConfig(**PROD_MATCH)

        from mast3r_slam_tpu.inference import InferenceEngine
        match_arrays_warp = InferenceEngine.match_arrays_warp

        def match_asymmetric(self, *a, **kw):
            # "fresh decode" of the i->j direction: GT matches + the
            # TRUE-side confidences (Qii, Qji)
            return (jnp.asarray(idx_i2j[None]),
                    jnp.asarray(vis_j[None, :, None]),
                    col(np.zeros(hw)), col(np.zeros(hw)), col(Qii_t),
                    col(np.zeros(hw)), col(np.zeros(hw)), col(Qji_t))

    D0 = world_descriptors(Xw0)
    D1 = world_descriptors(Xw1)
    D8_1, D8_0 = _q8_pair(jnp.asarray(D1[None]), jnp.asarray(D0[None]))

    # noisy arena with a perturbed second pose; BA should pull it to T1
    T1_init = sim3.mul(
        sim3.exp(jnp.asarray([0.06, -0.05, 0.04, 0.03, -0.03, 0.04, 0.02],
                             jnp.float32)), T1)

    def run(reuse_warp: bool):
        cfg = load_config("config/eval_no_calib.yaml")
        cfg["local_opt"]["reuse_warp"] = reuse_warp
        arena = make_arena(4, h, w, 16, 32)
        arena = arena.replace(
            X=arena.X.at[0].set(jnp.asarray(Xc0n))
                     .at[1].set(jnp.asarray(Xc1n)),
            C=arena.C.at[:2].set(10.0),
            N=arena.N.at[:2].set(1),
            T_WC=arena.T_WC.at[0].set(T0).at[1].set(T1_init),
            n_size=jnp.asarray(2, jnp.int32),
        )
        reuse = {
            "pair": (0, 1),
            "idx_j2i": jnp.asarray(idx_j2i[None]),
            "valid_i": jnp.asarray(vis_i[None, :, None]),
            # the (j, i) decode's fields the tracker exports
            "Qjj": col(Qjj_t), "Qij": col(Qij_t),
            "desc8_frame": D8_1, "desc8_kf": D8_0,
        }
        g = FactorGraph(StubEngine(), hw, cfg)
        assert g._add_consecutive_reused(arena, 0, 1, reuse)
        res = g.solve_poses(arena, "ray")
        assert res is not None
        upd, Twc_new, _ = res
        T1_opt = np.asarray(Twc_new)[np.asarray(upd) == 1][0]
        return pose_err(jnp.asarray(T1_opt))

    def pose_err(T):
        # embedding distance of T * T1^-1 from identity (valid small-error
        # metric; ops/lie_sim3 has no log map)
        d = np.asarray(sim3.mul(T, sim3.inv(T1))) - np.asarray(
            sim3.identity())
        # q and -q are the same rotation
        d_neg = np.asarray(sim3.mul(T, sim3.inv(T1))) * np.asarray(
            [1, 1, 1, -1, -1, -1, -1, 1]) - np.asarray(sim3.identity())
        return float(min(np.linalg.norm(d), np.linalg.norm(d_neg)))

    err_warp = run(True)
    err_fresh = run(False)
    err_init = pose_err(T1_init)
    # both must actually improve the pose, and the swapped-side weighting
    # must not cost a material accuracy loss vs true-side weighting
    assert err_fresh < 0.5 * err_init, (err_fresh, err_init)
    assert err_warp < 0.5 * err_init, (err_warp, err_init)
    assert err_warp < 1.5 * err_fresh + 1e-3, (err_warp, err_fresh)


def test_edge_query_subsample_match_values_identical():
    """matching.match(query_subsample=2) must return EXACTLY the full
    run's values at the (::2, ::2) query positions (each query's LM walk
    + refine is independent of the others)."""
    from mast3r_slam_tpu.testing import make_K, render_view

    h, w = 64, 96
    K = make_K(h, w)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.03, -0.02, 0.03, 0.0],
                              jnp.float32))
    _, Xc0, Xw0 = render_view(T0, h, w, K, "occluder")
    _, Xc1, Xw1 = render_view(T1, h, w, K, "occluder")
    X11 = jnp.asarray(Xc0.reshape(1, h, w, 3))
    X21 = jnp.asarray(Xc1.reshape(1, h, w, 3))
    D11 = jnp.asarray(world_descriptors(Xw0).reshape(1, h, w, -1))
    D21 = jnp.asarray(world_descriptors(Xw1).reshape(1, h, w, -1))
    cfg = matching.MatchingConfig(**PROD_MATCH)

    idx_f, valid_f = matching.match(X11, X21, D11, D21, cfg=cfg)
    idx_s, valid_s = matching.match(X11, X21, D11, D21, cfg=cfg,
                                    query_subsample=2)
    assert idx_s.shape == (1, (h // 2) * (w // 2))
    idx_f_even = np.asarray(idx_f).reshape(1, h, w)[:, ::2, ::2].reshape(
        1, -1)
    valid_f_even = np.asarray(valid_f[..., 0]).reshape(
        1, h, w)[:, ::2, ::2].reshape(1, -1)
    np.testing.assert_array_equal(np.asarray(idx_s), idx_f_even)
    np.testing.assert_array_equal(np.asarray(valid_s[..., 0]),
                                  valid_f_even)


def test_edge_query_subsample_ba_bitwise():
    """Through the FactorGraph: subgrid edge matches scattered into the
    edge store must give a BITWISE-identical BA solve to full-grid
    matches at points_subsample=4 (BA reads exactly the even pixels)."""
    from mast3r_slam_tpu.frame import make_arena
    from mast3r_slam_tpu.global_opt import FactorGraph
    from mast3r_slam_tpu.testing import make_K, render_view

    h, w = 48, 64
    hw = h * w
    K = make_K(h, w)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.02, -0.02, 0.03, 0.0],
                              jnp.float32))
    _, Xc0, Xw0 = render_view(T0, h, w, K, "smooth")
    _, Xc1, Xw1 = render_view(T1, h, w, K, "smooth")
    D0 = world_descriptors(Xw0).reshape(1, h, w, -1)
    D1 = world_descriptors(Xw1).reshape(1, h, w, -1)
    rng = np.random.default_rng(3)
    Q = lambda seed: jnp.asarray(  # noqa: E731
        (3.0 + rng.standard_normal(hw) * 0.2).astype(np.float32)
    ).reshape(1, hw, 1)
    Qii, Qjj, Qji, Qij = Q(0), Q(1), Q(2), Q(3)

    class Eng:
        """match_symmetric over the true rendered pointmaps with a
        configurable edge query grid."""

        def __init__(self, qsub):
            self.qsub = qsub
            self.match_cfg = matching.MatchingConfig(**PROD_MATCH)

        def match_symmetric(self, fi, pi, fj, pj, params=None):
            X11 = jnp.concatenate(
                [jnp.asarray(Xc0.reshape(1, h, w, 3)),
                 jnp.asarray(Xc1.reshape(1, h, w, 3))])
            X21r = sim3.act(sim3.rel(T1, T0),
                            jnp.asarray(Xc0.reshape(-1, 3)))
            X12r = sim3.act(sim3.rel(T0, T1),
                            jnp.asarray(Xc1.reshape(-1, 3)))
            X21 = jnp.concatenate(
                [X12r.reshape(1, h, w, 3), X21r.reshape(1, h, w, 3)])
            D11 = jnp.concatenate([jnp.asarray(D0), jnp.asarray(D1)])
            D21 = jnp.concatenate([jnp.asarray(D1), jnp.asarray(D0)])
            idx, valid = matching.match(
                X11, X21, D11, D21, cfg=self.match_cfg,
                query_subsample=2 if self.qsub else 1,
            )
            return (idx[:1], idx[1:], valid[:1], valid[1:],
                    Qii, Qjj, Qji, Qij)

    def run(qsub):
        cfg = load_config("config/eval_no_calib.yaml")
        assert int(cfg["local_opt"]["points_subsample"]) == 4
        arena = make_arena(4, h, w, 16, 32)
        arena = arena.replace(
            X=arena.X.at[0].set(jnp.asarray(Xc0))
                     .at[1].set(jnp.asarray(Xc1)),
            C=arena.C.at[:2].set(10.0),
            N=arena.N.at[:2].set(1),
            T_WC=arena.T_WC.at[0].set(T0).at[1].set(
                sim3.mul(sim3.exp(jnp.asarray(
                    [0.03, -0.02, 0.02, 0.01, -0.01, 0.02, 0.0],
                    jnp.float32)), T1)),
            n_size=jnp.asarray(2, jnp.int32),
        )
        g = FactorGraph(Eng(qsub), hw, cfg)
        assert g.add_factors(arena, [0], [1], 0.0)
        res = g.solve_poses(arena, "ray")
        assert res is not None
        upd, Twc_new, _ = res
        return np.asarray(Twc_new), np.asarray(g.Q_ii2jj[0])

    T_full, Qrow_full = run(False)
    T_sub, Qrow_sub = run(True)
    # the Q rows differ only at odd pixels (zeros in the subgrid store);
    # at even pixels (BA's s=4 pattern) they are identical
    Qf = Qrow_full.reshape(h, w)[::2, ::2]
    Qs = Qrow_sub.reshape(h, w)[::2, ::2]
    np.testing.assert_array_equal(Qs, Qf)
    np.testing.assert_array_equal(T_sub, T_full)


def test_pose_warp_edge_query_subsample_even_pixels_identical():
    """The pose-warped consecutive edge under edge_query_subsample=2:
    stored idx/valid/Q must equal the full-grid run at the even pixels
    (BA's residual pattern) with odd pixels invalid."""
    from mast3r_slam_tpu.frame import make_arena
    from mast3r_slam_tpu.global_opt import FactorGraph
    from mast3r_slam_tpu.ops.matching import _q8_pair
    from mast3r_slam_tpu.testing import make_K, render_view

    h, w = 64, 96
    hw = h * w
    K = make_K(h, w)
    T0 = sim3.identity()
    T1 = sim3.exp(jnp.asarray([0.05, -0.03, 0.02, 0.03, -0.02, 0.03, 0.0],
                              jnp.float32))
    _, Xc0, Xw0 = render_view(T0, h, w, K, "occluder")
    _, Xc1, Xw1 = render_view(T1, h, w, K, "occluder")
    D0 = world_descriptors(Xw0)
    D1 = world_descriptors(Xw1)
    D8_1, D8_0 = _q8_pair(jnp.asarray(D1[None]), jnp.asarray(D0[None]))
    rng = np.random.default_rng(7)
    Qa = jnp.asarray(3.0 + 0.3 * rng.standard_normal(hw).astype(
        np.float32)).reshape(1, hw, 1)
    Qb = jnp.asarray(3.0 + 0.3 * rng.standard_normal(hw).astype(
        np.float32)).reshape(1, hw, 1)

    def run(eqs):
        from mast3r_slam_tpu.inference import InferenceEngine

        class StubEngine:
            match_cfg = matching.MatchingConfig(
                **PROD_MATCH, edge_query_subsample=eqs)
            match_arrays_warp = InferenceEngine.match_arrays_warp

        cfg = load_config("config/eval_no_calib.yaml")
        arena = make_arena(4, h, w, 16, 32)
        arena = arena.replace(
            X=arena.X.at[0].set(jnp.asarray(Xc0))
                     .at[1].set(jnp.asarray(Xc1)),
            T_WC=arena.T_WC.at[0].set(T0).at[1].set(T1),
            n_size=jnp.asarray(2, jnp.int32),
        )
        reuse = {
            "pair": (0, 1),
            "idx_j2i": jnp.zeros((1, hw), jnp.int32),
            "valid_i": jnp.ones((1, hw, 1), bool),
            "Qjj": Qa, "Qij": Qb,
            "desc8_frame": D8_1, "desc8_kf": D8_0,
        }
        g = FactorGraph(StubEngine(), hw, cfg)
        assert g._add_consecutive_reused(arena, 0, 1, reuse)
        return (np.asarray(g.idx_ii2jj[0]), np.asarray(g.valid_match_j[0]),
                np.asarray(g.Q_ii2jj[0]))

    idx_f, vm_f, Q_f = run(1)
    idx_s, vm_s, Q_s = run(2)
    even = lambda A: A.reshape(h, w)[::2, ::2]
    np.testing.assert_array_equal(even(idx_s), even(idx_f))
    np.testing.assert_array_equal(even(vm_s), even(vm_f))
    np.testing.assert_array_equal(even(Q_s), even(Q_f))
    # odd pixels of the subgrid store are invalid (never consumed by BA)
    odd_mask = np.ones((h, w), bool)
    odd_mask[::2, ::2] = False
    assert not vm_s.reshape(h, w)[odd_mask].any()
