"""Matcher tests: self-projection identity oracle (the reference's
idx_init=arange identity initialization gives the ground truth), convergence
from perturbed inits, descriptor refinement snapping."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching
from mast3r_slam_tpu.ops.geometry import backproject, get_pixel_coords


def synthetic_pointmap(h, w, seed=0):
    """Smooth synthetic pointmap via backprojection of a smooth depth field."""
    K = jnp.asarray(
        [[2.0 * w, 0, w / 2], [0, 2.0 * w, h / 2], [0, 0, 1]], dtype=jnp.float32
    )
    uv = get_pixel_coords(1, (h, w))
    u, v = uv[..., 0], uv[..., 1]
    z = 2.0 + 0.3 * jnp.sin(2 * jnp.pi * u / w) * jnp.cos(2 * jnp.pi * v / h)
    X = backproject(uv, z[..., None], K)
    return X  # (1, h, w, 3)


def unique_descriptors(h, w, f=24, seed=0):
    """Spatially smooth, locally discriminative descriptors (multi-frequency
    positional encodings): dot(D(p), D(q)) peaks at p == q and decays with
    |p - q|.  Real MASt3R descriptors are spatially smooth too — random
    descriptors would break the coarse-to-fine dilated search by design."""
    u = np.arange(w)[None, :].repeat(h, 0) / w
    v = np.arange(h)[:, None].repeat(w, 1) / h
    feats = []
    for k in range(f // 4):
        freq = 2.0 * np.pi * (k + 1)
        feats += [np.sin(freq * u), np.cos(freq * u),
                  np.sin(freq * v), np.cos(freq * v)]
    D = np.stack(feats, axis=-1).astype(np.float32)[None]
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    return jnp.asarray(D)


def test_self_match_identity():
    h, w = 24, 32
    X = synthetic_pointmap(h, w)
    D = unique_descriptors(h, w)
    cfg = matching.MatchingConfig()
    idx, valid = matching.match(X, X, D, D, cfg=cfg)
    ident = jnp.arange(h * w)[None]
    frac_exact = float(jnp.mean(idx == ident))
    assert frac_exact > 0.99, frac_exact
    # border ring cannot converge (iter_proj clamps to [1, w-2]) — interior
    # validity should be complete
    valid_img = valid.reshape(h, w)
    assert float(valid_img[2:-2, 2:-2].mean()) > 0.99
    assert float(valid.mean()) > 0.80


def test_iter_proj_recovers_from_offset():
    h, w = 24, 32
    X = synthetic_pointmap(h, w)
    rays_img, pts3d_norm, p_init = matching.prep_for_iter_proj(X, X, None)
    # Perturb the init by 2 pixels
    p_shifted = p_init + 2.0
    p_new, conv = matching.iter_proj(
        rays_img, pts3d_norm, p_shifted, max_iter=30, lambda_init=1e-8,
        cost_thresh=1e-6,
    )
    # Interior pixels should come back to themselves
    err = jnp.abs(p_new - p_init).max(axis=-1).reshape(h, w)
    interior = err[4:-4, 4:-4]
    assert float(jnp.median(interior)) < 0.5
    assert float(conv.reshape(h, w)[4:-4, 4:-4].mean()) > 0.8


def test_refine_matches_snaps_to_true_pixel():
    h, w, f = 16, 20, 24
    D = unique_descriptors(h, w, f)
    D21 = D.reshape(1, h * w, f)
    p_true = matching.lin_to_pixel(jnp.arange(h * w)[None], w).astype(jnp.int32)
    rng = np.random.default_rng(1)
    p_noisy = p_true + jnp.asarray(
        rng.integers(-2, 3, size=p_true.shape), dtype=jnp.int32
    )
    p_noisy = jnp.clip(p_noisy, 0, jnp.asarray([w - 1, h - 1]))
    p_ref = matching.refine_matches(
        D.astype(jnp.bfloat16), D21.astype(jnp.bfloat16), p_noisy,
        radius=3, dilation_max=5,
    )
    # unique random descriptors: dot with self ~1, others << 1
    exact = jnp.all(p_ref == p_true, axis=-1).reshape(h, w)
    # interior snaps exactly; borders may lose reachability under clipping
    assert float(exact[3:-3, 3:-3].mean()) > 0.99, float(exact.mean())
    assert float(exact.mean()) > 0.90


def test_match_asymmetric_valid_occlusion():
    """Points far from any X11 point should be marked invalid by the
    3D-distance occlusion check."""
    h, w = 16, 20
    X11 = synthetic_pointmap(h, w)
    X21 = X11 + jnp.asarray([5.0, 0.0, 0.0])  # huge 3D offset: all occluded
    D = unique_descriptors(h, w)
    idx, valid = matching.match(X11, X21, D, D)
    assert float(valid.mean()) < 0.05


def test_refine_u_pack_invariance():
    """The u_pack row-packing factor is a pure layout optimization: results
    must be identical for every packing width (incl. the spurious-column
    masking of the last partial group)."""
    h, w, f = 16, 20, 24
    D = unique_descriptors(h, w, f)
    D21 = D.reshape(1, h * w, f)
    p_true = matching.lin_to_pixel(jnp.arange(h * w)[None], w).astype(jnp.int32)
    rng = np.random.default_rng(7)
    p_noisy = p_true + jnp.asarray(
        rng.integers(-3, 4, size=p_true.shape), dtype=jnp.int32
    )
    p_noisy = jnp.clip(p_noisy, 0, jnp.asarray([w - 1, h - 1]))
    outs = [
        matching.refine_matches(
            D.astype(jnp.bfloat16), D21.astype(jnp.bfloat16), p_noisy,
            radius=3, dilation_max=5, u_pack=up,
        )
        for up in (1, 2, 4, 7)
    ]
    for o in outs[1:]:
        np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(o))


def test_refine_layout_invariance():
    """qmajor (queries-in-sublanes, transpose-free scoring) and the legacy
    lanes-last layout are pure layout choices: bit-identical results on both
    float and integer descriptor tables, including boundary masking and
    first-maximum tie-breaking."""
    h, w, f = 16, 20, 24
    D = unique_descriptors(h, w, f)
    D21 = D.reshape(1, h * w, f)
    p_true = matching.lin_to_pixel(jnp.arange(h * w)[None], w).astype(jnp.int32)
    rng = np.random.default_rng(11)
    p_noisy = p_true + jnp.asarray(
        rng.integers(-4, 5, size=p_true.shape), dtype=jnp.int32
    )
    p_noisy = jnp.clip(p_noisy, 0, jnp.asarray([w - 1, h - 1]))

    def q8(x):
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        return jnp.clip(jnp.round(x * s), -127, 127).astype(jnp.int8)

    for T11, T21 in [(D, D21), (q8(D), q8(D21))]:
        a = matching.refine_matches(T11, T21, p_noisy, qmajor=True)
        b = matching.refine_matches(T11, T21, p_noisy, qmajor=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_match_coarse_subsample_agrees():
    """coarse_subsample=2 (half-res LM + coarse refine walk, full-res d=1
    finish) must agree with the reference-exact path on smooth scenes and
    return exact identity on a self-match."""
    h, w = 48, 64
    X11 = synthetic_pointmap(h, w)
    X21 = X11 + jnp.asarray([0.02, 0.01, 0.0])
    D = unique_descriptors(h, w, 24)
    idx1, v1 = matching.match(X11, X21, D, D, cfg=matching.MatchingConfig())
    idx2, v2 = matching.match(
        X11, X21, D, D, cfg=matching.MatchingConfig(coarse_subsample=2))
    assert float(jnp.mean(idx1 == idx2)) > 0.99
    assert float(jnp.mean(v1 == v2)) > 0.95

    idxs, _ = matching.match(
        X11, X11, D, D, cfg=matching.MatchingConfig(coarse_subsample=2))
    assert float(jnp.mean(idxs == jnp.arange(h * w)[None])) == 1.0


def test_refine_int4_coarse_dilations():
    """coarse_bits=4 nibble-packs the descriptor table for dilations > 1
    (halving the binding gather-byte cost on TPU) while the final d=1 pass
    stays int8.  On well-separated descriptors the coarse walk must still
    deliver the exact match, and agreement with the full-int8 path must be
    near-total."""
    h, w, f = 32, 40, 24
    D = unique_descriptors(h, w, f)
    D21 = D.reshape(1, h * w, f)
    p_true = matching.lin_to_pixel(jnp.arange(h * w)[None], w).astype(jnp.int32)
    rng = np.random.default_rng(3)
    p_noisy = jnp.clip(
        p_true + jnp.asarray(rng.integers(-8, 9, size=p_true.shape),
                             jnp.int32),
        0, jnp.asarray([w - 1, h - 1]),
    )

    def q8(x):
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        return jnp.clip(jnp.round(x * s), -127, 127).astype(jnp.int8)

    p8 = matching.refine_matches(q8(D), q8(D21), p_noisy, coarse_bits=8)
    p4 = matching.refine_matches(q8(D), q8(D21), p_noisy, coarse_bits=4)
    exact4 = jnp.all(p4 == p_true, -1).reshape(h, w)[4:-4, 4:-4]
    assert float(exact4.mean()) == 1.0
    assert float(jnp.all(p8 == p4, -1).mean()) > 0.98


def test_refine_int8_matches_bf16():
    """int8 descriptor tables (the TPU default: gathers are byte-bound)
    must produce the same snapping behavior as bf16 on well-separated
    descriptors, and the full match() int8 path must agree with the bf16
    path almost everywhere."""
    h, w, f = 16, 20, 24
    D = unique_descriptors(h, w, f)
    D21 = D.reshape(1, h * w, f)
    p_true = matching.lin_to_pixel(jnp.arange(h * w)[None], w).astype(jnp.int32)
    rng = np.random.default_rng(3)
    p_noisy = p_true + jnp.asarray(
        rng.integers(-2, 3, size=p_true.shape), dtype=jnp.int32
    )
    p_noisy = jnp.clip(p_noisy, 0, jnp.asarray([w - 1, h - 1]))

    def q8(x):
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        return jnp.clip(jnp.round(x * s), -127, 127).astype(jnp.int8)

    p_ref = matching.refine_matches(q8(D), q8(D21), p_noisy,
                                    radius=3, dilation_max=5)
    exact = jnp.all(p_ref == p_true, axis=-1).reshape(h, w)
    assert float(exact[3:-3, 3:-3].mean()) > 0.99

    X = synthetic_pointmap(h, w)
    idx8, valid8 = matching.match(
        X, X, D, D, cfg=matching.MatchingConfig(desc_bits=8))
    idx16, valid16 = matching.match(
        X, X, D, D, cfg=matching.MatchingConfig(desc_bits=16))
    agree = float(jnp.mean(idx8 == idx16))
    assert agree > 0.99, agree
    np.testing.assert_array_equal(np.asarray(valid8), np.asarray(valid16))


def test_lin_pixel_roundtrip():
    w = 17
    idx = jnp.arange(0, 17 * 5)
    p = matching.lin_to_pixel(idx, w)
    np.testing.assert_array_equal(matching.pixel_to_lin(p, w), idx)


def test_match_final_radius_agrees():
    """Under coarse_subsample=2 a final_radius=2 d=1 refine must reproduce
    the radius-3 result exactly on a rigid rotation+translation warp with a
    depth discontinuity (the coarse walk leaves the position field within
    ~1 px of the optimum)."""
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    h, w = 48, 64
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = jnp.full((h, w), 3.0)
    z = z.at[15:30, 20:45].set(1.5)
    z = z + 0.3 * jnp.sin(u / 9.0) * jnp.cos(v / 7.0)
    fx = fy = 60.0
    X11 = jnp.stack([(u - w / 2) / fx * z, (v - h / 2) / fy * z, z],
                    -1)[None]
    T = sim3.exp(jnp.asarray([0.04, -0.03, 0.02, 0.03, -0.02, 0.04, 0.0]))
    X21 = sim3.act(T, X11.reshape(1, -1, 3)).reshape(X11.shape)
    D = unique_descriptors(h, w, 24)

    idx3, v3 = matching.match(
        X11, X21, D, D, cfg=matching.MatchingConfig(coarse_subsample=2))
    idx2, v2 = matching.match(
        X11, X21, D, D,
        cfg=matching.MatchingConfig(coarse_subsample=2, final_radius=2))
    both = v3[..., 0] & v2[..., 0]
    assert float(jnp.mean(both)) > 0.4
    assert bool(jnp.all(jnp.where(both, idx2 == idx3, True)))


def test_match_coarse_radius_agrees():
    """The production coarse schedule (coarsest dilation at full radius,
    inner dilations and final pass at radius 2) must reproduce the
    all-radius-3 reference-exact match on valid pixels, including under an
    extreme keyframe-reset warp (large rotation + translation + scale with
    a depth discontinuity)."""
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    h, w = 48, 64
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = jnp.full((h, w), 3.0)
    z = z.at[15:30, 20:45].set(1.5)
    z = z + 0.3 * jnp.sin(u / 9.0) * jnp.cos(v / 7.0)
    fx = fy = 60.0
    X11 = jnp.stack([(u - w / 2) / fx * z, (v - h / 2) / fy * z, z],
                    -1)[None]
    D = unique_descriptors(h, w, 24)
    for xi in ([0.04, -0.03, 0.02, 0.03, -0.02, 0.04, 0.0],
               [0.15, -0.1, 0.08, 0.10, -0.08, 0.12, 0.05]):
        T = sim3.exp(jnp.asarray(xi))
        X21 = sim3.act(T, X11.reshape(1, -1, 3)).reshape(X11.shape)
        idx_ref, v_ref = matching.match(
            X11, X21, D, D, cfg=matching.MatchingConfig())
        idx, vv = matching.match(
            X11, X21, D, D,
            cfg=matching.MatchingConfig(
                coarse_subsample=2, final_radius=2, coarse_radius=2))
        both = v_ref[..., 0] & vv[..., 0]
        agree = float(jnp.mean(jnp.where(both, idx == idx_ref, True)))
        assert agree > 0.995, agree


def test_match_lm_and_occlusion_subsample_options():
    """lm_subsample=4 / occlusion_subsample=2 gather-row savers must stay
    mechanically correct: identical indices on valid pixels, similar
    valid fraction.  lm_subsample=4 is the production default since round
    3 (-2.3 ms/frame): on rendered occlusion scenes its exact-pixel
    accuracy is +0.7% with -6% coverage and an unchanged false-valid rate
    (tests/test_adversarial.py); the mask churn lives at depth boundaries
    where the per-pixel 3D occlusion gate still rules.
    occlusion_subsample=2 stays OFF (it replicates the GATE verdict
    itself)."""
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    h, w = 48, 64
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = jnp.full((h, w), 3.0) + 0.3 * jnp.sin(u / 9.0) * jnp.cos(v / 7.0)
    fx = fy = 60.0
    X11 = jnp.stack([(u - w / 2) / fx * z, (v - h / 2) / fy * z, z],
                    -1)[None]
    T = sim3.exp(jnp.asarray([0.04, -0.03, 0.02, 0.03, -0.02, 0.04, 0.0]))
    X21 = sim3.act(T, X11.reshape(1, -1, 3)).reshape(X11.shape)
    D = unique_descriptors(h, w, 24)

    base = dict(coarse_subsample=2, final_radius=2, coarse_radius=2)
    idx0, v0 = matching.match(
        X11, X21, D, D, cfg=matching.MatchingConfig(**base))
    for kw in (dict(occlusion_subsample=2), dict(lm_subsample=4),
               dict(occlusion_subsample=2, lm_subsample=4)):
        idx, vv = matching.match(
            X11, X21, D, D, cfg=matching.MatchingConfig(**base, **kw))
        both = v0[..., 0] & vv[..., 0]
        assert bool(jnp.all(jnp.where(both, idx == idx0, True))), kw
        assert abs(float(vv.mean()) - float(v0.mean())) < 0.1, kw


def test_match_dilation_schedule_agrees():
    """The thinned coarse schedule (4, 2) — each stage's reach covering the
    previous stage's step — must reproduce the reference-exact all-dilation
    walk on valid pixels, with final_radius 2 and 1, on both a small warp
    and an extreme keyframe-reset warp.  (ATE-identical on the oracle
    harness; adopted as the production schedule for ~2x less coarse-stage
    gather+pack traffic.)"""
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    h, w = 48, 64
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    z = jnp.full((h, w), 3.0)
    z = z.at[15:30, 20:45].set(1.5)
    z = z + 0.3 * jnp.sin(u / 9.0) * jnp.cos(v / 7.0)
    fx = fy = 60.0
    X11 = jnp.stack([(u - w / 2) / fx * z, (v - h / 2) / fy * z, z],
                    -1)[None]
    D = unique_descriptors(h, w, 24)
    for xi in ([0.04, -0.03, 0.02, 0.03, -0.02, 0.04, 0.0],
               [0.15, -0.1, 0.08, 0.10, -0.08, 0.12, 0.05]):
        T = sim3.exp(jnp.asarray(xi))
        X21 = sim3.act(T, X11.reshape(1, -1, 3)).reshape(X11.shape)
        idx_ref, v_ref = matching.match(
            X11, X21, D, D, cfg=matching.MatchingConfig())
        # the schedule itself is near-exact (>=0.999 at final_radius=2);
        # final_radius=1 adds ~0.5% churn of 1-px-off matches (measured
        # ATE-identical on the oracle)
        for fr, bar in ((2, 0.999), (1, 0.99)):
            idx, vv = matching.match(
                X11, X21, D, D,
                cfg=matching.MatchingConfig(
                    coarse_subsample=2, final_radius=fr, coarse_radius=2,
                    dilation_schedule=(4, 2)))
            both = v_ref[..., 0] & vv[..., 0]
            agree = float(jnp.mean(jnp.where(both, idx == idx_ref, True)))
            assert agree >= bar, (xi, fr, agree)


def test_pack_rows_mxu_matches_roll_interior():
    """The Pallas MXU-placement packed-table build must equal the
    roll-based build bitwise on every interior row (rows whose probes all
    fall inside the image); boundary rows differ only where the consumer
    masks (wrap vs zero padding — ops/pack.py docstring).  int8 and f16
    paths."""
    from jax.experimental.pallas import tpu as pltpu

    from mast3r_slam_tpu.ops import pack

    h, w = 24, 32
    hw = h * w
    rng = np.random.default_rng(0)
    offs = tuple(pack._offsets(5, 2, 4, w, 2))
    lo, hi = -min(0, min(offs)), hw - max(0, max(offs))

    tbl8 = jnp.asarray(rng.integers(-127, 128, (1, hw, 8), dtype=np.int8))
    tblf = jnp.asarray(
        rng.standard_normal((1, hw, 8)).astype(np.float16))
    for tbl in (tbl8, tblf):
        roll = np.asarray(pack.pack_rows_roll(tbl, offs))
        with pltpu.force_tpu_interpret_mode():
            mxu = np.asarray(pack.pack_rows_mxu(tbl, offs))
        np.testing.assert_array_equal(roll[:, lo:hi], mxu[:, lo:hi])


def test_match_desc_global_accuracy():
    """Pose-free global descriptor matching (the decode-free retrieval-
    edge path): on two rendered views with a large relative Sim(3) offset
    and globally-unique world descriptors, the matcher must recover the
    true correspondence to 1 px on essentially every mutually-visible
    query, with no high-error matches surviving the cycle gate.  No pose
    enters the computation — accuracy is invariant to any accumulated
    pose-graph drift (the loop-closure regime that makes the pose-warped
    fast path unsafe there)."""
    import jax

    from mast3r_slam_tpu import testing as T
    from mast3r_slam_tpu.ops import lie_sim3 as sim3
    from mast3r_slam_tpu.ops.matching import (MatchingConfig,
                                              match_desc_global)

    h, w = 64, 96
    K = T.make_K(h, w)
    T_i = sim3.identity()
    xi = jnp.asarray([0.35, -0.2, 0.1, 0.08, -0.1, 0.06, 0.05],
                     jnp.float32)
    T_j = sim3.exp(xi)
    _, _, Xw_i = T.render_view(T_i, h, w, K)
    _, _, Xw_j = T.render_view(T_j, h, w, K)

    def q8(D):
        return np.clip(np.round(D * 127.0), -127, 127).astype(np.int8)

    D8_i = jnp.asarray(
        q8(T.world_descriptors(Xw_i, geometric=True)).reshape(1, h, w, 24))
    D8_j = jnp.asarray(
        q8(T.world_descriptors(Xw_j, geometric=True)).reshape(1, h, w, 24))
    ones = jnp.ones((1, h * w, 1), jnp.float32)
    cfg = MatchingConfig(coarse_subsample=2, final_radius=1,
                         coarse_radius=2, dilation_schedule=(4, 2),
                         lm_subsample=4, edge_query_subsample=2)
    out = jax.jit(
        lambda a, b, c, d: match_desc_global(a, b, c, d, h, w, cfg)
    )(D8_i, D8_j, ones, ones)
    idx_i2j, _, vm_j = out[0], out[1], out[2]

    # oracle correspondence: project j's world points into i
    Xc = np.asarray(sim3.act(sim3.inv(T_i), jnp.asarray(Xw_j)))
    uv = (K @ Xc.T).T
    u = np.round(uv[:, 0] / uv[:, 2]).astype(int)
    v = np.round(uv[:, 1] / uv[:, 2]).astype(int)
    inside = (u >= 0) & (u < w) & (v >= 0) & (v < h) & (Xc[:, 2] > 0)
    true_idx = np.where(inside, v * w + u, -1)

    qsel = (np.arange(h * w).reshape(h, w)[::2, ::2]).reshape(-1)
    tj, ins_j = true_idx[qsel], inside[qsel]
    pred = np.asarray(idx_i2j[0])
    vmj = np.asarray(vm_j[0, :, 0])
    err = np.maximum(np.abs(pred % w - tj % w),
                     np.abs(pred // w - tj // w))
    m = ins_j & vmj
    assert vmj[ins_j].mean() > 0.9, vmj[ins_j].mean()
    assert (err[m] <= 1).mean() > 0.99, (err[m] <= 1).mean()
    assert (err[m] > 3).mean() < 0.01, (err[m] > 3).mean()
