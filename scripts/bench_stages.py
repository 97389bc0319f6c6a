#!/usr/bin/env python
"""Per-stage TPU latency breakdown of the frontend frame budget.

Times, with the relay-proof chain methodology (see bench.py):
  * encoder           (ViT-L, 768 tokens)
  * decoder+heads     (asymmetric two-view decode incl. DPT + catMLP)
  * matcher           (iter_proj + refine, production resolution)
  * GN pose solve     (50 iterations, both residual flavors)

Usage: python scripts/bench_stages.py [stage ...]
  stages: enc dec match gn   (default: all)
Env: CHAIN (default 6), SMALL=1 for tiny-model smoke.
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(step, init_carry, readback, n, label, const=None):
    """const: large device pytrees (e.g. params) passed as jit ARGUMENTS —
    closing over them would inline them as constants into the remote
    compile request (HTTP 413 past ~a few hundred MB)."""
    def chained(k):
        @jax.jit
        def f(const, carry):
            carry = jax.lax.fori_loop(
                0, k, lambda i, c: step(const, c), carry)
            return readback(carry)
        return f

    f1, fN = chained(1), chained(n)
    t0 = time.time()
    float(f1(const, init_carry))
    log(f"  {label}: compiled in {time.time() - t0:.1f}s")
    float(fN(const, init_carry))
    t0 = time.time(); float(f1(const, init_carry)); t1 = time.time() - t0
    t0 = time.time(); float(fN(const, init_carry)); tN = time.time() - t0
    ms = (tN - t1) / (n - 1) * 1e3
    log(f"  {label}: {ms:.2f} ms/step")
    print(f"{label}_ms {ms:.2f}", flush=True)
    return ms


def main():
    cache = pathlib.Path(".jax_cache"); cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
    except Exception:
        pass

    from mast3r_slam_tpu.inference import InferenceEngine
    from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
    from mast3r_slam_tpu.ops import geometry, lie_sim3 as sim3, matching
    from mast3r_slam_tpu import tracker as trk

    small = os.environ.get("SMALL") == "1"
    n_chain = int(os.environ.get("CHAIN", "6"))
    stages = sys.argv[1:] or ["enc", "dec", "match", "gn"]

    if small:
        cfg = MASt3RConfig.tiny(); h, w = 96, 128
    else:
        cfg = MASt3RConfig.vit_large(head_dtype=jnp.bfloat16)
        h, w = 384, 512
    hw = h * w
    log(f"devices={jax.devices()} res={h}x{w} chain={n_chain} stages={stages}")

    model = MASt3R(cfg)
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_img, init_img)
    engine = InferenceEngine(
        model, params, (h, w),
        match_cfg=matching.MatchingConfig(coarse_subsample=2,
                                          final_radius=1, coarse_radius=2,
                                          dilation_schedule=(4, 2),
                                          lm_subsample=4,
                                          dist_thresh=1e9),
    )  # production matching config (config/base.yaml); dist_thresh=1e9
       # keeps all matches valid on the random-weight fixtures, like
       # bench.py — otherwise the GN while_loop exits after ~1 iteration
       # (singular H -> done) and track/glue under-measure by ~4 ms
    params = engine.params  # bf16-trunk-cast (production weights)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)

    if "enc" in stages:
        def enc_step(p, c):
            feat, pos = model.apply(p, c, method=MASt3R.encode)
            return c + 1e-12 * jnp.mean(feat)
        timed_chain(enc_step, img, lambda c: c[0, 0, 0, 0], n_chain,
                    "encoder", const=params)

    if "int8" in stages:
        from mast3r_slam_tpu.models.quant import (
            encode_int8, quantize_encoder_params,
        )
        qparams = quantize_encoder_params(params)

        def enc8_step(pq, c):
            feat, pos = encode_int8(pq[0], pq[1], c, cfg)
            return c + 1e-12 * jnp.mean(feat)
        timed_chain(enc8_step, img, lambda c: c[0, 0, 0, 0], n_chain,
                    "encoder_int8", const=(params, qparams))

    feat, pos = engine.encode(img)

    if "dec" in stages:
        def dec_step(p, c):
            f1, f2 = c
            (X, C, D, Q), r2 = engine._decode_head_impl(
                (h, w), p, f1, pos, f2, pos)
            # consume EVERY output (a single-element readback lets XLA
            # slice the spatially-local head convs down to one pixel)
            s = (jnp.sum(X) + jnp.sum(C) + jnp.sum(D) + jnp.sum(Q)
                 + sum(jnp.sum(a) for a in r2))
            return (f1 + 1e-12 * s, f2)
        timed_chain(dec_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain, "decode_asym",
                    const=params)

    if "decblocks" in stages:
        # decoder trunk only (no DPT/catMLP heads): isolates the head cost
        from mast3r_slam_tpu.models.mast3r import MASt3R

        def db_step(p, c):
            f1, f2 = c
            d1, d2 = model.apply(p, f1, pos, f2, pos, method=MASt3R.decode)
            s = sum(jnp.sum(a.astype(jnp.float32)) for a in d1) \
                + sum(jnp.sum(a.astype(jnp.float32)) for a in d2)
            return (f1 + 1e-12 * s, f2)
        timed_chain(db_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain, "decoder_blocks",
                    const=params)

    if "dpthead" in stages or "catmlp" in stages:
        # head ablation from fixed decoder tokens (B=1, ONE view: the frame
        # cost is ~2x each).  Full consumption (sum of outputs).
        key = jax.random.PRNGKey(11)
        n_tok = engine.n_patches
        toks = [jax.random.normal(key, (1, n_tok, cfg.enc_embed_dim),
                                  jnp.float32)] + [
            jax.random.normal(jax.random.PRNGKey(12 + i),
                              (1, n_tok, cfg.dec_embed_dim), jnp.float32)
            for i in range(cfg.dec_depth)
        ]

        if "dpthead" in stages:
            def dpt_step(p, c):
                t0c = [t + 1e-12 * c for t in toks]
                hooked = [t0c[hh].astype(jnp.float32) for hh in cfg.hooks]
                out = model.apply(
                    p, method=lambda m: m.dpt1(hooked, (h, w)))
                return c + 1e-12 * jnp.sum(out)
            timed_chain(dpt_step, jnp.zeros(()), lambda c: c, n_chain,
                        "dpt_head_1view", const=params)

        if "catmlp" in stages:
            def cat_step(p, c):
                out = model.apply(
                    p, method=lambda m: m.local1(
                        toks[0] + 1e-12 * c, toks[-1] + 1e-12 * c, (h, w)))
                return c + 1e-12 * jnp.sum(out)
            timed_chain(cat_step, jnp.zeros(()), lambda c: c, n_chain,
                        "catmlp_head_1view", const=params)

    if "match" in stages:
        X = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)) \
            + jnp.asarray([0, 0, 3.0])
        D = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 24),
                              jnp.bfloat16)
        def match_step(_, c):
            idx, valid = matching.match(X + 1e-12 * c, X, D, D)
            s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
            return c + 1e-12 * s.astype(jnp.float32)
        timed_chain(match_step, jnp.zeros(()), lambda c: c, n_chain,
                    "match_full")

    if "match2" in stages:
        X = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)) \
            + jnp.asarray([0, 0, 3.0])
        D = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 24),
                              jnp.bfloat16)
        mcfg = matching.MatchingConfig(coarse_subsample=2, final_radius=2, coarse_radius=2)

        def match2_step(_, c):
            idx, valid = matching.match(X + 1e-12 * c, X, D, D, cfg=mcfg)
            s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
            return c + 1e-12 * s.astype(jnp.float32)
        timed_chain(match2_step, jnp.zeros(()), lambda c: c, n_chain,
                    "match_cs2")

    if "matchrt" in stages:
        # match_cs2 with ALL inputs carry-dependent: in `match` above, X/D
        # are closed-over constants, so XLA constant-folds the descriptor
        # quantize + the whole window-pack table build at compile time.  In
        # the composed frame step those tables are rebuilt from the decode
        # outputs every frame.  (match) vs (this) isolates how much of the
        # "composition overhead" is really runtime table-build cost that
        # the isolated bench folded away.
        X = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)) \
            + jnp.asarray([0, 0, 3.0])
        D = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 24),
                              jnp.float32)
        mcfgrt = matching.MatchingConfig(coarse_subsample=2, final_radius=2,
                                         coarse_radius=2)

        def matchrt_step(_, c):
            eps = 1e-12 * c
            idx, valid = matching.match(X + eps, X + eps, D + eps, D + eps,
                                        cfg=mcfgrt)
            s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
            return c + 1e-12 * s.astype(jnp.float32)
        timed_chain(matchrt_step, jnp.zeros(()), lambda c: c, n_chain,
                    "match_cs2_runtime")

    if any(s.startswith("mrt_") for s in stages):
        # matchrt decomposition: runtime-input matcher with stages disabled.
        #   mrt_lm    — LM projection + occlusion only (radius=0)
        #   mrt_fin   — + final d=1 refine only (dilation_max=1)
        #   mrt_full  — everything (== matchrt)
        #   mrt_fr1   — everything with final_radius=1
        # coarse-walk cost = full - fin; final-refine cost = fin - lm.
        X = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)) \
            + jnp.asarray([0, 0, 3.0])
        D = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 24),
                              jnp.float32)
        variants = {
            "mrt_lm": dict(coarse_subsample=2, radius=0),
            "mrt_fin": dict(coarse_subsample=2, final_radius=2,
                            dilation_max=1),
            "mrt_fin1": dict(coarse_subsample=2, final_radius=1,
                             dilation_max=1),
            "mrt_full": dict(coarse_subsample=2, final_radius=2,
                             coarse_radius=2),
            "mrt_fr1": dict(coarse_subsample=2, final_radius=1,
                            coarse_radius=2),
            "mrt_s42": dict(coarse_subsample=2, final_radius=1,
                            coarse_radius=2, dilation_schedule=(4, 2)),
            "mrt_s42lt": dict(coarse_subsample=2, final_radius=1,
                              coarse_radius=2, dilation_schedule=(4, 2),
                              lm_table_subsample=2),
            "mrt_s42lm4": dict(coarse_subsample=2, final_radius=1,
                               coarse_radius=2, dilation_schedule=(4, 2),
                               lm_subsample=4),
            "mrt_s42f2": dict(coarse_subsample=2, final_radius=2,
                              coarse_radius=2, dilation_schedule=(4, 2)),
        }
        for name, kw in variants.items():
            if name not in stages:
                continue
            mc = matching.MatchingConfig(**kw)

            def mrt_step(_, c, mc=mc):
                eps = 1e-12 * c
                idx, valid = matching.match(
                    X + eps, X + eps, D + eps, D + eps, cfg=mc)
                # consume EVERY query's idx and valid: a single-element
                # readback lets XLA slice the whole per-pixel pipeline down
                # to one query (measured: radius=0 variant collapsed to ~0)
                s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
                return c + 1e-12 * s.astype(jnp.float32)
            timed_chain(mrt_step, jnp.zeros(()), lambda c: c, n_chain, name)

    if "glue" in stages:
        # track_step with matching stubbed to identity: measures
        # decode + gating + fusion + scatter + GN, i.e. everything EXCEPT
        # the matcher.  (full track) - (this) = matcher-in-context;
        # (this) - dec - gn = glue.
        from mast3r_slam_tpu.frame import make_empty_frame

        n_patches = engine.n_patches
        kf0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        kf0 = kf0.replace(feat=feat[0], pos=pos[0].astype(jnp.int32),
                          N=jnp.ones((), jnp.int32),
                          N_updates=jnp.ones((), jnp.int32))
        fr0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        fr0 = fr0.replace(feat=feat[0] + 0.01, pos=pos[0].astype(jnp.int32))
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        tcfg = trk.TrackerConfig(C_conf=-1e9, Q_conf=-1e9, rel_error=0.0,
                                 delta_norm=0.0)
        K = jnp.eye(3)

        def glue_step(p, c):
            fr, kf = c

            def stub_matcher(f1, p1, f2, p2, idx):
                (X1, C1, D1, Q1), (X2, C2, D2, Q2) = \
                    engine._decode_head_impl((h, w), p, f1, p1, f2, p2)
                b = X1.shape[0]
                fl3 = lambda A: A.reshape(b, -1, A.shape[-1])
                fl1 = lambda A: A.reshape(b, -1, 1)
                return (idx, jnp.ones((b, h * w, 1), bool),
                        fl3(X1), fl1(C1), fl1(Q1),
                        fl3(X2), fl1(C2), fl1(Q2))

            res = trk.track_step(stub_matcher, fr, kf, idx0, K, tcfg)
            # FULL consumption (bench.py discipline): a pose-only readback
            # lets XLA DCE the keyframe fusion write-back + uniqueness
            # scatter, understating the no-matcher baseline
            consume = (
                res.frame.T_WC[0] + res.new_kf_metric + res.match_frac
                + res.ok.astype(jnp.float32)
                + jnp.sum(res.keyframe.X_canon) + jnp.sum(res.keyframe.C)
                + jnp.sum(res.frame.X_canon) + jnp.sum(res.frame.C)
            )
            fr = fr.replace(
                feat=fr.feat + 1e-12 * consume,
                N=jnp.zeros((), jnp.int32),
                N_updates=jnp.zeros((), jnp.int32))
            return (fr, kf)

        timed_chain(glue_step, (fr0, kf0), lambda c: c[0].feat[0, 0],
                    n_chain, "track_nomatch", const=params)

    if "track" in stages:
        # full honest track step (same chain construction as bench.py)
        from mast3r_slam_tpu.frame import make_empty_frame

        n_patches = engine.n_patches
        kf0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        kf0 = kf0.replace(feat=feat[0], pos=pos[0].astype(jnp.int32),
                          N=jnp.ones((), jnp.int32),
                          N_updates=jnp.ones((), jnp.int32))
        fr0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        fr0 = fr0.replace(feat=feat[0] + 0.01, pos=pos[0].astype(jnp.int32))
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        tcfg = trk.TrackerConfig(C_conf=-1e9, Q_conf=-1e9, rel_error=0.0,
                                 delta_norm=0.0)
        K = jnp.eye(3)

        def track_step_(p, c):
            fr, kf = c

            def matcher(f1, p1, f2, p2, idx):
                return engine._match_asymmetric_impl(p, f1, p1, f2, p2, idx)

            res = trk.track_step(matcher, fr, kf, idx0, K, tcfg)
            consume = (
                res.frame.T_WC[0] + res.new_kf_metric + res.match_frac
                + res.ok.astype(jnp.float32)
                + jnp.sum(res.keyframe.X_canon) + jnp.sum(res.keyframe.C)
                + jnp.sum(res.frame.X_canon) + jnp.sum(res.frame.C)
            )
            fr = fr.replace(
                feat=fr.feat + 1e-12 * consume,
                N=jnp.zeros((), jnp.int32),
                N_updates=jnp.zeros((), jnp.int32))
            return (fr, kf)

        timed_chain(track_step_, (fr0, kf0), lambda c: c[0].feat[0, 0],
                    n_chain, "track_full", const=params)

    if "decmatch" in stages:
        # decode + matcher composed in ONE jit (the engine's
        # _match_asymmetric_impl): detects composition overheads vs the
        # isolated dec + match_cs2 numbers (rematerialization under memory
        # pressure, scheduling).
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]

        def dm_step(p, c):
            f1, f2 = c
            out = engine._match_asymmetric_impl(p, f1, pos, f2, pos, idx0)
            s = sum(jnp.sum(a.astype(jnp.float32)) for a in out)
            return (f1 + 1e-12 * s, f2)

        timed_chain(dm_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain, "dec_plus_match",
                    const=params)

    if "decmatchb" in stages:
        # decode + matcher with an optimization_barrier between them:
        # same one-program dataflow, but XLA cannot fuse across the
        # boundary — isolates pathological cross-stage fusions from
        # genuine co-residency cost.
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]

        def dmb_step(p, c):
            f1, f2 = c
            (X1, C1, D1, Q1), (X2, C2, D2, Q2) = engine._decode_head_impl(
                (h, w), p, f1, pos, f2, pos)
            X1, C1, D1, Q1, X2, C2, D2, Q2 = jax.lax.optimization_barrier(
                (X1, C1, D1, Q1, X2, C2, D2, Q2))
            b = X1.shape[0]
            idx, valid = matching.match(
                X1, X2, D1, D2, idx_1_to_2_init=idx0,
                cfg=engine.match_cfg)
            s = (jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
                 + jnp.sum(C1) + jnp.sum(Q1).astype(jnp.int32)
                 + jnp.sum(C2) + jnp.sum(Q2).astype(jnp.int32))
            return (f1 + 1e-12 * s.astype(jnp.float32), f2)

        timed_chain(dmb_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain,
                    "dec_plus_match_barrier", const=params)

    if "decmatch2" in stages:
        # decode and matcher in ONE program but with INDEPENDENT matcher
        # inputs (only a scalar dependency links them): isolates
        # co-residency/scheduling costs from dataflow (layout/remat) costs.
        Xr = jax.random.normal(jax.random.PRNGKey(2), (1, h, w, 3)) \
            + jnp.asarray([0, 0, 3.0])
        Dr = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 24),
                               jnp.float32)
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        mcfg2 = matching.MatchingConfig(coarse_subsample=2, final_radius=2, coarse_radius=2)

        def dm2_step(p, c):
            f1, f2 = c
            (X1, C1, D1, Q1), (X2, C2, D2, Q2) = engine._decode_head_impl(
                (h, w), p, f1, pos, f2, pos)
            eps = 1e-12 * X1[0, 0, 0, 0]
            idx, valid = matching.match(
                Xr + eps, Xr, Dr + eps, Dr, idx_1_to_2_init=idx0, cfg=mcfg2)
            s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
            return (f1 + 1e-12 * s.astype(jnp.float32), f2)

        timed_chain(dm2_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain, "dec_plus_match_indep",
                    const=params)

    if "decmatch3" in stages:
        # decode + matcher with FORCED RELAYOUT of the decode outputs
        # (transpose -> barrier -> transpose back): tests whether the
        # dataflow penalty of the composed program is layout propagation
        # from the head convs into the matcher's tables.
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        mcfg3 = matching.MatchingConfig(coarse_subsample=2, final_radius=2, coarse_radius=2)

        def relayout(A):
            t = jnp.swapaxes(A, 1, 3)
            t = jax.lax.optimization_barrier(t)
            return jnp.swapaxes(t, 1, 3)

        def dm3_step(p, c):
            f1, f2 = c
            (X1, C1, D1, Q1), (X2, C2, D2, Q2) = engine._decode_head_impl(
                (h, w), p, f1, pos, f2, pos)
            idx, valid = matching.match(
                relayout(X1), relayout(X2), relayout(D1), relayout(D2),
                idx_1_to_2_init=idx0, cfg=mcfg3)
            s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
            return (f1 + 1e-12 * s.astype(jnp.float32), f2)

        timed_chain(dm3_step, (feat, feat + 0.01),
                    lambda c: c[0][0, 0, 0], n_chain,
                    "dec_plus_match_relayout", const=params)

    if "twodisp" in stages:
        # decode and matcher as SEPARATE XLA executables, Python-chained
        # with async dispatch and ONE readback at the end: measures whether
        # splitting the frame step into multiple dispatches (letting each
        # compile in isolation) beats the single fused step, i.e. whether
        # the relay pipelines queued dispatches at device speed.
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        mcfg4 = matching.MatchingConfig(coarse_subsample=2, final_radius=2, coarse_radius=2)

        @jax.jit
        def jit_match(X1, X2, D1, D2):
            return matching.match(X1, X2, D1, D2, idx_1_to_2_init=idx0,
                                  cfg=mcfg4)

        def frames(n, f1, f2):
            for _ in range(n):
                (X1, C1, D1, Q1), (X2, C2, D2, Q2) = engine._decode_head(
                    params, f1, pos, f2, pos)
                idx, valid = jit_match(X1, X2, D1, D2)
                s = jnp.sum(idx) + jnp.sum(valid.astype(jnp.int32))
                f1 = f1 + 1e-12 * s.astype(jnp.float32)
            return f1

        t0 = time.time()
        float(frames(1, feat, feat + 0.01)[0, 0, 0])
        log(f"  twodisp: compiled+first in {time.time() - t0:.1f}s")
        float(frames(n_chain, feat, feat + 0.01)[0, 0, 0])
        t0 = time.time()
        float(frames(1, feat, feat + 0.01)[0, 0, 0])
        t1 = time.time() - t0
        t0 = time.time()
        float(frames(n_chain, feat, feat + 0.01)[0, 0, 0])
        tN = time.time() - t0
        ms = (tN - t1) / (n_chain - 1) * 1e3
        log(f"  twodisp: {ms:.2f} ms/frame (t1={t1*1e3:.0f} tN={tN*1e3:.0f})")
        print(f"twodisp_ms {ms:.2f}", flush=True)

    if "glue0" in stages:
        # track_step with matching stubbed AND GN disabled (max_iters=0):
        # decode + fusion + gating + scatter only.  glue0 - dec = pure glue
        # without the solver; (glue) - (glue0) = GN-in-context.
        from mast3r_slam_tpu.frame import make_empty_frame

        n_patches = engine.n_patches
        kf0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        kf0 = kf0.replace(feat=feat[0], pos=pos[0].astype(jnp.int32),
                          N=jnp.ones((), jnp.int32),
                          N_updates=jnp.ones((), jnp.int32))
        fr0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        fr0 = fr0.replace(feat=feat[0] + 0.01, pos=pos[0].astype(jnp.int32))
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]
        tcfg0 = trk.TrackerConfig(C_conf=-1e9, Q_conf=-1e9, rel_error=0.0,
                                  delta_norm=0.0, max_iters=0)
        K = jnp.eye(3)

        def glue0_step(p, c):
            fr, kf = c

            def stub_matcher(f1, p1, f2, p2, idx):
                (X1, C1, D1, Q1), (X2, C2, D2, Q2) = \
                    engine._decode_head_impl((h, w), p, f1, p1, f2, p2)
                b = X1.shape[0]
                fl3 = lambda A: A.reshape(b, -1, A.shape[-1])
                fl1 = lambda A: A.reshape(b, -1, 1)
                return (idx, jnp.ones((b, h * w, 1), bool),
                        fl3(X1), fl1(C1), fl1(Q1),
                        fl3(X2), fl1(C2), fl1(Q2))

            res = trk.track_step(stub_matcher, fr, kf, idx0, K, tcfg0)
            fr = fr.replace(
                feat=fr.feat + 1e-12 * res.frame.T_WC[0],
                N=jnp.zeros((), jnp.int32),
                N_updates=jnp.zeros((), jnp.int32))
            return (fr, kf)

        timed_chain(glue0_step, (fr0, kf0), lambda c: c[0].feat[0, 0],
                    n_chain, "track_nomatch_nogn", const=params)

    if "gather1" in stages:
        # one packed 196k-row x 20 B gather (the tracker's Xf/Cf/Qff fetch)
        tbl = jax.random.normal(jax.random.PRNGKey(7), (hw, 5), jnp.float32)
        idxg = jax.random.randint(jax.random.PRNGKey(8), (hw,), 0, hw)

        def gather1_step(_, c):
            g = tbl[jnp.mod(idxg + c.astype(jnp.int32), hw)]
            return c + 1e-12 * g[0, 0]
        timed_chain(gather1_step, jnp.zeros(()), lambda c: c, n_chain,
                    "gather_hw_rows")

    if "scatter1" in stages:
        # the keyframe-uniqueness scatter-max (196k rows)
        idxs = jax.random.randint(jax.random.PRNGKey(9), (hw,), 0, hw)

        def scatter1_step(_, c):
            seen = jnp.zeros((hw,), jnp.int32).at[
                jnp.mod(idxs + c.astype(jnp.int32), hw)
            ].max(1, mode="drop")
            return c + 1e-12 * jnp.sum(seen).astype(jnp.float32)
        timed_chain(scatter1_step, jnp.zeros(()), lambda c: c, n_chain,
                    "scatter_hw_rows")

    if "chol" in stages:
        # 50 chained 7x7 cholesky+cho_solve: the while-loop-iteration fixed
        # cost inside the GN solver (everything except the big reductions)
        Hs = jnp.eye(7) * 10.0

        def chol_step(_, c):
            def body(i, x):
                H = Hs + jnp.outer(x, x)
                L = jnp.linalg.cholesky(H)
                y = jax.scipy.linalg.cho_solve((L, True), x[:, None])[:, 0]
                return x + 1e-6 * y
            x = jax.lax.fori_loop(0, 50, body, c)
            return x
        timed_chain(chol_step, jnp.ones((7,)), lambda c: c[0], n_chain,
                    "chol7x7_50it")

    if "ba" in stages:
        # Backend pose-graph BA at eval scale: P keyframes at production
        # resolution, E two-way ray edges, full 10-iteration solve.
        from mast3r_slam_tpu.ops import ba as ba_mod

        P_kf = int(os.environ.get("BA_KF", "16"))
        E_edges = 2 * (P_kf - 1)  # consecutive chain, two-way
        key = jax.random.PRNGKey(5)
        Xs = jax.random.normal(key, (P_kf, hw, 3)) + jnp.asarray([0, 0, 3.0])
        Cs = jnp.ones((P_kf, hw))
        Twc = jnp.tile(sim3.identity()[None], (P_kf, 1))
        ii = jnp.concatenate([jnp.arange(P_kf - 1), jnp.arange(1, P_kf)])
        jj = jnp.concatenate([jnp.arange(1, P_kf), jnp.arange(P_kf - 1)])
        idx_ii2jj = jnp.tile(jnp.arange(hw, dtype=jnp.int32)[None],
                             (E_edges, 1))
        vm = jnp.ones((E_edges, hw), bool)
        Qe = jnp.full((E_edges, hw), 10.0)
        ev = jnp.ones((E_edges,), bool)
        bcfg = ba_mod.BAConfig(Q_conf=-1e9, C_conf=-1e9, delta_norm=0.0)
        K = jnp.eye(3)

        def ba_step(_, c):
            Twc_i, z = c
            Twc_o, iters, delta, ok = ba_mod.gauss_newton(
                Twc_i, Xs, Cs, ii, jj, idx_ii2jj, vm, Qe, ev, K,
                "ray", (w, h), bcfg,
            )
            return (Twc_i + 1e-12 * delta, z)

        timed_chain(ba_step, (Twc, jnp.zeros(())),
                    lambda c: c[0][0, 0], n_chain,
                    f"ba_ray_{P_kf}kf_10it")

    if "gn" in stages:
        key = jax.random.PRNGKey(4)
        Xf = jax.random.normal(key, (hw, 3)) + jnp.asarray([0, 0, 3.0])
        Qk = jnp.ones((hw, 1))
        valid = jnp.ones((hw, 1), bool)
        tcfg = trk.TrackerConfig(C_conf=-1e9, Q_conf=-1e9, rel_error=0.0,
                                 delta_norm=0.0, max_iters=50)

        def gn_step(_, c):
            T, _, _ = trk.opt_pose_ray_dist_sim3(
                Xf + 1e-12 * c[0], Xf, sim3.identity(), Qk, valid, tcfg)
            return (c[0] + 1e-12 * T[0], c[1])
        timed_chain(gn_step, (jnp.zeros(()), jnp.zeros(())),
                    lambda c: c[0], n_chain, "gn_ray_50it")


if __name__ == "__main__":
    main()
