#!/usr/bin/env python
"""In-context A/B of the INT8 catMLP local-feature head (STATUS item #7).

Times the FULL track step (decode + heads + match + GN) with the engine's
local head in fp (bf16 compute) vs int8, in one process, with the
relay-proof chain methodology (see bench.py docstring).  The local head is
the dominant head weight-read block; int8 wins only if the in-context
time drops — isolated stage numbers are not trusted (STATUS gap #0).

Usage: python scripts/bench_int8_local.py   (env: CHAIN, SMALL=1)
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


def main():
    cache = pathlib.Path(".jax_cache"); cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
    except Exception:
        pass

    from mast3r_slam_tpu import tracker as trk
    from mast3r_slam_tpu.frame import make_empty_frame
    from mast3r_slam_tpu.inference import InferenceEngine
    from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
    from mast3r_slam_tpu.ops.matching import MatchingConfig

    small = os.environ.get("SMALL") == "1"
    N = int(os.environ.get("CHAIN", "16"))
    if small:
        cfg = MASt3RConfig.tiny(); h, w = 96, 128
    else:
        cfg = MASt3RConfig.vit_large(head_dtype=jnp.bfloat16); h, w = 384, 512
    log(f"devices={jax.devices()} res={h}x{w} chain={N}")

    model = MASt3R(cfg)
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), init_img, init_img)

    mcfg = MatchingConfig(dist_thresh=1e9, coarse_subsample=2,
                          final_radius=1, coarse_radius=2,
                          dilation_schedule=(4, 2))
    tcfg = trk.TrackerConfig(C_conf=-1e9, Q_conf=-1e9, rel_error=0.0,
                             delta_norm=0.0)
    K = jnp.eye(3)

    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (1, h, w, 3), jnp.float32)

    def timed_chain(make_step, init_carry, label, readback, params):
        def chained(n):
            @jax.jit
            def f(params, carry):
                carry = jax.lax.fori_loop(
                    0, n, lambda i, c: make_step(params, c), carry)
                return readback(carry)
            return f

        f1, fN = chained(1), chained(N)
        t0 = time.time()
        float(f1(params, init_carry))
        log(f"  {label}: compiled+first in {time.time() - t0:.1f}s")
        float(fN(params, init_carry))
        t0 = time.time(); float(f1(params, init_carry)); t1 = time.time() - t0
        t0 = time.time(); float(fN(params, init_carry)); tN = time.time() - t0
        ms = (tN - t1) / (N - 1) * 1e3
        log(f"  {label}: {ms:.2f} ms/step")
        print(f"{label}_ms {ms:.2f}", flush=True)
        return ms

    results = {}
    for variant in ("fp", "int8"):
        engine = InferenceEngine(model, params0, (h, w), match_cfg=mcfg,
                                 int8_local_head=(variant == "int8"))
        params = engine.params
        feat_k, pos_k = engine.encode(img)
        Xk, Ck = engine.inference_mono(feat_k, pos_k)
        n_patches = engine.n_patches
        kf = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        kf = kf.replace(
            feat=feat_k[0], pos=pos_k[0].astype(jnp.int32),
            X_canon=Xk[0], C=Ck[0],
            N=jnp.ones((), jnp.int32), N_updates=jnp.ones((), jnp.int32))
        frame0 = make_empty_frame(h, w, n_patches, cfg.enc_embed_dim)
        frame0 = frame0.replace(feat=feat_k[0] + 0.01,
                                pos=pos_k[0].astype(jnp.int32))
        idx0 = jnp.arange(h * w, dtype=jnp.int32)[None]

        def step(params, carry, engine=engine):
            frame, keyframe = carry
            def matcher(f1, p1, f2, p2, idx):
                return engine._match_asymmetric_impl(params, f1, p1, f2, p2,
                                                     idx)
            res = trk.track_step(matcher, frame, keyframe, idx0, K, tcfg)
            # consume EVERY pipeline-visible output (bench.py discipline:
            # a pose-only readback lets XLA DCE the keyframe fusion
            # write-back + uniqueness scatter, understating both variants)
            consume = (
                res.frame.T_WC[0] + res.new_kf_metric + res.match_frac
                + res.ok.astype(jnp.float32)
                + jnp.sum(res.keyframe.X_canon) + jnp.sum(res.keyframe.C)
                + jnp.sum(res.frame.X_canon) + jnp.sum(res.frame.C)
            )
            frame = frame.replace(
                feat=frame.feat + 1e-12 * consume,
                N=jnp.zeros((), jnp.int32),
                N_updates=jnp.zeros((), jnp.int32))
            return (frame, keyframe)

        results[variant] = timed_chain(step, (frame0, kf),
                                       f"track_{variant}",
                                       lambda c: c[0].feat[0, 0], params)

    d = results["fp"] - results["int8"]
    log(f"in-context delta: {d:+.2f} ms "
        f"({'int8 WINS' if d > 0 else 'int8 loses'})")


if __name__ == "__main__":
    main()
