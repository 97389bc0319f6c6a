#!/usr/bin/env python
"""In-context A/B of the INT8 encoder (VERDICT r3 next #6).

Round-1 measured the int8 encoder ISOLATED at 3.9 vs 4.6 ms fp — but both
other int8 paths (int4 refine tables, int8 local head) lost in-context to
XLA fusion breaks, so the isolated number is not trusted.  This times the
encoder exactly as the production pipeline dispatches it (its own jit,
engine.encode) with runtime (non-constant-foldable) inputs and full
consumption of the outputs, fp vs int8 back-to-back in ONE process (the
relay's cross-run variance exceeds the expected delta; within-process A/B
is the only trustworthy comparison — CLAUDE.md).

Usage: python scripts/bench_int8_encoder.py   (env: CHAIN, SMALL=1)
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

    from mast3r_slam_tpu.inference import InferenceEngine
    from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig

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

    img0 = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3),
                             jnp.float32)

    def timed_chain(step, init_carry, label, readback, params):
        def chained(n):
            @jax.jit
            def f(params, carry):
                carry = jax.lax.fori_loop(
                    0, n, lambda i, c: step(params, c), carry)
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

    engine = InferenceEngine(model, params0, (h, w))
    params = engine.params

    results = {}
    for variant in ("fp", "int8"):
        if variant == "int8":
            from mast3r_slam_tpu.models.quant import (encode_int8,
                                                      quantize_encoder_params)

            # qparams ride the argument list, NOT a closure — closed-over
            # concrete arrays are uploaded as executable constants on the
            # relay (HTTP 413 at ViT-L size; CLAUDE.md)
            qparams = quantize_encoder_params(params)
            pk = (params, qparams)

            def step(pk, img):
                params, qparams = pk
                feat, pos = encode_int8(params, qparams, img, cfg)
                return img + 1e-12 * jnp.sum(feat).astype(img.dtype)
        else:
            pk = params

            def step(params, img):
                feat, pos = model.apply(params, img, method=MASt3R.encode)
                # consume the whole token tensor — a scalar readback would
                # let XLA slice the final norm (bench.py discipline)
                return img + 1e-12 * jnp.sum(feat).astype(img.dtype)

        results[variant] = timed_chain(step, img0, f"encode_{variant}",
                                       lambda c: c[0, 0, 0, 0], pk)

    d = results["fp"] - results["int8"]
    log(f"in-context delta: {d:+.2f} ms "
        f"({'int8 WINS' if d > 0 else 'int8 loses'})")


if __name__ == "__main__":
    main()
