#!/usr/bin/env python
"""Matcher stage micro-benchmark on the real TPU.

Times iter_proj (10 LM iterations) and refine_matches (radius 3,
dilations 5..1) at production resolution 512x384 (196,608 queries) with
the relay-proof chain methodology from bench.py: N data-dependent
repetitions inside one jitted fori_loop, per-step time = (t_N - t_1)/(N-1).

Usage: python scripts/bench_matcher.py [u_pack ...]
Env: CHAIN (default 6), RES=HxW (default 384x512).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.ops import matching


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_chain(step, init_carry, readback, n, label):
    def chained(k):
        @jax.jit
        def f(carry):
            carry = jax.lax.fori_loop(0, k, lambda i, c: step(c), carry)
            return readback(carry)
        return f

    f1, fN = chained(1), chained(n)
    t0 = time.time()
    float(f1(init_carry))
    log(f"  {label}: compiled in {time.time() - t0:.1f}s")
    float(fN(init_carry))
    t0 = time.time(); float(f1(init_carry)); t1 = time.time() - t0
    t0 = time.time(); float(fN(init_carry)); tN = time.time() - t0
    ms = (tN - t1) / (n - 1) * 1e3
    log(f"  {label}: {ms:.2f} ms/step (t1={t1*1e3:.0f} tN={tN*1e3:.0f})")
    return ms


def main():
    import pathlib
    cache = pathlib.Path(".jax_cache"); cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
    except Exception:
        pass

    res = os.environ.get("RES", "384x512")
    h, w = (int(x) for x in res.split("x"))
    n_chain = int(os.environ.get("CHAIN", "6"))
    u_packs = [int(a) for a in sys.argv[1:]] or [2]
    log(f"devices={jax.devices()} res={h}x{w} chain={n_chain}")

    key = jax.random.PRNGKey(0)
    hw = h * w
    X = jax.random.normal(key, (1, h, w, 3)) + jnp.asarray([0, 0, 3.0])
    rays_img, pts3d_norm, p_init = matching.prep_for_iter_proj(X, X, None)
    rays_img = jax.device_put(rays_img)

    # --- iter_proj ---------------------------------------------------------
    def ip_step(carry):
        p, _ = matching.iter_proj(rays_img, pts3d_norm, carry[0],
                                  max_iter=10)
        return (p + 1e-7, carry[1])

    ms = timed_chain(ip_step, (p_init, jnp.zeros(())),
                     lambda c: c[0][0, 0, 0], n_chain, "iter_proj x10")
    print(f"iter_proj_ms {ms:.2f}", flush=True)

    # --- refine ------------------------------------------------------------
    D11 = jax.random.normal(key, (1, h, w, 24), jnp.bfloat16)
    D21 = jax.random.normal(jax.random.PRNGKey(1), (1, hw, 24), jnp.bfloat16)
    p0 = matching.lin_to_pixel(jnp.arange(hw, dtype=jnp.int32)[None], w)

    def q8(x):
        s = 127.0 / jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
        return jnp.clip(jnp.round(x * s), -127, 127).astype(jnp.int8)

    variants = [("bf16", D11, D21)] if os.environ.get("BF16") else []
    variants.append(("int8", q8(D11), q8(D21)))

    qmajors = [True] if os.environ.get("QMAJOR_ONLY") else [True, False]
    cb = int(os.environ.get("COARSE_BITS", "8"))
    for name, T11, T21 in variants:
        for up in u_packs:
            for qm in qmajors:
                def rf_step(carry, up=up, T11=T11, T21=T21, qm=qm):
                    p = matching.refine_matches(T11, T21, carry[0], radius=3,
                                                dilation_max=5, u_pack=up,
                                                qmajor=qm, coarse_bits=cb)
                    # data dependence without drifting out of bounds
                    return (jnp.clip(p, 0, jnp.asarray([w - 1, h - 1])),
                            carry[1])

                tag = f"{name},u_pack={up},qmajor={qm}"
                ms = timed_chain(rf_step, (p0, jnp.zeros(())),
                                 lambda c: c[0][0, 0, 0].astype(jnp.float32),
                                 n_chain, f"refine {tag}")
                print(f"refine_ms[{tag}] {ms:.2f}", flush=True)


if __name__ == "__main__":
    main()
