#!/usr/bin/env python
"""Raw TPU gather throughput probe: take_along_axis rows/s and GB/s as a
function of row width and dtype, plus pack-build (roll+concat) and scoring
(elementwise mult-reduce) costs in isolation.  Establishes the cost model
that ops/matching.py's packing decisions rely on."""

import os
import pathlib
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    float(f1(init_carry)); float(fN(init_carry))
    t0 = time.time(); float(f1(init_carry)); t1 = time.time() - t0
    t0 = time.time(); float(fN(init_carry)); tN = time.time() - t0
    ms = (tN - t1) / (n - 1) * 1e3
    print(f"{label} {ms:.2f} ms", flush=True)
    return ms


def main():
    cache = pathlib.Path(".jax_cache"); cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
    except Exception:
        pass
    n = 196_608
    N = int(os.environ.get("CHAIN", "8"))
    log(f"devices={jax.devices()} n={n} chain={N}")
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.PRNGKey(1), (1, n), 0, n)

    for dtype, width in [
        # narrow rows (the BA pregather's 16 B rows measured ~7x the
        # wide-row rate — map the curve down here)
        (jnp.float32, 4), (jnp.float32, 8), (jnp.float32, 16),
        (jnp.int8, 24), (jnp.int8, 72),
        (jnp.float32, 36), (jnp.float16, 36),
        (jnp.int8, 168), (jnp.int8, 336), (jnp.int8, 1176),
        (jnp.bfloat16, 168), (jnp.bfloat16, 336), (jnp.bfloat16, 588),
        (jnp.bfloat16, 1176),
    ]:
        nbytes = width * jnp.dtype(dtype).itemsize
        tab = (jax.random.normal(key, (1, n, width)) * 10).astype(dtype)

        def g_step(c, tab=tab):
            i = (c[0] + idx) % n
            g = jnp.take_along_axis(tab, i[..., None], axis=1)
            # consume EVERY row: per-row reduction feeds the next
            # iteration's indices, so XLA cannot slice the gather down
            rowsum = jnp.sum(g.astype(jnp.float32), axis=-1)  # (1, n)
            return ((c[0] + rowsum.astype(jnp.int32) % 3 + 1) % n, c[1])

        ms = timed_chain(
            g_step, (jnp.zeros((1, n), jnp.int32), jnp.zeros(())),
            lambda c: c[0][0, 0].astype(jnp.float32), N,
            f"gather[{jnp.dtype(dtype).name}x{width}={nbytes}B]")
        log(f"  -> {n / ms / 1e3:.0f} Mrows/s, {n * nbytes / ms / 1e6:.1f} GB/s")

    # pack build: 7-roll concat of (n, 24) bf16 + 2-roll concat of result
    D = (jax.random.normal(key, (1, n, 24))).astype(jnp.bfloat16)

    def pack_step(c):
        vp = jnp.concatenate(
            [jnp.roll(D + c[1].astype(jnp.bfloat16), -j * 512, axis=1)
             for j in range(7)], axis=-1)
        up = jnp.concatenate([vp, jnp.roll(vp, -5, axis=1)], axis=-1)
        return (c[0], c[1] + 1e-12 * up[0, 0, 0].astype(jnp.float32))

    timed_chain(pack_step, (jnp.zeros(()), jnp.zeros(())),
                lambda c: c[1], N, "pack_build[vp7+up2 bf16]")

    # scoring: (1, 14, 24, n) x (1, 1, 24, n) mult-reduce, int32 vs bf16
    cand8 = (jax.random.normal(key, (1, 14, 24, n)) * 10).astype(jnp.int8)
    q8 = (jax.random.normal(key, (1, 1, 24, n)) * 10).astype(jnp.int8)

    def score_i32(c):
        s = jnp.sum(cand8.astype(jnp.int32) * (q8 + c[0]).astype(jnp.int32),
                    axis=2)
        return (c[0], c[1] + 1e-12 * s[0, 0, 0].astype(jnp.float32))

    timed_chain(score_i32, (jnp.zeros((), jnp.int8), jnp.zeros(())),
                lambda c: c[1], N, "score_int32[14x24]x20")

    def score_bf16(c):
        s = jnp.sum((cand8.astype(jnp.bfloat16)
                     * (q8 + c[0]).astype(jnp.bfloat16)).astype(jnp.float32),
                    axis=2)
        return (c[0], c[1] + 1e-12 * s[0, 0, 0])

    timed_chain(score_bf16, (jnp.zeros((), jnp.int8), jnp.zeros(())),
                lambda c: c[1], N, "score_bf16[14x24]x20")


if __name__ == "__main__":
    main()
