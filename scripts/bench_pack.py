#!/usr/bin/env python
"""Window-pack table-build costs on TPU, measured with full consumption
(every output element feeds a reduction that drives the next iteration's
input, so nothing can be DCE'd or hoisted).

The matcher's refine stages pre-pack (2r+1)^2-probe windows into wide rows
(ops/matching.py refine_matches).  With runtime inputs those packs cost
real HBM traffic every frame (see STATUS.md gap #0); this probe measures
each build strategy at production scale so the per-stage (u_pack, build)
choice can be made from a measured cost model:

  sum_baseline   — reduce a prebuilt (hw, 600) int8 table (the consume cost
                   to subtract from every other number)
  vp5            — 5-roll v-pack of (hw, 24) int8 -> (hw, 120)
  up5_from_vp    — 5-roll u-pack of the (hw, 120) vp -> (hw, 600)
                   (current two-stage strategy for the r=2 stages)
  direct25       — 25-roll single-stage build (hw, 24) -> (hw, 600)
  vp7            — 7-roll v-pack (r=3 stages) -> (hw, 168)
  up2_from_vp7   — 2-roll u-pack of vp7 -> (hw, 336) (current d=5 strategy)
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
    log(f"  {label}: compiled in {time.time()-t0:.0f}s")
    float(fN(init_carry))
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
    h, w, f = 384, 512, 24
    hw = h * w
    N = int(os.environ.get("CHAIN", "8"))
    log(f"devices={jax.devices()} res={h}x{w} f={f} chain={N}")
    key = jax.random.PRNGKey(0)
    base = (jax.random.normal(key, (1, hw, f)) * 50).astype(jnp.int8)
    pre600 = (jax.random.normal(key, (1, hw, 600)) * 50).astype(jnp.int8)

    # every variant: perturb the input with the carry (prevents hoisting),
    # reduce EVERY output element into the next carry (prevents DCE/slicing)
    def consume(out, c):
        s = jnp.sum(out.astype(jnp.int32))
        return (c[0] + s % 3 + 1, c[1])

    def run(label, build, *, inp=base):
        def step(c):
            t = inp + c[0].astype(jnp.int8)
            return consume(build(t), c)
        timed_chain(step, (jnp.zeros((), jnp.int32), jnp.zeros(())),
                    lambda c: c[0].astype(jnp.float32), N, label)

    run("sum_baseline_600B", lambda t: t, inp=pre600)

    def vp(t, k_side, d=2):
        rd = (k_side // 2) * d
        return jnp.concatenate(
            [jnp.roll(t, (rd - j * d) * w, axis=1) for j in range(k_side)],
            axis=-1)

    run("vp5_120B", lambda t: vp(t, 5))

    vp5_pre = vp(base, 5)

    def up(t, P, d=2):
        return jnp.concatenate(
            [jnp.roll(t, -p * d, axis=1) for p in range(P)], axis=-1)

    run("up5_from_vp_600B", lambda t: up(t, 5), inp=vp5_pre)

    def direct25(t, d=2):
        rd = 2 * d
        return jnp.concatenate(
            [jnp.roll(t, (rd - j * d) * w - p * d, axis=1)
             for p in range(5) for j in range(5)], axis=-1)

    run("direct25_600B", direct25)

    run("vp7_168B", lambda t: vp(t, 7, d=5))
    vp7_pre = vp(base, 7, d=5)
    run("up2_from_vp7_336B", lambda t: up(t, 2, d=5), inp=vp7_pre)


if __name__ == "__main__":
    main()
