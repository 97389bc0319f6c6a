#!/usr/bin/env python
"""2D-slice gather probe: can the final d=1 refine window be fetched as ONE
(5, 5*f) slice per query from an (h, w*f) descriptor image, skipping the
window-pack table build entirely?

The packed path (ops/matching.py) pays a dense roll+concat table build of
~(2r+1)^2*f bytes/pixel per dilation so the gather fetches one wide row per
query.  For dilation 1 the window is CONTIGUOUS in u, so a 2D gather with
slice_sizes=(k_side, k_side*f) from the raw (h, w*f) image covers the whole
window with zero pack traffic — IF the TPU gather engine fetches a
(5, 600 B) slice at ~1-row cost rather than 5 scanline touches.

Measures, at production scale (n=196608 queries, f=24 int8):
  a. packed 1D gather, 600 B rows        (current path's gather cost)
  b. 2D slice gather (5, 120) s8         (pack-free candidate)
  c. 2D slice gather (1, 120) s8         (single-scanline control)
  d. the d=1 pack build itself           (what b would save)
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
    k_side = 5
    N = int(os.environ.get("CHAIN", "8"))
    log(f"devices={jax.devices()} res={h}x{w} f={f} chain={N}")
    key = jax.random.PRNGKey(0)
    D8 = (jax.random.normal(key, (hw, f)) * 50).astype(jnp.int8)
    u = jax.random.randint(jax.random.PRNGKey(1), (hw,), 2, w - 2)
    v = jax.random.randint(jax.random.PRNGKey(2), (hw,), 2, h - 2)

    # a. packed 1D gather of 600 B rows (table prebuilt outside the loop)
    packed = jnp.concatenate(
        [jnp.roll(D8.reshape(1, hw, f), -(j - 2) * w - p + 2, axis=1)
         for j in range(k_side) for p in range(k_side)], axis=-1,
    )  # (1, hw, 600)

    def g1d(c):
        i = ((c[0] + v * w + u) % hw)
        g = jnp.take_along_axis(packed, i[None, :, None], axis=1)
        rowsum = jnp.sum(g.astype(jnp.int32), axis=-1)[0]
        return (rowsum % 3 + 1, c[1])

    timed_chain(g1d, (jnp.zeros((hw,), jnp.int32), jnp.zeros(())),
                lambda c: c[0][0].astype(jnp.float32), N,
                "packed_1d_600B")

    # b. 2D slice gather: (5, 120) slices from (h, w*f)
    img2d = D8.reshape(h, w * f)
    starts0 = jnp.stack([v - 2, (u - 2) * f], axis=-1)  # (n, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    def g2d(c):
        st = (starts0 + c[0][:, None] % 2).astype(jnp.int32)
        g = jax.lax.gather(
            img2d, st, dnums, slice_sizes=(k_side, k_side * f),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (n, 5, 120)
        rowsum = jnp.sum(g.astype(jnp.int32), axis=(1, 2))
        return (rowsum % 3 + 1, c[1])

    timed_chain(g2d, (jnp.zeros((hw,), jnp.int32), jnp.zeros(())),
                lambda c: c[0][0].astype(jnp.float32), N,
                "slice_2d_5x120B")

    # c. control: (1, 120) slices — one scanline touch per query
    def g2d1(c):
        st = (starts0 + c[0][:, None] % 2).astype(jnp.int32)
        g = jax.lax.gather(
            img2d, st, dnums, slice_sizes=(1, k_side * f),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
        rowsum = jnp.sum(g.astype(jnp.int32), axis=(1, 2))
        return (rowsum % 3 + 1, c[1])

    timed_chain(g2d1, (jnp.zeros((hw,), jnp.int32), jnp.zeros(())),
                lambda c: c[0][0].astype(jnp.float32), N,
                "slice_2d_1x120B")

    # d. the pack build this would save (d=1, radius 2, int8, u_pack=5)
    D8b = D8.reshape(1, hw, f)

    def pack(c):
        t = D8b + c[1].astype(jnp.int8)
        vp = jnp.concatenate(
            [jnp.roll(t, (2 - j) * w, axis=1) for j in range(k_side)],
            axis=-1)
        up = jnp.concatenate(
            [jnp.roll(vp, -p, axis=1) for p in range(k_side)], axis=-1)
        return (c[0], c[1] + (up[0, 0, 0] % 3).astype(jnp.float32))

    timed_chain(pack, (jnp.zeros(()), jnp.zeros(())), lambda c: c[1], N,
                "pack_build_d1_int8")


if __name__ == "__main__":
    main()
