#!/usr/bin/env python
"""A/B the matcher's probe-table build formulations on the real TPU.

The matcher packs, per refine stage, the whole (2r+1)^2 probe window into
wide rows so window fetches are few row-count-bound gathers
(ops/matching.py::refine_matches).  The BUILD of those tables is ~7 ms of
runtime cost in-context (STATUS gap #0).  Variants:

  v0   current: k_side rolls -> concat (v_pack), then P rolls -> concat
  v1   one-shot: K = P*k_side rolls -> single concat (no intermediate)
  v2   conv_general_dilated_patches on the 2D image
  v3   pallas single-pass window kernel (ops/pack.py)

Each is timed as a chained fori_loop with runtime-dependent inputs and a
full-table readback (sum), relay-proof like bench.py.

Usage: python scripts/bench_pack.py [stageA stageB stageC corners]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        sys.argv.remove("--cpu")

    cache_dir = pathlib.Path(".jax_cache")
    cache_dir.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    except Exception:
        pass

    from mast3r_slam_tpu.ops import pack

    h, w, F = 384, 512, 24
    hw = h * w
    N = 12

    stages = {
        # name: (k_side, d, rd, P)
        "stageA": (7, 4, 12, 2),
        "stageB": (5, 2, 4, 5),
        "stageC": (3, 1, 1, 3),
    }
    pick = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        list(stages) + ["corners"]

    log(f"devices={jax.devices()} res={h}x{w} chain={N}")

    key = jax.random.PRNGKey(0)
    base_i8 = jax.random.randint(key, (1, hw, F), -127, 127, jnp.int8)

    def timed(step, init, label):
        def chained(n):
            @jax.jit
            def f(c):
                return jax.lax.fori_loop(0, n, lambda i, c: step(c), c)[-1]
            return f

        f1, fN = chained(1), chained(N)
        t0 = time.time()
        float(f1(init))
        log(f"  {label}: compiled+first {time.time()-t0:.1f}s")
        float(fN(init))
        t0 = time.time(); float(f1(init)); t1 = time.time() - t0
        t0 = time.time(); float(fN(init)); tN = time.time() - t0
        ms = (tN - t1) / (N - 1) * 1e3
        log(f"  {label}: {ms:.2f} ms/step")
        return ms

    for name in pick:
        if name == "corners":
            offs = (0, 1, w, w + 1)
            tblf = (base_i8.astype(jnp.float32) / 127.0)
            tbl9 = jnp.concatenate([tblf[..., :9]], axis=-1).astype(jnp.float16)

            def mk(build):
                def step(c):
                    tbl, acc = c
                    out = build(tbl)
                    s = jnp.sum(out.astype(jnp.float32))
                    return (tbl + jnp.float16(1e-6) * s.astype(jnp.float16),
                            acc + s)
                return step

            log(f"[corners] f16 F=9 K=4 out={hw}x36")
            timed(mk(lambda t: pack.pack_rows_roll(t, offs)),
                  (tbl9, jnp.zeros(())), "corners_roll")
            continue

        k_side, d, rd, P = stages[name]
        offs = tuple(pack._offsets(k_side, d, rd, w, P))
        K = len(offs)
        nq = hw if name == "stageC" else hw // 4
        n_g = -(-k_side // P)  # gathers per refine stage
        log(f"[{name}] k={k_side} d={d} P={P} K={K} out={hw}x{K*F} "
            f"({hw*K*F/1e6:.0f} MB) queries={nq} gathers={n_g}")
        idx0 = jax.random.randint(jax.random.PRNGKey(7), (1, nq), 0, hw,
                                  jnp.int32)

        def mk(build):
            # consume like the real matcher: n_g random-row gathers + a
            # sum of the fetched bytes.  sum(table) alone is DCE-able
            # (sum of a roll == sum of the source), gathers are not.
            def step(c):
                tbl, idx, acc = c
                out = build(tbl)
                s = jnp.zeros((), jnp.int32)
                for g in range(n_g):
                    got = jnp.take_along_axis(
                        out, ((idx + g * 7) % hw)[..., None], axis=1)
                    s = s + jnp.sum(got.astype(jnp.int32))
                return (tbl + (s % 2).astype(jnp.int8),
                        (idx + s % 3) % hw, acc + s)
            return step

        def mk_control():
            # gather-only control at the same row count from the narrow
            # table: build-cost = variant - control
            def step(c):
                tbl, idx, acc = c
                s = jnp.zeros((), jnp.int32)
                for g in range(n_g):
                    got = jnp.take_along_axis(
                        tbl, ((idx + g * 7) % hw)[..., None], axis=1)
                    s = s + jnp.sum(got.astype(jnp.int32))
                return (tbl + (s % 2).astype(jnp.int8),
                        (idx + s % 3) % hw, acc + s)
            return step

        def v0(tbl):
            v_pack = jnp.concatenate(
                [jnp.roll(tbl, (rd - j * d) * w, axis=1)
                 for j in range(k_side)], axis=-1)
            return jnp.concatenate(
                [jnp.roll(v_pack, -p * d, axis=1) for p in range(P)],
                axis=-1)

        def v2(tbl):
            from jax import lax
            img = tbl.reshape(1, h, w, F)
            out = lax.conv_general_dilated_patches(
                img, (k_side, P), (1, 1),
                [(rd, rd), (0, (P - 1) * d)],
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out.reshape(1, hw, -1)

        init = (base_i8, idx0, jnp.zeros((), jnp.int32))
        timed(mk_control(), init, f"{name}_gather_control")
        timed(mk(v0), init, f"{name}_v0_current")
        timed(mk(lambda t: pack.pack_rows_roll(t, offs)), init,
              f"{name}_v1_oneshot")
        try:
            timed(mk(v2), init, f"{name}_v2_patches")
        except Exception as e:
            log(f"  {name}_v2_patches failed: {type(e).__name__}: {e}")
        try:
            timed(mk(lambda t: pack.pack_rows_mxu(t, offs)), init,
                  f"{name}_v4_mxu")
        except Exception as e:
            log(f"  {name}_v4_mxu failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
