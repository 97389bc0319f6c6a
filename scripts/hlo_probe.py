#!/usr/bin/env python
"""Optimized-HLO structural diff: isolated matcher vs composed decode+match.

STATUS.md gap #0: the fused frame step measures ~13 ms slower than the sum
of its isolated stages (~6.5 ms pure co-residency + ~7 ms dataflow).  This
probe compiles (server-side, through the relay) three modules:

  A. matcher alone           (match_cs2 config, production shapes)
  B. decode+heads alone
  C. decode+match composed   (the engine's _match_asymmetric_impl)

and writes their optimized HLO to /tmp/hlo_{a,b,c}.txt, then prints a
structural summary: counts and shapes of gathers, dynamic-slices, copies,
transposes/bitcasts, fusion kinds, while-loops, and the total HBM traffic
estimate from cost analysis — looking for ops in C that exist in neither A
nor B (relayouts, duplicated packs) or for matcher fusions that got split.

Usage: python scripts/hlo_probe.py [a b c ...]   (default: a b c + summary)
"""

import os
import pathlib
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def summarize(name, text):
    ops = Counter()
    gather_shapes = []
    copy_bytes = 0
    for line in text.splitlines():
        m = re.match(r"\s*(?:ROOT )?[%\w.-]+ = (\S+?)\[([\d,]*)\][^ ]* (\w+)\(", line)
        if not m:
            continue
        dtype, shape, op = m.groups()
        ops[op] += 1
        if op == "gather":
            gather_shapes.append(f"{dtype}[{shape}]")
        if op in ("copy", "transpose"):
            dims = [int(x) for x in shape.split(",") if x]
            n = 1
            for d in dims:
                n *= d
            bytes_per = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "s8": 1,
                         "u8": 1, "pred": 1, "s16": 2, "u32": 4}.get(
                             dtype.split("[")[0], 4)
            copy_bytes += n * bytes_per
    print(f"== {name} ==")
    interesting = ["gather", "scatter", "copy", "transpose", "fusion",
                   "while", "dynamic-slice", "dynamic-update-slice",
                   "convolution", "dot", "all-reduce", "bitcast",
                   "custom-call", "reshape", "concatenate"]
    for op in interesting:
        if ops.get(op):
            print(f"  {op:22s} {ops[op]}")
    print(f"  copy+transpose bytes   {copy_bytes/1e6:.1f} MB")
    print(f"  gathers: {Counter(gather_shapes).most_common(20)}")
    sys.stdout.flush()


def main():
    cache = pathlib.Path(".jax_cache")
    cache.mkdir(exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(cache))
    except Exception:
        pass

    from mast3r_slam_tpu.inference import InferenceEngine
    from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig
    from mast3r_slam_tpu.ops import matching

    which = sys.argv[1:] or ["a", "b", "c"]
    small = os.environ.get("SMALL") == "1"
    if small:
        cfg = MASt3RConfig.tiny()
        h, w = 96, 128
    else:
        cfg = MASt3RConfig.vit_large()
        h, w = 384, 512
    hw = h * w

    model = MASt3R(cfg)
    init_img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), init_img, init_img)
    engine = InferenceEngine(
        model, params, (h, w),
        match_cfg=matching.MatchingConfig(coarse_subsample=2, final_radius=2,
                                          coarse_radius=2),
    )
    params = engine.params
    mcfg = engine.match_cfg
    idx0 = jnp.arange(hw, dtype=jnp.int32)[None]

    import jax.tree_util as jtu
    pshapes = jtu.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params)
    featS = jax.ShapeDtypeStruct((1, engine.n_patches, cfg.enc_embed_dim),
                                 jnp.float32)
    posS = jax.ShapeDtypeStruct((1, engine.n_patches, 2), jnp.int32)
    XS = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    DS = jax.ShapeDtypeStruct((1, h, w, 24), jnp.float32)

    outdir = pathlib.Path("/tmp")

    if "a" in which:
        def f_match(X1, X2, D1, D2):
            return matching.match(X1, X2, D1, D2, idx_1_to_2_init=idx0,
                                  cfg=mcfg)
        lowered = jax.jit(f_match).lower(XS, XS, DS, DS)
        txt = lowered.compile().as_text()
        (outdir / "hlo_a.txt").write_text(txt)
        log(f"A written ({len(txt)/1e6:.1f} MB)")
        summarize("A matcher alone", txt)

    if "b" in which:
        def f_dec(p, f1, p1, f2, p2):
            return engine._decode_head_impl((h, w), p, f1, p1, f2, p2)
        lowered = jax.jit(f_dec).lower(pshapes, featS, posS, featS, posS)
        txt = lowered.compile().as_text()
        (outdir / "hlo_b.txt").write_text(txt)
        log(f"B written ({len(txt)/1e6:.1f} MB)")
        summarize("B decode alone", txt)

    if "c" in which:
        def f_comp(p, f1, p1, f2, p2):
            return engine._match_asymmetric_impl(p, f1, p1, f2, p2, idx0)
        lowered = jax.jit(f_comp).lower(pshapes, featS, posS, featS, posS)
        txt = lowered.compile().as_text()
        (outdir / "hlo_c.txt").write_text(txt)
        log(f"C written ({len(txt)/1e6:.1f} MB)")
        summarize("C composed", txt)


if __name__ == "__main__":
    main()
