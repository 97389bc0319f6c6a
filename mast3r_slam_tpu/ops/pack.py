"""Probe-table packing kernels for the dense matcher.

The matcher's window fetches are row gathers from PRE-PACKED tables: row m
of the packed table holds the descriptor rows at a fixed set of flat
offsets around m (see ops/matching.py::refine_matches).  Reference access
pattern: matching_kernels.cu:26-81 (one probe per CUDA thread step).

Building those tables with jnp.roll + concatenate is pure data movement,
but XLA's copies run at ~145 GB/s effective here and the narrow int8
source rows (24 lanes, padded to 128-lane tiles) amplify HBM read traffic
~5x — measured ~5 ms/frame of runtime table-build cost on v5e
(scripts/bench_pack.py; STATUS gap #0).

``pack_rows_mxu`` builds each packed table in ONE Pallas pass: the
overlapping input windows come from n_blk adjacent (R, F) BlockSpec views
of the zero-padded table, and each offset's rows are placed at their lane
offset with a bitwise-exact bf16 placement matmul.  A manual-DMA window
formulation (per-offset async copies into lane-sliced destinations) was
tried first and is unbuildable on this toolchain: Mosaic has no
sub-128-lane DMA/concat ("result/input offset mismatch on non-concat
dimension"), and the window-DMA kernel crashes the remote compile helper
outright.  The MXU placement formulation compiles and is exact, but
MEASURED it does not beat XLA's two-level roll build (stage B 5.0 vs
2.8 ms — n_blk window re-reads + K serialized narrow matmuls; stage C
ties): the roll build is a genuine local optimum on this toolchain.
This module is kept as the measured-rejected kernel + the equivalence
machinery; production matching keeps the roll build
(scripts/bench_pack.py records the A/B).

Semantics note: jnp.roll wraps at the ends; the Pallas build reads zero
padding there instead.  The two differ only in packed rows whose probe
falls outside the image, and the consumer masks those probes out (the
``inside`` mask in refine_matches), so the builds are drop-in equivalent.
Interior-exact equivalence is tested in tests/test_matching.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _offsets(k_side: int, d: int, rd: int, w: int, u_count: int):
    """Flat row offsets in the matcher's packed-block order: u-pack p
    outer, v-offset j inner — block (p, j) reads row m + p*d + (j*d-rd)*w
    (the concat-of-rolls order in refine_matches)."""
    return [
        p * d + (j * d - rd) * w
        for p in range(u_count)
        for j in range(k_side)
    ]


@functools.lru_cache(maxsize=None)
def _placement_sel(K: int, F: int):
    """(K*F, K*F) 0/1 placement matrix: dot(win_slice_k, sel[kF:(k+1)F])
    writes the slice's F columns at lane offset k*F.  Mosaic has no
    lane-granular concat or DMA below 128-lane alignment, so the
    interleave runs on the MXU instead; int8 magnitudes (<= 127) are
    exact integers in bf16, making the matmul placement bitwise."""
    import numpy as np

    sel = np.zeros((K * F, K * F), np.int8)
    for k in range(K):
        sel[k * F:(k + 1) * F, k * F:(k + 1) * F] = np.eye(F, dtype=np.int8)
    return sel


def _mxu_pack_kernel(*refs, offsets, smin, R, n_blk, K, F, mm_dtype):
    blocks = refs[:n_blk]
    sel_ref = refs[n_blk]
    out_ref = refs[n_blk + 1]
    win = jnp.concatenate([b[:] for b in blocks], axis=0)  # (n_blk*R, F)
    acc = jnp.zeros((R, K * F), jnp.float32)  # Mosaic: matmul acc is 32-bit
    for k, s in enumerate(offsets):
        acc = acc + jnp.dot(
            win[s - smin: s - smin + R, :].astype(mm_dtype),
            sel_ref[k * F:(k + 1) * F, :],
            preferred_element_type=jnp.float32,
        )
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("offsets", "row_tile"))
def pack_rows_mxu(flat, offsets: tuple, row_tile: int = 0):
    """Single-pass packed-table build (see module docstring).

    Exactness by dtype: int8 rides bf16 matmuls (all int8 magnitudes are
    exact bf16 integers); f16/f32 ride f32 matmuls (f16 embeds exactly in
    f32, and a 0/1 placement contraction adds one nonzero to zeros, so
    the result is bitwise the source value)."""
    b, hw, F = flat.shape
    if flat.dtype not in (jnp.int8, jnp.float16, jnp.float32):
        raise ValueError(f"pack_rows_mxu: unsupported dtype {flat.dtype}")
    mm_dtype = jnp.bfloat16 if flat.dtype == jnp.int8 else jnp.float32
    offsets = tuple(int(s) for s in offsets)
    K = len(offsets)
    smin = min(0, *offsets)
    smax = max(0, *offsets)
    span = smax - smin
    if not row_tile:
        # keep the bf16 accumulator + blocks inside VMEM for wide packs
        row_tile = 4096 if K * F <= 384 else 2048
    R = min(row_tile, hw)
    if hw % R:
        raise ValueError(f"pack_rows_mxu: hw={hw} not divisible by {R}")
    n_blk = -(-span // R) + 1

    sel = jnp.asarray(_placement_sel(K, F), mm_dtype)
    kern = functools.partial(
        _mxu_pack_kernel, offsets=offsets, smin=smin, R=R, n_blk=n_blk,
        K=K, F=F, mm_dtype=mm_dtype,
    )
    in_specs = [
        pl.BlockSpec((R, F), (lambda j: (lambda i: (i + j, 0)))(j),
                     memory_space=pltpu.VMEM)
        for j in range(n_blk)
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    call = pl.pallas_call(
        kern,
        grid=(hw // R,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((R, K * F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw, K * F), flat.dtype),
    )

    def one(fb):
        padded = jnp.pad(fb, ((-smin, n_blk * R - (-smin)), (0, 0)))
        return call(*([padded] * n_blk + [sel]))

    if b == 1:
        return one(flat[0])[None]
    return jnp.stack([one(flat[i]) for i in range(b)])


def pack_rows_roll(flat, offsets: tuple):
    """Reference build: concat of wrapped rolls (out row m block k =
    flat[(m + offsets[k]) mod hw])."""
    return jnp.concatenate(
        [jnp.roll(flat, -s, axis=1) for s in offsets], axis=-1
    )


def pack_rows(flat, offsets, force=None):
    """Dispatch: roll-based build by default (it measured FASTER than the
    Pallas MXU build — see module docstring); ``force="mxu"`` selects the
    kernel for experiments."""
    if force == "mxu":
        return pack_rows_mxu(flat, offsets)
    return pack_rows_roll(flat, offsets)
