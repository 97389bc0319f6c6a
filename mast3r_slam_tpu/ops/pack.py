"""Probe-table packing kernels for the dense matcher.

The matcher's window fetches are row gathers from PRE-PACKED tables: row m
of the packed table holds the descriptor/ray rows at a fixed set of flat
offsets around m (see ops/matching.py::refine_matches).  Reference access
pattern: matching_kernels.cu:26-81 (one probe per CUDA thread step).

Building those tables with jnp.roll + concatenate is pure data movement,
but XLA materializes an intermediate per packing level and the narrow
int8 rows (24 lanes, padded to 128-lane tiles) amplify HBM traffic ~5x —
measured ~7 ms/frame of runtime table-build cost on v5e (STATUS gap #0).

This module builds each packed table in ONE pass: a Pallas kernel DMAs an
overlapping row window into VMEM per output tile and assembles the whole
(R, K*F) tile with static-offset slices, writing the output exactly once.

Semantics note: jnp.roll wraps at the ends; the kernel CLAMPS its window
to [0, hw) instead.  The two differ only in packed rows whose probe falls
outside the image, and every consumer masks those probes out (the
``inside`` mask in refine_matches, the [1, w-2] clamp in iter_proj), so
the clamped build is drop-in equivalent.  Equivalence is tested against
the roll build on interior rows (tests/test_matching.py).
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


def _pack_kernel(in_ref, out_ref, win, wsem, osems, *, offsets, smin, W, R):
    i = pl.program_id(0)
    F = in_ref.shape[-1]
    # input is zero-padded by -smin rows up front, so the window for out
    # rows [i*R, i*R+R) starts at padded row i*R and every slice start is
    # static; out-of-image rows read the zero padding (masked downstream)
    dma = pltpu.make_async_copy(in_ref.at[pl.ds(i * R, W), :], win, wsem)
    dma.start()
    dma.wait()
    # assemble the tile with per-offset DMAs: the destination lane offsets
    # (multiples of F=24, not 128) are byte-granular for the DMA engine,
    # where a vector concat would need lane relayouts Mosaic rejects
    # ("result/input offset mismatch on non-concat dimension")
    copies = [
        pltpu.make_async_copy(
            win.at[s - smin: s - smin + R, :],
            out_ref.at[:, k * F:(k + 1) * F],
            osems.at[k],
        )
        for k, s in enumerate(offsets)
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()


@functools.partial(jax.jit, static_argnames=("offsets", "row_tile"))
def pack_rows_pallas(flat, offsets: tuple, row_tile: int = 8192):
    """Packed table out[b, m, k*F:(k+1)*F] = flat[b, m + offsets[k], :]
    (zero where the offset row is outside [0, hw)) built in one pass.
    flat: (b, hw, F)."""
    b, hw, F = flat.shape
    offsets = tuple(int(s) for s in offsets)
    K = len(offsets)
    smin = min(0, *offsets)
    smax = max(0, *offsets)
    R = min(row_tile, hw)
    if hw % R:
        raise ValueError(f"pack_rows_pallas: hw={hw} not divisible by {R}")
    W = R + (smax - smin)
    W += -W % 8  # DMA slice shapes must be 8-sublane aligned
    padded = jnp.pad(flat, ((0, 0), (-smin, W - R - (-smin)), (0, 0)))

    kern = functools.partial(
        _pack_kernel, offsets=offsets, smin=smin, W=W, R=R
    )
    call = pl.pallas_call(
        kern,
        grid=(hw // R,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((R, K * F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hw, K * F), flat.dtype),
        scratch_shapes=[
            pltpu.VMEM((W, F), flat.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    return jax.vmap(call)(padded)


def pack_rows_roll(flat, offsets: tuple):
    """Reference build: concat of wrapped rolls (out row m block k =
    flat[(m + offsets[k]) mod hw]).  One concat, no intermediate packing
    levels."""
    return jnp.concatenate(
        [jnp.roll(flat, -s, axis=1) for s in offsets], axis=-1
    )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def pack_rows(flat, offsets, row_tile: int = 8192, force=None):
    """Dispatch: Pallas single-pass build on TPU when the shape allows,
    roll-based build otherwise.  ``force``: None | "pallas" | "roll"."""
    b, hw, F = flat.shape
    offsets = tuple(int(s) for s in offsets)
    smin = min(0, *offsets)
    smax = max(0, *offsets)
    R = min(row_tile, hw)
    ok = hw % R == 0
    use_pallas = (force == "pallas") or (force is None and ok and _on_tpu())
    if use_pallas:
        if not ok:
            raise ValueError("pack_rows: shape unsupported for pallas")
        return pack_rows_pallas(flat, offsets, row_tile=R)
    return pack_rows_roll(flat, offsets)
