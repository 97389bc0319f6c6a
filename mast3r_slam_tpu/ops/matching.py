"""Dense iterative projective matching, TPU-native.

Capability parity with the reference matcher
(`/root/reference/mast3r_slam/matching.py` driving the CUDA kernels in
`backend/src/matching_kernels.cu`):

* ``iter_proj`` — per-pixel Levenberg-Marquardt on a bilinearly interpolated
  unit-ray field, minimizing the alignment between the ray at the projected
  pixel and the normalized target point (matching_kernels.cu:119-275).
* ``refine_matches`` — coarse-to-fine dilated window argmax of descriptor
  dot products (matching_kernels.cu:26-81).
* ``match`` — the full pipeline with the 3D-distance occlusion check
  (matching.py:52-90).

The reference launches one CUDA thread per pixel with divergent control flow;
here every pixel's LM state is a lane of a vectorized ``fori_loop`` so the
whole solve is a handful of fused VPU ops per iteration, and the descriptor
refinement is expressed as batched gathers + reduction (MXU/VPU-friendly,
bf16).  All shapes static; per-pixel accept/reject is a ``where`` mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .image import img_gradient


class MatchingConfig(NamedTuple):
    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 1e-1
    radius: int = 3
    dilation_max: int = 5
    desc_bits: int = 8   # refine descriptor table precision: 8 (int8) | 16
    # Descriptors are per-pixel L2-normalized (MASt3R postprocess), so the
    # int8 tables use the exact fixed scale 127 with no global-max
    # reduction; set False for unnormalized descriptors.
    desc_prenorm: bool = True
    # Coarse-stage query subsampling: 1 = reference-exact (every pixel runs
    # the full LM + all dilations), 2 = TPU fast path (iter_proj + the
    # dilation>1 refine walk run on the half-res query grid — both stages
    # are gather-ROW/BYTE-bound so cost scales with query count — then the
    # position field is 2x-interpolated and the final d=1 refine runs per
    # pixel).  The 3D occlusion gate and the C/Q confidence gates still run
    # at full resolution on the true pointmaps, so mis-interpolated matches
    # at depth discontinuities are rejected exactly like mis-converged LM
    # solves.  Validated ATE-neutral on the oracle harness.
    coarse_subsample: int = 1
    # Table precision for dilations > 1: 8 | 4.  int4 nibble tables halve
    # the gathered bytes but measure 2.4x SLOWER end-to-end on v5e (97 ms
    # vs 40 ms; XLA's int8-gather + unpack pipeline does not fuse well),
    # so 8 stays the default.  Kept as an option for future XLA versions.
    coarse_bits: int = 8
    # Radius of the final full-resolution d=1 refine pass when
    # coarse_subsample=2 (0 = same as `radius`; -1 = SKIP the per-pixel
    # pass entirely and emit the rounded interpolated coarse positions —
    # the cheapest option; the per-pixel stage is the matcher's largest
    # single gather, 196k rows + 42 MB random bytes).  After the coarse
    # walk the interpolated position field is within ~1-2 px of the
    # optimum, so a smaller final window preserves ATE while cutting the
    # dominant gather-byte cost of the per-pixel stage ((2r+1)^2
    # probes/query).  Ignored when coarse_subsample=1 (reference-exact).
    final_radius: int = 0
    # Radius for the coarse dilations BELOW dilation_max when
    # coarse_subsample=2 (0 = same as `radius`).  The first (coarsest)
    # dilation always keeps the full `radius` so the recovery coverage of
    # the walk is preserved; the inner dilations only polish a position
    # already inside their basin, where a (2*2+1)^2 window measures
    # near-identical to (2*3+1)^2 (exact on small warps, >98% of valid
    # matches on extreme keyframe-reset warps) at ~half the gathered bytes.
    # Ignored when coarse_subsample=1.
    coarse_radius: int = 0
    # Coarse dilation schedule under coarse_subsample=2 (empty = the
    # reference ladder dilation_max, dilation_max-1, ..., 2).  A thinned
    # descending schedule like (4, 2) keeps the walk's contraction property
    # as long as each stage's reach (radius_at_stage * d) covers the
    # previous stage's step size: 4*3=12 >= initial LM error budget,
    # 2*2=4 >= 4, final 1*2=2 >= 2 — two fewer stages' gather+pack cost.
    # The first schedule entry always runs at the full `radius`; later
    # entries use `coarse_radius`.  Validated like coarse_radius (exact on
    # small warps, >=99.5% on extreme keyframe-reset warps + oracle ATE).
    dilation_schedule: tuple = ()
    # Resolution of the LM ray TABLE (the search image): 1 = full-res
    # (reference-exact), 2 = the 9-channel ray+gradient field is built
    # from the 2x-subsampled pointmap and the LM solves in half-res
    # coordinates (positions scaled back up for the refine walk).  The
    # corner-pack build + 9-channel prep are table-side costs (~2 ms at
    # production res: narrow-row lane padding amplifies every pass over
    # the (hw, 9) f16 field); the coarse refine walk's reach (radius *
    # dilation_max >= 12 px) absorbs the ~1 px coarser LM optimum, and
    # the occlusion/confidence gates still run on the true full-res
    # pointmaps.  Validated like coarse_subsample (match agreement on
    # rendered occlusion scenes + oracle ATE).
    lm_table_subsample: int = 1
    # Query grid stride for the LM projection stage alone (0 = same as
    # coarse_subsample).  4 runs the LM solve on the quarter grid and
    # 2x-interpolates its position field onto the half grid before the
    # refine walk — the walk's first dilation (radius*dilation_max reach)
    # absorbs the coarser interpolation.  Only active under
    # coarse_subsample=2.  iter_proj is gather-ROW-bound, so queries/16
    # instead of queries/4.
    lm_subsample: int = 0
    # 2 = run the 3D-distance occlusion gate on the half-res query grid
    # (where the LM positions natively live under coarse_subsample=2) and
    # 2x2-replicate the verdict, saving a full-res row-bound gather; 1 =
    # per-pixel gate.  Only active under coarse_subsample=2.
    occlusion_subsample: int = 1
    # Query stride for FACTOR-GRAPH EDGE matches only (consecutive +
    # retrieval edges; the tracker always matches per-pixel).  2 = compute
    # edge matches only on the (::2, ::2) query grid — EXACTLY the
    # 2D-balanced residual subset BA consumes at the production
    # local_opt.points_subsample=4 (ops/ba.py::subsample_points picks
    # (::2, ::2)), so the BA inputs are BITWISE-IDENTICAL to matching
    # every pixel and throwing 3/4 of the results away (each query's
    # LM walk + refine is independent of the others).  The only semantic
    # change is the min_match_frac gate, which becomes an unbiased
    # ~49k-sample estimate instead of an exact count.  The engine applies
    # it to the symmetric/warp edge paths only; add_factors scatters the
    # subgrid back into the full-size edge arrays.  SLAMSystem AUTO-RESETS
    # this to 1 when local_opt.points_subsample != 4 (pipeline.py) — other
    # strides would read never-computed pixels and silently drop residuals.
    edge_query_subsample: int = 1
    # Gates of the pose-free desc-global retrieval-edge matcher
    # (match_desc_global): max L_inf px distance of the mutual cycle
    # check; minimum descriptor cosine; minimum cosine MARGIN over the
    # best competing peak >= 3 key-cells away (spatial-exclusion ratio
    # test); max queries allowed to claim one target half-cell
    # (funnel/multiplicity gate).
    desc_global_mutual_px: int = 2
    desc_global_min_cos: float = 0.85
    desc_global_min_margin: float = 0.1
    desc_global_max_mult: int = 8

    @classmethod
    def from_dict(cls, d: dict) -> "MatchingConfig":
        return cls(
            max_iter=int(d["max_iter"]),
            lambda_init=float(d["lambda_init"]),
            convergence_thresh=float(d["convergence_thresh"]),
            dist_thresh=float(d["dist_thresh"]),
            radius=int(d["radius"]),
            dilation_max=int(d["dilation_max"]),
            desc_bits=int(d.get("desc_bits", 8)),
            desc_prenorm=bool(d.get("desc_prenorm", True)),
            coarse_bits=int(d.get("coarse_bits", 8)),
            coarse_subsample=int(d.get("coarse_subsample", 1)),
            final_radius=int(d.get("final_radius", 0)),
            coarse_radius=int(d.get("coarse_radius", 0)),
            dilation_schedule=tuple(
                int(x) for x in d.get("dilation_schedule", ())),
            lm_table_subsample=int(d.get("lm_table_subsample", 1)),
            lm_subsample=int(d.get("lm_subsample", 0)),
            occlusion_subsample=int(d.get("occlusion_subsample", 1)),
            edge_query_subsample=int(d.get("edge_query_subsample", 1)),
            desc_global_mutual_px=int(d.get("desc_global_mutual_px", 2)),
            desc_global_min_cos=float(d.get("desc_global_min_cos", 0.85)),
            desc_global_min_margin=float(
                d.get("desc_global_min_margin", 0.1)),
            desc_global_max_mult=int(d.get("desc_global_max_mult", 8)),
        )


def pixel_to_lin(p, w):
    """(..., 2) int pixels -> linear index u + w*v (matching.py:13-15)."""
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx, w):
    """linear index -> (..., 2) (u, v) (matching.py:18-22)."""
    u = idx % w
    v = idx // w
    return jnp.stack([u, v], axis=-1)


def _normalize(x, axis=-1):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


def prep_for_iter_proj(X11, X21, idx_1_to_2_init, table_subsample: int = 1):
    """Build the 9-channel ray+gradient image, normalized target points and
    the initial pixel guesses (matching.py:25-49).

    X11, X21: (b, h, w, 3) pointmaps. idx init: (b, h*w) int or None.
    ``table_subsample`` > 1 builds the ray field from the subsampled
    pointmap; the returned ``p_init`` is then in TABLE coordinates
    (full-res position / s) — scale iter_proj's output back up.
    """
    b, h, w, _ = X11.shape
    s = max(int(table_subsample), 1)
    rays = _normalize(X11[:, ::s, ::s] if s > 1 else X11)
    gx, gy = img_gradient(rays)
    rays_with_grad = jnp.concatenate([rays, gx, gy], axis=-1)

    pts3d_norm = _normalize(X21.reshape(b, h * w, 3))

    if idx_1_to_2_init is None:
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(h * w)[None], (b, h * w))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(X11.dtype)
    if s > 1:
        p_init = p_init / float(s)
    return rays_with_grad, pts3d_norm, p_init


def _pack_corners(img_flat, w):
    """Corner-packed table: row m = [img[m], img[m+1], img[m+w], img[m+w+1]].

    TPU gathers are row-count-bound (~90 Mrows/s regardless of row width up
    to ~0.5 KB), so packing the four bilinear corners into one wide row
    turns 4 gathers into 1.  The pack itself is dense rolls at full HBM
    bandwidth, built ONCE per matching call and reused by all LM
    iterations."""
    c = img_flat.shape[-1]
    return jnp.concatenate(
        [img_flat,
         jnp.roll(img_flat, -1, axis=1),
         jnp.roll(img_flat, -w, axis=1),
         jnp.roll(img_flat, -(w + 1), axis=1)],
        axis=-1,
    )  # (b, hw, 4c)


def _bilinear_packed_t(packed, h, w, u, v):
    """Bilinear sample from a corner-packed table (see _pack_corners) at
    float (u, v) (b, n), returned LANES-LAST: (b, c, n).

    TPU layout note: all downstream math runs with the point axis in the
    128-lane dimension; trailing dims of 3/9 would waste >90%% of every
    vector register.  Caller guarantees u in [1, w-2], v in [1, h-2]
    (reference clamps), so all corners are in-bounds.  Corner/weight
    pairing mirrors matching_kernels.cu:154-183."""
    b, n = u.shape
    c4 = packed.shape[-1]
    c = c4 // 4
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = (u - u0)[:, None, :]
    dv = (v - v0)[:, None, :]
    base = (v0 * w + u0).astype(jnp.int32)

    g = jnp.take_along_axis(packed, base[..., None], axis=1)
    g = jnp.moveaxis(g, 1, 2).reshape(b, 4, c, n).astype(jnp.float32)
    # packed order: (v0,u0), (v0,u0+1), (v0+1,u0), (v0+1,u0+1)
    w22 = (1 - du) * (1 - dv)
    w21 = du * (1 - dv)
    w12 = (1 - du) * dv
    w11 = du * dv
    return (
        w22 * g[:, 0] + w21 * g[:, 1] + w12 * g[:, 2] + w11 * g[:, 3]
    )


def _ray_cost(rays_packed, h, w, u, v, pts3d_norm_t):
    """Sample+normalize ray at (u,v); lanes-last.  Returns
    (cost (b,n), err (b,3,n), gx (b,3,n), gy (b,3,n))."""
    s = _bilinear_packed_t(rays_packed, h, w, u, v)     # (b,9,n)
    ray = s[:, 0:3]
    norm = jnp.sqrt(jnp.maximum(jnp.sum(ray * ray, axis=1, keepdims=True),
                                1e-24))
    err = ray / norm - pts3d_norm_t
    cost = jnp.sum(err * err, axis=1)
    return cost, err, s[:, 3:6], s[:, 6:9]


@functools.partial(jax.jit, static_argnames=("max_iter", "table_f16"))
def iter_proj(rays_with_grad_img, pts3d_norm, p_init, max_iter=10,
              lambda_init=1e-8, cost_thresh=1e-6, table_f16=True):
    """Vectorized per-pixel LM projection solve.

    rays_with_grad_img: (b, h, w, 9); pts3d_norm: (b, n, 3);
    p_init: (b, n, 2) float.  Returns (p_new (b, n, 2) float, converged
    (b, n) bool).  Mirrors matching_kernels.cu:119-275.

    ``table_f16`` stores the corner-packed ray table as float16 (gathers
    are byte-bound on TPU — halves the gathered bytes; all arithmetic is
    f32 after the fetch, and f16's 10-bit mantissa keeps unit-ray
    quantization (~5e-4) well inside the matcher's pixel tolerance).
    """
    b, h, w, _ = rays_with_grad_img.shape
    table = rays_with_grad_img.reshape(b, h * w, 9)
    if table_f16:
        table = table.astype(jnp.float16)
    flat = _pack_corners(table, w)
    pts3d_norm_t = jnp.moveaxis(pts3d_norm, 1, 2)       # (b, 3, n)

    u = jnp.clip(p_init[..., 0], 1.0, w - 2.0)
    v = jnp.clip(p_init[..., 1], 1.0, h - 2.0)
    lam = jnp.full_like(u, lambda_init)

    # Gathers are the cost on TPU (row-count-bound): the LM loop carries the
    # sampled (cost, err, gx, gy) at the CURRENT iterate in its state so each
    # iteration gathers ONLY at the trial point — 1 + max_iter gathers total
    # instead of 2*max_iter, with an iterate sequence identical to the
    # reference's evaluate/propose/accept schedule (matching_kernels.cu:
    # 190-258: J is only consumed at accepted positions, and a rejected step
    # re-evaluates the same position, which the carried state makes free).
    cost, err, gx, gy = _ray_cost(flat, h, w, u, v, pts3d_norm_t)

    def body(_, state):
        u, v, cost, err, gx, gy, lam = state

        # Normal equations of the 2-dof system (J = [gx gy]); channel
        # reductions over axis 1, point axis stays in lanes
        A00 = jnp.sum(gx * gx, axis=1) + lam
        A01 = jnp.sum(gx * gy, axis=1)
        A11 = jnp.sum(gy * gy, axis=1) + lam
        b0 = -jnp.sum(err * gx, axis=1)
        b1 = -jnp.sum(err * gy, axis=1)

        det = A00 * A11 - A01 * A01
        det_inv = 1.0 / jnp.where(jnp.abs(det) < 1e-24, 1e-24, det)
        du_ = det_inv * (A11 * b0 - A01 * b1)
        dv_ = det_inv * (-A01 * b0 + A00 * b1)

        u_new = jnp.clip(u + du_, 1.0, w - 2.0)
        v_new = jnp.clip(v + dv_, 1.0, h - 2.0)
        new_cost, new_err, new_gx, new_gy = _ray_cost(
            flat, h, w, u_new, v_new, pts3d_norm_t
        )

        accept = new_cost < cost
        acc_c = accept[:, None, :]
        u = jnp.where(accept, u_new, u)
        v = jnp.where(accept, v_new, v)
        cost = jnp.where(accept, new_cost, cost)
        err = jnp.where(acc_c, new_err, err)
        gx = jnp.where(acc_c, new_gx, gx)
        gy = jnp.where(acc_c, new_gy, gy)
        lam = jnp.where(accept, lam * 0.1, lam * 10.0)
        return u, v, cost, err, gx, gy, lam

    u, v, cost, err, gx, gy, lam = jax.lax.fori_loop(
        0, max_iter, body, (u, v, cost, err, gx, gy, lam)
    )
    conv = cost < cost_thresh
    return jnp.stack([u, v], axis=-1), conv


@functools.partial(
    jax.jit,
    static_argnames=("radius", "dilation_max", "u_pack", "qmajor",
                     "coarse_bits", "dilation_min", "return_score"),
)
def refine_matches(D11, D21, p1, radius=3, dilation_max=5, u_pack=2,
                   qmajor=True, coarse_bits=8, dilation_min=1,
                   return_score=False):
    """Coarse-to-fine dilated window argmax of descriptor dot products.

    D11: (b, h, w, f) descriptor image; D21: (b, n, f) query descriptors;
    p1: (b, n, 2) int pixel guesses.  Mirrors matching_kernels.cu:26-81
    including probe order (u-major) and first-maximum tie-breaking.

    TPU formulation: XLA TPU gathers are row-count-bound for narrow rows
    (~4.4 ns/row) and BYTE-bound at ~24.5 GB/s once rows exceed ~150 B
    (measured on v5e through bench_matcher.py), so per dilation the whole
    (2r+1)^2 window is PRE-PACKED into wide rows with dense rolls
    (full-bandwidth HBM work) and fetched with few gathers per query, then
    scored with one MXU contraction + argmax.  This replaces the
    reference's 49-probe inner loop per dilation (one probe per CUDA
    thread step).  At packed widths the gather is purely byte-bound, so
    the biggest lever is the table element size: int8 descriptor tables
    (pass int8 D11/D21; the window argmax is invariant to the global
    quantization scale, so no dequantization appears anywhere) halve the
    gathered bytes vs bf16 and quarter them vs fp32.
    """
    b, h, w, f = D11.shape
    n = p1.shape[1]
    hw = h * w
    flat = D11.reshape(b, hw, f)
    D21c = D21.astype(D11.dtype)
    k_side = 2 * radius + 1
    K = k_side * k_side
    integer_desc = jnp.issubdtype(D11.dtype, jnp.integer)
    neg_inf = jnp.int32(-(2 ** 30)) if integer_desc else -jnp.inf

    # Gathered bytes are the binding cost of this kernel (see docstring).
    # coarse_bits=4 nibble-packs the TABLE for all dilations > 1 (the final
    # d=1 pass stays full int8), halving the coarse gather traffic.  Only
    # the table is quantized — queries keep full int8 precision — and the
    # window argmax is invariant to the 16x table scale, so this is an
    # asymmetric-precision score, not a rescale.
    use_int4 = coarse_bits == 4 and integer_desc and dilation_max > 1 \
        and qmajor
    if use_int4:
        fe = f + (f % 2)
        pad = jnp.pad(flat, ((0, 0), (0, 0), (0, fe - f)))
        q4 = jnp.round(pad.astype(jnp.float32) * (7.0 / 127.0)) \
            .astype(jnp.int8)
        flat4 = ((q4[..., 1::2] << 4) | (q4[..., 0::2] & 15))  # (b,hw,fe/2)
        q_pad = jnp.pad(D21c, ((0, 0), (0, 0), (0, fe - f))).astype(jnp.int32)
        q_even = q_pad[..., 0::2]
        q_odd = q_pad[..., 1::2]

    uv0 = p1.astype(jnp.int32)

    def per_dilation(uv0, d):
        int4 = use_int4 and d > 1
        tbl = flat4 if int4 else flat
        fb = tbl.shape[-1]
        rd = radius * d
        # Offsets in reference probe order: i (u) outer, j (v) inner
        offs = [(-rd + i * d, -rd + j * d)
                for i in range(k_side) for j in range(k_side)]
        off_arr = jnp.asarray(offs, jnp.int32)            # (K, 2)
        # Probe-packed table row m = [D11[m + lin(o)] for o in offs],
        # built SEPARABLY (u-shifts then v-shifts: k_side + u_pack rolls
        # instead of k_side^2 — same bytes, far smaller XLA graph).
        # v-offsets pre-packed into one wide row (k_side rolls, dense HBM
        # work), then u_pack u-offsets packed on top so each gathered row
        # covers u_pack whole probe columns: ceil(k_side/u_pack) gathers
        # per dilation.  Gathers are ROW-count-bound, so wider rows are
        # ~free until ~1-2 KB/row.  (A single 1176-wide all-probe pack
        # would need only ONE gather per dilation but reproducibly blows
        # the TPU executable past the 2 GiB serialization limit —
        # empirical backend constraint; u_pack=2 → 672 B rows stays well
        # inside both limits.)
        # Scoring runs lanes-last: n-batched tiny einsums lower to
        # per-batch ops; the (b, k, f, n) elementwise reduce does not.
        v_pack = jnp.concatenate(
            [jnp.roll(tbl, (rd - j * d) * w, axis=1)
             for j in range(k_side)], axis=-1,
        )                                                  # (b, hw, k_side*fb)
        P = max(1, min(u_pack, k_side))
        if P > 1:
            uv_pack = jnp.concatenate(
                [jnp.roll(v_pack, -p * d, axis=1) for p in range(P)],
                axis=-1,
            )                                              # (b, hw, P*k_side*f)
        else:
            uv_pack = v_pack

        u0 = uv0[..., 0]
        v0 = uv0[..., 1]
        base = v0 * w + u0

        if qmajor:
            # Queries-major scoring: the gathered rows are consumed in the
            # layout the gather produced them in ((b, n, probes*f), queries
            # in sublanes) — no moveaxis.  The lanes-last variant transposes
            # each 66 MB gathered block before scoring, and that transpose,
            # not the gather, dominated the measured refine time.
            q32 = (D21c.astype(jnp.int32) if integer_desc
                   else D21c.astype(jnp.float32))          # (b, n, f)
            score_blocks = []
            for i0 in range(0, k_side, P):
                du = i0 * d - rd
                # modular wrap (NOT clip): matches jnp.roll's wraparound so
                # a packed column p reads exactly row (base+du+p*d) mod hw;
                # any wrapped read has its probe outside the image and is
                # killed by the `inside` mask below
                idx = jnp.mod(base + du, hw)
                cand = jnp.take_along_axis(
                    uv_pack, idx[..., None], axis=1
                )                                          # (b, n, P*k_side*fb)
                candr = cand.reshape(b, n, P * k_side, fb)
                if int4:
                    # unpack AFTER widening: int8 bit ops lower poorly on
                    # the VPU (sub-word shifts), int32 ones are native
                    c32 = candr.astype(jnp.int32)
                    lo = ((c32 & 15) ^ 8) - 8
                    hi = c32 >> 4
                    blk = jnp.sum(
                        lo * q_even[:, :, None, :] + hi * q_odd[:, :, None, :],
                        axis=-1,
                    )                                      # (b, n, P*k_side)
                elif integer_desc:
                    blk = jnp.sum(
                        candr.astype(jnp.int32) * q32[:, :, None, :], axis=-1
                    )                                      # (b, n, P*k_side)
                else:
                    blk = jnp.sum(
                        (candr * q32[:, :, None, :]).astype(jnp.float32),
                        axis=-1,
                    )
                n_cols = min(P, k_side - i0)
                score_blocks.append(blk[..., : n_cols * k_side])
            score = jnp.concatenate(score_blocks, axis=-1)  # (b, n, K)

            ko = jnp.arange(K, dtype=jnp.int32)
            # probe k = i*k_side + j -> offset (-rd + i*d, -rd + j*d); the
            # window is a regular grid, so the winning position is pure
            # arithmetic on the argmax index — no per-query gather
            off_u = (ko // k_side) * d - rd                # (K,)
            off_v = (ko % k_side) * d - rd
            uu = u0[..., None] + off_u[None, None, :]      # (b, n, K)
            vv = v0[..., None] + off_v[None, None, :]
            inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
            score = jnp.where(inside, score, neg_inf)
            # first-maximum = reference's strictly-greater update order;
            # center keeps position when all scores <= 0 (float-min init)
            kbest = jnp.argmax(score, axis=-1)             # (b, n)
            sbest = jnp.max(score, axis=-1)
            keep_center = sbest <= 0
            ub = jnp.where(keep_center, u0,
                           u0 + (kbest // k_side) * d - rd)
            vb = jnp.where(keep_center, v0,
                           v0 + (kbest % k_side) * d - rd)
            return jnp.stack([ub, vb], axis=-1), sbest

        q_t = jnp.moveaxis(D21c, 1, 2)[:, None]            # (b, 1, f, n)
        score_blocks = []
        for i0 in range(0, k_side, P):
            du = i0 * d - rd
            # modular wrap (NOT clip): matches jnp.roll's wraparound so a
            # packed column p reads exactly row (base+du+p*d) mod hw; any
            # wrapped read has its probe outside the image and is killed
            # by the `inside` mask below
            idx = jnp.mod(base + du, hw)
            cand = jnp.take_along_axis(
                uv_pack, idx[..., None], axis=1
            )                                              # (b, n, P*k_side*f)
            cand_t = jnp.moveaxis(cand, 1, 2).reshape(b, P * k_side, f, n)
            if integer_desc:
                blk = jnp.sum(
                    cand_t.astype(jnp.int32) * q_t.astype(jnp.int32), axis=2
                )
            else:
                blk = jnp.sum((cand_t * q_t).astype(jnp.float32), axis=2)
            # last group may carry spurious u-columns beyond k_side
            n_cols = min(P, k_side - i0)
            score_blocks.append(blk[:, : n_cols * k_side])  # (b, n_cols*k_side, n)
        score = jnp.concatenate(score_blocks, axis=1)      # (b, K, n)

        uu = off_arr[None, :, 0:1] + u0[:, None, :]        # (b, K, n)
        vv = off_arr[None, :, 1:2] + v0[:, None, :]
        inside = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
        score = jnp.where(inside, score, neg_inf)
        # first-maximum = reference's strictly-greater update order;
        # center keeps position when all scores <= 0 (float-min init)
        kbest = jnp.argmax(score, axis=1)                  # (b, n)
        sbest = jnp.take_along_axis(score, kbest[:, None, :], axis=1)[:, 0]
        keep_center = sbest <= 0
        ub = jnp.where(
            keep_center, u0,
            jnp.take_along_axis(uu, kbest[:, None, :], axis=1)[:, 0],
        )
        vb = jnp.where(
            keep_center, v0,
            jnp.take_along_axis(vv, kbest[:, None, :], axis=1)[:, 0],
        )
        return jnp.stack([ub, vb], axis=-1), sbest

    sbest = None
    for d in range(dilation_max, dilation_min - 1, -1):
        uv0, sbest = per_dilation(uv0, d)
    if return_score:
        # the LAST dilation's winning-probe score, already computed for
        # the keep_center decision — free for callers gating on the
        # final descriptor similarity (match_desc_global)
        return uv0, sbest
    return uv0


def _upsample2x_field(fh):
    """2x linear upsampling of a field sampled on the even-pixel grid:
    out[2i] = in[i], out[2i+1] = (in[i] + in[i+1])/2 (edge-clamped).
    fh: (b, h2, w2, c) float -> (b, 2*h2, 2*w2, c)."""

    def up_axis(a, axis):
        n = a.shape[axis]
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, n, axis=axis),
             jax.lax.slice_in_dim(a, n - 1, n, axis=axis)],
            axis=axis,
        )
        st = jnp.stack([a, 0.5 * (a + nxt)], axis=axis + 1)
        shape = list(a.shape)
        shape[axis] = 2 * n
        return st.reshape(shape)

    return up_axis(up_axis(fh, 1), 2)


def _q8_pair(D11, D21_flat, prenorm=True):
    """Symmetric global-scale int8 tables: the window argmax is invariant
    to any positive per-side scale, so no dequant is needed and the
    gathered table bytes halve vs bf16 (gathers are byte-bound — see
    refine_matches docstring).

    prenorm: descriptors are L2-normalized per pixel (MASt3R head output),
    so every component is in [-1, 1] and scale 127 is exact — this keeps
    the quantization a pure elementwise op instead of inserting a global
    max-reduction barrier over the 38 MB descriptor images."""

    def q8(D):
        if prenorm:
            s = 127.0
        else:
            s = 127.0 / jnp.maximum(jnp.max(jnp.abs(D)), 1e-12)
        return jnp.clip(jnp.round(D * s), -127, 127).astype(jnp.int8)

    return q8(D11), q8(D21_flat)


def match(X11, X21, D11, D21, idx_1_to_2_init=None,
          cfg: MatchingConfig = MatchingConfig(),
          query_subsample: int = 1):
    """Full dense matching pipeline (matching.py:8-10, 52-90).

    X11, X21: (b, h, w, 3); D11, D21: (b, h, w, fdim).
    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool).

    With ``coarse_subsample=2`` the gather-bound coarse stages (LM
    projection + dilation>1 refine) run on the half-resolution query grid
    and only the final d=1 refine is per-pixel; see MatchingConfig.

    ``query_subsample=2`` (factor-graph edges only — see
    MatchingConfig.edge_query_subsample): the final refine and occlusion
    gate also stay on the (::2, ::2) query grid and the outputs are
    subgrid-sized — (b, h//2 * w//2) idx / valid.  Per-query results are
    identical to the full run's values at those positions (every query's
    LM walk + refine is independent); requires coarse_subsample=2.
    """
    b, h, w = X21.shape[:3]
    qsub = (query_subsample == 2 and cfg.coarse_subsample == 2
            and h % 2 == 0 and w % 2 == 0 and cfg.radius > 0)
    lmt = (cfg.lm_table_subsample == 2 and h % 2 == 0 and w % 2 == 0)
    rays_img, pts3d_norm, p_init = prep_for_iter_proj(
        X11, X21, idx_1_to_2_init, table_subsample=2 if lmt else 1
    )
    cs = cfg.coarse_subsample
    half = cs == 2 and h % 2 == 0 and w % 2 == 0
    lm4 = half and cfg.lm_subsample == 4 and h % 4 == 0 and w % 4 == 0
    if half:
        h2, w2 = h // 2, w // 2
        s_lm = 4 if lm4 else 2
        sub = lambda A, s=s_lm: A.reshape(b, h, w, -1)[:, ::s, ::s].reshape(
            b, (h // s) * (w // s), -1)
        pts3d_n_q = sub(pts3d_norm)
        p_init_q = sub(p_init)
    else:
        pts3d_n_q, p_init_q = pts3d_norm, p_init

    p1, valid_proj2 = iter_proj(
        rays_img, pts3d_n_q, p_init_q,
        max_iter=cfg.max_iter, lambda_init=cfg.lambda_init,
        cost_thresh=cfg.convergence_thresh,
    )
    if lmt:
        p1 = p1 * 2.0  # table coords -> full-res pixels
    if lm4:
        # LM ran on the quarter grid: interpolate its (full-res-coordinate)
        # position field up to the half grid for the refine walk
        h4, w4 = h // 4, w // 4
        p1 = _upsample2x_field(
            p1.reshape(b, h4, w4, 2)).reshape(b, h2 * w2, 2)
        valid_proj2 = jnp.repeat(
            jnp.repeat(valid_proj2.reshape(b, h4, w4), 2, axis=1),
            2, axis=2).reshape(b, h2 * w2)

    if cfg.radius > 0:
        D21_flat = D21.reshape(b, h * w, -1)
        if jnp.issubdtype(D11.dtype, jnp.integer):
            # pre-quantized int8 descriptors (the engine exports its q8
            # tables for the pose-warped consecutive edge — reusing them
            # keeps that path decode-free AND bit-identical to quantizing
            # here)
            D11_r, D21_r = D11, D21_flat
        elif cfg.desc_bits == 8:
            D11_r, D21_r = _q8_pair(D11, D21_flat, cfg.desc_prenorm)
        else:
            D11_r = D11.astype(jnp.bfloat16)
            D21_r = D21_flat.astype(jnp.bfloat16)

    if half:
        # coarse refine walk on the half grid (queries are true even-pixel
        # descriptors; the table stays full-resolution)
        p1c = p1.astype(jnp.int32)
        if cfg.radius > 0:
            D21_h = D21_r.reshape(b, h, w, -1)[:, ::2, ::2].reshape(
                b, h2 * w2, -1)
        if cfg.radius > 0 and cfg.dilation_max > 1:
            # coarsest dilation at the full radius (coverage), inner
            # dilations at coarse_radius (gather bytes)
            sched = cfg.dilation_schedule or \
                tuple(range(cfg.dilation_max, 1, -1))
            p1c = refine_matches(
                D11_r, D21_h, p1c,
                radius=cfg.radius, dilation_max=sched[0],
                coarse_bits=cfg.coarse_bits,
                dilation_min=sched[0],
            )
            if len(sched) > 1:
                r_coarse = cfg.coarse_radius if cfg.coarse_radius > 0 \
                    else cfg.radius
                # k_side <= 5 -> pack the whole window into one gather
                # row (<= 600 B, still byte-bound, zero wasted columns)
                up = (2 * r_coarse + 1) if r_coarse <= 2 else 2
                contiguous = sched[1:] == tuple(
                    range(sched[1], sched[-1] - 1, -1))
                if contiguous:
                    p1c = refine_matches(
                        D11_r, D21_h, p1c,
                        radius=r_coarse, dilation_max=sched[1],
                        coarse_bits=cfg.coarse_bits, dilation_min=sched[-1],
                        u_pack=up,
                    )
                else:
                    for dd in sched[1:]:
                        p1c = refine_matches(
                            D11_r, D21_h, p1c,
                            radius=r_coarse, dilation_max=dd,
                            coarse_bits=cfg.coarse_bits, dilation_min=dd,
                            u_pack=up,
                        )
        if qsub:
            # -- subgrid output path (edge_query_subsample=2) -----------
            # occlusion gate on the half grid (the occlusion_subsample=2
            # computation, minus the 2x2 replication), then the final
            # refine directly on the half-grid queries: outputs stay on
            # the (::2, ::2) grid — exactly BA's points_subsample=4
            # residual subset, so per-query values are identical to the
            # full run's at those positions
            idxh = pixel_to_lin(jnp.clip(
                p1.astype(jnp.int32),
                0, jnp.asarray([w - 1, h - 1], jnp.int32)), w)
            X11_flat = X11.reshape(b, h * w, 3)
            X11_at = jnp.take_along_axis(X11_flat, idxh[..., None], axis=1)
            X21_h = X21.reshape(b, h, w, 3)[:, ::2, ::2].reshape(
                b, h2 * w2, 3)
            dists_h = jnp.linalg.norm(X11_at - X21_h, axis=-1)
            valid_h = valid_proj2 & (dists_h < cfg.dist_thresh)
            if cfg.final_radius < 0:
                p1f = p1c
            else:
                r_final = cfg.final_radius if cfg.final_radius > 0 \
                    else cfg.radius
                p1f = refine_matches(
                    D11_r, D21_h, p1c,
                    radius=r_final, dilation_max=1,
                    coarse_bits=cfg.coarse_bits,
                    u_pack=(2 * r_final + 1) if r_final <= 2 else 2,
                )
            return pixel_to_lin(p1f, w), valid_h[..., None]

        occl_half = cfg.occlusion_subsample == 2
        if occl_half:
            # occlusion gate where the LM positions natively live (half
            # grid, 4x fewer row-bound gather rows); verdict replicated 2x2
            idxh = pixel_to_lin(jnp.clip(
                p1.astype(jnp.int32),
                0, jnp.asarray([w - 1, h - 1], jnp.int32)), w)
            X11_flat = X11.reshape(b, h * w, 3)
            X11_at = jnp.take_along_axis(X11_flat, idxh[..., None], axis=1)
            X21_h = X21.reshape(b, h, w, 3)[:, ::2, ::2].reshape(
                b, h2 * w2, 3)
            dists_h = jnp.linalg.norm(X11_at - X21_h, axis=-1)
            valid_h = valid_proj2 & (dists_h < cfg.dist_thresh)
            valid = jnp.repeat(
                jnp.repeat(valid_h.reshape(b, h2, w2), 2, axis=1),
                2, axis=2).reshape(b, h * w)

        # interpolate both position fields to full resolution
        up = lambda P: _upsample2x_field(
            P.astype(jnp.float32).reshape(b, h2, w2, 2)
        ).reshape(b, h * w, 2)
        p1 = up(p1)                      # pre-refine (occlusion check)
        p1_start = jnp.round(up(p1c)).astype(jnp.int32)
        p1_start = jnp.clip(
            p1_start, 0, jnp.asarray([w - 1, h - 1], jnp.int32))
        valid_proj2 = jnp.repeat(
            jnp.repeat(valid_proj2.reshape(b, h2, w2), 2, axis=1),
            2, axis=2,
        ).reshape(b, h * w)
    else:
        occl_half = False
        p1_start = p1.astype(jnp.int32)

    p1 = p1.astype(jnp.int32)

    if not occl_half:
        # Occlusion check on 3D distance (matching.py:71-76)
        idx = pixel_to_lin(jnp.clip(
            p1, 0, jnp.asarray([w - 1, h - 1], jnp.int32)), w)
        X11_flat = X11.reshape(b, h * w, 3)
        X11_at = jnp.take_along_axis(X11_flat, idx[..., None], axis=1)
        dists2 = jnp.linalg.norm(X11_at - X21.reshape(b, h * w, 3), axis=-1)
        valid = valid_proj2 & (dists2 < cfg.dist_thresh)

    if cfg.radius > 0 and not (half and cfg.final_radius < 0):
        r_final = cfg.final_radius if (half and cfg.final_radius > 0) \
            else cfg.radius
        p1 = refine_matches(
            D11_r, D21_r, p1_start,
            radius=r_final,
            dilation_max=1 if half else cfg.dilation_max,
            coarse_bits=cfg.coarse_bits,
            u_pack=(2 * r_final + 1) if (half and r_final <= 2) else 2,
        )
    else:
        p1 = p1_start

    idx_1_to_2 = pixel_to_lin(p1, w)
    return idx_1_to_2, valid[..., None]


# ---------------------------------------------------------------------------
# Pose-free global descriptor matching (retrieval / loop-closure edges)
# ---------------------------------------------------------------------------

def _coarse_global_argmax(D_tab8, D_q8, h, w, s_key: int,
                          chunk: int = 2048, excl_cells: int = 3):
    """For each query descriptor, the best-scoring position on the
    ``s_key``-strided key grid of the table view — a brute-force int8 MXU
    contraction, chunked over queries so the (chunk, n_keys) score block
    stays small — plus the best score OUTSIDE an ``excl_cells``-radius
    spatial exclusion zone around the winner (the second peak of a
    Lowe-style ratio test; the immediate neighbors score high
    legitimately, so they must not count as a competing peak).

    D_tab8: (b, h, w, f) int8; D_q8: (b, nq, f) int8.
    Returns (pos (b, nq, 2) int32 full-res pixel coords, score (b, nq)
    int32, second (b, nq) int32 best-outside-exclusion score)."""
    b = D_tab8.shape[0]
    f = D_tab8.shape[-1]
    hk, wk = h // s_key, w // s_key
    keys = D_tab8[:, ::s_key, ::s_key].reshape(b, hk * wk, f)
    ku = jnp.arange(hk * wk, dtype=jnp.int32) % wk
    kv = jnp.arange(hk * wk, dtype=jnp.int32) // wk
    nq = D_q8.shape[1]
    pad = (-nq) % chunk
    Dq = jnp.pad(D_q8, ((0, 0), (0, pad), (0, 0))) if pad else D_q8
    n_chunks = (nq + pad) // chunk
    Dq = Dq.reshape(b, n_chunks, chunk, f)

    def one(q):  # (b, chunk, f) int8
        s = jax.lax.dot_general(
            q, keys, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (b, chunk, hk*wk)
        best = jnp.argmax(s, axis=-1).astype(jnp.int32)
        smax = jnp.max(s, axis=-1)
        near = (
            (jnp.abs(ku[None, None, :] - (best % wk)[..., None])
             <= excl_cells)
            & (jnp.abs(kv[None, None, :] - (best // wk)[..., None])
               <= excl_cells)
        )
        s2 = jnp.max(jnp.where(near, jnp.int32(-(2 ** 30)), s), axis=-1)
        return best, smax, s2

    best, score, second = jax.lax.map(one, jnp.moveaxis(Dq, 1, 0))
    unpad = lambda A: jnp.moveaxis(A, 0, 1).reshape(  # noqa: E731
        b, nq + pad)[:, :nq]
    best, score, second = unpad(best), unpad(score), unpad(second)
    pos = jnp.stack(
        [(best % wk) * s_key, (best // wk) * s_key], axis=-1
    ).astype(jnp.int32)
    return pos, score, second


def match_desc_global(D8_i, D8_j, dconf_i, dconf_j, h, w,
                      cfg: MatchingConfig = MatchingConfig()):
    """Pose-free symmetric matching of two keyframes from their stored q8
    descriptor tables — the decode-free retrieval-edge path.

    The reference prices every loop-closure proposal at a full symmetric
    2E-batch decode (mast3r_utils.py:113-147) whose pointmap outputs the
    factor graph never stores — BA consumes the ARENA's canonical
    pointmaps plus (idx, valid, Q) only (global_opt.py edge arrays).  So
    for retrieval edges the decode buys nothing but matches+confidences,
    and those can be computed directly from per-keyframe canonical q8
    descriptors: a brute-force global argmax on the MXU (pose-FREE —
    unlike the pose-warped consecutive-edge path, this stays valid under
    arbitrary accumulated pose-graph drift, which is exactly the loop-
    closure regime) followed by the production dilated refine walk, with
    a mutual (cycle-consistency) gate replacing the decode-dependent 3D
    occlusion gate.

    D8_i / D8_j: (b, h, w, f) int8 canonical descriptor tables;
    dconf_i / dconf_j: (b, h*w, 1) descriptor confidences.
    Returns the add_factors subgrid contract (edge_query_subsample=2
    layout): (idx_i2j (b, hw/4), idx_j2i, vm_j (b, hw/4, 1), vm_i,
    Qii, Qjj, Qji, Qij) where idx_i2j[q] indexes view i's full-res
    pixels per half-grid query q of view j (tracker index convention)
    and the Q blocks are the full-res canonical confidences
    (_gate_edges_sub handles the sub/expand)."""
    b = D8_i.shape[0]
    h2, w2 = h // 2, w // 2
    lim = jnp.asarray([w - 1, h - 1], jnp.int32)

    def half_queries(D8):
        return D8[:, ::2, ::2].reshape(b, h2 * w2, -1)

    h4, w4 = h // 4, w // 4

    def expand2x(A):
        """(b, h4*w4, ...) quarter-grid field -> (b, h2*w2, ...) half grid
        (each half-grid query inherits its parent quarter-cell)."""
        A4 = A.reshape((A.shape[0], h4, w4) + A.shape[2:])
        A4 = jnp.repeat(jnp.repeat(A4, 2, axis=1), 2, axis=2)
        return A4.reshape((A.shape[0], h2 * w2) + A.shape[2:])

    def quarter_queries(D8):
        return D8[:, ::4, ::4].reshape(b, h4 * w4, -1)

    def one_direction(D_tab, D_q4, D_qh):
        # coarse: global argmax on the QUARTER-grid queries over the s=4
        # key grid (+ the competing peak outside the spatial exclusion
        # zone) — 4x fewer score rows than half-grid queries (the coarse
        # stage is HBM-bound on the (chunk, n_keys) int32 score blocks);
        # each half-grid query inherits its parent quarter-cell's coarse
        # position, and the first refine stage's reach (radius*dilation =
        # 4 px) absorbs the <=2 px query-sharing offset on top of the
        # <=2 px key granularity.  Then the production refine ladder on
        # the half-grid queries at full table resolution.
        pos4, _, second4 = _coarse_global_argmax(D_tab, D_q4, h, w,
                                                 s_key=4)
        pos = expand2x(pos4)
        second = expand2x(second4)
        pos = refine_matches(D_tab, D_qh, pos, radius=2, dilation_max=2,
                             coarse_bits=cfg.coarse_bits, dilation_min=2,
                             u_pack=5)
        # the final d=1 pass returns its winning-probe score for free —
        # the score at the REFINED position (the coarse winner sits up
        # to 2 px off and under-reads true matches; a true
        # correspondence scores ~the descriptor autocorrelation peak
        # while a non-covisible query's smooth-field optimum stays near
        # its coarse value — the margin that separates them).  When the
        # window keeps the center (all scores <= 0) the returned score
        # is negative and the cosine floor rejects the match anyway.
        pos, rs = refine_matches(D_tab, D_qh, pos, radius=2,
                                 dilation_max=1,
                                 coarse_bits=cfg.coarse_bits, u_pack=5,
                                 return_score=True)
        pos = jnp.clip(pos, 0, lim)
        return pos, rs, second

    p_ij, s_ij, s2_ij = one_direction(       # (b, h2*w2, 2) in i coords
        D8_i, quarter_queries(D8_j), half_queries(D8_j))
    p_ji, s_ji, s2_ji = one_direction(       # in j coords
        D8_j, quarter_queries(D8_i), half_queries(D8_i))

    # gates (all pose-free):
    #  * mutual cycle: the reverse field at the matched pixel's half-cell
    #    must come back to the query;
    #  * score margin: the winner must beat the best peak >= 3 key-cells
    #    away by desc_global_min_margin cosine (Lowe-style ratio with
    #    spatial exclusion — ambiguous/repetitive regions and
    #    non-covisible queries have flat score fields and die here);
    #  * multiplicity: a target half-cell claimed by more than
    #    desc_global_max_mult queries is a funnel (non-covisible queries
    #    pile onto frustum-border pixels).  LOOSE backstop (default 8):
    #    Sim(3) zoom makes legitimate many-to-one regions, and the
    #    cosine floor already kills the border funnel — max_mult=2 was
    #    measured to reject ~2/3 of TRUE matches on wide-baseline pairs;
    #  * absolute cosine floor.
    f_norm = 127.0 * 127.0  # prenorm q8 scale: unit descriptors at 127

    def gates(p_fwd, p_rev_field, s_fwd, s2_fwd):
        b_ = p_fwd.shape[0]
        cell = (p_fwd[..., 1] // 2) * w2 + (p_fwd[..., 0] // 2)
        back = jnp.take_along_axis(
            p_rev_field, cell[..., None], axis=1)      # (b, nq, 2)
        qv, qu = jnp.divmod(
            jnp.arange(h2 * w2, dtype=jnp.int32), w2)
        q_pos = jnp.stack([qu * 2, qv * 2], axis=-1)[None]
        d = jnp.max(jnp.abs(back - q_pos), axis=-1)
        ok = d <= cfg.desc_global_mutual_px
        cos = s_fwd.astype(jnp.float32) / f_norm
        cos2 = s2_fwd.astype(jnp.float32) / f_norm
        ok &= (cos - cos2) >= cfg.desc_global_min_margin
        ok &= cos >= cfg.desc_global_min_cos
        mult = jnp.zeros((b_, h2 * w2), jnp.int32).at[
            jnp.arange(b_)[:, None], cell].add(1)
        ok &= jnp.take_along_axis(mult, cell, axis=1) \
            <= cfg.desc_global_max_mult
        return ok

    vm_j = gates(p_ij, p_ji, s_ij, s2_ij)              # per j query
    vm_i = gates(p_ji, p_ij, s_ji, s2_ji)              # per i query

    idx_i2j = pixel_to_lin(p_ij, w)
    idx_j2i = pixel_to_lin(p_ji, w)
    return (idx_i2j, idx_j2i, vm_j[..., None], vm_i[..., None],
            dconf_i, dconf_j, dconf_j, dconf_i)
