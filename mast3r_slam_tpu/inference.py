"""Inference adapters around the MASt3R network.

Capability parity with `/root/reference/mast3r_slam/mast3r_utils.py`
(mono / asymmetric / symmetric-batch two-view inference, output
downsampling, image resize-to-network-shape), redesigned so each pipeline
step is a single jitted computation:

* the reference's per-edge Python loop in ``mast3r_decode_symmetric_batch``
  (mast3r_utils.py:113-147) becomes ONE batched decoder call — both
  directions of every edge are decoded in a single 2E-batch forward, which
  is exactly the kind of large fused matmul batch the MXU wants;
* encoder feature caching (frame.feat) is preserved;
* the fp32-head / bf16-trunk split mirrors the reference autocast policy.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.mast3r import MASt3R, MASt3RConfig
from .ops import matching


class InferenceEngine:
    """Holds the model + params and exposes jitted inference entry points.

    img_hw is fixed per run (static shapes); downsample mirrors
    config['dataset']['img_downsample'] (mast3r_utils.py:69-78).
    """

    def __init__(self, model: MASt3R, params, img_hw: Tuple[int, int],
                 downsample: int = 1,
                 match_cfg: matching.MatchingConfig | None = None,
                 int8_encoder: bool = False,
                 int8_local_head: bool = False,
                 mesh=None):
        """int8_encoder enables the quantized encoder path (capability
        parity with the fork's TensorRT INT8 feature; models/quant.py);
        int8_local_head quantizes the catMLP local-feature MLPs (the
        dominant head weight-read block) the same way.

        ``mesh``: a jax.sharding.Mesh with a 'model' axis of size > 1
        enables tensor-parallel inference — params get Megatron-style
        column/row placements (parallel.mesh.shard_params_tp) and GSPMD
        inserts one all-reduce per attn/MLP block, scaling the dominant
        matmul latency across chips."""
        self.model = model
        self.mesh = mesh
        if model.cfg.dtype == jnp.bfloat16 and \
                os.environ.get("MAST3R_BF16_PARAMS", "1") != "0":
            # Bitwise-identical (those modules compute in bf16 anyway) but
            # halves the ~2 GB/frame of trunk weight reads — see
            # cast_trunk_params_bf16.  Heads included iff they compute bf16.
            from .models.mast3r import cast_trunk_params_bf16

            params = cast_trunk_params_bf16(
                params, head_bf16=model.cfg.head_dtype == jnp.bfloat16)
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            from .parallel.mesh import shard_params_tp

            params = shard_params_tp(params, mesh)
        self.params = params
        self.img_hw = img_hw
        self.downsample = downsample
        self.match_cfg = match_cfg or matching.MatchingConfig()
        p = model.cfg.patch_size
        ds = downsample
        self.n_patches = (img_hw[0] // p) * (img_hw[1] // p)
        self.feat_dim = model.cfg.enc_embed_dim
        self.out_hw = (img_hw[0] // ds, img_hw[1] // ds)
        # Portrait inputs (h > w) run through the net at their TRUE
        # orientation — this IS the reference behavior: ManyAR_PatchEmbed
        # un-transposes portrait rows before the conv and emits a portrait
        # pos grid (dust3r/patch_embed.py:64-70), and the SLAM loader's
        # PatchEmbedDust3R + landscape_only=False rewrite
        # (dust3r/model.py:31-36) runs portrait frames natively with the
        # head at (H, W) (utils/misc.py:56-61).  The landscape-transpose
        # in upstream dust3r is purely a mixed-AR batch STORAGE convention
        # (undone inside the patch embed), which a fixed-shape single-AR
        # run never needs.  Parity checked by the H>W case of
        # tests/test_convert_parity.py.

        if int8_encoder:
            from .models.quant import encode_int8, quantize_encoder_params

            self.qparams = quantize_encoder_params(params)
            # qparams ride the ARGUMENT list: a closure would bake the
            # ~0.3 GB of int8 weights into the executable as constants
            # (relay compile-upload limit; CLAUDE.md)
            _enc8 = jax.jit(
                lambda p, q, img: encode_int8(p, q, img, model.cfg)
            )
            self._encode = lambda p, img: _enc8(p, self.qparams, img)
        else:
            self.qparams = None
            self._encode = jax.jit(
                lambda p, img: model.apply(p, img, method=MASt3R.encode)
            )
        if int8_local_head:
            from .models.quant import quantize_local_heads

            self.qlocal = quantize_local_heads(params)
        else:
            self.qlocal = None
        self._decode_head = jax.jit(
            functools.partial(self._decode_head_impl, img_hw)
        )
        self._match_asym = jax.jit(self._match_asymmetric_impl)
        self._match_sym = jax.jit(self._match_symmetric_impl)

    # -- internals ---------------------------------------------------------

    def _decode_head_impl(self, img_hw, params, f1, pos1, f2, pos2):
        if self.qlocal is None:
            res1, res2 = self.model.apply(
                params, f1, pos1, f2, pos2, img_hw,
                method=MASt3R.decode_and_head,
            )
            return self._pack(res1), self._pack(res2)
        # INT8 local-feature head: decode + DPT through the module, the
        # catMLP MLP through the quantized pure function (models/quant.py)
        from .models.mast3r import postprocess
        from .models.quant import local_features_int8

        d1, d2 = self.model.apply(
            params, f1, pos1, f2, pos2, method=MASt3R.decode
        )
        out = []
        for n, toks in ((1, d1), (2, d2)):
            dpt_out = self.model.apply(
                params, n, toks, img_hw, method=MASt3R.head_dpt
            )
            local_out = local_features_int8(
                self.qlocal[f"local{n}"], toks[0], toks[-1], img_hw,
                self.model.cfg,
            )
            out.append(postprocess(dpt_out, local_out, self.model.cfg))
        return self._pack(out[0]), self._pack(out[1])

    def _pack(self, res):
        """Stack head outputs to (B, h, w, ...) with optional downsample
        (mast3r_utils.py:69-78)."""
        ds = self.downsample
        X, C = res["pts3d"], res["conf"]
        D, Q = res["desc"], res["desc_conf"]
        if ds > 1:
            X = X[:, ::ds, ::ds]
            C = C[:, ::ds, ::ds]
            D = D[:, ::ds, ::ds]
            Q = Q[:, ::ds, ::ds]
        return X, C, D, Q

    # -- public API (reference parity) ------------------------------------

    def encode(self, img):
        """img (B, h, w, 3) -> (feat (B, N, C) fp32, pos (B, N, 2))."""
        return self._encode(self.params, img)

    def decode_pair(self, feat1, pos1, feat2, pos2):
        """One asymmetric two-view decode (reference decoder(),
        mast3r_utils.py:60-66). Returns ((X,C,D,Q) for view1, for view2)."""
        return self._decode_head(self.params, feat1, pos1, feat2, pos2)

    def inference_mono(self, feat, pos):
        """Self-pair decode (mast3r_utils.py:15-38). feat (1, N, C).
        Returns Xii (1, hw, 3), Cii (1, hw, 1)."""
        (X, C, _, _), _ = self.decode_pair(feat, pos, feat, pos)
        b = X.shape[0]
        return X.reshape(b, -1, 3), C.reshape(b, -1, 1)

    def match_asymmetric(self, frame_feat, frame_pos, kf_feat, kf_pos,
                         idx_i2j_init=None, params=None):
        """Asymmetric inference + dense match (mast3r_utils.py:220-242).

        Inputs are (1, N, C) cached encoder features.  Returns
        (idx_f2k (1, hw), valid_match (1, hw, 1), Xff, Cff, Qff, Xkf, Ckf,
        Qkf) with pointmaps flattened (1, hw, ...).  idx init None means
        identity (arange), matching the reference reset semantics.
        ``params`` overrides the engine params (backend-chip use)."""
        if idx_i2j_init is None:
            ds = self.downsample
            hw = (self.img_hw[0] // ds) * (self.img_hw[1] // ds)
            idx_i2j_init = jnp.broadcast_to(
                jnp.arange(hw, dtype=jnp.int32)[None],
                (frame_feat.shape[0], hw),
            )
        return self._match_asym(
            params if params is not None else self.params,
            frame_feat, frame_pos, kf_feat, kf_pos,
            idx_i2j_init,
        )

    def _match_asymmetric_impl(self, params, frame_feat, frame_pos, kf_feat,
                               kf_pos, idx_i2j_init):
        (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = self._decode_head(
            params, frame_feat, frame_pos, kf_feat, kf_pos
        )
        idx_i2j, valid_match_j = matching.match(
            Xii, Xji, Dii, Dji, idx_1_to_2_init=idx_i2j_init,
            cfg=self.match_cfg,
        )
        b = Xii.shape[0]
        flat3 = lambda A: A.reshape(b, -1, A.shape[-1])
        flat1 = lambda A: A.reshape(b, -1, 1)
        return (
            idx_i2j, valid_match_j,
            flat3(Xii), flat1(Cii), flat1(Qii),
            flat3(Xji), flat1(Cji), flat1(Qji),
        )

    def _match_asymmetric_desc_impl(self, params, frame_feat, frame_pos,
                                    kf_feat, kf_pos, idx_i2j_init):
        """_match_asymmetric_impl + the q8 descriptor tables as extra
        outputs (flattened (b, hw, f) int8).  Quantization moves OUTSIDE
        matching.match (which takes the int8 arrays via its pre-quantized
        bypass — bit-identical), so the export aliases buffers the matcher
        materializes anyway.  The tracker ships them in its reuse bundle;
        the pose-warped consecutive edge (global_opt) re-matches the
        reverse direction from canonical pointmaps + these descriptors
        with NO second decode."""
        (Xii, Cii, Dii, Qii), (Xji, Cji, Dji, Qji) = self._decode_head(
            params, frame_feat, frame_pos, kf_feat, kf_pos
        )
        b = Xii.shape[0]
        if self.match_cfg.desc_bits == 8 and self.match_cfg.radius > 0:
            D8f, D8k = matching._q8_pair(
                Dii, Dji.reshape(b, -1, Dji.shape[-1]),
                self.match_cfg.desc_prenorm,
            )
            Dii_m, Dji_m = D8f, D8k.reshape(Dji.shape)
            desc8 = (D8f.reshape(b, -1, D8f.shape[-1]), D8k)
        else:
            Dii_m, Dji_m = Dii, Dji
            desc8 = (None, None)
        idx_i2j, valid_match_j = matching.match(
            Xii, Xji, Dii_m, Dji_m, idx_1_to_2_init=idx_i2j_init,
            cfg=self.match_cfg,
        )
        flat3 = lambda A: A.reshape(b, -1, A.shape[-1])
        flat1 = lambda A: A.reshape(b, -1, 1)
        return (
            idx_i2j, valid_match_j,
            flat3(Xii), flat1(Cii), flat1(Qii),
            flat3(Xji), flat1(Cji), flat1(Qji),
            desc8[0], desc8[1],
        )

    def match_arrays_warp(self, X_arena, T_arena, i, j, D11_flat, D21_flat,
                          img_hw):
        """Decode-free pose-warped dense match for the consecutive edge
        (global_opt): keyframe i's canonical pointmap vs keyframe j's
        canonical points under the solved relative pose, with
        pre-quantized int8 descriptors.  The keyframe row slicing, Sim(3)
        rel/act and reshapes all run INSIDE one jit (eager ops on the
        relayed TPU are remote compiles — CLAUDE.md), with i/j as traced
        scalars so successive keyframe pairs reuse the executable.
        Returns (idx_i_to_j (1, hw), valid (1, hw, 1))."""
        h, w = img_hw
        if not hasattr(self, "_match_warp_jit"):
            import functools as _ft

            from .ops import lie_sim3 as sim3

            @_ft.partial(jax.jit, static_argnames=("h", "w"))
            def _warp(X_arena, T_arena, i, j, D11, D21, h, w):
                f = D11.shape[-1]
                X11 = X_arena[i].reshape(1, h, w, 3)
                T_ij = sim3.rel(T_arena[i], T_arena[j])
                X21 = sim3.act(T_ij, X_arena[j]).reshape(1, h, w, 3)
                return matching.match(
                    X11, X21, D11.reshape(1, h, w, f),
                    D21.reshape(1, h, w, f), cfg=self.match_cfg,
                    query_subsample=self.match_cfg.edge_query_subsample,
                )

            self._match_warp_jit = _warp
        return self._match_warp_jit(
            X_arena, T_arena, jnp.asarray(i, jnp.int32),
            jnp.asarray(j, jnp.int32), D11_flat, D21_flat, h=h, w=w,
        )

    def decode_symmetric_batch(self, feat_i, pos_i, feat_j, pos_j):
        """Both directions of E edges in one 2E-batch decode
        (replaces the reference per-edge loop, mast3r_utils.py:113-147).

        feat_i/j: (E, N, C).  Returns X, C, D, Q each (4, E, h, w, ...),
        ordered [ii, ji, jj, ij] like the reference."""
        return self._decode_symmetric_batch_impl(
            self.params, feat_i, pos_i, feat_j, pos_j
        )

    def _decode_symmetric_batch_impl(self, params, feat_i, pos_i, feat_j,
                                     pos_j):
        E = feat_i.shape[0]
        if E == 1:
            f1 = jnp.concatenate([feat_i, feat_j], axis=0)
            p1 = jnp.concatenate([pos_i, pos_j], axis=0)
            f2 = jnp.concatenate([feat_j, feat_i], axis=0)
            p2 = jnp.concatenate([pos_j, pos_i], axis=0)
            (X1, C1, D1, Q1), (X2, C2, D2, Q2) = self._decode_head(
                params, f1, p1, f2, p2
            )

            def quad(A1, A2):
                # A1 = [res11; res22], A2 = [res21; res12]
                return jnp.stack([A1[:E], A2[:E], A1[E:], A2[E:]], axis=0)

            return quad(X1, X2), quad(C1, C2), quad(D1, D2), quad(Q1, Q2)

        # E > 1: scan one edge (one B=2 two-view forward) at a time.  A
        # single 2E-batch forward IS fewer dispatches, but at production
        # resolution the DPT head's activations at B=4+ spill HBM —
        # measured 118 ms for E=2 vs 51 ms for E=1 (2.3x, superlinear).
        # lax.map keeps peak memory at the E=1 working set and the cost
        # linear in E — the TPU form of the reference's per-edge decode
        # loop (mast3r_utils.py:113-147).
        def one(args):
            fi, pi, fj, pj = args
            f1 = jnp.stack([fi, fj])
            p1 = jnp.stack([pi, pj])
            f2 = jnp.stack([fj, fi])
            p2 = jnp.stack([pj, pi])
            (X1, C1, D1, Q1), (X2, C2, D2, Q2) = self._decode_head(
                params, f1, p1, f2, p2
            )

            def quad(A1, A2):
                # [ii, ji, jj, ij] for this edge
                return jnp.stack([A1[0], A2[0], A1[1], A2[1]], axis=0)

            return (quad(X1, X2), quad(C1, C2), quad(D1, D2),
                    quad(Q1, Q2))

        X, C, D, Q = jax.lax.map(one, (feat_i, pos_i, feat_j, pos_j))
        # (E, 4, ...) -> (4, E, ...)
        mv = lambda A: jnp.moveaxis(A, 0, 1)
        return mv(X), mv(C), mv(D), mv(Q)

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, params=None):
        """Symmetric decode + two-directional match
        (mast3r_utils.py:149-187).  ``params`` overrides the engine params
        — used by the two-device frontend/backend split to run the backend
        decode on its own chip's weight copy (pipeline.py)."""
        return self._match_sym(params if params is not None else self.params,
                               feat_i, pos_i, feat_j, pos_j)

    def _match_symmetric_impl(self, params, feat_i, pos_i, feat_j, pos_j):
        X, C, D, Q = self._decode_symmetric_batch_impl(
            params, feat_i, pos_i, feat_j, pos_j
        )
        Xii, Xji, Xjj, Xij = X[0], X[1], X[2], X[3]
        Dii, Dji, Djj, Dij = D[0], D[1], D[2], D[3]
        Qii, Qji, Qjj, Qij = Q[0], Q[1], Q[2], Q[3]

        X11 = jnp.concatenate([Xii, Xjj], axis=0)
        X21 = jnp.concatenate([Xji, Xij], axis=0)
        D11 = jnp.concatenate([Dii, Djj], axis=0)
        D21 = jnp.concatenate([Dji, Dij], axis=0)

        # factor-graph edges feed only the BA residual subset + the
        # match-fraction gate -> the edge query subgrid applies
        # (MatchingConfig.edge_query_subsample; global_opt scatters the
        # subgrid outputs back into the full-size edge arrays)
        idx_1_to_2, valid_match_2 = matching.match(
            X11, X21, D11, D21, cfg=self.match_cfg,
            query_subsample=self.match_cfg.edge_query_subsample,
        )
        E = Xii.shape[0]
        b = E
        flat1 = lambda A: A.reshape(b, -1, 1)
        return (
            idx_1_to_2[:E], idx_1_to_2[E:],
            valid_match_2[:E], valid_match_2[E:],
            flat1(Qii), flat1(Qjj), flat1(Qji), flat1(Qij),
        )


# ---------------------------------------------------------------------------
# Image resize to network input shape (host-side, numpy)
# ---------------------------------------------------------------------------

IMGNORM_MEAN = np.array([0.5, 0.5, 0.5], dtype=np.float32)
IMGNORM_STD = np.array([0.5, 0.5, 0.5], dtype=np.float32)


def resize_img(img: np.ndarray, size: int = 512, square_ok: bool = False,
               return_transformation: bool = False):
    """Resize long side to ``size`` and center-crop H, W to multiples of 16
    (reference resize_img, mast3r_utils.py:245-289; 224 square mode
    included).  img: (H, W, 3) float in [0, 1].

    Returns dict(img (1,h,w,3) normalized, true_shape (1,2) [h,w],
    unnormalized_img (h,w,3) float [0,1]).
    """
    from PIL import Image

    assert size in (224, 512)
    if img.dtype == np.uint8:
        # fast path: no float->uint8 round trip (bit-identical result —
        # the float path quantizes through the same uint8 image)
        pil = Image.fromarray(img)
    else:
        pil = Image.fromarray(np.uint8(np.clip(img, 0, 1) * 255))
    W1, H1 = pil.size

    def _resize_long(p, long_edge):
        S = max(p.size)
        interp = Image.LANCZOS if S > long_edge else Image.BICUBIC
        new_size = tuple(int(round(x * long_edge / S)) for x in p.size)
        return p.resize(new_size, interp)

    if size == 224:
        pil = _resize_long(pil, round(size * max(W1 / H1, H1 / W1)))
        W, H = pil.size
        cx, cy = W // 2, H // 2
        half = min(cx, cy)
        pil = pil.crop((cx - half, cy - half, cx + half, cy + half))
    else:
        pil = _resize_long(pil, size)
        W, H = pil.size
        cx, cy = W // 2, H // 2
        halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
        if not square_ok and W == H:
            halfh = int(3 * halfw / 4)
        pil = pil.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    arr8 = np.asarray(pil)
    arr = arr8.astype(np.float32) * (1.0 / 255.0)
    # (x/255 - 0.5)/0.5 == x/127.5 - 1 exactly; one fused pass instead of
    # divide + subtract + divide (ImgNorm with mean=std=0.5)
    normed = arr8.astype(np.float32) * (1.0 / 127.5) - 1.0
    res = {
        "img": normed[None],
        "true_shape": np.int32([pil.size[::-1]]),
        "unnormalized_img": arr,
        "unnormalized_img_u8": arr8,   # uint8 view for the slim arena
    }
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pil.size[0]) / 2
        half_crop_h = (H - pil.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res
