"""MASt3R-style two-view pointmap/descriptor network in Flax, TPU-first.

Capability parity with the reference network stack (AsymmetricMASt3R =
CroCo ViT encoder + dual cross-attention decoder + DPT pts3d head + catMLP
local-feature head; see `/root/reference/thirdparty/mast3r/mast3r/model.py`,
`dust3r/dust3r/model.py`, `croco/models/blocks.py`,
`mast3r/catmlp_dpt_head.py`, `croco/models/dpt_block.py`), redesigned for
TPU:

* channels-last (NHWC) everywhere;
* patch embed / transposed convs expressed as space-to-depth + matmul
  (pure MXU work, no strided conv lowering);
* RoPE as fused VPU ops (`rope.py`) instead of the CUDA curope kernel;
* bf16 activations in the transformer trunk with an fp32 head (mirrors the
  reference running the DPT head with autocast disabled,
  `mast3r_utils.py:63-65`);
* attention via `jax.nn.dot_product_attention` so XLA picks the fused
  flash path; a Pallas kernel can be slotted in via ``attention_impl``.

The flagship configuration (`MASt3RConfig.vit_large()`) matches the
published `MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric` checkpoint
layout so that weights convert 1:1 (`convert.py`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .rope import rope_2d


@dataclasses.dataclass(frozen=True)
class MASt3RConfig:
    patch_size: int = 16
    enc_embed_dim: int = 1024
    enc_depth: int = 24
    enc_num_heads: int = 16
    dec_embed_dim: int = 768
    dec_depth: int = 12
    dec_num_heads: int = 12
    mlp_ratio: int = 4
    rope_freq: float = 100.0
    # Head
    local_feat_dim: int = 24
    two_confs: bool = True
    feature_dim: int = 256
    last_dim: int = 128
    layer_dims: Sequence[int] = (96, 192, 384, 768)
    conf_vmin: float = 1.0       # conf_mode ('exp', 1, inf)
    desc_conf_vmin: float = 0.0  # desc_conf_mode ('exp', 0, inf)
    dtype: Any = jnp.bfloat16    # trunk compute dtype
    # Head (DPT + catMLP) compute dtype.  float32 reproduces the reference
    # autocast policy (fp32 heads, mast3r_utils.py:63-65) and is what the
    # torch-parity tests check.  bfloat16 halves the head's HBM traffic and
    # conv I/O (the heads are ~11 ms of the 384x512 frame vs ~3 ms for the
    # whole decoder trunk) with fp32 accumulation and fp32 postprocess;
    # acceptance-tested against the fp32 head (cosine similarity, like the
    # fork's own INT8-encoder methodology).  Params stay fp32 either way.
    head_dtype: Any = jnp.float32

    @property
    def hooks(self):
        # DPT hooks into [enc_out, dec_1..dec_depth]
        # (reference catmlp_dpt_head.py:115: [0, 2d/4, 3d/4, d])
        d = self.dec_depth
        return (0, d * 2 // 4, d * 3 // 4, d)

    @classmethod
    def vit_large(cls, **kw):
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw):
        """Small random-weight fixture for pipeline tests without a
        checkpoint (the reference offers nothing comparable)."""
        defaults = dict(
            enc_embed_dim=64, enc_depth=2, enc_num_heads=2,
            dec_embed_dim=48, dec_depth=4, dec_num_heads=2,
            feature_dim=32, last_dim=16, layer_dims=(16, 24, 32, 48),
            dtype=jnp.float32,
        )
        defaults.update(kw)
        return cls(**defaults)


# ---------------------------------------------------------------------------
# Transformer trunk
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


def _attention(q, k, v, dtype):
    """Scaled-dot-product attention. q,k,v: (B, H, N, Dh) -> (B, H, N, Dh).

    Default is XLA's fused lowering: at this model's 768 tokens it MEASURES
    FASTER on v5e than the whole-head-in-VMEM Pallas kernel in
    ops/attention.py (enc 5.1 vs 9.0 ms, dec 7.1 vs 9.1 ms — the Pallas
    grid serializes per (batch, head) and leaves MXU lanes idle on the
    Dh=64 output, while XLA pipelines the score/AV matmuls across heads).
    MAST3R_ATTENTION=pallas selects the kernel for future tuning/longer
    sequences."""
    impl = os.environ.get("MAST3R_ATTENTION", "xla")
    if impl == "pallas":
        from ..ops.attention import flash_attention

        return flash_attention(
            q.astype(dtype), k.astype(dtype), v.astype(dtype)
        )
    # jax.nn.dot_product_attention expects (B, N, H, Dh)
    out = jax.nn.dot_product_attention(
        q.swapaxes(1, 2).astype(dtype),
        k.swapaxes(1, 2).astype(dtype),
        v.swapaxes(1, 2).astype(dtype),
    )
    return out.swapaxes(1, 2)


class SelfAttention(nn.Module):
    """RoPE self-attention (reference blocks.py:83-114)."""
    dim: int
    num_heads: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        B, N, C = x.shape
        Dh = C // self.num_heads
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, Dh)
        q, k, v = [jnp.moveaxis(qkv[:, :, i], 2, 1) for i in range(3)]
        q = rope_2d(q, xpos, self.rope_freq)
        k = rope_2d(k, xpos, self.rope_freq)
        out = _attention(q, k, v, self.dtype)
        out = out.swapaxes(1, 2).reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    """RoPE cross-attention (reference blocks.py:136-174)."""
    dim: int
    num_heads: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, query, key, value, qpos, kpos):
        B, Nq, C = query.shape
        Dh = C // self.num_heads

        def heads(t, name):
            t = nn.Dense(C, dtype=self.dtype, name=name)(t)
            return t.reshape(B, -1, self.num_heads, Dh).swapaxes(1, 2)

        q = heads(query, "projq")
        k = heads(key, "projk")
        v = heads(value, "projv")
        q = rope_2d(q, qpos, self.rope_freq)
        k = rope_2d(k, kpos, self.rope_freq)
        out = _attention(q, k, v, self.dtype)
        out = out.swapaxes(1, 2).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class EncoderBlock(nn.Module):
    """Pre-norm ViT block (reference blocks.py:116-134)."""
    dim: int
    num_heads: int
    mlp_ratio: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, xpos):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + SelfAttention(self.dim, self.num_heads, self.rope_freq,
                              self.dtype, name="attn")(h, xpos)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, self.dtype,
                    name="mlp")(h)
        return x


class DecoderBlock(nn.Module):
    """Self + cross + mlp block (reference blocks.py:175-198)."""
    dim: int
    num_heads: int
    mlp_ratio: int
    rope_freq: float
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y, xpos, ypos):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x + SelfAttention(self.dim, self.num_heads, self.rope_freq,
                              self.dtype, name="attn")(h, xpos)
        y_ = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm_y")(y)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(self.dim, self.num_heads, self.rope_freq,
                               self.dtype, name="cross_attn")(h, y_, y_, xpos, ypos)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm3")(x)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, self.dtype,
                    name="mlp")(h)
        return x


class PatchEmbed(nn.Module):
    """16x16 patchify as space-to-depth + matmul (MXU-friendly; equivalent to
    the reference strided conv, blocks.py:216-244)."""
    patch_size: int
    embed_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img):
        # img: (B, H, W, 3) -> tokens (B, N, C), pos (B, N, 2) int (y, x)
        B, H, W, C = img.shape
        p = self.patch_size
        nh, nw = H // p, W // p
        x = img.reshape(B, nh, p, nw, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, nh * nw, p * p * C)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj")(x)
        yy, xx = jnp.meshgrid(jnp.arange(nh), jnp.arange(nw), indexing="ij")
        pos = jnp.stack([yy, xx], axis=-1).reshape(1, nh * nw, 2)
        pos = jnp.broadcast_to(pos, (B, nh * nw, 2))
        return x, pos


# ---------------------------------------------------------------------------
# DPT pyramid head (fp32)
# ---------------------------------------------------------------------------

def bilinear_resize_align_corners(x, out_h, out_w):
    """Bilinear resize with torch align_corners=True semantics, channels-last.

    Separable gathers along each axis — exact parity with F.interpolate(...,
    align_corners=True) used throughout the reference DPT head."""
    B, H, W, C = x.shape

    def axis_resize(arr, in_size, out_size, axis):
        if out_size == in_size:
            return arr
        if in_size == 1:
            reps = [1] * arr.ndim
            reps[axis] = out_size
            return jnp.tile(arr, reps)
        coords = jnp.arange(out_size) * (in_size - 1) / (out_size - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = (coords - lo).astype(x.dtype)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        frac = frac.reshape(shape)
        a = jnp.take(arr, lo, axis=axis)
        b = jnp.take(arr, hi, axis=axis)
        return a * (1 - frac) + b * frac

    x = axis_resize(x, H, out_h, 1)
    x = axis_resize(x, W, out_w, 2)
    return x


class ResidualConvUnit(nn.Module):
    """relu-conv-relu-conv residual (reference dpt_block.py:79-142)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return x + h


class FeatureFusionBlock(nn.Module):
    """DPT refinenet (reference dpt_block.py:144-218): optional skip through
    rcu1, then rcu2, 2x bilinear (align_corners) upsample, 1x1 out conv."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, self.dtype,
                                     name="resConfUnit1")(skip)
        x = ResidualConvUnit(self.features, self.dtype,
                             name="resConfUnit2")(x)
        B, H, W, C = x.shape
        x = bilinear_resize_align_corners(x, 2 * H, 2 * W)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class TokensToImage(nn.Module):
    """act_postprocess stage: 1x1 channel projection + resolution change.

    Upsampling (stride>1 transposed conv with k == s) is expressed as
    matmul + depth-to-space; downsampling stage 4 keeps the reference's
    3x3 stride-2 conv (reference dpt_block.py:341-410)."""
    out_dim: int
    scale: int  # 4, 2, 1, or -2 (meaning stride-2 down)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, nh, nw, C)
        x = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype,
                    name="project")(x)
        if self.scale > 1:
            s = self.scale
            B, H, W, C = x.shape
            x = nn.Dense(C * s * s, dtype=self.dtype,
                         name="up")(x)  # == ConvTranspose k=s,p=0
            x = x.reshape(B, H, W, s, s, C)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * s, W * s, C)
        elif self.scale == -2:
            x = nn.Conv(self.out_dim, (3, 3), strides=2, padding=1,
                        dtype=self.dtype, name="down")(x)
        return x


class DPTHead(nn.Module):
    """DPT regression head producing (B, H, W, num_channels) at full image
    resolution from 4 hooked token layers (reference dpt_head.py +
    dpt_block.py, num_channels = 3 pts + 1 conf)."""
    cfg: MASt3RConfig
    num_channels: int = 4

    @nn.compact
    def __call__(self, hooked, img_hw):
        # hooked: 4 token arrays (B, N, C_i) at hooks; img_hw static (H, W)
        H, W = img_hw
        p = self.cfg.patch_size
        nh, nw = H // p, W // p
        hd = self.cfg.head_dtype
        feats = []
        scales = (4, 2, 1, -2)
        for i, (tok, ld, sc) in enumerate(
            zip(hooked, self.cfg.layer_dims, scales)
        ):
            x = tok.reshape(tok.shape[0], nh, nw, tok.shape[-1])
            x = TokensToImage(ld, sc, hd, name=f"act_{i}")(x)
            x = nn.Conv(self.cfg.feature_dim, (3, 3), padding=1,
                        use_bias=False, dtype=hd,
                        name=f"layer{i + 1}_rn")(x)
            feats.append(x)

        path = FeatureFusionBlock(self.cfg.feature_dim, hd,
                                  name="refinenet4")(feats[3])
        path = path[:, : feats[2].shape[1], : feats[2].shape[2]]
        path = FeatureFusionBlock(self.cfg.feature_dim, hd,
                                  name="refinenet3")(path, feats[2])
        path = FeatureFusionBlock(self.cfg.feature_dim, hd,
                                  name="refinenet2")(path, feats[1])
        path = FeatureFusionBlock(self.cfg.feature_dim, hd,
                                  name="refinenet1")(path, feats[0])

        x = nn.Conv(self.cfg.feature_dim // 2, (3, 3), padding=1, dtype=hd,
                    name="head_conv1")(path)
        B, h2, w2, _ = x.shape
        x = bilinear_resize_align_corners(x, 2 * h2, 2 * w2)
        x = nn.Conv(self.cfg.last_dim, (3, 3), padding=1, dtype=hd,
                    name="head_conv2")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_channels, (1, 1), dtype=hd,
                    name="head_conv3")(x)
        # postprocess (exp-norm / conf mapping) always runs fp32
        return x.astype(jnp.float32)  # (B, H, W, num_channels)


class LocalFeaturesHead(nn.Module):
    """catMLP local-feature head: MLP on cat(enc, dec) tokens + pixel shuffle
    (reference catmlp_dpt_head.py:42-96)."""
    cfg: MASt3RConfig

    @nn.compact
    def __call__(self, enc_tok, dec_tok, img_hw):
        H, W = img_hw
        p = self.cfg.patch_size
        nh, nw = H // p, W // p
        nch = self.cfg.local_feat_dim + int(self.cfg.two_confs)
        x = jnp.concatenate([enc_tok, dec_tok], axis=-1)
        idim = x.shape[-1]
        x = Mlp(int(4.0 * idim), nch * p * p, dtype=self.cfg.head_dtype,
                name="head_local_features")(x)
        x = x.astype(jnp.float32)  # postprocess (L2-norm, exp) stays fp32
        # torch pixel_shuffle channel layout: c * p^2 + a * p + b
        B = x.shape[0]
        x = x.reshape(B, nh, nw, nch, p, p)
        x = x.transpose(0, 1, 4, 2, 5, 3).reshape(B, H, W, nch)
        return x


def postprocess(dpt_out, local_out, cfg: MASt3RConfig):
    """Activation mapping (reference catmlp_dpt_head.py:25-39 +
    dust3r/heads/postprocess.py:22-57): exp-norm depth, 1+exp conf,
    L2-normalized descriptors, exp desc-conf."""
    xyz = dpt_out[..., 0:3]
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    pts3d = xyz / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    conf = cfg.conf_vmin + jnp.exp(dpt_out[..., 3])

    desc = local_out[..., : cfg.local_feat_dim]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8
    )
    if cfg.two_confs:
        desc_conf = cfg.desc_conf_vmin + jnp.exp(
            local_out[..., cfg.local_feat_dim]
        )
    else:
        desc_conf = conf
    return {
        "pts3d": pts3d,
        "conf": conf,
        "desc": desc,
        "desc_conf": desc_conf,
    }


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class MASt3R(nn.Module):
    """Two-view pointmap/descriptor network.

    Methods mirror the reference inference API surface used by the SLAM
    layer (`dust3r/model.py:127-196`): ``encode`` (= _encode_image),
    ``decode`` (= _decoder), ``head`` (= _downstream_head), plus a combined
    ``two_view`` convenience.
    """

    cfg: MASt3RConfig

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed(c.patch_size, c.enc_embed_dim, c.dtype)
        self.enc_blocks = [
            EncoderBlock(c.enc_embed_dim, c.enc_num_heads, c.mlp_ratio,
                         c.rope_freq, c.dtype, name=f"enc_block_{i}")
            for i in range(c.enc_depth)
        ]
        self.enc_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        self.decoder_embed = nn.Dense(c.dec_embed_dim, dtype=c.dtype)
        self.dec_blocks = [
            DecoderBlock(c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio,
                         c.rope_freq, c.dtype, name=f"dec_block_{i}")
            for i in range(c.dec_depth)
        ]
        self.dec_blocks2 = [
            DecoderBlock(c.dec_embed_dim, c.dec_num_heads, c.mlp_ratio,
                         c.rope_freq, c.dtype, name=f"dec_block2_{i}")
            for i in range(c.dec_depth)
        ]
        self.dec_norm = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
        # Two independent heads (view 1 / view 2), as in the reference
        self.dpt1 = DPTHead(c, name="dpt1")
        self.dpt2 = DPTHead(c, name="dpt2")
        self.local1 = LocalFeaturesHead(c, name="local1")
        self.local2 = LocalFeaturesHead(c, name="local2")

    def encode(self, img):
        """img (B, H, W, 3) normalized -> (feat (B, N, C) fp32, pos)."""
        x, pos = self.patch_embed(img)
        for blk in self.enc_blocks:
            x = blk(x, pos)
        return self.enc_norm(x).astype(jnp.float32), pos

    def decode(self, f1, pos1, f2, pos2):
        """Dual-branch decoder; returns per-layer token lists for both views
        (reference _decoder, dust3r/model.py:171-190): 13 entries each, [0]
        being the encoder output."""
        out1 = [f1]
        out2 = [f2]
        x1 = self.decoder_embed(f1)
        x2 = self.decoder_embed(f2)
        for blk1, blk2 in zip(self.dec_blocks, self.dec_blocks2):
            x1_new = blk1(x1, x2, pos1, pos2)
            x2_new = blk2(x2, x1, pos2, pos1)
            x1, x2 = x1_new, x2_new
            out1.append(x1)
            out2.append(x2)
        out1[-1] = self.dec_norm(out1[-1]).astype(jnp.float32)
        out2[-1] = self.dec_norm(out2[-1]).astype(jnp.float32)
        return out1, out2

    def head_dpt(self, head_num, tokens, img_hw):
        """DPT half of the downstream head: raw (B, H, W, 4) xyz+conf map
        (split out so the quantized local-feature path, quant.py, can pair
        with it outside the module)."""
        hooked = [
            tokens[h].astype(jnp.float32) for h in self.cfg.hooks
        ]
        dpt = self.dpt1 if head_num == 1 else self.dpt2
        return dpt(hooked, img_hw)

    def head(self, head_num, tokens, img_hw):
        """fp32 downstream head on hooked token layers."""
        dpt_out = self.head_dpt(head_num, tokens, img_hw)
        loc = self.local1 if head_num == 1 else self.local2
        local_out = loc(
            tokens[0].astype(jnp.float32),
            tokens[-1].astype(jnp.float32),
            img_hw,
        )
        return postprocess(dpt_out, local_out, self.cfg)

    def decode_and_head(self, f1, pos1, f2, pos2, img_hw):
        """Decoder + both heads (the per-pair unit of work in tracking and
        factor-graph construction)."""
        d1, d2 = self.decode(f1, pos1, f2, pos2)
        return self.head(1, d1, img_hw), self.head(2, d2, img_hw)

    def __call__(self, img1, img2):
        """Full two-view forward (init-time shape/param construction)."""
        f1, pos1 = self.encode(img1)
        f2, pos2 = self.encode(img2)
        img_hw = (img1.shape[1], img1.shape[2])
        return self.decode_and_head(f1, pos1, f2, pos2, img_hw)


def cast_trunk_params_bf16(params, head_bf16=False):
    """Store the trunk's weights in bf16 (inference-time optimization).

    Every Dense inside the encoder/decoder blocks, the patch embed and the
    decoder_embed computes in bf16 (``dtype=cfg.dtype``), so Flax casts
    their fp32 params to bf16 at every use anyway — storing them bf16 is
    numerically IDENTICAL while halving the ~2 GB of weight reads the ViT-L
    trunk issues per frame (HBM-bound: ~1.3 ms/frame on v5e).  LayerNorm
    params (fp32 compute) are left untouched.

    ``head_bf16``: when the model runs with head_dtype=bfloat16, the
    DPT/catMLP head weights (~117 M params — the catMLP MLPs dominate) are
    likewise cast at every use, so storing them bf16 is identical while
    halving ~470 MB/frame of head weight reads.  Keep False for the exact
    fp32-head reference policy (mast3r_utils.py:63-65).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    inner = params["params"] if "params" in params else params
    flat = flatten_dict(inner)
    out = {}
    for path, v in flat.items():
        top = str(path[0])
        is_trunk_block = top.startswith("enc_block_") or \
            top.startswith("dec_block")
        is_norm = len(path) > 1 and str(path[1]).startswith("norm")
        is_head = top in ("dpt1", "dpt2", "local1", "local2")
        if (is_trunk_block and not is_norm) or \
                top in ("decoder_embed", "patch_embed") or \
                (head_bf16 and is_head):
            v = v.astype(jnp.bfloat16)
        out[path] = v
    out = unflatten_dict(out)
    return {"params": out} if "params" in params else out
