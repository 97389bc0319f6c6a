"""Torch-checkpoint -> Flax parameter conversion for MASt3R.

Maps the published `MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth`
state dict (layout documented in
`/root/reference/thirdparty/mast3r/dust3r/dust3r/model.py` /
`croco/models/blocks.py` / `croco/models/dpt_block.py` /
`mast3r/catmlp_dpt_head.py`) onto the TPU model in `mast3r.py`.

Handles the reference loader's quirks (dust3r/model.py:90-97): if the
checkpoint has no ``dec_blocks2`` weights, the first decoder's are
duplicated.

Layout conventions converted:
* Linear (O, I) -> Dense kernel (I, O)
* Conv2d (O, I, kh, kw) -> Conv kernel (kh, kw, I, O)
* patch-embed strided conv -> space-to-depth matmul kernel (p*p*C, O) with
  input index order (a, b, c) [row, col, channel]
* ConvTranspose2d k==s (I, O, s, s) -> Dense kernel (I, s*s*O) with output
  index order (a, b, o)
"""

from __future__ import annotations

import numpy as np


def _t(w):
    """torch tensor / numpy -> numpy float32."""
    if hasattr(w, "detach"):
        w = w.detach().cpu().numpy()
    return np.asarray(w, dtype=np.float32)


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T,
            "bias": _t(sd[f"{name}.bias"])}


def _conv(sd, name, bias=True):
    out = {"kernel": _t(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if bias:
        out["bias"] = _t(sd[f"{name}.bias"])
    return out


def _norm(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


def _patch_proj(sd, name):
    W = _t(sd[f"{name}.weight"])  # (O, C, p, p)
    O, C, p, _ = W.shape
    kernel = W.transpose(2, 3, 1, 0).reshape(p * p * C, O)
    return {"kernel": kernel, "bias": _t(sd[f"{name}.bias"])}


def _convtranspose_as_dense(sd, name):
    W = _t(sd[f"{name}.weight"])  # (I, O, s, s)
    I, O, s, _ = W.shape
    kernel = W.transpose(0, 2, 3, 1).reshape(I, s * s * O)
    bias = np.tile(_t(sd[f"{name}.bias"])[None, :], (s * s, 1)).reshape(-1)
    return {"kernel": kernel, "bias": bias}


def _mlp(sd, name):
    return {"fc1": _linear(sd, f"{name}.fc1"),
            "fc2": _linear(sd, f"{name}.fc2")}


def _enc_block(sd, name):
    return {
        "norm1": _norm(sd, f"{name}.norm1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{name}.attn.qkv"),
            "proj": _linear(sd, f"{name}.attn.proj"),
        },
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _dec_block(sd, name):
    return {
        "norm1": _norm(sd, f"{name}.norm1"),
        "norm2": _norm(sd, f"{name}.norm2"),
        "norm3": _norm(sd, f"{name}.norm3"),
        "norm_y": _norm(sd, f"{name}.norm_y"),
        "attn": {
            "qkv": _linear(sd, f"{name}.attn.qkv"),
            "proj": _linear(sd, f"{name}.attn.proj"),
        },
        "cross_attn": {
            "projq": _linear(sd, f"{name}.cross_attn.projq"),
            "projk": _linear(sd, f"{name}.cross_attn.projk"),
            "projv": _linear(sd, f"{name}.cross_attn.projv"),
            "proj": _linear(sd, f"{name}.cross_attn.proj"),
        },
        "mlp": _mlp(sd, f"{name}.mlp"),
    }


def _dpt(sd, prefix):
    """downstream_headN.dpt.* -> DPTHead params."""
    out = {}
    # act_postprocess stages
    out["act_0"] = {
        "project": _conv(sd, f"{prefix}.act_postprocess.0.0"),
        "up": _convtranspose_as_dense(sd, f"{prefix}.act_postprocess.0.1"),
    }
    out["act_1"] = {
        "project": _conv(sd, f"{prefix}.act_postprocess.1.0"),
        "up": _convtranspose_as_dense(sd, f"{prefix}.act_postprocess.1.1"),
    }
    out["act_2"] = {"project": _conv(sd, f"{prefix}.act_postprocess.2.0")}
    out["act_3"] = {
        "project": _conv(sd, f"{prefix}.act_postprocess.3.0"),
        "down": _conv(sd, f"{prefix}.act_postprocess.3.1"),
    }
    for i in range(4):
        out[f"layer{i + 1}_rn"] = _conv(
            sd, f"{prefix}.scratch.layer{i + 1}_rn", bias=False
        )
        # make_scratch registers the same conv modules a second time under
        # a `scratch.layer_rn` ModuleList (dpt_block.py:70), so a
        # state_dict() of the real architecture carries duplicate alias
        # keys.  Consume them (and verify they really are aliases) so
        # strict accounting passes on real checkpoints.
        alias = f"{prefix}.scratch.layer_rn.{i}.weight"
        if alias in sd:
            a = _t(sd[alias])
            if not np.array_equal(a, _t(sd[f"{prefix}.scratch.layer{i + 1}_rn.weight"])):
                raise ValueError(f"{alias} is not an alias of layer{i + 1}_rn")
    for k in range(1, 5):
        rn = f"{prefix}.scratch.refinenet{k}"
        out[f"refinenet{k}"] = {
            "resConfUnit2": {
                "conv1": _conv(sd, f"{rn}.resConfUnit2.conv1"),
                "conv2": _conv(sd, f"{rn}.resConfUnit2.conv2"),
            },
            "out_conv": _conv(sd, f"{rn}.out_conv"),
        }
        rcu1 = {
            "conv1": _conv(sd, f"{rn}.resConfUnit1.conv1"),
            "conv2": _conv(sd, f"{rn}.resConfUnit1.conv2"),
        }
        if k < 4:
            out[f"refinenet{k}"]["resConfUnit1"] = rcu1
        # refinenet4 receives no skip input, so its resConfUnit1 weights
        # exist in the checkpoint but are dead in the reference as well
        # (dpt_block.py FeatureFusionBlock with a single input); consume
        # them for strict accounting, emit nothing.
    out["head_conv1"] = _conv(sd, f"{prefix}.head.0")
    out["head_conv2"] = _conv(sd, f"{prefix}.head.2")
    out["head_conv3"] = _conv(sd, f"{prefix}.head.4")
    return out


class _TrackingDict(dict):
    """Dict recording which keys were read — powers the strict converter's
    'every checkpoint tensor consumed' assertion."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# Checkpoint tensors that exist but are not used at inference (the reference
# loads with strict=False, dust3r/model.py:41, and these stay unused there
# too): the CroCo pretraining mask token and absolute pos embeddings (None
# for RoPE models but tolerated if present).
ALLOWED_UNUSED = ("mask_token", "enc_pos_embed", "dec_pos_embed")


def convert_state_dict(sd: dict, enc_depth: int, dec_depth: int,
                       strict: bool = False,
                       allowed_unused=ALLOWED_UNUSED) -> dict:
    """Torch state dict -> flax params dict {'params': ...} for MASt3R.

    ``strict=True`` raises if any checkpoint key is neither consumed by the
    conversion nor in ``allowed_unused`` — a silently dropped tensor
    (renamed key, architecture drift) fails loudly instead of producing a
    subtly wrong model.  Pair with :func:`assert_params_cover` for the
    other direction (every model parameter initialized from the ckpt)."""
    # dec_blocks2 duplication rule (dust3r/model.py:90-97)
    sd = _TrackingDict(sd)
    if not any(k.startswith("dec_blocks2") for k in sd):
        for k in list(sd):
            if k.startswith("dec_blocks."):
                k2 = k.replace("dec_blocks.", "dec_blocks2.")
                dict.__setitem__(sd, k2, dict.__getitem__(sd, k))

    params = {
        "patch_embed": {"proj": _patch_proj(sd, "patch_embed.proj")},
        "enc_norm": _norm(sd, "enc_norm"),
        "decoder_embed": _linear(sd, "decoder_embed"),
        "dec_norm": _norm(sd, "dec_norm"),
    }
    for i in range(enc_depth):
        params[f"enc_block_{i}"] = _enc_block(sd, f"enc_blocks.{i}")
    for i in range(dec_depth):
        params[f"dec_block_{i}"] = _dec_block(sd, f"dec_blocks.{i}")
        params[f"dec_block2_{i}"] = _dec_block(sd, f"dec_blocks2.{i}")
    for n in (1, 2):
        params[f"dpt{n}"] = _dpt(sd, f"downstream_head{n}.dpt")
        params[f"local{n}"] = {
            "head_local_features": _mlp(
                sd, f"downstream_head{n}.head_local_features"
            )
        }

    if strict:
        unconsumed = sorted(
            k for k in sd
            if k not in sd.consumed
            and not any(k == a or k.startswith(a + ".")
                        for a in allowed_unused)
        )
        if unconsumed:
            raise ValueError(
                f"strict conversion: {len(unconsumed)} checkpoint keys were "
                f"not consumed (first 20): {unconsumed[:20]}"
            )
    return {"params": params}


def _tree_paths(tree, prefix=""):
    """Flatten a nested params dict into {'a/b/c': leaf}."""
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_tree_paths(v, p))
        else:
            out[p] = v
    return out


def assert_params_cover(converted: dict, model, img_hw) -> None:
    """Assert the converted params initialize EVERY parameter of ``model``
    with matching shapes (the other half of strict loading: no Flax param
    silently left at random init).  Uses jax.eval_shape so no compute or
    memory is spent on the ViT-L init."""
    import jax
    import jax.numpy as jnp

    h, w = img_hw
    img = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
    expected = jax.eval_shape(model.init, jax.random.PRNGKey(0), img, img)
    exp = _tree_paths(expected["params"], "params")
    got = _tree_paths(converted["params"], "params")
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    if missing or extra:
        raise ValueError(
            f"param tree mismatch: missing {missing[:10]} "
            f"(+{max(0, len(missing) - 10)} more), extra {extra[:10]} "
            f"(+{max(0, len(extra) - 10)} more)"
        )
    bad = [
        (k, tuple(got[k].shape), tuple(exp[k].shape))
        for k in exp
        if tuple(got[k].shape) != tuple(exp[k].shape)
    ]
    if bad:
        raise ValueError(f"param shape mismatches: {bad[:10]}")


def load_torch_checkpoint(path: str):
    """Load a torch checkpoint file and return (state_dict, model_args_str).

    The reference instantiates the model by eval()ing the checkpoint's args
    string (dust3r/model.py:27-43); here we only parse the few hyperparams
    we need out of it.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    args = getattr(ckpt.get("args", None), "model", "")
    return sd, args
