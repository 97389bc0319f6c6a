"""Numeric parity of the weight converter + flax model against a
torch-functional reference forward built directly from a (synthetic)
checkpoint state dict.

This validates checkpoint conversion fidelity end to end: patch embed as
space-to-depth matmul vs strided conv, RoPE, attention blocks, the dual
decoder (including the dec_blocks2 duplication rule), the DPT pyramid
(transposed convs as matmuls, align_corners bilinear), the catMLP local
head (pixel shuffle layout), and the output activations.

The torch side is written here from the documented reference semantics
(dust3r/croco modules) using only torch.nn.functional — it does not import
reference code.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from mast3r_slam_tpu.models.convert import convert_state_dict  # noqa: E402
from mast3r_slam_tpu.models.mast3r import MASt3R, MASt3RConfig  # noqa: E402

# ---------------------------------------------------------------------------
# Synthetic state dict
# ---------------------------------------------------------------------------

CFG = MASt3RConfig.tiny()
H, W = 32, 48


def make_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, i, o):
        sd[name + ".weight"] = torch.randn(o, i, generator=g) / math.sqrt(i)
        sd[name + ".bias"] = torch.randn(o, generator=g) * 0.02

    def conv(name, i, o, k, bias=True):
        sd[name + ".weight"] = torch.randn(o, i, k, k, generator=g) / math.sqrt(i * k * k)
        if bias:
            sd[name + ".bias"] = torch.randn(o, generator=g) * 0.02

    def convT(name, i, o, k):
        sd[name + ".weight"] = torch.randn(i, o, k, k, generator=g) / math.sqrt(i)
        sd[name + ".bias"] = torch.randn(o, generator=g) * 0.02

    def norm(name, c):
        sd[name + ".weight"] = 1.0 + 0.1 * torch.randn(c, generator=g)
        sd[name + ".bias"] = 0.1 * torch.randn(c, generator=g)

    E, D = CFG.enc_embed_dim, CFG.dec_embed_dim
    p = CFG.patch_size
    conv("patch_embed.proj", 3, E, p)
    for i in range(CFG.enc_depth):
        b = f"enc_blocks.{i}"
        norm(f"{b}.norm1", E)
        norm(f"{b}.norm2", E)
        lin(f"{b}.attn.qkv", E, 3 * E)
        lin(f"{b}.attn.proj", E, E)
        lin(f"{b}.mlp.fc1", E, CFG.mlp_ratio * E)
        lin(f"{b}.mlp.fc2", CFG.mlp_ratio * E, E)
    norm("enc_norm", E)
    lin("decoder_embed", E, D)
    for i in range(CFG.dec_depth):
        b = f"dec_blocks.{i}"
        for n in ("norm1", "norm2", "norm3", "norm_y"):
            norm(f"{b}.{n}", D)
        lin(f"{b}.attn.qkv", D, 3 * D)
        lin(f"{b}.attn.proj", D, D)
        for n in ("projq", "projk", "projv", "proj"):
            lin(f"{b}.cross_attn.{n}", D, D)
        lin(f"{b}.mlp.fc1", D, CFG.mlp_ratio * D)
        lin(f"{b}.mlp.fc2", CFG.mlp_ratio * D, D)
    norm("dec_norm", D)

    dims = list(CFG.layer_dims)
    tok_dims = [E, D, D, D]
    for hn in (1, 2):
        pr = f"downstream_head{hn}.dpt"
        conv(f"{pr}.act_postprocess.0.0", tok_dims[0], dims[0], 1)
        convT(f"{pr}.act_postprocess.0.1", dims[0], dims[0], 4)
        conv(f"{pr}.act_postprocess.1.0", tok_dims[1], dims[1], 1)
        convT(f"{pr}.act_postprocess.1.1", dims[1], dims[1], 2)
        conv(f"{pr}.act_postprocess.2.0", tok_dims[2], dims[2], 1)
        conv(f"{pr}.act_postprocess.3.0", tok_dims[3], dims[3], 1)
        conv(f"{pr}.act_postprocess.3.1", dims[3], dims[3], 3)
        for i in range(4):
            conv(f"{pr}.scratch.layer{i + 1}_rn", dims[i], CFG.feature_dim, 3,
                 bias=False)
        for k in range(1, 5):
            rn = f"{pr}.scratch.refinenet{k}"
            for u in (1, 2):
                conv(f"{rn}.resConfUnit{u}.conv1", CFG.feature_dim,
                     CFG.feature_dim, 3)
                conv(f"{rn}.resConfUnit{u}.conv2", CFG.feature_dim,
                     CFG.feature_dim, 3)
            conv(f"{rn}.out_conv", CFG.feature_dim, CFG.feature_dim, 1)
        conv(f"{pr}.head.0", CFG.feature_dim, CFG.feature_dim // 2, 3)
        conv(f"{pr}.head.2", CFG.feature_dim // 2, CFG.last_dim, 3)
        conv(f"{pr}.head.4", CFG.last_dim, 4, 1)
        nch = CFG.local_feat_dim + 1
        idim = E + D
        lin(f"downstream_head{hn}.head_local_features.fc1", idim, 4 * idim)
        lin(f"downstream_head{hn}.head_local_features.fc2", 4 * idim,
            nch * p * p)
    return sd


# ---------------------------------------------------------------------------
# Torch functional reference forward
# ---------------------------------------------------------------------------


def t_lin(sd, name, x):
    return F.linear(x, sd[name + ".weight"], sd[name + ".bias"])


def t_ln(sd, name, x):
    return F.layer_norm(x, (x.shape[-1],), sd[name + ".weight"],
                        sd[name + ".bias"], eps=1e-6)


def t_rope(tokens, positions, freq=100.0):
    """Reference RoPE2D fallback (pos_embed.py:112-158)."""
    B, nh, N, Dd = tokens.shape
    D = Dd // 2
    inv_freq = 1.0 / (freq ** (torch.arange(0, D, 2).float() / D))
    maxp = int(positions.max()) + 1
    t = torch.arange(maxp).float()
    freqs = torch.einsum("i,j->ij", t, inv_freq)
    freqs = torch.cat((freqs, freqs), dim=-1)
    cos, sin = freqs.cos(), freqs.sin()

    def rope1d(tok, pos1d):
        c = F.embedding(pos1d, cos)[:, None, :, :]
        s = F.embedding(pos1d, sin)[:, None, :, :]
        x1, x2 = tok[..., : tok.shape[-1] // 2], tok[..., tok.shape[-1] // 2:]
        rot = torch.cat((-x2, x1), dim=-1)
        return tok * c + rot * s

    y, x = tokens.chunk(2, dim=-1)
    y = rope1d(y, positions[:, :, 0])
    x = rope1d(x, positions[:, :, 1])
    return torch.cat((y, x), dim=-1)


def t_attn(sd, prefix, x, pos, heads):
    B, N, C = x.shape
    qkv = t_lin(sd, prefix + ".qkv", x).reshape(B, N, 3, heads, C // heads)
    qkv = qkv.transpose(1, 3)  # B, heads, 3, N, hd
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q, k = t_rope(q, pos), t_rope(k, pos)
    attn = (q @ k.transpose(-2, -1)) * (C // heads) ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return t_lin(sd, prefix + ".proj", out)


def t_cross(sd, prefix, q_in, kv, qpos, kpos, heads):
    B, Nq, C = q_in.shape
    hd = C // heads

    def split(t):
        return t.reshape(B, -1, heads, hd).permute(0, 2, 1, 3)

    q = split(t_lin(sd, prefix + ".projq", q_in))
    k = split(t_lin(sd, prefix + ".projk", kv))
    v = split(t_lin(sd, prefix + ".projv", kv))
    q, k = t_rope(q, qpos), t_rope(k, kpos)
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    out = (attn.softmax(dim=-1) @ v).transpose(1, 2).reshape(B, Nq, C)
    return t_lin(sd, prefix + ".proj", out)


def t_mlp(sd, prefix, x):
    return t_lin(sd, prefix + ".fc2", F.gelu(t_lin(sd, prefix + ".fc1", x)))


def t_enc_block(sd, b, x, pos, heads):
    x = x + t_attn(sd, f"{b}.attn", t_ln(sd, f"{b}.norm1", x), pos, heads)
    x = x + t_mlp(sd, f"{b}.mlp", t_ln(sd, f"{b}.norm2", x))
    return x


def t_dec_block(sd, b, x, y, xpos, ypos, heads):
    x = x + t_attn(sd, f"{b}.attn", t_ln(sd, f"{b}.norm1", x), xpos, heads)
    y_ = t_ln(sd, f"{b}.norm_y", y)
    x = x + t_cross(sd, f"{b}.cross_attn", t_ln(sd, f"{b}.norm2", x), y_,
                    xpos, ypos, heads)
    x = x + t_mlp(sd, f"{b}.mlp", t_ln(sd, f"{b}.norm3", x))
    return x


def t_encode(sd, img):
    # img BCHW
    x = F.conv2d(img, sd["patch_embed.proj.weight"],
                 sd["patch_embed.proj.bias"], stride=CFG.patch_size)
    B, E, nh, nw = x.shape
    x = x.flatten(2).transpose(1, 2)
    yy, xx = torch.meshgrid(torch.arange(nh), torch.arange(nw), indexing="ij")
    pos = torch.stack([yy, xx], dim=-1).reshape(1, -1, 2).repeat(B, 1, 1)
    for i in range(CFG.enc_depth):
        x = t_enc_block(sd, f"enc_blocks.{i}", x, pos, CFG.enc_num_heads)
    return t_ln(sd, "enc_norm", x), pos


def t_decode(sd, f1, pos1, f2, pos2):
    out1, out2 = [f1], [f2]
    x1 = t_lin(sd, "decoder_embed", f1)
    x2 = t_lin(sd, "decoder_embed", f2)
    for i in range(CFG.dec_depth):
        nx1 = t_dec_block(sd, f"dec_blocks.{i}", x1, x2, pos1, pos2,
                          CFG.dec_num_heads)
        nx2 = t_dec_block(sd, f"dec_blocks2.{i}", x2, x1, pos2, pos1,
                          CFG.dec_num_heads)
        x1, x2 = nx1, nx2
        out1.append(x1)
        out2.append(x2)
    out1[-1] = t_ln(sd, "dec_norm", out1[-1])
    out2[-1] = t_ln(sd, "dec_norm", out2[-1])
    return out1, out2


def t_conv(sd, name, x, stride=1, padding=0, bias=True):
    return F.conv2d(x, sd[name + ".weight"],
                    sd[name + ".bias"] if bias else None,
                    stride=stride, padding=padding)


def t_rcu(sd, name, x):
    out = F.relu(x)
    out = t_conv(sd, name + ".conv1", out, padding=1)
    out = F.relu(out)
    out = t_conv(sd, name + ".conv2", out, padding=1)
    return out + x


def t_fusion(sd, name, x, skip=None):
    if skip is not None:
        x = x + t_rcu(sd, name + ".resConfUnit1", skip)
    x = t_rcu(sd, name + ".resConfUnit2", x)
    x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
    return t_conv(sd, name + ".out_conv", x)


def t_dpt(sd, prefix, tokens, img_hw):
    Hh, Ww = img_hw
    p = CFG.patch_size
    nh, nw = Hh // p, Ww // p
    hooks = CFG.hooks
    layers = [tokens[h] for h in hooks]
    layers = [
        l.transpose(1, 2).reshape(l.shape[0], l.shape[2], nh, nw)
        for l in layers
    ]
    l0 = t_conv(sd, f"{prefix}.act_postprocess.0.0", layers[0])
    l0 = F.conv_transpose2d(l0, sd[f"{prefix}.act_postprocess.0.1.weight"],
                            sd[f"{prefix}.act_postprocess.0.1.bias"], stride=4)
    l1 = t_conv(sd, f"{prefix}.act_postprocess.1.0", layers[1])
    l1 = F.conv_transpose2d(l1, sd[f"{prefix}.act_postprocess.1.1.weight"],
                            sd[f"{prefix}.act_postprocess.1.1.bias"], stride=2)
    l2 = t_conv(sd, f"{prefix}.act_postprocess.2.0", layers[2])
    l3 = t_conv(sd, f"{prefix}.act_postprocess.3.0", layers[3])
    l3 = t_conv(sd, f"{prefix}.act_postprocess.3.1", l3, stride=2, padding=1)
    ls = [l0, l1, l2, l3]
    ls = [
        t_conv(sd, f"{prefix}.scratch.layer{i + 1}_rn", l, padding=1,
               bias=False)
        for i, l in enumerate(ls)
    ]
    path4 = t_fusion(sd, f"{prefix}.scratch.refinenet4", ls[3])
    path4 = path4[:, :, : ls[2].shape[2], : ls[2].shape[3]]
    path3 = t_fusion(sd, f"{prefix}.scratch.refinenet3", path4, ls[2])
    path2 = t_fusion(sd, f"{prefix}.scratch.refinenet2", path3, ls[1])
    path1 = t_fusion(sd, f"{prefix}.scratch.refinenet1", path2, ls[0])
    x = t_conv(sd, f"{prefix}.head.0", path1, padding=1)
    x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
    x = t_conv(sd, f"{prefix}.head.2", x, padding=1)
    x = F.relu(x)
    x = t_conv(sd, f"{prefix}.head.4", x)
    return x


def t_head(sd, hn, tokens, img_hw):
    Hh, Ww = img_hw
    p = CFG.patch_size
    dpt_out = t_dpt(sd, f"downstream_head{hn}.dpt", tokens, img_hw)
    cat = torch.cat([tokens[0], tokens[-1]], dim=-1)
    lf = t_mlp(sd, f"downstream_head{hn}.head_local_features", cat)
    B, S, Dd = lf.shape
    lf = lf.transpose(-1, -2).reshape(B, -1, Hh // p, Ww // p)
    lf = F.pixel_shuffle(lf, p)
    out = torch.cat([dpt_out, lf], dim=1).permute(0, 2, 3, 1)  # BHWC
    xyz = out[..., 0:3]
    d = xyz.norm(dim=-1, keepdim=True)
    pts3d = xyz / d.clamp(min=1e-8) * torch.expm1(d)
    conf = 1.0 + out[..., 3].exp()
    desc = out[..., 4:4 + CFG.local_feat_dim]
    desc = desc / desc.norm(dim=-1, keepdim=True)
    desc_conf = out[..., 4 + CFG.local_feat_dim].exp()
    return pts3d, conf, desc, desc_conf


# ---------------------------------------------------------------------------


@pytest.mark.parametrize("img_hw", [(H, W), (W, H)],
                         ids=["landscape", "portrait"])
def test_full_parity(img_hw):
    """Numeric parity incl. the portrait (H>W) case: the net runs portrait
    frames at their true orientation exactly like the reference
    (ManyAR_PatchEmbed portrait branch, dust3r/patch_embed.py:64-70, and
    the SLAM loader's landscape_only=False head, utils/misc.py:56-61)."""
    H, W = img_hw
    sd = make_state_dict()
    rng = np.random.default_rng(3)
    img1 = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    img2 = rng.standard_normal((1, H, W, 3)).astype(np.float32)

    # The synthetic ckpt has NO dec_blocks2 keys; the reference loader
    # duplicates dec_blocks in that case (dust3r/model.py:90-97). Apply the
    # same rule for the torch forward; the converter must do it internally.
    for k in list(sd):
        if k.startswith("dec_blocks."):
            sd.setdefault(k.replace("dec_blocks.", "dec_blocks2."), sd[k])

    # Torch reference
    with torch.no_grad():
        ti1 = torch.from_numpy(img1).permute(0, 3, 1, 2)
        ti2 = torch.from_numpy(img2).permute(0, 3, 1, 2)
        f1, pos1 = t_encode(sd, ti1)
        f2, pos2 = t_encode(sd, ti2)
        d1, d2 = t_decode(sd, f1, pos1, f2, pos2)
        pts1, conf1, desc1, dconf1 = t_head(sd, 1, d1, (H, W))
        pts2, conf2, desc2, dconf2 = t_head(sd, 2, d2, (H, W))

    # Flax with converted weights (note: state dict has NO dec_blocks2 ->
    # exercises the duplication rule)
    sd_no2 = {k: v for k, v in sd.items() if not k.startswith("dec_blocks2")}
    params = convert_state_dict(sd_no2, CFG.enc_depth, CFG.dec_depth)
    model = MASt3R(CFG)
    res1, res2 = model.apply(params, jnp.asarray(img1), jnp.asarray(img2))

    np.testing.assert_allclose(
        np.asarray(res1["pts3d"][0]), pts1[0].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res1["conf"][0]), conf1[0].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res1["desc"][0]), desc1[0].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(res1["desc_conf"][0]), dconf1[0].numpy(), atol=2e-4,
        rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(res2["pts3d"][0]), pts2[0].numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(res2["desc"][0]), desc2[0].numpy(), atol=2e-4
    )


# ---------------------------------------------------------------------------
# Strict conversion: full key-coverage in both directions (VERDICT r1
# missing #1a; mirrors dust3r/model.py:27-43 loading semantics but loud)
# ---------------------------------------------------------------------------


def test_strict_convert_all_keys_consumed_and_params_covered():
    from mast3r_slam_tpu.models.convert import assert_params_cover

    sd = make_state_dict()
    # allowed-unused keys tolerated (reference strict=False leaves them)
    sd["mask_token"] = torch.zeros(1, 1, CFG.dec_embed_dim)
    params = convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth,
                                strict=True)
    model = MASt3R(CFG)
    assert_params_cover(params, model, (H, W))


def test_strict_convert_flags_unconsumed_key():
    sd = make_state_dict()
    sd["downstream_head1.dpt.some_new_tensor"] = torch.zeros(3)
    with pytest.raises(ValueError, match="not consumed"):
        convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth, strict=True)


def test_strict_convert_flags_missing_model_param():
    """A converted tree missing a tensor (mis-mapped checkpoint) must fail
    the coverage assertion, not silently leave the param at random init."""
    from mast3r_slam_tpu.models.convert import assert_params_cover

    sd = make_state_dict()
    params = convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth)
    del params["params"]["enc_block_0"]["attn"]["qkv"]
    model = MASt3R(CFG)
    with pytest.raises(ValueError, match="mismatch"):
        assert_params_cover(params, model, (H, W))


def test_strict_convert_flags_shape_mismatch():
    from mast3r_slam_tpu.models.convert import assert_params_cover

    sd = make_state_dict()
    params = convert_state_dict(sd, CFG.enc_depth, CFG.dec_depth)
    p = params["params"]["enc_block_0"]["attn"]["qkv"]
    p["kernel"] = p["kernel"][:, :-1]
    model = MASt3R(CFG)
    with pytest.raises(ValueError, match="shape"):
        assert_params_cover(params, model, (H, W))
