"""Retrieval feature head: projector + whitening + attention top-k.

Capability parity with `/root/reference/thirdparty/mast3r/mast3r/retrieval/
model.py` (RetrievalModel minus the frozen backbone: prewhiten Whitener,
MLP projector with optional residual, L2-norm attention, postwhiten
Whitener, `how_select_local` top-k feature selection) as one jitted JAX
function over cached encoder features, plus a torch-checkpoint converter.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RetrievalParams(NamedTuple):
    """Whitener/projector weights.  Whiteners: y = (x - m) @ P
    (model.py Whitener.forward).  Projector: a stack of
    (Linear, LayerNorm, GELU) pairs ending in a Linear
    (model.py build_projector)."""
    prewhiten_m: jnp.ndarray          # (1, D_in)
    prewhiten_p: jnp.ndarray          # (D_in, D_in)
    proj_weights: tuple               # ((W, b), ...) per Linear
    proj_norms: tuple                 # ((scale, bias), ...) per LayerNorm
    postwhiten_m: jnp.ndarray         # (1, D_out)
    postwhiten_p: jnp.ndarray         # (D_out, D_out)
    residual: bool = False

    @classmethod
    def random(cls, key, d_in=1024, hdims=(1024,), seed=0):
        """Random-init params (tests / no-checkpoint operation)."""
        rng = np.random.default_rng(seed)
        ws, ns = [], []
        d = d_in
        for h in hdims[:-1]:
            W = rng.standard_normal((d, h)).astype(np.float32) / np.sqrt(d)
            ws.append((jnp.asarray(W), jnp.zeros((h,))))
            ns.append((jnp.ones((h,)), jnp.zeros((h,))))
            d = h
        W = rng.standard_normal((d, hdims[-1])).astype(np.float32) / np.sqrt(d)
        ws.append((jnp.asarray(W), jnp.zeros((hdims[-1],))))
        return cls(
            prewhiten_m=jnp.zeros((1, d_in)),
            prewhiten_p=jnp.eye(d_in),
            proj_weights=tuple(ws),
            proj_norms=tuple(ns),
            postwhiten_m=jnp.zeros((1, hdims[-1])),
            postwhiten_p=jnp.eye(hdims[-1]),
        )

    @classmethod
    def from_torch_checkpoint(cls, path: str):
        """Convert the published retrieval checkpoint
        (`*_retrieval_trainingfree.pth`, loaded by reference
        processor.py:70-84)."""
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt["model"]
        args = ckpt.get("args")

        def t(k):
            return jnp.asarray(sd[k].float().numpy())

        # projector: Sequential of Linear/LayerNorm/GELU...Linear
        ws, ns = [], []
        i = 0
        while f"projector.{i}.weight" in sd:
            W = t(f"projector.{i}.weight")
            if W.ndim == 2:
                ws.append((W.T, t(f"projector.{i}.bias")))
            else:  # LayerNorm
                ns.append((W, t(f"projector.{i}.bias")))
            i += 1
        if not ws:  # Identity projector
            ws = []
        residual = bool(getattr(args, "residual", False)) if args else False
        return cls(
            prewhiten_m=t("prewhiten.m"),
            prewhiten_p=t("prewhiten.p"),
            proj_weights=tuple(ws),
            proj_norms=tuple(ns),
            postwhiten_m=t("postwhiten.m") if "postwhiten.m" in sd
            else jnp.zeros((1, ws[-1][0].shape[1])),
            postwhiten_p=t("postwhiten.p") if "postwhiten.p" in sd
            else jnp.eye(ws[-1][0].shape[1]),
            residual=residual,
        )


def _whiten(x, m, p):
    return (x - m) @ p


def _projector(params: RetrievalParams, x):
    h = x
    n_pairs = len(params.proj_norms)
    for i, (W, b) in enumerate(params.proj_weights):
        h = h @ W + b
        if i < n_pairs:
            scale, bias = params.proj_norms[i]
            mu = h.mean(-1, keepdims=True)
            var = ((h - mu) ** 2).mean(-1, keepdims=True)
            h = (h - mu) / jnp.sqrt(var + 1e-5) * scale + bias
            h = jax.nn.gelu(h, approximate=False)
    return h


@functools.partial(jax.jit, static_argnames=("nfeat", "residual"))
def prep_features(params: RetrievalParams, backbone_feat, nfeat: int = 300,
                  residual: bool = False):
    """Backbone tokens (B, N, D) -> top-k whitened local features
    (B, nfeat, D_out).  Mirrors RetrievalDatabase.prep_features
    (retrieval_database.py:25-41) + how_select_local (model.py:92-104).
    ``residual`` must be passed statically (params.residual is a pytree
    leaf and would be traced)."""
    x = _whiten(backbone_feat, params.prewhiten_m, params.prewhiten_p)
    proj = _projector(params, x)
    if residual:
        proj = proj + x
    attention = jnp.linalg.norm(proj, axis=-1)          # featweights l2norm
    whitened = _whiten(proj, params.postwhiten_m, params.postwhiten_p)

    k = min(nfeat, attention.shape[1])
    topk_attn, topk_idx = jax.lax.top_k(attention, k)
    topk_features = jnp.take_along_axis(
        whitened, topk_idx[..., None], axis=1
    )
    return topk_features
