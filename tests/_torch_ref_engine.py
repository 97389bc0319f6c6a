"""The ACTUAL reference torch network + the ACTUAL reference inference
adapters (`/root/reference/mast3r_slam/mast3r_utils.py`) wrapped as an
InferenceEngine for the repo's SLAMSystem.

This is the end-to-end cross-implementation harness (VERDICT r3 next #1):
encode / decode / head / adapter plumbing — the symmetric [ii, ji, jj, ij]
ordering (mast3r_utils.py:84-147), downsample placement (:69-78), the
asymmetric output reshapes (:220-242), and the idx warm-start pass-through
— all run through the reference's own torch code, with ONLY the dense
matcher swapped for the repo's (`mast3r_slam_tpu.ops.matching.match`,
called through the reference's `matching.match` seam) so both drives match
through identical matcher code and the comparison isolates network +
adapter semantics.

Import plumbing (the reference is a CUDA-first fork):
* ``mast3r_slam_backends`` (the pybind CUDA extension) is stubbed — its
  kernels are never called because the matcher seam is replaced.
* ``torchvision`` is stubbed (only used for ImgNorm, which we bypass by
  feeding pre-normalized tensors).
* ``mast3r_slam.retrieval_database`` is stubbed (pulls faiss/asmk;
  retrieval is driven by the repo's own database in these tests).
* ``torch.cuda.synchronize`` is no-op'd (the fork's profiler calls it
  inside the vendored CroCo blocks).
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"
_REF_PATHS = [
    REF,
    f"{REF}/thirdparty/mast3r",
    f"{REF}/thirdparty/mast3r/dust3r",
    f"{REF}/thirdparty/mast3r/dust3r/croco",
]


class _Dummy:
    def __init__(self, *a, **k):
        pass


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_adapters():
    """Import `/root/reference/mast3r_slam/mast3r_utils.py` (and its config
    module) with the CUDA/vision/retrieval dependencies stubbed.  Returns
    (mast3r_utils module, set_global_config fn)."""
    import torch

    torch.cuda.synchronize = lambda *a, **k: None
    for p in _REF_PATHS:
        if p not in sys.path:
            sys.path.append(p)
    if "mast3r_slam_backends" not in sys.modules:
        _stub_module("mast3r_slam_backends")
    if "torchvision" not in sys.modules:
        tvt = _stub_module("torchvision.transforms", Compose=_Dummy,
                           ToTensor=_Dummy, Normalize=_Dummy)
        _stub_module("torchvision", transforms=tvt)
    if "mast3r_slam.retrieval_database" not in sys.modules:
        _stub_module("mast3r_slam.retrieval_database",
                     RetrievalDatabase=_Dummy)
    import mast3r_slam.mast3r_utils as mu  # noqa: PLC0415
    from mast3r_slam.config import set_global_config  # noqa: PLC0415

    return mu, set_global_config


def install_matcher_bridge(match_cfg):
    """Replace the reference's ``matching.match`` (the CUDA iter_proj +
    refine seam, matching.py:8-10) with the repo's TPU matcher: torch in,
    torch out, jnp in the middle.  Both SLAM drives then share matcher
    code exactly; everything else on the torch side is reference code."""
    import torch

    import mast3r_slam.matching as ref_matching  # noqa: PLC0415
    from mast3r_slam_tpu.ops import matching as tpu_matching

    def match_bridge(X11, X21, D11, D21, idx_1_to_2_init=None):
        import jax.numpy as jnp

        j = lambda t: jnp.asarray(t.detach().cpu().numpy())  # noqa: E731
        init = (None if idx_1_to_2_init is None
                else jnp.asarray(idx_1_to_2_init.detach().cpu().numpy()
                                 .astype(np.int32)))
        idx, valid = tpu_matching.match(
            j(X11), j(X21), j(D11), j(D21),
            idx_1_to_2_init=init, cfg=match_cfg,
        )
        return (torch.from_numpy(np.asarray(idx)).long(),
                torch.from_numpy(np.asarray(valid)))

    ref_matching.match = match_bridge
    # mast3r_utils holds its own module reference (import ... as matching)
    sys.modules["mast3r_slam.mast3r_utils"].matching.match = match_bridge


class _ShimFrame:
    """Duck-typed reference Frame: the adapter functions only touch
    .feat/.pos/.img_true_shape once features are cached
    (mast3r_utils.py:16-19,190-201)."""

    def __init__(self, feat, pos, shape):
        self.feat = feat
        self.pos = pos
        self.img_true_shape = shape


class TorchReferenceEngine:
    """InferenceEngine interface (the host-side flavor, like
    testing.OracleEngine) backed by the reference torch net + adapters."""

    def __init__(self, net, img_hw, feat_dim, match_cfg,
                 img_downsample: int = 1):
        import torch

        mu, ref_set_config = load_reference_adapters()
        ref_set_config({"dataset": {"img_downsample": img_downsample}})
        install_matcher_bridge(match_cfg)
        self.mu = mu
        self.net = net.eval()
        self.img_hw = img_hw
        h, w = img_hw
        self.n_patches = (h // 16) * (w // 16)
        self.feat_dim = feat_dim
        self.downsample = img_downsample
        self.params = None  # host-side engine: no jax params
        self.match_cfg = match_cfg
        self._shape = torch.tensor([[h, w]], dtype=torch.int64)

    # -- conversion helpers ------------------------------------------------

    def _t(self, a, dtype=None):
        import torch

        t = torch.from_numpy(np.asarray(a))
        return t.to(dtype) if dtype is not None else t

    def _j(self, t):
        import jax.numpy as jnp

        return jnp.asarray(t.detach().cpu().numpy())

    def _shim(self, feat, pos):
        import torch

        return _ShimFrame(self._t(feat, torch.float32),
                          self._t(pos, torch.int64), self._shape)

    # -- InferenceEngine interface ----------------------------------------

    def encode(self, img):
        """img: (B, h, w, 3) jnp, ImgNorm-normalized (the repo pipeline
        normalizes on host; reference: frame.img)."""
        import jax.numpy as jnp
        import torch

        with torch.no_grad():
            t = self._t(img, torch.float32).permute(0, 3, 1, 2)
            B = t.shape[0]
            feat, pos, _ = self.net._encode_image(
                t, self._shape.expand(B, -1)
            )
        return self._j(feat), jnp.asarray(
            pos.detach().cpu().numpy().astype(np.int32)
        )

    def inference_mono(self, feat, pos):
        import torch

        with torch.no_grad():
            Xii, Cii = self.mu.mast3r_inference_mono(
                self.net, self._shim(feat, pos)
            )
        # the reference mono/asym adapters unpack the batch axis away
        # (einops unpacking, mast3r_utils.py:35-36); the engine contract
        # is batched (1, hw, c)
        return self._j(Xii)[None], self._j(Cii)[None]

    def match_asymmetric(self, frame_feat, frame_pos, kf_feat, kf_pos,
                         idx_i2j_init=None, params=None):
        import torch

        init = (None if idx_i2j_init is None
                else self._t(idx_i2j_init, torch.int64))
        with torch.no_grad():
            out = self.mu.mast3r_match_asymmetric(
                self.net, self._shim(frame_feat, frame_pos),
                self._shim(kf_feat, kf_pos), idx_i2j_init=init,
            )
        # (idx_i2j, valid_match_j, Xii, Cii, Qii, Xji, Cji, Qji) — the
        # reference's order IS the engine contract order; the X/C/Q
        # tensors come back batch-unpacked (hw, c) (mast3r_utils.py:
        # 236-242), so restore the (1, hw, c) engine contract
        idx = out[0]
        import jax.numpy as jnp

        return (jnp.asarray(idx.detach().cpu().numpy().astype(np.int32)),
                self._j(out[1]),
                *[self._j(t)[None] for t in out[2:]])

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, params=None):
        import torch

        B = int(np.asarray(feat_i).shape[0])
        shapes = [self._shape] * B
        with torch.no_grad():
            out = self.mu.mast3r_match_symmetric(
                self.net, self._t(feat_i, torch.float32),
                self._t(pos_i, torch.int64),
                self._t(feat_j, torch.float32),
                self._t(pos_j, torch.int64), shapes, shapes,
            )
        import jax.numpy as jnp

        idx_i2j, idx_j2i = out[0], out[1]
        return (
            jnp.asarray(idx_i2j.detach().cpu().numpy().astype(np.int32)),
            jnp.asarray(idx_j2i.detach().cpu().numpy().astype(np.int32)),
            *[self._j(t) for t in out[2:]],
        )
