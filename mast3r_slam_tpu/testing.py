"""Synthetic-scene test harness: sequence generator + oracle inference
engine.

The reference has no checkpoint-free integration tests (SURVEY §4); this
module provides the missing piece: a renderer for a smooth textured 3D
surface observed along a ground-truth Sim(3) trajectory, and an
``OracleEngine`` that implements the ``InferenceEngine`` interface but
produces two-view decode outputs from the known geometry (optionally with
noise).  The full pipeline — tracker, keyframing, factor graph, BA,
relocalization, export, ATE scoring — runs end-to-end against it with an
exactly known ground truth.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .ops import lie_sim3 as sim3
from .ops.geometry import get_pixel_coords


def surface_z(x, y, scene: str = "smooth"):
    """World surface height field.  Scenes (VERDICT r2 weak #4 —
    adversarial geometry for the approximation stack):

    * ``smooth``   — the original single-valued smooth surface.
    * ``cliff``    — smooth surface with a ~1.2 m step discontinuity along
      a curved line (depth-discontinuity stress: subsampled/interpolated
      match positions straddle the step).
    """
    z = 4.0 + 0.6 * np.sin(1.3 * x) * np.cos(1.1 * y)
    if scene == "cliff":
        z = z - 1.2 * (np.sin(0.9 * x + 0.7 * y) > 0.2)
    return z


# floating occluder slab (scene == "occluder"): plane z = OCC_Z over a
# disk in (x, y) — true occlusions + hard depth discontinuities
OCC_Z = 2.6
OCC_CENTER = (0.4, -0.3)
OCC_R = 0.9


def occluder_mask(x, y):
    cx, cy = OCC_CENTER
    return (x - cx) ** 2 + (y - cy) ** 2 < OCC_R ** 2


def texture(x, y, fg=False):
    """Smooth RGB texture on the surface (shifted palette on the
    occluder so its descriptors differ from the background's)."""
    s = 2.4 if fg else 0.0
    r = 0.5 + 0.5 * np.sin(2.0 * x + s)
    g = 0.5 + 0.5 * np.cos(1.7 * y - s)
    b = 0.5 + 0.5 * np.sin(1.1 * (x + y) + s)
    return np.stack([r, g, b], axis=-1)


def make_K(h, w):
    return np.array(
        [[0.8 * w, 0, w / 2], [0, 0.8 * w, h / 2], [0, 0, 1]],
        dtype=np.float32,
    )


def render_view(T_WC, h, w, K, scene: str = "smooth"):
    """Ray-march the surface from a camera pose.  Returns (rgb (h,w,3) in
    [0,1], X_cam (h*w, 3) pointmap in camera coords, X_world (h*w, 3))."""
    Kinv = np.linalg.inv(K)
    uv = np.asarray(get_pixel_coords(1, (h, w))).reshape(-1, 2)
    dirs = (Kinv @ np.concatenate(
        [uv, np.ones((h * w, 1), np.float32)], axis=1
    ).T).T
    T = np.asarray(T_WC)
    t, s = T[:3], T[7]
    Rm = np.asarray(sim3.sim3_matrix(jnp.asarray(T)))[:3, :3] / s
    d_w = (Rm @ dirs.T).T
    bg = "cliff" if scene == "cliff" else "smooth"
    lam = np.full(h * w, 3.0, np.float64)
    for _ in range(60):
        Xw = t[None] + lam[:, None] * d_w
        lam = lam + (surface_z(Xw[:, 0], Xw[:, 1], bg) - Xw[:, 2]) \
            / d_w[:, 2]
    Xw = (t[None] + lam[:, None] * d_w).astype(np.float32)
    rgb = texture(Xw[:, 0], Xw[:, 1]).reshape(-1, 3)
    if scene == "occluder":
        # ray/plane hit on the slab; takes precedence when closer
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_fg = (OCC_Z - t[2]) / d_w[:, 2]
        Xf = t[None] + lam_fg[:, None] * d_w
        hit = (
            np.isfinite(lam_fg) & (lam_fg > 0.05) & (lam_fg < lam)
            & occluder_mask(Xf[:, 0], Xf[:, 1])
        )
        Xw = np.where(hit[:, None], Xf.astype(np.float32), Xw)
        rgb = np.where(hit[:, None], texture(Xf[:, 0], Xf[:, 1], fg=True),
                       rgb)
    Xc = np.asarray(
        sim3.act(sim3.inv(jnp.asarray(T)), jnp.asarray(Xw))
    )
    rgb = rgb.reshape(h, w, 3).astype(np.float32)
    return rgb, Xc, Xw


def world_descriptors(X_world, f: int = 24, base_wavelength: float = 0.35,
                      geometric: bool = False):
    """View-invariant, locally discriminative descriptors: multi-frequency
    positional encodings of the WORLD surface coordinates.  Two pixels (in
    any two views) observing the same surface point get the same
    descriptor; the dot product peaks at the true correspondence and
    decays with surface distance — like real MASt3R descriptors, but
    checkpoint-free.  ``base_wavelength`` sets the finest spatial period
    (world units) — keep it a few pixel footprints for 1-px
    discrimination without aliasing inside the matcher's search window.

    ``geometric=True`` uses an octave ladder (wavelengths base * 2^k)
    instead of the linear one: the longest period then spans the whole
    scene, making the descriptors GLOBALLY unique — required when testing
    pose-free global matching (match_desc_global), where the linear
    ladder's ~6x base repeat period aliases and produces cycle-consistent
    false matches no gate can catch (real MASt3R descriptors are globally
    discriminative)."""
    x, y = X_world[:, 0], X_world[:, 1]
    feats = []
    if geometric:
        # ladder spanning base..max(12, 32*base) so the longest period
        # covers the scene regardless of how fine the base is (a fixed
        # x2 octave ratio tops out too low when the base is
        # footprint-scaled at production resolution).  z is encoded too:
        # an (x, y)-only descriptor ALIASES across depth discontinuities
        # (the cliff's two levels share (x, y) neighborhoods) in a way
        # appearance-based MASt3R descriptors don't — measured 2x ATE on
        # the cliff loop-closure sweep through desc_global before the z
        # terms.
        z = X_world[:, 2]
        n_oct = f // 6
        top = max(12.0, 32.0 * base_wavelength)
        ratio = (top / base_wavelength) ** (1.0 / max(n_oct - 1, 1))
        for k in range(n_oct):
            freq = 2 * np.pi / (base_wavelength * (ratio ** k))
            feats += [np.sin(freq * x), np.cos(freq * x),
                      np.sin(freq * y), np.cos(freq * y),
                      np.sin(freq * z), np.cos(freq * z)]
    else:
        n_oct = f // 4
        for k in range(n_oct):
            wl = base_wavelength * n_oct / (k + 1)
            freq = 2 * np.pi / wl
            feats += [np.sin(freq * x), np.cos(freq * x),
                      np.sin(freq * y), np.cos(freq * y)]
    D = np.stack(feats, axis=-1).astype(np.float32)
    D /= np.linalg.norm(D, axis=-1, keepdims=True)
    return D


def make_trajectory(n_frames: int, scale: float = 0.02, seed: int = 0,
                    loop: bool = False, cycles: int = 1):
    """Smooth bounded Sim(3) trajectory (first pose ~ identity): a
    multi-frequency sinusoidal path whose amplitude scales with
    ``scale * n_frames`` but whose per-frame motion stays bounded — the
    camera always keeps the surface in view, so clips of any length stay
    trackable.  ``loop`` closes the path (returns to the start) for
    loop-closure tests.

    ``cycles`` divides the amplitude and multiplies the frequencies by
    the same factor: per-frame motion is unchanged (~scale per dof) but
    the path stays within amp/cycles of the scene and sweeps it
    ``cycles`` times — long clips remain trackable AND genuinely revisit
    earlier views (the realistic loop-closure cadence fixture,
    scripts/make_rates.py)."""
    rng = np.random.default_rng(seed)
    amp = scale * n_frames / (2 * np.pi * max(cycles, 1))
    # per-dof amplitudes: translation, rotation, log-scale
    a = amp * np.array([1.0, 0.8, 0.6, 0.25, 0.25, 0.25, 0.08])
    phase = rng.uniform(0, 2 * np.pi, 7)
    freq = np.where(np.arange(7) % 2 == 0, 1.0, 2.0) * max(cycles, 1)
    if loop:
        freq = np.round(freq)  # integer cycles -> closed path
    ts = np.arange(n_frames) / max(n_frames - 1, 1)
    theta = 2 * np.pi * ts[:, None] * freq[None, :] + phase[None, :]
    xs = a[None, :] * (np.sin(theta) - np.sin(phase)[None, :])
    return sim3.exp(jnp.asarray(xs.astype(np.float32)))


class SyntheticSequence:
    """Rendered clip with ground truth, presented like a dataset."""

    def __init__(self, n_frames=20, h=48, w=64, seed=0, traj_scale=0.02,
                 loop=False, scene="smooth", cycles=1):
        self.h, self.w = h, w
        self.K = make_K(h, w)
        self.scene = scene
        self.T_WC = make_trajectory(n_frames, traj_scale, seed, loop,
                                    cycles)
        self.images = []
        self.X_cam = []
        self.X_world = []
        for i in range(n_frames):
            rgb, Xc, Xw = render_view(self.T_WC[i], h, w, self.K, scene)
            self.images.append(rgb)
            self.X_cam.append(Xc)
            self.X_world.append(Xw)
        self.timestamps = [float(i) / 30.0 for i in range(n_frames)]

    def __len__(self):
        return len(self.images)

    def save(self, path):
        """Serialize GT geometry so OracleEngine can be driven from a clip
        directory (scripts/make_synthetic_clip.py writes this)."""
        np.savez_compressed(
            path,
            T_WC=np.asarray(self.T_WC),
            X_cam=np.stack(self.X_cam),
            X_world=np.stack(self.X_world),
            K=self.K, h=self.h, w=self.w,
            timestamps=np.asarray(self.timestamps),
        )

    @classmethod
    def load(cls, path):
        d = np.load(path)
        obj = cls.__new__(cls)
        obj.h, obj.w = int(d["h"]), int(d["w"])
        obj.K = d["K"]
        obj.T_WC = jnp.asarray(d["T_WC"])
        obj.X_cam = list(d["X_cam"])
        obj.X_world = list(d["X_world"])
        obj.images = []
        obj.timestamps = list(d["timestamps"])
        return obj

    def write_gt(self, path):
        """TUM-format ground-truth trajectory."""
        T = np.asarray(self.T_WC)
        q = T[:, 3:7]
        q = q / np.linalg.norm(q, axis=-1, keepdims=True)
        with open(path, "w") as f:
            for i in range(len(self.images)):
                x, y, z = T[i, :3]
                qx, qy, qz, qw = q[i]
                f.write(f"{self.timestamps[i]} {x} {y} {z} "
                        f"{qx} {qy} {qz} {qw}\n")


class OracleEngine:
    """Drop-in InferenceEngine replacement producing decode outputs from the
    synthetic ground truth.

    Frame identity is carried through the ``feat`` vector: feat[0, 0] holds
    the frame index (the rest of the feature rows are unused).  noise_std
    perturbs the pointmaps to emulate network error.
    """

    N_PATCHES = 16
    FEAT_DIM = 32

    def __init__(self, seq: SyntheticSequence, noise_std: float = 0.0,
                 match_noise_px: int = 0, seed: int = 0,
                 blackout_frames=(), export_desc: bool = False):
        self.seq = seq
        self.h, self.w = seq.h, seq.w
        self.hw = self.h * self.w
        self.K = jnp.asarray(seq.K)
        self.noise_std = noise_std
        self.match_noise_px = match_noise_px
        self.rng = np.random.default_rng(seed)
        self._encode_counter = 0
        self.downsample = 1
        self.img_hw = (self.h, self.w)
        self.n_patches = self.N_PATCHES
        self.feat_dim = self.FEAT_DIM
        # frames whose matches are wiped (tracking-failure injection for
        # relocalization tests)
        self.blackout_frames = set(blackout_frames)
        # export_desc: also emit q8 WORLD descriptors (geometric ladder —
        # globally unique) from match_asymmetric, activating the engine's
        # descriptor-dependent production paths (pose-warped consecutive
        # edge + desc_global retrieval edges) in oracle drives.  Off by
        # default so the plain oracle fixtures keep exercising the
        # fallback (decode) paths.
        self.export_desc = bool(export_desc)
        self._desc_cache: dict = {}

    # -- InferenceEngine interface ----------------------------------------

    def view_signature(self, i):
        """Content-based coarse view descriptor: subsampled world points —
        similar viewpoints get similar retrieval features."""
        Xw = self.seq.X_world[i]
        n = self.N_PATCHES * self.FEAT_DIM
        stride = max(1, (len(Xw) * 3) // n)
        flat = Xw.reshape(-1)[::stride][:n]
        sig = np.zeros(n, np.float32)
        sig[: len(flat)] = flat
        return sig.reshape(self.N_PATCHES, self.FEAT_DIM)

    def encode(self, img):
        i = self._encode_counter
        self._encode_counter += 1
        feat = self.view_signature(i).copy()
        feat[0, 0] = i  # frame identity channel (read by the oracle matcher)
        return (jnp.asarray(feat[None]),
                jnp.zeros((1, self.N_PATCHES, 2), jnp.int32))

    def _pointmap(self, i):
        X = self.seq.X_cam[i]
        if self.noise_std > 0:
            X = X + self.rng.normal(
                0, self.noise_std, X.shape
            ).astype(np.float32)
        return X

    def _rel_pointmap(self, i, j):
        """Pointmap of camera j's pixels expressed in camera i's frame
        (the decoder's res21 semantics)."""
        T_CiCj = sim3.rel(self.seq.T_WC[i], self.seq.T_WC[j])
        return np.asarray(sim3.act(T_CiCj, jnp.asarray(self._pointmap(j))))

    def _match(self, i, j):
        """idx mapping camera-j pixels -> camera-i pixel indices via true
        projection (with optional pixel noise), plus validity.  A
        projected point whose target pixel sees DIFFERENT geometry
        (occlusion — the slab or a cliff wall in front of it) is marked
        invalid, mirroring the reference matcher's 3D-distance occlusion
        gate (matching.py:71-76)."""
        Xc_i = np.asarray(
            sim3.act(sim3.inv(self.seq.T_WC[i]),
                     jnp.asarray(self.seq.X_world[j]))
        )
        uvz = (self.seq.K @ Xc_i.T).T
        u = np.round(uvz[:, 0] / uvz[:, 2]).astype(np.int64)
        v = np.round(uvz[:, 1] / uvz[:, 2]).astype(np.int64)
        if self.match_noise_px:
            u += self.rng.integers(-self.match_noise_px,
                                   self.match_noise_px + 1, u.shape)
            v += self.rng.integers(-self.match_noise_px,
                                   self.match_noise_px + 1, v.shape)
        inside = (u >= 0) & (u < self.w) & (v >= 0) & (v < self.h) \
            & (Xc_i[:, 2] > 0)
        idx = np.where(inside, v * self.w + u, 0).astype(np.int32)
        # occlusion gate: the point view i actually renders at the target
        # pixel must be (near) the projected point
        seen = self.seq.X_world[i][idx]
        d3 = np.linalg.norm(seen - self.seq.X_world[j], axis=-1)
        pix = np.linalg.norm(self.seq.X_cam[i][idx], axis=-1) / max(
            float(self.seq.K[0, 0]), 1.0)  # ~1-pixel 3D footprint
        inside &= d3 < np.maximum(0.1, 3.0 * pix)
        return idx, inside

    @staticmethod
    def _fid(feat):
        return int(np.asarray(feat[0, 0, 0]))

    def _desc8(self, i):
        """(1, hw, 24) int8 q8 world descriptors of view i (cached).

        base_wavelength is FOOTPRINT-scaled (~3 pixel footprints at the
        typical scene depth): real MASt3R descriptors discriminate at
        pixel granularity at any input resolution, so the fixture must
        too — a fixed base (0.35 m ~ 36 footprints at 384x512) makes
        neighboring pixels indistinguishable and was measured to poison
        BA through the desc_global path at production res."""
        if i not in self._desc_cache:
            footprint = 4.0 / float(self.seq.K[0, 0])
            D = world_descriptors(self.seq.X_world[i], geometric=True,
                                  base_wavelength=3.0 * footprint)
            self._desc_cache[i] = jnp.asarray(
                np.clip(np.round(D * 127.0), -127, 127).astype(np.int8)[None]
            )
        return self._desc_cache[i]

    def match_asymmetric(self, frame_feat, frame_pos, kf_feat, kf_pos,
                         idx_i2j_init=None):
        fi = self._fid(frame_feat)
        ki = self._fid(kf_feat)
        Xff = self._pointmap(fi)
        Xkf = self._rel_pointmap(fi, ki)  # kf points in frame coords
        idx, inside = self._match(fi, ki)
        if fi in self.blackout_frames:
            inside = np.zeros_like(inside)
        ones = np.ones((1, self.hw, 1), np.float32)
        outs = (
            jnp.asarray(idx[None]),
            jnp.asarray(inside[None, :, None]),
            jnp.asarray(Xff[None]), jnp.asarray(10.0 * ones),
            jnp.asarray(4.0 * ones),
            jnp.asarray(Xkf[None]), jnp.asarray(10.0 * ones),
            jnp.asarray(4.0 * ones),
        )
        if self.export_desc:
            outs = outs + (self._desc8(fi), self._desc8(ki))
        return outs

    def inference_mono(self, feat, pos):
        fi = self._fid(feat)
        X = self._pointmap(fi)
        return (jnp.asarray(X[None]),
                jnp.full((1, self.hw, 1), 10.0, jnp.float32))

    def match_symmetric(self, feat_i, pos_i, feat_j, pos_j, params=None):
        B = feat_i.shape[0]
        idx_i2j = np.zeros((B, self.hw), np.int32)
        idx_j2i = np.zeros((B, self.hw), np.int32)
        vm_j = np.zeros((B, self.hw), bool)
        vm_i = np.zeros((B, self.hw), bool)
        for b in range(B):
            fi = self._fid(feat_i[b:b + 1])
            fj = self._fid(feat_j[b:b + 1])
            idx_i2j[b], vm_j[b] = self._match(fi, fj)
            idx_j2i[b], vm_i[b] = self._match(fj, fi)
        Q = jnp.full((B, self.hw, 1), 4.0, jnp.float32)
        return (
            jnp.asarray(idx_i2j), jnp.asarray(idx_j2i),
            jnp.asarray(vm_j[..., None]), jnp.asarray(vm_i[..., None]),
            Q, Q, Q, Q,
        )


def make_oracle_retrieval(seq: SyntheticSequence, engine: OracleEngine,
                          codebook_size: int = 64, nfeat: int = 16):
    """RetrievalDatabase over the oracle's content-based view signatures:
    a random-init retrieval head + a codebook trained on the sequence's own
    features (checkpoint-free loop-closure testing)."""
    import jax

    from .retrieval.asmk import Codebook
    from .retrieval.database import RetrievalDatabase
    from .retrieval.model import RetrievalParams

    d = engine.FEAT_DIM
    params = RetrievalParams.random(jax.random.PRNGKey(0), d_in=d, hdims=(d,))
    feats = np.concatenate(
        [engine.view_signature(i) for i in range(len(seq.X_world))]
    )
    codebook = Codebook.train(feats, codebook_size, n_iter=5)
    return RetrievalDatabase(params, codebook, nfeat=nfeat)
