"""Factor graph and global pointmap bundle adjustment driver.

Capability parity with `/root/reference/mast3r_slam/global_opt.py`
(FactorGraph: edge store, add_factors with symmetric decode+match+gating,
two-way edge prep, GN solves, pose write-back) — TPU redesign:

* edge state lives in padded fixed-shape DEVICE arrays; writes are masked
  scatters with donated buffers (no reallocation), and solves slice the
  arrays with power-of-two edge buckets so one compiled executable per
  (edge-bucket, pose-bucket) size class serves the whole run — nothing in
  the hot path runs eagerly (eager dispatch is a remote compile on TPU);
* ``add_factors`` decodes ALL candidate edges in one 2E-batch forward
  (the reference loops per edge, mast3r_utils.py:113-147);
* the GN solve is `ops.ba.gauss_newton` — fully on device, replacing the
  reference's GPU->CPU Eigen SimplicialLLT round trip
  (gn_kernels.cu:57-159);
* pose write-back scatters only the non-pinned unique keyframes
  (global_opt.py:160-161, 223-224).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .frame import KeyframeArena, arena_update_poses
from .inference import InferenceEngine
from .ops import ba
from .ops import matching as matching_ops
from .ops.geometry import constrain_points_to_ray


def _next_bucket(n: int, minimum: int = 1) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3, 4, 5),
                   static_argnames=())
def _write_edges(idx_ii2jj, idx_jj2ii, vmj, vmi, Qj_arr, Qi_arr,
                 slots, new_idx_i2j, new_idx_j2i, new_vmj, new_vmi,
                 new_Qj, new_Qi):
    """Masked batch append into the edge arrays.  slots[b] >= E_max drops
    the row (rejected edge)."""
    return (
        idx_ii2jj.at[slots].set(new_idx_i2j, mode="drop"),
        idx_jj2ii.at[slots].set(new_idx_j2i, mode="drop"),
        vmj.at[slots].set(new_vmj, mode="drop"),
        vmi.at[slots].set(new_vmi, mode="drop"),
        Qj_arr.at[slots].set(new_Qj, mode="drop"),
        Qi_arr.at[slots].set(new_Qi, mode="drop"),
    )


@jax.jit
def _gate_edges(idx_i2j, idx_j2i, valid_match_j, valid_match_i,
                Qii, Qjj, Qji, Qij, Q_conf):
    """Per-edge confidence products and two-directional match fractions
    (global_opt.py:55-68)."""
    Qj = jnp.sqrt(
        jnp.take_along_axis(Qii[..., 0], idx_i2j, axis=1) * Qji[..., 0]
    )
    Qi = jnp.sqrt(
        jnp.take_along_axis(Qjj[..., 0], idx_j2i, axis=1) * Qij[..., 0]
    )
    valid_j = valid_match_j[..., 0] & (Qj > Q_conf)
    valid_i = valid_match_i[..., 0] & (Qi > Q_conf)
    return (Qj, Qi, valid_j.mean(axis=1), valid_i.mean(axis=1))


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _gate_edges_sub(idx_i2j, idx_j2i, valid_match_j, valid_match_i,
                    Qii, Qjj, Qji, Qij, Q_conf, h, w):
    """_gate_edges for SUBGRID edge matches (matching
    edge_query_subsample=2): idx/valid arrive on the (::2, ::2) query
    grid; the resident-side Q is subsampled to the same grid for the
    weight product, the match fractions are computed on the subgrid (an
    unbiased estimate of the full-grid fraction), and the outputs are
    scattered back into full-size (B, hw) arrays — odd pixels invalid —
    so the edge store and BA (whose points_subsample=4 pattern reads
    exactly the even pixels) are layout-compatible and bitwise-identical
    to a full-grid match."""
    B = idx_i2j.shape[0]

    def sub(A):
        return A.reshape(B, h, w)[:, ::2, ::2].reshape(B, -1)

    def expand(A, fill):
        out = jnp.full((B, h // 2, 2, w // 2, 2) + A.shape[2:],
                       fill, A.dtype)
        out = out.at[:, :, 0, :, 0].set(
            A.reshape((B, h // 2, w // 2) + A.shape[2:]))
        return out.reshape((B, h * w) + A.shape[2:])

    Qj_s = jnp.sqrt(
        jnp.take_along_axis(Qii[..., 0], idx_i2j, axis=1) * sub(Qji[..., 0])
    )
    Qi_s = jnp.sqrt(
        jnp.take_along_axis(Qjj[..., 0], idx_j2i, axis=1) * sub(Qij[..., 0])
    )
    valid_j = valid_match_j[..., 0] & (Qj_s > Q_conf)
    valid_i = valid_match_i[..., 0] & (Qi_s > Q_conf)
    return (
        expand(idx_i2j, 0), expand(idx_j2i, 0),
        expand(valid_match_j, False), expand(valid_match_i, False),
        expand(Qj_s, 0.0), expand(Qi_s, 0.0),
        valid_j.mean(axis=1), valid_i.mean(axis=1),
    )


@jax.jit
def _dir_weight(idx, Q_src, Q_res):
    """One-direction full-grid edge weight (the reused tracker direction
    of a mixed-resolution consecutive edge)."""
    return jnp.sqrt(
        jnp.take_along_axis(Q_src[..., 0], idx, axis=1) * Q_res[..., 0])


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _dir_weight_sub(idx, vm, Q_src, Q_res, h, w):
    """One-direction edge weight for a subgrid match (the pose-warped
    consecutive edge): Qdir = sqrt(Q_src[idx] * Q_res|subgrid), outputs
    scattered to full size like _gate_edges_sub."""
    B = idx.shape[0]
    Q_res_s = Q_res[..., 0].reshape(B, h, w)[:, ::2, ::2].reshape(B, -1)
    Qd = jnp.sqrt(
        jnp.take_along_axis(Q_src[..., 0], idx, axis=1) * Q_res_s)

    def expand(A, fill):
        out = jnp.full((B, h // 2, 2, w // 2, 2) + A.shape[2:],
                       fill, A.dtype)
        out = out.at[:, :, 0, :, 0].set(
            A.reshape((B, h // 2, w // 2) + A.shape[2:]))
        return out.reshape((B, h * w) + A.shape[2:])

    return expand(idx, 0), expand(vm, False), expand(Qd, 0.0)


@jax.jit
def _write_poses(T_arena, Twc_new, upd_idx):
    """Scatter optimized poses back into the arena; out-of-range indices
    (pinned/padded rows) are dropped.  NOT donating: the pose table is tiny
    (buffer x 8 floats) and the un-donated old buffer is what makes the
    threaded frontend/backend overlap safe (the frontend may hold a
    reference to the pre-solve arena pytree)."""
    return T_arena.at[upd_idx].set(Twc_new, mode="drop")


def _prep_system(X_arena, C_arena, N_arena, T_arena,
                 idx_ii2jj, idx_jj2ii, vmj, vmi, Qj_arr, Qi_arr,
                 uidx, K, E_bucket, img_wh, use_calib):
    """Slice edge arrays to the bucket, build the two-way system, and gather
    the compact pose/point set (shared by the single-device and sharded
    solve paths)."""
    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, 0, E_bucket, axis=0)

    idx2 = jnp.concatenate([sl(idx_ii2jj), sl(idx_jj2ii)], axis=0)
    vm2 = jnp.concatenate([sl(vmj), sl(vmi)], axis=0)
    Q2 = jnp.concatenate([sl(Qj_arr), sl(Qi_arr)], axis=0)

    Xs = X_arena[uidx]
    Cs = C_arena[uidx, :, 0] / jnp.maximum(N_arena[uidx], 1)[:, None]
    Twc = T_arena[uidx]
    if use_calib:
        w, h = img_wh
        Xs = constrain_points_to_ray((h, w), Xs, K)
    return Twc, Xs, Cs, idx2, vm2, Q2


@functools.partial(
    jax.jit,
    static_argnames=("E_bucket", "residual_type", "img_wh", "cfg",
                     "use_calib"),
)
def _prep_and_solve(X_arena, C_arena, N_arena, T_arena,
                    idx_ii2jj, idx_jj2ii, vmj, vmi, Qj_arr, Qi_arr,
                    uidx, ii2, jj2, edge_valid, K,
                    E_bucket: int, residual_type: str, img_wh,
                    cfg: ba.BAConfig, use_calib: bool):
    """Prep + single-device GN solve — one fused executable."""
    Twc, Xs, Cs, idx2, vm2, Q2 = _prep_system(
        X_arena, C_arena, N_arena, T_arena, idx_ii2jj, idx_jj2ii,
        vmj, vmi, Qj_arr, Qi_arr, uidx, K, E_bucket, img_wh, use_calib,
    )
    return ba.gauss_newton(
        Twc, Xs, Cs, ii2, jj2, idx2, vm2, Q2, edge_valid, K,
        residual_type, img_wh, cfg,
    )


@functools.partial(
    jax.jit,
    static_argnames=("E_bucket", "residual_type", "img_wh", "cfg",
                     "use_calib"),
)
def _prep_and_solve_cached(X_arena, T_arena,
                           pre_Xi_f, pre_sqw_f, pre_ind_f,
                           pre_Xi_r, pre_sqw_r, pre_ind_r,
                           uidx, ii2, jj2, K,
                           E_bucket: int, residual_type: str, img_wh,
                           cfg: ba.BAConfig, use_calib: bool):
    """GN solve consuming the incremental pregather cache: the expensive
    permuted-side gathers (pre_Xi/sqw/ind, forward and reverse directions)
    come from the cache; only the cheap raster-side rows (contiguous
    keyframe pointmaps) and the compact pose set are rebuilt per solve.
    Unoccupied cache slots have zero sqw and contribute nothing."""
    s = max(int(cfg.points_subsample), 1)

    def sl(a):
        return jax.lax.dynamic_slice_in_dim(a, 0, E_bucket, axis=0)

    Xi2 = jnp.concatenate([sl(pre_Xi_f), sl(pre_Xi_r)], axis=0)
    sqw2 = jnp.concatenate([sl(pre_sqw_f), sl(pre_sqw_r)], axis=0)
    ind2 = jnp.concatenate([sl(pre_ind_f), sl(pre_ind_r)], axis=0)

    Xs = X_arena[uidx]
    Twc = T_arena[uidx]
    if use_calib:
        w, h = img_wh
        Xs = constrain_points_to_ray((h, w), Xs, K)
    Xj2 = jnp.moveaxis(ba.subsample_points(Xs[jj2], s, img_wh), -1, 1)
    pad = Xi2.shape[-1] - Xj2.shape[-1]
    if pad:
        Xj2 = jnp.pad(Xj2, ((0, 0), (0, 0), (0, pad)))
    pre = ba.EdgeData(Xi2, Xj2, sqw2, ind2)
    return ba.gauss_newton_from_pre(Twc, pre, ii2, jj2, K, residual_type,
                                    img_wh, cfg)


@functools.partial(
    jax.jit,
    static_argnames=("R_bucket", "img_wh", "cfg", "use_calib"),
    donate_argnums=(0, 1, 2, 3, 4, 5),
)
def _refresh_pre_rows(pre_Xi_f, pre_sqw_f, pre_ind_f,
                      pre_Xi_r, pre_sqw_r, pre_ind_r,
                      X_arena, C_arena, N_arena, K,
                      idx_ii2jj, idx_jj2ii, vmj, vmi, Qj_arr, Qi_arr,
                      slot_arr, uidx_r, ii_l, jj_l,
                      R_bucket: int, img_wh, cfg: ba.BAConfig,
                      use_calib: bool):
    """Recompute the cached pregather rows for the edge slots in
    ``slot_arr`` (padded rows carry slot >= capacity and are dropped by the
    scatter).  ``uidx_r``/``ii_l``/``jj_l``: compact keyframe set of the
    refresh batch."""
    Xs = X_arena[uidx_r]
    Cs = C_arena[uidx_r, :, 0] / jnp.maximum(N_arena[uidx_r], 1)[:, None]
    if use_calib:
        w, h = img_wh
        Xs = constrain_points_to_ray((h, w), Xs, K)
    ev = jnp.ones((R_bucket,), bool)
    C = min(cfg.chunk_points, idx_ii2jj.shape[1])
    rows = lambda a: a[slot_arr]
    pre_f = ba._pregather_edges(Xs, Cs, ii_l, jj_l, rows(idx_ii2jj),
                                rows(vmj), rows(Qj_arr), ev, cfg, C,
                                img_wh)
    pre_r = ba._pregather_edges(Xs, Cs, jj_l, ii_l, rows(idx_jj2ii),
                                rows(vmi), rows(Qi_arr), ev, cfg, C,
                                img_wh)
    up = lambda store, new: store.at[slot_arr].set(new, mode="drop")
    return (
        up(pre_Xi_f, pre_f.Xi), up(pre_sqw_f, pre_f.sqw),
        up(pre_ind_f, pre_f.ind),
        up(pre_Xi_r, pre_r.Xi), up(pre_sqw_r, pre_r.sqw),
        up(pre_ind_r, pre_r.ind),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "shard_mode", "E_bucket", "residual_type",
                     "img_wh", "cfg", "use_calib"),
)
def _prep_and_solve_sharded(X_arena, C_arena, N_arena, T_arena,
                            idx_ii2jj, idx_jj2ii, vmj, vmi, Qj_arr, Qi_arr,
                            uidx, ii2, jj2, edge_valid, K,
                            mesh, shard_mode: str, E_bucket: int,
                            residual_type: str, img_wh,
                            cfg: ba.BAConfig, use_calib: bool):
    """Prep + DISTRIBUTED GN solve over the mesh's 'edge' axis:
    shard_mode 'edge' shards the per-edge Hessian accumulation
    (parallel.sharded_ba.sharded_gauss_newton — one psum of the pose
    system per iteration); 'map' additionally shards the keyframe
    pointmaps over devices (sharded_gauss_newton_mapshard — the
    map-outgrows-one-chip tier)."""
    from .parallel.sharded_ba import (
        sharded_gauss_newton,
        sharded_gauss_newton_mapshard,
    )

    Twc, Xs, Cs, idx2, vm2, Q2 = _prep_system(
        X_arena, C_arena, N_arena, T_arena, idx_ii2jj, idx_jj2ii,
        vmj, vmi, Qj_arr, Qi_arr, uidx, K, E_bucket, img_wh, use_calib,
    )
    fn = sharded_gauss_newton if shard_mode == "edge" else \
        sharded_gauss_newton_mapshard
    return fn(
        mesh, Twc, Xs, Cs, ii2, jj2, idx2, vm2, Q2, edge_valid, K,
        residual_type, img_wh, cfg, return_stats=True,
    )


class FactorGraph:
    """Host-driven factor graph over the keyframe arena (reference
    FactorGraph, global_opt.py:14-226).  window_size follows the reference
    default (unbounded)."""

    def __init__(self, engine: InferenceEngine, hw: int, cfg: dict,
                 K=None, device=None, params=None, mesh=None,
                 shard_mode: str = "edge"):
        """``device``/``params``: optional backend-chip placement for the
        two-device frontend/backend split (pipeline.py): edge state lives
        on ``device`` and the symmetric decode runs there with ``params``
        (that chip's copy of the weights), so backend rounds steal no
        frontend device time.

        ``mesh``: optional jax.sharding.Mesh with an 'edge' axis — the BA
        solve then runs DISTRIBUTED (parallel/sharded_ba.py): 'edge' mode
        shards the per-edge Hessian accumulation, 'map' mode additionally
        shards the keyframe pointmaps over devices.  Mutually exclusive
        with ``device`` (the two-device split)."""
        if mesh is not None and device is not None:
            raise ValueError(
                "FactorGraph: mesh-sharded BA and backend-device placement "
                "are mutually exclusive (the mesh jit spans all its "
                "devices; run the sharded BA on the full mesh instead)")
        self.engine = engine
        self.device = device
        self.params = params
        self.mesh = mesh
        self.shard_mode = shard_mode
        self._mesh_D = (
            int(mesh.shape["edge"]) if mesh is not None else 1
        )
        self.cfg = ba.BAConfig.from_config(cfg)
        self.local_cfg = cfg["local_opt"]
        # decode-free pose-warped consecutive edge (_add_consecutive_reused)
        self.reuse_warp = bool(self.local_cfg.get("reuse_warp", True))
        # retrieval-edge matching mode: "sym" = the reference's symmetric
        # 2E-batch decode+match; "desc_global" = pose-free global matching
        # from stored per-keyframe q8 descriptor tables
        # (ops.matching.match_desc_global) — decode-free, so the largest
        # single-thread protocol term (the 4-decoder-pass loop-closure
        # edge, mast3r_utils.py:113-147) collapses to one MXU argmax +
        # refine.  Keyframes without stored descriptors (INIT before
        # backfill, reloc-added) fall back to sym per batch.
        self.retrieval_edge_mode = str(
            self.local_cfg.get("retrieval_edge_mode", "sym"))
        self.desc_store: dict = {}
        # engines without a match_cfg (oracle harness) still honor the
        # config's matching section for the desc_global path
        try:
            self._match_cfg = getattr(engine, "match_cfg", None) or \
                matching_ops.MatchingConfig.from_dict(cfg["matching"])
        except (KeyError, TypeError):  # reduced test configs
            self._match_cfg = matching_ops.MatchingConfig()
        if self._match_cfg.edge_query_subsample != 2:
            # desc_global emits the edge_query_subsample=2 subgrid layout
            self.retrieval_edge_mode = "sym"

        @functools.partial(jax.jit, static_argnames=("h", "w"))
        def _mdg(D8i, D8j, dci, dcj, h, w):
            return matching_ops.match_desc_global(
                D8i, D8j, dci, dcj, h, w, cfg=self._match_cfg,
            )

        self._mdg_jit = _mdg
        self.max_edges = int(self.local_cfg.get("max_edges", 256))
        self.min_match_frac = float(self.local_cfg["min_match_frac"])
        self.hw = hw
        self.K = K
        self.use_calib = K is not None

        E = self.max_edges
        self.ii = np.zeros((E,), np.int32)
        self.jj = np.zeros((E,), np.int32)
        self.n_edges = 0
        put = (lambda a: jax.device_put(a, device)) if device is not None \
            else (lambda a: a)
        self._put = put
        self.idx_ii2jj = put(jnp.zeros((E, hw), jnp.int32))
        self.idx_jj2ii = put(jnp.zeros((E, hw), jnp.int32))
        self.valid_match_j = put(jnp.zeros((E, hw), bool))
        self.valid_match_i = put(jnp.zeros((E, hw), bool))
        self.Q_ii2jj = put(jnp.zeros((E, hw), jnp.float32))
        self.Q_jj2ii = put(jnp.zeros((E, hw), jnp.float32))

        # Incremental pregather cache (local_opt.cache_pregather, default
        # on): keyframe pointmaps are immutable once a newer keyframe
        # exists, so the permuted-side gathers — the dominant cost of a
        # backend round on TPU (row-count-bound gather engine) — are kept
        # per edge slot across rounds and refreshed only for edges whose
        # endpoint keyframe changed (tracked via arena.N_updates) or that
        # are new.  Disabled under mesh sharding (those solvers pregather
        # inside the shard_map).
        self.cache_pre = (
            bool(self.local_cfg.get("cache_pregather", True))
            and mesh is None
        )
        if self.cache_pre:
            s = max(int(self.cfg.points_subsample), 1)
            n_sub = -(-hw // s)
            C = min(self.cfg.chunk_points, hw)
            self._Np = n_sub + (-n_sub % C)
            self._alloc_pre(E)
            self._pre_fresh = np.zeros((E,), bool)
            self._nupd_seen: dict = {}
            # residual mode the cached rows were built for (the constrain-
            # points-to-ray prep differs between ray and calib solves)
            self._pre_calib: bool | None = None

    # -- edge construction --------------------------------------------------

    def _alloc_pre(self, E: int):
        Np = self._Np
        put = self._put
        self.pre_Xi_f = put(jnp.zeros((E, 3, Np), jnp.float32))
        self.pre_sqw_f = put(jnp.zeros((E, Np), jnp.float32))
        self.pre_ind_f = put(jnp.zeros((E, Np), jnp.int32))
        self.pre_Xi_r = put(jnp.zeros((E, 3, Np), jnp.float32))
        self.pre_sqw_r = put(jnp.zeros((E, Np), jnp.float32))
        self.pre_ind_r = put(jnp.zeros((E, Np), jnp.int32))

    def _grow(self, needed: int):
        """Grow the edge store to the next power-of-two bucket >= needed.
        The reference grows its edge tensors unbounded per add
        (global_opt.py:91-98); here growth happens once per size class so
        the jitted write/solve executables recompile at most
        log2(final/initial) times over a whole run."""
        E2 = _next_bucket(needed, self.max_edges * 2)
        pad = E2 - self.max_edges
        self.ii = np.concatenate([self.ii, np.zeros((pad,), np.int32)])
        self.jj = np.concatenate([self.jj, np.zeros((pad,), np.int32)])

        def grow(a):
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
            )

        self.idx_ii2jj = grow(self.idx_ii2jj)
        self.idx_jj2ii = grow(self.idx_jj2ii)
        self.valid_match_j = grow(self.valid_match_j)
        self.valid_match_i = grow(self.valid_match_i)
        self.Q_ii2jj = grow(self.Q_ii2jj)
        self.Q_jj2ii = grow(self.Q_jj2ii)
        if self.cache_pre:
            self.pre_Xi_f = grow(self.pre_Xi_f)
            self.pre_sqw_f = grow(self.pre_sqw_f)
            self.pre_ind_f = grow(self.pre_ind_f)
            self.pre_Xi_r = grow(self.pre_Xi_r)
            self.pre_sqw_r = grow(self.pre_sqw_r)
            self.pre_ind_r = grow(self.pre_ind_r)
            self._pre_fresh = np.concatenate(
                [self._pre_fresh, np.zeros((pad,), bool)]
            )
        self.max_edges = E2

    def store_desc(self, row: int, desc8, dconf, h: int, w: int):
        """Persist a keyframe's canonical q8 descriptor table + descriptor
        confidence for the pose-free desc_global retrieval-edge matcher.
        desc8: (1, h*w, f) int8; dconf: (1, h*w, 1) float.  Rows are
        immutable once stored (keyframe descriptors never change)."""
        if self.retrieval_edge_mode != "desc_global" or row in \
                self.desc_store:
            return
        d8 = jnp.asarray(desc8).reshape(1, h, w, -1)
        dc = jnp.asarray(dconf, jnp.float32).reshape(1, h * w, 1)
        if self.device is not None:
            d8, dc = jax.device_put((d8, dc), self.device)
        self.desc_store[row] = (d8, dc)

    def add_factors(self, arena: KeyframeArena, ii, jj, min_match_frac,
                    is_reloc: bool = False, reuse=None) -> bool:
        """Symmetric decode+match + two-directional gating
        (global_opt.py:32-101).  Returns True if any edge was added.

        ``reuse``: optional dict {pair: (i, j), idx_j2i, valid_i, Qjj,
        Qij} — the tracker's frame->keyframe direction for the consecutive
        edge (i, j).  That edge is then completed with ONE asymmetric
        decode+match (the i->j direction) instead of the full symmetric
        2E-batch, halving the decode and matcher work of a keyframe round
        (the reference recomputes both directions, mast3r_utils.py:149-187;
        consecutive edges are accepted unconditionally by the gating at
        global_opt.py:73-76, so reusing the tracker's converged warm-start
        matches is behavior-preserving up to matcher warm-start identity)."""
        if len(ii) == 0:
            return False
        if reuse is not None and not is_reloc:
            pi, pj = reuse["pair"]
            rest = [(a, b) for a, b in zip(ii, jj)
                    if (int(a), int(b)) != (pi, pj)]
            if len(rest) < len(ii):  # the pair is among the candidates
                added = self._add_consecutive_reused(arena, pi, pj, reuse)
                if rest:
                    ra = self.add_factors(
                        arena, [a for a, _ in rest], [b for _, b in rest],
                        min_match_frac, is_reloc,
                    )
                    added = added or ra
                return added
            # stale bundle for a different pair: fall through to full path
        ii = list(map(int, ii))
        jj = list(map(int, jj))
        B = len(ii)
        B_pad = _next_bucket(B, 1)
        ii_pad = ii + [ii[0]] * (B_pad - B)
        jj_pad = jj + [jj[0]] * (B_pad - B)
        sel_i = jnp.asarray(ii_pad, jnp.int32)
        sel_j = jnp.asarray(jj_pad, jnp.int32)

        use_desc = (
            self.retrieval_edge_mode == "desc_global" and not is_reloc
            and all(r in self.desc_store for r in set(ii) | set(jj))
        )
        if use_desc:
            self.n_desc_batches = getattr(self, "n_desc_batches", 0) + 1
            h_img, w_img = arena.img_hw
            # PER-EDGE calls, not one B-batch: a B=2 batch measures 2.6x
            # the B=1 cost on v5e (36.6 vs 13.9 ms — the refine stages'
            # working set spills, the same reason the sym decode scans
            # per edge with lax.map); B sequential E=1 programs are
            # strictly cheaper and recompile-free (fixed shapes)
            per = [
                self._mdg_jit(self.desc_store[a][0],
                              self.desc_store[b][0],
                              self.desc_store[a][1],
                              self.desc_store[b][1],
                              h=h_img, w=w_img)
                for a, b in zip(ii_pad, jj_pad)
            ]
            (idx_i2j, idx_j2i, valid_match_j, valid_match_i,
             Qii, Qjj, Qji, Qij) = (
                jnp.concatenate([p[k] for p in per], axis=0)
                for k in range(8))
        else:
            kw = {} if self.params is None else {"params": self.params}
            (idx_i2j, idx_j2i, valid_match_j, valid_match_i,
             Qii, Qjj, Qji, Qij) = self.engine.match_symmetric(
                arena.feat[sel_i], arena.pos[sel_i],
                arena.feat[sel_j], arena.pos[sel_j],
                **kw,
            )
        if idx_i2j.shape[1] * 4 == Qii.shape[1]:
            # subgrid edge match (matching.edge_query_subsample=2):
            # gate on the subgrid, scatter into full-size edge arrays
            h_img, w_img = arena.img_hw
            (idx_i2j, idx_j2i, valid_match_j, valid_match_i, Qj, Qi,
             match_frac_j, match_frac_i) = _gate_edges_sub(
                idx_i2j, idx_j2i, valid_match_j, valid_match_i,
                Qii, Qjj, Qji, Qij, self.cfg.Q_conf, h_img, w_img,
            )
        else:
            Qj, Qi, match_frac_j, match_frac_i = _gate_edges(
                idx_i2j, idx_j2i, valid_match_j, valid_match_i,
                Qii, Qjj, Qji, Qij, self.cfg.Q_conf,
            )

        mfj = np.asarray(match_frac_j)[:B]
        mfi = np.asarray(match_frac_i)[:B]
        ii_np = np.asarray(ii)
        jj_np = np.asarray(jj)
        # both directions must clear the threshold (global_opt.py:73-76)
        invalid = np.minimum(mfj, mfi) < min_match_frac
        consecutive = ii_np == (jj_np - 1)
        invalid = (~consecutive) & invalid
        if invalid.any() and is_reloc:
            return False

        accept = ~invalid
        n_new = int(accept.sum())
        if use_desc and invalid.any():
            # SYM FALLBACK: the desc_global gates are deliberately
            # conservative (cos floor + ratio + mutual + multiplicity) —
            # an edge they reject may still be a real loop closure the
            # reference's decoded match would keep (hard viewpoint
            # change, descriptor-space ambiguity).  Retry ONLY the
            # rejected pairs through the exact symmetric decode path, so
            # conservative desc gating can never lose an edge — worst
            # case it costs what the sym path always cost.
            self.n_desc_fallbacks = getattr(self, "n_desc_fallbacks", 0) \
                + int(invalid.sum())
            retry_ii = [int(a) for a, bad in zip(ii, invalid) if bad]
            retry_jj = [int(b) for b, bad in zip(jj, invalid) if bad]
            ra = self._add_factors_sym(arena, retry_ii, retry_jj,
                                       min_match_frac)
            if n_new == 0:
                return ra
        if n_new == 0:
            return False
        if self.n_edges + n_new > self.max_edges:
            self._grow(self.n_edges + n_new)

        # slot per batch row: next free slot for accepted, E_max (drop) else
        slots = np.full((B_pad,), self.max_edges, np.int64)
        slots[:B][accept] = self.n_edges + np.arange(n_new)
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = _write_edges(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(slots), idx_i2j, idx_j2i,
            valid_match_j[..., 0], valid_match_i[..., 0], Qj, Qi,
        )
        self.ii[self.n_edges:self.n_edges + n_new] = ii_np[accept]
        self.jj[self.n_edges:self.n_edges + n_new] = jj_np[accept]
        self.n_edges += n_new
        return True

    def _add_factors_sym(self, arena: KeyframeArena, ii, jj,
                         min_match_frac) -> bool:
        """add_factors with the symmetric decode forced (the desc_global
        rejection fallback; backend rounds are serial, so the temporary
        mode flip cannot race)."""
        mode = self.retrieval_edge_mode
        self.retrieval_edge_mode = "sym"
        try:
            return self.add_factors(arena, ii, jj, min_match_frac)
        finally:
            self.retrieval_edge_mode = mode

    def _add_consecutive_reused(self, arena: KeyframeArena, i: int, j: int,
                                reuse) -> bool:
        """Write the consecutive edge (i, j) from the tracker's reused
        j-direction + an i-direction match that is either pose-warped
        (decode-free; default) or freshly decoded.

        Pose-warped path (local_opt.reuse_warp): the i->j direction
        matches keyframe i's CANONICAL pointmap (the fused map BA consumes
        anyway) against keyframe j's canonical points transformed by the
        solved relative pose, with the q8 descriptor tables the tracker's
        decode already produced — skipping the second asymmetric decode
        entirely (~11 ms/keyframe on v5e).  Descriptor pairing is
        head2(i) vs head1(j) instead of head1(i) vs head2(j) — the
        matching space is shared across the two heads (the reference
        matches head1 vs head2 descriptors, mast3r_utils.py:162-168), so
        the pairing is symmetric.  Disabled under reference_exact."""
        d8f = reuse.get("desc8_frame")
        d8k = reuse.get("desc8_kf")
        if self.reuse_warp and d8f is not None \
                and hasattr(self.engine, "match_arrays_warp"):
            # rel/act/reshape/slicing run inside the engine's warp jit
            # (eager ops on the relayed TPU are remote compiles);
            # d8k = kf i's descs (tracker view2), d8f = kf j's (view1)
            idx_i2j, vm_j = self.engine.match_arrays_warp(
                arena.X, arena.T_WC, i, j, d8k, d8f, arena.img_hw,
            )
            # desc confidences from the same (j, i) decode, sides swapped
            Qii, Qji = reuse["Qij"], reuse["Qjj"]
        else:
            kw = {} if self.params is None else {"params": self.params}
            # [:8]: desc-exporting engines append their q8 tables
            (idx_i2j, vm_j, _Xff, _Cff, Qii, _Xkf, _Ckf, Qji) = \
                self.engine.match_asymmetric(
                    arena.feat[i][None], arena.pos[i][None],
                    arena.feat[j][None], arena.pos[j][None], **kw,
                )[:8]
        idx_j2i = reuse["idx_j2i"]
        vm_i = reuse["valid_i"]
        Qjj = reuse["Qjj"]
        Qij = reuse["Qij"]
        if idx_i2j.shape[1] * 4 == Qjj.shape[1]:
            # warp direction matched on the edge query subgrid; the
            # reused tracker direction stays full-grid (mixed-resolution
            # edge — BA's points_subsample pattern reads the even pixels
            # of both, so values are bitwise-identical either way)
            h_img, w_img = arena.img_hw
            idx_i2j, vm_j, Qj = _dir_weight_sub(
                idx_i2j, vm_j, Qii, Qji, h_img, w_img)
            Qi = _dir_weight(idx_j2i, Qjj, Qij)
        else:
            Qj, Qi, _mfj, _mfi = _gate_edges(
                idx_i2j, idx_j2i, vm_j, vm_i, Qii, Qjj, Qji, Qij,
                self.cfg.Q_conf,
            )
        # consecutive edges are never rejected (global_opt.py:73-76)
        if self.n_edges + 1 > self.max_edges:
            self._grow(self.n_edges + 1)
        slots = jnp.asarray([self.n_edges], jnp.int32)
        (self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
         self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii) = _write_edges(
            self.idx_ii2jj, self.idx_jj2ii, self.valid_match_j,
            self.valid_match_i, self.Q_ii2jj, self.Q_jj2ii,
            slots, idx_i2j, idx_j2i,
            vm_j[..., 0], vm_i[..., 0], Qj, Qi,
        )
        self.ii[self.n_edges] = i
        self.jj[self.n_edges] = j
        self.n_edges += 1
        return True

    # -- incremental pregather cache ----------------------------------------

    def _sync_cache(self, arena: KeyframeArena, unique: np.ndarray,
                    calib: bool):
        """Refresh cached pregather rows for edges that are new or whose
        endpoint keyframe's pointmap changed since the last solve
        (versioned by arena.N_updates — update_pointmap bumps it on every
        fusion; poses don't touch it)."""
        if calib != self._pre_calib:
            # rows prepped for the other residual mode are invalid
            self._pre_fresh[:] = False
            self._pre_calib = calib
        nupd = np.asarray(arena.N_updates)
        changed = {
            int(k) for k in unique
            if self._nupd_seen.get(int(k)) != int(nupd[int(k)])
        }
        n = self.n_edges
        dirty = [
            e for e in range(n)
            if not self._pre_fresh[e]
            or int(self.ii[e]) in changed or int(self.jj[e]) in changed
        ]
        if dirty:
            self._refresh_pre(arena, dirty, calib)
            self._pre_fresh[dirty] = True
        for k in unique:
            self._nupd_seen[int(k)] = int(nupd[int(k)])

    def _refresh_pre(self, arena: KeyframeArena, slots, calib: bool):
        R = _next_bucket(len(slots), 4)
        slot_pad = np.full((R,), self.max_edges, np.int64)
        slot_pad[: len(slots)] = slots
        kfs = np.unique(np.concatenate([self.ii[slots], self.jj[slots]]))
        remap = {int(k): c for c, k in enumerate(kfs)}
        P_r = _next_bucket(len(kfs), 1)
        uidx_r = np.zeros((P_r,), np.int32)
        uidx_r[: len(kfs)] = kfs
        ii_l = np.zeros((R,), np.int32)
        jj_l = np.zeros((R,), np.int32)
        for a, e in enumerate(slots):
            ii_l[a] = remap[int(self.ii[e])]
            jj_l[a] = remap[int(self.jj[e])]
        h, w = arena.img_hw
        K = jnp.asarray(self.K) if self.K is not None else jnp.eye(3)
        (self.pre_Xi_f, self.pre_sqw_f, self.pre_ind_f,
         self.pre_Xi_r, self.pre_sqw_r, self.pre_ind_r) = _refresh_pre_rows(
            self.pre_Xi_f, self.pre_sqw_f, self.pre_ind_f,
            self.pre_Xi_r, self.pre_sqw_r, self.pre_ind_r,
            arena.X, arena.C, arena.N, K,
            self.idx_ii2jj, self.idx_jj2ii,
            self.valid_match_j, self.valid_match_i,
            self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(slot_pad), jnp.asarray(uidx_r),
            jnp.asarray(ii_l), jnp.asarray(jj_l),
            R, (w, h), self.cfg, calib,
        )

    def invalidate_cache(self):
        """Drop all cached pregather rows (e.g. after load_state restores
        edge arrays the cache has never seen).  Reallocates the pre arrays
        to zeros: marking rows stale is not enough, because _sync_cache
        only refreshes rows < n_edges — after restoring a checkpoint with
        FEWER edges than the live graph, rows in [n_ckpt, n_old) would
        otherwise keep stale nonzero pre_sqw that the cached solve (which
        drops edge_valid) could consume."""
        if self.cache_pre:
            self._alloc_pre(self.max_edges)
            self._pre_fresh[:] = False
            self._nupd_seen.clear()
            self._pre_calib = None

    # -- solves -------------------------------------------------------------

    def get_unique_kf_idx(self) -> np.ndarray:
        n = self.n_edges
        return np.unique(np.concatenate([self.ii[:n], self.jj[:n]]))

    def solve_poses(self, arena: KeyframeArena, residual_type: str):
        """Run the GN solve on ``arena`` (a consistent snapshot) WITHOUT
        writing back.  Returns ``(upd_idx, Twc_new, stats)`` — the caller
        scatters ``Twc_new`` rows at ``upd_idx`` into whatever arena is
        current (reference write-back discipline, global_opt.py:160-161:
        only the touched, non-pinned keyframes are updated, so keyframes
        appended concurrently by the frontend are never clobbered).
        Returns ``None`` when there is nothing to solve."""
        pin = self.cfg.pin
        n = self.n_edges
        if n == 0:
            return None
        unique = self.get_unique_kf_idx()
        P = len(unique)
        if P <= pin:
            return None

        D = self._mesh_D
        # sharded path: 2*E_bucket and (map mode) P_pad must divide over
        # the edge axis; power-of-two buckets with a raised floor guarantee
        # it for any power-of-two D
        E_bucket = _next_bucket(n, max(4, D // 2))
        P_pad = _next_bucket(P, 2 if D == 1 or self.shard_mode != "map"
                             else D)

        remap = {int(k): c for c, k in enumerate(unique)}
        ii_c = np.array([remap[int(k)] for k in self.ii[:n]], np.int32)
        jj_c = np.array([remap[int(k)] for k in self.jj[:n]], np.int32)
        # two-way padded edge endpoints; padded rows masked by edge_valid
        ii2 = np.zeros((2 * E_bucket,), np.int32)
        jj2 = np.zeros((2 * E_bucket,), np.int32)
        ev = np.zeros((2 * E_bucket,), bool)
        ii2[:n], jj2[:n], ev[:n] = ii_c, jj_c, True
        ii2[E_bucket:E_bucket + n] = jj_c
        jj2[E_bucket:E_bucket + n] = ii_c
        ev[E_bucket:E_bucket + n] = True

        unique_pad = np.zeros((P_pad,), np.int32)
        unique_pad[:P] = unique

        h, w = arena.img_hw
        K = jnp.asarray(self.K) if self.K is not None else jnp.eye(3)

        common = (
            arena.X, arena.C, arena.N, arena.T_WC,
            self.idx_ii2jj, self.idx_jj2ii,
            self.valid_match_j, self.valid_match_i,
            self.Q_ii2jj, self.Q_jj2ii,
            jnp.asarray(unique_pad), jnp.asarray(ii2), jnp.asarray(jj2),
            jnp.asarray(ev), K,
        )
        if self.mesh is not None and self.mesh.devices.size > 1:
            Twc_new, iters, delta, ok = _prep_and_solve_sharded(
                *common, self.mesh, self.shard_mode, E_bucket,
                residual_type, (w, h), self.cfg, residual_type == "calib",
            )
        elif self.cache_pre:
            self._sync_cache(arena, unique, residual_type == "calib")
            Twc_new, iters, delta, ok = _prep_and_solve_cached(
                arena.X, arena.T_WC,
                self.pre_Xi_f, self.pre_sqw_f, self.pre_ind_f,
                self.pre_Xi_r, self.pre_sqw_r, self.pre_ind_r,
                jnp.asarray(unique_pad), jnp.asarray(ii2),
                jnp.asarray(jj2), K,
                E_bucket, residual_type, (w, h), self.cfg,
                residual_type == "calib",
            )
        else:
            Twc_new, iters, delta, ok = _prep_and_solve(
                *common, E_bucket, residual_type, (w, h), self.cfg,
                residual_type == "calib",
            )
        # non-pinned unique poses get scattered back by the caller;
        # pinned/padded rows get an out-of-range target and are dropped.
        # The dump index must be out of range for ANY arena, not just this
        # snapshot's: the live arena may have grown (arena_grow) between
        # snapshot and write-back, and a dump index equal to the old
        # capacity would then hit a real row.
        upd = np.full((P_pad,), 1 << 30, np.int64)
        upd[pin:P] = unique[pin:]
        return (jnp.asarray(upd), Twc_new,
                (int(iters), float(delta), bool(ok)))

    def _solve(self, arena: KeyframeArena, residual_type: str):
        res = self.solve_poses(arena, residual_type)
        if res is None:
            return arena, None
        upd, Twc_new, stats = res
        arena = arena.replace(T_WC=_write_poses(arena.T_WC, Twc_new, upd))
        return arena, stats

    def solve_GN_rays(self, arena: KeyframeArena):
        """global_opt.py:123-161."""
        return self._solve(arena, "ray")

    def solve_GN_calib(self, arena: KeyframeArena):
        """global_opt.py:163-226."""
        return self._solve(arena, "calib")
