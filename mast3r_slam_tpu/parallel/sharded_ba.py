"""Edge-sharded distributed Gauss-Newton bundle adjustment.

The TPU-native replacement for "more CUDA blocks": factor-graph edges (the
expensive part — per-edge Hessian accumulation over all pixels) are sharded
across the ``edge`` mesh axis with ``shard_map``; each device accumulates
its local edges' contributions, assembles a local dense pose system, and a
single ``psum`` over ICI reduces the (tiny, 7F x 7F) system; the Cholesky
solve and Sim(3) retraction run replicated so every device holds identical
updated poses with zero additional communication.

Per iteration the only collective is one psum of H (7F x 7F) + g (7F) —
for the 512-keyframe arena that is ~51 MB worst case and a few hundred KB
for typical windows: ICI-bound time is microseconds, so scaling efficiency
tracks the edge-accumulation FLOPs almost perfectly.

Keyframe pointmaps (P, N, 3) are replicated here (single-host case).  For
multi-host map sharding the same structure holds with Xs sharded over the
keyframe axis and edge endpoints gathered via all_gather of the 8-float
poses only — see dryrun_multichip in __graft_entry__ for the compiled
demonstration.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops import ba
from ..ops import lie_sim3 as sim3


def sharded_gauss_newton(mesh: Mesh, Twc, Xs, Cs, ii, jj, idx_ii2jj,
                         valid_match, Q, edge_valid, K,
                         residual_type: str, img_wh, cfg: ba.BAConfig,
                         return_stats: bool = False):
    """Distributed version of ops.ba.gauss_newton: edges sharded over the
    'edge' mesh axis.  All inputs as in the single-device API; edge-indexed
    arrays must have leading dim divisible by the edge axis size.
    ``return_stats`` additionally returns (iters, delta, ok) to match the
    single-device ``gauss_newton`` API (used by the FactorGraph sharded
    path)."""
    residual, R = ba._RESIDUALS[residual_type]
    P_n = Twc.shape[0]
    Cs2 = Cs[..., 0] if Cs.ndim == 3 else Cs
    vm2 = valid_match[..., 0] if valid_match.ndim == 3 else valid_match
    Q2 = Q[..., 0] if Q.ndim == 3 else Q

    espec = P("edge")
    rspec = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rspec, rspec, rspec, espec, espec, espec, espec, espec,
                  espec, rspec),
        out_specs=(rspec, rspec, rspec, rspec) if return_stats else rspec,
        check_vma=False,
    )
    def run(Twc, Xs, Cs2, ii, jj, idx, vm, Q2, ev, K):
        # pose-independent permutation gather hoisted out of the GN loop
        # (local to this device's edge shard)
        C = min(cfg.chunk_points, idx.shape[1])
        pre = ba._pregather_edges(Xs, Cs2, ii, jj, idx, vm, Q2, ev, cfg, C,
                                  img_wh)

        def body(state):
            Twc, it, delta, ok, done = state
            Hs, gs = ba._accumulate_pre(
                residual, R, Twc, ii, jj, pre, K, img_wh, cfg,
            )
            H_loc, g_loc = ba._assemble_dense(Hs, gs, ii, jj, P_n, cfg.pin)
            # the ONLY collective: reduce the pose system over ICI
            H = jax.lax.psum(H_loc, "edge")
            g = jax.lax.psum(g_loc, "edge")
            dx, solve_ok = ba._solve_scaled(H, g, cfg.damping)
            dx = -dx
            dx_pose = jnp.concatenate(
                [jnp.zeros((cfg.pin, 7), dx.dtype),
                 dx.reshape(P_n - cfg.pin, 7)], axis=0
            )
            Twc_new = sim3.retr(Twc, dx_pose)
            delta_norm = jnp.linalg.norm(dx)
            converged = delta_norm < cfg.delta_norm
            return (
                jnp.where(solve_ok, Twc_new, Twc),
                it + 1, delta_norm, ok & solve_ok, converged | ~solve_ok,
            )

        def cond(state):
            _, it, _, _, done = state
            return (it < cfg.max_iters) & ~done

        init = (Twc, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf),
                jnp.ones((), bool), jnp.zeros((), bool))
        Twc_out, iters, delta, ok, _ = jax.lax.while_loop(cond, body, init)
        if return_stats:
            return Twc_out, iters, delta, ok
        return Twc_out

    args = (Twc, Xs, Cs2, ii, jj, idx_ii2jj, vm2, Q2, edge_valid, K)
    fn = jax.jit(run)
    return fn(*args)


def sharded_gauss_newton_mapshard(mesh: Mesh, Twc, Xs, Cs, ii, jj,
                                  idx_ii2jj, valid_match, Q, edge_valid, K,
                                  residual_type: str, img_wh,
                                  cfg: ba.BAConfig,
                                  return_stats: bool = False):
    """Keyframe-axis (map-sharded) distributed GN — the multi-host tier of
    SURVEY §2.4: the pointmap arena ``Xs``/``Cs`` is SHARDED over the mesh
    axis (each host stores only P/D keyframes — this is what lets the map
    outgrow one host's HBM), while the small per-edge metadata (index maps,
    match gates) and the 8-float poses stay replicated.

    Communication structure (all outside the GN loop except the pose-system
    psum):

    1. Each device gathers, for every edge whose endpoint keyframe it OWNS,
       that endpoint's pixel rows (i side permuted by ``idx_ii2jj`` exactly
       like ``ba._pregather_edges``; j side direct), zeros elsewhere.
    2. ONE ``psum_scatter`` per side reduces the contributions over the
       mesh axis and leaves each device with the pregathered point data for
       ITS E/D edge shard — the communication-optimal exchange (each byte
       crosses the interconnect once; no full-map all-gather).
    3. The GN loop is then identical to :func:`sharded_gauss_newton`: local
       accumulation + one psum of the (7F x 7F) pose system per iteration;
       poses update replicated, so no pose gather is ever needed.

    Requires P divisible by the mesh axis size and E divisible likewise
    (pad with ``edge_valid=False`` rows / unused poses).
    """
    residual, R = ba._RESIDUALS[residual_type]
    P_n = Twc.shape[0]
    E = ii.shape[0]
    D = mesh.shape["edge"]
    assert P_n % D == 0 and E % D == 0, (P_n, E, D)
    Pl = P_n // D
    El = E // D
    Nx = Xs.shape[1]
    Cs2 = Cs[..., 0] if Cs.ndim == 3 else Cs
    vm2 = valid_match[..., 0] if valid_match.ndim == 3 else valid_match
    Q2 = Q[..., 0] if Q.ndim == 3 else Q
    # points_subsample (cfg): same balanced stride-s residual subset as
    # ba._pregather_edges — slice the per-point edge arrays up front (the
    # index VALUES stay full-res; the raster side is sliced in-kernel)
    s_sub = max(int(cfg.points_subsample), 1)
    if s_sub > 1:
        idx_ii2jj = ba.subsample_points(idx_ii2jj, s_sub, img_wh)
        vm2 = ba.subsample_points(vm2, s_sub, img_wh)
        Q2 = ba.subsample_points(Q2, s_sub, img_wh)

    kfspec = P("edge")   # keyframe axis sharded over the same mesh axis
    rspec = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rspec, kfspec, kfspec, rspec, rspec, rspec, rspec, rspec,
                  rspec, rspec),
        out_specs=(rspec, rspec, rspec, rspec) if return_stats else rspec,
        check_vma=False,
    )
    def run(Twc, Xs_loc, Cs_loc, ii, jj, idx, vm, Q2, ev, K):
        d = jax.lax.axis_index("edge")
        kf0 = d * Pl

        # -- stage 1: owner-side gathers (full edge list, zeros if not
        # owner) --------------------------------------------------------
        ind = jnp.where(vm, idx, 0)
        own_i = (ii >= kf0) & (ii < kf0 + Pl)
        own_j = (jj >= kf0) & (jj < kf0 + Pl)
        li = jnp.clip(ii - kf0, 0, Pl - 1)
        lj = jnp.clip(jj - kf0, 0, Pl - 1)
        src = jnp.concatenate(
            [Xs_loc.reshape(Pl * Nx, 3), Cs_loc.reshape(Pl * Nx, 1)],
            axis=-1,
        )
        gi = jnp.where(own_i[:, None, None],
                       src[li[:, None] * Nx + ind], 0.0)      # (E, Ns, 4)
        gj = jnp.where(own_j[:, None, None],
                       jnp.concatenate(
                           [ba.subsample_points(Xs_loc[lj], s_sub, img_wh),
                            ba.subsample_points(Cs_loc[lj], s_sub,
                                                img_wh)[..., None]],
                           axis=-1),
                       0.0)                                   # (E, Ns, 4)

        # -- stage 2: one reduce-scatter per side -> local edge shard ----
        gi = jax.lax.psum_scatter(gi, "edge", scatter_dimension=0,
                                  tiled=True)                 # (El, N, 4)
        gj = jax.lax.psum_scatter(gj, "edge", scatter_dimension=0,
                                  tiled=True)

        e0 = d * El
        slE = lambda a: jax.lax.dynamic_slice_in_dim(a, e0, El, axis=0)
        ii_l, jj_l = slE(ii), slE(jj)
        vm_l, Q_l, ev_l, ind_l = slE(vm), slE(Q2), slE(ev), slE(ind)

        # pregather epilogue (mirrors ba._pregather_edges:372-392)
        ci, cj = gi[..., 3], gj[..., 3]
        Xi = jnp.moveaxis(gi[..., :3], -1, 1)                 # (El, 3, N)
        Xj = jnp.moveaxis(gj[..., :3], -1, 1)
        static_valid = (
            vm_l & (Q_l > cfg.Q_conf) & (ci > cfg.C_conf)
            & (cj > cfg.C_conf) & ev_l[:, None]
        )
        sqw = jnp.where(static_valid, jnp.sqrt(jnp.maximum(Q_l, 0.0)), 0.0)
        Ns = Xi.shape[-1]
        C = min(cfg.chunk_points, Nx)
        pad = (-Ns) % C
        if pad:
            pz = lambda A: jnp.pad(
                A, ((0, 0),) * (A.ndim - 1) + ((0, pad),))
            Xi, Xj, sqw, ind_l = pz(Xi), pz(Xj), pz(sqw), pz(ind_l)
        pre = ba.EdgeData(Xi, Xj, sqw, ind_l)

        # -- stage 3: GN loop, identical to the edge-sharded solver ------
        def body(state):
            Twc, it, delta, ok, done = state
            Hs, gs = ba._accumulate_pre(
                residual, R, Twc, ii_l, jj_l, pre, K, img_wh, cfg,
            )
            H_loc, g_loc = ba._assemble_dense(Hs, gs, ii_l, jj_l, P_n,
                                              cfg.pin)
            H = jax.lax.psum(H_loc, "edge")
            g = jax.lax.psum(g_loc, "edge")
            dx, solve_ok = ba._solve_scaled(H, g, cfg.damping)
            dx = -dx
            dx_pose = jnp.concatenate(
                [jnp.zeros((cfg.pin, 7), dx.dtype),
                 dx.reshape(P_n - cfg.pin, 7)], axis=0
            )
            Twc_new = sim3.retr(Twc, dx_pose)
            delta_norm = jnp.linalg.norm(dx)
            converged = delta_norm < cfg.delta_norm
            return (
                jnp.where(solve_ok, Twc_new, Twc),
                it + 1, delta_norm, ok & solve_ok, converged | ~solve_ok,
            )

        def cond(state):
            _, it, _, _, done = state
            return (it < cfg.max_iters) & ~done

        init = (Twc, jnp.zeros((), jnp.int32), jnp.asarray(jnp.inf),
                jnp.ones((), bool), jnp.zeros((), bool))
        Twc_out, iters, delta, ok, _ = jax.lax.while_loop(cond, body, init)
        if return_stats:
            return Twc_out, iters, delta, ok
        return Twc_out

    args = (Twc, Xs, Cs2, ii, jj, idx_ii2jj, vm2, Q2, edge_valid, K)
    return jax.jit(run)(*args)
