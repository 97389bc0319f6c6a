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
                         residual_type: str, img_wh, cfg: ba.BAConfig):
    """Distributed version of ops.ba.gauss_newton: edges sharded over the
    'edge' mesh axis.  All inputs as in the single-device API; edge-indexed
    arrays must have leading dim divisible by the edge axis size."""
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
        out_specs=rspec,
        check_vma=False,
    )
    def run(Twc, Xs, Cs2, ii, jj, idx, vm, Q2, ev, K):
        # pose-independent permutation gather hoisted out of the GN loop
        # (local to this device's edge shard)
        C = min(cfg.chunk_points, idx.shape[1])
        pre = ba._pregather_edges(Xs, Cs2, ii, jj, idx, vm, Q2, ev, cfg, C)

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
        return Twc_out

    args = (Twc, Xs, Cs2, ii, jj, idx_ii2jj, vm2, Q2, edge_valid, K)
    fn = jax.jit(run)
    return fn(*args)
