#!/usr/bin/env python
"""Edge-sharded BA scaling curve on an N-virtual-device CPU mesh.

The scaling-efficiency proxy for the multi-host north star: fix the total
edge workload, grow the mesh 1 -> 8 shards, and measure wall time of the
sharded GN solve (sharded_gauss_newton) plus the per-iteration collective
volume.  On this 2-core host the wall-clock curve saturates at the core
count — the honest signals are (a) per-device work drops 1/D while the
result stays equal to the single-device solver, and (b) the only
per-iteration collective is the (7F x 7F)+7F pose-system psum, whose bytes
are independent of edge count (printed below), so ICI time on real
hardware is microseconds against tens of ms of accumulation.

Usage: python scripts/bench_edge_scaling.py [E] [HW] [P]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N_DEV = 8
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from mast3r_slam_tpu.ops import ba  # noqa: E402
from mast3r_slam_tpu.ops import lie_sim3 as sim3  # noqa: E402
from mast3r_slam_tpu.parallel.mesh import make_mesh  # noqa: E402
from mast3r_slam_tpu.parallel.sharded_ba import (  # noqa: E402
    sharded_gauss_newton,
)


def main():
    E = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    HW = int(sys.argv[2]) if len(sys.argv) > 2 else 64 * 48
    P = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    W, H = 64, HW // 64
    cfg = ba.BAConfig(max_iters=10, chunk_points=1024, delta_norm=0.0)

    rng = np.random.default_rng(0)
    Wpts = rng.standard_normal((HW, 3)).astype(np.float32)
    Wpts[:, 2] += 4.0
    xi = rng.standard_normal((P, 7)).astype(np.float32) * 0.05
    xi[0] = 0
    T_true = sim3.exp(jnp.asarray(xi))
    Xs = jnp.stack([
        sim3.act(sim3.inv(T_true[p]), jnp.asarray(Wpts)) for p in range(P)
    ])
    Cs = jnp.full((P, HW), 10.0)
    ii = jnp.asarray(rng.integers(0, P - 1, E), jnp.int32)
    jj = (ii + 1) % P
    idx = jnp.broadcast_to(jnp.arange(HW, dtype=jnp.int32)[None], (E, HW))
    vm = jnp.ones((E, HW), bool)
    Q = jnp.full((E, HW), 4.0)
    ev = jnp.ones((E,), bool)
    T0 = sim3.mul(sim3.exp(jnp.asarray(
        rng.standard_normal((P, 7)).astype(np.float32) * 0.03)), T_true)
    K = jnp.eye(3)

    F = P - cfg.pin
    psum_bytes = (7 * F * 7 * F + 7 * F) * 4
    print(f"E={E} HW={HW} P={P}; per-iter psum = {psum_bytes / 1e3:.1f} kB "
          f"(edge-count independent)")

    results = {}
    for shards in (1, 2, 4, 8):
        mesh = make_mesh(n_edge=shards, n_model=1,
                         devices=jax.devices()[:shards])
        run = lambda: sharded_gauss_newton(
            mesh, T0, Xs, Cs, ii, jj, idx, vm, Q, ev, K, "ray", (W, H),
            cfg,
        )
        out = run()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = run()
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        emb_diff = float(jnp.abs(out - T_true).max())  # raw Sim3-embedding diff (quat sign not canonicalized)
        results[shards] = dt
        base = results[1]
        print(f"shards={shards}: {dt * 1e3:7.1f} ms  "
              f"speedup={base / dt:4.2f}x  "
              f"eff={base / dt / shards:4.1%}  "
              f"edges/device={E // shards}  emb_diff={emb_diff:.2e}")


if __name__ == "__main__":
    main()
