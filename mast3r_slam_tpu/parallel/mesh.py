"""Device mesh helpers for multi-chip/multi-host deployment.

The reference has no distributed story (SURVEY §2.4: its concurrency is
three processes sharing CUDA memory on one GPU).  Here scale-out is
first-class: a named mesh with an ``edge`` axis (factor-graph edges /
keyframe map shards — the SLAM analog of data parallelism) and a ``model``
axis (tensor parallelism inside the two-view transformer).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_edge: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_edge is None:
        n_edge = n // n_model
    assert n_edge * n_model <= n, (n_edge, n_model, n)
    arr = np.asarray(devices[: n_edge * n_model]).reshape(n_edge, n_model)
    return Mesh(arr, ("edge", "model"))


def edge_sharding(mesh: Mesh) -> NamedSharding:
    """First axis sharded across the edge axis."""
    return NamedSharding(mesh, P("edge"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel placement of MASt3R params over the mesh's 'model'
    axis: attention qkv / MLP fc1 weights column-sharded, proj / fc2
    row-sharded, everything else replicated — the Megatron-style split
    where each block needs only one all-reduce per attn/MLP (inserted by
    GSPMD from these placements).  Used by InferenceEngine(mesh=...) and
    the driver dryrun."""
    import jax.tree_util as jtu

    def place(path, x):
        name = "/".join(str(p) for p in path)
        if x.ndim == 2 and ("fc1" in name or "qkv" in name):
            return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
        if x.ndim == 2 and ("fc2" in name or "/proj/" in name):
            return jax.device_put(x, NamedSharding(mesh, P("model", None)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jtu.tree_map_with_path(place, params)


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Initialize jax.distributed for a multi-host slice (the DCN tier of
    the scaling design: keyframe-axis sharding across hosts, edge axis
    within a host over ICI).  No-op when single-process args are absent."""
    import jax

    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
