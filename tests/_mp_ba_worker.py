"""Worker process for the TRUE multi-process distributed-BA test
(test_multiprocess_ba.py): each OS process contributes its own CPU
device(s) to a jax.distributed mesh — separate processes over a real
coordinator, not virtual devices — and runs the edge-sharded GN solver on
globally sharded arrays.

Usage: python _mp_ba_worker.py <coordinator> <num_procs> <proc_id> <outdir>
"""

import pathlib
import sys


def main():
    coord, nproc, pid, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
        pathlib.Path(sys.argv[4]),
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P_

    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

    from test_ba import identity_scene, perturb, K, W, H
    from mast3r_slam_tpu.ops import ba
    from mast3r_slam_tpu.parallel.sharded_ba import sharded_gauss_newton

    # identical deterministic inputs on every process
    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=10, chunk_points=128)

    devices = jax.devices()
    n_dev = len(devices)
    assert n_dev >= nproc, (n_dev, nproc)
    mesh = Mesh(np.asarray(devices).reshape(n_dev, 1), ("edge", "model"))

    E = ii.shape[0]
    E_pad = ((E + n_dev - 1) // n_dev) * n_dev
    pad = E_pad - E

    def padE(a, fill=0):
        a = np.asarray(a)
        return np.concatenate(
            [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0
        )

    def to_global(np_arr, spec):
        np_arr = np.asarray(np_arr)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np_arr.shape, sharding, lambda i: np_arr[i]
        )

    esp, rsp = P_("edge"), P_()
    args = (
        to_global(T0, rsp), to_global(Xs, rsp), to_global(Cs, rsp),
        to_global(padE(ii), esp), to_global(padE(jj), esp),
        to_global(padE(idx), esp), to_global(padE(vm, False), esp),
        to_global(padE(Q), esp), to_global(padE(ev, False), esp),
    )
    T_out = sharded_gauss_newton(
        mesh, *args, jnp.asarray(np.asarray(K)), "ray", (W, H), cfg
    )
    # replicated output: fully addressable on every process
    res = np.asarray(T_out)
    np.savez(outdir / f"result_{pid}.npz", T=res,
             T_true=np.asarray(T_true))
    print(f"[worker {pid}] done, {n_dev} global devices", flush=True)


if __name__ == "__main__":
    main()
