#!/usr/bin/env python
"""Build the native extensions in place (no pip; plain cc invocation).

Produces mast3r_slam_tpu/retrieval/native/hamming_native*.so.  Safe to skip:
every native kernel has a numpy fallback.
"""

import pathlib
import subprocess
import sys
import sysconfig

import numpy as np

HERE = pathlib.Path(__file__).resolve().parent
OUT_DIR = HERE.parent / "mast3r_slam_tpu" / "retrieval" / "native"


def build():
    OUT_DIR.mkdir(exist_ok=True)
    (OUT_DIR / "__init__.py").write_text(
        "from .loader import hamming_native  # noqa\n"
    )
    (OUT_DIR / "loader.py").write_text(
        '"""Loads the compiled hamming extension (built by native/build.py)."""\n'
        "try:\n"
        "    from . import hamming_native  # type: ignore\n"
        "except ImportError:\n"
        "    hamming_native = None\n"
    )
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    out = OUT_DIR / f"hamming_native{ext}"
    cmd = [
        "gcc", "-O3", "-march=native", "-shared", "-fPIC",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        str(HERE / "hamming.c"),
        "-o", str(out),
    ]
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")


if __name__ == "__main__":
    build()
    sys.path.insert(0, str(OUT_DIR.parents[2]))
    from mast3r_slam_tpu.retrieval.native import hamming_native

    assert hamming_native is not None
    import numpy as np

    a = np.array([[0b1011]], np.uint64)
    b = np.array([[0b0011]], np.uint64)
    d = hamming_native.cdist(a, b, 4)
    assert abs(float(d[0, 0]) - 0.25) < 1e-6, d
    print("self-test ok")
