#!/usr/bin/env python
"""Quantized-encoder pipeline entry point.

Surface parity with the reference fork's `main_quantized.py` (a clone of
main.py that prefers the TensorRT INT8 encoder engine,
`/root/reference/main_quantized.py:43-68`).  Here the INT8 path is native:
per-channel int8 weights + dynamic per-token activation quantization running
on the MXU (`mast3r_slam_tpu/models/quant.py`), so this entry point is just
`main.py` with `--int8-encoder` forced on — same CLI, same outputs.  If the
quantized path is unavailable for a model config it falls back to the bf16
encoder exactly like the reference falls back to PyTorch.
"""

import sys

from main import main

if __name__ == "__main__":
    if "--int8-encoder" not in sys.argv:
        sys.argv.append("--int8-encoder")
    main()
