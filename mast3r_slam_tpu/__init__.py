"""TPU-native dense SLAM engine with the capabilities of Lightweight-MASt3R-SLAM.

A brand-new JAX/XLA/Pallas implementation of real-time monocular dense SLAM:
a two-view MASt3R-style pointmap/descriptor transformer, an iterative
projective dense matcher, a Gauss-Newton Sim(3) frame tracker, a keyframe map
arena, ASMK-retrieval loop closure, and a distributed second-order pointmap
bundle-adjustment backend over XLA collectives.

This is not a port of the reference (CUDA/torch) implementation; it is a
TPU-first redesign.  Reference behavior citations in docstrings point into
the upstream repo for capability-parity checking only.
"""

__version__ = "0.1.0"
