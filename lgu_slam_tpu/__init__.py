"""LGU-SLAM-TPU: a TPU-native deep visual SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LGU-SLAM
(arXiv 2410.23231; reference implementation is a CUDA/PyTorch fork of
DROID-SLAM).  The compute path is pure JAX (jit/pjit/shard_map + Pallas
kernels); SLAM state is an explicit pytree of fixed-shape arrays so the
whole per-keyframe update compiles once and stays on-device.

Subpackages
-----------
- ``lie``      : quaternion-based SE(3)/Sim(3) Lie-group ops (lietorch analog)
- ``geom``     : projective geometry, differentiable + inference bundle adjustment
- ``models``   : feature/context encoders, correlation, Gaussian-uncertainty
                 masks, deformable sampling, KAN-biased ConvGRU update operator
- ``ops``      : TPU kernels (XLA formulations + Pallas fused variants)
- ``slam``     : video state, motion filter, factor graph, frontend/backend
- ``parallel`` : device-mesh sharding of the factor graph + distributed DBA
- ``data``     : dataset readers and streaming input
- ``eval``     : trajectory metrics (ATE/RPE) and benchmark harnesses
- ``utils``    : config, checkpointing, logging, profiling
"""

__version__ = "0.1.0"
