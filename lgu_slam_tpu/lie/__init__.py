"""Pure-JAX quaternion Lie-group library (lietorch analog).

All group elements are plain ``jnp`` arrays (pytree-friendly, jit/vmap/grad
compatible by construction).  Layouts match the reference SLAM state so
trajectories / checkpoints interoperate:

- SE(3):  ``[..., 7]`` = (tx, ty, tz, qx, qy, qz, qw)
- Sim(3): ``[..., 8]`` = (tx, ty, tz, qx, qy, qz, qw, s)
- tangent: translation-first, ``(v, w)`` for SE(3), ``(v, w, sigma)`` for Sim(3)

Reference parity: thirdparty/lietorch (cloned per README.md:33) and the device
SE(3) math in /root/reference/src/droid_kernels.cu:58-175,877-895.
"""

from lgu_slam_tpu.lie.se3 import (
    quat_mul,
    quat_conj,
    quat_rotate,
    quat_normalize,
    so3_exp,
    so3_log,
    so3_matrix,
    se3_identity,
    se3_exp,
    se3_log,
    se3_inv,
    se3_mul,
    se3_act,
    se3_act4,
    se3_adjT_apply,
    se3_retr,
    se3_rel,
    se3_matrix,
    se3_from_matrix,
)
from lgu_slam_tpu.lie.sim3 import (
    sim3_identity,
    sim3_exp,
    sim3_log,
    sim3_inv,
    sim3_mul,
    sim3_act,
    sim3_from_se3,
    sim3_scale,
)

__all__ = [k for k in dir() if not k.startswith("_")]
