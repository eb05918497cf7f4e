"""Import helpers for the reference torch modules (CUDA-free parts).

The reference at /root/reference is a CUDA/torch codebase; its pure-Python
modules (droid_slam/modules/*.py, gaussianMask_cuda.py's Python heads,
droid_net.py) are importable on CPU once the CUDA extensions
(``defCorrSample``, ``droid_backends``), ``lietorch`` and ``torch_scatter``
are stubbed.  The stubs below provide only what module-level imports and
the tested forward paths touch:

- ``torch_scatter.scatter_mean`` — real (pure-torch) implementation, used
  by the reference GraphAgg (droid_net.py:14, :62).
- ``defCorrSample`` / ``droid_backends`` / ``lietorch`` — empty shells;
  the parity tests never call into them.

Used by tests/test_torch_parity.py to verify convert_torch_checkpoint and
numerical parity of the JAX modules against the reference.
"""

from __future__ import annotations

import sys
import types

REF = "/root/reference"


def _stub(name):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)
    return sys.modules[name]


def _np_of(t):
    import numpy as np

    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _torch_of(a):
    import numpy as np
    import torch

    return torch.from_numpy(np.asarray(a).copy())


def _make_se3_shim():
    """Minimal lietorch.SE3 stand-in backed by our (independently
    Jacobian-verified) pure-JAX quaternion SE(3) ops, for running the
    reference's CUDA-free training path on CPU.  Covers exactly the API
    surface used by droid_slam/geom/{projective_ops,ba}.py and
    droid_net.py: indexing, composition, inverse, 4-vec action, adjT,
    retr, detach, .data."""
    from lgu_slam_tpu import lie

    class SE3:
        manifold_dim = 6

        def __init__(self, data):
            self.data = data  # torch [..., 7] = (t, q xyzw)

        @classmethod
        def InitFromVec(cls, data):
            return cls(data)

        @property
        def shape(self):
            return self.data.shape[:-1]

        def __getitem__(self, idx):
            return SE3(self.data[idx])

        def inv(self):
            return SE3(_torch_of(lie.se3_inv(_np_of(self.data))))

        def __mul__(self, other):
            if isinstance(other, SE3):
                return SE3(_torch_of(
                    lie.se3_mul(_np_of(self.data), _np_of(other.data))
                ))
            # action on homogeneous (X, Y, Z, D) points / Jacobian columns
            return _torch_of(
                lie.se3_act4(_np_of(self.data), _np_of(other))
            )

        def adjT(self, a):
            return _torch_of(
                lie.se3_adjT_apply(_np_of(self.data), _np_of(a))
            )

        def retr(self, dx):
            return SE3(_torch_of(
                lie.se3_retr(_np_of(self.data), _np_of(dx))
            ))

        def detach(self):
            return SE3(self.data.detach())

    return SE3


def _install_pure_kernels(mod):
    """Fill the ``defCorrSample`` extension stub with CPU implementations
    backed by our JAX ops (themselves oracle-tested against the CUDA
    semantics in tests/test_sampler.py) so the reference's CorrBlock and
    GaussianMask forward paths run without the CUDA build.  Layouts follow
    the extension's conventions: volume [B, H1, W1, H2, W2], coords
    [B, 2, H1, W1], outputs [B, rd, rd, H1, W1]."""
    if getattr(mod, "_pure_kernels", False):
        return
    import jax.numpy as jnp

    from lgu_slam_tpu.ops import sampler as S

    def _coords(coords):
        return jnp.asarray(_np_of(coords.permute(0, 2, 3, 1)))

    def corr_index_forward(volume, coords, radius):
        out = S.corr_index(jnp.asarray(_np_of(volume)), _coords(coords),
                           radius)
        rd = 2 * radius + 1
        b, _, h1, w1 = out.shape
        return (_torch_of(out).view(b, rd, rd, h1, w1),)

    def defCorr_index_forward(volume, coords, offset, radius):
        out = S.defcorr_index(
            jnp.asarray(_np_of(volume)), _coords(coords),
            jnp.asarray(_np_of(offset)), radius,
        )
        rd = 2 * radius + 1
        b, _, h1, w1 = out.shape
        return (_torch_of(out).view(b, rd, rd, h1, w1),)

    def gaussianMask(mean, cov, corr, radius):
        out = S.gaussian_window_mask(
            jnp.asarray(_np_of(corr)), jnp.asarray(_np_of(mean)),
            jnp.asarray(_np_of(cov)), radius,
        )
        return (_torch_of(out),)

    mod.corr_index_forward = corr_index_forward
    mod.defCorr_index_forward = defCorr_index_forward
    mod.gaussianMask = gaussianMask
    mod._pure_kernels = True


def _patch_as_tensor(torch):
    """projective_ops.py:108 constructs a tensor with a hardcoded
    ``device="cuda"`` on every call (even with no stereo edges); on a
    CUDA-less test host, map it to CPU."""
    if getattr(torch.as_tensor, "_cpu_patched", False):
        return
    orig = torch.as_tensor

    def as_tensor(data, dtype=None, device=None):
        if (isinstance(device, str) and device.startswith("cuda")
                and not torch.cuda.is_available()):
            device = None
        return orig(data, dtype=dtype, device=device)

    as_tensor._cpu_patched = True
    torch.as_tensor = as_tensor


def import_reference():
    """Import and return the reference droid_slam modules (torch, CPU)."""
    import torch

    _patch_as_tensor(torch)
    _install_pure_kernels(_stub("defCorrSample"))
    _stub("droid_backends")
    lietorch = _stub("lietorch")
    if not hasattr(lietorch, "SE3") or lietorch.SE3 is object:
        lietorch.SE3 = _make_se3_shim()

        class _Sim3Unused:  # isinstance probe only (projective_ops.py:86)
            pass

        lietorch.Sim3 = _Sim3Unused

    ts = _stub("torch_scatter")
    if not hasattr(ts, "scatter_mean"):

        def scatter_mean(src, index, dim=0):
            """Pure-torch scatter_mean (segment mean along ``dim``)."""
            n = int(index.max()) + 1
            shape = list(src.shape)
            shape[dim] = n
            num = torch.zeros(shape, dtype=src.dtype)
            cnt = torch.zeros(n, dtype=src.dtype)
            idx = index.long()
            num.index_add_(dim, idx, src)
            cnt.index_add_(0, idx, torch.ones(len(idx), dtype=src.dtype))
            view = [1] * src.dim()
            view[dim] = n
            return num / cnt.clamp(min=1).view(view)

        ts.scatter_mean = scatter_mean

        def scatter_sum(src, index, dim=0, dim_size=None):
            n = dim_size if dim_size is not None else int(index.max()) + 1
            shape = list(src.shape)
            shape[dim] = n
            out = torch.zeros(shape, dtype=src.dtype)
            out.index_add_(dim, index.long(), src)
            return out

        ts.scatter_sum = scatter_sum

    # expose /root/reference/droid_slam as the ``droid_slam`` package
    if "droid_slam" not in sys.modules:
        pkg = types.ModuleType("droid_slam")
        pkg.__path__ = [f"{REF}/droid_slam"]
        sys.modules["droid_slam"] = pkg
    if f"{REF}/droid_slam" not in sys.path:
        sys.path.insert(0, f"{REF}/droid_slam")

    import droid_slam.modules.extractor as ref_extractor
    import droid_slam.modules.gru_kanBias as ref_gru
    import droid_slam.modules.kan as ref_kan

    import droid_net as ref_droid_net  # top-level import style (train.py)
    import gaussianMask_cuda as ref_gm

    return types.SimpleNamespace(
        extractor=ref_extractor,
        gru=ref_gru,
        kan=ref_kan,
        droid_net=ref_droid_net,
        gaussian_mask=ref_gm,
    )
