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


def import_reference():
    """Import and return the reference droid_slam modules (torch, CPU)."""
    import torch

    _stub("defCorrSample")
    _stub("droid_backends")
    lietorch = _stub("lietorch")
    if not hasattr(lietorch, "SE3"):
        lietorch.SE3 = object  # never constructed by the tested paths
        lietorch.Sim3 = object

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
