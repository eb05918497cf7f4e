"""Whole-iteration cross-framework parity: the reference's pure-Python
training path vs our ``LGUNet.__call__``.

Runs /root/reference/droid_slam/droid_net.py:176-239 (extract features ->
CorrBlock (Gaussian mask + FPN offsets + deformable lookup) -> UpdateModule
-> 2x geom/ba.py BA -> reproject, for 2 steps over 4 edges) on CPU with
random converted weights, and asserts our unrolled forward reproduces the
per-step poses, upsampled disparities, residuals, and NLL aux loss to fp32
tolerance.  This catches layout/sign/indexing skew that the per-module
parity tests (tests/test_torch_parity.py) cannot.

CUDA-free execution of the reference path uses the shims in ref_torch.py:
``defCorrSample`` kernels are backed by our JAX ops (independently
oracle-tested against the CUDA semantics in tests/test_sampler.py), and
``lietorch.SE3`` by our lie module (verified against numeric Jacobians in
tests/test_projective.py) — so what THIS test pins down is everything
else: encoders, mask/offset heads, correlation pyramid construction, the
update operator, the differentiable BA (Hessian assembly, Schur solve,
fixedp indexing, retraction scatter), and convex upsampling.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference"):
    pytest.skip("reference repo not available", allow_module_level=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from ref_torch import import_reference  # noqa: E402

from lgu_slam_tpu import lie  # noqa: E402
from lgu_slam_tpu.models.net import LGUNet  # noqa: E402
from lgu_slam_tpu.utils.checkpoint import convert_torch_checkpoint  # noqa: E402

ref = import_reference()


def test_full_iteration_parity():
    B, N, H, W = 1, 3, 128, 128
    h8, w8 = H // 8, W // 8
    num_steps = 2

    g = torch.Generator().manual_seed(11)

    tm = ref.droid_net.DroidNet()
    # the reference hardcodes GaussianMask(48, 64) for 384x512 inputs
    # (droid_net.py:147); rebuild its coord grid for the test resolution
    tm.GA = ref.gaussian_mask.GaussianMask(h8, w8)
    with torch.no_grad():
        for p in tm.parameters():
            p.copy_(torch.randn(*p.shape, generator=g) * 0.05)
    tm.eval()

    params = convert_torch_checkpoint(
        {k: v.numpy() for k, v in tm.state_dict().items()}
    )

    # scene: 3 frames, gentle motion, chain graph both directions
    rng = np.random.default_rng(3)
    xi = np.cumsum(rng.normal(size=(N, 6)) * 0.01, axis=0).astype(np.float32)
    Gs7 = np.asarray(lie.se3_exp(jnp.asarray(xi)))[None]  # [1, N, 7]
    images = rng.integers(0, 255, size=(B, N, H, W, 3)).astype(np.float32)
    disps = (0.8 + 0.4 * rng.random((B, N, h8, w8))).astype(np.float32)
    intr = np.broadcast_to(
        np.asarray([2.0 * w8, 2.0 * w8, w8 / 2.0, h8 / 2.0], np.float32),
        (B, N, 4),
    ).copy()

    graph = {0: [1], 1: [0, 2], 2: [1]}
    ii_np = np.asarray([0, 1, 1, 2], np.int32)
    jj_np = np.asarray([1, 0, 2, 1], np.int32)

    # --- reference forward (CPU, shimmed kernels) ---
    # The reference's CorrBlock.__call__ multiplies its stored level-1
    # offsets by the variance gate IN PLACE (modules/corr.py:99), so the
    # gate compounds across the unrolled steps; our implementation applies
    # it per lookup (the documented intended semantics,
    # lgu_slam_tpu/models/corr.py module docstring).  Snapshot/restore the
    # offsets around each call so both sides compute the same function.
    import droid_slam.modules.corr as ref_corr_mod

    orig_call = ref_corr_mod.CorrBlock.__call__

    def pure_call(self, coords):
        off1 = self.offset[1].clone()
        out = orig_call(self, coords)
        self.offset[1] = off1
        return out

    ref_corr_mod.CorrBlock.__call__ = pure_call
    SE3 = __import__("lietorch").SE3
    Gs_t = SE3(torch.from_numpy(Gs7.copy()))
    images_t = torch.from_numpy(
        np.transpose(images, (0, 1, 4, 2, 3)).copy()
    )
    disps_t = torch.from_numpy(disps.copy())
    intr_t = torch.from_numpy(intr.copy())
    try:
        with torch.no_grad():
            Gs_list, disp_list, resid_list, loss_ref = tm(
                Gs_t, images_t, disps_t, intr_t, graph, num_steps=num_steps
            )
    finally:
        ref_corr_mod.CorrBlock.__call__ = orig_call

    # --- our forward ---
    net = LGUNet()
    poses_list, disps_up_list, resid_out, nll = net.apply(
        {"params": params},
        jnp.asarray(Gs7), jnp.asarray(images), jnp.asarray(disps),
        jnp.asarray(intr), jnp.asarray(ii_np), jnp.asarray(jj_np),
        num_steps, 2,
    )

    assert len(Gs_list) == len(poses_list) == num_steps
    for s in range(num_steps):
        ref_poses = np.asarray(Gs_list[s].data)
        ours = np.asarray(poses_list[s])
        # quaternions are sign-ambiguous representations; compare with the
        # sign aligned per pose
        sign = np.sign(
            np.sum(ref_poses[..., 3:] * ours[..., 3:], axis=-1, keepdims=True)
        )
        ours_q = np.concatenate([ours[..., :3], ours[..., 3:] * sign], -1)
        np.testing.assert_allclose(
            ours_q, ref_poses, atol=2e-4,
            err_msg=f"poses diverge at step {s}",
        )
        np.testing.assert_allclose(
            np.asarray(disps_up_list[s]), np.asarray(disp_list[s]),
            atol=2e-3, err_msg=f"disps_up diverge at step {s}",
        )
        np.testing.assert_allclose(
            np.asarray(resid_out[s]), np.asarray(resid_list[s]),
            atol=2e-3, err_msg=f"residuals diverge at step {s}",
        )

    np.testing.assert_allclose(
        float(nll), float(loss_ref), rtol=1e-3, atol=1e-4
    )
