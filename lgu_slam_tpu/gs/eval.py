"""Render-quality evaluation for the Gaussian scene (reference:
to3DGS/utils/eval_helpers.py — PSNR/SSIM/LPIPS report over the trajectory).
LPIPS needs the pretrained ``lpips`` package's AlexNet weights; when it is
importable it is used exactly as the reference does (net='alex'), otherwise
the metric is reported as None rather than approximated."""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.gs.render import render_rgbd
from lgu_slam_tpu.gs.ssim import ssim


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def _make_lpips():
    """Pretrained-LPIPS factory (eval_helpers uses lpips net='alex').
    Returns a callable (im_a, im_b in [0,1] HWC) -> float, or None when the
    package/weights are unavailable in this offline environment."""
    try:  # pragma: no cover - depends on optional package
        import lpips as lpips_pkg
        import torch

        net = lpips_pkg.LPIPS(net="alex")

        def fn(a, b):
            ta = torch.from_numpy(
                (np.asarray(a, np.float32) * 2 - 1).transpose(2, 0, 1)
            )[None]
            tb = torch.from_numpy(
                (np.asarray(b, np.float32) * 2 - 1).transpose(2, 0, 1)
            )[None]
            with torch.no_grad():
                return float(net(ta, tb).item())

        return fn
    except Exception:
        return None


def evaluate_renders(params, alive, frames, img_size, span=6, k_max=96):
    """frames: list of (im_gt [H,W,3] in [0,1], depth_gt, w2c_rot,
    w2c_trans, intr).  Returns metrics dict."""
    psnrs, ssims, depth_l1, lpipss = [], [], [], []
    lpips_fn = _make_lpips()
    for im_gt, depth_gt, R, t, intr in frames:
        img, depth, sil, _ = render_rgbd(
            params, alive, R, t, intr, img_size, span=span, k_max=k_max
        )
        img = np.clip(np.asarray(img), 0, 1)
        psnrs.append(psnr(img, np.asarray(im_gt)))
        ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(im_gt))))
        if lpips_fn is not None:
            lpipss.append(lpips_fn(img, im_gt))
        m = np.asarray(depth_gt) > 0
        if m.any():
            depth_l1.append(
                float(np.abs(np.asarray(depth) - np.asarray(depth_gt))[m].mean())
            )
    report = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "depth_l1": float(np.mean(depth_l1)) if depth_l1 else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "n_frames": len(frames),
    }
    return report


def print_report(report: dict):
    print(json.dumps(report, indent=2))
