"""Render-quality evaluation for the Gaussian scene (reference:
to3DGS/utils/eval_helpers.py — PSNR/SSIM/LPIPS report over the trajectory;
LPIPS requires a pretrained perceptual net and is intentionally gated out
in this environment)."""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from lgu_slam_tpu.gs.render import render_rgbd
from lgu_slam_tpu.gs.ssim import ssim


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def evaluate_renders(params, alive, frames, img_size, span=6, k_max=96):
    """frames: list of (im_gt [H,W,3] in [0,1], depth_gt, w2c_rot,
    w2c_trans, intr).  Returns metrics dict."""
    psnrs, ssims, depth_l1 = [], [], []
    for im_gt, depth_gt, R, t, intr in frames:
        img, depth, sil, _ = render_rgbd(
            params, alive, R, t, intr, img_size, span=span, k_max=k_max
        )
        img = np.clip(np.asarray(img), 0, 1)
        psnrs.append(psnr(img, np.asarray(im_gt)))
        ssims.append(float(ssim(jnp.asarray(img), jnp.asarray(im_gt))))
        m = np.asarray(depth_gt) > 0
        if m.any():
            depth_l1.append(
                float(np.abs(np.asarray(depth) - np.asarray(depth_gt))[m].mean())
            )
    report = {
        "psnr": float(np.mean(psnrs)),
        "ssim": float(np.mean(ssims)),
        "depth_l1": float(np.mean(depth_l1)) if depth_l1 else float("nan"),
        "n_frames": len(frames),
    }
    return report


def print_report(report: dict):
    print(json.dumps(report, indent=2))
