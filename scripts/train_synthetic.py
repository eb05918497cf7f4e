#!/usr/bin/env python
"""Training convergence proof on synthetic data (VERDICT r4 missing #1).

Runs the REAL training step (parallel/train_dp.py: unrolled LGUNet forward
with per-step differentiable BA, 4 losses, Adam+OneCycle) on synthetic
multi-billboard clips with exact ground truth, then shows:

  1. loss and flow-EPE (f_error) decrease materially over training;
  2. (--holdout) the full SLAM system tracks a held-out clip with the
     trained weights at materially lower ATE than with random init.

Reference protocol being mirrored: train.py:105-184 (loop),
droid_net.py:199-238 (unrolled forward).

Usage:
    LGU_PLATFORM=cpu python scripts/train_synthetic.py --steps 300
    python scripts/train_synthetic.py --steps 600 --holdout   # on the chip
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_training(args, tcfg, net, params):
    import jax

    from lgu_slam_tpu.data.synthetic import SyntheticDataset
    from lgu_slam_tpu.parallel.train_dp import (
        make_data_mesh, make_optimizer, make_train_step, replicate,
        shard_batch,
    )

    H, W = tcfg.image_size
    db = SyntheticDataset(
        n_scenes=args.scenes, frames_per_scene=args.frames_per_scene,
        n_frames=tcfg.n_frames, crop_size=(H, W), seed=0,
    )
    print(f"[train_synth] dataset: {len(db)} clips "
          f"({args.scenes} scenes x {args.frames_per_scene} frames)")

    N = tcfg.n_frames
    ii = np.asarray(
        [i for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )
    jj = np.asarray(
        [j for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )

    import jax

    tx = make_optimizer(tcfg)
    # data mesh must divide the batch (8 virtual CPU devices vs small
    # proof batches): use the largest divisor of batch that fits
    n_dev = max(
        d for d in range(1, jax.device_count() + 1) if tcfg.batch % d == 0
    )
    mesh = make_data_mesh(n_dev)
    params = replicate(params, mesh)
    opt_state = tx.init(params)
    step_fn = make_train_step(net, tx, tcfg, ii, jj)

    rng = np.random.default_rng(0)
    history = []
    t_start = time.time()
    for step in range(tcfg.steps):
        idx = rng.integers(0, len(db), size=tcfg.batch)
        items = [db[int(i)] for i in idx]
        images = np.stack([it[0] for it in items]).astype(np.float32)
        poses = np.stack([it[1] for it in items])
        depths = np.stack([it[2] for it in items])
        intr = np.stack([it[3] for it in items])
        disps = np.where(depths > 0.01, 1.0 / np.maximum(depths, 0.01), 0.0)

        batch = shard_batch((images, poses, disps, intr), mesh)
        B, Nf = images.shape[:2]
        h8, w8 = images.shape[2] // 8, images.shape[3] // 8
        Gs0 = np.zeros((B, Nf, 7), np.float32)
        disp0 = np.zeros((B, Nf, h8, w8), np.float32)
        t0 = time.time()
        params, opt_state, metrics, _ = step_fn(
            params, opt_state, batch, Gs0, disp0
        )
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["step_time"] = time.time() - t0
        history.append(metrics)
        if step < 3 or (step + 1) % args.log_every == 0:
            print(
                f"[train_synth] step {step + 1}/{tcfg.steps} "
                f"loss={metrics['loss']:.4f} f_error={metrics['f_error']:.3f} "
                f"rot={metrics['rot_error']:.4f} tr={metrics['tr_error']:.4f} "
                f"({metrics['step_time']:.2f}s)", flush=True,
            )

    elapsed = time.time() - t_start
    params = jax.tree_util.tree_map(np.asarray, params)
    return params, history, elapsed


def summarize(history, window_frac=0.1):
    w = max(3, int(len(history) * window_frac))
    first = {k: float(np.mean([h[k] for h in history[:w]]))
             for k in ("loss", "f_error", "rot_error", "tr_error")}
    last = {k: float(np.mean([h[k] for h in history[-w:]]))
            for k in ("loss", "f_error", "rot_error", "tr_error")}
    return first, last, w


def run_holdout(args, net, params_trained, params_random, cfg_img):
    """Track a held-out synthetic clip with trained vs random weights and
    score Sim(3)-aligned ATE against the exact trajectory."""
    from lgu_slam_tpu.data.synthetic import render_clip
    from lgu_slam_tpu.eval.ate import ate_rmse
    from lgu_slam_tpu.slam.system import LGUSlam
    from lgu_slam_tpu.utils.config import SLAMConfig

    H, W = cfg_img
    n_frames = args.holdout_frames
    images, poses_gt, depths, intr = render_clip(
        seed=90210, n_frames=n_frames, H=H, W=W,
        t_step=0.6, r_step=0.03,
    )

    def track(params):
        cfg = SLAMConfig(
            image_size=(H, W), buffer=n_frames + 20,
            warmup=8, filter_thresh=0.1, keyframe_thresh=0.25,
            frontend_window=12, frontend_radius=2, frontend_thresh=24.0,
            frontend_iters1=4, frontend_iters2=2,
            max_factors=48, edge_bucket=64, inactive_bucket=64,
            pose_bucket=n_frames + 20, frame_bucket=48,
            backend_edge_cap=16 * n_frames, backend_chunk=64,
            backend_thresh=32.0,
            volume_dtype="float32", compute_dtype="float32",
            feat_dtype="float32",
        )
        slam = LGUSlam(params, cfg, net_def=net)
        for t in range(n_frames):
            slam.track(float(t), images[t], intrinsics=intr[t])

        def stream():
            for t in range(n_frames):
                yield float(t), images[t], intr[t]

        traj = slam.terminate(stream())  # c2w [T, 7]
        return traj

    out = {}
    for name, p in (("trained", params_trained), ("random", params_random)):
        traj = track(p)
        rmse, _, _ = ate_rmse(poses_gt[:, :3], traj[:, :3],
                              correct_scale=True)
        out[name] = float(rmse)
        print(f"[train_synth] holdout ATE ({name} weights): {rmse:.4f}",
              flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--lr", type=float, default=4e-4)
    p.add_argument("--size", type=int, nargs=2, default=(96, 128))
    p.add_argument("--scenes", type=int, default=10)
    p.add_argument("--frames_per_scene", type=int, default=24)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--holdout", action="store_true")
    p.add_argument("--holdout_from", default=None,
                   help="skip training; run the holdout ATE comparison "
                        "with weights from this checkpoint")
    p.add_argument("--holdout_frames", type=int, default=30)
    p.add_argument("--out", default="checkpoints/synthetic_proof.pkl")
    p.add_argument("--summary", default="synthetic_training_summary.json")
    args = p.parse_args()

    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()

    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.checkpoint import save_train_state
    from lgu_slam_tpu.utils.config import SLAMConfig, TrainConfig

    H, W = args.size
    tcfg = TrainConfig(
        batch=args.batch, iters=args.iters, steps=args.steps, lr=args.lr,
        n_frames=4, image_size=(H, W), pct_start=0.05,
    )
    net, params0 = init_params(
        SLAMConfig(image_size=(H, W), volume_dtype="float32",
                   compute_dtype="float32", feat_dtype="float32")
    )
    import jax

    params_random = jax.tree_util.tree_map(np.asarray, params0)

    if args.holdout_from:
        from lgu_slam_tpu.utils.checkpoint import load_train_state

        params, _, step, _ = load_train_state(args.holdout_from)
        print(f"[train_synth] holdout-only from {args.holdout_from} "
              f"(step {step})")
        ate = run_holdout(args, net, params, params_random, (H, W))
        with open(args.summary, "w") as fh:
            json.dump({"holdout_ate": ate}, fh, indent=2)
        print(json.dumps({"holdout_ate": ate}))
        assert ate["trained"] < ate["random"], (
            "trained weights did not beat random-init ATE"
        )
        print("[train_synth] TRAINED WEIGHTS BEAT RANDOM INIT")
        return

    params, history, elapsed = run_training(args, tcfg, net, params0)

    first, last, w = summarize(history)
    print(f"[train_synth] {args.steps} steps in {elapsed:.0f}s; "
          f"first-{w}-step means vs last-{w}-step means:")
    for k in first:
        print(f"  {k}: {first[k]:.4f} -> {last[k]:.4f} "
              f"({100 * (1 - last[k] / max(first[k], 1e-12)):+.1f}% lower)")

    summary = {
        "steps": args.steps, "elapsed_s": elapsed,
        "first": first, "last": last,
        "learned": bool(last["loss"] < 0.8 * first["loss"]
                        and last["f_error"] < 0.8 * first["f_error"]),
    }

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_train_state(args.out, params, None, args.steps, None)
    print(f"[train_synth] checkpoint -> {args.out}")

    if args.holdout:
        summary["holdout_ate"] = run_holdout(
            args, net, params, params_random, (H, W)
        )

    with open(args.summary, "w") as fh:
        json.dump(summary, fh, indent=2)
    print(json.dumps(summary))
    assert summary["learned"], (
        "training did not reduce loss and flow-EPE by >=20%"
    )
    print("[train_synth] LEARNING CONFIRMED")


if __name__ == "__main__":
    main()
