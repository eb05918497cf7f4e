#!/usr/bin/env python
"""Train LGUNet on TartanAir (reference: train.py).

Data-parallel over all visible devices; Adam + one-cycle; random restarts
with pose/disp carry-over; checkpoints every N steps.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="lgu_tpu")
    p.add_argument("--datapath", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=9)
    p.add_argument("--steps", type=int, default=250000)
    p.add_argument("--lr", type=float, default=1.3e-4)
    p.add_argument("--clip", type=float, default=2.5)
    p.add_argument("--n_frames", type=int, default=4)
    p.add_argument("--fmin", type=float, default=8.0)
    p.add_argument("--fmax", type=float, default=96.0)
    p.add_argument("--restart_prob", type=float, default=0.2)
    p.add_argument("--ckpt_every", type=int, default=1000)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu.data.augmentation import RGBDAugmentor
    from lgu_slam_tpu.data.tartan import dataset_factory
    from lgu_slam_tpu.parallel.train_dp import (
        make_data_mesh, make_optimizer, make_train_step, replicate,
        shard_batch,
    )
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig, TrainConfig
    from lgu_slam_tpu.utils.logger import Logger

    tcfg = TrainConfig(
        batch=args.batch, iters=args.iters, steps=args.steps, lr=args.lr,
        clip=args.clip, n_frames=args.n_frames, fmin=args.fmin,
        fmax=args.fmax, restart_prob=args.restart_prob,
        ckpt_every=args.ckpt_every,
    )

    from lgu_slam_tpu.utils.checkpoint import (
        load_train_state, save_train_state,
    )

    # training keeps fp32 end to end: the differentiable patch lookup
    # backprops through the volume (bf16 storage would round those
    # gradients), and the same rounding argument applies to the encoder /
    # update-operator conv compute (net.py keeps the fp32 compute default
    # for training; bf16 is an inference-path choice)
    net, params = init_params(
        SLAMConfig(image_size=tcfg.image_size, volume_dtype="float32",
                   compute_dtype="float32", feat_dtype="float32")
    )
    total = 0
    restored_opt = None
    restored_rng = None
    if args.ckpt:
        params, restored_opt, total, restored_rng = load_train_state(
            args.ckpt
        )

    tx = make_optimizer(tcfg)
    mesh = make_data_mesh()
    params = replicate(params, mesh)
    opt_state = (
        replicate(restored_opt, mesh) if restored_opt is not None
        else tx.init(params)
    )

    if args.datapath == "synthetic":
        # offline stand-in: ray-traced multi-billboard clips with exact
        # ground truth (data/synthetic.py) — same item contract as the
        # TartanAir clip dataset
        from lgu_slam_tpu.data.synthetic import SyntheticDataset

        db = SyntheticDataset(n_frames=tcfg.n_frames,
                              crop_size=tcfg.image_size)
    else:
        db = dataset_factory(["tartan"], args.datapath,
                             n_frames=tcfg.n_frames,
                             fmin=tcfg.fmin, fmax=tcfg.fmax)
    aug = RGBDAugmentor(crop_size=tcfg.image_size)
    rng = np.random.default_rng(0)
    if restored_rng is not None:
        rng.bit_generator.state = restored_rng

    # fixed chain graph (train.py:120-122; covisibility rebuild happens in
    # the dataset's clip sampling)
    N = tcfg.n_frames
    ii = np.asarray(
        [i for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )
    jj = np.asarray(
        [j for i in range(N) for j in range(N) if i != j and abs(i - j) <= 2]
    )
    step_fn = make_train_step(net, tx, tcfg, ii, jj)

    logger = Logger(args.name)
    os.makedirs("checkpoints", exist_ok=True)

    while total < tcfg.steps:
        idx = rng.integers(0, len(db), size=tcfg.batch)
        items = [aug(*db[int(i)]) for i in idx]
        images = np.stack([it[0] for it in items]).astype(np.float32)
        poses = np.stack([it[1] for it in items])
        depths = np.stack([it[2] for it in items])
        intr = np.stack([it[3] for it in items])
        disps = np.where(depths > 0.01, 1.0 / np.maximum(depths, 0.01), 0.0)

        batch = shard_batch((images, poses, disps, intr), mesh)
        t0 = time.time()
        # random restarts carrying poses/disps (train.py:130-149)
        B, Nf = images.shape[:2]
        h8, w8 = images.shape[2] // 8, images.shape[3] // 8
        Gs0 = np.zeros((B, Nf, 7), np.float32)
        disp0 = np.zeros((B, Nf, h8, w8), np.float32)
        r = 0.0
        while True:
            params, opt_state, metrics, (Gs0, disp0) = step_fn(
                params, opt_state, batch, Gs0, disp0
            )
            r = rng.random()
            if r >= tcfg.restart_prob:
                break
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["step_time"] = time.time() - t0
        total += 1
        logger.push(metrics, total)

        if total % tcfg.ckpt_every == 0:
            path = f"checkpoints/{args.name}_{total:06d}.pkl"
            save_train_state(path, params, opt_state, total,
                             rng.bit_generator.state)
            print("saved", path)


if __name__ == "__main__":
    main()
