#!/usr/bin/env python
"""Per-phase TPU timing of the frontend keyframe update: pyramid build,
correlation lookup, GRU update op, and DBA — to target Pallas optimization
where it pays (SURVEY.md §7.2 step 8)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, *args, reps=20, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.geom.dba import DbaPlan, dba_step
    from lgu_slam_tpu.geom.projective import projective_transform
    from lgu_slam_tpu.models.corr import corr_lookup
    from lgu_slam_tpu.models.net import LGUNet
    from lgu_slam_tpu.slam.factor_graph import _build_pyramids, _update_op
    from lgu_slam_tpu.slam.state import make_video_state
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    cfg = SLAMConfig()
    rng = np.random.default_rng(0)
    net, params = init_params(cfg, seed=0)
    video = make_video_state(cfg)
    N, h, w = cfg.buffer, cfg.ht8, cfg.wd8
    T = 24
    fd = video.fmaps.dtype
    video = video._replace(
        fmaps=video.fmaps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, 1, h, w, 128)), jnp.float32).astype(fd)
        ),
        nets=video.nets.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32).astype(fd)
        ),
        inps=video.inps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32).astype(fd)
        ),
        poses=video.poses.at[:T].set(
            lie.se3_exp(jnp.asarray(np.cumsum(rng.normal(size=(T, 6)) * 0.01, 0), jnp.float32))
        ),
        disps=video.disps.at[:T].set(
            jnp.asarray(0.5 + 0.3 * rng.random((T, h, w)), jnp.float32)
        ),
        intrinsics=video.intrinsics.at[:T].set(
            jnp.asarray([w * 4.0, w * 4.0, w / 2, h / 2])
        ),
    )

    ii_l, jj_l = [], []
    for i in range(T - 8, T):
        for j in range(max(0, i - 4), i):
            if len(ii_l) < cfg.max_factors // 2:
                ii_l.append(i)
                jj_l.append(j)
    ii_np = np.asarray(ii_l + jj_l, np.int32)
    jj_np = np.asarray(jj_l + ii_l, np.int32)
    E = cfg.edge_bucket
    ii = np.zeros(E, np.int32)
    jj = np.zeros(E, np.int32)
    mask = np.zeros(E, np.float32)
    ii[: len(ii_np)] = ii_np
    jj[: len(jj_np)] = jj_np
    mask[: len(ii_np)] = 1.0
    ii_j, jj_j, mask_j = jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(mask)
    c = jnp.zeros(E, jnp.int32)

    ms_pyr = timeit(
        _build_pyramids, net, params, video.fmaps, ii_j, jj_j, c, reps=10
    )
    pyr = _build_pyramids(net, params, video.fmaps, ii_j, jj_j, c)

    coords, _ = projective_transform(
        video.poses, video.disps, video.intrinsics, ii_j, jj_j
    )

    lookup = jax.jit(lambda p, co: corr_lookup(p, co))
    ms_lookup = timeit(lookup, pyr, coords, reps=20)

    netbuf = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)
    target = coords
    uniq = np.unique(ii_np)
    F = cfg.frame_bucket
    slot_of = {int(f): s for s, f in enumerate(uniq)}
    edge_slot = np.zeros(E, np.int32)
    edge_slot[: len(ii_np)] = [slot_of[int(i)] for i in ii_np]
    ms_update = timeit(
        _update_op, net, params, video, pyr, netbuf, ii_j, jj_j, target,
        mask_j, jnp.asarray(edge_slot), F, reps=20,
    )

    plan = DbaPlan.build(ii_np, jj_np, N, edge_bucket=E)
    eta = jnp.full((N, h, w), 1e-4)
    weight = jnp.ones((E, h, w, 2)) * mask_j[:, None, None, None]
    ms_dba = timeit(
        dba_step, video.poses, video.disps, video.intrinsics[0],
        video.disps_sens, target, weight, eta,
        *plan.jax_arrays(),
        jnp.int32(T - 12), jnp.int32(T), P=cfg.pose_bucket, iters=2,
        reps=20,
    )

    total_per_kf = ms_pyr + 8 * (ms_update + ms_dba)
    print(f"pyramid build (64-slot):   {ms_pyr:8.2f} ms")
    print(f"corr lookup alone:         {ms_lookup:8.2f} ms")
    print(f"update op (lookup+GRU):    {ms_update:8.2f} ms")
    print(f"dba_step (2 GN iters):     {ms_dba:8.2f} ms")
    print(f"keyframe total (1 pyr + 8x(update+dba)): {total_per_kf:8.2f} ms")


if __name__ == "__main__":
    main()
