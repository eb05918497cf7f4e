"""Benchmark: frontend keyframe-update throughput on real hardware.

Measures the full per-keyframe frontend work at reference scale
(384x512 images -> 48x64 feature maps, 48-edge factor graph, 512-frame
buffer): correlation-pyramid rebuild + 8 iterations of {reprojection,
deformable pyramid lookup, KAN-GRU update, dense bundle adjustment}.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md); DROID-class frontends process ~10 keyframes/s on a
desktop GPU at these settings, so vs_baseline = value / 10.0.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.geom.dba import DbaPlan, dba_step
    from lgu_slam_tpu.slam.factor_graph import _build_pyramids, _update_op
    from lgu_slam_tpu.slam.state import make_video_state
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    cfg = SLAMConfig()  # 384x512, buffer 512, 48 max factors
    rng = np.random.default_rng(0)

    net, params = init_params(cfg, seed=0)
    video = make_video_state(cfg)

    N = cfg.buffer
    h, w = cfg.ht8, cfg.wd8
    T = 24  # active window of keyframes

    fd = video.fmaps.dtype
    video = video._replace(
        fmaps=video.fmaps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, 1, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        nets=video.nets.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        inps=video.inps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        poses=video.poses.at[:T].set(
            lie.se3_exp(
                jnp.asarray(
                    np.cumsum(rng.normal(size=(T, 6)) * 0.01, 0), jnp.float32
                )
            )
        ),
        disps=video.disps.at[:T].set(
            jnp.asarray(0.5 + 0.3 * rng.random((T, h, w)), jnp.float32)
        ),
        intrinsics=video.intrinsics.at[:T].set(
            jnp.asarray([cfg.wd8 * 4.0, cfg.wd8 * 4.0, cfg.wd8 / 2,
                         cfg.ht8 / 2])
        ),
    )

    # 48-edge frontend-style graph over the window
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

    target = jnp.zeros((E, h, w, 2))
    netbuf = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.float32)

    plan = DbaPlan.build(ii_np, jj_np, N, edge_bucket=E)
    t0, t1 = jnp.int32(T - 12), jnp.int32(T)
    P = cfg.pose_bucket
    eta = jnp.full((N, h, w), 1e-4)

    # compact frame slots for GraphAgg
    uniq = np.unique(ii_np)
    F = cfg.frame_bucket
    frame_ids = np.zeros(F, np.int32)
    frame_ids[: len(uniq)] = uniq
    slot_of = {int(f): s for s, f in enumerate(uniq)}
    edge_slot = np.zeros(E, np.int32)
    edge_slot[: len(ii_np)] = [slot_of[int(i)] for i in ii_np]
    edge_slot_j = jnp.asarray(edge_slot)

    def keyframe_step(video, netbuf, target):
        pyr = _build_pyramids(net, params, video.fmaps, ii_j, jj_j, c)
        poses, disps = video.poses, video.disps
        for _ in range(8):
            netbuf, target, weight, eta_u, upmask, fmask = _update_op(
                net, params, video, pyr, netbuf, ii_j, jj_j, target, mask_j,
                edge_slot_j, F,
            )
            poses, disps = dba_step(
                poses, disps, video.intrinsics[0], video.disps_sens,
                target, weight, eta,
                jnp.asarray(plan.ii), jnp.asarray(plan.jj),
                jnp.asarray(plan.edge_mask), jnp.asarray(plan.rows_of_frame),
                t0, t1, P=P, iters=2,
            )
            video = video._replace(poses=poses, disps=disps)
        return video, netbuf, target

    # warmup/compile
    video2, nb, tg = keyframe_step(video, netbuf, target)
    jax.block_until_ready(video2.poses)

    reps = 10
    start = time.perf_counter()
    v, nb, tg = video, netbuf, target
    for _ in range(reps):
        v, nb, tg = keyframe_step(v, nb, tg)
    jax.block_until_ready(v.poses)
    dt = time.perf_counter() - start

    kf_per_s = reps / dt
    print(
        json.dumps(
            {
                "metric": "frontend_keyframe_updates_per_s",
                "value": round(kf_per_s, 3),
                "unit": "keyframes/s (8 GRU+DBA iters each, 384x512)",
                "vs_baseline": round(kf_per_s / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
