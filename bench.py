"""Benchmark: frontend keyframe-update throughput on real hardware.

Measures the production frontend path at reference scale (384x512 images
-> 48x64 feature maps, 48-edge factor graph, 512-frame buffer): host-side
topology planning + correlation-pyramid rebuild + a fused 8-iteration
{reprojection, deformable pyramid lookup, KAN-GRU update, dense bundle
adjustment} device loop — i.e. exactly what one tracked keyframe costs
(droid_frontend.py:35-73 equivalent).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
DROID-class frontends process ~10 keyframes/s on a desktop GPU at these
settings, so vs_baseline = value / 10.0.
"""

import json
import time

import numpy as np


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.slam.factor_graph import FactorGraph
    from lgu_slam_tpu.slam.state import Video
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    cfg = SLAMConfig()  # 384x512, buffer 512, 48 max factors
    rng = np.random.default_rng(0)

    net, params = init_params(cfg, seed=0)
    video = Video(cfg)
    N, h, w = cfg.buffer, cfg.ht8, cfg.wd8
    T = 24
    video.counter = T

    fd = video.state.fmaps.dtype
    video.state = video.state._replace(
        fmaps=video.state.fmaps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, 1, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        nets=video.state.nets.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        inps=video.state.inps.at[:T].set(
            jnp.asarray(rng.normal(size=(T, h, w, 128)), jnp.float32
                        ).astype(fd)
        ),
        poses=video.state.poses.at[:T].set(
            lie.se3_exp(
                jnp.asarray(
                    np.cumsum(rng.normal(size=(T, 6)) * 0.01, 0), jnp.float32
                )
            )
        ),
        disps=video.state.disps.at[:T].set(
            jnp.asarray(0.5 + 0.3 * rng.random((T, h, w)), jnp.float32)
        ),
        intrinsics=video.state.intrinsics.at[:T].set(
            jnp.asarray([w * 4.0, w * 4.0, w / 2, h / 2])
        ),
    )

    graph = FactorGraph(net, params, video, cfg)
    ii_l, jj_l = [], []
    for i in range(T - 8, T):
        for j in range(max(0, i - 4), i):
            if len(ii_l) < cfg.max_factors // 2:
                ii_l.append(i)
                jj_l.append(j)
    graph.add_factors(
        np.asarray(ii_l + jj_l, np.int32), np.asarray(jj_l + ii_l, np.int32)
    )

    def keyframe_step():
        # the real per-tracked-keyframe frontend path
        # (droid_frontend.py:35-73): age out old edges, re-plan proximity
        # edges (device frame-distance + host NMS -> plan rebuild), then
        # the fused {pyramid build + 8x(GRU update + DBA)} device program.
        graph.rm_factors(graph.age > cfg.max_age, store=True)
        graph.add_proximity_factors(
            T - 5, max(0, T - cfg.frontend_window), rad=cfg.frontend_radius,
            nms=cfg.frontend_nms, thresh=cfg.frontend_thresh, remove=True,
        )
        graph._pyr_dirty = True  # new keyframe -> pyramid rebuild
        graph.update_n(8, use_inactive=True)

    def sync():
        # device->host transfer: a true pipeline drain (block_until_ready
        # can return early over the axon tunnel)
        np.asarray(video.state.poses[:1])

    # warmup/compile
    keyframe_step()
    sync()

    reps = 20
    start = time.perf_counter()
    for _ in range(reps):
        keyframe_step()
    sync()
    dt = time.perf_counter() - start

    kf_per_s = reps / dt
    print(
        json.dumps(
            {
                "metric": "frontend_keyframe_updates_per_s",
                "value": round(kf_per_s, 3),
                "unit": "keyframes/s (8 fused GRU+DBA iters each, 384x512)",
                "vs_baseline": round(kf_per_s / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
