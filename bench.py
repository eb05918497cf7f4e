"""Benchmark: frontend keyframe-update throughput on real hardware.

Measures the production frontend path at reference scale (384x512 images
-> 48x64 feature maps, 48-edge factor graph, 512-frame buffer): host-side
proximity planning (device frame-distance + NMS) + correlation-pyramid
rebuild + a fused 8-iteration {reprojection, deformable pyramid lookup,
KAN-GRU update, dense bundle adjustment} device program — i.e. exactly
what one tracked keyframe costs (droid_frontend.py:35-73 equivalent).

Cold-cache safety (round-2 bench timed out, rc=124): parameters are
initialized on the host CPU (seconds, not ~170 s of device round-trips),
progress is logged to stderr with timestamps, and the edge topology is
held fixed across reps (round-1 defect: edges aged out by rep ~4 and the
timed loop measured no-ops).  Every rep asserts the graph still holds the
full edge count.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
DROID-class frontends sustain ~10 keyframe updates/s on a desktop GPU at
these settings, so vs_baseline = value / 10.0.
"""

import json
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[bench {time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


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

    log(f"devices={jax.devices()}")
    cfg = SLAMConfig()  # 384x512, buffer 512, 48 max factors
    rng = np.random.default_rng(0)

    net, params = init_params(cfg, seed=0)  # host-CPU init
    jax.block_until_ready(params)
    log("params initialized")

    video = Video(cfg)
    N, h, w = cfg.buffer, cfg.ht8, cfg.wd8
    T = 24
    video.counter = T

    fd = video.state.fmaps.dtype
    video.state = video.state._replace(
        fmaps=video.state.fmaps.at[:T].set(
            jnp.asarray(
                rng.normal(size=(T, 1, h, w, 128)).astype(np.float32)
            ).astype(fd)
        ),
        nets=video.state.nets.at[:T].set(
            jnp.asarray(
                rng.normal(size=(T, h, w, 128)).astype(np.float32)
            ).astype(fd)
        ),
        inps=video.state.inps.at[:T].set(
            jnp.asarray(
                rng.normal(size=(T, h, w, 128)).astype(np.float32)
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
    np.asarray(video.state.poses[:1])
    log("video state staged")

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
    n_edges = graph.n_edges
    log(f"graph seeded with {n_edges} edges")

    def keyframe_step():
        # the per-tracked-keyframe frontend path (droid_frontend.py:35-73):
        # proximity re-planning (device frame-distance + host NMS; the
        # fixed topology dedups to zero additions so all reps measure the
        # same 48-edge program — round-1 starvation fix), a pyramid
        # rebuild, and the fused 8x(GRU + 2-GN DBA) device program.
        graph.age[:] = 0  # keep topology fixed across reps
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

    log("warmup (compiles the fused program on a cold cache)...")
    keyframe_step()
    sync()
    assert graph.n_edges == n_edges, "graph starved during warmup"
    # second warmup rep: after the first update the poses/disps have
    # moved, so the proximity re-plan can evict+store edges for the first
    # time, compiling _compact/_store_inactive (cost ~20 s observed when
    # it landed inside rep 0 of the timed loop)
    keyframe_step()
    sync()
    assert graph.n_edges == n_edges, "graph starved during warmup"
    log("warmup done; timing 20 reps")

    reps = 20
    start = time.perf_counter()
    for r in range(reps):
        keyframe_step()
        if r in (0, reps - 1):
            sync()
            log(f"rep {r}: cumulative "
                f"{time.perf_counter() - start:.2f}s, "
                f"n_edges={graph.n_edges}")
    sync()
    dt = time.perf_counter() - start
    assert graph.n_edges == n_edges, "graph starved during timing"

    kf_per_s = reps / dt
    log(f"total {dt:.2f}s for {reps} keyframe updates")
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
