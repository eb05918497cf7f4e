#!/usr/bin/env python
"""Sharded-backend scaling measurement (BASELINE.md north star: 1 chip /
1 host / multi-device).

Runs the global update_lowmem pass (2 steps, proximity graph at t
keyframes) on an n-device mesh for n in {1, 2, 4, 8} and reports wall
time per pass.  On this image the mesh is 8 *virtual CPU devices*
(--xla_force_host_platform_device_count), so the numbers validate the
sharded program's structure and overheads, not real ICI scaling — on a
TPU pod slice the same code runs with one process per host and real
collectives.

Usage: python scripts/bench_backend_scaling.py [--t 32] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t", type=int, default=32, help="keyframes")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--steps", type=int, default=2)
    args = p.parse_args()

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.slam.factor_graph import FactorGraph
    from lgu_slam_tpu.slam.state import Video
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    T = args.t
    cfg = SLAMConfig(
        image_size=(64, 96), buffer=T, max_factors=16 * T,
        edge_bucket=16 * T, inactive_bucket=16, pose_bucket=T,
        backend_edge_cap=16 * T, backend_chunk=32,
    )
    net, params = init_params(cfg, seed=0)
    rng = np.random.default_rng(0)
    h, w = cfg.ht8, cfg.wd8

    def fresh_graph():
        video = Video(cfg)
        video.counter = T
        fd = video.state.fmaps.dtype
        video.state = video.state._replace(
            fmaps=video.state.fmaps.at[:T].set(jnp.asarray(
                rng.normal(size=(T, 1, h, w, 128)), jnp.float32).astype(fd)),
            nets=video.state.nets.at[:T].set(jnp.asarray(
                rng.normal(size=(T, h, w, 128)), jnp.float32).astype(fd)),
            inps=video.state.inps.at[:T].set(jnp.asarray(
                rng.normal(size=(T, h, w, 128)), jnp.float32).astype(fd)),
            poses=video.state.poses.at[:T].set(lie.se3_exp(jnp.asarray(
                np.cumsum(rng.normal(size=(T, 6)) * 0.01, 0), jnp.float32))),
            disps=video.state.disps.at[:T].set(jnp.asarray(
                0.5 + 0.3 * rng.random((T, h, w)), jnp.float32)),
            intrinsics=video.state.intrinsics.at[:T].set(
                jnp.asarray([w * 4.0, w * 4.0, w / 2, h / 2])),
        )
        g = FactorGraph(net, params, video, cfg, corr_impl="alt",
                        max_factors=cfg.max_factors,
                        edge_bucket=cfg.backend_edge_cap, inactive_bucket=16)
        g.add_proximity_factors(rad=2, nms=2, thresh=1e9)
        return g

    results = {}
    for nd in (1, 2, 4, 8):
        mesh = (None if nd == 1 else
                Mesh(np.asarray(jax.devices()[:nd]), ("kf",)))
        g = fresh_graph()
        n_edges = g.n_edges
        # warmup (compile)
        g.update_lowmem(steps=args.steps, mesh=mesh)
        jax.block_until_ready(g.video.state.poses)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            g.update_lowmem(steps=args.steps, mesh=mesh)
            jax.block_until_ready(g.video.state.poses)
            times.append(time.perf_counter() - t0)
        results[nd] = min(times)
        print(f"devices={nd}: {min(times)*1e3:8.1f} ms / pass "
              f"({args.steps} steps, {n_edges} edges, t={T})",
              file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "backend_lowmem_pass_ms_by_devices",
        "t": T, "steps": args.steps,
        "ms": {str(k): round(v * 1e3, 1) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
