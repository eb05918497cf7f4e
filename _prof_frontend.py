"""Profile the frontend keyframe step on the real TPU: where do 480 ms go?"""
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


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
    cfg = SLAMConfig()

    net, params = init_params(cfg, seed=0)
    jax.block_until_ready(params)
    log("params initialized")

    video = Video(cfg)
    N, h, w = cfg.buffer, cfg.ht8, cfg.wd8
    T = 24
    video.counter = T

    # --- on-device staging: one jitted program, no host uploads ---
    fd = video.state.fmaps.dtype

    import functools

    @functools.partial(jax.jit, static_argnames=("T",))
    def stage(state, key, T):
        ks = jax.random.split(key, 5)
        fmaps = state.fmaps.at[:T].set(
            jax.random.normal(ks[0], (T,) + state.fmaps.shape[1:], jnp.float32).astype(fd))
        nets = state.nets.at[:T].set(
            jax.random.normal(ks[1], (T,) + state.nets.shape[1:], jnp.float32).astype(fd))
        inps = state.inps.at[:T].set(
            jax.random.normal(ks[2], (T,) + state.inps.shape[1:], jnp.float32).astype(fd))
        xi = jnp.cumsum(jax.random.normal(ks[3], (T, 6)) * 0.01, axis=0)
        poses = state.poses.at[:T].set(lie.se3_exp(xi))
        disps = state.disps.at[:T].set(
            0.5 + 0.3 * jax.random.uniform(ks[4], (T,) + state.disps.shape[1:]))
        intr = state.intrinsics.at[:T].set(
            jnp.asarray([state.disps.shape[2] * 4.0, state.disps.shape[2] * 4.0,
                         state.disps.shape[2] / 2, state.disps.shape[1] / 2]))
        return state._replace(fmaps=fmaps, nets=nets, inps=inps, poses=poses,
                              disps=disps, intrinsics=intr)

    t = time.perf_counter()
    video.state = stage(video.state, jax.random.PRNGKey(0), T)
    np.asarray(video.state.poses[:1])
    log(f"on-device staging: {time.perf_counter() - t:.2f}s")

    graph = FactorGraph(net, params, video, cfg)
    ii_l, jj_l = [], []
    for i in range(T - 8, T):
        for j in range(max(0, i - 4), i):
            if len(ii_l) < cfg.max_factors // 2:
                ii_l.append(i)
                jj_l.append(j)
    graph.add_factors(np.asarray(ii_l + jj_l, np.int32),
                      np.asarray(jj_l + ii_l, np.int32))
    log(f"graph seeded with {graph.n_edges} edges")

    def sync():
        np.asarray(video.state.poses[:1])

    # dispatch RTT measurement
    @jax.jit
    def noop(x):
        return x + 1.0

    x = jnp.zeros(8)
    noop(x).block_until_ready()
    t = time.perf_counter()
    for _ in range(20):
        x = noop(x)
    x.block_until_ready()
    log(f"dispatch RTT (noop jit, pipelined x20): {(time.perf_counter()-t)/20*1e3:.2f} ms")
    t = time.perf_counter()
    for _ in range(20):
        noop(x).block_until_ready()
    log(f"dispatch RTT (noop jit, sync each): {(time.perf_counter()-t)/20*1e3:.2f} ms")

    # d2h transfer of one row
    t = time.perf_counter()
    for _ in range(10):
        np.asarray(video.state.poses[:1])
    log(f"d2h 1 row poses: {(time.perf_counter()-t)/10*1e3:.2f} ms")

    # --- warmup full step (compiles) ---
    def keyframe_step():
        graph.age[:] = 0
        graph.add_proximity_factors(
            T - 5, max(0, T - cfg.frontend_window), rad=cfg.frontend_radius,
            nms=cfg.frontend_nms, thresh=cfg.frontend_thresh, remove=True)
        graph._pyr_dirty = True
        graph.update_n(8, use_inactive=True)

    log("warmup...")
    keyframe_step()
    sync()
    keyframe_step()
    sync()
    log("warmup done")

    # --- phase breakdown ---
    import lgu_slam_tpu.slam.factor_graph as fg_mod

    for rep in range(3):
        t_all = time.perf_counter()
        graph.age[:] = 0

        t = time.perf_counter()
        graph.add_proximity_factors(
            T - 5, max(0, T - cfg.frontend_window), rad=cfg.frontend_radius,
            nms=cfg.frontend_nms, thresh=cfg.frontend_thresh, remove=True)
        sync()
        t_prox = time.perf_counter() - t

        graph._pyr_dirty = True
        t = time.perf_counter()
        graph.update_n(8, use_inactive=True)
        t_upd_async = time.perf_counter() - t
        sync()
        t_upd = time.perf_counter() - t
        log(f"rep{rep}: prox={t_prox*1e3:.1f}ms update_n(dispatch)="
            f"{t_upd_async*1e3:.1f}ms update_n(total)={t_upd*1e3:.1f}ms "
            f"step={1e3*(time.perf_counter()-t_all):.1f}ms")

    # sub-breakdown of proximity
    for rep in range(3):
        ix = np.arange(T - 5, T)
        jx = np.arange(max(0, T - cfg.frontend_window), T)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii = ii.reshape(-1); jj = jj.reshape(-1)
        t = time.perf_counter()
        d = video.distance(ii, jj, beta=0.25)
        t_dist = time.perf_counter() - t
        from lgu_slam_tpu.utils import native
        t = time.perf_counter()
        existing_ii = np.concatenate([graph.ii, graph.ii_bad, graph.ii_inac])
        existing_jj = np.concatenate([graph.jj, graph.jj_bad, graph.jj_inac])
        es = native.proximity_plan(
            d.copy(), ii, jj, existing_ii, existing_jj, T - 5,
            max(0, T - cfg.frontend_window), T, cfg.frontend_radius,
            cfg.frontend_nms, cfg.frontend_thresh, graph.max_factors, False)
        t_nms = time.perf_counter() - t
        log(f"  prox breakdown rep{rep}: distance={t_dist*1e3:.1f}ms "
            f"native_nms={t_nms*1e3:.1f}ms n_new={len(es)}")

    # sub-breakdown of update_n: pyramid-build vs loop (unfused calls)
    graph._pyr_dirty = True
    graph._ensure_pyramid()  # compile standalone pyramid build
    np.asarray(graph.pyramid.levels[-1].reshape(-1)[0:1])
    for rep in range(3):
        graph._pyr_dirty = True
        t = time.perf_counter()
        graph._ensure_pyramid()
        np.asarray(graph.pyramid.levels[-1].reshape(-1)[0:1])
        t_pyr = time.perf_counter() - t
        t = time.perf_counter()
        graph.update_n(8, use_inactive=True)
        sync()
        t_loop = time.perf_counter() - t
        log(f"  update breakdown rep{rep}: pyramid={t_pyr*1e3:.1f}ms "
            f"8xloop(cached pyr)={t_loop*1e3:.1f}ms")

    # --- device trace of one pyramid build ---
    import jax.profiler
    graph._pyr_dirty = True
    jax.profiler.start_trace("/tmp/pyr_trace")
    graph._ensure_pyramid()
    np.asarray(graph.pyramid.levels[-1].reshape(-1)[0:1])
    jax.profiler.stop_trace()
    log("pyramid trace written")

    # --- device trace of one warm update_n(8) ---
    import jax.profiler
    jax.profiler.start_trace("/tmp/kf_trace")
    graph.update_n(8, use_inactive=True)
    sync()
    jax.profiler.stop_trace()
    log("trace written to /tmp/kf_trace")

    # plan-cache behaviour: second update_n with warm plan
    for rep in range(3):
        t = time.perf_counter()
        graph.update_n(8, use_inactive=True)
        sync()
        log(f"  warm-plan update_n(8): {1e3*(time.perf_counter()-t):.1f}ms")

    # single iteration granularity
    for rep in range(2):
        t = time.perf_counter()
        graph.update_n(1, use_inactive=True)
        sync()
        log(f"  warm-plan update_n(1): {1e3*(time.perf_counter()-t):.1f}ms")


if __name__ == "__main__":
    main()
