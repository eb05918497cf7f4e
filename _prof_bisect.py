"""Bisect the 50ms/iter fused _update_loop: which piece is slow in situ?"""
import functools
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _drain(out):
    """True pipeline drain: d2h of one element (block_until_ready returns
    early over the axon tunnel)."""
    import jax
    leaves = jax.tree_util.tree_leaves(out)
    for leaf in leaves:
        if hasattr(leaf, "shape"):
            np.asarray(leaf).reshape(-1)[:1]
            return


def timeit(fn, *args, reps=10, **kw):
    out = fn(*args, **kw)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    _drain(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.geom.dba import dba_step
    from lgu_slam_tpu.slam import factor_graph as fg
    from lgu_slam_tpu.slam.factor_graph import FactorGraph
    from lgu_slam_tpu.slam.state import Video
    from lgu_slam_tpu.slam.system import init_params
    from lgu_slam_tpu.utils.config import SLAMConfig

    cfg = SLAMConfig()
    net, params = init_params(cfg, seed=0)
    jax.block_until_ready(params)
    log("params ready")

    video = Video(cfg)
    T = 24
    video.counter = T
    fd = video.state.fmaps.dtype

    @functools.partial(jax.jit, static_argnames=("T",))
    def stage(state, key, T):
        ks = jax.random.split(key, 5)
        return state._replace(
            fmaps=state.fmaps.at[:T].set(jax.random.normal(ks[0], (T,) + state.fmaps.shape[1:], jnp.float32).astype(fd)),
            nets=state.nets.at[:T].set(jax.random.normal(ks[1], (T,) + state.nets.shape[1:], jnp.float32).astype(fd)),
            inps=state.inps.at[:T].set(jax.random.normal(ks[2], (T,) + state.inps.shape[1:], jnp.float32).astype(fd)),
            poses=state.poses.at[:T].set(lie.se3_exp(jnp.cumsum(jax.random.normal(ks[3], (T, 6)) * 0.01, axis=0))),
            disps=state.disps.at[:T].set(0.5 + 0.3 * jax.random.uniform(ks[4], (T,) + state.disps.shape[1:])),
            intrinsics=state.intrinsics.at[:T].set(jnp.asarray([256.0, 256.0, 32.0, 24.0])),
        )

    video.state = stage(video.state, jax.random.PRNGKey(0), T)
    graph = FactorGraph(net, params, video, cfg)
    ii_l, jj_l = [], []
    for i in range(T - 8, T):
        for j in range(max(0, i - 4), i):
            if len(ii_l) < cfg.max_factors // 2:
                ii_l.append(i)
                jj_l.append(j)
    graph.add_factors(np.asarray(ii_l + jj_l, np.int32), np.asarray(jj_l + ii_l, np.int32))
    graph._ensure_pyramid()
    jax.block_until_ready(graph.pyramid.levels[0])
    log(f"setup done, {graph.n_edges} edges")

    # Recreate exactly the _update_loop invocation update_n makes
    t0_, t1_ = max(1, int(graph.ii.min()) + 1), max(int(graph.ii.max()), int(graph.jj.max())) + 1
    ii, jj, mask = graph._edge_arrays()
    frame_ids, edge_slot, F = graph._frame_slots(cfg.frame_bucket)
    from lgu_slam_tpu.geom.dba import DbaPlan

    E_dba = graph.E + graph.EI
    dba_ii = np.zeros(E_dba, np.int32); dba_jj = np.zeros(E_dba, np.int32)
    dba_mask = np.zeros(E_dba, np.float32)
    ne = graph.n_edges
    dba_ii[:ne] = graph.ii; dba_jj[:ne] = graph.jj; dba_mask[:ne] = 1.0
    plan = DbaPlan.build_masked(dba_ii, dba_jj, dba_mask, cfg.buffer,
                                dmax_bucket=graph._dmax, frame_bucket=graph._kbucket)
    plan_dev = plan.jax_arrays()
    target_inac = graph.target_inac
    weight_inac = graph.weight_inac
    P = cfg.pose_bucket

    tail = (mask, edge_slot, frame_ids, target_inac, weight_inac,
            *plan_dev, jnp.int32(t0_), jnp.int32(t1_))

    def call_loop(n_iters):
        return fg._update_loop(
            net, params, video.state, graph.pyramid,
            jnp.array(graph.net), ii, jj,
            jnp.array(graph.target), jnp.array(graph.weight), *tail,
            num_slots=F, n_iters=n_iters, P=P, dba_iters=2,
            lm=cfg.dba_lm, ep=cfg.dba_ep, EP=1e-7, motion_only=False)

    log(f"loop n=1: {timeit(call_loop, 1):.1f} ms")
    log(f"loop n=8: {timeit(call_loop, 8):.1f} ms")

    # stripped: update_op only, no dba
    def loop_update_only(n_iters):
        state = (graph.net, graph.target, graph.weight)

        def body(_, st):
            netb, target, weight = st
            net2, target2, weight2, eta, upmask, slot_mask = fg._update_op(
                net, params, video.state, graph.pyramid, netb, ii, jj,
                target, mask, edge_slot, F)
            return (net2, target2, weight2)

        return jax.lax.fori_loop(0, n_iters, body, state)

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def upd_loop(state0, vstate, pyr, n_iters):
        def body(_, st):
            netb, target, weight = st
            net2, target2, weight2, eta, upmask, slot_mask = fg._update_op(
                net, params, vstate, pyr, netb, ii, jj,
                target, mask, edge_slot, F)
            return (net2, target2, weight2)
        return jax.lax.fori_loop(0, n_iters, body, state0)

    st0 = (jnp.array(graph.net), jnp.array(graph.target), jnp.array(graph.weight))
    log(f"update-only loop n=8: {timeit(upd_loop, st0, video.state, graph.pyramid, 8):.1f} ms")

    # stripped: dba only
    def loop_dba_only(n_iters):
        s = video.state
        dba_target = jnp.concatenate([graph.target, target_inac], axis=0)
        dba_weight = jnp.concatenate([graph.weight, weight_inac], axis=0)
        dba_weight = dba_weight * jnp.asarray(plan.edge_mask)[:, None, None, None]
        eta_dense = 0.2 * s.damping + 1e-7

        def body(_, st):
            poses, disps = st
            return dba_step(
                poses, disps, s.intrinsics[0], s.disps_sens,
                dba_target, dba_weight, eta_dense, *plan_dev,
                jnp.int32(t0_), jnp.int32(t1_), P=P, iters=2,
                lm=cfg.dba_lm, ep=cfg.dba_ep, motion_only=False)

        return jax.lax.fori_loop(0, n_iters, body, (s.poses, s.disps))

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def dba_loop(s, dba_target, dba_weight, n_iters):
        eta_dense = 0.2 * s.damping + 1e-7
        def body(_, st):
            poses, disps = st
            return dba_step(
                poses, disps, s.intrinsics[0], s.disps_sens,
                dba_target, dba_weight, eta_dense, *plan_dev,
                jnp.int32(t0_), jnp.int32(t1_), P=P, iters=2,
                lm=cfg.dba_lm, ep=cfg.dba_ep, motion_only=False)
        return jax.lax.fori_loop(0, n_iters, body, (s.poses, s.disps))

    dt_ = jnp.concatenate([graph.target, target_inac], axis=0)
    dw_ = jnp.concatenate([graph.weight, weight_inac], axis=0)
    dw_ = dw_ * jnp.asarray(plan.edge_mask)[:, None, None, None]
    log(f"dba-only loop n=8: {timeit(dba_loop, video.state, dt_, dw_, 8):.1f} ms")

    # stripped: update op WITHOUT the corr lookup (replace corr with zeros)
    from lgu_slam_tpu.geom.projective import coords_grid, projective_transform
    from lgu_slam_tpu.models.net import LGUNet

    def loop_gru_only(n_iters):
        s = video.state

        def body(_, st):
            netb, target, weight = st
            coords1, _ = projective_transform(s.poses, s.disps, s.intrinsics, ii, jj)
            ht, wd = coords1.shape[1:3]
            motn = jnp.clip(jnp.concatenate(
                [coords1 - coords_grid(ht, wd), target - coords1], axis=-1), -64.0, 64.0)
            corr = jnp.zeros(coords1.shape[:3] + (196,), jnp.float32)
            inp = s.inps[ii].astype(jnp.float32)
            net2, delta, weight2, eta, upmask, slot_mask = net.apply(
                {"params": params}, netb[None], inp[None], corr[None],
                motn[None], edge_slot, F, mask, method=LGUNet.update_step)
            return (net2[0], coords1 + delta[0].astype(jnp.float32),
                    weight2[0].astype(jnp.float32))

        return jax.lax.fori_loop(0, n_iters, body, (graph.net, graph.target, graph.weight))

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def gru_loop(st0, s, n_iters):
        def body(_, st):
            netb, target, weight = st
            coords1, _ = projective_transform(s.poses, s.disps, s.intrinsics, ii, jj)
            ht, wd = coords1.shape[1:3]
            motn = jnp.clip(jnp.concatenate(
                [coords1 - coords_grid(ht, wd), target - coords1], axis=-1), -64.0, 64.0)
            corr = jnp.zeros(coords1.shape[:3] + (196,), jnp.float32)
            inp = s.inps[ii].astype(jnp.float32)
            net2, delta, weight2, eta, upmask, slot_mask = net.apply(
                {"params": params}, netb[None], inp[None], corr[None],
                motn[None], edge_slot, F, mask, method=LGUNet.update_step)
            return (net2[0], coords1 + delta[0].astype(jnp.float32),
                    weight2[0].astype(jnp.float32))
        return jax.lax.fori_loop(0, n_iters, body, st0)

    log(f"gru-only (zero corr) loop n=8: {timeit(gru_loop, st0, video.state, 8):.1f} ms")

    # lookup-only loop
    def loop_lookup_only(n_iters):
        s = video.state

        def body(_, acc):
            coords1, _ = projective_transform(s.poses, s.disps, s.intrinsics, ii, jj)
            corr = net.apply({"params": params}, graph.pyramid, coords1,
                             method=LGUNet.lookup)
            return acc + corr.sum()

        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    @functools.partial(jax.jit, static_argnames=("n_iters",))
    def lk_loop(s, pyr, n_iters):
        def body(_, acc):
            coords1, _ = projective_transform(s.poses, s.disps, s.intrinsics, ii, jj)
            corr = net.apply({"params": params}, pyr, coords1,
                             method=LGUNet.lookup)
            return acc + corr.sum()
        return jax.lax.fori_loop(0, n_iters, body, 0.0)

    log(f"lookup-only loop n=8: {timeit(lk_loop, video.state, graph.pyramid, 8):.1f} ms")


if __name__ == "__main__":
    main()
