import time
import numpy as np
from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.factor_graph import (
    FactorGraph, _build_pyramids, _update_op, _update_loop, _build_and_update_loop)
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig
from lgu_slam_tpu.geom.dba import DbaPlan, dba_step

cfg = SLAMConfig()
rng = np.random.default_rng(0)
net, params = init_params(cfg, seed=0)
video = Video(cfg)
N, h, w = cfg.buffer, cfg.ht8, cfg.wd8
T = 24
video.counter = T
fd = video.state.fmaps.dtype
video.state = video.state._replace(
    fmaps=video.state.fmaps.at[:T].set(jnp.asarray(rng.normal(size=(T,1,h,w,128)), jnp.float32).astype(fd)),
    nets=video.state.nets.at[:T].set(jnp.asarray(rng.normal(size=(T,h,w,128)), jnp.float32).astype(fd)),
    inps=video.state.inps.at[:T].set(jnp.asarray(rng.normal(size=(T,h,w,128)), jnp.float32).astype(fd)),
    poses=video.state.poses.at[:T].set(lie.se3_exp(jnp.asarray(np.cumsum(rng.normal(size=(T,6))*0.01,0), jnp.float32))),
    disps=video.state.disps.at[:T].set(jnp.asarray(0.5+0.3*rng.random((T,h,w)), jnp.float32)),
    intrinsics=video.state.intrinsics.at[:T].set(jnp.asarray([w*4.0,w*4.0,w/2,h/2])),
)
graph = FactorGraph(net, params, video, cfg)
ii_l, jj_l = [], []
for i in range(T-8, T):
    for j in range(max(0,i-4), i):
        if len(ii_l) < cfg.max_factors//2:
            ii_l.append(i); jj_l.append(j)
graph.add_factors(np.asarray(ii_l+jj_l, np.int32), np.asarray(jj_l+ii_l, np.int32))

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timeit(name, fn, reps=3):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)

ii, jj, mask = graph._edge_arrays()
stereo_c = jnp.zeros(graph.E, jnp.int32)

timeit("build_pyramids", lambda: _build_pyramids(net, params, video.state.fmaps, ii, jj, stereo_c))
graph._ensure_pyramid()
pyr = graph.pyramid
frame_ids, edge_slot, F = graph._frame_slots(cfg.frame_bucket)
timeit("update_op (lookup+GRU+heads)", lambda: _update_op(net, params, video.state, pyr, graph.net, ii, jj, graph.target, mask, edge_slot, F))

E_dba = graph.E + graph.EI
dba_ii = np.zeros(E_dba, np.int32); dba_jj = np.zeros(E_dba, np.int32); dba_m = np.zeros(E_dba, np.float32)
ne = graph.n_edges
dba_ii[:ne] = graph.ii; dba_jj[:ne] = graph.jj; dba_m[:ne] = 1.0
plan = DbaPlan.build_masked(dba_ii, dba_jj, dba_m, cfg.buffer, dmax_bucket=graph._dmax, frame_bucket=graph._kbucket)
pa = plan.jax_arrays()
tgt = jnp.zeros((E_dba, h, w, 2)); wgt = jnp.zeros((E_dba, h, w, 2))
eta = jnp.full((N, h, w), 1e-4)
s = video.state
timeit("dba_step (2 GN)", lambda: dba_step(s.poses, s.disps, s.intrinsics[0], s.disps_sens, tgt, wgt, eta, *pa, jnp.int32(17), jnp.int32(24), P=cfg.pose_bucket, iters=2))
