import json, time
import numpy as np
from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax
jax.config.update("jax_log_compiles", True)
import jax, jax.numpy as jnp
from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig

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

def step(tag):
    t0=time.perf_counter()
    graph.rm_factors(graph.age > cfg.max_age, store=True)
    jax.block_until_ready(graph.target); t1=time.perf_counter()
    graph.add_proximity_factors(T-5, max(0,T-cfg.frontend_window), rad=cfg.frontend_radius,
        nms=cfg.frontend_nms, thresh=cfg.frontend_thresh, remove=True)
    jax.block_until_ready(graph.target); t2=time.perf_counter()
    graph._pyr_dirty = True
    graph.update_n(8, use_inactive=True)
    jax.block_until_ready(video.state.poses); t3=time.perf_counter()
    print(f"{tag}: rm={1e3*(t1-t0):.1f}ms prox={1e3*(t2-t1):.1f}ms update={1e3*(t3-t2):.1f}ms n_edges={graph.n_edges}")

for i in range(4):
    step(i)
