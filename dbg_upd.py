import time
import numpy as np
from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig
from lgu_slam_tpu.models.net import LGUNet
from lgu_slam_tpu.geom.projective import coords_grid, projective_transform
from functools import partial

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
graph._ensure_pyramid()
pyr = graph.pyramid
ii, jj, mask = graph._edge_arrays()
frame_ids, edge_slot, F = graph._frame_slots(cfg.frame_bucket)

def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])

def timeit(name, f, *args, reps=3):
    out = f(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    sync(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)

@partial(jax.jit, static_argnames=("net_def",))
def do_lookup(net_def, params, pyr, coords1):
    return net_def.apply({"params": params}, pyr, coords1, method=LGUNet.lookup)

@partial(jax.jit, static_argnames=("net_def", "ns"))
def do_update(net_def, params, netbuf, inp, corr, motn, edge_slot, mask, ns):
    return net_def.apply({"params": params}, netbuf[None], inp[None], corr[None], motn[None], edge_slot, ns, mask, method=LGUNet.update_step)

@partial(jax.jit, static_argnames=())
def reproject(poses, disps, intr, ii, jj):
    c1, _ = projective_transform(poses, disps, intr, ii, jj)
    return c1

coords1 = reproject(video.state.poses, video.state.disps, video.state.intrinsics, ii, jj)
corr = do_lookup(net, params, pyr, coords1)
coords0 = coords_grid(h, w)
motn = jnp.clip(jnp.concatenate([coords1 - coords0, graph.target - coords1], -1), -64., 64.)
inp = video.state.inps[ii].astype(jnp.float32)

timeit("reproject", reproject, video.state.poses, video.state.disps, video.state.intrinsics, ii, jj)
timeit("lookup (4-level defcorr)", do_lookup, net, params, pyr, coords1)
timeit("update_step (convs+KAN-GRU+GraphAgg)", do_update, net, params, graph.net, inp, corr, motn, edge_slot, mask, F)
