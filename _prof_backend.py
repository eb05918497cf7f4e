"""Attribute backend update_lowmem cost at t=128 / 1024 edges on the chip."""
import functools
import sys, time
import numpy as np

T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)

from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from lgu_slam_tpu import lie
from lgu_slam_tpu.slam.factor_graph import FactorGraph
from lgu_slam_tpu.slam.state import Video
from lgu_slam_tpu.slam.system import init_params
from lgu_slam_tpu.utils.config import SLAMConfig

cfg = SLAMConfig()
net, params = init_params(cfg, seed=0)
jax.block_until_ready(params)
log("params ready")

video = Video(cfg)
Tb = 128
video.counter = Tb
fd = video.state.fmaps.dtype

@functools.partial(jax.jit, static_argnames=("T",))
def stage(state, key, T):
    ks = jax.random.split(key, 5)
    w8, h8 = state.disps.shape[2], state.disps.shape[1]
    return state._replace(
        fmaps=state.fmaps.at[:T].set(jax.random.normal(ks[0], (T,) + state.fmaps.shape[1:], jnp.float32).astype(fd)),
        nets=state.nets.at[:T].set(jax.random.normal(ks[1], (T,) + state.nets.shape[1:], jnp.float32).astype(fd)),
        inps=state.inps.at[:T].set(jax.random.normal(ks[2], (T,) + state.inps.shape[1:], jnp.float32).astype(fd)),
        poses=state.poses.at[:T].set(lie.se3_exp(jnp.cumsum(jax.random.normal(ks[3], (T, 6)) * 0.01, axis=0))),
        disps=state.disps.at[:T].set(0.5 + 0.3 * jax.random.uniform(ks[4], (T,) + state.disps.shape[1:])),
        intrinsics=state.intrinsics.at[:T].set(jnp.asarray([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0])),
    )

def sync():
    np.asarray(video.state.poses.reshape(-1)[0:1])

video.state = stage(video.state, jax.random.PRNGKey(1), Tb)
sync()
log("staged")

bgraph = FactorGraph(
    net, params, video, cfg, corr_impl="alt",
    max_factors=min(16 * Tb, cfg.backend_edge_cap),
    edge_bucket=cfg.backend_edge_cap, inactive_bucket=8,
)
bgraph.add_proximity_factors(0, 0, rad=cfg.backend_radius, nms=cfg.backend_nms,
                             thresh=cfg.backend_thresh * 4, beta=cfg.beta, remove=False)
log(f"edges={bgraph.n_edges}")

log("warmup steps=1 ...")
t = time.perf_counter()
bgraph.update_lowmem(t0=1, t1=Tb, steps=1, itrs=2)
sync()
log(f"steps=1 (incl compile): {time.perf_counter()-t:.1f}s")

t = time.perf_counter()
bgraph.update_lowmem(t0=1, t1=Tb, steps=1, itrs=2)
sync()
s1 = time.perf_counter()-t
log(f"steps=1 warm: {s1*1e3:.0f} ms")

t = time.perf_counter()
bgraph.update_lowmem(t0=1, t1=Tb, steps=2, itrs=2)
sync()
s2 = time.perf_counter()-t
log(f"steps=2 warm: {s2*1e3:.0f} ms (per extra step {1e3*(s2-s1):.0f} ms)")

import jax.profiler
jax.profiler.start_trace("/tmp/be_trace")
bgraph.update_lowmem(t0=1, t1=Tb, steps=1, itrs=2)
sync()
jax.profiler.stop_trace()
log("trace -> /tmp/be_trace")

import gzip, json, collections, glob
f = sorted(glob.glob('/tmp/be_trace/plugins/profile/*/vm.trace.json.gz'))[-1]
ev = json.load(gzip.open(f))['traceEvents']
tot = collections.Counter(); cnt = collections.Counter()
for e in ev:
    if e.get('ph') == 'X' and 'dur' in e:
        tot[e.get('name','?')] += e['dur']; cnt[e.get('name','?')] += 1
for name, d in tot.most_common(35):
    log(f"{d/1e3:9.2f} ms  x{cnt[name]:4d}  {name[:100]}")
