"""Microbench fused_pyramid_lookup at bench scale; sweep tile_p."""
import sys, time
import numpy as np

T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)

from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from lgu_slam_tpu.ops.pallas_lookup import fused_pyramid_lookup, pack_pyramid

rng = np.random.default_rng(0)
E, H, W = 48, 48, 64
P1 = H * W
dims = [(48, 64), (24, 32), (12, 16), (6, 8)]
levels = [jnp.asarray(rng.normal(size=(E, P1, a*b)).astype(np.float32)).astype(jnp.bfloat16)
          for a, b in dims]
packed = tuple(pack_pyramid(levels, H, W))
jax.block_until_ready(packed)
log(f"packed {[(p.shape, p.dtype) for p in packed]}")
# smooth coords: identity-ish flow so row-range culling fires like real SLAM
gy, gx = np.mgrid[0:H, 0:W].astype(np.float32)
base = np.stack([gx, gy], -1).reshape(1, P1, 2) + rng.normal(scale=1.5, size=(E, P1, 2)).astype(np.float32)
cflat = jnp.asarray(base)
off0 = jnp.asarray(rng.uniform(-3, 3, size=(E, P1, 7, 7, 2)).astype(np.float32))
off1 = jnp.asarray(rng.uniform(-3, 3, size=(E, P1, 7, 7, 2)).astype(np.float32))

def timeit(fn, reps=10):
    out = fn()
    np.asarray(out.reshape(-1)[0:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out.reshape(-1)[0:1])
    return (time.perf_counter() - t0) / reps * 1e3

ref = None
for tp in (128, 256, 384, 512, 768):
    if P1 % tp:
        continue
    try:
        ms = timeit(lambda: fused_pyramid_lookup(packed, cflat, off0, off1, H, W, tile_p=tp))
        out = np.asarray(fused_pyramid_lookup(packed, cflat, off0, off1, H, W, tile_p=tp))
        if ref is None:
            ref = out
        err = np.abs(out - ref).max()
        log(f"tile_p={tp}: {ms:.2f} ms  (err vs tp128: {err:.5f})")
    except Exception as ex:
        log(f"tile_p={tp}: FAILED {type(ex).__name__}: {str(ex)[:200]}")
