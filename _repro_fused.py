import sys, time
import numpy as np
def log(m): print(m, file=sys.stderr, flush=True)

from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from lgu_slam_tpu.ops.pallas_lookup import fused_pyramid_lookup, pack_pyramid

rng = np.random.default_rng(0)
E, H, W = 2, 48, 64
P1 = H * W
dims = [(H >> 0, W >> 0), (24, 32), (12, 16), (6, 8)]
levels = [jnp.asarray(rng.normal(size=(E, P1, a*b)).astype(np.float32)) for a, b in dims]
packed = tuple(pack_pyramid(levels, H, W))
log(f"packed {[p.shape for p in packed]}")
cflat = jnp.asarray((rng.uniform(0, 1, size=(E, P1, 2)) * np.asarray([W, H])).astype(np.float32))
off0 = jnp.asarray(rng.uniform(-3, 3, size=(E, P1, 7, 7, 2)).astype(np.float32))
off1 = jnp.asarray(rng.uniform(-3, 3, size=(E, P1, 7, 7, 2)).astype(np.float32))
out = fused_pyramid_lookup(packed, cflat, off0, off1, H, W)
out = np.asarray(out)
log(f"out {out.shape} finite={np.isfinite(out).all()}")

# compare vs interpret
ref = np.asarray(fused_pyramid_lookup(packed, cflat, off0, off1, H, W, interpret=True))
log(f"max err vs interpret: {np.abs(out - ref).max():.6f}")
