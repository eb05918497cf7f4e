"""Decompose fused_pyramid_lookup cost: DMA floor vs compute per level."""
import sys, time, functools
import numpy as np

T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)

from lgu_slam_tpu.utils.runtime import setup_runtime
setup_runtime()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from lgu_slam_tpu.ops import pallas_lookup as PL

E, H, W = 48, 48, 64
P1 = H * W
dims = [(48, 64), (24, 32), (12, 16), (6, 8)]
meta, _ = PL.pyramid_meta(H, W)

@jax.jit
def make_inputs(key):
    ks = jax.random.split(key, 7)
    levels = [jax.random.normal(ks[i], (E, P1, a*b), jnp.float32).astype(jnp.bfloat16)
              for i, (a, b) in enumerate(dims)]
    packed = tuple(PL.pack_pyramid(levels, H, W))
    gy, gx = jnp.mgrid[0:H, 0:W]
    base = jnp.stack([gx, gy], -1).reshape(1, P1, 2).astype(jnp.float32)
    cflat = base + 1.5 * jax.random.normal(ks[4], (E, P1, 2))
    off0 = jax.random.uniform(ks[5], (E, P1, 7, 7, 2), minval=-3., maxval=3.)
    off1 = jax.random.uniform(ks[6], (E, P1, 7, 7, 2), minval=-3., maxval=3.)
    return packed, cflat, off0, off1

packed, cflat, off0, off1 = make_inputs(jax.random.PRNGKey(0))
jax.block_until_ready(packed)

def timeit(fn, reps=10):
    out = fn()
    jax.tree.map(lambda o: np.asarray(o.reshape(-1)[0:1]), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree.map(lambda o: np.asarray(o.reshape(-1)[0:1]), out)
    return (time.perf_counter() - t0) / reps * 1e3

TP = 256

# 1) DMA floor: stream all 4 volumes + small inputs, write sum of first lanes
def dma_kernel(cxy_ref, o0_ref, o1_ref, v0, v1, v2, v3, out_ref):
    acc = jnp.zeros((TP, 64), jnp.float32)
    for v in (v0, v1, v2, v3):
        acc += v[0, :, 0, :64].astype(jnp.float32)
    out_ref[0] = acc + cxy_ref[0, :, :64] + o0_ref[0, :, :64] + o1_ref[0, :, :64]

cxy = jnp.concatenate([cflat, jnp.zeros((E, P1, 126), cflat.dtype)], axis=-1)
o0 = PL.pack_offsets(off0); o1 = PL.pack_offsets(off1)

@jax.jit
def dma_only():
    return pl.pallas_call(
        dma_kernel,
        grid=(E, P1 // TP),
        in_specs=[pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0))] * 3
        + [pl.BlockSpec((1, TP, meta[l][4], 128), lambda e, p: (e, p, 0, 0))
           for l in range(4)],
        out_specs=pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, P1, 64), jnp.float32),
    )(cxy, o0, o1, *packed)

log(f"DMA floor (all vols streamed, no gather): {timeit(dma_only):.2f} ms")

# 2) single-level variants: full bilinear machinery on ONE level only
def one_level_kernel(cxy_ref, o0_ref, o1_ref, v_ref, out_ref, acc_ref, *, lvl):
    cxy = cxy_ref[0]
    cx = cxy[:, 0:1]; cy = cxy[:, 1:2]
    l64 = jax.lax.broadcasted_iota(jnp.int32, (TP, 64), 1)
    live = (l64 < 49).astype(jnp.float32)
    dx = ((l64 // 7) - 3).astype(jnp.float32) * live
    dy = ((l64 % 7) - 3).astype(jnp.float32) * live
    scale = 0.5 ** lvl
    px = cx * scale + dx
    py = cy * scale + dy
    out_ref[0] = PL._bilinear_level(
        v_ref[0], meta[lvl], jnp.concatenate([px, px], axis=-1), py, acc_ref)

for lvl in range(4):
    kern = functools.partial(one_level_kernel, lvl=lvl)
    @jax.jit
    def one_level(kern=kern, lvl=lvl):
        return pl.pallas_call(
            kern,
            grid=(E, P1 // TP),
            in_specs=[pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0))] * 3
            + [pl.BlockSpec((1, TP, meta[lvl][4], 128),
                            lambda e, p: (e, p, 0, 0))],
            out_specs=pl.BlockSpec((1, TP, 64), lambda e, p: (e, p, 0)),
            out_shape=jax.ShapeDtypeStruct((E, P1, 64), jnp.float32),
            scratch_shapes=[pltpu.VMEM((TP, 128), jnp.float32)],
        )(cxy, o0, o1, packed[lvl])
    log(f"level {lvl} only (S={meta[lvl][4]}): {timeit(one_level):.2f} ms")

# 3) full fused for reference at same TP
ms = timeit(lambda: PL.fused_pyramid_lookup(packed, cflat, off0, off1, H, W, tile_p=TP))
log(f"full fused (tile_p={TP}): {ms:.2f} ms")
