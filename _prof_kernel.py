"""Measure the new resolved-gather lookup kernel on the real TPU."""
import sys, time
import numpy as np

T0 = time.perf_counter()
def log(m): print(f"[{time.perf_counter()-T0:7.1f}s] {m}", file=sys.stderr, flush=True)

def timeit(fn, *args, reps=20, **kw):
    out = fn(*args, **kw)
    np.asarray(out.reshape(-1)[0:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    np.asarray(out.reshape(-1)[0:1])
    return (time.perf_counter() - t0) / reps * 1e3

def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime
    setup_runtime()
    import jax, jax.numpy as jnp
    from lgu_slam_tpu.ops.pallas_lookup import (
        pack_level, pad_w2, window_lookup_packed, level_layout)
    from lgu_slam_tpu.ops.sampler import sample_taps_flat

    rng = np.random.default_rng(0)
    E, P1 = 64, 3072
    K = 49
    geo = [(48, 64, 0, K), (24, 32, 1, K), (12, 16, 2, K), (6, 8, 3, K),
           (24, 32, 1, 9)]
    for H2, W2, lvl, KK in geo:
        vol = jnp.asarray(rng.normal(size=(E, P1, H2*W2)).astype(np.float32)).astype(jnp.bfloat16)
        base = jnp.asarray((rng.uniform(0, 1, size=(E, P1, 2)) *
                            np.asarray([W2, H2])).astype(np.float32))
        px = base[..., 0:1] + jnp.asarray(rng.uniform(-7, 7, size=(E, P1, KK)), jnp.float32)
        py = base[..., 1:2] + jnp.asarray(rng.uniform(-7, 7, size=(E, P1, KK)), jnp.float32)
        W2p, NS = level_layout(W2, lvl)
        vol4, _ = pack_level(vol, H2, W2, NS)
        jax.block_until_ready(vol4)
        ms = timeit(window_lookup_packed, vol4, px, py, H2, W2, W2p, NS)
        log(f"lvl{lvl} H2={H2} W2={W2} K={KK}: {ms:.2f} ms")
        # correctness on TPU (not just interpret)
        out = np.asarray(window_lookup_packed(vol4, px, py, H2, W2, W2p, NS))
        ref = np.asarray(sample_taps_flat(vol.astype(jnp.float32), H2, W2, px, py))
        err = np.abs(out - ref).max()
        log(f"   max abs err vs oracle (bf16 vol): {err:.4f}")

if __name__ == "__main__":
    main()
