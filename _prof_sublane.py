"""Probe: can Mosaic lower a per-lane SUBLANE gather (take_along_axis on
the second-to-last dim) efficiently?  If yes, the lookup kernel's
S-iteration select chain (_corner_acc) collapses to one op per corner.

Usage:
    LGU_PLATFORM=cpu python _prof_sublane.py   # interpret-mode semantics
    python _prof_sublane.py                    # chip micro-benchmark
"""
import functools
import sys
import time

import numpy as np

from lgu_slam_tpu.utils.runtime import setup_runtime

setup_runtime()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

T0 = time.perf_counter()


def log(m):
    print(f"[{time.perf_counter() - T0:7.1f}s] {m}", file=sys.stderr,
          flush=True)


TP, S = 256, 24
E, NB = 48, 12  # grid


def chain_kernel(v_ref, s_ref, out_ref):
    V = v_ref[0]
    s_t = s_ref[0]  # [TP, 128] int32 target row per lane
    idx = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 1)
    acc = jnp.zeros((TP, 128), jnp.float32)
    for s in range(S):
        g = jnp.take_along_axis(V[:, s, :].astype(jnp.float32), idx, axis=-1)
        acc = jnp.where(s_t == s, g, acc)
    out_ref[0] = acc


def sublane_kernel(v_ref, s_ref, out_ref):
    V = v_ref[0].astype(jnp.float32)  # [TP, S, 128]
    s_t = s_ref[0]  # [TP, 128]
    # flatten to a 2D sublane gather: out[t, l] = V2[t*S + s_t[t,l], l]
    V2 = V.reshape(TP * S, 128)
    row = jax.lax.broadcasted_iota(jnp.int32, (TP, 128), 0) * S + s_t
    out_ref[0] = jnp.take_along_axis(V2, row, axis=0)


def run(kern, v, st, interpret):
    return pl.pallas_call(
        kern,
        grid=(E, NB),
        in_specs=[
            pl.BlockSpec((1, TP, S, 128), lambda e, p: (e, p, 0, 0)),
            pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0)),
        ],
        out_specs=pl.BlockSpec((1, TP, 128), lambda e, p: (e, p, 0)),
        out_shape=jax.ShapeDtypeStruct((E, NB * TP, 128), jnp.float32),
        interpret=interpret,
    )(v, st)


def main():
    global E, NB
    interpret = jax.default_backend() == "cpu"
    if interpret:  # semantics only: keep the interpreted grid tiny
        E, NB = 2, 1
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        rng.normal(size=(E, NB * TP, S, 128)).astype(np.float32)
    ).astype(jnp.bfloat16)
    st = jnp.asarray(rng.integers(0, S, size=(E, NB * TP, 128)), jnp.int32)

    a = run(chain_kernel, v, st, interpret)
    try:
        b = run(sublane_kernel, v, st, interpret)
        err = float(jnp.abs(a - b).max())
        log(f"sublane gather matches chain: max|diff|={err:.2e}")
    except Exception as e:  # noqa: BLE001
        log(f"sublane gather FAILED to lower: {type(e).__name__}: {e}")
        return

    if interpret:
        return

    def timeit(fn, reps=20):
        out = fn()
        np.asarray(out.reshape(-1)[0:1])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        np.asarray(out.reshape(-1)[0:1])
        return 1e3 * (time.perf_counter() - t0) / reps

    log(f"chain   (S={S} rows): {timeit(lambda: run(chain_kernel, v, st, False)):.2f} ms")
    log(f"sublane (one gather): {timeit(lambda: run(sublane_kernel, v, st, False)):.2f} ms")


if __name__ == "__main__":
    main()
