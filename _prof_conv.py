"""Calibrate conv/MXU throughput on the chip: fp32 vs bf16, GRU-shaped."""
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[{time.perf_counter() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def drain(x):
    np.asarray(x).reshape(-1)[:1]


def timeit(fn, *args, reps=10):
    out = fn(*args)
    # drain via tiny slice only
    import jax.numpy as jnp
    drain(out.reshape(-1)[0:1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    drain(out.reshape(-1)[0:1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp
    from functools import partial

    E, H, W = 64, 48, 64
    key = jax.random.PRNGKey(0)

    for dt, name in ((jnp.float32, "fp32"), (jnp.bfloat16, "bf16")):
        x = jax.random.normal(key, (E, H, W, 448), dt)
        k = jax.random.normal(key, (3, 3, 448, 128), dt)

        @jax.jit
        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)

        gf = E * H * W * 9 * 448 * 128 * 2 / 1e9
        ms = timeit(conv, x, k)
        log(f"conv3x3 448->128 {name}: {ms:.2f} ms  ({gf/ms:.1f} TFLOP/s)")

        # 8 convs chained (loop-like composition)
        k2 = jax.random.normal(key, (3, 3, 128, 128), dt)

        @jax.jit
        def conv8(x, k, k2):
            y = conv(x, k).astype(dt)
            for _ in range(7):
                y = jax.lax.conv_general_dilated(
                    y, k2, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32).astype(dt)
            return y

        gf8 = gf + 7 * E * H * W * 9 * 128 * 128 * 2 / 1e9
        ms = timeit(conv8, x, k, k2)
        log(f"8-chain {name}: {ms:.2f} ms  ({gf8/ms:.1f} TFLOP/s)")

    # the full update_op at bf16 vs fp32 param/act dtype
    from lgu_slam_tpu.models.update import UpdateModule

    mod = UpdateModule()
    net = jax.random.normal(key, (1, E, H, W, 128), jnp.float32)
    inp = jax.random.normal(key, (1, E, H, W, 128), jnp.float32)
    corr = jax.random.normal(key, (1, E, H, W, 196), jnp.float32)
    flow = jax.random.normal(key, (1, E, H, W, 4), jnp.float32)
    ii = jnp.zeros((E,), jnp.int32).at[:].set(jnp.arange(E) % 48)
    params = mod.init(key, net, inp, corr, flow, ii, 48)["params"]

    @jax.jit
    def upd(params, net, inp, corr, flow):
        return mod.apply({"params": params}, net, inp, corr, flow, ii, 48)[0]

    ms = timeit(upd, params, net, inp, corr, flow)
    log(f"UpdateModule fp32: {ms:.2f} ms")

    bf = jnp.bfloat16
    params_bf = jax.tree_util.tree_map(lambda a: a.astype(bf), params)

    @jax.jit
    def upd_bf(params, net, inp, corr, flow):
        return mod.apply(
            {"params": params}, net.astype(bf), inp.astype(bf),
            corr.astype(bf), flow.astype(bf), ii, 48)[0]

    ms = timeit(upd_bf, params_bf, net, inp, corr, flow)
    log(f"UpdateModule bf16 (params+acts cast): {ms:.2f} ms")


if __name__ == "__main__":
    main()
