#!/usr/bin/env python
"""3DGS mapping-iteration benchmark at Replica scale on the real chip.

Times one jitted ``make_mapping_step`` iteration (render 5-channel
RGB+depth+depth^2 in a single shared-binning pass, SSIM+L1+depth loss,
backward through the tile rasterizer, Adam update) at SplaTAM's Replica
settings: 1200x680 image, ~200k live Gaussians of a 400k-capacity map
(to3DGS/configs/replica/splatam.py; rasterizer reference:
diff_gaussian_rasterization/cuda_rasterizer/forward.cu).

Prints one JSON line {"metric": "gs_mapping_iters_per_s", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.perf_counter()


def log(msg):
    print(f"[gs-bench {time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from lgu_slam_tpu.utils.runtime import setup_runtime

    setup_runtime()
    import jax
    import jax.numpy as jnp

    from lgu_slam_tpu.gs.mapping import GSConfig, make_mapping_step

    H, W = 680, 1200
    N_live = 200_000
    # the mapper runs its jitted step on a pow2 bucket of the live
    # high-water mark, not the full 400k capacity (gs/mapping.py
    # _bucket) — bench the same shape
    N_cap = 1 << (N_live - 1).bit_length()  # 262144
    cfg = GSConfig(capacity=N_cap)
    log(f"devices={jax.devices()}  image {W}x{H}, "
        f"{N_live} live / bucket {N_cap} gaussians")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    depth_mean = 2.5
    pts = jax.random.uniform(ks[0], (N_cap, 3), minval=-2.0, maxval=2.0)
    pts = pts + jnp.asarray([0.0, 0.0, depth_mean])
    params = {
        "means3D": pts,
        "rgb_colors": jax.random.uniform(ks[1], (N_cap, 3)),
        "unnorm_rotations": jnp.tile(
            jnp.asarray([1.0, 0, 0, 0]), (N_cap, 1)
        ),
        "logit_opacities": jnp.zeros((N_cap, 1)),
        "log_scales": jnp.log(
            0.01 + 0.01 * jax.random.uniform(ks[2], (N_cap, 1))
        ),
    }
    alive = (jnp.arange(N_cap) < N_live)

    intr = (600.0, 600.0, W / 2.0, H / 2.0)
    w2c_rot = jnp.eye(3)
    w2c_trans = jnp.zeros(3)
    im_gt = jax.random.uniform(ks[3], (H, W, 3))
    depth_gt = depth_mean + jax.random.uniform(ks[4], (H, W))
    frame = (im_gt, depth_gt, w2c_rot, w2c_trans, intr)

    tx, step = make_mapping_step(cfg, (H, W))
    opt_state = tx.init(params)

    def sync(x):
        np.asarray(x.reshape(-1)[0:1])

    log("warmup (compiles render fwd+bwd)...")
    params2, opt_state2, loss, aux, g2d = step(params, opt_state, alive, frame)
    sync(params2["means3D"])
    log(f"warmup done, loss={float(loss):.4f}")

    reps = 10
    t0 = time.perf_counter()
    p, o = params2, opt_state2
    for _ in range(reps):
        p, o, loss, aux, g2d = step(p, o, alive, frame)
    sync(p["means3D"])
    dt = time.perf_counter() - t0
    it_s = reps / dt
    log(f"{reps} mapping iterations in {dt:.2f}s = {1e3 * dt / reps:.1f} "
        f"ms/iter")
    print(json.dumps({
        "metric": "gs_mapping_iters_per_s",
        "value": round(it_s, 3),
        "unit": f"mapping iters/s ({W}x{H}, {N_live} gaussians, "
                "fwd+bwd+adam)",
        "ms_per_iter": round(1e3 * dt / reps, 1),
    }))


if __name__ == "__main__":
    main()
