"""Worker for the two-process multi-host test (run by
tests/test_multihost.py, one subprocess per simulated host).

Each process owns 4 virtual CPU devices; ``jax.distributed.initialize``
joins them into one 8-device run, and the distributed DBA executes under
``shard_map`` over the PROCESS-SPANNING mesh — the collectives that ride
ICI within a host cross the (simulated) DCN boundary between the two
processes, exercising exactly the ≥2-host code path of BASELINE.json's
north star (SURVEY §2.3 ICI/DCN mapping).

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lgu_slam_tpu import lie
    from lgu_slam_tpu.geom import projective as pops
    from lgu_slam_tpu.geom.dba import DbaPlan, dba_step
    from lgu_slam_tpu.parallel.dba_shard import (
        ShardedDbaPlan, dba_step_sharded,
    )

    # deterministic scene, identical on both processes
    rng = np.random.default_rng(0)
    N, H, W = 8, 8, 12
    xi_gt = np.cumsum(rng.normal(size=(N, 6)) * 0.03, axis=0).astype(
        np.float32
    )
    poses_gt = lie.se3_exp(jnp.asarray(xi_gt))
    disps_gt = jnp.asarray(
        0.6 + 0.2 * rng.random((N, H, W)).astype(np.float32)
    )
    intr = jnp.asarray([15.0, 15.0, W / 2, H / 2], jnp.float32)
    ii, jj = [], []
    for i in range(N):
        for j in range(N):
            if 0 < abs(i - j) <= 2:
                ii.append(i)
                jj.append(j)
    ii = np.asarray(ii, np.int32)
    jj = np.asarray(jj, np.int32)
    intr_n = jnp.broadcast_to(intr, (N, 4))
    target, _ = pops.projective_transform(
        poses_gt, disps_gt, intr_n, jnp.asarray(ii), jnp.asarray(jj)
    )
    weight = jnp.ones_like(target)
    eta = jnp.full((N, H, W), 1e-3)
    sens = jnp.zeros((N, H, W))
    poses0 = lie.se3_mul(
        lie.se3_exp(
            jnp.asarray(rng.normal(size=(N, 6)) * 0.02, jnp.float32)
        ),
        poses_gt,
    )
    disps0 = disps_gt + jnp.asarray(
        rng.normal(size=(N, H, W)) * 0.02, jnp.float32
    )

    # local single-device reference (identical on both processes)
    plan = DbaPlan.build(ii, jj, N, edge_bucket=len(ii))
    with jax.default_device(jax.local_devices()[0]):
        p_ref, d_ref = dba_step(
            poses0, disps0, intr, sens, target, weight, eta,
            *plan.jax_arrays(),
            jnp.int32(1), jnp.int32(N), P=N - 1, iters=2,
        )
        p_ref = np.asarray(p_ref)
        d_ref = np.asarray(d_ref)

    # process-spanning 8-device mesh; edges sharded 4 per process
    n_dev = 4 * nproc
    mesh = Mesh(np.array(jax.devices()), ("edge",))
    splan = ShardedDbaPlan.build(ii, jj, N, n_dev)
    D, Es = splan.ii.shape
    tnp = np.zeros((D, Es, H, W, 2), np.float32)
    wnp = np.zeros((D, Es, H, W, 2), np.float32)
    tgt_np = np.asarray(target)
    for s in range(D):
        for sl in range(Es):
            if splan.edge_mask[s, sl] > 0:
                tnp[s, sl] = tgt_np[splan.perm[s, sl]]
                wnp[s, sl] = 1.0

    # explicit global placement: replicated args with P(), edge-sharded
    # args with P("edge") — each process materializes only its
    # addressable shards (the multi-host contract)
    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P("edge"))
    put_r = lambda x: jax.device_put(jnp.asarray(x), rep)  # noqa: E731
    put_s = lambda x: jax.device_put(jnp.asarray(x), shd)  # noqa: E731

    p_sh, d_sh = dba_step_sharded(
        mesh, "edge",
        put_r(poses0), put_r(disps0), put_r(intr), put_r(sens),
        put_s(tnp), put_s(wnp), put_r(eta),
        (put_s(splan.ii), put_s(splan.jj), put_s(splan.edge_mask),
         put_s(splan.rows_of_frame), put_s(splan.owned)),
        1, N, P_bucket=N - 1, iters=2,
    )
    # outputs are replicated; read this process's local replica
    p_sh = np.asarray(p_sh.addressable_shards[0].data)
    d_sh = np.asarray(d_sh.addressable_shards[0].data)

    np.testing.assert_allclose(p_sh, p_ref, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(d_sh, d_ref, atol=2e-4, rtol=1e-3)
    print(f"PARITY OK process {pid}/{nproc} "
          f"(devices={len(jax.devices())}, local={len(jax.local_devices())})",
          flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
