"""Distributed dense bundle adjustment over a device mesh.

This is the TPU-native replacement for the parallelism the reference lacks
(SURVEY.md §2.3): the global factor graph's edges are sharded across
devices **partitioned by source frame ii**, so every E-matrix row of a
given depth frame (its self row and all its edge rows) lives on exactly
one shard.  Consequences:

- per-edge Hessian/E/C/w block builds are embarrassingly parallel;
- the Schur product ``E Q E^T`` groups rows by depth frame, which is now
  shard-local — no cross-device pairs; shards compute partial dense pose
  systems and combine them with a single ``psum`` over ICI;
- the reduced (P*6)^2 pose solve is tiny and runs replicated;
- depth back-substitution is computed by each frame's owner shard and
  summed (disjoint supports) with ``psum``.

Host-side planning (:class:`ShardedDbaPlan`) range-partitions edges by ii
to balance per-shard edge counts, mirroring :class:`~lgu_slam_tpu.geom.dba.
DbaPlan` per shard.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lgu_slam_tpu.geom.dba import (
    DEPTH_PRIOR_ALPHA,
    _build_linear_system,
    _retract_window,
    _scatter_pose_blocks,
    _solve_damped,
)


@dataclass
class ShardedDbaPlan:
    """Per-shard topology (leading axis = device)."""

    ii: np.ndarray  # [D, Es]
    jj: np.ndarray  # [D, Es]
    edge_mask: np.ndarray  # [D, Es]
    rows_of_frame: np.ndarray  # [D, N, Dmax] local row ids, -1 padded
    owned: np.ndarray  # [D, N] exclusive frame ownership
    perm: np.ndarray  # [D, Es] global edge slot feeding each local slot

    @staticmethod
    def build(ii, jj, num_frames: int, n_shards: int,
              shard_bucket: int | None = None, dmax_bucket: int | None = None):
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        E = ii.shape[0]

        # partition frames into contiguous ranges with balanced edge counts
        counts = np.bincount(ii, minlength=num_frames)
        target = max(1, int(np.ceil(E / n_shards)))
        bounds = [0]
        acc = 0
        for f in range(num_frames):
            acc += counts[f]
            if acc >= target and len(bounds) < n_shards:
                bounds.append(f + 1)
                acc = 0
        while len(bounds) < n_shards:
            bounds.append(num_frames)
        bounds.append(num_frames)

        owned = np.zeros((n_shards, num_frames), bool)
        shard_of_frame = np.zeros(num_frames, np.int32)
        for s in range(n_shards):
            owned[s, bounds[s] : bounds[s + 1]] = True
            shard_of_frame[bounds[s] : bounds[s + 1]] = s

        shard_of_edge = shard_of_frame[ii]
        per = [np.where(shard_of_edge == s)[0] for s in range(n_shards)]
        Es = shard_bucket or max(
            8, 1 << int(np.ceil(np.log2(max(max(len(p) for p in per), 1))))
        )

        ii_s = np.zeros((n_shards, Es), np.int32)
        jj_s = np.zeros((n_shards, Es), np.int32)
        mask_s = np.zeros((n_shards, Es), np.float32)
        perm_s = np.zeros((n_shards, Es), np.int32)
        deg = 1
        groups_all = []
        for s in range(n_shards):
            sel = per[s]
            if len(sel) > Es:
                raise ValueError(f"shard {s}: {len(sel)} edges > bucket {Es}")
            ii_s[s, : len(sel)] = ii[sel]
            jj_s[s, : len(sel)] = jj[sel]
            mask_s[s, : len(sel)] = 1.0
            perm_s[s, : len(sel)] = sel
            groups = {}
            for li, e in enumerate(sel):
                groups.setdefault(int(ii[e]), []).append(num_frames + li)
            groups_all.append(groups)
            for k, g in groups.items():
                deg = max(deg, len(g) + 1)  # + self row

        Dm = dmax_bucket or max(8, 1 << int(np.ceil(np.log2(deg))))
        rof = np.full((n_shards, num_frames, Dm), -1, np.int32)
        for s in range(n_shards):
            for k in range(num_frames):
                if owned[s, k]:
                    rows = [k] + groups_all[s].get(k, [])
                    if len(rows) > Dm:
                        raise ValueError(f"frame {k} degree {len(rows)} > {Dm}")
                    rof[s, k, : len(rows)] = rows
        return ShardedDbaPlan(ii_s, jj_s, mask_s, rof, owned, perm_s)


def sharded_dba_iters(axis, poses, disps, intrinsics, disps_sens, eta,
                      t0, t1, target, weight, ii, jj, emask, rof, owned,
                      *, Pb: int, iters: int = 2, lm: float = 1e-4,
                      ep: float = 0.1, motion_only: bool = False,
                      alpha: float = DEPTH_PRIOR_ALPHA,
                      strict_t0_quirk: bool = False):
    """Per-shard body of the distributed DBA.  Must be called INSIDE a
    ``shard_map`` over ``axis``; all arrays carry no leading device axis
    (sharded operands already stripped to their local block).  Reused by
    both :func:`dba_step_sharded` and the sharded backend pass
    (:mod:`lgu_slam_tpu.parallel.backend_shard`)."""
    N, ht, wd = disps.shape
    HW = ht * wd

    if True:  # keep the original body's indentation
        intr_n = jnp.broadcast_to(intrinsics, (N, 4))

        frames = jnp.arange(N)
        in_window = (frames >= t0) & (frames < t1)
        edge_on = (emask > 0).astype(jnp.int32)
        has_edge_l = jnp.zeros(N, jnp.int32).at[ii].add(edge_on)
        has_edge = jax.lax.psum(has_edge_l, axis) > 0
        frame_active = (in_window | has_edge).astype(disps.dtype)

        row_pose = jnp.concatenate([frames, jj])
        row_frame = jnp.concatenate([frames, ii])
        row_live = jnp.concatenate([in_window & owned, emask > 0])

        D = rof.shape[1]
        rof_ok = rof >= 0
        rof_safe = jnp.where(rof_ok, rof, 0)

        def gn_iter(_, state):
            poses, disps = state
            He, ve, Eii, Eij, Cii, bz = _build_linear_system(
                poses, disps, intr_n, target, weight, ii, jj, emask
            )
            A_l, b_l = _scatter_pose_blocks(He, ve, ii, jj, t0, Pb)
            A = jax.lax.psum(A_l, axis)
            b = jax.lax.psum(b_l, axis)

            if motion_only:
                dx = _solve_damped(A, b, t0, t1, Pb, lm, ep)
                return _retract_window(poses, dx, t0, N), disps

            m = (disps_sens > 0).astype(disps.dtype).reshape(N, HW)
            C_l = jnp.zeros((N, HW), disps.dtype).at[ii].add(
                Cii * emask[:, None]
            )
            C = jax.lax.psum(C_l, axis) + m * alpha + (1 - m) * eta.reshape(
                N, HW
            )
            w_l = jnp.zeros((N, HW), disps.dtype).at[ii].add(
                bz * emask[:, None]
            )
            w = jax.lax.psum(w_l, axis) - m * alpha * (
                disps - disps_sens
            ).reshape(N, HW)
            Q = 1.0 / C

            Ei_self = jnp.zeros((N, 6, HW), disps.dtype).at[ii].add(
                Eii * emask[:, None, None]
            )
            Ei_self = Ei_self * (
                in_window & owned
            )[:, None, None].astype(disps.dtype)
            E_rows = jnp.concatenate([Ei_self, Eij], axis=0)

            rp = row_pose - t0
            ok_schur = (rp >= 0) & (rp < Pb) & (row_pose < t1) & row_live
            g_ok = ok_schur[rof_safe] & rof_ok
            Eg = E_rows[rof_safe] * g_ok[..., None, None].astype(disps.dtype)
            EgQ = Eg * Q[:, None, None, :]
            S_blocks = jnp.einsum("kdah,kebh->kdeab", EgQ, Eg)

            gp = jnp.where(g_ok, row_pose[rof_safe] - t0, 0)
            gp_r = jnp.broadcast_to(gp[:, :, None], (N, D, D)).reshape(-1)
            gp_c = jnp.broadcast_to(gp[:, None, :], (N, D, D)).reshape(-1)
            S_l = (
                jnp.zeros((Pb, 6, Pb, 6), disps.dtype)
                .at[gp_r, :, gp_c, :]
                .add(S_blocks.reshape(-1, 6, 6))
            )
            Qw = Q * w
            v_rows = jnp.einsum("rah,rh->ra", E_rows, Qw[row_frame])
            v_rows = v_rows * ok_schur[:, None].astype(disps.dtype)
            vs_l = jnp.zeros((Pb, 6), disps.dtype).at[
                jnp.where(ok_schur, rp, 0)
            ].add(v_rows)

            S = jax.lax.psum(S_l, axis)
            vs = jax.lax.psum(vs_l, axis)

            dx = _solve_damped(
                jnp.reshape(A, (Pb, 6, Pb, 6)) - S, b - vs, t0, t1, Pb, lm, ep
            )

            dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6), dx.dtype)], 0)
            # quirk parity with geom/dba.py:470: ba_cuda's EvT6x1 skips
            # pose row t0 in the depth back-substitution
            ok_bsub = ok_schur & (rp >= (1 if strict_t0_quirk else 0))
            rp_bs = jnp.where(ok_bsub, rp, Pb)
            dw_rows = jnp.einsum("rah,ra->rh", E_rows, dx_pad[rp_bs])
            dw_l = jnp.zeros((N, HW), disps.dtype).at[row_frame].add(dw_rows)
            dw = jax.lax.psum(dw_l, axis)
            dz = Q * (w - dw)
            dz = jnp.where(jnp.isfinite(dz), dz, 0.0) * frame_active[:, None]

            poses2 = _retract_window(poses, dx, t0, N)
            disps2 = disps + dz.reshape(N, ht, wd)
            return poses2, disps2

        poses, disps = jax.lax.fori_loop(0, iters, gn_iter, (poses, disps))
        if not motion_only:
            disps = jnp.maximum(disps, 0.001)
        return poses, disps


def dba_step_sharded(
    mesh: Mesh,
    axis: str,
    poses,
    disps,
    intrinsics,
    disps_sens,
    target,  # [D, Es, H, W, 2]
    weight,
    eta,
    plan_arrays,  # (ii, jj, edge_mask, rows_of_frame, owned) stacked [D, ...]
    t0,
    t1,
    *,
    P_bucket: int,
    iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    motion_only: bool = False,
    alpha: float = DEPTH_PRIOR_ALPHA,
    strict_t0_quirk: bool = False,
):
    """Run the distributed DBA under shard_map over ``mesh[axis]``."""
    ii_s, jj_s, mask_s, rof_s, owned_s = plan_arrays
    Pb = P_bucket

    def shard_fn(poses, disps, intrinsics, disps_sens, eta, t0, t1,
                 target, weight, ii, jj, emask, rof, owned):
        # leading device axis of sharded args is 1 inside shard_map
        return sharded_dba_iters(
            axis, poses, disps, intrinsics, disps_sens, eta, t0, t1,
            target[0], weight[0], ii[0], jj[0], emask[0], rof[0], owned[0],
            Pb=Pb, iters=iters, lm=lm, ep=ep, motion_only=motion_only,
            alpha=alpha, strict_t0_quirk=strict_t0_quirk,
        )

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(), P(), P(), P(), P(),
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(
        poses, disps, intrinsics, disps_sens, eta,
        jnp.asarray(t0, jnp.int32), jnp.asarray(t1, jnp.int32),
        target, weight,
        jnp.asarray(ii_s), jnp.asarray(jj_s), jnp.asarray(mask_s),
        jnp.asarray(rof_s), jnp.asarray(owned_s),
    )
