"""Sharded global backend pass: update_lowmem over a device mesh.

This is the SP/CP analog SURVEY.md §2.3 calls for: the backend factor
graph's **keyframe axis is sharded** — edges are partitioned by source
frame ``ii`` into contiguous, edge-count-balanced frame ranges (the same
partition :class:`~lgu_slam_tpu.parallel.dba_shard.ShardedDbaPlan` uses),
so BOTH phases of every step run shard-local:

- the chunked fused-correlation GRU sweep (reference host chunking,
  factor_graph.py:272-292, turned into real device parallelism): each
  shard scans its local edge chunks; since a frame's edges all live on
  its owner shard, the per-frame damping/upsample writes are exclusive
  and one owner-masked ``psum`` reconstructs the dense buffers exactly;
- the global DBA reuses :func:`~lgu_slam_tpu.parallel.dba_shard.
  sharded_dba_iters` — partial pose systems psum-combined over ICI,
  replicated reduced solve, owner-computed depth back-substitution.

target/weight/net edge buffers never cross devices: the only collectives
are the damping psum and the DBA's Schur/rhs psums.  The whole
``steps x {GRU sweep, DBA}`` loop is ONE shard_map program (the fused
single-device path's sharded twin, factor_graph._lowmem_fused).

Chunk-composition note: GraphAgg aggregates per-frame statistics over the
edges *within a chunk* (as the reference does per host chunk).  Sharding
changes chunk composition at shard boundaries, so results match the
single-device path exactly only when chunk boundaries align (tested that
way in tests/test_backend_shard.py); otherwise they differ by the same
class of approximation the reference's own chunking introduces.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from lgu_slam_tpu.parallel.dba_shard import sharded_dba_iters

# jitted shard_map programs keyed by static config (see lowmem_steps_sharded)
_SHARDED_LOWMEM_CACHE: dict = {}


@dataclass
class ShardedLowmemPlan:
    """Host-planned topology for one sharded backend pass.

    Edges are stably sorted by ``ii`` then range-partitioned; every shard
    holds ``C`` chunks of ``CH`` edge slots (Es = C*CH local slots).
    """

    perm: np.ndarray        # [D, Es] global edge slot per local slot
    ii: np.ndarray          # [D, C, CH]
    jj: np.ndarray          # [D, C, CH]
    mask: np.ndarray        # [D, C, CH] float32
    ii_rig: np.ndarray      # [D, C, CH]
    jj_rig: np.ndarray      # [D, C, CH]
    edge_slot: np.ndarray   # [D, C, CH] compact frame slot per edge
    frame_ids: np.ndarray   # [D, C, F]
    rof: np.ndarray         # [D, N, Dmax] rows into [0, N + Es)
    owned: np.ndarray       # [D, N] exclusive frame ownership

    @property
    def n_shards(self):
        return self.perm.shape[0]

    @property
    def chunk(self):
        return self.ii.shape[2]

    @staticmethod
    def build(ii, jj, num_frames: int, n_shards: int, CH: int, rig: int = 1,
              dmax_bucket: int | None = None):
        ii = np.asarray(ii, np.int32).reshape(-1)
        jj = np.asarray(jj, np.int32).reshape(-1)
        E = ii.shape[0]
        order = np.argsort(ii, kind="stable").astype(np.int64)
        ii_s, jj_s = ii[order], jj[order]

        # contiguous frame ranges balanced by edge count (dba_shard.py:59)
        counts = np.bincount(ii_s, minlength=num_frames)
        target_cnt = max(1, int(np.ceil(E / n_shards)))
        bounds = [0]
        acc = 0
        for f in range(num_frames):
            acc += counts[f]
            if acc >= target_cnt and len(bounds) < n_shards:
                bounds.append(f + 1)
                acc = 0
        while len(bounds) < n_shards:
            bounds.append(num_frames)
        bounds.append(num_frames)

        owned = np.zeros((n_shards, num_frames), bool)
        shard_of_frame = np.zeros(num_frames, np.int32)
        for s in range(n_shards):
            owned[s, bounds[s]: bounds[s + 1]] = True
            shard_of_frame[bounds[s]: bounds[s + 1]] = s

        shard_of_edge = shard_of_frame[ii_s]
        per = [np.where(shard_of_edge == s)[0] for s in range(n_shards)]
        C = max(1, int(np.ceil(max(len(p) for p in per) / CH)))
        Es = C * CH

        perm = np.full((n_shards, Es), E, np.int32)  # pad -> drop slot
        ii_c = np.zeros((n_shards, C, CH), np.int32)
        jj_c = np.zeros((n_shards, C, CH), np.int32)
        mask_c = np.zeros((n_shards, C, CH), np.float32)
        eslot_c = np.zeros((n_shards, C, CH), np.int32)
        fids_c = np.zeros((n_shards, C, CH), np.int32)
        deg = 1
        groups_all = []
        for s in range(n_shards):
            sel = per[s]  # local slots in sorted order
            perm[s, : len(sel)] = order[sel]
            ii_l = np.zeros(Es, np.int32)
            jj_l = np.zeros(Es, np.int32)
            m_l = np.zeros(Es, np.float32)
            ii_l[: len(sel)] = ii_s[sel]
            jj_l[: len(sel)] = jj_s[sel]
            m_l[: len(sel)] = 1.0
            ii_c[s] = ii_l.reshape(C, CH)
            jj_c[s] = jj_l.reshape(C, CH)
            mask_c[s] = m_l.reshape(C, CH)
            for c in range(C):
                live = mask_c[s, c] > 0
                uniq = np.unique(ii_c[s, c][live])
                fids_c[s, c, : len(uniq)] = uniq
                slot_of = {int(f): k for k, f in enumerate(uniq)}
                eslot_c[s, c] = [
                    slot_of.get(int(i), 0) for i in ii_c[s, c]
                ]
            groups = {}
            for li in range(len(sel)):
                groups.setdefault(int(ii_l[li]), []).append(num_frames + li)
            groups_all.append(groups)
            for g in groups.values():
                deg = max(deg, len(g) + 1)

        Dm = dmax_bucket or max(8, 1 << int(np.ceil(np.log2(deg))))
        rof = np.full((n_shards, num_frames, Dm), -1, np.int32)
        for s in range(n_shards):
            for k in range(num_frames):
                if owned[s, k]:
                    rows = [k] + groups_all[s].get(k, [])
                    rof[s, k, : len(rows)] = rows

        ii_rig = rig * ii_c
        jj_rig = rig * jj_c + (
            (ii_c == jj_c).astype(np.int32) if rig > 1 else 0
        )
        return ShardedLowmemPlan(perm, ii_c, jj_c, mask_c, ii_rig, jj_rig,
                                 eslot_c, fids_c, rof, owned)


def lowmem_steps_sharded(
    mesh: Mesh,
    axis: str,
    net_def,
    params,
    video_state,
    fmap_pyr,
    net_ch,     # [D, C, CH, h, w, 128]
    target_ch,  # [D, C, CH, h, w, 2]
    weight_ch,
    plan: ShardedLowmemPlan,
    t0,
    t1,
    *,
    num_slots: int,
    steps: int,
    Pb: int,
    dba_iters: int = 2,
    lm: float = 1e-4,
    ep: float = 0.1,
    EP: float = 1e-7,
    upsample: bool = False,
    t0_quirk: bool = False,
):
    """steps x {sharded GRU chunk sweep, sharded DBA} as ONE shard_map
    program.  Returns (net_ch, target_ch, weight_ch, poses, disps,
    damping, disps_up) with edge buffers still in sharded layout."""
    from lgu_slam_tpu.slam.factor_graph import (  # noqa: PLC0415 (cycle)
        _alt_update_op, _update_damping, _upsample_slots,
    )

    C, CH = plan.ii.shape[1], plan.ii.shape[2]
    Es = C * CH

    def shard_fn(params, video_state, fmap_pyr, t0, t1, net_ch,
                 target_ch, weight_ch, ii_ch, jj_ch, iir_ch, jjr_ch,
                 mask_ch, eslot_ch, fids_ch, rof, owned):
        net_ch, target_ch, weight_ch = net_ch[0], target_ch[0], weight_ch[0]
        ii_ch, jj_ch, iir_ch, jjr_ch = (
            ii_ch[0], jj_ch[0], iir_ch[0], jjr_ch[0]
        )
        mask_ch, eslot_ch, fids_ch = mask_ch[0], eslot_ch[0], fids_ch[0]
        rof, owned = rof[0], owned[0]

        s0 = video_state
        h, w = s0.disps.shape[1:]
        mask_e = mask_ch.reshape(Es)
        ii_e = ii_ch.reshape(Es)
        jj_e = jj_ch.reshape(Es)
        own_f = owned.astype(s0.damping.dtype)
        disps_up0 = s0.disps_up if upsample else jnp.zeros((0,), jnp.float32)

        def step_body(_, state):
            (net_ch, target_ch, weight_ch, poses, disps, damping,
             disps_up) = state
            vs = s0._replace(poses=poses, disps=disps)

            def chunk_body(carry, xs):
                damping, disps_up = carry
                net_c, target_c, weight_c, ii_c, jj_c, iir, jjr, m_c, \
                    esl, fids = xs
                net2, target2, weight2, eta, upmask, slot_mask = \
                    _alt_update_op(
                        net_def, params, vs, fmap_pyr, net_c, ii_c, jj_c,
                        iir, jjr, target_c, m_c, esl, num_slots,
                    )
                live = m_c[:, None, None, None] > 0
                # .astype: the backend hidden may be stored bf16
                net2 = jnp.where(live, net2, net_c).astype(net_c.dtype)
                target2 = jnp.where(live, target2, target_c)
                weight2 = jnp.where(live, weight2, weight_c)
                damping = _update_damping(damping, eta, fids, slot_mask)
                if upsample:
                    disps_up = _upsample_slots(
                        disps, disps_up, upmask, fids, slot_mask
                    )
                return (damping, disps_up), (net2, target2, weight2)

            (damping_l, disps_up_l), (net_ch, target_ch, weight_ch) = \
                jax.lax.scan(
                    chunk_body, (damping, disps_up),
                    (net_ch, target_ch, weight_ch, ii_ch, jj_ch, iir_ch,
                     jjr_ch, mask_ch, eslot_ch, fids_ch),
                )
            # frame ownership is exclusive (edges partitioned by ii), so
            # one owner-masked psum rebuilds the dense replicated buffers
            damping = jax.lax.psum(
                damping_l * own_f[:, None, None], axis
            )
            if upsample:
                disps_up = jax.lax.psum(
                    disps_up_l * own_f[:, None, None], axis
                )

            tgt = target_ch.reshape(Es, h, w, 2)
            wgt = weight_ch.reshape(Es, h, w, 2) \
                * mask_e[:, None, None, None]
            eta_dense = 0.2 * damping + EP
            poses, disps = sharded_dba_iters(
                axis, poses, disps, s0.intrinsics[0], s0.disps_sens,
                eta_dense, t0, t1, tgt, wgt, ii_e, jj_e, mask_e, rof,
                owned, Pb=Pb, iters=dba_iters, lm=lm, ep=ep,
                motion_only=False, strict_t0_quirk=t0_quirk,
            )
            disps = jnp.maximum(disps, 1e-3)
            return (net_ch, target_ch, weight_ch, poses, disps, damping,
                    disps_up)

        state = (net_ch, target_ch, weight_ch, s0.poses, s0.disps,
                 s0.damping, disps_up0)
        return jax.lax.fori_loop(0, steps, step_body, state)

    # cache the jitted shard_map per static configuration: jit keys on
    # function identity, so a fresh closure per call would retrace (and
    # over a tunnel, recompile) every update_lowmem invocation
    cache_key = (mesh, axis, net_def, num_slots, int(steps), Pb,
                 dba_iters, lm, ep, EP, upsample, t0_quirk, C, CH)
    fn = _SHARDED_LOWMEM_CACHE.get(cache_key)
    if fn is None:
        fn = jax.jit(jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P(), P(), P(), P(), P(),
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
            ),
            out_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
            check_vma=False,
        ))
        _SHARDED_LOWMEM_CACHE[cache_key] = fn
    return fn(
        params, video_state, fmap_pyr, jnp.asarray(t0, jnp.int32),
        jnp.asarray(t1, jnp.int32), net_ch, target_ch, weight_ch,
        jnp.asarray(plan.ii), jnp.asarray(plan.jj),
        jnp.asarray(plan.ii_rig), jnp.asarray(plan.jj_rig),
        jnp.asarray(plan.mask), jnp.asarray(plan.edge_slot),
        jnp.asarray(plan.frame_ids), jnp.asarray(plan.rof),
        jnp.asarray(plan.owned),
    )
