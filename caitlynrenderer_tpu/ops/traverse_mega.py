"""Packet-banded traversal megakernel — the production wide-BVH walk (v3).

Redesigned from the round-3 profile (benchmarks/PROFILE_r3.md).  The v2
kernel swept every group that ANY of a subtile's 128 rays needed, at a
measured 2.9 µs/sweep — for incoherent bounce rays the 128-lane union is
~64 groups while each ray truly needs ~1.06, so v2 bounce traversals were
effectively brute force.  v3 attacks exactly that consensus tax:

  1. **Ray packets share ONE banded matmul.**  Packet p's ray variants
     occupy contraction rows 8p..8p+8 of the od matrix; its group's
     Baldwin–Weber planes are DMA'd into the same sublane band of the
     ring slot.  Zero blocks elsewhere make the banded matmul evaluate a
     DIFFERENT group per packet in one MXU pass — and since the sweep is
     output-bound (~21 pairs/cycle at any K), packets cost nothing
     extra.  Steps per tile = max over packets of the per-packet union
     instead of the 128-ray union (4 packets of 32 measured fastest
     end-to-end; 16-ray packets save fewer sweeps than their extra
     cursor scans cost).

  2. **Static per-octant front-to-back group order** (host precompute:
     groups sorted by centroid along the octant's travel diagonal)
     replaces v2's per-supertile XLA cull + sort (`_tile_gmin`, ~12 ms of
     XLA prep per traversal) — per-traversal XLA work is now just the
     coherence sort of the rays.

  3. **Phase A stores per-(entry, packet) slab minima** (computed on
     the MXU as outer products, windowed lane-min'd into a (gpad, 128)
     table), so per-packet cursors scan 128 entries per vector op and
     terminate: a packet stops when no remaining entry's slab entry-t
     beats the packet's worst live bound (which only tightens).

  4. **Octant-major, origin-group-minor ray sort**: octant major keeps
     each tile on one valid front-to-back order; origin group (the group
     that produced the ray's origin — the previous traversal's winning
     group, a free kernel output) packs rays from the same surface patch
     into the same packets — measured 28 → 9.6 steps/tile on diffuse
     bounce rays, because a diffuse bounce's hit is usually near its
     origin.

Reference behavior this implements: closest-hit / any-hit queries of
`/root/reference/Shader/path_trace.fs:511-819` (the per-fragment stack
traversals), re-architected for a vector machine.  The any-hit early exit
(`path_trace.fs:703-708`) appears as per-packet termination when every
live lane is occluded.

Exactness: hit *selection* uses Baldwin–Weber t values (≈1e-6 relative of
Möller–Trumbore); the integrator re-derives (t, u, v) differentiably from
the winning triangle id (`intersect.refine_hit`), so shading is
unaffected.  The kernel therefore only outputs (t, tri, group).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
TILE = 128  # rays per kernel tile (= VPU lane width)
# Ray packets per tile.  4×32 measured best for the v3 scan-per-step
# scheduler (PROFILE_r3.md); re-tunable via MEGA_PACKETS now that the
# block cull changed the scan/sweep balance.
PACKETS = int(os.environ.get("MEGA_PACKETS", "4"))
PSUB = TILE // PACKETS  # rays per packet
KBAND = 8  # contraction rows per packet band (= plane block rows)
# Rays per kernel launch.  Bounded because ONE pallas_call walks
# CHUNK/128 tiles back to back: at 1M tris a bounce tile costs ~0.7 ms,
# and a multi-second single kernel can trip the TPU driver watchdog
# (observed as "TPU worker process crashed" on 1024²×6-bounce frames at
# 262144).  131072 keeps the longest call ~0.7 s with no measurable
# throughput cost at 256² scenes (launch overhead amortizes via lax.map).
CHUNK = int(os.environ.get("MEGA_CHUNK", "131072"))
DEPTH = int(os.environ.get("MEGA_DEPTH", "4"))  # DMA ring depth (prefetch)
_STATS = os.environ.get("MEGA_STATS") == "1"  # extra (n_sub, 8, 128) i32
# output: row 0 = sweep steps executed by the tile (diagnostics)
_PHASE_A_ONLY = os.environ.get("MEGA_PHASE_A_ONLY") == "1"  # perf probe
_NO_SWEEP = os.environ.get("MEGA_NO_SWEEP") == "1"  # perf probe


_FORCE_KERNEL = os.environ.get("MEGA_FORCE_KERNEL") == "1"


def _use_kernel():
    """The Pallas kernel runs compiled on TPU; on CPU backends the
    mathematically-identical dense XLA reference below is used instead
    (interpret-mode per-op dispatch makes the kernel's while-loops
    ~1000× slower than compiled — fine for one smoke test, unusable for
    the suite).  MEGA_FORCE_KERNEL=1 forces the interpreted kernel."""
    return jax.default_backend() == "tpu" or _FORCE_KERNEL


def _interp():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Host precompute
# ---------------------------------------------------------------------------


def pack_mega(packed_tris, tri_index):
    """Host precompute: (G, Kg, 9) v0/e1/e2 blocks + (G, Kg) ids →
    (G, 8, 3·Kp) f32 Baldwin–Weber plane blocks (Kp = Kg padded to 128).

    Row layout (the matmul K axis): rows 0-2 = plane vector xyz, row 3 =
    plane offset, rows 4-7 = zero.  Column layout: [n-plane 0:Kp |
    u-plane Kp:2Kp | v-plane 2Kp:3Kp], one column per triangle.  Planes
    are computed in float64 (1/|n|² amplifies rounding) and cast to f32.
    Degenerate / padding triangles get all-zero planes, which makes every
    ray-pair evaluate to NaN and fail the acceptance compares.
    """
    packed_tris = np.asarray(packed_tris, np.float64)
    tri_index = np.asarray(tri_index)
    g, kg, _ = packed_tris.shape
    kp = -(-kg // 128) * 128
    v0 = packed_tris[:, :, 0:3]
    e1 = packed_tris[:, :, 3:6]
    e2 = packed_tris[:, :, 6:9]
    n = np.cross(e1, e2)
    m = (n * n).sum(-1)
    bad = (m < 1e-30) | (tri_index < 0)
    m = np.where(bad, 1.0, m)
    pu = np.cross(e2, n) / m[..., None]
    pv = np.cross(n, e1) / m[..., None]
    dn = -(n * v0).sum(-1)
    du = -(pu * v0).sum(-1)
    dv = -(pv * v0).sum(-1)
    zero3 = bad[..., None]
    n = np.where(zero3, 0.0, n)
    pu = np.where(zero3, 0.0, pu)
    pv = np.where(zero3, 0.0, pv)
    dn = np.where(bad, 0.0, dn)
    du = np.where(bad, 0.0, du)
    dv = np.where(bad, 0.0, dv)

    out = np.zeros((g, 8, 3 * kp), np.float32)
    for base, vec, off in ((0, n, dn), (kp, pu, du), (2 * kp, pv, dv)):
        out[:, 0:3, base : base + kg] = vec.transpose(0, 2, 1)
        out[:, 3, base : base + kg] = off
    return out


def pack_octants(group_bounds, tri_starts):
    """Host precompute of the 8 static per-octant worklists.

    For direction octant o (bit 2/1/0 set = dx/dy/dz negative), groups are
    ordered front-to-back along the travel diagonal (ascending
    Σ_a sign_a · centroid_a, axes normalized by scene extent).  Returns
      oct_bounds: (8, gpad, 16) f32 — cols 0-5 = bmin/bmax per entry,
                  sublane-major so the kernel's phase A slab-tests octets
                  of 8 entries against all 128 rays (padding entries are
                  NaN so every slab test misses),
      oct_gid:    (8, gpad) i32 — group id per entry,
      oct_start:  (8, gpad) i32 — group's first global triangle id,
      oct_blk:    (8, nblk, 16) f32 — union bounds of each 128-entry
                  block of the worklist (NaN for empty blocks): the
                  coarse level of the kernel's hierarchical phase A —
                  a block whose union box no packet can reach is culled
                  without touching its 128 entry boxes.
    gpad = G padded to a multiple of 128 (the kernel scans 128-entry
    blocks); nblk = gpad // 128."""
    group_bounds = np.asarray(group_bounds, np.float32)
    tri_starts = np.asarray(tri_starts, np.int32)
    g = group_bounds.shape[0]
    gpad = max(128, -(-g // 128) * 128)
    nblk = gpad // 128
    cen = 0.5 * (group_bounds[:, :3] + group_bounds[:, 3:])
    lo = cen.min(axis=0) if g else np.zeros(3)
    hi = cen.max(axis=0) if g else np.ones(3)
    cen_n = (cen - lo) / np.maximum(hi - lo, 1e-12)

    oct_bounds = np.full((8, gpad, 16), np.nan, np.float32)
    oct_gid = np.zeros((8, gpad), np.int32)
    oct_start = np.zeros((8, gpad), np.int32)
    oct_blk = np.full((8, nblk, 16), np.nan, np.float32)
    for o in range(8):
        sign = np.array(
            [-1.0 if o & 4 else 1.0, -1.0 if o & 2 else 1.0,
             -1.0 if o & 1 else 1.0],
            np.float32,
        )
        order = np.argsort(cen_n @ sign, kind="stable").astype(np.int32)
        oct_bounds[o, :g, 0:6] = group_bounds[order]
        oct_bounds[o, :g, 6:16] = 0.0
        oct_gid[o, :g] = order
        oct_start[o, :g] = tri_starts[order]
        for b in range(-(-g // 128)):
            blk = group_bounds[order[b * 128 : min((b + 1) * 128, g)]]
            oct_blk[o, b, 0:3] = blk[:, :3].min(axis=0)
            oct_blk[o, b, 3:6] = blk[:, 3:].max(axis=0)
            oct_blk[o, b, 6:16] = 0.0
    return oct_bounds, oct_gid, oct_start, oct_blk


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _make_kernel(gpad: int, kp: int, anyhit: bool):
    kp3 = 3 * kp
    nblk = gpad // 128


    def kernel(
        oct_ref,  # (n_sub,) i32 scalar-prefetch: tile's direction octant
        gids_ref,  # (8, gpad) i32 scalar-prefetch: group id per entry
        starts_ref,  # (8, gpad) i32 scalar-prefetch: first tri id per entry
        rays_cm_ref,  # (1, 8, 128) f32 rows [ox,oy,oz,dx,dy,dz,tlim,·]
        wmeta_ref,  # (1, gpad, 16) f32 — octant worklist bounds (cols 0-5)
        blk_ref,  # (1, nblk, 16) f32 — 128-entry block union bounds
        tris_hbm,  # (G, 8, 3·Kp) ANY — Baldwin–Weber plane blocks
        *refs,
    ):
        if _STATS:
            stats_ref, refs = refs[0], refs[1:]
        if anyhit:
            (hit_ref, od_ref, bd_ref, bm_ref, ring, sem,
             bt_ref, aux_ref, tmax_ref, cur_ref, sl_ref, sl_t_ref) = refs
            gw_ref = None
        else:
            (t_ref, tri_ref, gw_out_ref, od_ref, bd_ref, bm_ref,
             ring, sem, bt_ref, aux_ref, gw_ref, tmax_ref,
             cur_ref, sl_ref, sl_t_ref) = refs
        # SMEM layout:
        #   tmax_ref    (PACKETS,) f32 — per-packet max live bound
        #   cur_ref     (PACKETS + 2,) i32 — per-packet cursor; [P+1] =
        #               stats sweep counter
        #   sl_ref      (DEPTH * PACKETS, 3) i32 — per (slot, packet):
        #               [valid, tri_start, group_id]
        #   sl_t_ref    (DEPTH * PACKETS,) f32 — packet-min slab entry-t of
        #               the slot's group AT ISSUE: sweeps revalidate it
        #               against the (monotonically tightening) tmax so
        #               stale prefetched groups are skipped, not swept
        oct = oct_ref[pl.program_id(0)]
        rc = rays_cm_ref[0]  # (8, 128)
        tlim = rc[6:7, :]  # (1, 128)

        # --- dead-tile skip: the coherence sort compacts dead lanes
        # (t_lim = -INF) to the tail, so late-bounce tiles are often
        # entirely dead — return misses without touching phase A, the
        # worklists, or HBM (wavefront ray compaction for free).
        tile_live = jnp.max(tlim) > -INF

        def _kernel_body():

            # --- od matrix for the banded matmul: packet p's 16 ray columns
            # carry [o;1] (cols 16p..) and [d;0] (cols 128+16p..) in
            # contraction rows 8p..8p+8; everything else is zero.
            od_ref[:, :] = jnp.zeros((PACKETS * KBAND, 256), jnp.float32)
            for p in range(PACKETS):
                s = PSUB * p
                r0 = KBAND * p
                od_ref[r0 : r0 + 3, s : s + PSUB] = rc[0:3, s : s + PSUB]
                od_ref[r0 + 3 : r0 + 4, s : s + PSUB] = jnp.ones(
                    (1, PSUB), jnp.float32
                )
                od_ref[r0 : r0 + 3, 128 + s : 128 + s + PSUB] = rc[
                    3:6, s : s + PSUB
                ]

            # --- phase A: per-(entry, lane) slab entry-t + per-packet block
            # minima, computed on the MXU.  The slab arithmetic
            #   t0[k, l] = (bound[k] - o[l]) · dinv[l] = bound[k]·dinv[l]
            #              - (o·dinv)[l]
            # is six outer products — ONE block-diagonal K=8 matmul of the
            # worklist bounds (gpad, 8) against a (8, 768) matrix whose
            # column-block a carries dinv_a (bmin) / dinv_a again (bmax).
            # (The per-octet VPU formulation measured 0.35 µs per 8 entries —
            # sublane-value broadcasts are slow; the MXU is output-bound at
            # 128 values/cycle, ~7 µs for the whole 1152-entry table.)
            # Stores bm_ref[k, l] = min over lanes [l, l+PSUB) of ray-lane
            # slab entry-t for entry k (INF = miss); only lanes PSUB·p are
            # read — packet p's pending minimum, driving the 128-entry cursor
            # block scans.  (A per-lane-exact issue test was tried and lost:
            # its VMEM row read + reduce + cond per candidate cost more than
            # the extra sweeps it avoided — see PROFILE_r3.md.)
            # Clamp |d| ≥ 1e-12: the factored slab form bound·dinv − o·dinv
            # would otherwise produce 0·inf = NaN for axis-aligned rays
            # against bounds at 0 (the subtract-first form never does).  A
            # parallel-outside ray then yields entry t ≥ ~1e10, which the
            # t < t_lim acceptance rejects.
            def _dinv(a):
                da = rc[3 + a : 4 + a, :]
                da = jnp.where(
                    jnp.abs(da) < 1e-12,
                    jnp.where(da < 0, -1e-12, 1e-12),
                    da,
                )
                return 1.0 / da

            dinv = [_dinv(a) for a in range(3)]
            odinv = [rc[a : a + 1, :] * dinv[a] for a in range(3)]
            bd_ref[:, :] = jnp.zeros((8, 768), jnp.float32)
            for a in range(3):
                bd_ref[a : a + 1, 128 * a : 128 * (a + 1)] = dinv[a]
                bd_ref[a + 3 : a + 4, 128 * (a + 3) : 128 * (a + 4)] = dinv[a]

            def slab_min(w):
                """Per-(row, lane) slab entry-t of bound rows `w` (n, 8)
                against all 128 rays, then windowed per-packet lane-min
                (lane PSUB·p = min over packet p's lanes).  INF = miss."""
                r = lax.dot_general(
                    w,
                    bd_ref[:, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )  # (n, 768): block a = bound_a ⊗ dinv_a
                tn = None
                tf = None
                for a in range(3):
                    t0 = r[:, 128 * a : 128 * (a + 1)] - odinv[a]
                    t1 = r[:, 128 * (a + 3) : 128 * (a + 4)] - odinv[a]
                    lo = jnp.minimum(t0, t1)
                    hi = jnp.maximum(t0, t1)
                    tn = lo if tn is None else jnp.maximum(tn, lo)
                    tf = hi if tf is None else jnp.minimum(tf, hi)
                ok = (tf > 0) & (tf >= tn) & (tn < tlim)
                bm = jnp.where(ok, jnp.maximum(tn, 0.0), INF)
                sh = 1
                while sh < PSUB:
                    # roll(x, 128-sh) ≡ shift by -sh: lane l reads l+sh
                    bm = jnp.minimum(bm, pltpu.roll(bm, 128 - sh, 1))
                    sh *= 2
                return bm

            # Per-packet initial bound (max live t_lim): drives the
            # coarse block cull below.  Windowed lane-MAX, same trick.
            # (A LAZY fine level — building each 128-entry block's table
            # only when a cursor reaches it — was tried and lost: the
            # per-visit scalar VMEM load of the coarse bound inside the
            # scan while-loop cost more than the eager tables it saved,
            # frame 152 → 182 ms.  Scalar loads from VMEM stall; keep the
            # hot loops vector-only.)
            pmax = tlim
            sh = 1
            while sh < PSUB:
                pmax = jnp.maximum(pmax, pltpu.roll(pmax, 128 - sh, 1))
                sh *= 2

            # --- hierarchical phase A.  Coarse level: slab the nblk
            # 128-entry block union boxes (one tiny matmul); a block no
            # packet can reach writes INF without touching its entries.
            # At 1M tris (nblk = 64) this skips ~90% of the fine-level
            # MXU work for typical tiles.
            blk_bm = slab_min(blk_ref[0, :, 0:8])  # (nblk, 128)
            head = (lax.broadcasted_iota(jnp.int32, (nblk, 128), 1) % PSUB) == 0
            blk_needed = (blk_bm < pmax) & head  # packet-head lanes only

            for b in range(nblk):
                blive = jnp.any(blk_needed[b : b + 1, :])

                @pl.when(blive)
                def _(b=b):
                    bm_ref[b * 128 : (b + 1) * 128, :] = slab_min(
                        wmeta_ref[0, b * 128 : (b + 1) * 128, 0:8]
                    )

                @pl.when(jnp.logical_not(blive))
                def _(b=b):
                    bm_ref[b * 128 : (b + 1) * 128, :] = jnp.full(
                        (128, 128), INF, jnp.float32
                    )

            # --- state init
            bt_ref[0:1, :] = tlim
            aux_ref[0:1, :] = jnp.full((1, 128), -1, jnp.int32)
            if not anyhit:
                gw_ref[0:1, :] = jnp.full((1, 128), -1, jnp.int32)
            for p in range(PACKETS):
                tmax_ref[p] = jnp.max(tlim[0:1, PSUB * p : PSUB * (p + 1)])
                cur_ref[p] = 0
            cur_ref[PACKETS + 1] = 0  # stats: sweep steps

            lane_iota = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            lane_pkt = lane_iota // PSUB  # lane → packet id
            sub_iota = lax.broadcasted_iota(jnp.int32, (128, 1), 0)

            def scan_next(p, k0):
                """Next worklist entry ≥ k0 that SOME ray of packet p still
                needs (its slab entry-t beats that ray's own current bound)
                and a lower bound of its slab entry-t; (gpad, INF) if none.
                One vector op scans a 128-entry block of the packet-min
                column.  The value reduce runs IN PARALLEL with the index
                reduce (min over ALL still-needed entries — a lower bound
                of the chosen entry's t, so revalidation skips
                conservatively; an exact dependent extract measured
                +0.9 µs/step, and a scalar VMEM load stalls worse)."""

                def cond(st):
                    k2, m, _ = st
                    return (m >= gpad) & (k2 < gpad)

                def body(st):
                    k2, _, _ = st
                    kb = k2 // 128
                    col = bm_ref[pl.ds(kb * 128, 128), PSUB * p : PSUB * p + 1]
                    si = sub_iota + kb * 128
                    ok = (col < tmax_ref[p]) & (si >= k2)
                    m2 = jnp.min(jnp.where(ok, si, gpad))
                    v2 = jnp.min(jnp.where(ok, col, INF))
                    return ((kb + 1) * 128, m2, v2)

                _, m, v = lax.while_loop(
                    cond, body,
                    (jnp.int32(k0), jnp.int32(gpad), jnp.float32(INF)),
                )
                return m, v

            def issue(slot):
                """Advance every packet's cursor once; DMA its next group's
                plane block into the slot's sublane band.  Records the
                entry's packet-min slab t so the sweep can revalidate."""
                for p in range(PACKETS):
                    k, kv = scan_next(p, cur_ref[p])
                    good = k < gpad

                    @pl.when(good)
                    def _(p=p, k=k, kv=kv, slot=slot):
                        g = gids_ref[oct, k]
                        pltpu.make_async_copy(
                            tris_hbm.at[g],
                            ring.at[slot, pl.ds(KBAND * p, KBAND), :],
                            sem.at[slot, p],
                        ).start()
                        sl_ref[slot * PACKETS + p, 0] = 1
                        sl_ref[slot * PACKETS + p, 1] = starts_ref[oct, k]
                        sl_ref[slot * PACKETS + p, 2] = g
                        sl_t_ref[slot * PACKETS + p] = kv

                    @pl.when(jnp.logical_not(good))
                    def _(p=p, slot=slot):
                        sl_ref[slot * PACKETS + p, 0] = 0
                        sl_t_ref[slot * PACKETS + p] = INF

                    cur_ref[p] = jnp.where(good, k + 1, gpad)

            # --- prologue: fill the ring DEPTH steps ahead (cursors only
            # ever exhaust, so the main loop stops at the first empty slot).
            if _PHASE_A_ONLY:
                # consume phase A output so it isn't dead-code-eliminated
                bt_ref[0:1, :] = jnp.minimum(bt_ref[0:1, :], bm_ref[0:1, :])
                for s in range(DEPTH * PACKETS):
                    sl_ref[s, 0] = 0
            else:
                for s in range(DEPTH):
                    issue(s)

            def smem_vec(slot, col):
                """(1, 128) vector from the slot's 8 per-packet SMEM scalars
                (sl_ref column `col`), broadcast to each packet's 16 lanes."""
                v = jnp.zeros((1, 128), jnp.int32)
                for p in range(PACKETS):
                    v = jnp.where(
                        lane_pkt == p, sl_ref[slot * PACKETS + p, col], v
                    )
                return v

            def step_cond(s):
                slot = s % DEPTH
                alive = 0
                for p in range(PACKETS):
                    alive = alive + sl_ref[slot * PACKETS + p, 0]
                return alive > 0

            def step_body(s):
                slot = s % DEPTH
                valid = smem_vec(slot, 0)
                startv = smem_vec(slot, 1)
                gidv = smem_vec(slot, 2)
                # Revalidate: a slot was issued against the tmax of DEPTH
                # steps ago; the bounds have only tightened since.  A
                # packet whose prefetched group can no longer beat its
                # current tmax contributes nothing — when EVERY packet's
                # group is stale, skip the whole sweep (kills the ~DEPTH
                # stale end-of-traversal sweeps each packet used to pay).
                fresh = 0
                for p in range(PACKETS):
                    stale_p = sl_t_ref[slot * PACKETS + p] >= tmax_ref[p]
                    fresh = fresh + jnp.where(stale_p, 0, sl_ref[slot * PACKETS + p, 0])

                    @pl.when(sl_ref[slot * PACKETS + p, 0] > 0)
                    def _(p=p, slot=slot):
                        pltpu.make_async_copy(
                            ring.at[slot, pl.ds(KBAND * p, KBAND), :],
                            ring.at[slot, pl.ds(KBAND * p, KBAND), :],
                            sem.at[slot, p],
                        ).wait()

                if _NO_SWEEP:  # perf probe: DMA + scheduling only
                    cur_ref[PACKETS + 1] = cur_ref[PACKETS + 1] + 1
                    issue(slot)
                    return s + 1

                @pl.when(fresh > 0)
                def _sweep(slot=slot, valid=valid, startv=startv, gidv=gidv):
                    _do_sweep(slot, valid, startv, gidv)

                issue(slot)  # refill the slot DEPTH steps ahead
                return s + 1

            def _do_sweep(slot, valid, startv, gidv):
                r = lax.dot_general(
                    ring[slot],  # (64, 3·Kp)
                    od_ref[:, :],  # (64, 256)
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )  # (3·Kp, 256)
                an = r[0:kp, 0:128]
                bn = r[0:kp, 128:256]
                au = r[kp : 2 * kp, 0:128]
                bu = r[kp : 2 * kp, 128:256]
                av = r[2 * kp : 3 * kp, 0:128]
                bv = r[2 * kp : 3 * kp, 128:256]
                t = -an / bn
                u = au + t * bu
                v = av + t * bv
                bt = bt_ref[0:1, :]
                okm = (
                    (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0) & (t < bt)
                    & (valid > 0)
                )
                if anyhit:
                    hit_any = jnp.any(okm, axis=0, keepdims=True)
                    aux_ref[0:1, :] = jnp.maximum(
                        aux_ref[0:1, :], hit_any.astype(jnp.int32)
                    )
                    new_bt = jnp.where(hit_any, -INF, bt)
                else:
                    tm = jnp.where(okm, t, INF)
                    vmin = jnp.min(tm, axis=0, keepdims=True)
                    improved = vmin < bt
                    # packed argmin: one reduce carries the winner row in the
                    # low 8 bits (t granularity 2^-15 relative; exact t keeps
                    # the bound tight via vmin above).
                    rid = lax.broadcasted_iota(jnp.int32, (kp, 128), 0)
                    key = (
                        (pltpu.bitcast(tm, jnp.int32) & jnp.int32(~0xFF)) | rid
                    )
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    row = kmin & 0xFF
                    new_bt = jnp.where(improved, vmin, bt)
                    aux_ref[0:1, :] = jnp.where(
                        improved, startv + row, aux_ref[0:1, :]
                    )
                    gw_ref[0:1, :] = jnp.where(improved, gidv, gw_ref[0:1, :])
                bt_ref[0:1, :] = new_bt
                for p in range(PACKETS):
                    tmax_ref[p] = jnp.max(
                        new_bt[0:1, PSUB * p : PSUB * (p + 1)]
                    )
                cur_ref[PACKETS + 1] = cur_ref[PACKETS + 1] + 1

            s_end = lax.while_loop(step_cond, step_body, 0)

            # --- drain in-flight DMAs of the unprocessed ring slots.
            def drain(j, _):
                slot = j % DEPTH
                for p in range(PACKETS):
                    @pl.when(sl_ref[slot * PACKETS + p, 0] > 0)
                    def _(p=p, slot=slot):
                        pltpu.make_async_copy(
                            ring.at[slot, pl.ds(KBAND * p, KBAND), :],
                            ring.at[slot, pl.ds(KBAND * p, KBAND), :],
                            sem.at[slot, p],
                        ).wait()
                return 0

            lax.fori_loop(s_end + 1, s_end + DEPTH, drain, 0)

            if anyhit:
                hit_ref[0] = jnp.broadcast_to(
                    jnp.maximum(aux_ref[0:1, :], 0), (8, 128)
                )
            else:
                t_ref[0] = jnp.broadcast_to(bt_ref[0:1, :], (8, 128))
                tri_ref[0] = jnp.broadcast_to(aux_ref[0:1, :], (8, 128))
                gw_out_ref[0] = jnp.broadcast_to(gw_ref[0:1, :], (8, 128))
            if _STATS:
                rowi = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
                stats_ref[0] = jnp.where(
                    rowi == 0, cur_ref[PACKETS + 1], 0
                )


        @pl.when(jnp.logical_not(tile_live))
        def _dead():
            if anyhit:
                hit_ref[0] = jnp.zeros((8, 128), jnp.int32)
            else:
                t_ref[0] = jnp.full((8, 128), -INF, jnp.float32)
                tri_ref[0] = jnp.full((8, 128), -1, jnp.int32)
                gw_out_ref[0] = jnp.full((8, 128), -1, jnp.int32)
            if _STATS:
                stats_ref[0] = jnp.zeros((8, 128), jnp.int32)

        @pl.when(tile_live)
        def _live():
            _kernel_body()

    return kernel


def _launch(o, d, t_lim, oct_tile, oct_bounds, oct_gid, oct_start, oct_blk,
            planes, anyhit=False):
    """One chunk (ray count a multiple of TILE)."""
    n = o.shape[0]
    g, _, kp3 = planes.shape
    kp = kp3 // 3
    gpad = oct_gid.shape[1]
    nblk = gpad // 128
    n_sub = n // TILE

    rays_cm = jnp.stack(
        [
            o[:, 0].reshape(n_sub, TILE),
            o[:, 1].reshape(n_sub, TILE),
            o[:, 2].reshape(n_sub, TILE),
            d[:, 0].reshape(n_sub, TILE),
            d[:, 1].reshape(n_sub, TILE),
            d[:, 2].reshape(n_sub, TILE),
            t_lim.reshape(n_sub, TILE),
            jnp.zeros((n_sub, TILE), jnp.float32),
        ],
        axis=1,
    )  # (n_sub, 8, 128)
    kernel = _make_kernel(gpad, kp, anyhit)
    sub_spec = pl.BlockSpec(
        (1, 8, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [sub_spec] * (1 if anyhit else 3)
    if anyhit:
        out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)]
    else:
        out_shape = [
            jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32),
        ]
    if _STATS:
        out_specs = [sub_spec] + out_specs
        out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)] + (
            out_shape
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_sub,),
        in_specs=[
            sub_spec,
            pl.BlockSpec(
                (1, gpad, 16),
                lambda i, oct_r, *_: (oct_r[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, nblk, 16),
                lambda i, oct_r, *_: (oct_r[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((PACKETS * KBAND, 256), jnp.float32),  # od
            pltpu.VMEM((8, 768), jnp.float32),  # bd (phase A block-diag)
            pltpu.VMEM((gpad, 128), jnp.float32),  # bm (packet window min)
            pltpu.VMEM((DEPTH, PACKETS * KBAND, kp3), jnp.float32),  # ring
            pltpu.SemaphoreType.DMA((DEPTH, PACKETS)),
            pltpu.VMEM((8, 128), jnp.float32),  # bt (row 0)
            pltpu.VMEM((8, 128), jnp.int32),  # tri / hit (row 0)
        ]
        + ([] if anyhit else [pltpu.VMEM((8, 128), jnp.int32)])  # gwin
        + [
            pltpu.SMEM((PACKETS,), jnp.float32),  # tmax
            pltpu.SMEM((PACKETS + 2,), jnp.int32),  # cursors + counters
            pltpu.SMEM((DEPTH * PACKETS, 3), jnp.int32),  # slot meta
            pltpu.SMEM((DEPTH * PACKETS,), jnp.float32),  # slot issue slab-t
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interp(),
    )(oct_tile, oct_gid, oct_start, rays_cm, oct_bounds, oct_blk, planes)
    take = lambda x: x[:, 0, :].reshape(n_sub * TILE)
    if _STATS:
        stats, outs = outs[0], outs[1:]
        return (stats,) + tuple(take(x) for x in outs)
    return tuple(take(x) for x in outs)


# ---------------------------------------------------------------------------
# XLA wrapper: coherence sort + chunking
# ---------------------------------------------------------------------------


def _octants(d):
    """Direction octant per ray (bit 2/1/0 set = dx/dy/dz negative)."""
    return (
        ((d[:, 0] < 0).astype(jnp.uint32) << 2)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | (d[:, 2] < 0).astype(jnp.uint32)
    )


def _sort_order(o, d, t_lim, og, bounds):
    """Coherence sort key per ray: [dead | direction octant | origin
    group | coarse origin morton].  Octant major keeps every tile's rays
    on one static front-to-back worklist order (wrong-octant lanes would
    converge their bounds last and defeat early termination — measured
    28 vs 8 steps/tile).  Origin group (the group that produced the
    ray's origin — the previous traversal's winning group, 0 for primary
    rays) minor: bounce rays from the same surface patch land in the
    same packets, shrinking each packet's group union toward the per-ray
    average (measured oracle steps 15.9 → 5.3 vs morton at 16-ray
    packets).  Dead lanes (t_lim = -INF) sort last, so late-bounce tiles
    exhaust after phase A — free ray compaction.  Returns
    (order, inverse, octants)."""
    smin = bounds[:, :3].min(axis=0)
    smax = bounds[:, 3:].max(axis=0)
    oct_ = _octants(d)
    q = jnp.clip(
        (o - smin[None, :]) / jnp.maximum(smax - smin, 1e-6)[None, :] * 7.0,
        0.0,
        7.0,
    ).astype(jnp.uint32)

    def spread(x):  # 3 bits → every 3rd bit
        x = (x | (x << 4)) & jnp.uint32(0x30C3)
        x = (x | (x << 2)) & jnp.uint32(0x9249)
        return x

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    ogu = jnp.clip(og, 0, (1 << 14) - 1).astype(jnp.uint32)
    key = (oct_ << 23) | (ogu << 9) | (m & 0x1FF)
    key = jnp.where(t_lim > -INF, key, jnp.uint32(0x7FFFFFFF))
    order = jnp.argsort(key)
    # Inverse permutation via a second argsort: a 65k scatter costs
    # 1.5 ms on TPU, argsort 0.03 ms (measured; XLA lowers scatter to a
    # serial loop but sort to a parallel network).
    inv = jnp.argsort(order)
    return order, inv, oct_


def _scene_exit_bound(o, d, t_lim, bounds):
    """Clamp each ray's acceptance bound to its scene-bbox exit t: no hit
    can exist past the exit, so miss rays stop holding their packet's
    `tmax` at INF (what makes per-packet termination work)."""
    smin = bounds[:, :3].min(axis=0)
    smax = bounds[:, 3:].max(axis=0)
    d_inv = 1.0 / d
    t0 = (smin[None, :] - o) * d_inv
    t1 = (smax[None, :] - o) * d_inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=1)
    hit = (tf > 0) & (tf >= tn)
    exit_t = jnp.where(hit, tf * (1.0 + 1e-5) + 1e-5, -INF)
    return jnp.minimum(t_lim, exit_t)


def _xla_reference(o, d, t_lim, starts, planes, anyhit):
    """Dense XLA evaluation of the same Baldwin–Weber plane math the
    kernel's banded matmul performs — the non-TPU execution path (see
    `_use_kernel`) and the oracle the kernel is tested against.  Sweeps
    every group for every ray (no culling — correctness only), chunked
    over groups to bound memory."""
    n = o.shape[0]
    g, _, kp3 = planes.shape
    kp = kp3 // 3

    def one_group(args):
        pg, start = args  # (8, 3·Kp), ()
        nv = pg[0:3, 0:kp]
        dn = pg[3, 0:kp]
        pu = pg[0:3, kp : 2 * kp]
        du = pg[3, kp : 2 * kp]
        pv = pg[0:3, 2 * kp : 3 * kp]
        dv = pg[3, 2 * kp : 3 * kp]
        # HIGHEST precision is load-bearing: the plane coefficients are
        # O(1/area) large and the u/v results come from catastrophic
        # cancellation, so the TPU default bf16 matmul pass loses real
        # hits (measured: 49/65 hits on the soup-600 case).  The Pallas
        # kernel's banded matmul already runs HIGHEST for the same reason.
        mm = lambda a, b: jnp.matmul(a, b, precision=lax.Precision.HIGHEST)
        an = mm(o, nv) + dn[None, :]
        bn = mm(d, nv)
        t = -an / bn
        u = (mm(o, pu) + du[None, :]) + t * mm(d, pu)
        v = (mm(o, pv) + dv[None, :]) + t * mm(d, pv)
        ok = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0) & (
            t < t_lim[:, None]
        )
        if anyhit:
            return jnp.any(ok, axis=1)
        tm = jnp.where(ok, t, INF)
        row = jnp.argmin(tm, axis=1).astype(jnp.int32)
        tbest = jnp.take_along_axis(tm, row[:, None], axis=1)[:, 0]
        return tbest, start + row

    if anyhit:
        hits = lax.map(one_group, (planes, starts))  # (G, N)
        return (jnp.any(hits, axis=0).astype(jnp.int32),)
    tb, tri = lax.map(one_group, (planes, starts))  # (G, N) each
    gi = jnp.argmin(tb, axis=0)  # (N,) winning group index
    tbest = jnp.take_along_axis(tb, gi[None, :], axis=0)[0]
    tri = jnp.take_along_axis(tri, gi[None, :], axis=0)[0]
    got = tbest < INF
    return (
        jnp.where(got, tbest, t_lim),
        jnp.where(got, tri, -1),
        jnp.where(got, gi.astype(jnp.int32), -1),
    )


def _query(o, d, t_lim, og, bounds, oct_bounds, oct_gid, oct_start, oct_blk,
           planes, anyhit=False, preorder=None, return_order=False):
    """preorder=(order, inv): reuse a caller-supplied coherence sort
    instead of paying a fresh argsort (~4.4 ms at 65k rays on TPU).  The
    shadow any-hit reuses its bounce's closest-hit order — shadow rays
    from the same surface patch stay tiled together, and correctness never
    depends on the order (every octant worklist covers all groups).
    return_order=True appends (order, inv) to the result tuple."""
    n = o.shape[0]
    t_lim = _scene_exit_bound(o, d, t_lim, bounds)
    if not (_use_kernel() or _STATS):
        # starts per GROUP id (not worklist order): group g's first tri.
        g = planes.shape[0]
        starts = jnp.zeros(g, jnp.int32).at[oct_gid[0, :g]].set(
            oct_start[0, :g]
        )
        out = _xla_reference(o, d, t_lim, starts, planes, anyhit)
        if return_order:
            iota = jnp.arange(n, dtype=jnp.int32)
            out = out + ((iota, iota),)
        return out
    if preorder is None:
        order, inv, oct_ = _sort_order(o, d, t_lim, og, bounds)
        o, d, t_lim, oct_ = o[order], d[order], t_lim[order], oct_[order]
    else:
        order, inv = preorder
        o, d, t_lim = o[order], d[order], t_lim[order]
        oct_ = _octants(d)  # octants of the reordered rays (cheap, no sort)
    c = min(CHUNK, max(TILE, -(-n // TILE) * TILE))
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_lim = jnp.concatenate([t_lim, jnp.full(pad, -INF, jnp.float32)])
        oct_ = jnp.concatenate([oct_, jnp.zeros(pad, oct_.dtype)])
    oct_tile = oct_[::TILE].astype(jnp.int32)
    args = (oct_bounds, oct_gid, oct_start, oct_blk, planes)
    if o.shape[0] == c:
        out = _launch(o, d, t_lim, oct_tile, *args, anyhit=anyhit)
    else:
        nc = o.shape[0] // c
        rs = lambda x: x.reshape((nc, c) + x.shape[1:])
        rt = lambda x: x.reshape(nc, c // TILE)
        out = lax.map(
            lambda a: _launch(*a, *args, anyhit=anyhit),
            (rs(o), rs(d), rs(t_lim), rt(oct_tile)),
        )
        out = tuple(
            x.reshape((-1,) + x.shape[2:]) if _STATS and x.ndim > 2
            else x.reshape(-1)
            for x in out
        )
    if _STATS:  # diagnostics stay per-subtile (post-sort order)
        stats, out = out[0], out[1:]
        return (stats,) + tuple(x[:n][inv] for x in out)
    out = tuple(x[:n][inv] for x in out)
    if return_order:
        out = out + ((order, inv),)
    return out


def mega_closest(o, d, active, group_bounds, mega_blocks, oct_bounds,
                 oct_gid, oct_start, oct_blk, og=None, return_order=False):
    """Closest-hit via the packet megakernel.  Returns (t, tri, group);
    tri/group = -1 on miss.  mega_blocks from `pack_mega`; oct_* from
    `pack_octants`; og = per-ray origin group (the previous traversal's
    winning group, None/zeros for primary rays) — a sort hint only,
    results are exact regardless."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        out = (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.full(n, -1, jnp.int32),
        )
        if return_order:
            iota = jnp.arange(n, dtype=jnp.int32)
            out = out + ((iota, iota),)
        return out
    if og is None:
        og = jnp.zeros(n, jnp.int32)
    t_lim = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))
    out = _query(
        o, d, t_lim, og, group_bounds, oct_bounds, oct_gid, oct_start,
        oct_blk, mega_blocks, return_order=return_order,
    )
    t, tri, grp = out[:3]
    t = jnp.where(tri >= 0, t, INF)
    if return_order:
        return t, tri, grp, out[3]
    return t, tri, grp


def mega_anyhit(o, d, t_max, active, group_bounds, mega_blocks, oct_bounds,
                oct_gid, oct_start, oct_blk, og=None, preorder=None):
    """Any-hit via the packet megakernel, with per-packet early exit:
    a lane that finds any hit leaves its packet's bound, so each packet
    stops as soon as every live lane is occluded (the tile-consensus
    analog of `path_trace.fs:703-708`).  preorder: reuse the bounce's
    closest-hit coherence sort instead of paying a second argsort (see
    _query)."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        return jnp.zeros(n, bool)
    if og is None:
        og = jnp.zeros(n, jnp.int32)
    t_lim = jnp.where(active, t_max, -INF)
    (hit,) = _query(
        o, d, t_lim, og, group_bounds, oct_bounds, oct_gid, oct_start,
        oct_blk, mega_blocks, anyhit=True, preorder=preorder,
    )
    return hit > 0
