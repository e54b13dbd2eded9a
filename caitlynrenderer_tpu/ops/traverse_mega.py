"""Subtile-consensus traversal megakernel — the production wide-BVH walk.

v2 of the tile-consensus design (v1 history: every XLA-side irregular op
costs ~10-20 ns/index + ~2 ms fixed, so traversal must be ZERO-gather; the
v1 kernel swept whole 1024-ray tiles with scalar-broadcast Möller–Trumbore
and measured ~5 µs per 256-triangle group visit — VPU-saturated, meaning
the only wins left are (a) fewer ray×triangle pairs and (b) fewer VPU flops
per pair).  v2 gets both:

  (a) **128-ray subtiles.**  The visit decision ("does any lane still need
      this group?") is consensus over 128 rays instead of 1024.  The XLA
      side still culls + front-to-back sorts the group worklist per
      1024-ray supertile (cheap, amortized); each subtile then re-tests
      every worklist entry against its own 128 rays inside the kernel
      ((8 groups × 128 rays) slab tests per step, full VPU tiles) and
      sweeps only groups its own rays can hit.  Incoherent bounce tiles
      drop from ~360 visited groups (supertile union) to the subtile
      union, and the DMA ring only fetches blocks the subtile will sweep.

  (b) **Baldwin–Weber plane intersection on the MXU.**  Each triangle is
      precomputed (host, float64) into three planes — normal plane
      (n, d_n) and two barycentric planes (p_u, d_u), (p_v, d_v) with
      t = -(n·o+d_n)/(n·d), u = (p_u·o+d_u) + t·(p_u·d), v likewise
      (Baldwin & Weber, JCGT 2016 — algebraically equal to Möller–Trumbore,
      validated to ~2e-6 on hits).  All six dot products for a whole
      (128 rays × Kg triangles) visit become ONE matmul
      (8, 3·Kg)ᵀ×(8, 256): the MXU eats the dots while the VPU does only
      ~12 elementwise ops/pair (divide, two FMAs, compares, min-reduce) —
      ~4× less VPU work than inlined Möller–Trumbore.

The any-hit variant has a TRUE early exit: a lane that finds any hit drops
out of the tile consensus (its bound goes to -inf), so the loop terminates
as soon as every live lane is occluded (`path_trace.fs:703-708` is the
per-ray reference behavior; this is its tile-consensus analog).

Exact-enough vs brute force: hit *selection* uses Baldwin–Weber t values
(~1e-6 relative of the Möller–Trumbore t); the integrator re-derives
(t, u, v) differentiably from the winning triangle id (`intersect.refine_hit`),
so shading math is unaffected.  Tests accept id-or-t-close agreement.
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
SUPER = 1024  # rays per supertile (XLA cull + sort granularity)
SUB = 128  # rays per subtile (kernel consensus granularity)
SUBT = SUPER // SUB
CHUNK = 262144  # rays per kernel launch
DEPTH = 8  # DMA ring depth (triangle-block prefetch distance)
_NO_TMAX = os.environ.get("MEGA_NO_TMAX") == "1"
_NO_SWEEP = os.environ.get("MEGA_NO_SWEEP") == "1"
_STATS = os.environ.get("MEGA_STATS") == "1"  # extra (n_sub, 8, 128) i32
# output: row 0 = sweeps done, row 1 = own-pending entries (diagnostics)


def _interp():
    return jax.default_backend() != "tpu"


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


def _tile_gmin(o, d, t_lim, bounds, n_tiles, gpad):
    """Dense XLA cull: per (supertile, group) min t_near over the tile's
    rays, chunked so the (rays, G) intermediate stays ~100 MB.  Returns
    (n_tiles, gpad) f32 (INF = tile skips group)."""
    g = bounds.shape[0]
    tiles_per_chunk = max(1, min(n_tiles, 32 * 1024 * 1024 // (SUPER * g // 8)))

    def cull(args):
        oc, dc, tc = args
        tn = None
        tf = None
        di = 1.0 / dc
        for a in range(3):
            t0 = (bounds[None, :, a] - oc[:, a : a + 1]) * di[:, a : a + 1]
            t1 = (bounds[None, :, a + 3] - oc[:, a : a + 1]) * di[:, a : a + 1]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        hit = (tf > 0) & (tf >= tn) & (tn < tc[:, None])
        tn = jnp.where(hit, jnp.maximum(tn, 0.0), INF)
        return jnp.min(tn.reshape(-1, SUPER, g), axis=1)

    nc = -(-n_tiles // tiles_per_chunk)
    tpc = tiles_per_chunk
    pad_tiles = nc * tpc - n_tiles
    rs = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad_tiles * SUPER,) + x.shape[1:], x.dtype)]
    ).reshape((nc, tpc * SUPER) + x.shape[1:]) if pad_tiles else x.reshape(
        (nc, tpc * SUPER) + x.shape[1:]
    )
    gmin = lax.map(cull, (rs(o), rs(d), rs(t_lim)))
    gmin = gmin.reshape(nc * tpc, g)[:n_tiles]
    if gpad > g:
        gmin = jnp.concatenate(
            [gmin, jnp.full((n_tiles, gpad - g), INF, jnp.float32)], axis=1
        )
    gids = jnp.broadcast_to(
        jnp.arange(gpad, dtype=jnp.int32)[None, :], gmin.shape
    )
    gmin, gids = lax.sort((gmin, gids), dimension=1, num_keys=1)
    return gmin, gids


def _build_wmeta(gmin, gids, bounds, starts):
    """Per-supertile worklist metadata, sublane-major (one row per
    worklist entry so the kernel's dynamic per-entry reads index the
    sublane dimension, which Mosaic supports): (n_super, gpad, 16) f32
    with columns 0-5 = bmin/bmax, 6 = group's first triangle id,
    7 = sorted gmin, 8 = group id (for the DMA), 9-15 = zero.  Bounds and
    starts are gathered into worklist order here (one small XLA gather per
    traversal; the kernel then only ever does sequential reads)."""
    n_super, gpad = gmin.shape
    g = bounds.shape[0]
    meta = jnp.concatenate(
        [bounds, starts.astype(jnp.float32)[:, None]], axis=1
    )  # (G, 7)
    if gpad > g:
        meta = jnp.concatenate(
            [meta, jnp.zeros((gpad - g, 7), jnp.float32)], axis=0
        )
    sorted_meta = meta[gids]  # (n_super, gpad, 7)
    return jnp.concatenate(
        [
            sorted_meta,
            gmin[:, :, None],  # col 7
            gids.astype(jnp.float32)[:, :, None],  # col 8
            jnp.zeros((n_super, gpad, 7), jnp.float32),
        ],
        axis=2,
    )


def _make_kernel(n_groups: int, kp3: int, anyhit: bool):
    kp = kp3 // 3

    def kernel(
        rays_cm_ref,  # (1, 8, 128) rows [ox,oy,oz,dx,dy,dz,tlim,·]
        wmeta_ref,  # (1, gpad, 16) worklist metadata (see _build_wmeta)
        tris_hbm,  # (G, 8, 3·Kp) ANY — Baldwin–Weber plane blocks
        *refs,
    ):
        if _STATS:
            stats_ref, refs = refs[0], refs[1:]
        else:
            stats_ref = None
        if anyhit:
            (
                hit_ref,
                od_ref, own_ref, ring, sem, bt_ref, aux_ref, tmax_ref, st_ref,
            ) = refs
            bu_ref = bv_ref = None
        else:
            (
                t_ref, tri_ref, u_ref, v_ref,
                od_ref, own_ref, ring, sem, bt_ref, aux_ref, bu_ref, bv_ref,
                tmax_ref, st_ref,
            ) = refs
        rc = rays_cm_ref[0]  # (8, 128)
        tlim = rc[6:7, :]  # (1, 128)
        gpad = wmeta_ref.shape[1]

        # --- ray-variant matrix for the visit matmul: cols 0-127 [o;1],
        # cols 128-255 [d;0] (rows = the plane blocks' K axis).
        od_ref[:, :] = jnp.zeros((8, 256), jnp.float32)
        od_ref[0:3, 0:128] = rc[0:3, :]
        od_ref[3:4, 0:128] = jnp.ones((1, 128), jnp.float32)
        od_ref[0:3, 128:256] = rc[3:6, :]

        # --- phase A: own-subtile cull.  For every worklist entry, the
        # min slab-entry t over THIS subtile's 128 rays (INF = skip).
        # Each step slab-tests an octet of 8 worklist entries (sublanes)
        # against all 128 rays (lanes) — full (8, 128) VPU tiles.
        ox = [rc[a : a + 1, :] for a in range(3)]
        dinv = [1.0 / rc[3 + a : 4 + a, :] for a in range(3)]

        def octet(c, _):
            tn = None
            tf = None
            for a in range(3):
                bmn = wmeta_ref[0, pl.ds(c * 8, 8), a : a + 1]
                bmx = wmeta_ref[0, pl.ds(c * 8, 8), a + 3 : a + 4]
                t0 = (bmn - ox[a]) * dinv[a]
                t1 = (bmx - ox[a]) * dinv[a]
                lo = jnp.minimum(t0, t1)
                hi = jnp.maximum(t0, t1)
                tn = lo if tn is None else jnp.maximum(tn, lo)
                tf = hi if tf is None else jnp.minimum(tf, hi)
            ok = (tf > 0) & (tf >= tn) & (tn < tlim)
            gt = jnp.where(ok, jnp.maximum(tn, 0.0), INF)
            own8 = jnp.min(gt, axis=1, keepdims=True)  # (8, 1)
            # Mask entries the supertile already ruled out (also kills the
            # padded worklist tail, whose inverted sentinel boxes would
            # otherwise pass the min/max slab test).
            own8 = jnp.where(
                wmeta_ref[0, pl.ds(c * 8, 8), 7:8] < INF, own8, INF
            )
            own_ref[pl.ds(c * 8, 8), 0:1] = own8
            return 0

        lax.fori_loop(0, gpad // 8, octet, 0)

        n_pend = jnp.sum(
            (wmeta_ref[0, :, 7:8] < INF).astype(jnp.int32)
        )

        def dma(k, slot):
            g = wmeta_ref[0, k, 8].astype(jnp.int32)
            return pltpu.make_async_copy(
                tris_hbm.at[g], ring.at[slot], sem.at[slot]
            )

        # --- prologue: issue the first DEPTH own-pending blocks.
        def pro_cond(s):
            cnt, kd = s
            return (cnt < DEPTH) & (kd < n_pend)

        def pro_body(s):
            cnt, kd = s
            pend = own_ref[kd, 0] < INF

            @pl.when(pend)
            def _():
                dma(kd, cnt % DEPTH).start()

            return (cnt + jnp.where(pend, 1, 0), kd + 1)

        ni0, kd0 = lax.while_loop(pro_cond, pro_body, (0, 0))
        st_ref[0] = kd0  # scan head (next worklist index to consider issuing)
        st_ref[1] = 0  # nv: own-pending entries consumed
        st_ref[2] = ni0  # ni: own-pending entries issued
        st_ref[3] = 0  # sweeps done (stats)

        # --- phase B: walk the worklist in supertile front-to-back order.
        # All mutable state lives in refs (SMEM scalars + VMEM accumulator
        # rows) so the per-entry skip path carries NOTHING — a loop-carried
        # vector accumulator would force register copies on every branch
        # (~120 ns/entry measured), which dominated an earlier version.
        bt_ref[0:1, :] = tlim
        aux_ref[0:1, :] = jnp.full((1, 128), -1, jnp.int32)  # tri / hit
        if not anyhit:
            bu_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)
            bv_ref[0:1, :] = jnp.zeros((1, 128), jnp.float32)
        tmax_ref[0] = jnp.max(tlim)

        def cond(k):
            k_safe = jnp.minimum(k, gpad - 1)  # k == n_pend at loop exit
            return (k < n_pend) & (wmeta_ref[0, k_safe, 7] < tmax_ref[0])

        def sweep(k, slot):
            p = ring[slot]  # (8, 3·Kp)
            r = lax.dot_general(
                p,
                od_ref[:, :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,  # f32 passes, not bf16
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
            okm = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0) & (t < bt)
            if anyhit:
                hit_any = jnp.any(okm, axis=0, keepdims=True)
                aux_ref[0:1, :] = jnp.maximum(
                    aux_ref[0:1, :], hit_any.astype(jnp.int32)
                )
                new_bt = jnp.where(hit_any, -INF, bt)
                bt_ref[0:1, :] = new_bt
                if not _NO_TMAX:
                    tmax_ref[0] = jnp.max(new_bt)
                return
            tm = jnp.where(okm, t, INF)
            vmin = jnp.min(tm, axis=0, keepdims=True)
            improved = vmin < bt
            sel = tm == vmin
            rid = jax.lax.broadcasted_iota(jnp.int32, (kp, 128), 0)
            vrow = jnp.min(jnp.where(sel, rid, kp), axis=0, keepdims=True)
            start = wmeta_ref[0, k, 6].astype(jnp.int32)
            uc = jnp.min(jnp.where(sel, u, INF), axis=0, keepdims=True)
            vc = jnp.min(jnp.where(sel, v, INF), axis=0, keepdims=True)
            new_bt = jnp.where(improved, vmin, bt)
            bt_ref[0:1, :] = new_bt
            aux_ref[0:1, :] = jnp.where(improved, start + vrow, aux_ref[0:1, :])
            bu_ref[0:1, :] = jnp.where(improved, uc, bu_ref[0:1, :])
            bv_ref[0:1, :] = jnp.where(improved, vc, bv_ref[0:1, :])
            if not _NO_TMAX:
                tmax_ref[0] = jnp.max(new_bt)

        def body(k):
            own_k = own_ref[k, 0]

            @pl.when(own_k < INF)
            def _():
                nv = st_ref[1]
                slot = nv % DEPTH
                dma(k, slot).wait()  # consume this slot's signal

                if not _NO_SWEEP:
                    @pl.when(own_k < tmax_ref[0])
                    def _():
                        sweep(k, slot)
                        st_ref[3] = st_ref[3] + 1

                # Refill the freed slot: scan to the next own-pending entry.
                def scan_cond(kd2):
                    kd2s = jnp.minimum(kd2, gpad - 1)
                    return (kd2 < n_pend) & (own_ref[kd2s, 0] >= INF)

                kd = lax.while_loop(scan_cond, lambda s: s + 1, st_ref[0])

                @pl.when(kd < n_pend)
                def _():
                    dma(kd, slot).start()
                    st_ref[2] = st_ref[2] + 1

                st_ref[0] = kd + 1
                st_ref[1] = nv + 1

            return k + 1

        lax.while_loop(cond, body, 0)

        # Drain DMAs issued past the early-termination point.
        def drain(j, _):
            pltpu.make_async_copy(
                ring.at[j % DEPTH], ring.at[j % DEPTH], sem.at[j % DEPTH]
            ).wait()
            return 0

        lax.fori_loop(st_ref[1], st_ref[2], drain, 0)

        if anyhit:
            hit_ref[0] = jnp.broadcast_to(
                jnp.maximum(aux_ref[0:1, :], 0), (8, 128)
            )
        else:
            t_ref[0] = jnp.broadcast_to(bt_ref[0:1, :], (8, 128))
            tri_ref[0] = jnp.broadcast_to(aux_ref[0:1, :], (8, 128))
            u_ref[0] = jnp.broadcast_to(bu_ref[0:1, :], (8, 128))
            v_ref[0] = jnp.broadcast_to(bv_ref[0:1, :], (8, 128))
        if _STATS:
            row = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            stats_ref[0] = jnp.where(
                row == 0, st_ref[3], jnp.where(row == 1, n_pend, 0)
            )

    return kernel


def _launch(o, d, t_lim, bounds, starts, planes, anyhit=False):
    """One chunk (ray count a multiple of SUPER)."""
    n = o.shape[0]
    g, _, kp3 = planes.shape
    gpad = -(-g // 8) * 8
    n_super = n // SUPER
    n_sub = n // SUB
    gmin, gids = _tile_gmin(o, d, t_lim, bounds, n_super, gpad)
    wmeta = _build_wmeta(gmin, gids, bounds, starts)

    rays_cm = jnp.stack(
        [
            o[:, 0].reshape(n_sub, SUB),
            o[:, 1].reshape(n_sub, SUB),
            o[:, 2].reshape(n_sub, SUB),
            d[:, 0].reshape(n_sub, SUB),
            d[:, 1].reshape(n_sub, SUB),
            d[:, 2].reshape(n_sub, SUB),
            t_lim.reshape(n_sub, SUB),
            jnp.zeros((n_sub, SUB), jnp.float32),
        ],
        axis=1,
    )  # (n_sub, 8, 128)

    kernel = _make_kernel(g, kp3, anyhit)
    sub_spec = pl.BlockSpec(
        (1, 8, 128), lambda i, j: (i * SUBT + j, 0, 0), memory_space=pltpu.VMEM
    )
    out_specs = [sub_spec] * (1 if anyhit else 4)
    if anyhit:
        out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)]
    else:
        out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.float32)] * 4
        out_shape[1] = jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)
    if _STATS:
        # diagnostics output FIRST (kernel unpacks refs[0] as stats):
        # per subtile, row 0 = sweeps done, row 1 = own-pending entries.
        out_specs = [sub_spec] + out_specs
        out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)] + out_shape
    outs = pl.pallas_call(
        kernel,
        grid=(n_super, SUBT),
        in_specs=[
            sub_spec,
            pl.BlockSpec(
                (1, gpad, 16), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, 256), jnp.float32),  # od
            pltpu.VMEM((gpad, 8), jnp.float32),  # own gmin (col 0)
            pltpu.VMEM((DEPTH, 8, kp3), jnp.float32),  # DMA ring
            pltpu.SemaphoreType.DMA((DEPTH,)),
            pltpu.VMEM((8, 128), jnp.float32),  # bt (row 0)
            pltpu.VMEM((8, 128), jnp.int32),  # tri / hit (row 0)
        ]
        + (
            []
            if anyhit
            else [
                pltpu.VMEM((8, 128), jnp.float32),  # bu (row 0)
                pltpu.VMEM((8, 128), jnp.float32),  # bv (row 0)
            ]
        )
        + [
            pltpu.SMEM((1,), jnp.float32),  # tmax
            pltpu.SMEM((4,), jnp.int32),  # kd / nv / ni
        ],
        interpret=_interp(),
    )(rays_cm, wmeta, planes)
    take = lambda x: x[:, 0, :].reshape(n_sub * SUB)
    if _STATS:
        stats, outs = outs[0], outs[1:]
        if anyhit:
            return (stats, take(outs[0]))
        return (stats,) + tuple(take(x) for x in outs)
    if anyhit:
        return (take(outs[0]),)
    return tuple(take(x) for x in outs)


def _sort_order(o, d, t_lim, bounds):
    """Coherence sort key per ray: [dead | direction octant | origin
    morton].  Subtiles then hold 128 rays of one direction octant with
    nearby origins, which shrinks the subtile's group union toward the
    per-ray average — the whole point of subtile consensus.  Dead lanes
    (t_lim = -INF) sort to the end, so late-bounce tiles become entirely
    dead and exit after phase A (free ray compaction).  Returns
    (order, inverse-order)."""
    smin = bounds[:, :3].min(axis=0)
    smax = bounds[:, 3:].max(axis=0)
    oct_ = (
        ((d[:, 0] < 0).astype(jnp.uint32) << 2)
        | ((d[:, 1] < 0).astype(jnp.uint32) << 1)
        | (d[:, 2] < 0).astype(jnp.uint32)
    )
    q = jnp.clip(
        (o - smin[None, :]) / jnp.maximum(smax - smin, 1e-6)[None, :] * 63.0,
        0.0,
        63.0,
    ).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 10)) & 0x30000FF
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    m = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    key = (oct_ << 18) | (m & 0x3FFFF)
    key = jnp.where(t_lim > -INF, key, jnp.uint32(0x7FFFFFFF))
    order = jnp.argsort(key)
    inv = jnp.zeros_like(order).at[order].set(
        jnp.arange(order.shape[0], dtype=order.dtype)
    )
    return order, inv


def _scene_exit_bound(o, d, t_lim, bounds):
    """Clamp each ray's acceptance bound to its scene-bbox exit t: no hit
    can exist past the exit, so miss rays stop holding the tile's `tmax`
    at INF (what makes consensus early termination work for incoherent
    ray sets)."""
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


def _query(o, d, t_lim, bounds, starts, planes, anyhit=False, sort=True):
    n = o.shape[0]
    t_lim = _scene_exit_bound(o, d, t_lim, bounds)
    if sort and n >= SUPER:
        order, inv = _sort_order(o, d, t_lim, bounds)
        o, d, t_lim = o[order], d[order], t_lim[order]
    else:
        inv = None
    c = min(CHUNK, max(SUPER, -(-n // SUPER) * SUPER))
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_lim = jnp.concatenate([t_lim, jnp.full(pad, -INF, jnp.float32)])
    if o.shape[0] == c:
        out = _launch(o, d, t_lim, bounds, starts, planes, anyhit=anyhit)
    else:
        nc = o.shape[0] // c
        rs = lambda x: x.reshape((nc, c) + x.shape[1:])
        out = lax.map(
            lambda a: _launch(*a, bounds, starts, planes, anyhit=anyhit),
            (rs(o), rs(d), rs(t_lim)),
        )
        out = tuple(
            x.reshape((-1,) + x.shape[2:]) if _STATS and x.ndim > 2
            else x.reshape(-1)
            for x in out
        )
    if _STATS:  # diagnostics stay per-subtile (post-sort order)
        stats, out = out[0], out[1:]
        if inv is not None:
            return (stats,) + tuple(x[:n][inv] for x in out)
        return (stats,) + tuple(x[:n] for x in out)
    if inv is not None:
        return tuple(x[:n][inv] for x in out)
    return tuple(x[:n] for x in out)


def mega_closest(o, d, active, group_bounds, mega_blocks, tri_starts):
    """Closest-hit via the subtile-consensus megakernel.  Returns
    (t, tri, u, v); tri = -1 on miss.  mega_blocks from `pack_mega`;
    tri_starts = each group's first (contiguous) global triangle id."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        return (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
    t_lim = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))
    t, tri, u, v = _query(o, d, t_lim, group_bounds, tri_starts, mega_blocks)
    t = jnp.where(tri >= 0, t, INF)
    return t, tri, u, v


def mega_anyhit(o, d, t_max, active, group_bounds, mega_blocks, tri_starts):
    """Any-hit via the megakernel, with a true consensus early exit: lanes
    that find any hit leave the tile's bound, so the walk stops as soon as
    every live lane is occluded."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        return jnp.zeros(n, bool)
    t_lim = jnp.where(active, t_max, -INF)
    (hit,) = _query(
        o, d, t_lim, group_bounds, tri_starts, mega_blocks, anyhit=True
    )
    return hit > 0
