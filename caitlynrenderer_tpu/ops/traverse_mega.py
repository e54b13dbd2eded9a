"""Tile-consensus traversal megakernel — ONE Pallas kernel per query.

Why a third traversal (after ops/traverse_wide.py consensus streaming and
ops/traverse_stream.py pair-exact binning): measured on TPU v5e, EVERY
XLA-side irregular op (gather/scatter/sort/top_k) costs ~10-20 ns per
index plus ~2 ms fixed — a pair-exact scheduler built from XLA primitives
spends 10× longer shuffling pair ids than intersecting triangles.  This
design needs ZERO XLA-side irregular ops:

  grid = ray tiles of 1024 (one (8,128) f32 register tile);

  phase A (cull): the tile slab-tests ALL group AABBs (bounds resident in
  VMEM, (Gpad, 6) rows so the group loop indexes sublanes), recording each
  group's tile-min t_near (reference rule, path_trace.fs:562-563);

  phase B (sweep): a scalar fori over groups; a group is visited only if
  some lane's slab entry beats the tile's current worst useful t
  (`tmin_g < max_lane t_best` — the consensus early-out).  A visit DMAs
  the group's packed triangle block HBM→VMEM (async copy at a dynamic
  group index) and runs the dense Möller–Trumbore sweep over all 1024
  lanes.  Work = Σ_tiles |union(tile)| × 1024 × Kg; camera tiles are
  coherent by construction and bounce tiles inherit pixel locality.

Exact vs brute force: lanes mask by their own t_best and the tile-level
skip only drops groups no lane can improve from.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
TILE = 1024
CHUNK = 262144  # rays per kernel launch (grid = CHUNK/TILE tiles)
DEPTH = 8  # DMA ring depth (triangle-block prefetch distance)


def _interp():
    return jax.default_backend() != "tpu"


def _make_kernel(n_groups: int, kg: int):
    def kernel(
        ox_ref, oy_ref, oz_ref,  # (1, 8, 128) f32 ray origin planes
        dx_ref, dy_ref, dz_ref,  # (1, 8, 128) f32 ray direction planes
        tlim_ref,  # (1, 8, 128) f32 per-ray acceptance bound (-INF dead)
        gmin_ref,  # (1, Gpad, 1) f32: tile-min t_near, ascending (XLA cull+sort)
        gids_ref,  # (1, Gpad, 1) i32: group ids in the same order
        tris_hbm,  # (G, Kg, 128) f32 ANY: cols 0-8 v0,e1,e2; col 9 tri id
        t_ref, tri_ref, u_ref, v_ref,  # outputs (1, 8, 128)
        tmax_ref,  # scratch SMEM (1,) f32: tile's worst useful t
        bt_ref, btri_ref, bu_ref, bv_ref,  # scratch (8, 128) accumulators
        tris_vmem,  # scratch (DEPTH, Kg, 128) f32 DMA ring
        sem,  # DMA semaphores (DEPTH,)
    ):
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        t_best0 = tlim_ref[0]
        bt_ref[:] = t_best0
        btri_ref[:] = jnp.full((8, 128), -1, jnp.int32)
        bu_ref[:] = jnp.zeros((8, 128), jnp.float32)
        bv_ref[:] = jnp.zeros((8, 128), jnp.float32)

        # Cull (phase A) runs as dense XLA outside the kernel; this tile's
        # per-group min t_near arrives as the gmin input block.
        tmax_ref[0] = jnp.max(t_best0)
        # Worklist length: gmin is sorted ascending with INF padding.
        n_pend = jnp.sum((gmin_ref[0, :, 0] < INF).astype(jnp.int32))

        def dma(k):
            g = gids_ref[0, k, 0]
            return pltpu.make_async_copy(
                tris_hbm.at[g], tris_vmem.at[k % DEPTH], sem.at[k % DEPTH]
            )

        # Prologue: fill the DMA ring DEPTH blocks deep — each visit then
        # waits on an in-flight copy instead of paying full DMA latency.
        n_first = jnp.minimum(n_pend, DEPTH)

        def prologue(k, _):
            dma(k).start()
            return 0

        lax.fori_loop(0, n_first, prologue, 0)

        # --- phase B: sweep pending groups front-to-back; the sorted
        # worklist makes `gmin >= tmax` a true stopping condition (ordered
        # early termination, like the reference's near-first traversal).
        def cond(state):
            k, _ = state
            return (k < n_pend) & (gmin_ref[0, k, 0] < tmax_ref[0])

        def visit(state):
            k, issued = state
            dma(k).wait()

            if True:
                buf = k % DEPTH

                def body(s, carry):
                    best_t, best_tri, best_u, best_v = carry
                    v0x = tris_vmem[buf, s, 0]
                    v0y = tris_vmem[buf, s, 1]
                    v0z = tris_vmem[buf, s, 2]
                    e1x = tris_vmem[buf, s, 3]
                    e1y = tris_vmem[buf, s, 4]
                    e1z = tris_vmem[buf, s, 5]
                    e2x = tris_vmem[buf, s, 6]
                    e2y = tris_vmem[buf, s, 7]
                    e2z = tris_vmem[buf, s, 8]
                    pvx = dy * e2z - dz * e2y
                    pvy = dz * e2x - dx * e2z
                    pvz = dx * e2y - dy * e2x
                    det = e1x * pvx + e1y * pvy + e1z * pvz
                    inv_det = 1.0 / jnp.where(
                        jnp.abs(det) < 1e-20, 1e-20, det
                    )
                    tvx = ox - v0x
                    tvy = oy - v0y
                    tvz = oz - v0z
                    qvx = tvy * e1z - tvz * e1y
                    qvy = tvz * e1x - tvx * e1z
                    qvz = tvx * e1y - tvy * e1x
                    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
                    v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
                    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
                    tri_f = tris_vmem[buf, s, 9]
                    tri = tri_f.astype(jnp.int32)
                    ok = (
                        (u >= 0.0) & (v >= 0.0) & (1.0 - u - v >= 0.0)
                        & (t >= 0.0) & (t < best_t)
                        & (det != 0.0) & (tri_f >= 0.0)
                    )
                    return (
                        jnp.where(ok, t, best_t),
                        jnp.where(ok, tri, best_tri),
                        jnp.where(ok, u, best_u),
                        jnp.where(ok, v, best_v),
                    )

                # Full unroll: Mosaic pipelines the unrolled triangle chain
                # ~8× better than the rolled loop (288→49 ms on the 100k
                # scene; only unroll=1 or unroll=num_steps is supported).
                best = lax.fori_loop(
                    0, kg, body, (bt_ref[:], btri_ref[:], bu_ref[:], bv_ref[:]),
                    unroll=kg,
                )
                bt_ref[:] = best[0]
                btri_ref[:] = best[1]
                bu_ref[:] = best[2]
                bv_ref[:] = best[3]
                tmax_ref[0] = jnp.max(best[0])

            # Prefetch the next worklist entry into the buffer slot the
            # sweep just released ((issued % DEPTH) == (k % DEPTH) once the
            # ring is full — safe only AFTER the sweep of k).
            @pl.when(issued < n_pend)
            def _():
                dma(issued).start()

            return (k + 1, jnp.minimum(issued + 1, n_pend))

        k_end, issued_end = lax.while_loop(cond, visit, (0, n_first))

        # Drain copies issued past the early-termination point.
        def drain(j, _):
            dma(j).wait()
            return 0

        lax.fori_loop(k_end, issued_end, drain, 0)
        t_ref[0] = bt_ref[:]
        tri_ref[0] = btri_ref[:]
        u_ref[0] = bu_ref[:]
        v_ref[0] = bv_ref[:]

    return kernel


def pack_mega(packed_tris, tri_index):
    """(G, Kg, 9) f32 + (G, Kg) i32 → (G, Kg, 128) f32 DMA-aligned blocks
    (cols 0-8 = v0,e1,e2; col 9 = tri id as f32, exact below 2**24)."""
    g, kg, _ = packed_tris.shape
    out = jnp.concatenate(
        [
            packed_tris,
            tri_index[:, :, None].astype(jnp.float32),
            jnp.zeros((g, kg, 118), jnp.float32),
        ],
        axis=2,
    )
    return out


def _tile_gmin(o, d, t_lim, bounds, n_tiles, gpad):
    """Dense XLA cull: per (tile, group) min t_near over the tile's rays.
    Component-wise slab math; chunked so the (rays, G) intermediate stays
    ~100 MB.  Returns (n_tiles, Gpad, 1) f32 (INF = tile skips group)."""
    g = bounds.shape[0]
    tiles_per_chunk = max(1, min(n_tiles, 32 * 1024 * 1024 // (TILE * g // 8)))

    def cull(args):
        oc, dc, tc = args  # (tpc*TILE, 3), ..., (tpc*TILE,)
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
        return jnp.min(tn.reshape(-1, TILE, g), axis=1)

    nc = -(-n_tiles // tiles_per_chunk)
    tpc = tiles_per_chunk
    pad_tiles = nc * tpc - n_tiles
    rs = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad_tiles * TILE,) + x.shape[1:], x.dtype)]
    ).reshape((nc, tpc * TILE) + x.shape[1:]) if pad_tiles else x.reshape(
        (nc, tpc * TILE) + x.shape[1:]
    )
    gmin = lax.map(cull, (rs(o), rs(d), rs(t_lim)))
    gmin = gmin.reshape(nc * tpc, g)[:n_tiles]
    if gpad > g:
        gmin = jnp.concatenate(
            [gmin, jnp.full((n_tiles, gpad - g), INF, jnp.float32)], axis=1
        )
    # Row-sort ascending: pending groups first, front-to-back.
    gids = jnp.broadcast_to(
        jnp.arange(gpad, dtype=jnp.int32)[None, :], gmin.shape
    )
    gmin, gids = lax.sort((gmin, gids), dimension=1, num_keys=1)
    return gmin[:, :, None], gids[:, :, None]


def _launch(o, d, t_lim, bounds, packed):
    """One chunk (shape multiple of TILE). Returns (t, tri, u, v)."""
    n = o.shape[0]
    g, kg, _ = packed.shape
    gpad = -(-g // 8) * 8
    n_tiles = n // TILE
    gmin, gids = _tile_gmin(o, d, t_lim, bounds, n_tiles, gpad)
    plane = lambda a: a.reshape(n_tiles, 8, 128)
    kernel = _make_kernel(g, kg)
    ray_spec = pl.BlockSpec(
        (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    t, tri, u, v = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[ray_spec] * 7
        + [
            pl.BlockSpec(
                (1, gpad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # gmin
            pl.BlockSpec(
                (1, gpad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),  # gids
            pl.BlockSpec(memory_space=pltpu.ANY),  # tris HBM
        ],
        out_specs=[ray_spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.VMEM((DEPTH, kg, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((DEPTH,)),
        ],
        interpret=_interp(),
    )(
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(t_lim),
        gmin,
        gids,
        packed,
    )
    n_ = n_tiles * TILE
    return t.reshape(n_), tri.reshape(n_), u.reshape(n_), v.reshape(n_)


def _scene_exit_bound(o, d, t_lim, bounds):
    """Clamp each ray's acceptance bound to its scene-bbox exit t: every
    triangle lies inside the union of group bounds, so no hit can exist
    past the exit — rays that miss (or leave) the scene stop holding the
    tile's `tmax` at INF, which is what makes early termination work for
    incoherent ray sets (2.9 s → 0.4 s on the 100k-tri bounce benchmark
    before the unroll fix; multiplicative with it)."""
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


def _query(o, d, t_lim, bounds, packed):
    n = o.shape[0]
    t_lim = _scene_exit_bound(o, d, t_lim, bounds)
    c = min(CHUNK, max(TILE, -(-n // TILE) * TILE))
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_lim = jnp.concatenate([t_lim, jnp.full(pad, -INF, jnp.float32)])
    if o.shape[0] == c:
        out = _launch(o, d, t_lim, bounds, packed)
    else:
        nc = o.shape[0] // c
        rs = lambda x: x.reshape((nc, c) + x.shape[1:])
        out = lax.map(
            lambda a: _launch(*a, bounds, packed),
            (rs(o), rs(d), rs(t_lim)),
        )
        out = tuple(x.reshape(-1) for x in out)
    return tuple(x[:n] for x in out)


def mega_closest(o, d, active, group_bounds, mega_blocks):
    """Closest-hit via the tile-consensus megakernel. Returns (t, tri, u, v);
    tri = -1 on miss.  Exact vs brute force.  mega_blocks from `pack_mega`."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        return (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
    t_lim = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))
    t, tri, u, v = _query(o, d, t_lim, group_bounds, mega_blocks)
    t = jnp.where(tri >= 0, t, INF)
    return t, tri, u, v


def mega_anyhit(o, d, t_max, active, group_bounds, mega_blocks):
    """Any-hit via the megakernel (closest-hit sweep, hit test on return —
    the tile-max skip prunes groups quickly once lanes find hits)."""
    n = o.shape[0]
    if mega_blocks.shape[0] == 0:
        return jnp.zeros(n, bool)
    t_lim = jnp.where(active, t_max, -INF)
    _, tri, _, _ = _query(o, d, t_lim, group_bounds, mega_blocks)
    return tri >= 0
