"""Pair-exact streaming traversal — the TPU-native production path for
large scenes.

The consensus streamer (ops/traverse_wide.py) makes every lane of a chunk
test every group ANY lane needs: work = |union(chunk)| x chunk_size x Kg,
which degenerates to brute force for incoherent bounce rays.  This module
does exactly the useful work instead — Σ_rays |overlapping groups| x Kg —
by materializing (ray, group) PAIRS and processing them group-contiguously:

  1. cull: dense slab test of every ray against every group AABB
     → (N, G) t_near matrix (carried across rounds; processed entries
     are overwritten with INF, and `t_near >= t_best` prunes exactly like
     the reference's `tl < t_best` cutoff, path_trace.fs:562-563);
  2. top-K: each ray picks its K nearest pending groups (lax.top_k — fast
     vector op on TPU, unlike any per-lane control flow);
  3. bin: pairs are sorted by group id and each group's run is padded to
     the 1024-lane kernel tile, so every tile is single-group;
  4. sweep: ONE Pallas kernel walks all tiles; a scalar-prefetch map
     drives the per-tile triangle-block DMA (double-buffered by pallas),
     rays arrive as (8,128) component planes — zero transposes, zero
     per-lane gathers anywhere in the hot loop;
  5. combine: per-ray min over its pairs via scatter-min, winner payload
     by slot-id scatter-max;
  6. rounds: repeat while any ray still has pending groups closer than
     its current best hit (at most ceil(G/K) rounds; t_best tightens the
     cull every round).

All host-side steps are sorts/scatters/gathers measured at 0.03-0.2 ms
for 2M elements on TPU v5e — the pair bookkeeping is noise next to the
intersection sweep, which runs at the MT kernel's ~70 Gpairs/s.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
TILE = 1024  # pairs per kernel tile: one (8, 128) f32 register tile
DEFAULT_K = 16  # pending groups a ray processes per round
_CULL_BUDGET = 100_000_000  # max N*G elements of the (N, G) cull matrix


def _interp():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Pallas pair-sweep kernel: every tile tests its 1024 pairs (= rays in
# pair order) against ONE group's packed triangle block.
# ---------------------------------------------------------------------------


def _sweep_kernel(
    tile_gid_ref,  # (n_tiles,) i32 scalar-prefetch: group per tile (clamped)
    tile_valid_ref,  # (n_tiles,) i32 scalar-prefetch: 1 = real tile
    tris_ref,  # (1, Kg, 9) f32 VMEM — the tile's group block
    tidx_ref,  # (1, Kg, 1) i32 VMEM — global tri ids, -1 pad
    ox_ref, oy_ref, oz_ref,  # (1, 8, 128) f32 ray origin planes
    dx_ref, dy_ref, dz_ref,  # (1, 8, 128) f32 ray direction planes
    tin_ref,  # (1, 8, 128) f32 per-pair acceptance bound (-INF = dead)
    t_ref, tri_ref, u_ref, v_ref,  # outputs (1, 8, 128)
):
    i = pl.program_id(0)

    @pl.when(tile_valid_ref[i] == 0)
    def _():
        t_ref[0] = jnp.full((8, 128), INF, jnp.float32)
        tri_ref[0] = jnp.full((8, 128), -1, jnp.int32)
        u_ref[0] = jnp.zeros((8, 128), jnp.float32)
        v_ref[0] = jnp.zeros((8, 128), jnp.float32)

    @pl.when(tile_valid_ref[i] == 1)
    def _():
        ox, oy, oz = ox_ref[0], oy_ref[0], oz_ref[0]
        dx, dy, dz = dx_ref[0], dy_ref[0], dz_ref[0]
        kg = tris_ref.shape[1]

        def body(s, carry):
            best_t, best_tri, best_u, best_v = carry
            v0x = tris_ref[0, s, 0]
            v0y = tris_ref[0, s, 1]
            v0z = tris_ref[0, s, 2]
            e1x = tris_ref[0, s, 3]
            e1y = tris_ref[0, s, 4]
            e1z = tris_ref[0, s, 5]
            e2x = tris_ref[0, s, 6]
            e2y = tris_ref[0, s, 7]
            e2z = tris_ref[0, s, 8]

            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
            tvx = ox - v0x
            tvy = oy - v0y
            tvz = oz - v0z
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv_det
            v = (dx * qvx + dy * qvy + dz * qvz) * inv_det
            t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv_det
            tri = tidx_ref[0, s, 0]
            ok = (
                (u >= 0.0) & (v >= 0.0) & (1.0 - u - v >= 0.0)
                & (t >= 0.0) & (t < best_t)
                & (det != 0.0) & (tri >= 0)
            )
            best_tri = jnp.where(ok, tri, best_tri)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            best_t = jnp.where(ok, t, best_t)
            return best_t, best_tri, best_u, best_v

        init = (
            tin_ref[0],
            jnp.full((8, 128), -1, jnp.int32),
            jnp.zeros((8, 128), jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
        )
        best_t, best_tri, best_u, best_v = lax.fori_loop(0, kg, body, init)
        t_ref[0] = best_t
        tri_ref[0] = best_tri
        u_ref[0] = best_u
        v_ref[0] = best_v


def _pair_sweep(tile_gid, tile_valid, packed_tris, tri_index, comps, t_in):
    """Run the sweep over S = n_tiles*TILE pair slots.

    comps: 6 arrays (S,) f32 (ox..dz in pair-slot order); t_in: (S,) f32.
    Returns (t, tri, u, v) per slot.
    """
    n_tiles = tile_gid.shape[0]
    g, kg, _ = packed_tris.shape
    plane = lambda a: a.reshape(n_tiles, 8, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, kg, 9), lambda i, tg, tv: (tg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, kg, 1), lambda i, tg, tv: (tg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [
            pl.BlockSpec(
                (1, 8, 128), lambda i, tg, tv: (i, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(7)
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, 128), lambda i, tg, tv: (i, 0, 0), memory_space=pltpu.VMEM
            )
            for _ in range(4)
        ],
    )
    t, tri, u, v = pl.pallas_call(
        _sweep_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32),
        ],
        interpret=_interp(),
    )(
        tile_gid,
        tile_valid,
        packed_tris,
        tri_index[:, :, None],
        *[plane(c) for c in comps],
        plane(t_in),
    )
    s = n_tiles * TILE
    return t.reshape(s), tri.reshape(s), u.reshape(s), v.reshape(s)


# ---------------------------------------------------------------------------
# Dense pair scheduling — no sorts, no top_k (both are tens of ms for 1M
# elements on TPU; everything here is elementwise + cumsum + scatter).
#
# rank-within-group comes straight from an exclusive cumsum down the RAY
# axis of the (N, G) pending mask: rank(i, g) = #rays before i that also
# need group g.  Group runs are padded to the kernel tile, so slot(i, g) =
# padded_offset[g] + rank(i, g).  One round processes EVERY pending pair;
# extra rounds only happen if the static slot budget overflows (tracked by
# a per-ray visited bitmask so nothing is processed twice or dropped).
# ---------------------------------------------------------------------------


def _pend_mask(o, d_inv, bounds, t_lim, visited):
    """(N, G) pending mask: slab hit, t_near < t_lim, not yet visited.
    Component-wise math (no (..., 3) axes — those waste 125/128 lanes)."""
    n = o.shape[0]
    g = bounds.shape[0]
    tn = None
    tf = None
    for a in range(3):
        oa = o[:, a : a + 1]
        da = d_inv[:, a : a + 1]
        t0 = (bounds[None, :, a] - oa) * da
        t1 = (bounds[None, :, a + 3] - oa) * da
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        tn = lo if tn is None else jnp.maximum(tn, lo)
        tf = hi if tf is None else jnp.minimum(tf, hi)
    pend = (tf > 0) & (tf >= tn) & (tn < t_lim[:, None])
    if visited is not None:
        gw = visited.shape[1]
        bits = jnp.repeat(visited, 32, axis=1)[:, :g]
        shift = (jnp.arange(g, dtype=jnp.uint32) % 32)[None, :]
        seen = ((bits >> shift) & 1) == 1
        pend = pend & ~seen
    return pend


def _pack_bits(mask):
    """(N, G) bool → (N, ceil(G/32)) uint32 bitmask."""
    n, g = mask.shape
    gw = -(-g // 32)
    pad = gw * 32 - g
    if pad:
        mask = jnp.concatenate([mask, jnp.zeros((n, pad), bool)], axis=1)
    w = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    return jnp.sum(mask.reshape(n, gw, 32).astype(jnp.uint32) * w, axis=2)


def _schedule_dense(pend, n_slots):
    """Assign every pending (ray, group) pair a slot; single-group tiles.

    Returns (ray_at (n_slots,) i32 ray per slot or -1, tile_gid, tile_valid,
             processed (N, G) pairs that got a slot, overflow bool)."""
    n, g = pend.shape
    p = pend.astype(jnp.int32)
    incl = jnp.cumsum(p, axis=0)
    rank = incl - p  # exclusive
    counts = incl[-1]
    padded = -(-counts // TILE) * TILE
    offsets = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)]
    )
    slot = jnp.where(pend, offsets[None, :g] + rank, n_slots)
    overflow = offsets[g] > n_slots
    processed = pend & (slot < n_slots)
    n_tiles = n_slots // TILE
    flat_slot = slot.reshape(-1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, g), 0).reshape(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, g), 1).reshape(-1)
    ray_at = jnp.full(n_slots, -1, jnp.int32).at[flat_slot].set(rows, mode="drop")
    tile_gid = (
        jnp.full(n_tiles, -1, jnp.int32)
        .at[flat_slot // TILE]
        .max(cols, mode="drop")
    )
    tile_valid = (tile_gid >= 0).astype(jnp.int32)
    tile_gid = jnp.clip(tile_gid, 0, g - 1)
    return ray_at, tile_gid, tile_valid, processed, overflow


def _run_round(o, d, t_lim, pend, packed, tidx, n_slots):
    """Schedule the round's pending pairs and sweep them. Returns
    (ray_at, t_p, tri_p, u_p, v_p, processed, overflow)."""
    ray_at, tile_gid, tile_valid, processed, overflow = _schedule_dense(
        pend, n_slots
    )
    ray_safe = jnp.maximum(ray_at, 0)
    comps = [o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]]
    comps = [c[ray_safe] for c in comps]
    t_in = jnp.where(ray_at >= 0, t_lim[ray_safe], -INF)
    t_p, tri_p, u_p, v_p = _pair_sweep(
        tile_gid, tile_valid, packed, tidx, comps, t_in
    )
    return ray_at, ray_safe, t_p, tri_p, u_p, v_p, processed, overflow


def _combine(n, ray_at, ray_safe, t_p, tri_p, u_p, v_p, best):
    ok = (ray_at >= 0) & (tri_p >= 0)
    t_cand = jnp.where(ok, t_p, INF)
    tmin = jnp.full(n, INF, jnp.float32).at[ray_safe].min(t_cand)
    improved = tmin < best["t"]
    slot_ids = jnp.arange(t_p.shape[0], dtype=jnp.int32)
    win = ok & (t_cand <= tmin[ray_safe])
    win_slot = (
        jnp.full(n, -1, jnp.int32).at[ray_safe].max(jnp.where(win, slot_ids, -1))
    )
    ws = jnp.maximum(win_slot, 0)
    return {
        "t": jnp.where(improved, tmin, best["t"]),
        "tri": jnp.where(improved, tri_p[ws], best["tri"]),
        "u": jnp.where(improved, u_p[ws], best["u"]),
        "v": jnp.where(improved, v_p[ws], best["v"]),
    }


# ---------------------------------------------------------------------------
# Public queries
# ---------------------------------------------------------------------------

SLOT_FACTOR = 6  # static slot budget: N*SLOT_FACTOR + G*TILE
_CULL_BUDGET = 200_000_000  # max N*G elements of transient cull intermediates


def _chunk_size(n, g):
    c = max(TILE, min(262144, _CULL_BUDGET // max(g, 1)))
    c = (c // TILE) * TILE
    return min(c, max(TILE, n))


def _closest_chunk(o, d, active, bounds, packed, tidx, slot_factor):
    n = o.shape[0]
    g = packed.shape[0]
    gw = -(-g // 32)
    n_slots = n * slot_factor + g * TILE
    d_inv = 1.0 / d

    def cond(s):
        return s["more"]

    def body(s):
        pend = _pend_mask(o, d_inv, bounds, s["t"], s["visited"])
        ray_at, ray_safe, t_p, tri_p, u_p, v_p, processed, overflow = _run_round(
            o, d, s["t"], pend, packed, tidx, n_slots
        )
        best = _combine(
            n, ray_at, ray_safe, t_p, tri_p, u_p, v_p,
            {"t": s["t"], "tri": s["tri"], "u": s["u"], "v": s["v"]},
        )
        visited = s["visited"] | _pack_bits(processed)
        return dict(visited=visited, more=overflow, **best)

    t0 = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))
    out = lax.while_loop(
        cond,
        body,
        dict(
            visited=jnp.zeros((n, gw), jnp.uint32),
            t=t0,
            tri=jnp.full(n, -1, jnp.int32),
            u=jnp.zeros(n, jnp.float32),
            v=jnp.zeros(n, jnp.float32),
            more=jnp.asarray(True),
        ),
    )
    t = jnp.where(out["tri"] >= 0, out["t"], INF)
    return t, out["tri"], out["u"], out["v"]


def _anyhit_chunk(o, d, t_max, active, bounds, packed, tidx, slot_factor):
    n = o.shape[0]
    g = packed.shape[0]
    gw = -(-g // 32)
    n_slots = n * slot_factor + g * TILE
    d_inv = 1.0 / d
    lim0 = jnp.where(active, t_max, -INF)

    def cond(s):
        return s["more"]

    def body(s):
        cur = jnp.where(s["occ"], jnp.float32(-INF), lim0)
        pend = _pend_mask(o, d_inv, bounds, cur, s["visited"])
        ray_at, ray_safe, t_p, tri_p, _, _, processed, overflow = _run_round(
            o, d, cur, pend, packed, tidx, n_slots
        )
        hit = (ray_at >= 0) & (tri_p >= 0)
        occ = s["occ"].at[ray_safe].max(hit)
        visited = s["visited"] | _pack_bits(processed)
        return dict(visited=visited, occ=occ, more=overflow)

    out = lax.while_loop(
        cond,
        body,
        dict(
            visited=jnp.zeros((n, gw), jnp.uint32),
            occ=jnp.zeros(n, bool),
            more=jnp.asarray(True),
        ),
    )
    return out["occ"]


def stream_closest(
    o, d, active, group_bounds, packed_tris, tri_index, k: int = SLOT_FACTOR
):
    """Closest-hit over the WideBVH (accel/wide.py arrays). Exact vs brute
    force.  Returns (t, tri, u, v); tri = -1 on miss.  `k` is the per-ray
    slot budget factor (rounds repeat on overflow, so any value is exact)."""
    n = o.shape[0]
    g = packed_tris.shape[0]
    if g == 0 or packed_tris.shape[0] * packed_tris.shape[1] == 0:
        return (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
    c = _chunk_size(n, g)
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        active = jnp.concatenate([active, jnp.zeros(pad, bool)])
    if o.shape[0] == c:
        out = _closest_chunk(o, d, active, group_bounds, packed_tris, tri_index, k)
    else:
        nc = o.shape[0] // c
        reshape = lambda x: x.reshape((nc, c) + x.shape[1:])
        out = lax.map(
            lambda args: _closest_chunk(
                *args, group_bounds, packed_tris, tri_index, k
            ),
            (reshape(o), reshape(d), reshape(active)),
        )
        out = tuple(x.reshape(-1) for x in out)
    return tuple(x[:n] for x in out) if pad else out


def stream_anyhit(
    o, d, t_max, active, group_bounds, packed_tris, tri_index,
    k: int = SLOT_FACTOR,
):
    """Any-hit (shadow) twin of `stream_closest`: occluded (N,) bool."""
    n = o.shape[0]
    g = packed_tris.shape[0]
    if g == 0 or packed_tris.shape[0] * packed_tris.shape[1] == 0:
        return jnp.zeros(n, bool)
    c = _chunk_size(n, g)
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_max = jnp.concatenate([t_max, jnp.zeros(pad, t_max.dtype)])
        active = jnp.concatenate([active, jnp.zeros(pad, bool)])
    if o.shape[0] == c:
        occ = _anyhit_chunk(
            o, d, t_max, active, group_bounds, packed_tris, tri_index, k
        )
    else:
        nc = o.shape[0] // c
        reshape = lambda x: x.reshape((nc, c) + x.shape[1:])
        occ = lax.map(
            lambda args: _anyhit_chunk(
                *args, group_bounds, packed_tris, tri_index, k
            ),
            (reshape(o), reshape(d), reshape(t_max), reshape(active)),
        ).reshape(-1)
    return occ[:n] if pad else occ
