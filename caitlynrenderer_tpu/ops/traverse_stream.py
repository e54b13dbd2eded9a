"""Pair-exact streaming traversal — the production path for incoherent rays.

The consensus megakernel (ops/traverse_mega.py) makes every subtile test
every group ANY of its 128 rays needs.  Measured on the 100k-triangle
terrain with diffuse bounce rays, a 128-ray subtile's group union is ~100
while the per-RAY average is only 2.8 — a 35× consensus tax that no ray
sorting recovers (octant+morton sorting moves the union 112 → 98; the
union is intrinsically large because a hemisphere of directions from any
surface patch overlaps most of the scene's groups).

This module pays for exactly the useful pairs instead.  All scheduling is
dense XLA vector work — measured on this chip at ~0.05 ms per step at 1M
elements (top_k, argsort, gather, scatter-min), so the bookkeeping is
noise.  (The round-1 version of this file died on a dense (N, G) scatter
— 37M indices ≈ 600 ms; the fix is to go through per-ray top-K pair
lists so every irregular op touches only N·K ≈ 1M elements.)

  1. cull: dense slab test → per-ray t_near over all G groups (chunked);
  2. top-K: each ray takes its K nearest pending groups (lax.top_k);
     exactness across rounds comes from a per-ray lexicographic
     (t_near, gid) threshold — no visited bitmask needed;
  3. bin: the N·K pairs are argsorted by group id; each group's run is
     padded to the 1024-pair kernel tile (slot formula is pure arithmetic
     from a searchsorted over the sorted keys);
  4. sweep: one Pallas kernel, grid = tiles, ONE group per tile whose
     Baldwin–Weber plane block (pack_mega layout) arrives by
     scalar-prefetch index map — Pallas double-buffers it automatically,
     so tiles pipeline at MXU/VPU throughput (~2 µs per 256k ray·tri);
  5. combine: per-ray min over its pair slots via scatter-min;
  6. rounds: repeat while some ray had > K pending groups (t_best
     tightens the cull each round, so round 2 is almost always empty).

Ray·triangle tests done = Σ_rays |pending groups| × Kg (+ tile padding),
vs |subtile union| × 128 × Kg for consensus — the asymptotic win that
makes bounce-heavy large-scene frames fast.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
TILE = 1024  # pairs per kernel tile (one group per tile)
DEFAULT_K = 12  # pending groups a ray may process per round
_CULL_CHUNK_ELEMS = 32 * 1024 * 1024  # max rays*G elements per cull chunk


def _interp():
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Pallas pair-sweep kernel.  Tile i holds TILE pairs of ONE group
# (tile_gid[i]); the group's (8, 3·Kp) Baldwin–Weber plane block is
# block-fetched by the scalar-prefetch index map.  Ray data arrives as an
# od matrix (8, 2·TILE): cols 0:TILE are [o;1], cols TILE:2·TILE are
# [d;0], and row 4 of the o-half carries the per-pair acceptance bound
# (plane rows 4-7 are zero, so the matmul ignores it).
# ---------------------------------------------------------------------------


def _make_sweep_kernel(kp: int, anyhit: bool):
    def kernel(
        tg_ref,  # (n_tiles,) i32 scalar-prefetch: group per tile
        tv_ref,  # (n_tiles,) i32 scalar-prefetch: 1 = real tile
        ts_ref,  # (n_tiles,) i32 scalar-prefetch: group's first tri id
        planes_ref,  # (1, 8, 3·Kp) f32 — the tile's group plane block
        od_ref,  # (1, 8, 2·TILE) f32 — ray variants + bound row
        *outs,
    ):
        i = pl.program_id(0)
        if anyhit:
            (hit_ref,) = outs
        else:
            t_ref, tri_ref, u_ref, v_ref = outs

        @pl.when(tv_ref[i] == 0)
        def _():
            if anyhit:
                hit_ref[0] = jnp.zeros((8, 128), jnp.int32)
            else:
                t_ref[0] = jnp.full((8, 128), INF, jnp.float32)
                tri_ref[0] = jnp.full((8, 128), -1, jnp.int32)
                u_ref[0] = jnp.zeros((8, 128), jnp.float32)
                v_ref[0] = jnp.zeros((8, 128), jnp.float32)

        @pl.when(tv_ref[i] == 1)
        def _():
            r = lax.dot_general(
                planes_ref[0],
                od_ref[0],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,  # f32 passes, not bf16
            )  # (3·Kp, 2·TILE)
            an = r[0:kp, 0:TILE]
            bn = r[0:kp, TILE : 2 * TILE]
            au = r[kp : 2 * kp, 0:TILE]
            bu = r[kp : 2 * kp, TILE : 2 * TILE]
            av = r[2 * kp : 3 * kp, 0:TILE]
            bv = r[2 * kp : 3 * kp, TILE : 2 * TILE]
            t = -an / bn
            u = au + t * bu
            v = av + t * bv
            tin = od_ref[0, 4:5, 0:TILE]  # (1, TILE) acceptance bound
            okm = (u >= 0) & (v >= 0) & (u + v <= 1.0) & (t >= 0) & (t < tin)
            if anyhit:
                hit = jnp.any(okm, axis=0, keepdims=True)  # (1, TILE)
                hit_ref[0] = hit.astype(jnp.int32).reshape(8, 128)
                return
            tm = jnp.where(okm, t, INF)
            vmin = jnp.min(tm, axis=0, keepdims=True)  # (1, TILE)
            sel = tm == vmin
            rid = lax.broadcasted_iota(jnp.int32, (kp, TILE), 0)
            vrow = jnp.min(jnp.where(sel, rid, kp), axis=0, keepdims=True)
            uc = jnp.min(jnp.where(sel, u, INF), axis=0, keepdims=True)
            vc = jnp.min(jnp.where(sel, v, INF), axis=0, keepdims=True)
            got = vmin < INF
            tri = jnp.where(got, ts_ref[i] + vrow, -1)
            t_ref[0] = vmin.reshape(8, 128)
            tri_ref[0] = tri.reshape(8, 128)
            u_ref[0] = uc.reshape(8, 128)
            v_ref[0] = vc.reshape(8, 128)

    return kernel


def _pair_sweep(tile_gid, tile_valid, tile_start, planes, od, anyhit):
    """Sweep all tiles.  od: (n_tiles, 8, 2·TILE).  Returns per-slot
    results reshaped to (n_tiles*TILE,)."""
    n_tiles = tile_gid.shape[0]
    _, _, kp3 = planes.shape
    kp = kp3 // 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 8, kp3),
                lambda i, tg, tv, ts: (tg[i], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 2 * TILE),
                lambda i, tg, tv, ts: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 8, 128),
                lambda i, tg, tv, ts: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        * (1 if anyhit else 4),
    )
    if anyhit:
        out_shape = [jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32)]
    else:
        out_shape = [jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32)] * 4
        out_shape[1] = jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32)
    outs = pl.pallas_call(
        _make_sweep_kernel(kp, anyhit),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=_interp(),
    )(tile_gid, tile_valid, tile_start, planes, od)
    return tuple(x.reshape(n_tiles * TILE) for x in outs)


# ---------------------------------------------------------------------------
# Scheduling
# ---------------------------------------------------------------------------


def _cull_tn(o, d_inv, bounds, t_lim):
    """(N, G) slab-entry t (INF where the ray misses the group or the
    entry is past its bound), computed in ray chunks to bound memory."""
    n = o.shape[0]
    g = bounds.shape[0]
    rows = max(TILE, min(n, _CULL_CHUNK_ELEMS // max(g, 1)))
    rows = min(n, -(-rows // TILE) * TILE)

    def cull(args):
        oc, dic, tc = args
        tn = None
        tf = None
        for a in range(3):
            t0 = (bounds[None, :, a] - oc[:, a : a + 1]) * dic[:, a : a + 1]
            t1 = (bounds[None, :, a + 3] - oc[:, a : a + 1]) * dic[:, a : a + 1]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            tn = lo if tn is None else jnp.maximum(tn, lo)
            tf = hi if tf is None else jnp.minimum(tf, hi)
        hit = (tf > 0) & (tf >= tn) & (tn < tc[:, None])
        return jnp.where(hit, jnp.maximum(tn, 0.0), INF)

    if n <= rows:
        return cull((o, d_inv, t_lim))
    nc = -(-n // rows)
    pad = nc * rows - n
    ex = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
    ).reshape((nc, rows) + x.shape[1:]) if pad else x.reshape(
        (nc, rows) + x.shape[1:]
    )
    tn = lax.map(cull, (ex(o), ex(d_inv), ex(t_lim)))
    return tn.reshape(nc * rows, g)[:n]


def _schedule(gidx, valid, n_groups, n_slots):
    """Bin the (N, K) pairs into group-contiguous padded tiles.

    Returns (ray_at (n_slots,) ray per slot or -1,
             tile_gid, tile_valid, tile_start_slot arrays (n_tiles,))."""
    n, k = gidx.shape
    nk = n * k
    flat_g = jnp.where(valid, gidx, n_groups).reshape(-1)
    order = jnp.argsort(flat_g)
    sg = flat_g[order]
    sr = (
        lax.broadcasted_iota(jnp.int32, (n, k), 0).reshape(-1)[order]
    )
    grange = jnp.arange(n_groups, dtype=sg.dtype)
    gstart = jnp.searchsorted(sg, grange, side="left").astype(jnp.int32)
    gend = jnp.searchsorted(sg, grange, side="right").astype(jnp.int32)
    counts = gend - gstart
    padded = -(-counts // TILE) * TILE
    offs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded, dtype=jnp.int32)]
    )  # (G+1,)
    sgc = jnp.minimum(sg, n_groups - 1).astype(jnp.int32)
    pos = jnp.arange(nk, dtype=jnp.int32) - gstart[sgc]
    slot = jnp.where(sg < n_groups, offs[sgc] + pos, n_slots)
    ray_at = (
        jnp.full(n_slots, -1, jnp.int32).at[slot].set(sr, mode="drop")
    )
    n_tiles = n_slots // TILE
    tile_first = jnp.arange(n_tiles, dtype=jnp.int32) * TILE
    tile_gid = (
        jnp.searchsorted(offs[1:], tile_first, side="right").astype(jnp.int32)
    )
    tile_valid = (tile_first < offs[n_groups]).astype(jnp.int32)
    tile_gid = jnp.clip(tile_gid, 0, n_groups - 1)
    return ray_at, tile_gid, tile_valid


def _build_od(o, d, t_lim, ray_at):
    """(n_tiles, 8, 2·TILE) od matrices from per-slot ray ids: cols 0:TILE
    [o;1] with the acceptance bound in row 4, cols TILE:2·TILE [d;0]."""
    n_slots = ray_at.shape[0]
    n_tiles = n_slots // TILE
    rs = jnp.maximum(ray_at, 0)
    live = ray_at >= 0
    os_ = o[rs]  # (S, 3)
    ds_ = d[rs]
    tin = jnp.where(live, t_lim[rs], -INF)
    zero = jnp.zeros(n_slots, jnp.float32)
    one = jnp.ones(n_slots, jnp.float32)
    rows = [
        jnp.concatenate([os_[:, 0], ds_[:, 0]]),
        jnp.concatenate([os_[:, 1], ds_[:, 1]]),
        jnp.concatenate([os_[:, 2], ds_[:, 2]]),
        jnp.concatenate([one, zero]),
        jnp.concatenate([tin, zero]),
        jnp.concatenate([zero, zero]),
        jnp.concatenate([zero, zero]),
        jnp.concatenate([zero, zero]),
    ]
    od = jnp.stack(rows, axis=0)  # (8, 2*S) with halves [o | d]
    od = od.reshape(8, 2, n_tiles, TILE).transpose(2, 0, 1, 3)
    return od.reshape(n_tiles, 8, 2 * TILE)


def _round(o, d, d_inv, t_lim, thr_t, thr_g, bounds, starts, planes, k, anyhit):
    """One scheduling round: take each ray's K nearest pending groups
    beyond its lexicographic (t_near, gid) threshold, sweep them, and
    return (per-slot results, ray_at, new thresholds, more?)."""
    n = o.shape[0]
    g = bounds.shape[0]
    tn = _cull_tn(o, d_inv, bounds, t_lim)  # (N, G)
    gio = lax.broadcasted_iota(jnp.int32, (n, g), 1)
    beyond = (tn > thr_t[:, None]) | (
        (tn == thr_t[:, None]) & (gio > thr_g[:, None])
    )
    tnm = jnp.where(beyond, tn, INF)
    negv, gidx = lax.top_k(-tnm, k)  # (N, K) nearest-first
    tk = -negv
    valid = tk < INF
    n_pend = jnp.sum((tnm < INF).astype(jnp.int32), axis=1)
    more = jnp.any(n_pend > k)
    new_thr_t = jnp.where(valid[:, k - 1], tk[:, k - 1], jnp.float32(INF))
    new_thr_g = jnp.where(valid[:, k - 1], gidx[:, k - 1], jnp.int32(1 << 30))

    n_slots = (-(-(n * k) // TILE)) * TILE + g * TILE
    ray_at, tile_gid, tile_valid = _schedule(gidx, valid, g, n_slots)
    od = _build_od(o, d, t_lim, ray_at)
    tile_start = starts[tile_gid].astype(jnp.int32)
    outs = _pair_sweep(tile_gid, tile_valid, tile_start, planes, od, anyhit)
    return outs, ray_at, new_thr_t, new_thr_g, more


def _combine_closest(n, ray_at, t_p, tri_p, u_p, v_p, best):
    ok = (ray_at >= 0) & (tri_p >= 0)
    rs = jnp.maximum(ray_at, 0)
    t_cand = jnp.where(ok, t_p, INF)
    tmin = jnp.full(n, INF, jnp.float32).at[rs].min(
        jnp.where(ok, t_cand, INF)
    )
    improved = tmin < best["t"]
    slot_ids = jnp.arange(t_p.shape[0], dtype=jnp.int32)
    win = ok & (t_cand <= tmin[rs])
    win_slot = (
        jnp.full(n, -1, jnp.int32).at[rs].max(jnp.where(win, slot_ids, -1))
    )
    ws = jnp.maximum(win_slot, 0)
    return {
        "t": jnp.where(improved, tmin, best["t"]),
        "tri": jnp.where(improved, tri_p[ws], best["tri"]),
        "u": jnp.where(improved, u_p[ws], best["u"]),
        "v": jnp.where(improved, v_p[ws], best["v"]),
    }


def stream_closest(
    o, d, active, group_bounds, planes, tri_starts, k: int = DEFAULT_K
):
    """Closest-hit over the wide-BVH groups via pair-exact streaming.
    planes = Baldwin–Weber blocks (ops/traverse_mega.pack_mega);
    tri_starts = each group's first contiguous triangle id.  Returns
    (t, tri, u, v), tri = -1 on miss."""
    n = o.shape[0]
    g = planes.shape[0]
    if g == 0:
        return (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.zeros(n, jnp.float32),
            jnp.zeros(n, jnp.float32),
        )
    k = max(1, min(k, g))
    d_inv = 1.0 / d
    t0 = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))

    def cond(s):
        return s["more"]

    def body(s):
        outs, ray_at, thr_t, thr_g, more = _round(
            o, d, d_inv, s["t"], s["thr_t"], s["thr_g"],
            group_bounds, tri_starts, planes, k, anyhit=False,
        )
        best = _combine_closest(
            n, ray_at, *outs,
            {"t": s["t"], "tri": s["tri"], "u": s["u"], "v": s["v"]},
        )
        return dict(thr_t=thr_t, thr_g=thr_g, more=more, **best)

    out = lax.while_loop(
        cond,
        body,
        dict(
            thr_t=jnp.full(n, -INF, jnp.float32),
            thr_g=jnp.full(n, -1, jnp.int32),
            t=t0,
            tri=jnp.full(n, -1, jnp.int32),
            u=jnp.zeros(n, jnp.float32),
            v=jnp.zeros(n, jnp.float32),
            more=jnp.asarray(True),
        ),
    )
    t = jnp.where(out["tri"] >= 0, out["t"], INF)
    return t, out["tri"], out["u"], out["v"]


def stream_anyhit(
    o, d, t_max, active, group_bounds, planes, tri_starts, k: int = DEFAULT_K
):
    """Any-hit (shadow) twin of `stream_closest`: occluded (N,) bool.
    Rays that find a hit in round r drop out of round r+1's cull (their
    bound goes to -INF) — the pair-exact version of any-hit early out."""
    n = o.shape[0]
    g = planes.shape[0]
    if g == 0:
        return jnp.zeros(n, bool)
    k = max(1, min(k, g))
    d_inv = 1.0 / d
    lim0 = jnp.where(active, t_max, -INF)

    def cond(s):
        return s["more"]

    def body(s):
        cur = jnp.where(s["occ"], jnp.float32(-INF), lim0)
        (hit_p,), ray_at, thr_t, thr_g, more = _round(
            o, d, d_inv, cur, s["thr_t"], s["thr_g"],
            group_bounds, tri_starts, planes, k, anyhit=True,
        )
        rs = jnp.maximum(ray_at, 0)
        got = (ray_at >= 0) & (hit_p > 0)
        occ = s["occ"].at[rs].max(got)
        return dict(thr_t=thr_t, thr_g=thr_g, occ=occ, more=more)

    out = lax.while_loop(
        cond,
        body,
        dict(
            thr_t=jnp.full(n, -INF, jnp.float32),
            thr_g=jnp.full(n, -1, jnp.int32),
            occ=jnp.zeros(n, bool),
            more=jnp.asarray(True),
        ),
    )
    return out["occ"]
