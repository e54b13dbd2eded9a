"""Streaming wide-BVH traversal: dense group culling + broadcast triangle
slabs.  Zero gathers in the hot loop.

Per ray chunk (all arrays (N, …), every op dense; see accel/wide.py for
the data-structure rationale and measured history):

  1. slab-test ALL group AABBs at once: (N, G) broadcast math;
  2. while any lane has a pending group with t_near < t_best:
       the chunk agrees on ONE group — the globally nearest pending
       (lane, group) candidate; its triangle block streams through the
       chunk in fixed slabs of SLAB triangles, each fetched with a single
       `dynamic_slice` (sequential DMA at bandwidth, broadcast to every
       lane) and tested with a dense masked Möller–Trumbore batch.

Front-to-back group ordering + the exact `t_near ≥ t_best` cutoff make
the result identical to brute force; lanes that don't care about the
current group are masked (dense compute is cheap next to any form of
per-lane memory indirection).  Rays are coherence-sorted (octant +
origin-Morton) into chunks so a chunk's group working set stays close to
the per-ray visit count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

INF = 1e9
SLAB = 256  # triangles per broadcast slab (XLA fallback path)
PALLAS_TILE = 1024  # ray padding unit for the Pallas kernel
GROUP_BATCH = 1  # groups per Pallas visit (measured: batching 4 groups
#   per call costs more in extra triangle work than it saves in dispatch)


def _use_pallas(flag):
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


def _slab_test(o, d_inv, bmin, bmax, t_best):
    """Dense slab test. o/d_inv: (N, 1, 3); bmin/bmax: (1, B, 3).
    Returns t_near (N, B) with INF where missed (reference rule
    `path_trace.fs:562-563`: t_far > 0, t_far >= t_near, t_near < t_best)."""
    t0 = (bmin - o) * d_inv
    t1 = (bmax - o) * d_inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf > 0) & (tf >= tn) & (tn < t_best[:, None])
    return jnp.where(hit, jnp.maximum(tn, 0.0), INF)


def _mt_slab(o, d, tris, valid, t_best):
    """Dense Möller–Trumbore: tris (S, 9) broadcast over rays (N, 3);
    `valid` (S,) masks padding slots.  Returns per-lane best candidate in
    the slab: (t (N,), slot (N,), u, v) with t = INF when none."""
    v0 = tris[None, :, 0:3]
    e1 = tris[None, :, 3:6]
    e2 = tris[None, :, 6:9]
    ob = o[:, None, :]
    db = d[:, None, :]
    pv = jnp.cross(db, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    tv = ob - v0
    qv = jnp.cross(tv, e1)
    u = jnp.sum(tv * pv, axis=-1) * inv_det
    v = jnp.sum(db * qv, axis=-1) * inv_det
    t = jnp.sum(e2 * qv, axis=-1) * inv_det
    ok = (
        valid[None, :]
        & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
        & (t >= 0) & (t < t_best[:, None])
    )
    t_cand = jnp.where(ok, t, INF)
    slot = jnp.argmin(t_cand, axis=1)
    n_idx = jnp.arange(o.shape[0])
    return t_cand[n_idx, slot], slot, u[n_idx, slot], v[n_idx, slot]


def _stream_group(o, d, g_sel, lane, packed_tris, tri_index, best, pallas_rays=None):
    """Stream group g_sel's triangle block through the chunk, updating
    `best` (dict t/tri/u/v) for masked lanes.

    With `pallas_rays` (the pre-tiled (grid,3,8,128) layout from
    ops/pallas_mt.tile_rays) the whole block runs as ONE fused Pallas
    kernel call (~70 Gpairs/s measured); otherwise SLAB-sized XLA slabs."""
    g, kg, _ = packed_tris.shape

    if pallas_rays is not None:
        from caitlynrenderer_tpu.ops.pallas_mt import mt_slab_pallas_tiled

        ot, dt = pallas_rays
        if g_sel.ndim == 0:
            g_list = [g_sel]
        else:
            g_list = [g_sel[i] for i in range(g_sel.shape[0])]
        tris = jnp.concatenate(
            [lax.dynamic_slice(packed_tris, (g, 0, 0), (1, kg, 9))[0] for g in g_list]
        )
        tri_row = jnp.concatenate(
            [lax.dynamic_slice(tri_index, (g, 0), (1, kg))[0] for g in g_list]
        )
        # Lanes outside the mask keep their best by passing t_best = -INF
        # (nothing can beat it), so the kernel result is a no-op for them.
        t_in = jnp.where(lane, best["t"], -INF)
        t_cand, slot, u, v = mt_slab_pallas_tiled(ot, dt, tris, t_in)
        ok = lane & (slot >= 0)
        tri = jnp.take(tri_row, jnp.maximum(slot, 0), axis=0)
        ok = ok & (tri >= 0)
        return dict(
            t=jnp.where(ok, t_cand, best["t"]),
            tri=jnp.where(ok, tri, best["tri"]),
            u=jnp.where(ok, u, best["u"]),
            v=jnp.where(ok, v, best["v"]),
        )

    n_slabs = -(-kg // SLAB)

    def body(s, st):
        off = s * SLAB
        size = min(SLAB, kg)  # static; kg >= SLAB except tiny scenes
        tris = lax.dynamic_slice(
            packed_tris, (g_sel, jnp.int32(off), 0), (1, size, 9)
        )[0]
        tri_row = lax.dynamic_slice(tri_index, (g_sel, jnp.int32(off)), (1, size))[0]
        t_cand, slot, u, v = _mt_slab(o, d, tris, tri_row >= 0, st["t"])
        ok = lane & (t_cand < st["t"])
        tri = tri_row[slot]
        ok = ok & (tri >= 0)
        return dict(
            t=jnp.where(ok, t_cand, st["t"]),
            tri=jnp.where(ok, tri, st["tri"]),
            u=jnp.where(ok, u, st["u"]),
            v=jnp.where(ok, v, st["v"]),
        )

    st = best
    if kg <= SLAB:
        st = body(0, st)
    else:
        assert kg % SLAB == 0, "group_tris must be a multiple of SLAB"
        for s in range(n_slabs):
            st = body(s, st)
    return st


def wide_closest(o, d, active, group_bounds, packed_tris, tri_index, use_pallas=None):
    """Closest-hit query for one chunk. Returns (t, tri, u, v); tri = -1 on
    miss (global BVH-ordered triangle ids via tri_index)."""
    if _use_pallas(use_pallas):
        n0 = o.shape[0]
        pad = (-n0) % PALLAS_TILE
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            active = jnp.concatenate([active, jnp.zeros(pad, bool)])
        out = _wide_closest_impl(o, d, active, group_bounds, packed_tris, tri_index, True)
        if pad:
            out = tuple(x[:n0] for x in out)
        return out
    return _wide_closest_impl(o, d, active, group_bounds, packed_tris, tri_index, False)


def _wide_closest_impl(o, d, active, group_bounds, packed_tris, tri_index, pallas: bool):
    n = o.shape[0]
    d_inv = 1.0 / d
    o3 = o[:, None, :]
    di3 = d_inv[:, None, :]

    t_best0 = jnp.where(active, INF, -INF)  # inactive: nothing beats -inf
    tg = _slab_test(
        o3, di3, group_bounds[None, :, :3], group_bounds[None, :, 3:], t_best0
    )
    tg = jnp.where(active[:, None], tg, INF)

    pallas_rays = None
    if pallas:
        from caitlynrenderer_tpu.ops.pallas_mt import tile_rays

        pallas_rays = tile_rays(o, d)  # hoisted: loop-invariant layout

    def cond(s):
        return jnp.any(jnp.min(s["tg"], axis=1) < s["t"])

    def body(s):
        tg = s["tg"]
        pend = jnp.where(tg < s["t"][:, None], tg, INF)
        col_min = jnp.min(pend, axis=0)
        if pallas_rays is not None:
            # Batch the GROUP_BATCH globally-nearest pending groups into
            # one kernel call.  Selecting an already-exhausted column is
            # safe: col_min == INF means no lane can ever need it again
            # (t_best only decreases), so marking it visited is a no-op.
            _, g_sel = lax.top_k(-col_min, min(GROUP_BATCH, col_min.shape[0]))
            lane = jnp.any(pend[:, g_sel] < INF, axis=1)
            tg = tg.at[:, g_sel].set(INF)
        else:
            g_sel = jnp.argmin(col_min)
            lane = pend[:, g_sel] < INF
            tg = tg.at[:, g_sel].set(INF)
        best = _stream_group(
            o, d, g_sel, lane, packed_tris, tri_index,
            {"t": s["t"], "tri": s["tri"], "u": s["u"], "v": s["v"]},
            pallas_rays=pallas_rays,
        )
        return dict(tg=tg, **best)

    out = lax.while_loop(
        cond,
        body,
        dict(
            tg=tg,
            t=t_best0,
            tri=jnp.full(n, -1, jnp.int32),
            u=jnp.zeros(n, jnp.float32),
            v=jnp.zeros(n, jnp.float32),
        ),
    )
    t = jnp.where(out["tri"] >= 0, out["t"], INF)
    return t, out["tri"], out["u"], out["v"]


def wide_anyhit(o, d, t_max, active, group_bounds, packed_tris, tri_index, use_pallas=None):
    """Any-hit (shadow) query: occluded (N,) bool — lanes stop scanning at
    the first confirmed hit in [0, t_max)."""
    if _use_pallas(use_pallas):
        n0 = o.shape[0]
        pad = (-n0) % PALLAS_TILE
        if pad:
            o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
            d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
            t_max = jnp.concatenate([t_max, jnp.zeros(pad, t_max.dtype)])
            active = jnp.concatenate([active, jnp.zeros(pad, bool)])
        out = _wide_anyhit_impl(o, d, t_max, active, group_bounds, packed_tris, tri_index, True)
        return out[:n0] if pad else out
    return _wide_anyhit_impl(o, d, t_max, active, group_bounds, packed_tris, tri_index, False)


def _wide_anyhit_impl(o, d, t_max, active, group_bounds, packed_tris, tri_index, pallas: bool):
    n = o.shape[0]
    d_inv = 1.0 / d
    o3 = o[:, None, :]
    di3 = d_inv[:, None, :]

    lim0 = jnp.where(active, t_max, -INF)
    tg = _slab_test(
        o3, di3, group_bounds[None, :, :3], group_bounds[None, :, 3:], lim0
    )
    tg = jnp.where(active[:, None], tg, INF)

    pallas_rays = None
    if pallas:
        from caitlynrenderer_tpu.ops.pallas_mt import tile_rays

        pallas_rays = tile_rays(o, d)

    def lane_lim(s):
        return jnp.where(s["occ"], -INF, s["lim"])

    def cond(s):
        return jnp.any(jnp.min(s["tg"], axis=1) < lane_lim(s))

    def body(s):
        tg = s["tg"]
        lim = lane_lim(s)
        pend = jnp.where(tg < lim[:, None], tg, INF)
        col_min = jnp.min(pend, axis=0)
        if pallas_rays is not None:
            _, g_sel = lax.top_k(-col_min, min(GROUP_BATCH, col_min.shape[0]))
            lane = jnp.any(pend[:, g_sel] < INF, axis=1)
            tg = tg.at[:, g_sel].set(INF)
        else:
            g_sel = jnp.argmin(col_min)
            lane = pend[:, g_sel] < INF
            tg = tg.at[:, g_sel].set(INF)
        best = _stream_group(
            o, d, g_sel, lane, packed_tris, tri_index,
            {
                "t": jnp.where(lane, s["lim"], -INF),
                "tri": jnp.full(n, -1, jnp.int32),
                "u": jnp.zeros(n, jnp.float32),
                "v": jnp.zeros(n, jnp.float32),
            },
            pallas_rays=pallas_rays,
        )
        occ = s["occ"] | (best["tri"] >= 0)
        return dict(tg=tg, occ=occ, lim=s["lim"])

    out = lax.while_loop(
        cond, body, dict(tg=tg, occ=jnp.zeros(n, bool), lim=lim0)
    )
    return out["occ"]


def _sort_keys(o, d, scene_min, scene_inv_extent):
    """Coherence sort key: direction octant (3 bits) then 7-bit-per-axis
    Morton code of the origin.  Sorting keeps a chunk's group working set
    (union over lanes) close to the per-lane visit count, which is what
    bounds the streaming loop's iteration count."""
    oct_ = (
        (d[:, 0] < 0).astype(jnp.int32) * 4
        + (d[:, 1] < 0).astype(jnp.int32) * 2
        + (d[:, 2] < 0).astype(jnp.int32)
    )
    q = jnp.clip(((o - scene_min) * scene_inv_extent * 127.0), 0, 127).astype(jnp.int32)

    def spread(x):  # 7-bit → every 3rd bit
        x = (x | (x << 14)) & 0x70000F
        x = (x | (x << 6)) & 0x18C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return (oct_ << 21) | (morton & 0x1FFFFF)


def _sorted_chunks(o, d, active, group_bounds, chunk_size, extras=()):
    """Coherence-sort, pad, and reshape the batch into fixed chunks."""
    n = o.shape[0]
    pad = (-n) % chunk_size
    scene_min = group_bounds[:, :3].min(axis=0)
    scene_extent = group_bounds[:, 3:].max(axis=0) - scene_min
    inv_ext = 1.0 / jnp.maximum(scene_extent, 1e-12)
    key = _sort_keys(o, d, scene_min, inv_ext)
    key = jnp.where(active, key, 0x7FFFFFFF)  # park inactive lanes together
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)

    def prep(x, fill):
        x = x[perm]
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0
            )
        nc = (n + pad) // chunk_size
        return x.reshape((nc, chunk_size) + x.shape[1:])

    out = [prep(o, 0.0), prep(d, 1.0), prep(active, False)]
    out += [prep(x, f) for x, f in extras]
    return out, inv_perm, n


def chunked_wide_closest(
    o, d, active, group_bounds, packed_tris, tri_index,
    chunk_size: int = 8192,
    use_pallas=None,
):
    """Closest-hit in coherence-sorted fixed-size chunks via `lax.map`."""
    if o.shape[0] <= chunk_size:
        return wide_closest(o, d, active, group_bounds, packed_tris, tri_index, use_pallas)
    (oc, dc, ac), inv_perm, n = _sorted_chunks(o, d, active, group_bounds, chunk_size)

    def body(args):
        return wide_closest(*args, group_bounds, packed_tris, tri_index, use_pallas)

    t, tri, u, v = jax.lax.map(body, (oc, dc, ac))
    flat = lambda x: x.reshape(-1)[:n][inv_perm]
    return flat(t), flat(tri), flat(u), flat(v)


def chunked_wide_anyhit(
    o, d, t_max, active, group_bounds, packed_tris, tri_index,
    chunk_size: int = 8192,
    use_pallas=None,
):
    """Any-hit twin of `chunked_wide_closest`."""
    if o.shape[0] <= chunk_size:
        return wide_anyhit(o, d, t_max, active, group_bounds, packed_tris, tri_index, use_pallas)
    (oc, dc, ac, tc), inv_perm, n = _sorted_chunks(
        o, d, active, group_bounds, chunk_size, extras=((t_max, 0.0),)
    )

    def body(args):
        ocx, dcx, acx, tcx = args
        return wide_anyhit(ocx, dcx, tcx, acx, group_bounds, packed_tris, tri_index, use_pallas)

    occ = jax.lax.map(body, (oc, dc, ac, tc))
    return occ.reshape(-1)[:n][inv_perm]
