"""Wide-BVH traversal: dense slab tests + t-ordered chunky gathers.

See accel/wide.py for the data structure and the design rationale.  The
algorithm per ray batch (all arrays (N, …), every op dense):

  1. slab-test ALL group AABBs: (N, G) — broadcast math, zero gathers;
  2. while any lane has a group with t_near < t_best:
       pick each lane's nearest unvisited group (masked argmin — VPU),
       gather that group's cluster-bounds block ((M, 6) ≈ 3 KB contiguous),
       slab-test (N, M) densely;
       while any lane has a cluster with t_near < t_best:
         pick nearest cluster, gather its packed-triangle block
         ((K, 9) ≈ 2.3 KB contiguous), run K Möller–Trumbore tests densely,
         update the lane's best hit.

The t-ordering + `t_near > t_best` cutoff makes the result exactly the
closest hit (equal to brute force), while visits stay near the optimal
front-to-back count.  Lanes idle (masked) when they run out of work; the
while loops exit when the whole batch is done — the batch-max divergence
cost applies to *cluster* visits (a handful per ray) instead of the binary
tree's hundreds of node visits, which is what makes this formulation fast
on a vector machine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

INF = 1e9


def _slab(o, d_inv, bmin, bmax, t_best):
    """Dense slab test. o/d_inv: (N, 1, 3); bmin/bmax: (N|1, B, 3).
    Returns t_near (N, B) with INF where missed (reference rule
    `path_trace.fs:562-563`: t_far > 0, t_far >= t_near, t_near < t_best)."""
    t0 = (bmin - o) * d_inv
    t1 = (bmax - o) * d_inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tf > 0) & (tf >= tn) & (tn < t_best[:, None])
    return jnp.where(hit, jnp.maximum(tn, 0.0), INF)


def _mt_block(o, d, tris, valid, t_best):
    """Dense Möller–Trumbore over a (N, K, 9) packed block; `valid` (N, K)
    masks padding slots (their degenerate all-zero triangles would
    otherwise alias a t=0 hit).  Returns per-lane best candidate
    (t = INF when none)."""
    v0 = tris[..., 0:3]
    e1 = tris[..., 3:6]
    e2 = tris[..., 6:9]
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
        valid
        & (u >= 0) & (v >= 0) & (1.0 - u - v >= 0)
        & (t >= 0) & (t < t_best[:, None])
    )
    t_cand = jnp.where(ok, t, INF)
    slot = jnp.argmin(t_cand, axis=1)
    n_idx = jnp.arange(o.shape[0])
    return t_cand[n_idx, slot], slot, u[n_idx, slot], v[n_idx, slot]


def _sort_keys(o, d, scene_min, scene_inv_extent):
    """Coherence sort key: direction octant (3 bits) then 7-bit-per-axis
    Morton code of the origin.  Sorting the batch by this key makes lanes
    in a chunk traverse similar node sequences, which collapses the
    batch-max iteration count toward the per-lane mean (the TPU analog of
    GPU ray-sorting for warp coherence; SURVEY.md §3.3 divergence note)."""
    oct_ = (
        (d[:, 0] < 0).astype(jnp.int32) * 4
        + (d[:, 1] < 0).astype(jnp.int32) * 2
        + (d[:, 2] < 0).astype(jnp.int32)
    )
    q = jnp.clip(((o - scene_min) * scene_inv_extent * 127.0), 0, 127).astype(jnp.int32)

    def spread(x):  # 7-bit → every 3rd bit
        x = (x | (x << 14)) & 0x70000F
        x = (x | (x << 6)) & 0x18C30C3
        x = (x | (x << 2)) & 0x9249249  # wide enough for 7 bits
        return x

    morton = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return (oct_ << 21) | (morton & 0x1FFFFF)


def chunked_wide_closest(
    o, d, active, group_bounds, cluster_bounds, packed_tris, tri_index,
    chunk_size: int = 8192,
):
    """Closest-hit in coherence-sorted fixed-size chunks via `lax.map`.

    Chunking bounds each while-loop's batch-max divergence to the chunk and
    shrinks the per-iteration gather working set; sorting makes chunks
    coherent so the max approaches the mean.  Exact same results as
    `wide_closest` (the sort is a permutation; each lane's traversal is
    independent)."""
    n = o.shape[0]
    if n <= chunk_size:
        return wide_closest(o, d, active, group_bounds, cluster_bounds, packed_tris, tri_index)
    pad = (-n) % chunk_size
    scene_min = group_bounds[:, :3].min(axis=0)
    scene_extent = group_bounds[:, 3:].max(axis=0) - scene_min
    inv_ext = 1.0 / jnp.maximum(scene_extent, 1e-12)
    key = _sort_keys(o, d, scene_min, inv_ext)
    key = jnp.where(active, key, 0x7FFFFFFF)  # park inactive lanes together
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)

    def pad_to(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)

    o_s = pad_to(o[perm])
    d_s = pad_to(d[perm], 1.0)
    a_s = pad_to(active[perm], False)
    nc = (n + pad) // chunk_size

    def body(args):
        oc, dc, ac = args
        return wide_closest(
            oc, dc, ac, group_bounds, cluster_bounds, packed_tris, tri_index
        )

    t, tri, u, v = jax.lax.map(
        body,
        (
            o_s.reshape(nc, chunk_size, 3),
            d_s.reshape(nc, chunk_size, 3),
            a_s.reshape(nc, chunk_size),
        ),
    )
    flat = lambda x: x.reshape(-1)[:n][inv_perm]
    return flat(t), flat(tri), flat(u), flat(v)


def chunked_wide_anyhit(
    o, d, t_max, active, group_bounds, cluster_bounds, packed_tris, tri_index,
    chunk_size: int = 8192,
):
    """Any-hit twin of `chunked_wide_closest`."""
    n = o.shape[0]
    if n <= chunk_size:
        return wide_anyhit(o, d, t_max, active, group_bounds, cluster_bounds, packed_tris, tri_index)
    pad = (-n) % chunk_size
    scene_min = group_bounds[:, :3].min(axis=0)
    scene_extent = group_bounds[:, 3:].max(axis=0) - scene_min
    inv_ext = 1.0 / jnp.maximum(scene_extent, 1e-12)
    key = _sort_keys(o, d, scene_min, inv_ext)
    key = jnp.where(active, key, 0x7FFFFFFF)
    perm = jnp.argsort(key)
    inv_perm = jnp.argsort(perm)

    def pad_to(x, fill=0):
        return jnp.concatenate([x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], 0)

    o_s = pad_to(o[perm])
    d_s = pad_to(d[perm], 1.0)
    a_s = pad_to(active[perm], False)
    t_s = pad_to(t_max[perm])
    nc = (n + pad) // chunk_size

    def body(args):
        oc, dc, tc, ac = args
        return wide_anyhit(
            oc, dc, tc, ac, group_bounds, cluster_bounds, packed_tris, tri_index
        )

    occ = jax.lax.map(
        body,
        (
            o_s.reshape(nc, chunk_size, 3),
            d_s.reshape(nc, chunk_size, 3),
            t_s.reshape(nc, chunk_size),
            a_s.reshape(nc, chunk_size),
        ),
    )
    return occ.reshape(-1)[:n][inv_perm]


@partial(jax.jit, static_argnames=())
def wide_closest(o, d, active, group_bounds, cluster_bounds, packed_tris, tri_index):
    """Closest-hit query. Returns (t, tri, u, v); tri = -1 on miss (global
    BVH-ordered triangle ids via tri_index)."""
    n = o.shape[0]
    g, m, _ = cluster_bounds.shape
    n_idx = jnp.arange(n)
    d_inv = 1.0 / d
    o3 = o[:, None, :]
    di3 = d_inv[:, None, :]

    t_best0 = jnp.where(active, INF, -INF)  # inactive lanes: nothing beats -inf
    tg = _slab(o3, di3, group_bounds[None, :, :3], group_bounds[None, :, 3:], t_best0)
    tg = jnp.where(active[:, None], tg, INF)

    def inner_cond(s):
        return jnp.any(jnp.min(s["tc"], axis=1) < s["t"])

    def inner_body(s):
        tc = s["tc"]
        c_sel = jnp.argmin(tc, axis=1)  # (N,)
        c_t = tc[n_idx, c_sel]
        lane = c_t < s["t"]
        tc = tc.at[n_idx, c_sel].set(INF)
        block = jnp.where(lane, s["gsel"] * m + c_sel, 0)
        tris = packed_tris[block]  # (N, K, 9) chunky gather
        tri_row = tri_index[block]  # (N, K)
        t_cand, slot, u, v = _mt_block(o, d, tris, tri_row >= 0, s["t"])
        better = lane & (t_cand < s["t"])
        tri = tri_row[n_idx, slot]
        ok = better & (tri >= 0)
        return dict(
            tc=tc,
            gsel=s["gsel"],
            t=jnp.where(ok, t_cand, s["t"]),
            tri=jnp.where(ok, tri, s["tri"]),
            u=jnp.where(ok, u, s["u"]),
            v=jnp.where(ok, v, s["v"]),
        )

    def outer_cond(s):
        return jnp.any(jnp.min(s["tg"], axis=1) < s["t"])

    def outer_body(s):
        tg = s["tg"]
        g_sel = jnp.argmin(tg, axis=1)
        g_t = tg[n_idx, g_sel]
        lane = g_t < s["t"]
        tg = tg.at[n_idx, g_sel].set(INF)
        cb = cluster_bounds[jnp.where(lane, g_sel, 0)]  # (N, M, 6) chunky gather
        tc = _slab(o3, di3, cb[..., :3], cb[..., 3:], jnp.where(lane, s["t"], -INF))
        inner = lax.while_loop(
            inner_cond,
            inner_body,
            dict(tc=tc, gsel=g_sel, t=s["t"], tri=s["tri"], u=s["u"], v=s["v"]),
        )
        return dict(
            tg=tg, t=inner["t"], tri=inner["tri"], u=inner["u"], v=inner["v"]
        )

    out = lax.while_loop(
        outer_cond,
        outer_body,
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


@partial(jax.jit, static_argnames=())
def wide_anyhit(o, d, t_max, active, group_bounds, cluster_bounds, packed_tris, tri_index):
    """Any-hit (shadow) query: occluded (N,) bool — lanes stop at the first
    confirmed hit in [0, t_max)."""
    n = o.shape[0]
    g, m, _ = cluster_bounds.shape
    n_idx = jnp.arange(n)
    d_inv = 1.0 / d
    o3 = o[:, None, :]
    di3 = d_inv[:, None, :]

    lim0 = jnp.where(active, t_max, -INF)
    tg = _slab(o3, di3, group_bounds[None, :, :3], group_bounds[None, :, 3:], lim0)
    tg = jnp.where(active[:, None], tg, INF)

    def inner_cond(s):
        live = ~s["occ"] & (jnp.min(s["tc"], axis=1) < s["lim"])
        return jnp.any(live)

    def inner_body(s):
        tc = s["tc"]
        c_sel = jnp.argmin(tc, axis=1)
        c_t = tc[n_idx, c_sel]
        lane = ~s["occ"] & (c_t < s["lim"])
        tc = tc.at[n_idx, c_sel].set(INF)
        block = jnp.where(lane, s["gsel"] * m + c_sel, 0)
        tris = packed_tris[block]
        tri_row = tri_index[block]
        t_cand, slot, _, _ = _mt_block(o, d, tris, tri_row >= 0, s["lim"])
        occ = s["occ"] | (lane & (t_cand < s["lim"]))
        return dict(tc=tc, gsel=s["gsel"], occ=occ, lim=s["lim"])

    def outer_cond(s):
        live = ~s["occ"] & (jnp.min(s["tg"], axis=1) < s["lim"])
        return jnp.any(live)

    def outer_body(s):
        tg = s["tg"]
        g_sel = jnp.argmin(tg, axis=1)
        g_t = tg[n_idx, g_sel]
        lane = ~s["occ"] & (g_t < s["lim"])
        tg = tg.at[n_idx, g_sel].set(INF)
        cb = cluster_bounds[jnp.where(lane, g_sel, 0)]
        tc = _slab(o3, di3, cb[..., :3], cb[..., 3:], jnp.where(lane, s["lim"], -INF))
        inner = lax.while_loop(
            inner_cond,
            inner_body,
            dict(tc=tc, gsel=g_sel, occ=s["occ"], lim=s["lim"]),
        )
        return dict(tg=tg, occ=inner["occ"], lim=s["lim"])

    out = lax.while_loop(
        outer_cond,
        outer_body,
        dict(tg=tg, occ=jnp.zeros(n, bool), lim=lim0),
    )
    return out["occ"]
