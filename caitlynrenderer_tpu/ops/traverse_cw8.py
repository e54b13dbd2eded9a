"""CWBVH traversal megakernel (Pallas TPU) — the 8-wide compressed walk.

The reference's flagship traversal is a per-fragment stack walk of the
node8 format (`/root/reference/Shader/cwbvh.fs:448-536` closest,
`:538-616` any-hit): pop a child, decode 8 quantized slabs with byte
tricks, descend front-to-back by octant, test leaf triangles inline.
This kernel is that algorithm re-architected for a vector core:

  * **Tile-consensus DFS.**  One walk per 128-ray tile (rays arrive
    coherence-sorted).  The stack lives in SMEM scalars; the 8-child
    quantized slab test of `bvh8_node_intersect` (`cwbvh.fs:376-446`)
    runs VECTORIZED over the 128 lanes — scale decode is the same
    `2^(e-127)` byte-exponent bitcast, per-lane acceptance is
    `tn < per-lane best t`, and a child is traversed if ANY live lane
    hits it.
  * **True front-to-back pop.**  Instead of the GLSL octant/slot XOR
    heuristic, each pushed group stores its 8 children's *consensus
    slab entry-t* (min over hitting lanes); pops take the smallest —
    exact front-to-back for the whole tile, and a popped child whose
    entry-t can no longer beat the tile's worst live bound is pruned
    without a fetch.
  * **Latency-hidden node fetches.**  On push, ONE async DMA copies the
    group's whole child block (node8s are allocated contiguously per
    parent — 3 rows of the 4-nodes-per-row table) into that stack
    level's VMEM slot; by the first pop of the new group the block has
    landed.  This replaces the per-fragment dependent texel fetch
    (`cwbvh.fs:484-488`) whose latency a TPU core cannot hide.
  * **MXU triangle sweeps.**  Leaf children index contiguous cwbvh-order
    triangles; hits are swept in 32-triangle Baldwin–Weber plane
    windows with the same banded-matmul acceptance as the wide
    megakernel (ops/traverse_mega.py) — the TPU substitute for the
    scalar Möller–Trumbore loop at `cwbvh.fs:508-518`.

Exactness matches the mega kernel: selection by Baldwin–Weber t, the
integrator re-derives (t, u, v) differentiably from the winning id.
The XLA gather-loop walk (ops/traverse_cwbvh.py) remains the non-TPU
fallback and the parity oracle.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caitlynrenderer_tpu.ops import traverse_mega as tm

INF = 1e9
TILE = 128
WIN = 32  # triangles per sweep window
STK = 24  # stack levels (node8 depth at 1M tris ≈ 10; build asserts ≤ 22)
NROWS = 8  # node rows per child-block DMA (one row per node8, ≤8 children)
CHUNK = 262144

_FORCE = os.environ.get("CW8_FORCE_KERNEL") == "1"


def _use_kernel():
    return jax.default_backend() == "tpu" or _FORCE


# ---------------------------------------------------------------------------
# Host packing
# ---------------------------------------------------------------------------


def pack_cw8(cw_nodes: np.ndarray, cw_tris: np.ndarray):
    """Device layouts for the Pallas walk.

    nodes1:   (N8p, 128) u32 — node i's 20 words in row i, cols 0-19
              (one row per node8: child blocks are contiguous rows, and
              the kernel's scalar word reads use a static lane index —
              Mosaic requires dynamic offsets to stay off the lane dim).
              Padded by NROWS rows so a trailing child block's fixed-size
              DMA stays in bounds.
    planes32: (W, 4, 128) f32 — Baldwin–Weber planes of cwbvh-order
              triangles in windows of 32 (cols [n 0:32 | u 32:64 |
              v 64:96 | zero 96:128 — VMEM lane-tiling pad], rows 0-2 =
              plane xyz, row 3 = offset; padding triangles get zero
              planes → NaN t → rejected).
    bounds:   (1, 6) f32 — scene bbox (sort + exit-clamp helper input).
    """
    n8 = cw_nodes.shape[0]
    nodes1 = np.zeros((n8 + NROWS, 128), np.uint32)
    nodes1[:n8, :20] = cw_nodes

    # The kernel's stack has STK levels (level 0 = virtual root); assert
    # the node8 tree fits with one spare (st_tmin writes at depth+1).
    if n8:
        frontier = np.array([0], np.int64)
        d8 = 0
        while frontier.size:
            d8 += 1
            im = ((cw_nodes[frontier, 3] >> 24) & 0xFF).astype(np.uint8)
            cnt = np.unpackbits(im[:, None], axis=1).sum(axis=1)
            cb = cw_nodes[frontier, 4].astype(np.int64)
            k = np.arange(8)
            nxt = (cb[:, None] + k[None, :])[k[None, :] < cnt[:, None]]
            frontier = nxt
        assert d8 <= STK - 2, f"node8 depth {d8} exceeds kernel stack {STK}"

    t = cw_tris.shape[0]
    tp = max(WIN, -(-t // WIN) * WIN)
    tris_p = np.zeros((tp, 9), np.float32)
    tris_p[:t] = cw_tris
    ids = np.where(np.arange(tp) < t, np.arange(tp), -1).astype(np.int32)
    # reuse the mega plane math on (W, 32, 9) blocks, then compact to the
    # kernel layout: drop the always-zero rows 4-7 and the 32→128 column
    # padding pack_mega inserts (its kp is fixed at 128).
    full = tm.pack_mega(tris_p.reshape(-1, WIN, 9), ids.reshape(-1, WIN))
    kp = full.shape[2] // 3
    planes32 = np.zeros((full.shape[0], 4, 128), np.float32)
    planes32[:, :, 0:WIN] = full[:, 0:4, 0:WIN]
    planes32[:, :, WIN : 2 * WIN] = full[:, 0:4, kp : kp + WIN]
    planes32[:, :, 2 * WIN : 3 * WIN] = full[:, 0:4, 2 * kp : 2 * kp + WIN]

    if t:
        p0 = cw_tris[:, 0:3]
        v1 = p0 + cw_tris[:, 3:6]
        v2 = p0 + cw_tris[:, 6:9]
        lo = np.minimum(np.minimum(p0, v1), v2).min(axis=0)
        hi = np.maximum(np.maximum(p0, v1), v2).max(axis=0)
    else:
        lo = np.zeros(3, np.float32)
        hi = np.ones(3, np.float32)
    bounds = np.concatenate([lo, hi]).astype(np.float32)[None, :]
    return nodes1, planes32, bounds


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _byte(w, i):
    return (w >> (8 * i)) & jnp.uint32(0xFF)


def _popcount8(x):
    """Scalar popcount of an 8-bit value (Mosaic has no scalar popcount)."""
    x = x.astype(jnp.uint32)
    c = x & jnp.uint32(1)
    for k in range(1, 8):
        c = c + ((x >> jnp.uint32(k)) & jnp.uint32(1))
    return c


def _make_kernel(n8p: int, nwin: int, anyhit: bool):
    def kernel(
        rays_cm_ref,  # (1, 8, 128) f32 [ox,oy,oz,dx,dy,dz,tlim,·]
        nodes_hbm,  # (N8p, 128) u32 ANY — one node8 per row
        planes_hbm,  # (W, 4, 128) f32 ANY (cols 96:128 zero pad)
        out_ref,  # (1, 8, 128) f32 (closest: t) / i32 (anyhit: hit)
        tri_out_ref,  # closest only: (1, 8, 128) i32
        od_ref,  # VMEM (8, 256) f32
        nring,  # VMEM (STK, NROWS, 128) u32
        sring,  # VMEM (1, 8, 128) f32
        bt_ref,  # VMEM (8, 128) f32 (row 0)
        aux_ref,  # VMEM (8, 128) i32 (row 0)
        nsem,  # DMA sem (STK,)
        ssem,  # DMA sem (1,)
        st_meta,  # SMEM (STK, 8) i32 [base, imask, hits, rowbase, waited]
        st_tmin,  # SMEM (STK, 8) f32
        scal,  # SMEM (4,) f32 [maxbt]
        icur,  # SMEM (4,) i32 [depth, last_win, sweeps, queue_count]
        wq,  # SMEM (32,) i32 — pending sweep-window queue
    ):
        rc = rays_cm_ref[0]
        tlim = rc[6:7, :]
        tile_live = jnp.max(tlim) > -INF

        def body():
            # --- per-lane ray constants
            def _dinv(a):
                da = rc[3 + a : 4 + a, :]
                da = jnp.where(
                    jnp.abs(da) < 1e-12,
                    jnp.where(da < 0, -1e-12, 1e-12),
                    da,
                )
                return 1.0 / da

            dinv = [_dinv(a) for a in range(3)]

            # --- od matrix for the window sweeps (single band, K=8):
            # cols 0:128 carry [o;1], cols 128:256 carry [d;0].
            od_ref[:, :] = jnp.zeros((8, 256), jnp.float32)
            od_ref[0:3, 0:128] = rc[0:3, :]
            od_ref[3:4, 0:128] = jnp.ones((1, 128), jnp.float32)
            od_ref[0:3, 128:256] = rc[3:6, :]
            sring[0] = jnp.zeros((8, 128), jnp.float32)

            bt_ref[0:1, :] = tlim
            aux_ref[0:1, :] = jnp.full((1, 128), -1, jnp.int32)
            scal[0] = jnp.max(tlim)
            icur[0] = 0  # depth
            icur[1] = -1  # last enqueued window
            icur[2] = 0  # sweep counter
            icur[3] = 0  # queued windows

            # DMA bookkeeping: st_meta[., 4] == 0 means this level has an
            # outstanding (started, un-waited) child-block copy.  Exactly
            # one can be outstanding per level (a level is re-pushed only
            # after its previous group exhausted, which waits below).
            for lvl in range(STK):
                st_meta[lvl, 4] = 1

            # --- virtual root group: one child = node 0 at base 0.
            st_meta[0, 0] = 0  # child_base
            st_meta[0, 1] = 1  # imask (slot 0 inner)
            st_meta[0, 2] = 1  # hits (slot 0 pending)
            st_meta[0, 3] = 0  # rowbase of the DMA'd block
            st_meta[0, 4] = 0  # outstanding
            st_tmin[0, 0] = 0.0
            pltpu.make_async_copy(
                nodes_hbm.at[pl.ds(0, NROWS)], nring.at[0], nsem.at[0]
            ).start()

            def sweep_window(w):
                """DMA window w's planes, banded-sweep all 128 lanes,
                update bt/tri/maxbt (mega acceptance with Kp=32)."""
                pltpu.make_async_copy(
                    planes_hbm.at[w], sring.at[0, pl.ds(0, 4)], ssem.at[0]
                ).start()
                pltpu.make_async_copy(
                    planes_hbm.at[w], sring.at[0, pl.ds(0, 4)], ssem.at[0]
                ).wait()
                r = lax.dot_general(
                    sring[0],  # (8, 128)
                    od_ref[:, :],  # (8, 256)
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,
                )  # (128, 256); rows 96+ are zero planes → NaN t → cut
                an = r[0:WIN, 0:128]
                bn = r[0:WIN, 128:256]
                au = r[WIN : 2 * WIN, 0:128]
                bu = r[WIN : 2 * WIN, 128:256]
                av = r[2 * WIN : 3 * WIN, 0:128]
                bv = r[2 * WIN : 3 * WIN, 128:256]
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
                else:
                    tmv = jnp.where(okm, t, INF)
                    vmin = jnp.min(tmv, axis=0, keepdims=True)
                    improved = vmin < bt
                    rid = lax.broadcasted_iota(jnp.int32, (WIN, 128), 0)
                    key = (
                        (pltpu.bitcast(tmv, jnp.int32) & jnp.int32(~0xFF)) | rid
                    )
                    kmin = jnp.min(key, axis=0, keepdims=True)
                    row = kmin & 0xFF
                    new_bt = jnp.where(improved, vmin, bt)
                    aux_ref[0:1, :] = jnp.where(
                        improved, w * WIN + row, aux_ref[0:1, :]
                    )
                bt_ref[0:1, :] = new_bt
                scal[0] = jnp.max(new_bt)
                icur[2] = icur[2] + 1

            def process_child(d_, bs):
                """Fetch the popped child node8, slab-test its 8 children
                over all lanes, sweep leaf windows, push inner hits."""
                base = st_meta[d_, 0]
                imask = st_meta[d_, 1]
                rowbase = st_meta[d_, 3]
                below = (jnp.uint32(1) << bs.astype(jnp.uint32)) - jnp.uint32(1)
                rel = _popcount8(imask.astype(jnp.uint32) & below)
                child = base + rel.astype(jnp.int32)

                @pl.when(st_meta[d_, 4] == 0)
                def _():
                    pltpu.make_async_copy(
                        nodes_hbm.at[pl.ds(0, NROWS)], nring.at[d_], nsem.at[d_]
                    ).wait()
                    st_meta[d_, 4] = 1

                row = child - rowbase
                wd = [nring[d_, row, k] for k in range(8)]
                qw = [nring[d_, row, 8 + k] for k in range(12)]
                # Mosaic only bitcasts vectors: broadcast the scalar words
                # to a lane row first (they are consumed in vector math).
                def _bc_f32(scalar_u32):
                    vec = jnp.broadcast_to(scalar_u32, (1, 128))
                    return pltpu.bitcast(vec, jnp.float32)

                p = [_bc_f32(wd[a]) for a in range(3)]
                scale = [
                    _bc_f32(_byte(wd[3], a) << jnp.uint32(23))
                    for a in range(3)
                ]
                imask_c = _byte(wd[3], 3)
                child_base = wd[4].astype(jnp.int32)
                tri_base = wd[5].astype(jnp.int32)

                adj_inv = [scale[a] * dinv[a] for a in range(3)]
                adj_org = [
                    (p[a] - rc[a : a + 1, :]) * dinv[a] for a in range(3)
                ]
                bt = bt_ref[0:1, :]

                hits_new = jnp.int32(0)
                for j in range(8):
                    half = j // 4
                    bidx = j % 4
                    meta_j = _byte(wd[6 + half], bidx)
                    is_inner = (meta_j & jnp.uint32(0b11000)) == jnp.uint32(
                        0b11000
                    )
                    is_leaf = jnp.logical_not(is_inner) & (
                        meta_j != jnp.uint32(0)
                    )
                    tn = None
                    tf = None
                    for a in range(3):
                        # u32 → i32 → f32 (Mosaic has no u32→f32 cast)
                        qlo = (
                            _byte(qw[4 * a + half], bidx)
                            .astype(jnp.int32)
                            .astype(jnp.float32)
                        )
                        qhi = (
                            _byte(qw[4 * a + 2 + half], bidx)
                            .astype(jnp.int32)
                            .astype(jnp.float32)
                        )
                        t0 = qlo * adj_inv[a] + adj_org[a]
                        t1 = qhi * adj_inv[a] + adj_org[a]
                        lo = jnp.minimum(t0, t1)
                        hi = jnp.maximum(t0, t1)
                        tn = lo if tn is None else jnp.maximum(tn, lo)
                        tf = hi if tf is None else jnp.minimum(tf, hi)
                    lane_hit = (tf > 0) & (tf >= tn) & (tn < bt)
                    anyh = jnp.any(lane_hit)
                    tminj = jnp.min(jnp.where(lane_hit, jnp.maximum(tn, 0.0), INF))

                    take_inner = anyh & is_inner
                    hits_new = hits_new | jnp.where(
                        take_inner, jnp.int32(1 << j), jnp.int32(0)
                    )
                    # tmin written unconditionally (cheap); only `hits_new`
                    # bits are ever read.
                    st_tmin[d_ + 1, j] = tminj

                    @pl.when(anyh & is_leaf)
                    def _(j=j, meta_j=meta_j, tri_base=tri_base):
                        # enqueue the leaf range's window(s); the drain
                        # below runs the (large) sweep code from ONE
                        # emission site — inlining it per child slot made
                        # Mosaic lowering pathologically slow.
                        cnt = _popcount8(meta_j >> jnp.uint32(5)).astype(
                            jnp.int32
                        )
                        off = (meta_j & jnp.uint32(0x1F)).astype(jnp.int32)
                        lo_t = tri_base + off
                        hi_t = lo_t + cnt - 1
                        w0 = lo_t // WIN
                        w1 = hi_t // WIN

                        @pl.when(w0 != icur[1])
                        def _():
                            icur[1] = w0
                            wq[icur[3]] = w0
                            icur[3] = icur[3] + 1

                        @pl.when(w1 != icur[1])
                        def _():
                            icur[1] = w1
                            wq[icur[3]] = w1
                            icur[3] = icur[3] + 1

                # drain the window queue (single sweep emission)
                def dr_cond(i):
                    return icur[3] > 0

                def dr_body(i):
                    icur[3] = icur[3] - 1
                    sweep_window(wq[icur[3]])
                    return i + 1

                lax.while_loop(dr_cond, dr_body, jnp.int32(0))

                @pl.when(hits_new != 0)
                def _():
                    nd = d_ + 1
                    rb = child_base
                    st_meta[nd, 0] = child_base
                    st_meta[nd, 1] = imask_c.astype(jnp.int32)
                    st_meta[nd, 2] = hits_new
                    st_meta[nd, 3] = rb
                    st_meta[nd, 4] = 0
                    icur[0] = nd
                    pltpu.make_async_copy(
                        nodes_hbm.at[pl.ds(rb, NROWS)],
                        nring.at[nd],
                        nsem.at[nd],
                    ).start()

            def w_cond(s):
                live = icur[0] >= 0
                if anyhit:
                    live = live & (scal[0] > -INF)
                return live

            def w_body(s):
                d_ = icur[0]
                hits = st_meta[d_, 2]

                @pl.when(hits == 0)
                def _():
                    # exhausted group: drop it.  Its child-block DMA was
                    # waited at first pop (or never started for the root's
                    # prefetch... the root block is always waited below).
                    @pl.when(st_meta[d_, 4] == 0)
                    def _():  # popped nothing: drain the in-flight DMA
                        pltpu.make_async_copy(
                            nodes_hbm.at[pl.ds(0, NROWS)],
                            nring.at[d_],
                            nsem.at[d_],
                        ).wait()
                        st_meta[d_, 4] = 1

                    icur[0] = d_ - 1

                @pl.when(hits != 0)
                def _():
                    # pop the front-most pending child (min consensus t)
                    bs = jnp.int32(0)
                    bv_ = jnp.float32(INF)
                    for j in range(8):
                        pend = ((hits >> j) & 1) == 1
                        tj = st_tmin[d_, j]
                        take = pend & (tj < bv_)
                        bs = jnp.where(take, j, bs)
                        bv_ = jnp.where(take, tj, bv_)
                    st_meta[d_, 2] = hits & ~(jnp.int32(1) << bs)

                    @pl.when(bv_ < scal[0])
                    def _():
                        process_child(d_, bs)

                return s + 1

            lax.while_loop(w_cond, w_body, jnp.int32(0))

            # drain in-flight child-block copies left by early exit
            # (anyhit full-occlusion, or pruned groups never popped)
            for lvl in range(STK):
                @pl.when(st_meta[lvl, 4] == 0)
                def _(lvl=lvl):
                    pltpu.make_async_copy(
                        nodes_hbm.at[pl.ds(0, NROWS)],
                        nring.at[lvl],
                        nsem.at[lvl],
                    ).wait()

            if anyhit:
                out_ref[0] = jnp.broadcast_to(
                    jnp.maximum(aux_ref[0:1, :], 0), (8, 128)
                )
            else:
                out_ref[0] = jnp.broadcast_to(bt_ref[0:1, :], (8, 128))
                tri_out_ref[0] = jnp.broadcast_to(aux_ref[0:1, :], (8, 128))

        @pl.when(tile_live)
        def _():
            body()

        @pl.when(jnp.logical_not(tile_live))
        def _():
            if anyhit:
                out_ref[0] = jnp.zeros((8, 128), jnp.int32)
            else:
                out_ref[0] = jnp.full((8, 128), -INF, jnp.float32)
                tri_out_ref[0] = jnp.full((8, 128), -1, jnp.int32)

    if anyhit:
        def kernel_any(rays_cm_ref, nodes_hbm, planes_hbm, out_ref, *scr):
            kernel(rays_cm_ref, nodes_hbm, planes_hbm, out_ref, None, *scr)

        return kernel_any
    return kernel


def _launch(o, d, t_lim, nodes4, planes32, anyhit=False):
    n = o.shape[0]
    n_sub = n // TILE
    n8p = nodes4.shape[0]
    nwin = planes32.shape[0]
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
    )
    kernel = _make_kernel(n8p, nwin, anyhit)
    sub_spec = pl.BlockSpec(
        (1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32)] if anyhit else [
        jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_sub, 8, 128), jnp.int32),
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_sub,),
        in_specs=[
            sub_spec,
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[sub_spec] * len(out_shape),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((8, 256), jnp.float32),  # od
            pltpu.VMEM((STK, NROWS, 128), jnp.uint32),  # node ring
            pltpu.VMEM((1, 8, 128), jnp.float32),  # sweep ring
            pltpu.VMEM((8, 128), jnp.float32),  # bt
            pltpu.VMEM((8, 128), jnp.int32),  # tri/hit
            pltpu.SemaphoreType.DMA((STK,)),
            pltpu.SemaphoreType.DMA((1,)),
            pltpu.SMEM((STK, 8), jnp.int32),
            pltpu.SMEM((STK, 8), jnp.float32),
            pltpu.SMEM((4,), jnp.float32),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SMEM((32,), jnp.int32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(rays_cm, nodes4, planes32)
    take = lambda x: x[:, 0, :].reshape(n_sub * TILE)
    return tuple(take(x) for x in outs)


def _query(o, d, t_lim, og, bounds, nodes4, planes32, anyhit=False):
    n = o.shape[0]
    t_lim = tm._scene_exit_bound(o, d, t_lim, bounds)
    order, inv, _ = tm._sort_order(o, d, t_lim, og, bounds)
    o, d, t_lim = o[order], d[order], t_lim[order]
    c = min(CHUNK, max(TILE, -(-n // TILE) * TILE))
    pad = (-n) % c
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
        t_lim = jnp.concatenate([t_lim, jnp.full(pad, -INF, jnp.float32)])
    if o.shape[0] == c:
        out = _launch(o, d, t_lim, nodes4, planes32, anyhit=anyhit)
    else:
        nc = o.shape[0] // c
        rs = lambda x: x.reshape((nc, c) + x.shape[1:])
        out = lax.map(
            lambda a: _launch(*a, nodes4, planes32, anyhit=anyhit),
            (rs(o), rs(d), rs(t_lim)),
        )
        out = tuple(x.reshape(-1) for x in out)
    return tuple(x[:n][inv] for x in out)


def cw8_closest(o, d, active, nodes4, planes32, cw_bounds, og=None):
    """Closest hit via the Pallas node8 walk.  Returns (t, tri, window) —
    tri = -1 on miss; window = winning 32-tri sweep window (the next
    bounce's coherence-sort hint, like the wide path's group)."""
    n = o.shape[0]
    if nodes4.shape[0] == 0:
        return (
            jnp.full(n, INF, jnp.float32),
            jnp.full(n, -1, jnp.int32),
            jnp.full(n, -1, jnp.int32),
        )
    if og is None:
        og = jnp.zeros(n, jnp.int32)
    t_lim = jnp.where(active, jnp.float32(INF), jnp.float32(-INF))
    t, tri = _query(o, d, t_lim, og, cw_bounds, nodes4, planes32)
    t = jnp.where(tri >= 0, t, INF)
    return t, tri, jnp.where(tri >= 0, tri // WIN, -1)


def cw8_anyhit(o, d, t_max, active, nodes4, planes32, cw_bounds, og=None):
    n = o.shape[0]
    if nodes4.shape[0] == 0:
        return jnp.zeros(n, bool)
    if og is None:
        og = jnp.zeros(n, jnp.int32)
    t_lim = jnp.where(active, t_max, -INF)
    (hit,) = _query(
        o, d, t_lim, og, cw_bounds, nodes4, planes32, anyhit=True
    )
    return hit > 0
