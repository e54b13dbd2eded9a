"""Pallas TPU kernel: dense ray×triangle-slab Möller–Trumbore.

The hot op of the streaming traversal (ops/traverse_wide.py): every group
visit tests a whole ray chunk against a broadcast slab of S triangles.
The XLA version materializes (N, S) temporaries in HBM (~1 Gpair/s
measured); this kernel keeps everything in VMEM/registers — rays live as
(8, 128) vector tiles per component, the kernel loops over the S
triangles with scalar broadcasts from SMEM, and only the per-lane best
(t, slot, u, v) leaves the core.  Measured ~70 Gpairs/s (≈3 TF/s) on
TPU v5e — ~60× the fused-XLA slab.

Layout contract: the ray components are pre-tiled to (grid, 3, 8, 128)
ONCE per traversal query (the transpose costs more than the kernel; it is
loop-invariant across the traversal's group visits — see
`tile_rays` / `wide_closest`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9
TILE = 1024  # rays per grid program: (8, 128)


def tile_rays(o, d):
    """(N, 3) → (grid, 3, 8, 128) tiled component layout (N % 1024 == 0)."""
    n = o.shape[0]
    grid = n // TILE
    ot = jnp.transpose(o).reshape(3, grid, 8, 128).transpose(1, 0, 2, 3)
    dt = jnp.transpose(d).reshape(3, grid, 8, 128).transpose(1, 0, 2, 3)
    return ot, dt


def _kernel(tris_ref, o_ref, d_ref, tbest_ref, t_ref, slot_ref, u_ref, v_ref):
    ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]  # (8, 128)
    dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
    s_count = tris_ref.shape[0]

    def body(s, carry):
        best_t, best_slot, best_u, best_v = carry
        v0x = tris_ref[s, 0]
        v0y = tris_ref[s, 1]
        v0z = tris_ref[s, 2]
        e1x = tris_ref[s, 3]
        e1y = tris_ref[s, 4]
        e1z = tris_ref[s, 5]
        e2x = tris_ref[s, 6]
        e2y = tris_ref[s, 7]
        e2z = tris_ref[s, 8]

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
        ok = (
            (u >= 0.0) & (v >= 0.0) & (1.0 - u - v >= 0.0)
            & (t >= 0.0) & (t < best_t)
            # degenerate (all-zero padding) triangles have det == 0 exactly
            & (det != 0.0)
        )
        best_slot = jnp.where(ok, s, best_slot)
        best_u = jnp.where(ok, u, best_u)
        best_v = jnp.where(ok, v, best_v)
        best_t = jnp.where(ok, t, best_t)
        return best_t, best_slot, best_u, best_v

    init = (
        tbest_ref[0],
        jnp.full((8, 128), -1, jnp.int32),
        jnp.zeros((8, 128), jnp.float32),
        jnp.zeros((8, 128), jnp.float32),
    )
    best_t, best_slot, best_u, best_v = lax.fori_loop(0, s_count, body, init)
    t_ref[0] = best_t
    slot_ref[0] = best_slot
    u_ref[0] = best_u
    v_ref[0] = best_v


def mt_slab_pallas_tiled(o_tiled, d_tiled, tris, t_best):
    """Closest-candidate within a triangle slab, pre-tiled ray layout.

    o_tiled/d_tiled: (grid, 3, 8, 128) from `tile_rays`; tris: (S, 9) f32;
    t_best: (N,).  Returns (t, slot, u, v) per lane — the slab's nearest
    accepted candidate, exact (t = t_best, slot = -1 when none).
    """
    grid = o_tiled.shape[0]
    n = grid * TILE
    tb = t_best.reshape(grid, 8, 128)

    t, slot, u, v = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[
            # Slab in VMEM: scalar broadcasts from VMEM measured as fast as
            # SMEM (77 vs 70 Gpairs/s) and SMEM caps at ~1 MB (a batched
            # 2048-row slab overflows it).
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, 128), jnp.float32),
        ],
    )(tris, o_tiled, d_tiled, tb)
    return t.reshape(n), slot.reshape(n), u.reshape(n), v.reshape(n)


@partial(jax.jit, static_argnames=())
def mt_slab_pallas(o, d, tris, t_best):
    """Convenience wrapper: (N, 3) rays (N % 1024 == 0) → tiled → kernel.
    Prefer `tile_rays` + `mt_slab_pallas_tiled` in loops (the transpose is
    the expensive part)."""
    ot, dt = tile_rays(o, d)
    return mt_slab_pallas_tiled(ot, dt, tris, t_best)


def _pad_rays(o, d):
    n0 = o.shape[0]
    pad = (-n0) % TILE
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        d = jnp.concatenate([d, jnp.ones((pad, 3), d.dtype)])
    return o, d, n0


def brute_closest_pallas(o, d, active, tris9, t_max=INF):
    """Closest hit over ALL triangles as one dense Pallas sweep — the fast
    path for small scenes (no grouping/sorting machinery).  tris9: (T, 9)
    packed v0,e1,e2 in *scene* triangle order.  Returns (t, tri, u, v)."""
    o, d, n0 = _pad_rays(o, d)
    t_in = jnp.full(o.shape[0], -INF, jnp.float32)
    t_in = t_in.at[:n0].set(jnp.where(active, t_max, -INF))
    t, slot, u, v = mt_slab_pallas(o, d, tris9, t_in)
    t, slot, u, v = t[:n0], slot[:n0], u[:n0], v[:n0]
    miss = slot < 0
    return (
        jnp.where(miss, INF, t),
        jnp.where(miss, -1, slot).astype(jnp.int32),
        u,
        v,
    )


def brute_anyhit_pallas(o, d, t_max, active, tris9):
    """Any-hit twin of `brute_closest_pallas`: occluded (N,) bool."""
    o, d, n0 = _pad_rays(o, d)
    t_in = jnp.full(o.shape[0], -INF, jnp.float32)
    t_in = t_in.at[:n0].set(jnp.where(active, t_max, -INF))
    _, slot, _, _ = mt_slab_pallas(o, d, tris9, t_in)
    return (slot[:n0] >= 0) & active
