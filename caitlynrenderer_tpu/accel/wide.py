"""Streaming wide BVH — the TPU-native production accelerator.

Design history (numbers from the commit log, all measured on TPU v5e):

* binary-BVH per-node gathers: 0.03 Mray/s — XLA gathers are latency-bound
  (~11 GB/s effective for 2.3 KB rows, measured), so any traversal that
  fetches per-lane data every step starves.
* two-level gathered clusters: better constants, same wall.

This version is built around what the hardware actually does fast: dense
vector math over broadcast data.  The structure is a single level of
"groups" — contiguous cuts of the binary SAH tree, each owning up to Kg
triangles packed into one dense block:

  group_bounds: (G, 6)      — G ≤ 1024 AABBs, slab-tested DENSELY against
                               every ray: an (N, G) broadcast op, no gathers
  packed_tris:  (G, Kg, 9)  — per group: v0, e1, e2 rows, padded
  tri_index:    (G, Kg)     — global (BVH-ordered) triangle id, -1 pad

Traversal (ops/traverse_wide.py) visits groups in global front-to-back
order with the exact `t_near ≥ t_best` cutoff; a visit streams the
group's triangle block through the whole ray chunk as fixed slabs —
one `dynamic_slice` per slab (sequential DMA at bandwidth), dense masked
Möller–Trumbore on every lane.  Rays trade ~10× more (cheap, dense)
intersection FLOPs for zero gather latency — the same bet the reference's
CWBVH makes at width 8 for GPU warps (`cwbvh.h`), pushed to the width
where a TPU's vector units stay saturated.

Capacity: G ≤ 1024 × Kg → 1M triangles at Kg=1024; raise Kg beyond.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from caitlynrenderer_tpu.accel.bvh import FlatBVH, build_bvh


class WideBVH(NamedTuple):
    """Flat arrays of the streaming wide BVH (all device-ready)."""

    group_bounds: np.ndarray  # (G, 6) f32
    packed_tris: np.ndarray  # (G, Kg, 9) f32
    tri_index: np.ndarray  # (G, Kg) i32

    @property
    def shape(self):
        g, kg, _ = self.packed_tris.shape
        return g, kg


def _subtree_ranges(bvh: FlatBVH):
    """Per-node triangle range (start, count) — each subtree of the SAH
    builder owns a contiguous slice of the reordered triangle array.

    Vectorized fixpoint sweep: children sit at higher BFS indices than
    their parent, so `depth` passes of a dense gather+select converge
    (loop exits at the fixpoint)."""
    meta = bvh.node_meta
    leaf = bvh.is_leaf()
    left = np.where(leaf, 0, meta[:, 0])
    start = np.where(leaf, meta[:, 0], 0).astype(np.int64)
    count = np.where(leaf, meta[:, 1], 0).astype(np.int64)
    for _ in range(256):
        new_start = np.where(leaf, start, start[left])
        new_count = np.where(leaf, count, count[left] + count[left + 1])
        if (new_count == count).all() and (new_start == start).all():
            break
        start, count = new_start, new_count
    return start, count


def _cut_groups(bvh: FlatBVH, max_tris: int):
    """Cut the binary tree into subtrees of ≤ max_tris triangles, in DFS
    order (spatially coherent, contiguous leaf ranges).  Returns
    (start, count, bmin, bmax) arrays."""
    start, count = _subtree_ranges(bvh)
    meta = bvh.node_meta
    leaf = bvh.is_leaf()
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if count[i] <= max_tris or leaf[i]:
            out.append(i)
        else:
            l = meta[i, 0]
            stack.append(l + 1)
            stack.append(l)
    ids = np.asarray(out, np.int64)
    return (
        start[ids].astype(np.int32),
        count[ids].astype(np.int32),
        bvh.node_bounds[ids, :3],
        bvh.node_bounds[ids, 3:],
    )


def build_wide(
    vertices: np.ndarray,
    tri_v: np.ndarray,
    bvh: FlatBVH,
    group_tris: int = 256,
    max_g: int = 65536,
) -> WideBVH:
    """Build the streaming wide BVH from an existing binary SAH tree.

    `tri_v` must already be in `bvh.tri_order` order (call after
    `accel.bvh.reorder_scene`).  Raises if the scene exceeds G*Kg
    capacity — raise `group_tris` for bigger scenes."""
    # The kernel streams blocks in 256-triangle slabs (traverse_wide.SLAB);
    # keep the block a multiple of that above one slab.
    kg = group_tris if group_tris <= 256 else -(-group_tris // 256) * 256
    starts, counts, bmns, bmxs = _cut_groups(bvh, kg)
    g = len(starts)
    if g > max_g:
        raise ValueError(
            f"{g} groups exceeds capacity {max_g}; increase group_tris (= {kg})"
        )

    group_bounds = np.concatenate([bmns, bmxs], axis=1).astype(np.float32)

    # tri_index[gi, j] = starts[gi] + j for j < counts[gi], else -1.
    j = np.arange(kg, dtype=np.int32)[None, :]
    tri_index = np.where(j < counts[:, None], starts[:, None] + j, -1)

    # Packed triangles: v0, e1, e2 — padding slots get a degenerate
    # all-zero triangle (masked by tri_index < 0 in the kernel anyway).
    idx = np.maximum(tri_index, 0).reshape(-1)
    vid = tri_v[idx]
    v0 = vertices[vid[:, 0]]
    e1 = vertices[vid[:, 1]] - v0
    e2 = vertices[vid[:, 2]] - v0
    packed = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)
    packed[tri_index.reshape(-1) < 0] = 0.0

    return WideBVH(
        group_bounds=group_bounds,
        packed_tris=packed.reshape(g, kg, 9),
        tri_index=tri_index.astype(np.int32),
    )
