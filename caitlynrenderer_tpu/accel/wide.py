"""Super-wide two-level BVH — the TPU-native production accelerator.

Why this shape: the reference's binary-BVH stack traversal
(`/root/reference/Shader/path_trace.fs:511-667`) is a long sequence of
data-dependent 32-byte fetches; on TPU that runs at gather latency
(~100 MB/s effective) while dense vector math runs at TFLOP/s.  Profiling
(commit history) showed the per-node gather loop at 0.03 Mray/s.  The wide
design converts traversal into the operations TPUs are built for:

  level 0  — "groups":   ≤128 AABBs, tested DENSELY against every ray
             (a broadcast (N, G) slab test, no gathers at all);
  level 1  — "clusters": each group holds ≤128 cluster AABBs in one
             contiguous 3 KB block, fetched with a single chunky per-ray
             gather and tested densely (N, M);
  leaves   — each cluster holds ≤K packed triangles (v0, e1, e2
             precomputed) in one contiguous 3 KB block — one gather, one
             dense Möller–Trumbore batch.

Per-ray work is ordered by t_near (repeated masked argmin — a VPU reduce),
with the exact early-exit rule t_near > t_best, so results equal the
binary BVH / brute force exactly.  This is the same collapse idea as the
reference's CWBVH (`cwbvh.h`, 8-wide) pushed to the width where TPU vector
units saturate, with clusters cut from the binary SAH tree so triangle
blocks stay spatially coherent and contiguous (`sbvh.h:130-141` ordering).

Capacity: G ≤ 128 groups × M ≤ 128 clusters × K tris/cluster →
1M triangles at K=64; raise K for larger scenes (or nest another level).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from caitlynrenderer_tpu.accel.bvh import FlatBVH, build_bvh


class WideBVH(NamedTuple):
    """Flat arrays of the two-level wide BVH (all device-ready).

    group_bounds:   (G, 6) f32  — level-0 AABBs (dense-tested, resident)
    cluster_bounds: (G, M, 6) f32 — level-1 AABBs; empty slots = inverted box
    packed_tris:    (G*M, K, 9) f32 — per cluster: v0, e1, e2 per triangle
    tri_index:      (G*M, K) i32 — global (BVH-ordered) triangle id, -1 pad
    """

    group_bounds: np.ndarray
    cluster_bounds: np.ndarray
    packed_tris: np.ndarray
    tri_index: np.ndarray

    @property
    def shape(self):
        g, m, _ = self.cluster_bounds.shape
        k = self.tri_index.shape[1]
        return g, m, k


_EMPTY_MIN = 1e30
_EMPTY_MAX = -1e30


def _subtree_ranges(bvh: FlatBVH):
    """Per-node triangle range (start, count) — each subtree of the SAH
    builder owns a contiguous slice of the reordered triangle array."""
    n = bvh.num_nodes
    start = np.zeros(n, np.int64)
    count = np.zeros(n, np.int64)
    # Children (left, left+1) always have higher indices than the parent in
    # the BFS layout, so a reverse sweep sees children before parents.
    meta = bvh.node_meta
    leaf = bvh.is_leaf()
    for i in range(n - 1, -1, -1):
        if leaf[i]:
            start[i] = meta[i, 0]
            count[i] = meta[i, 1]
        else:
            l = meta[i, 0]
            start[i] = start[l]
            count[i] = count[l] + count[l + 1]
    return start, count


def _cut_clusters(bvh: FlatBVH, max_tris: int):
    """Cut the binary tree into subtrees of ≤ max_tris triangles, in DFS
    order (spatial coherence for grouping).  Returns list of
    (start, count, bmin, bmax)."""
    start, count = _subtree_ranges(bvh)
    meta = bvh.node_meta
    leaf = bvh.is_leaf()
    out = []
    stack = [0]
    while stack:
        i = stack.pop()
        if count[i] <= max_tris or leaf[i]:
            out.append(
                (int(start[i]), int(count[i]), bvh.node_bounds[i, :3], bvh.node_bounds[i, 3:])
            )
        else:
            l = meta[i, 0]
            stack.append(l + 1)
            stack.append(l)
    return out


def build_wide(
    vertices: np.ndarray,
    tri_v: np.ndarray,
    bvh: FlatBVH,
    cluster_tris: int = 64,
    max_m: int = 128,
    max_g: int = 128,
) -> WideBVH:
    """Build the wide BVH from an existing binary SAH tree.

    `tri_v` must already be in `bvh.tri_order` order (call after
    `accel.bvh.reorder_scene`).  Raises if the scene exceeds G*M*K
    capacity — raise `cluster_tris` for bigger scenes."""
    k = cluster_tris
    clusters = _cut_clusters(bvh, k)
    c = len(clusters)
    if c > max_m * max_g:
        raise ValueError(
            f"{c} clusters exceeds capacity {max_m}x{max_g}; "
            f"increase cluster_tris (= {k})"
        )
    # Groups of up to M consecutive (DFS-ordered) clusters.  Fill groups to
    # full width: a group visit costs one (M,6) block fetch + one dense
    # slab batch, so wide groups amortize the per-visit loop overhead and
    # keep G (and the (N, G) bookkeeping matrix) small.
    m = min(c, max_m)
    g = -(-c // m)

    group_bounds = np.empty((g, 6), np.float32)
    cluster_bounds = np.empty((g, m, 6), np.float32)
    cluster_bounds[..., :3] = _EMPTY_MIN
    cluster_bounds[..., 3:] = _EMPTY_MAX
    tri_index = np.full((g * m, k), -1, np.int32)

    for ci, (s, cnt, bmn, bmx) in enumerate(clusters):
        gi, mi = divmod(ci, m)
        cluster_bounds[gi, mi, :3] = bmn
        cluster_bounds[gi, mi, 3:] = bmx
        tri_index[ci, :cnt] = np.arange(s, s + cnt, dtype=np.int32)

    for gi in range(g):
        cb = cluster_bounds[gi]
        used = cb[:, 0] < _EMPTY_MIN
        group_bounds[gi, :3] = cb[used, :3].min(axis=0)
        group_bounds[gi, 3:] = cb[used, 3:].max(axis=0)

    # Packed triangles: v0, e1, e2 — padding slots get a degenerate
    # triangle at the origin (det = 0 → miss; tri_index = -1 masks anyway).
    idx = np.maximum(tri_index, 0).reshape(-1)
    vid = tri_v[idx]
    v0 = vertices[vid[:, 0]]
    e1 = vertices[vid[:, 1]] - v0
    e2 = vertices[vid[:, 2]] - v0
    packed = np.concatenate([v0, e1, e2], axis=1).astype(np.float32)
    packed[tri_index.reshape(-1) < 0] = 0.0
    packed_tris = packed.reshape(g * m, k, 9)

    return WideBVH(
        group_bounds=group_bounds,
        cluster_bounds=cluster_bounds,
        packed_tris=packed_tris,
        tri_index=tri_index.reshape(g * m, k),
    )
