"""CWBVH builder — 8-wide compressed BVH (Ylitie/Karras/Aila 2017 family).

Produces nodes bit-exact to the reference's `node8` texture layout so the
traversal kernel mirrors a known-good decode (`/root/reference/Shader/
cwbvh.fs:355-446` is the layout spec; the reference's own builder
`cwbvh.h` is WIP with known defects — dropped slot assignment at
`cwbvh.h:257`, mis-nested recursion + dangling reference at
`cwbvh.h:296-410` — so this builder is written fresh from the format's
intent, per SURVEY.md §2.9).

Node = 20 uint32 words (5 vec4 texels):
  [0:3]   p.xyz — f32 quantization origin (node AABB min)
  [3]     e_x | e_y<<8 | e_z<<16 | imask<<24 — per-axis scale exponent
          bytes (value = 2^(e-127)) and the inner-child mask
  [4]     child_base — index of the first child node8
  [5]     tri_base — index of the first triangle of this node's leaves
  [6:8]   meta bytes, children 0-3 / 4-7:
            empty: 0
            inner: 0b001_00000 | (24 + slot)
            leaf:  unary-count<<5 | first-tri-offset (≤3 tris, offset ≤ 24)
  [8:10]  q_lo_x children 0-3 / 4-7   [10:12] q_hi_x
  [12:14] q_lo_y / q_hi_y             [16:20] likewise z (lo, hi)

Children are assigned to slots by the octant heuristic (the intent of
`order_children`, `cwbvh.h:206-272`): child k prefers the slot whose
octant direction best matches the child-centroid direction, so the
traversal's `slot ^ oct_inv` pop order approximates front-to-back.
"""

from __future__ import annotations

from collections import deque
from typing import List, NamedTuple

import numpy as np

from caitlynrenderer_tpu.accel.bvh import FlatBVH

MAX_LEAF_TRIS = 3
WIDTH = 8


class CWBVH(NamedTuple):
    nodes: np.ndarray  # (N8, 20) uint32
    tri_order: np.ndarray  # gather list into the input triangle array


def _subtree_info(bvh: FlatBVH):
    from caitlynrenderer_tpu.accel.wide import _subtree_ranges

    start, count = _subtree_ranges(bvh)
    return start, count, bvh.is_leaf()


def _collect_children(bvh: FlatBVH, node: int, count):
    """Collapse: expand the binary subtree under `node` into ≤8 entries,
    splitting the largest-count expandable entry first (the greedy stand-in
    for the reference's 7-slot DP, `cwbvh.h:75-173`)."""
    meta = bvh.node_meta
    leaf = bvh.is_leaf()
    frontier: List[int] = [int(meta[node, 0]), int(meta[node, 0]) + 1]
    while len(frontier) < WIDTH:
        # pick the expandable entry with the most triangles
        best, best_cnt = -1, MAX_LEAF_TRIS
        for idx, e in enumerate(frontier):
            if not leaf[e] and count[e] > best_cnt:
                best, best_cnt = idx, count[e]
        # also allow expanding any non-leaf if we still have room and some
        # entry must become inner anyway
        if best == -1:
            for idx, e in enumerate(frontier):
                if not leaf[e]:
                    best = idx
                    break
        if best == -1:
            break
        e = frontier.pop(best)
        frontier.extend([int(meta[e, 0]), int(meta[e, 0]) + 1])
    return frontier


def _slot_assign(child_centroids, parent_centroid):
    """Greedy octant slot assignment (intent of `order_children`,
    `cwbvh.h:206-272`): slot s has direction (±1,±1,±1) from its bits;
    assign each child the best-matching free slot."""
    k = len(child_centroids)
    dirs = np.array(
        [
            [1 if (s & 4) == 0 else -1, 1 if (s & 2) == 0 else -1, 1 if (s & 1) == 0 else -1]
            for s in range(WIDTH)
        ],
        np.float32,
    )
    # cost[c, s] = -dot(centroid_dir_c, dir_s)  (lower is better)
    rel = child_centroids - parent_centroid[None, :]
    cost = -rel @ dirs.T  # (k, 8)
    slots = np.full(k, -1, np.int32)
    used = np.zeros(WIDTH, bool)
    order = np.argsort(cost.min(axis=1))  # most constrained first
    for c in order:
        for s in np.argsort(cost[c]):
            if not used[s]:
                slots[c] = s
                used[s] = True
                break
    return slots


def build_cwbvh(bvh: FlatBVH, vertices: np.ndarray, tri_v: np.ndarray) -> CWBVH:
    """Compress a binary FlatBVH into the 8-wide node8 array.

    `tri_v` must be in `bvh` leaf order (after reorder_scene); the returned
    `tri_order` is a further gather list (node-contiguous leaf triangles).
    The binary tree must have leaves of ≤ 3 triangles (the format's unary
    count is 3 bits with max offset 24) — build with max_leaf <= 3.
    """
    assert bvh.node_meta[bvh.is_leaf(), 1].max(initial=0) <= MAX_LEAF_TRIS, (
        "cwbvh requires a binary BVH built with max_leaf <= 3"
    )
    start, count, leaf = _subtree_info(bvh)
    bounds = bvh.node_bounds

    nodes: List[np.ndarray] = []
    tri_order: List[int] = []

    node_entries = {}  # node8 idx -> (entries, slots, is_leaf_child, ...)

    def reserve(node: int) -> int:
        idx = len(nodes)
        nodes.append(np.zeros(20, np.uint32))
        node_entries[idx] = node
        return idx

    root8 = reserve(0)
    work = deque([root8])
    while work:
        my_idx = work.popleft()
        node = node_entries[my_idx]

        if leaf[node] or count[node] <= MAX_LEAF_TRIS:
            entries = [node]
        else:
            entries = _collect_children(bvh, node, count)

        ent_bounds = bounds[entries]
        cent = (ent_bounds[:, :3] + ent_bounds[:, 3:]) * 0.5
        parent_cent = (bounds[node, :3] + bounds[node, 3:]) * 0.5
        slots = _slot_assign(cent, parent_cent)

        p = bounds[node, :3].astype(np.float32)
        extent = np.maximum(bounds[node, 3:] - p, 1e-12)
        e = np.ceil(np.log2(extent / 255.0)).astype(np.int32) + 127
        e = np.clip(e, 1, 254)
        scale = np.exp2((e - 127).astype(np.float64))

        is_leaf_child = [bool(leaf[en] or count[en] <= MAX_LEAF_TRIS) for en in entries]

        tri_base = len(tri_order)
        meta = np.zeros(WIDTH, np.uint32)
        q_lo = np.zeros((WIDTH, 3), np.uint32)
        q_hi = np.zeros((WIDTH, 3), np.uint32)
        imask = 0
        tri_offset = 0
        inner_entries = []
        for en, s, isl in zip(entries, slots, is_leaf_child):
            blo = bounds[en, :3]
            bhi = bounds[en, 3:]
            q_lo[s] = np.clip(np.floor((blo - p) / scale), 0, 255).astype(np.uint32)
            q_hi[s] = np.clip(np.ceil((bhi - p) / scale), 0, 255).astype(np.uint32)
            if isl:
                cnt = int(count[en])
                unary = (1 << cnt) - 1
                meta[s] = np.uint32((unary << 5) | tri_offset)
                for t in range(int(start[en]), int(start[en]) + cnt):
                    tri_order.append(t)
                tri_offset += cnt
            else:
                imask |= 1 << s
                inner_entries.append((s, en))

        inner_entries.sort(key=lambda x: x[0])
        child_base = len(nodes)
        for s, en in inner_entries:
            meta[s] = np.uint32(0x20 | (24 + s))
            work.append(reserve(en))

        w = nodes[my_idx]
        w[0:3] = np.frombuffer(p.astype("<f4").tobytes(), np.uint32)
        w[3] = np.uint32(int(e[0]) | (int(e[1]) << 8) | (int(e[2]) << 16) | (imask << 24))
        w[4] = np.uint32(child_base if inner_entries else 0)
        w[5] = np.uint32(tri_base)
        w[6] = np.uint32(meta[0] | (meta[1] << 8) | (meta[2] << 16) | (meta[3] << 24))
        w[7] = np.uint32(meta[4] | (meta[5] << 8) | (meta[6] << 16) | (meta[7] << 24))

        def pack4(vals):
            return np.uint32(
                int(vals[0]) | (int(vals[1]) << 8) | (int(vals[2]) << 16) | (int(vals[3]) << 24)
            )

        for axis, base in ((0, 8), (1, 12), (2, 16)):
            w[base + 0] = pack4(q_lo[0:4, axis])
            w[base + 1] = pack4(q_lo[4:8, axis])
            w[base + 2] = pack4(q_hi[0:4, axis])
            w[base + 3] = pack4(q_hi[4:8, axis])

    return CWBVH(
        nodes=np.stack(nodes).astype(np.uint32),
        tri_order=np.asarray(tri_order, np.int32),
    )
