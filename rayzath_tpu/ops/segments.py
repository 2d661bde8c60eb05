"""Host-side build of the two-level traversal structure (NumPy).

This is the TPU-native equivalent of the reference's TLAS-over-instances +
BLAS-per-mesh acceleration (RayZath/cuda_bvh.cuh:30-111 TLAS flatten,
cuda_instance.cu:17-226 per-mesh BLAS flatten): shared object-space geometry,
per-instance transforms, no duplication. The decomposition differs from the
reference to fit the TPU's memory hierarchy:

* Each unique mesh's triangle BVH (the BLAS) is **cut into segments** of at
  most ``seg_nodes`` nodes — subtrees re-flattened into self-contained packet
  row blocks ([n, 128] f32 rows, the layout of ops/traverse_packet) with
  LOCAL skip links. A segment is the DMA granule: small enough to stream
  HBM -> VMEM in one async copy, big enough to amortize the transfer. Scenes
  whose total rows fit VMEM skip streaming and index the row table directly.
* A **TLAS is built over (instance x segment) units**: each unit's AABB is
  the instance transform applied to the segment's object-space AABB. The
  TLAS therefore subsumes both the reference's instance BVH and the top
  levels of large meshes' triangle BVHs, and it is always VMEM-resident.
* A **unit table** carries, per unit, the world->object transform, the
  segment's row base/count, and the instance id — one 128-lane row each, so
  the kernel reads a unit with a single scalar dynamic-slice.

Build heuristics (mean-centroid split, max-variance axis, leaf sizes 8/4,
depth <= 31) stay those of the reference (bvh_tree_node.hpp:117-215);
segmenting only regroups already-built subtrees.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .bvh import FlatBVH, build_bvh, compute_skip_links
from .traverse_packet import (ROW, LEAF, L_MIN, L_MAX, L_LINK, L_AUX,
                              L_V0, L_E1, L_E2)

SEG_NODES = 512     # max BLAS nodes per segment (DMA granule: 256 KB of rows)
L_SLOT = 102        # mesh-local material slot of the 8 leaf triangles
TLAS_LEAF = 4       # reference instance BVH leaf size (bvh.hpp:29-53)
L_UNIT = 22         # unit ids in a TLAS leaf row (up to 8 lanes)

# unit-table row lane layout
U_AINV = 0          # world->object linear part, row-major 3x3 (lanes 0..8)
U_BINV = 9          # world->object offset (lanes 9..11): o' = A @ o + b
U_BASE = 12         # absolute first row of the segment in the global row table
U_COUNT = 13        # segment node count (walk exits at local index >= count)
U_INST = 14         # instance id


def subtree_sizes(node_begin: np.ndarray, node_count: np.ndarray) -> np.ndarray:
    """Node count of every subtree. Children are allocated after their parent
    (ops/bvh.py build order), so one reverse sweep suffices."""
    n = len(node_begin)
    size = np.ones(n, np.int64)
    for i in range(n - 1, -1, -1):
        if node_count[i] == 0:  # inner: children at begin, begin+1
            size[i] += size[node_begin[i]] + size[node_begin[i] + 1]
    return size


def cut_segments(bvh: FlatBVH, seg_nodes: int = SEG_NODES) -> list[int]:
    """Greedy subtree cut: the maximal subtrees with <= seg_nodes nodes.
    Returns the global indices of the segment roots (disjoint subtrees that
    cover every leaf)."""
    size = subtree_sizes(bvh.node_begin, bvh.node_count)
    roots: list[int] = []
    stack = [0]
    while stack:
        g = stack.pop()
        if size[g] <= seg_nodes:
            roots.append(g)
        else:
            c = bvh.node_begin[g]
            stack.append(c + 1)
            stack.append(c)
    return roots


def _flatten_subtree(bvh: FlatBVH, root: int):
    """Re-flatten a subtree with local indices, preserving the builder's
    invariants (children adjacent, parents precede children). Returns local
    (node_min, node_max, node_begin, node_count, node_axis); leaf ``begin``
    stays the MESH-local triangle index."""
    lmin, lmax, lbegin, lcount, laxis = [], [], [], [], []

    def alloc(g: int) -> int:
        lmin.append(bvh.node_min[g])
        lmax.append(bvh.node_max[g])
        lbegin.append(int(bvh.node_begin[g]))
        lcount.append(int(bvh.node_count[g]))
        laxis.append(int(bvh.node_axis[g]))
        return len(lbegin) - 1

    def build(g: int, l: int) -> None:
        if bvh.node_count[g] > 0:
            return
        c = int(bvh.node_begin[g])
        lc = alloc(c)
        alloc(c + 1)
        lbegin[l] = lc
        build(c, lc)
        build(c + 1, lc + 1)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        build(root, alloc(root))
    finally:
        sys.setrecursionlimit(old)
    return (np.asarray(lmin, np.float32), np.asarray(lmax, np.float32),
            np.asarray(lbegin, np.int32), np.asarray(lcount, np.int32),
            np.asarray(laxis, np.int32))


def _segment_rows(lmin, lmax, lbegin, lcount, laxis,
                  tri_v0, tri_e1, tri_e2, tri_slot, tri_base: int):
    """Packet rows for one segment: AABBs, LOCAL per-octant skip links
    (sentinel = local node count), leaf triangle blocks (object space),
    GLOBAL triangle ids at L_AUX, material slots at L_SLOT."""
    n = len(lbegin)
    first8, skip8 = compute_skip_links(lbegin, lcount, laxis)
    leaf = lcount > 0
    tab = np.zeros((n, ROW), np.float32)
    tab[:, L_MIN:L_MIN + 3] = lmin
    tab[:, L_MAX:L_MAX + 3] = lmax
    for o in range(8):
        tab[:, L_LINK + 2 * o] = np.where(leaf, -1.0, first8[o].astype(np.float32))
        tab[:, L_LINK + 2 * o + 1] = skip8[o].astype(np.float32)

    k = np.arange(LEAF)
    tid = lbegin.astype(np.int64)[:, None] + k[None, :]          # mesh-local
    valid = leaf[:, None] & (k[None, :] < lcount[:, None])
    n_tri = len(tri_v0)
    tid_c = np.clip(tid, 0, max(n_tri - 1, 0))
    for base, arr in ((L_V0, tri_v0), (L_E1, tri_e1), (L_E2, tri_e2)):
        for a in range(3):
            tab[:, base + 8 * a:base + 8 * a + 8] = np.where(
                valid, arr[tid_c, a], 0.0)
    tab[:, L_AUX:L_AUX + 8] = np.where(
        valid, (tid_c + tri_base).astype(np.float32), -1.0)
    tab[:, L_SLOT:L_SLOT + 8] = np.where(
        valid, tri_slot[tid_c].astype(np.float32), 0.0)
    return tab


@dataclass
class SegmentedBLAS:
    """One mesh's BLAS, segmented. ``order`` reorders the mesh's triangles
    into leaf order (apply to every shading array before use)."""
    rows: np.ndarray       # [total_nodes, 128] f32, segments packed densely
    seg_base: np.ndarray   # [S] first row of each segment (into ``rows``)
    seg_count: np.ndarray  # [S] node count of each segment
    seg_min: np.ndarray    # [S,3] object-space segment AABB
    seg_max: np.ndarray    # [S,3]
    order: np.ndarray      # [P] triangle permutation (new -> old)


def build_segmented_blas(tri_v0, tri_e1, tri_e2, tri_slot, tri_base: int,
                         seg_nodes: int = SEG_NODES,
                         leaf_size: int = 8) -> SegmentedBLAS:
    """Build one mesh's segmented BLAS from object-space triangles (original
    order). ``tri_base`` offsets the stored global triangle ids."""
    tri_v0 = np.asarray(tri_v0, np.float32)
    tri_e1 = np.asarray(tri_e1, np.float32)
    tri_e2 = np.asarray(tri_e2, np.float32)
    tri_slot = np.asarray(tri_slot, np.int32)
    v1 = tri_v0 + tri_e1
    v2 = tri_v0 + tri_e2
    pmin = np.minimum(np.minimum(tri_v0, v1), v2)
    pmax = np.maximum(np.maximum(tri_v0, v1), v2)
    bvh = build_bvh(pmin, pmax, leaf_size=leaf_size)
    o = bvh.order
    tri_v0, tri_e1, tri_e2, tri_slot = tri_v0[o], tri_e1[o], tri_e2[o], tri_slot[o]

    roots = cut_segments(bvh, seg_nodes)
    rows_list, base_list, count_list, min_list, max_list = [], [], [], [], []
    base = 0
    for g in roots:
        local = _flatten_subtree(bvh, g)
        tab = _segment_rows(*local, tri_v0, tri_e1, tri_e2, tri_slot, tri_base)
        rows_list.append(tab)
        base_list.append(base)
        count_list.append(len(tab))
        min_list.append(bvh.node_min[g])
        max_list.append(bvh.node_max[g])
        base += len(tab)
    return SegmentedBLAS(
        rows=np.concatenate(rows_list, axis=0),
        seg_base=np.asarray(base_list, np.int32),
        seg_count=np.asarray(count_list, np.int32),
        seg_min=np.asarray(min_list, np.float32),
        seg_max=np.asarray(max_list, np.float32),
        order=o,
    )


def transform_matrices(tr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(A_fwd[3,4], A_inv[3,4], N[3,3]) for a hostmath Transform:
    world = A_fwd[:, :3] @ obj + A_fwd[:, 3]; obj = A_inv[:, :3] @ world
    + A_inv[:, 3]; world normal ∝ N @ obj normal (reference normals_l2g
    semantics: divide by scale then rotate, render_parts.cpp:110-114)."""
    rot = np.asarray(tr.rot, np.float64)
    scale = np.asarray(tr.scale, np.float64)
    pos = np.asarray(tr.position, np.float64)
    s_safe = np.where(np.abs(scale) < 1e-20, 1e-20, scale)
    a_fwd = rot * scale[None, :]                    # rot @ diag(scale)
    a_inv_lin = (1.0 / s_safe)[:, None] * rot.T     # diag(1/s) @ rot.T
    b_inv = -a_inv_lin @ pos
    n_mat = rot * (np.sign(s_safe) / np.maximum(np.abs(s_safe), 1e-20))[None, :]
    fwd = np.concatenate([a_fwd, pos[:, None]], axis=1)
    inv = np.concatenate([a_inv_lin, b_inv[:, None]], axis=1)
    return (fwd.astype(np.float32), inv.astype(np.float32),
            n_mat.astype(np.float32))


def unit_world_aabb(a_fwd: np.ndarray, seg_min: np.ndarray, seg_max: np.ndarray):
    """World AABB of object-space boxes [S,3] under world = A@p + b
    (transform the 8 corners; reference Instance::calculateBoundingBox,
    instance.cpp:117-156)."""
    corners = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"),
                       axis=-1).reshape(8, 3)                    # [8,3] of 0/1
    pts = seg_min[:, None, :] * (1 - corners)[None] + seg_max[:, None, :] * corners[None]
    w = pts @ a_fwd[:, :3].T + a_fwd[:, 3]                        # [S,8,3]
    return w.min(axis=1).astype(np.float32), w.max(axis=1).astype(np.float32)


def build_unit_table(inv_rows: np.ndarray, seg_base: np.ndarray,
                     seg_count: np.ndarray, inst_ids: np.ndarray) -> np.ndarray:
    """[U, 128] unit rows: per (instance x segment) unit, the world->object
    transform (12 lanes), the segment's absolute row base and node count, and
    the instance id. inv_rows: [U, 3, 4]."""
    u = len(seg_base)
    tab = np.zeros((max(u, 1), ROW), np.float32)
    if u == 0:
        return tab
    lin = inv_rows[:, :, :3].reshape(u, 9)
    tab[:, U_AINV:U_AINV + 9] = lin
    tab[:, U_BINV:U_BINV + 3] = inv_rows[:, :, 3]
    tab[:, U_BASE] = seg_base.astype(np.float32)
    tab[:, U_COUNT] = seg_count.astype(np.float32)
    tab[:, U_INST] = inst_ids.astype(np.float32)
    return tab


def build_tlas_rows(unit_min: np.ndarray, unit_max: np.ndarray,
                    leaf_size: int = TLAS_LEAF) -> np.ndarray:
    """[TN, 128] TLAS rows over unit world AABBs: AABB + per-octant skip
    links (layout of ops/traverse_packet) + up to 8 unit ids at L_UNIT
    (-1 pad). The flatten mirrors the reference TLAS (cuda_bvh.cuh:30-111)
    with the skip-link ordering the packet walk wants."""
    u = len(unit_min)
    if u == 0:
        tab = np.zeros((1, ROW), np.float32)
        tab[:, L_UNIT:L_UNIT + 8] = -1.0
        # a unit-less leaf whose skip link exits the walk immediately
        for o in range(8):
            tab[:, L_LINK + 2 * o] = -1.0
            tab[:, L_LINK + 2 * o + 1] = 1.0
        return tab
    bvh = build_bvh(unit_min, unit_max, leaf_size=leaf_size)
    assert int(bvh.node_count.max()) <= 8, "TLAS leaf exceeded 8 units"
    first8, skip8 = compute_skip_links(bvh.node_begin, bvh.node_count,
                                       bvh.node_axis)
    n = bvh.n_nodes
    leaf = bvh.node_count > 0
    tab = np.zeros((n, ROW), np.float32)
    tab[:, L_MIN:L_MIN + 3] = bvh.node_min
    tab[:, L_MAX:L_MAX + 3] = bvh.node_max
    for o in range(8):
        tab[:, L_LINK + 2 * o] = np.where(leaf, -1.0, first8[o].astype(np.float32))
        tab[:, L_LINK + 2 * o + 1] = skip8[o].astype(np.float32)
    k = np.arange(8)
    uid = bvh.node_begin.astype(np.int64)[:, None] + k[None, :]
    valid = leaf[:, None] & (k[None, :] < bvh.node_count[:, None])
    uid_c = np.clip(uid, 0, u - 1)
    tab[:, L_UNIT:L_UNIT + 8] = np.where(
        valid, bvh.order[uid_c].astype(np.float32), -1.0)
    return tab
