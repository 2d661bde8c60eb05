"""World -> device scene compilation (SoA JAX arrays).

This is the TPU-native replacement for the reference's per-object device mirror
(RayZath/cuda_world.cu:28-121, cuda_object_container.cuh:42-150). Instead of
pointer-linked device objects chunk-copied through pinned memory, the whole scene
is flattened host-side (NumPy) into static-shape SoA arrays and uploaded as one
pytree whenever the world's content version changes.

TPU-first design decisions (vs the reference's two-level pointer BVH):

* **World-space triangle soup.** Each instance's mesh is pre-transformed into
  world space (positions by TRS, normals by inverse-transpose — the semantics of
  reference ``Transformation::transformL2G``) and concatenated into one global
  triangle array carrying a *global* material id (instance material slots
  resolved at compile time, reference cuda_instance.cuh:234) and an instance id
  (for picking). This turns the reference's TLAS-over-instances +
  BLAS-per-mesh traversal (cuda_bvh.cuh:114-171 + cuda_instance.cuh:35-91) into
  ONE flattened BVH traversal with zero per-ray transforms and no material
  indirection — pure SoA gathers, which is what the TPU VPU wants.
* **Texture atlases.** All color maps (textures + normal maps) are shelf-packed
  into one RGBA atlas; scalar maps (metalness/roughness/emission) into a scalar
  atlas. Per-map UV transform/filter/address-mode live in small tables, so one
  vectorized fetch kernel serves every map (reference TextureBuffer fetch,
  render_parts.hpp:209-221).
* **Materials as a table.** Index 0 is the world ("sky") material, index 1 the
  default surface material, then user materials — so a ray's current medium is
  just an int32 (the reference keeps raw ``Material*`` in the ray,
  cuda_render_parts.cuh:924-947).
"""
from __future__ import annotations

import warnings
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from ..ops.bvh import build_bvh, compute_skip_links, triangle_aabbs, FlatBVH
from ..ops.traverse import build_aabb_links
from ..ops.intersect import triangle_frames
from ..utils.hostmath import normalize as nrm, transform_matrices
from .material import Material
from .texture import TextureMap
from .world import World

WORLD_MATERIAL_ID = 0
DEFAULT_MATERIAL_ID = 1
NO_MAP = -1


@struct.dataclass
class DeviceScene:
    # geometry (world space), padded to n_tri_pad
    tri_v0: jnp.ndarray      # [F,3]
    tri_e1: jnp.ndarray      # [F,3]
    tri_e2: jnp.ndarray      # [F,3]
    tri_n0: jnp.ndarray      # [F,3] per-vertex world normals (flat fallback baked)
    tri_n1: jnp.ndarray
    tri_n2: jnp.ndarray
    tri_t0: jnp.ndarray      # [F,2]
    tri_t1: jnp.ndarray
    tri_t2: jnp.ndarray
    tri_mat: jnp.ndarray     # [F] i32 global material id
    tri_inst: jnp.ndarray    # [F] i32 instance id (picking)
    tri_pw: jnp.ndarray      # [3,3F] projection frames (ops/intersect.py)
    tri_pc: jnp.ndarray      # [3F] projection offsets

    # flattened BVH over world-space triangles, as the stackless traversal
    # tables of ops/traverse.py: aabb_links [8, 8N] (per-octant AABB + skip
    # links) plus leaf ranges for the in-jit leaf-block table
    aabb_links: jnp.ndarray   # [8, 8N] f32
    node_begin: jnp.ndarray   # [N] i32
    node_count: jnp.ndarray   # [N] i32 (0 = inner)

    # materials SoA (0=world/sky, 1=default)
    mat_color: jnp.ndarray       # [M,4] rgba (alpha: 1=opaque)
    mat_metalness: jnp.ndarray   # [M]
    mat_roughness: jnp.ndarray   # [M]
    mat_emission: jnp.ndarray    # [M]
    mat_ior: jnp.ndarray         # [M]
    mat_scattering: jnp.ndarray  # [M]
    mat_maps: jnp.ndarray        # [M,5] i32: texture, normal, metalness, roughness, emission (-1 none)

    # texture atlases + per-map tables
    color_atlas: jnp.ndarray   # [Hc,Wc,4]
    scalar_atlas: jnp.ndarray  # [Hs,Ws]
    map_rect: jnp.ndarray      # [K,4] i32: y0,x0,h,w
    map_flags: jnp.ndarray     # [K,3] i32: filter, address, atlas(0=color,1=scalar)
    map_uv: jnp.ndarray        # [K,5] f32: scale_x, scale_y, rotation, trans_x, trans_y

    # lights
    spot_pos: jnp.ndarray        # [S,3]
    spot_dir: jnp.ndarray        # [S,3]
    spot_color: jnp.ndarray      # [S,3]
    spot_size: jnp.ndarray       # [S]
    spot_emission: jnp.ndarray   # [S]
    spot_cos_angle: jnp.ndarray  # [S]
    dir_dir: jnp.ndarray         # [D,3]
    dir_color: jnp.ndarray       # [D,3]
    dir_emission: jnp.ndarray    # [D]
    dir_cos: jnp.ndarray         # [D]

    # two-level (TLAS/BLAS) structure — present only when two_level is True
    # (reference TLAS + per-mesh BLAS, cuda_bvh.cuh:114-171 +
    # cuda_instance.cuh:35-264; shared object-space meshes, no duplication).
    # In this mode tri_* hold OBJECT-space per-mesh geometry and the soup
    # traversal fields above are inert dummies.
    # texture-alpha shadow filtering (reference cuda_instance.cuh:92-164 /
    # cuda_material.cuh:86-95: per-hit shadow factor = opacityColor *
    # textureOpacity — multiplicative, so the traversal kernels contribute the
    # constant material part and this dense "cutout" set (triangles whose
    # material has a color texture AND alpha < 1) contributes the texture
    # part; see integrator.texture_shadow_factor). World space in both modes.
    # static 2x2 bilinear block-index tables (ops/texture.block_indices):
    # one row gather replaces the 4 corner gathers of a bilinear fetch
    col_blk_idx: Any = None    # [Hc*Wc, 4] i32
    sc_blk_idx: Any = None     # [Hs*Ws, 4] i32

    cut_pw: Any = None        # [3,3C] projection frames
    cut_pc: Any = None        # [3C]
    cut_v0: Any = None        # [C,3] raw geometry (oracle's independent MT)
    cut_e1: Any = None
    cut_e2: Any = None
    cut_t0: Any = None        # [C,2] texcrds
    cut_t1: Any = None
    cut_t2: Any = None
    cut_map: Any = None       # [C] i32 texture map id

    # all per-hit shading attributes in ONE row, so resolving a hit costs a
    # single [R]-row gather instead of ~12 (measured 3.4 ms per 512^2 gather
    # from a 65k-row table — separate gathers dominated bounce_step).
    # cols: v0 0:3 | e1 3:6 | e2 6:9 | n0 9:12 | n1 12:15 | n2 15:18 |
    #       t0 18:20 | t1 20:22 | t2 22:24 | mat-or-slot 24 | inst 25
    tri_pack: Any = None      # [F,32] f32

    # flat cluster-traversal tables (ops/traverse_cluster.py): BVH leaves of
    # ~128 triangles visited front-to-back as MXU-dense blocks — the fast
    # soup path for scenes past the brute-force sweet spot (None when tiny)
    cl_box: Any = None        # [8,Cp] lane-major cluster AABB table
    cl_lw: Any = None         # [C,4,384] cluster projection frames
    cl_order: Any = None      # [T] i32 cluster order -> soup index
    cl_base: Any = None       # [C] i32 cluster triangle base (cluster order)
    cl_count: Any = None      # [C] i32 cluster triangle count

    # two-level unit tables (ops/traverse_cluster.py instanced variant):
    # units = (instance x object-space mesh cluster) with world AABBs;
    # cl_lw/cl_base/cl_count above hold the SHARED per-mesh cluster frames
    # (object space) in this mode
    ti_box: Any = None          # [8,Ip] lane-major instance world AABB table
    ti_rows: Any = None         # [Ip,24] instance rows (AABB+inv+cl range)
    cl_obox: Any = None         # [Cm,8] object-space cluster scalar rows
    cl_slot: Any = None         # [Cm,ct] per-cluster triangle slot rows (f32)
    inst_fwd: Any = None        # [I,12] object->world 3x4 (row-major)
    inst_nrm: Any = None        # [I,9] normal matrix 3x3 (row-major)
    inst_slot_map: Any = None   # [I,64] i32 material slot -> global mat id
    tri_slot: Any = None        # [F] i32 mesh-local material slot
    exp_tri: Any = None         # [K] i32 expanded (instance,tri) -> tri
    exp_inst: Any = None        # [K] i32 expanded (instance,tri) -> instance

    # static metadata (not traced)
    n_triangles: int = struct.field(pytree_node=False, default=0)
    n_materials: int = struct.field(pytree_node=False, default=2)
    n_spot_lights: int = struct.field(pytree_node=False, default=0)
    n_direct_lights: int = struct.field(pytree_node=False, default=0)
    n_instances: int = struct.field(pytree_node=False, default=0)
    has_maps: bool = struct.field(pytree_node=False, default=False)
    # which of (texture, normal, metalness, roughness, emission) any material
    # actually references — static, so material_fetch skips whole atlas
    # fetches for absent kinds (each costs an [R]-row gather per bounce)
    map_kinds_used: tuple = struct.field(pytree_node=False,
                                         default=(False,) * 5)
    n_cutout: int = struct.field(pytree_node=False, default=0)
    two_level: bool = struct.field(pytree_node=False, default=False)
    # REAL cluster count (cluster tables are 128-bucket padded; padded rows
    # are never-visited) — drives the ray-sort heuristic, not the shapes
    n_clusters: int = struct.field(pytree_node=False, default=0)
    # two-level: max REAL clusters of any instance's mesh (static; selects
    # the instanced kernels' serial vs ranked inner sweep)
    max_ncl: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class DeviceCamera:
    position: jnp.ndarray    # [3]
    rot: jnp.ndarray         # [3,3] columns = axes
    fov: jnp.ndarray         # scalar
    near_far: jnp.ndarray    # [2]
    focal_distance: jnp.ndarray
    aperture: jnp.ndarray
    exposure_time: jnp.ndarray
    width: int = struct.field(pytree_node=False, default=1280)
    height: int = struct.field(pytree_node=False, default=720)


def compile_camera(cam) -> DeviceCamera:
    return DeviceCamera(
        position=jnp.asarray(cam.position, jnp.float32),
        rot=jnp.asarray(cam.coord_system(), jnp.float32),
        fov=jnp.float32(cam.fov),
        near_far=jnp.asarray(cam.near_far, jnp.float32),
        focal_distance=jnp.float32(cam.focal_distance),
        aperture=jnp.float32(cam.aperture),
        exposure_time=jnp.float32(cam.exposure_time),
        width=cam.width,
        height=cam.height,
    )


# ---------------------------------------------------------------------------
# atlas packing
# ---------------------------------------------------------------------------

def _pack_shelf(maps: list[TextureMap], channels: int):
    """Shelf-pack maps into one atlas. Returns (atlas HxWxC, rects [K,4])."""
    if not maps:
        atlas = np.zeros((8, 8, channels), np.float32)
        return atlas, np.zeros((0, 4), np.int32)
    max_w = max(max(m.width for m in maps), 8)
    atlas_w = 1 << int(np.ceil(np.log2(max_w)))
    rows: list[dict] = []
    rects = []
    y_cursor = 0
    for m in sorted(range(len(maps)), key=lambda i: -maps[i].height):
        tex = maps[m]
        placed = False
        for row in rows:
            if row["x"] + tex.width <= atlas_w and tex.height <= row["h"]:
                rects.append((m, row["y"], row["x"], tex.height, tex.width))
                row["x"] += tex.width
                placed = True
                break
        if not placed:
            rows.append({"y": y_cursor, "x": tex.width, "h": tex.height})
            rects.append((m, y_cursor, 0, tex.height, tex.width))
            y_cursor += tex.height
    atlas_h = max(y_cursor, 8)
    atlas = np.zeros((atlas_h, atlas_w, channels), np.float32)
    out = np.zeros((len(maps), 4), np.int32)
    for m, y0, x0, h, w in rects:
        data = maps[m].data
        atlas[y0:y0 + h, x0:x0 + w, :] = data[:, :, :channels]
        out[m] = (y0, x0, h, w)
    return atlas, out


# ---------------------------------------------------------------------------
# world compilation
# ---------------------------------------------------------------------------

def _pack_tri_rows(v0, e1, e2, n0, n1, n2, t0, t1, t2, mat_or_slot, inst):
    """[F,32] packed per-triangle shading row (DeviceScene.tri_pack):
    v0 0:3 | e1 3:6 | e2 6:9 | n0 9:12 | n1 12:15 | n2 15:18 | t0 18:20 |
    t1 20:22 | t2 22:24 | mat-or-slot 24 | inst 25 | pad 26:32. One gather
    of this row resolves a hit's whole shading frame."""
    f = len(v0)
    return np.concatenate([
        v0, e1, e2, n0, n1, n2, t0, t1, t2,
        np.asarray(mat_or_slot, np.float32).reshape(f, 1),
        np.asarray(inst, np.float32).reshape(f, 1),
        np.zeros((f, 6), np.float32)], axis=1).astype(np.float32)


def _pad_rows(a: np.ndarray, n: int, fill=0.0) -> np.ndarray:
    if len(a) >= n:
        return a[:n]
    pad = np.full((n - len(a),) + a.shape[1:], fill, a.dtype)
    return np.concatenate([a, pad], axis=0)


def _bucket(n: int, lo: int = 8) -> int:
    """Smallest 2^k or 1.5 * 2^k >= n (>= lo): 8, 16, 24, 32, 48, 64, 96...

    Padded array sizes quantize to these buckets so an edit that adds or
    removes a few triangles/clusters keeps every device shape — and with it
    the whole jit cache — stable (reference analog: the CUDA mirror reuses
    its allocations, cuda_object_container.cuh:42-150; here the shapes ARE
    the allocation)."""
    import math
    if n <= lo:
        return lo
    k = 2 ** int(math.floor(math.log2(n)))
    for c in (k, k * 3 // 2, k * 2):
        if c >= n:
            return c
    return k * 2


def _chain_key(inst):
    ks = []
    g = inst.group
    while g is not None:
        ks.append((id(g), getattr(g, "version", 0)))
        g = g.parent
    return tuple(ks)


def _geometry_key(world: World, leaf_size: int):
    """Cache key covering everything the flattened world-space geometry
    depends on: instance identity/version (includes transform + material
    slot edits), mesh identity/version, and the group chain versions."""
    parts = []
    for inst in world.instances:
        m = inst.mesh
        parts.append((id(inst), getattr(inst, "version", 0), id(m),
                      getattr(m, "version", 0) if m is not None else -1,
                      m.triangle_count if m is not None else 0,
                      _chain_key(inst)))
    return ("soup_geo", leaf_size, tuple(parts))


def _mesh_object_arrays(mesh):
    """Object-space SoA shading arrays for one mesh (original triangle order):
    (v0, e1, e2, n0, n1, n2, t0, t1, t2, slot)."""
    v = np.asarray(mesh.vertices, np.float32)
    v0 = v[mesh.tri_v[:, 0]]
    v1 = v[mesh.tri_v[:, 1]]
    v2 = v[mesh.tri_v[:, 2]]
    flat = nrm(np.cross(v1 - v0, v2 - v0)).astype(np.float32)
    if len(mesh.normals):
        on = nrm(np.asarray(mesh.normals, np.float32))

        def vtx_normal(col):
            idx = mesh.tri_n[:, col]
            ok = idx >= 0
            out = flat.copy()
            out[ok] = on[idx[ok]]
            return out
        n0, n1, n2 = vtx_normal(0), vtx_normal(1), vtx_normal(2)
    else:
        n0 = n1 = n2 = flat
    if len(mesh.texcrds):
        def vtx_uv(col):
            idx = mesh.tri_t[:, col]
            ok = idx >= 0
            out = np.zeros((len(idx), 2), np.float32)
            out[ok] = np.asarray(mesh.texcrds, np.float32)[idx[ok]]
            return out
        t0, t1, t2 = vtx_uv(0), vtx_uv(1), vtx_uv(2)
    else:
        t0 = t1 = t2 = np.zeros((len(v0), 2), np.float32)
    slot = np.clip(np.asarray(mesh.tri_mat, np.int64), 0, 63).astype(np.int32)
    return v0, v1 - v0, v2 - v0, n0, n1, n2, t0, t1, t2, slot




def _resolve_mat(mat_index: dict, mat, inst_name: str) -> int:
    """Material slot -> global id, warning on dangling references (a material
    never added to — or already destroyed from — the world renders with the
    default material, reference Observer-invalidation semantics)."""
    mid = mat_index.get(id(mat))
    if mid is None:
        warnings.warn(
            f"instance {inst_name!r} references material "
            f"{getattr(mat, 'name', '?')!r} that is not in the world; "
            "substituting the default material", RuntimeWarning)
        return DEFAULT_MATERIAL_ID
    return mid


def _aabb_l2g(fwd, cmin, cmax):
    """World AABBs of object-space boxes under a 3x4 transform, vectorized
    over boxes ([C,3] each): per output axis, sum the per-input-axis
    min/max of L_ij * {cmin_j, cmax_j} (exact for affine transforms)."""
    lin = fwd[:, :3]
    m1 = cmin[:, None, :] * lin[None, :, :]
    m2 = cmax[:, None, :] * lin[None, :, :]
    lo = np.minimum(m1, m2).sum(-1) + fwd[:, 3]
    hi = np.maximum(m1, m2).sum(-1) + fwd[:, 3]
    return lo.astype(np.float32), hi.astype(np.float32)


def _mesh_cluster_block(m, cache: Optional[dict]):
    """Object-space cluster tables + reordered shading arrays for one mesh,
    memoized by (id, version): a transform-or-material edit re-uses every
    untouched mesh's BLAS build (reference per-object re-mirror)."""
    key = ("mesh_cl", id(m), getattr(m, "version", 0))
    if cache is not None:
        hit = cache.get(key)
        if hit is not None:
            return hit
    from ..ops.traverse_cluster import (build_cluster_tables, B_MIN, B_MAX)
    v0, e1, e2, n0, n1, n2, t0, t1, t2, slot = _mesh_object_arrays(m)
    box_m, frames_m, order_m, base_m, count_m = build_cluster_tables(v0, e1, e2)
    o = order_m
    c = int((count_m > 0).sum())   # REAL clusters (tables are 128-padded)
    value = dict(
        arrays=tuple(a[o] for a in (v0, e1, e2, n0, n1, n2, t0, t1, t2)),
        slot=slot[o], frames=frames_m, base=base_m, count=count_m,
        cmin=box_m[B_MIN:B_MIN + 3, :c].T.copy(),
        cmax=box_m[B_MAX:B_MAX + 3, :c].T.copy(),
        obox6=box_m.T[:, :6].copy(),   # padded rows (inverted pad boxes)
        ref=m)
    if cache is not None:
        for stale in [k2 for k2 in cache
                      if isinstance(k2, tuple) and k2[0] == "mesh_cl"
                      and k2[1] == id(m) and k2 != key]:
            del cache[stale]
        cache[key] = value
    return value


def _two_level_arrays(world: World, mat_index: dict,
                      cache: Optional[dict] = None) -> dict:
    """Two-level geometry: shared per-mesh object-space cluster tables +
    per-instance transforms + flat unit table over (instance x cluster).
    The non-duplicating counterpart of the world-space soup (reference
    TLAS/BLAS semantics, cuda_bvh.cuh:114-171 + cuda_instance.cuh:167-264,
    mapped onto the cluster traversal of ops/traverse_cluster.py)."""
    from ..ops.traverse_cluster import (build_instance_tables,
                                        cluster_slot_rows,
                                        B_MIN, B_MAX, B_BASE, B_CNT)
    meshes: list = []
    mesh_pos: dict[int, int] = {}
    valid: list[tuple[int, Any]] = []
    for gi, inst in enumerate(world.instances):
        m = inst.mesh
        if m is None or m.triangle_count == 0:
            continue
        if id(m) not in mesh_pos:
            mesh_pos[id(m)] = len(meshes)
            meshes.append(m)
        valid.append((gi, inst))

    arrays = [[] for _ in range(9)]
    slots = []
    frames_parts, base_parts, count_parts, obox_parts = [], [], [], []
    mesh_cmin, mesh_cmax = [], []        # REAL object-space boxes per mesh
    mesh_slot_base: list[int] = []       # first global cluster slot per mesh
    mesh_ncl: list[int] = []             # real cluster count per mesh
    mesh_tri_base: list[int] = []
    tri_base = 0
    slot_base = 0
    for m in meshes:
        blk = _mesh_cluster_block(m, cache)
        for lst, arr in zip(arrays, blk["arrays"]):
            lst.append(arr)
        slots.append(blk["slot"])
        frames_parts.append(blk["frames"])
        base_parts.append(blk["base"] + tri_base)
        count_parts.append(blk["count"])
        obox_parts.append(blk["obox6"])
        mesh_cmin.append(blk["cmin"])
        mesh_cmax.append(blk["cmax"])
        mesh_slot_base.append(slot_base)
        mesh_ncl.append(len(blk["cmin"]))
        mesh_tri_base.append(tri_base)
        slot_base += len(blk["base"])    # padded length: concat offsets
        tri_base += len(blk["arrays"][0])

    n_inst_total = len(world.instances)
    inst_fwd = np.tile(np.eye(3, 4, dtype=np.float32).reshape(1, 12),
                       (max(n_inst_total, 1), 1))
    inst_nrm = np.tile(np.eye(3, dtype=np.float32).reshape(1, 9),
                       (max(n_inst_total, 1), 1))
    inst_slot_map = np.full((max(n_inst_total, 1), 64), DEFAULT_MATERIAL_ID,
                            np.int32)

    i_min, i_max, i_inv, i_cl0, i_ncl, i_gid = ([] for _ in range(6))
    exp_tri_parts, exp_inst_parts = [], []
    for gi, inst in valid:
        mi = mesh_pos[id(inst.mesh)]
        fwd, inv, nmat = transform_matrices(inst.effective_transform())
        inst_fwd[gi] = fwd.reshape(12)
        inst_nrm[gi] = nmat.reshape(9)
        for s_, mat in enumerate(inst.materials[:64]):
            if mat is not None:
                inst_slot_map[gi, s_] = _resolve_mat(mat_index, mat,
                                                     inst.name)
        cmin, cmax = mesh_cmin[mi], mesh_cmax[mi]
        # world AABB of the whole instance = union of its transformed
        # cluster boxes (vectorized; exact for affine transforms)
        wmin, wmax = _aabb_l2g(fwd, cmin, cmax)
        i_min.append(wmin.min(0))
        i_max.append(wmax.max(0))
        i_inv.append(inv)
        i_cl0.append(mesh_slot_base[mi])
        i_ncl.append(len(cmin))
        i_gid.append(gi)
        ntri = inst.mesh.triangle_count
        exp_tri_parts.append(np.arange(ntri, dtype=np.int32)
                             + mesh_tri_base[mi])
        exp_inst_parts.append(np.full(ntri, gi, np.int32))

    if i_cl0:
        ti_box, ti_rows = build_instance_tables(
            np.asarray(i_min, np.float32), np.asarray(i_max, np.float32),
            np.asarray(i_inv, np.float32), np.asarray(i_cl0, np.int32),
            np.asarray(i_ncl, np.int32), np.asarray(i_gid, np.int32))
        exp_tri = np.concatenate(exp_tri_parts)
        exp_inst = np.concatenate(exp_inst_parts)
        cl_lw = np.concatenate(frames_parts)
        cl_base = np.concatenate(base_parts)
        cl_count = np.concatenate(count_parts)
        cl_obox = np.zeros((len(cl_base), 8), np.float32)
        cl_obox[:, :6] = np.concatenate(obox_parts)
        cl_obox[:, B_BASE] = cl_base.astype(np.float32)
        cl_obox[:, B_CNT] = cl_count.astype(np.float32)
    else:
        ti_box, ti_rows = build_instance_tables(
            np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32),
            np.zeros((0, 3, 4), np.float32), np.zeros(0, np.int32),
            np.zeros(0, np.int32), np.zeros(0, np.int32))
        exp_tri = np.zeros(1, np.int32)
        exp_inst = np.zeros(1, np.int32)
        cl_lw = np.zeros((1, 4, 384), np.float32)
        cl_base = np.zeros(1, np.int32)
        cl_count = np.zeros(1, np.int32)
        cl_obox = np.zeros((1, 8), np.float32)
        cl_obox[:, B_MIN:B_MIN + 3] = 3e38
        cl_obox[:, B_MAX:B_MAX + 3] = -3e38

    if tri_base:
        tri_v0, tri_e1, tri_e2, tri_n0, tri_n1, tri_n2, tri_t0, tri_t1, tri_t2 = (
            np.concatenate(a) for a in arrays)
        tri_slot = np.concatenate(slots)
    else:
        tri_v0 = tri_e1 = tri_e2 = np.zeros((0, 3), np.float32)
        tri_n0 = tri_n1 = tri_n2 = np.zeros((0, 3), np.float32)
        tri_t0 = tri_t1 = tri_t2 = np.zeros((0, 2), np.float32)
        tri_slot = np.zeros(0, np.int32)

    n_tri = tri_base
    n_tri_pad = _bucket(n_tri)
    geo = dict(
        tri_v0=jnp.asarray(_pad_rows(tri_v0, n_tri_pad, 1e30)),
        tri_e1=jnp.asarray(_pad_rows(tri_e1, n_tri_pad, 0.0)),
        tri_e2=jnp.asarray(_pad_rows(tri_e2, n_tri_pad, 0.0)),
        tri_n0=jnp.asarray(_pad_rows(tri_n0, n_tri_pad, 0.0)),
        tri_n1=jnp.asarray(_pad_rows(tri_n1, n_tri_pad, 0.0)),
        tri_n2=jnp.asarray(_pad_rows(tri_n2, n_tri_pad, 0.0)),
        tri_t0=jnp.asarray(_pad_rows(tri_t0, n_tri_pad, 0.0)),
        tri_t1=jnp.asarray(_pad_rows(tri_t1, n_tri_pad, 0.0)),
        tri_t2=jnp.asarray(_pad_rows(tri_t2, n_tri_pad, 0.0)),
        tri_slot=jnp.asarray(_pad_rows(tri_slot, n_tri_pad, 0)),
        tri_pack=jnp.asarray(_pack_tri_rows(
            _pad_rows(tri_v0, n_tri_pad, 1e30),
            _pad_rows(tri_e1, n_tri_pad, 0.0),
            _pad_rows(tri_e2, n_tri_pad, 0.0),
            _pad_rows(tri_n0, n_tri_pad, 0.0),
            _pad_rows(tri_n1, n_tri_pad, 0.0),
            _pad_rows(tri_n2, n_tri_pad, 0.0),
            _pad_rows(tri_t0, n_tri_pad, 0.0),
            _pad_rows(tri_t1, n_tri_pad, 0.0),
            _pad_rows(tri_t2, n_tri_pad, 0.0),
            _pad_rows(tri_slot, n_tri_pad, 0),
            np.full(n_tri_pad, -1, np.int32))),
        # inert soup fields (the two-level path never reads them)
        tri_mat=jnp.zeros(n_tri_pad, jnp.int32),
        tri_inst=jnp.full(n_tri_pad, -1, jnp.int32),
        tri_pw=jnp.zeros((3, 3), jnp.float32),
        tri_pc=jnp.zeros(3, jnp.float32),
        aabb_links=jnp.zeros((8, 8), jnp.float32),
        node_begin=jnp.zeros(1, jnp.int32),
        node_count=jnp.zeros(1, jnp.int32),
        # two-level structure (shared mesh clusters + instanced units)
        cl_lw=jnp.asarray(cl_lw),
        cl_base=jnp.asarray(cl_base),
        cl_count=jnp.asarray(cl_count),
        ti_box=jnp.asarray(ti_box),
        ti_rows=jnp.asarray(ti_rows),
        cl_obox=jnp.asarray(cl_obox),
        cl_slot=cluster_slot_rows(jnp.asarray(_pad_rows(tri_slot,
                                                        n_tri_pad, 0)),
                                  jnp.asarray(cl_base),
                                  jnp.asarray(cl_count)),
        inst_fwd=jnp.asarray(inst_fwd),
        inst_nrm=jnp.asarray(inst_nrm),
        inst_slot_map=jnp.asarray(inst_slot_map),
        exp_tri=jnp.asarray(exp_tri),
        exp_inst=jnp.asarray(exp_inst),
        max_ncl=int(max(i_ncl)) if i_ncl else 0,
    )
    return geo, n_tri


def compile_world(world: World, leaf_size: int = 8,
                  two_level: Optional[bool] = None,
                  cache: Optional[dict] = None) -> DeviceScene:
    """Flatten the host world into a DeviceScene (see module docstring).

    ``two_level`` selects the acceleration structure: False = world-space
    triangle soup with one flattened BVH (fastest for small scenes, duplicates
    instanced geometry); True = shared per-mesh segmented BLAS + TLAS over
    instances (reference two-level semantics; scales past VMEM via streaming).
    None (default) picks automatically: two-level when instancing would
    duplicate substantially or the expanded soup would overflow the resident
    packet table.

    ``cache``: optional dict (owned by the caller, e.g. the Renderer) that
    memoizes the expensive version-keyed sub-builds — the world-space
    geometry+BVH+cluster block, per-mesh object-space cluster tables, and
    the texture atlases — so a materials-or-lights-only edit re-flattens
    nothing but the cheap binding tables (reference incremental re-mirror,
    updatable.hpp:10-54 + cuda_object_container.cuh:42-150)."""
    # ---- material table ----
    materials: list[Material] = [world.material, world.default_material] + list(world.materials)
    mat_index = {id(m): i for i, m in enumerate(materials)}

    # ---- map table (global ids across kinds; color maps then scalar maps) ----
    color_maps: list[TextureMap] = list(world.textures) + list(world.normal_maps)
    scalar_maps: list[TextureMap] = (list(world.metalness_maps) + list(world.roughness_maps)
                                     + list(world.emission_maps))
    all_maps = color_maps + scalar_maps
    map_id = {id(m): i for i, m in enumerate(all_maps)}

    akey = ("atlas", tuple((id(m), getattr(m, "version", 0))
                           for m in all_maps))
    if cache is not None and akey in cache:
        color_atlas, color_rects, scalar_atlas, scalar_rects = \
            cache[akey]["v"]
    else:
        color_atlas, color_rects = _pack_shelf(color_maps, 4)
        scalar_atlas3, scalar_rects = _pack_shelf(scalar_maps, 1)
        scalar_atlas = scalar_atlas3[:, :, 0]
        if cache is not None:
            for stale in [k2 for k2 in cache
                          if isinstance(k2, tuple) and k2[0] == "atlas"]:
                del cache[stale]
            cache[akey] = {"v": (color_atlas, color_rects, scalar_atlas,
                                 scalar_rects), "refs": list(all_maps)}
    k = len(all_maps)
    map_rect = np.zeros((max(k, 1), 4), np.int32)
    map_flags = np.zeros((max(k, 1), 3), np.int32)
    map_uv = np.zeros((max(k, 1), 5), np.float32)
    map_uv[:, 0:2] = 1.0
    for i, m in enumerate(all_maps):
        in_color = i < len(color_maps)
        rect = color_rects[i] if in_color else scalar_rects[i - len(color_maps)]
        map_rect[i] = rect
        map_flags[i] = (m.filter_mode, m.address_mode, 0 if in_color else 1)
        map_uv[i] = (m.scale[0], m.scale[1], m.rotation, m.translation[0], m.translation[1])

    def map_ref(m: Optional[TextureMap]) -> int:
        return NO_MAP if m is None else map_id[id(m)]

    n_mat = len(materials)
    mat_color = np.stack([m.color for m in materials]).astype(np.float32)
    mat_metalness = np.array([m.metalness for m in materials], np.float32)
    mat_roughness = np.array([m.roughness for m in materials], np.float32)
    mat_emission = np.array([m.emission for m in materials], np.float32)
    mat_ior = np.array([m.ior for m in materials], np.float32)
    mat_scattering = np.array([m.scattering for m in materials], np.float32)
    mat_maps = np.array(
        [[map_ref(m.texture), map_ref(m.normal_map), map_ref(m.metalness_map),
          map_ref(m.roughness_map), map_ref(m.emission_map)] for m in materials],
        np.int32,
    )

    map_kinds_used = tuple(bool((mat_maps[:, k] >= 0).any()) for k in range(5))

    # ---- acceleration-structure mode ----
    live = [i for i in world.instances
            if i.mesh is not None and i.mesh.triangle_count > 0]
    expanded = sum(i.mesh.triangle_count for i in live)
    unique = sum(m.triangle_count
                 for m in {id(i.mesh): i.mesh for i in live}.values())
    if two_level is None:
        # two-level only when instancing duplicates 2x+ a scene that is past
        # the brute-force sweet spot (measured round 5: expanding
        # instanced_field's 318k-triangle duplication into the streamed soup
        # ran 0.55 vs the TLAS walk's 0.86 Mrays/s — the shared-BLAS mode
        # wins once expansion crosses the resident-table scale)
        two_level = expanded > 8192 and expanded >= 2 * unique

    if two_level:
        cut_fields = _cutout_fields(world, mat_index, mat_color, mat_maps)
        n_cutout = cut_fields.pop("n_cutout")
        geo, n_tri = _two_level_arrays(world, mat_index, cache)
        return DeviceScene(
            **geo,
            **cut_fields, n_cutout=n_cutout,
            mat_color=jnp.asarray(mat_color), mat_metalness=jnp.asarray(mat_metalness),
            mat_roughness=jnp.asarray(mat_roughness), mat_emission=jnp.asarray(mat_emission),
            mat_ior=jnp.asarray(mat_ior), mat_scattering=jnp.asarray(mat_scattering),
            mat_maps=jnp.asarray(mat_maps),
            **_atlas_fields(color_atlas, scalar_atlas, map_rect, map_flags, map_uv),
            **_light_fields(world),
            n_triangles=n_tri, n_materials=n_mat,
            n_spot_lights=len(world.spot_lights),
            n_direct_lights=len(world.direct_lights),
            n_instances=len(world.instances),
            has_maps=k > 0, map_kinds_used=map_kinds_used,
            two_level=True,
        )

    # ---- world-space triangle soup (geometry block cached by version) ----
    geo = _soup_geometry(world, leaf_size, cache)
    n_tri = geo["n_tri"]
    n_tri_pad = geo["n_tri_pad"]

    # material binding (cheap, rebuilt every compile so edits/training are
    # never stale): instance slot tables -> per-triangle global material ids
    n_inst_total = len(world.instances)
    slot_tables = np.full((max(n_inst_total, 1), 64), DEFAULT_MATERIAL_ID,
                          np.int32)
    for inst_id, inst in enumerate(world.instances):
        for s, mat in enumerate(inst.materials[:64]):
            if mat is not None:
                slot_tables[inst_id, s] = _resolve_mat(mat_index, mat,
                                                       inst.name)
    inst_rows = geo["inst_rows"]
    tri_mat = np.where(
        inst_rows >= 0,
        slot_tables[np.clip(inst_rows, 0, None), geo["slot_rows"]],
        DEFAULT_MATERIAL_ID).astype(np.int32)
    tri_pack = _pack_tri_rows(geo["tri_v0"], geo["tri_e1"], geo["tri_e2"],
                              geo["tri_n0"], geo["tri_n1"], geo["tri_n2"],
                              geo["tri_t0"], geo["tri_t1"], geo["tri_t2"],
                              tri_mat, inst_rows)
    cut_fields = _cutout_from_soup(geo, tri_mat, mat_color, mat_maps)
    n_cutout = cut_fields.pop("n_cutout")

    return DeviceScene(
        **geo["cl_fields"],
        **cut_fields, n_cutout=n_cutout,
        tri_v0=jnp.asarray(geo["tri_v0"]), tri_e1=jnp.asarray(geo["tri_e1"]),
        tri_e2=jnp.asarray(geo["tri_e2"]),
        tri_n0=jnp.asarray(geo["tri_n0"]), tri_n1=jnp.asarray(geo["tri_n1"]),
        tri_n2=jnp.asarray(geo["tri_n2"]),
        tri_t0=jnp.asarray(geo["tri_t0"]), tri_t1=jnp.asarray(geo["tri_t1"]),
        tri_t2=jnp.asarray(geo["tri_t2"]),
        tri_mat=jnp.asarray(tri_mat), tri_inst=jnp.asarray(inst_rows),
        tri_pw=geo["tri_pw"], tri_pc=geo["tri_pc"],
        tri_pack=jnp.asarray(tri_pack),
        aabb_links=geo["aabb_links"],
        node_begin=geo["node_begin"], node_count=geo["node_count"],
        mat_color=jnp.asarray(mat_color), mat_metalness=jnp.asarray(mat_metalness),
        mat_roughness=jnp.asarray(mat_roughness), mat_emission=jnp.asarray(mat_emission),
        mat_ior=jnp.asarray(mat_ior), mat_scattering=jnp.asarray(mat_scattering),
        mat_maps=jnp.asarray(mat_maps),
        **_atlas_fields(color_atlas, scalar_atlas, map_rect, map_flags, map_uv),
        **_light_fields(world),
        n_triangles=n_tri, n_materials=n_mat,
        n_spot_lights=len(world.spot_lights),
        n_direct_lights=len(world.direct_lights),
        n_instances=len(world.instances),
        has_maps=k > 0, map_kinds_used=map_kinds_used,
    )


def _soup_geometry(world: World, leaf_size: int, cache: Optional[dict]):
    """Flatten instances into the world-space soup, build the BVH + cluster
    tables, pad to bucketed shapes. Material-INDEPENDENT (slots are kept
    mesh-local), so any materials-only edit reuses this block wholesale via
    ``cache`` — the reference analog of StateRegister-guarded re-mirroring
    (updatable.hpp:10-54): untouched geometry is neither re-transformed nor
    re-BVH-built."""
    key = _geometry_key(world, leaf_size)
    if cache is not None:
        hit = cache.get(key)
        if hit is not None:
            return hit

    v0s, e1s, e2s = [], [], []
    n0s, n1s, n2s = [], [], []
    t0s, t1s, t2s = [], [], []
    slots, insts = [], []
    refs = []
    for inst_id, inst in enumerate(world.instances):
        mesh = inst.mesh
        if mesh is None or mesh.triangle_count == 0:
            continue
        refs.append((inst, mesh))
        tr = inst.effective_transform()
        wv = tr.points_l2g(mesh.vertices).astype(np.float32)
        v0 = wv[mesh.tri_v[:, 0]]
        v1 = wv[mesh.tri_v[:, 1]]
        v2 = wv[mesh.tri_v[:, 2]]
        flat = nrm(np.cross(v1 - v0, v2 - v0)).astype(np.float32)
        if len(mesh.normals):
            wn = tr.normals_l2g(mesh.normals).astype(np.float32)
            def vtx_normal(col):
                idx = mesh.tri_n[:, col]
                ok = idx >= 0
                out = flat.copy()
                out[ok] = wn[idx[ok]]
                return out
            n0, n1, n2 = vtx_normal(0), vtx_normal(1), vtx_normal(2)
        else:
            n0 = n1 = n2 = flat
        if len(mesh.texcrds):
            def vtx_uv(col):
                idx = mesh.tri_t[:, col]
                ok = idx >= 0
                out = np.zeros((len(idx), 2), np.float32)
                out[ok] = mesh.texcrds[idx[ok]]
                return out
            t0, t1, t2 = vtx_uv(0), vtx_uv(1), vtx_uv(2)
        else:
            t0 = t1 = t2 = np.zeros((len(v0), 2), np.float32)
        v0s.append(v0); e1s.append(v1 - v0); e2s.append(v2 - v0)
        n0s.append(n0); n1s.append(n1); n2s.append(n2)
        t0s.append(t0); t1s.append(t1); t2s.append(t2)
        slots.append(np.clip(mesh.tri_mat, 0, 63).astype(np.int32))
        insts.append(np.full(len(v0), inst_id, np.int32))

    if v0s:
        tri_v0 = np.concatenate(v0s); tri_e1 = np.concatenate(e1s); tri_e2 = np.concatenate(e2s)
        tri_n0 = np.concatenate(n0s); tri_n1 = np.concatenate(n1s); tri_n2 = np.concatenate(n2s)
        tri_t0 = np.concatenate(t0s); tri_t1 = np.concatenate(t1s); tri_t2 = np.concatenate(t2s)
        slot_rows = np.concatenate(slots); inst_rows = np.concatenate(insts)
    else:
        tri_v0 = tri_e1 = tri_e2 = np.zeros((0, 3), np.float32)
        tri_n0 = tri_n1 = tri_n2 = np.zeros((0, 3), np.float32)
        tri_t0 = tri_t1 = tri_t2 = np.zeros((0, 2), np.float32)
        slot_rows = np.zeros(0, np.int32); inst_rows = np.zeros(0, np.int32)

    n_tri = len(tri_v0)

    # ---- BVH over world-space triangles + reorder into leaf order ----
    if n_tri:
        pmin, pmax = triangle_aabbs(tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2)
        bvh: FlatBVH = build_bvh(pmin, pmax, leaf_size=leaf_size)
        o = bvh.order
        tri_v0, tri_e1, tri_e2 = tri_v0[o], tri_e1[o], tri_e2[o]
        tri_n0, tri_n1, tri_n2 = tri_n0[o], tri_n1[o], tri_n2[o]
        tri_t0, tri_t1, tri_t2 = tri_t0[o], tri_t1[o], tri_t2[o]
        slot_rows, inst_rows = slot_rows[o], inst_rows[o]
    else:
        bvh = build_bvh(np.zeros((0, 3)), np.zeros((0, 3)))
    first8, skip8 = compute_skip_links(bvh.node_begin, bvh.node_count,
                                       bvh.node_axis)
    aabb_links = build_aabb_links(bvh.node_min, bvh.node_max, bvh.node_count,
                                  first8, skip8)

    # pad to a bucketed size so small geometry edits keep shapes (and the
    # jit cache) stable; the padded tail never hits (v0 far, zero edges)
    n_tri_pad = _bucket(n_tri)
    tri_v0 = _pad_rows(tri_v0, n_tri_pad, 1e30)
    tri_e1 = _pad_rows(tri_e1, n_tri_pad, 0.0)
    tri_e2 = _pad_rows(tri_e2, n_tri_pad, 0.0)
    tri_n0 = _pad_rows(tri_n0, n_tri_pad, 0.0)
    tri_n1 = _pad_rows(tri_n1, n_tri_pad, 0.0)
    tri_n2 = _pad_rows(tri_n2, n_tri_pad, 0.0)
    tri_t0 = _pad_rows(tri_t0, n_tri_pad, 0.0)
    tri_t1 = _pad_rows(tri_t1, n_tri_pad, 0.0)
    tri_t2 = _pad_rows(tri_t2, n_tri_pad, 0.0)
    slot_rows = _pad_rows(slot_rows, n_tri_pad, 0)
    inst_rows = _pad_rows(inst_rows, n_tri_pad, -1)
    tri_pw, tri_pc = triangle_frames(tri_v0, tri_e1, tri_e2)

    # cluster tables (the fast traversal past cfg.brute_force_threshold).
    # Built for every non-empty scene: tiny scenes cost one ~8 KB cluster,
    # and routing them through the cluster kernel avoids the dense XLA
    # path's pathological compile (~470 s for the 36-tri Cornell).
    cl_fields = {}
    if n_tri > 0:
        from ..ops.traverse_cluster import build_cluster_tables
        cl_box, cl_lw, cl_order, cl_base, cl_count = build_cluster_tables(
            tri_v0[:n_tri], tri_e1[:n_tri], tri_e2[:n_tri])
        cl_fields = dict(
            cl_box=jnp.asarray(cl_box), cl_lw=jnp.asarray(cl_lw),
            # order padded to the triangle bucket so its shape is stable too
            cl_order=jnp.asarray(_pad_rows(cl_order, n_tri_pad, 0)),
            cl_base=jnp.asarray(cl_base),
            cl_count=jnp.asarray(cl_count),
            n_clusters=int((cl_count > 0).sum()))

    value = dict(
        n_tri=n_tri, n_tri_pad=n_tri_pad,
        tri_v0=tri_v0, tri_e1=tri_e1, tri_e2=tri_e2,
        tri_n0=tri_n0, tri_n1=tri_n1, tri_n2=tri_n2,
        tri_t0=tri_t0, tri_t1=tri_t1, tri_t2=tri_t2,
        slot_rows=slot_rows, inst_rows=inst_rows,
        tri_pw=jnp.asarray(tri_pw), tri_pc=jnp.asarray(tri_pc),
        aabb_links=jnp.asarray(aabb_links),
        node_begin=jnp.asarray(bvh.node_begin),
        node_count=jnp.asarray(bvh.node_count),
        cl_fields=cl_fields,
        refs=refs,  # pin object identity: id() reuse cannot false-hit
    )
    if cache is not None:
        for stale in [k2 for k2 in cache
                      if isinstance(k2, tuple) and k2[0] == "soup_geo"]:
            del cache[stale]
        cache[key] = value
    return value


def _cutout_from_soup(geo: dict, tri_mat: np.ndarray, mat_color, mat_maps):
    """Texture-alpha shadow cutout set, derived from the (cached) flattened
    soup instead of re-transforming instances: a triangle is a cutout when
    its resolved material has a color texture AND base alpha < 1 (reference
    cuda_material.cuh:86-95 semantics; see _cutout_fields)."""
    n_tri = geo["n_tri"]
    tm = tri_mat[:n_tri]
    sel = (mat_maps[tm, 0] >= 0) & (mat_color[tm, 3] < 1.0 - 1e-6)
    if not sel.any():
        return dict(n_cutout=0)
    v0 = geo["tri_v0"][:n_tri][sel]
    e1 = geo["tri_e1"][:n_tri][sel]
    e2 = geo["tri_e2"][:n_tri][sel]
    pw, pc = triangle_frames(v0, e1, e2)
    return dict(
        cut_pw=jnp.asarray(pw), cut_pc=jnp.asarray(pc),
        cut_v0=jnp.asarray(v0), cut_e1=jnp.asarray(e1),
        cut_e2=jnp.asarray(e2),
        cut_t0=jnp.asarray(geo["tri_t0"][:n_tri][sel]),
        cut_t1=jnp.asarray(geo["tri_t1"][:n_tri][sel]),
        cut_t2=jnp.asarray(geo["tri_t2"][:n_tri][sel]),
        cut_map=jnp.asarray(mat_maps[tm[sel], 0].astype(np.int32)),
        n_cutout=int(sel.sum()))


def _cutout_fields(world: World, mat_index, mat_color, mat_maps) -> dict:
    """World-space "cutout" triangle set for texture-alpha shadow filtering.

    A triangle is a cutout when its resolved material has a color texture AND
    base alpha < 1 (reference semantics: the per-hit shadow factor
    opacityColor(texcrd) = (rgb*tex_rgb, (1-alpha)*(1-tex_alpha)),
    cuda_material.cuh:86-95 — when alpha = 1 the constant part already blocks
    the ray, so only transparent textured materials need the texture term).
    Returns projection frames + texcrds + map ids (+ n_cutout)."""
    v0s, e1s, e2s, t0s, t1s, t2s, maps = [], [], [], [], [], [], []
    for inst in world.instances:
        mesh = inst.mesh
        if mesh is None or mesh.triangle_count == 0:
            continue
        slot_table = np.full(64, DEFAULT_MATERIAL_ID, np.int32)
        for s, mat in enumerate(inst.materials[:64]):
            if mat is not None:
                slot_table[s] = _resolve_mat(mat_index, mat, inst.name)
        gmat = slot_table[np.clip(mesh.tri_mat, 0, 63)]
        sel = (mat_maps[gmat, 0] >= 0) & (mat_color[gmat, 3] < 1.0 - 1e-6)
        if not sel.any():
            continue
        tr = inst.effective_transform()
        wv = tr.points_l2g(mesh.vertices).astype(np.float32)
        tv = mesh.tri_v[sel]
        v0 = wv[tv[:, 0]]
        v0s.append(v0)
        e1s.append(wv[tv[:, 1]] - v0)
        e2s.append(wv[tv[:, 2]] - v0)
        tt = mesh.tri_t[sel]
        if len(mesh.texcrds):
            uv = np.concatenate([mesh.texcrds.astype(np.float32),
                                 np.zeros((1, 2), np.float32)])  # -1 -> (0,0)
        else:
            uv = np.zeros((1, 2), np.float32)
            tt = np.full_like(tt, -1)
        t0s.append(uv[tt[:, 0]])
        t1s.append(uv[tt[:, 1]])
        t2s.append(uv[tt[:, 2]])
        maps.append(mat_maps[gmat[sel], 0])
    if v0s:
        v0 = np.concatenate(v0s)
        e1 = np.concatenate(e1s)
        e2 = np.concatenate(e2s)
        pw, pc = triangle_frames(v0, e1, e2)
        return dict(
            cut_pw=jnp.asarray(pw), cut_pc=jnp.asarray(pc),
            cut_v0=jnp.asarray(v0), cut_e1=jnp.asarray(e1),
            cut_e2=jnp.asarray(e2),
            cut_t0=jnp.asarray(np.concatenate(t0s)),
            cut_t1=jnp.asarray(np.concatenate(t1s)),
            cut_t2=jnp.asarray(np.concatenate(t2s)),
            cut_map=jnp.asarray(np.concatenate(maps).astype(np.int32)),
            n_cutout=len(v0))
    return dict(n_cutout=0)


def _atlas_fields(color_atlas, scalar_atlas, map_rect, map_flags, map_uv):
    from ..ops.texture import block_indices
    kinds = map_flags[:, 2]
    col_rects = map_rect[kinds == 0] if len(map_rect) else map_rect
    sc_rects = map_rect[kinds == 1] if len(map_rect) else map_rect
    return dict(
        color_atlas=jnp.asarray(color_atlas), scalar_atlas=jnp.asarray(scalar_atlas),
        map_rect=jnp.asarray(map_rect), map_flags=jnp.asarray(map_flags),
        map_uv=jnp.asarray(map_uv),
        col_blk_idx=jnp.asarray(block_indices(
            col_rects, color_atlas.shape[0], color_atlas.shape[1])),
        sc_blk_idx=jnp.asarray(block_indices(
            sc_rects, scalar_atlas.shape[0], scalar_atlas.shape[1])))


def _light_fields(world: World) -> dict:
    """Light SoA tables (padded to >=1 so shapes stay static; counts gate
    usage)."""
    sl = list(world.spot_lights)
    dl = list(world.direct_lights)
    spot_pos = np.stack([l.position for l in sl]) if sl else np.zeros((1, 3), np.float32)
    spot_dir = np.stack([l.direction for l in sl]) if sl else np.tile([[0, -1, 0]], (1, 1)).astype(np.float32)
    spot_color = np.stack([l.color for l in sl]) if sl else np.ones((1, 3), np.float32)
    spot_size = np.array([l.size for l in sl], np.float32) if sl else np.zeros(1, np.float32)
    spot_emission = np.array([l.emission for l in sl], np.float32) if sl else np.zeros(1, np.float32)
    spot_cos = np.array([l.cos_beam_angle for l in sl], np.float32) if sl else np.ones(1, np.float32)
    dir_dir = np.stack([l.direction for l in dl]) if dl else np.tile([[0, -1, 0]], (1, 1)).astype(np.float32)
    dir_color = np.stack([l.color for l in dl]) if dl else np.ones((1, 3), np.float32)
    dir_emission = np.array([l.emission for l in dl], np.float32) if dl else np.zeros(1, np.float32)
    dir_cos = np.array([l.cos_angular_size for l in dl], np.float32) if dl else np.ones(1, np.float32)
    return dict(
        spot_pos=jnp.asarray(spot_pos), spot_dir=jnp.asarray(spot_dir),
        spot_color=jnp.asarray(spot_color), spot_size=jnp.asarray(spot_size),
        spot_emission=jnp.asarray(spot_emission), spot_cos_angle=jnp.asarray(spot_cos),
        dir_dir=jnp.asarray(dir_dir), dir_color=jnp.asarray(dir_color),
        dir_emission=jnp.asarray(dir_emission), dir_cos=jnp.asarray(dir_cos))
