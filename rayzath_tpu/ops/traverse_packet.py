"""Packet BVH traversal as a Pallas TPU kernel: zero-gather inner loop.

TPU-native second-generation traversal (the XLA skip-link walk in
ops/traverse.py is the first). Measured on-chip, the XLA walk is bound by its
two wavefront gathers per step (~21 ns per gathered row — every step streams
[R,80] leaf blocks through HBM). This kernel removes gathers entirely:

* Rays are processed in **blocks of 8x128 = 1024** (one grid program per
  block). Each block runs ONE shared skip-link walk — a single scalar node
  index in registers — and every step tests all 1024 rays against that node
  with vector ops. Per-ray hit masks keep the semantics exact (each ray
  registers exactly the intersections it would in a per-ray walk; only the
  visit ORDER is shared), so results match ops/traverse.py.
* The node table (per-octant AABB + first/skip links, [8N, 8]) and the leaf
  table ([8N, 16] — 8 triangles per node, padded with id = -1 for inner
  nodes) live in VMEM for the whole kernel; the per-step fetch is one scalar
  dynamic slice (~20 cycles), not a 262k-row gather.
* The block's walk order uses the octant of its first ray (front-to-back for
  that ray). Mixed-octant blocks stay correct — order only affects how early
  per-ray best_t pruning kicks in. A block whose rays are all terminated
  exits after ONE step (no ray hits the root box -> skip(root) = N), which
  replaces the XLA path's compaction ladder for free.
* Leaf steps run Moller-Trumbore for the 8 leaf triangles sequentially,
  each as scalar triangle fields broadcast against all 1024 rays (reference
  numerics, cuda_render_parts.cuh:1023-1083).

Reference behavior covered: closest-hit walk (cuda_bvh.cuh:114-171) and the
transmission-accumulating any-hit shadow walk with early-out at alpha < 1e-4
(cuda_bvh.cuh:172-232, cuda_instance.cuh:92-164).

Gradients: closest-hit ids are discrete (the integrator re-derives t/b1/b2
differentiably via refine_hit), so the kernel is wrapped in stop_gradient.
The shadow kernel carries a custom_vjp whose backward replays the traversal
through the differentiable XLA implementation (path-replay style), so
d(shadow mask)/d(material opacity) still flows.

Used when the scene's tables fit VMEM (see PACKET_MAX_NODES); larger scenes
fall back to ops/traverse.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import DET_EPS, BIG, project_shadow

BLOCK = 1024          # rays per grid program (8 sublanes x 128 lanes)
LEAF = 8              # triangles per leaf block (pkt tables are built for 8)
NODE_F = 8            # node row: min.xyz, max.xyz, first, skip
LEAF_F = 16           # leaf row: v0.xyz e1.xyz e2.xyz id op.rgba pad pad
PACKET_MAX_NODES = 24576   # tables ~ (8*8 + 8*16)*4 B/node = 4.7 MB at cap


def build_packet_tables(node_min, node_max, node_begin, node_count,
                        first8, skip8, tri_v0, tri_e1, tri_e2,
                        op_rgb, op_a):
    """Host/JAX-side packet tables.

    Returns (pkt_nodes [8N, NODE_F] f32, pkt_leaves [N*LEAF, LEAF_F] f32).
    pkt_nodes row o*N+n = (min, max, first(o,n), skip(o,n)); first = -1 marks
    a leaf. pkt_leaves rows n*LEAF+k = triangle k of node n's leaf block
    (id = -1 padding for inner nodes / short leaves).
    """
    node_min = jnp.asarray(node_min, jnp.float32)
    node_max = jnp.asarray(node_max, jnp.float32)
    node_count = jnp.asarray(node_count, jnp.int32)
    node_begin = jnp.asarray(node_begin, jnp.int32)
    n = node_count.shape[0]
    leaf = node_count > 0
    first8 = jnp.where(leaf[None, :], -1, jnp.asarray(first8, jnp.int32))
    aabb = jnp.concatenate([node_min, node_max], axis=1)          # [N, 6]
    blocks = []
    for o in range(8):
        links = jnp.stack([first8[o].astype(jnp.float32),
                           jnp.asarray(skip8[o], jnp.float32)], axis=1)
        blocks.append(jnp.concatenate([aabb, links], axis=1))
    pkt_nodes = jnp.concatenate(blocks, axis=0)                   # [8N, 8]

    k = jnp.arange(LEAF, dtype=jnp.int32)
    tid = node_begin[:, None] + k[None, :]                        # [N, LEAF]
    valid = leaf[:, None] & (k[None, :] < node_count[:, None])
    n_tri = tri_v0.shape[0]
    tid_c = jnp.clip(tid, 0, max(n_tri - 1, 0)).reshape(-1)       # [N*LEAF]
    vf = valid.reshape(-1)[:, None]

    def g(a):
        a = jnp.asarray(a, jnp.float32)
        if a.ndim == 1:
            a = a[:, None]
        return jnp.where(vf, a[tid_c], 0.0)

    ids = jnp.where(vf, tid_c[:, None].astype(jnp.float32), -1.0)
    pad = jnp.zeros((n * LEAF, 2), jnp.float32)
    pkt_leaves = jnp.concatenate(
        [g(tri_v0), g(tri_e1), g(tri_e2), ids, g(op_rgb), g(op_a), pad],
        axis=1)                                                   # [N*LEAF, 16]
    return pkt_nodes, pkt_leaves


def _slab(row, ox, oy, oz, ix, iy, iz):
    """Per-ray slab test of one node AABB (scalars from `row` [1, NODE_F])."""
    tx1 = (row[0, 0] - ox) * ix
    ty1 = (row[0, 1] - oy) * iy
    tz1 = (row[0, 2] - oz) * iz
    tx2 = (row[0, 3] - ox) * ix
    ty2 = (row[0, 4] - oy) * iy
    tz2 = (row[0, 5] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _mt_scalar_tri(trow, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of ONE triangle (scalar fields from `trow` [1, LEAF_F])
    against all rays ([8,128] registers). Returns (t, bary_ok)."""
    v0x, v0y, v0z = trow[0, 0], trow[0, 1], trow[0, 2]
    e1x, e1y, e1z = trow[0, 3], trow[0, 4], trow[0, 5]
    e2x, e2y, e2z = trow[0, 6], trow[0, 7], trow[0, 8]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det = det + jnp.where(jnp.abs(det) < DET_EPS, DET_EPS, 0.0)
    inv_det = 1.0 / det
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    b1 = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    b2 = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    bary_ok = (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    return t, bary_ok


def _ray_regs(o_ref, d_ref):
    """Load the block's rays into [8,128] registers (refs are [3,8,128])."""
    ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
    dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
    eps = 1e-12
    def inv1(d):
        return 1.0 / jnp.where(jnp.abs(d) < eps,
                               jnp.where(d < 0, -eps, eps), d)
    return ox, oy, oz, dx, dy, dz, inv1(dx), inv1(dy), inv1(dz)


def _block_octant(dx, dy, dz, n: int):
    """Octant offset (scalar) from the block's first ray."""
    o = ((dx[0, 0] < 0).astype(jnp.int32)
         | ((dy[0, 0] < 0).astype(jnp.int32) << 1)
         | ((dz[0, 0] < 0).astype(jnp.int32) << 2))
    return o * n


def _closest_kernel(n_nodes: int, max_steps: int):
    def kern(nodes_ref, leaves_ref, o_ref, d_ref, nf_ref, t_ref, id_ref):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        near, far = nf_ref[0], nf_ref[1]
        base = _block_octant(dx, dy, dz, n_nodes)

        def body(state):
            it, node, best_t, best_id = state
            row = nodes_ref[pl.ds(base + node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            hit = ((tmax >= near) & (tmin <= tmax)
                   & (tmin <= jnp.minimum(far, best_t)))
            any_hit = jnp.any(hit)
            first = row[0, 6]
            is_leaf = first < 0.0

            def leaf_fn(args):
                best_t, best_id = args
                lbase = node * LEAF
                for k in range(LEAF):
                    trow = leaves_ref[pl.ds(lbase + k, 1), :]
                    tid = trow[0, 9]
                    t, bary_ok = _mt_scalar_tri(trow, ox, oy, oz, dx, dy, dz)
                    valid = (hit & bary_ok & (tid >= 0.0)
                             & (t > near) & (t < best_t))
                    best_t = jnp.where(valid, t, best_t)
                    best_id = jnp.where(valid, tid, best_id)
                return best_t, best_id

            best_t, best_id = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                (best_t, best_id))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, row[0, 7]).astype(jnp.int32)
            return it + 1, nxt, best_t, best_id

        def cond(state):
            it, node, *_ = state
            return jnp.logical_and(node < n_nodes, it < max_steps)

        _, _, best_t, best_id = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.minimum(far, BIG), jnp.full((8, 128), -1.0, jnp.float32)))
        t_ref[:] = best_t
        id_ref[:] = best_id
    return kern


def _shadow_kernel(n_nodes: int, max_steps: int):
    def kern(nodes_ref, leaves_ref, o_ref, d_ref, nf_ref,
             mr_ref, mg_ref, mb_ref, ma_ref):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        dist = nf_ref[0]
        base = _block_octant(dx, dy, dz, n_nodes)

        def body(state):
            it, node, mr, mg, mb, ma = state
            row = nodes_ref[pl.ds(base + node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            alive = ma >= 1e-4
            hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist) & alive
            any_hit = jnp.any(hit)
            first = row[0, 6]
            is_leaf = first < 0.0

            def leaf_fn(args):
                mr, mg, mb, ma = args
                lbase = node * LEAF
                for k in range(LEAF):
                    trow = leaves_ref[pl.ds(lbase + k, 1), :]
                    tid = trow[0, 9]
                    t, bary_ok = _mt_scalar_tri(trow, ox, oy, oz, dx, dy, dz)
                    valid = (hit & bary_ok & (tid >= 0.0)
                             & (t > 0.0) & (t < dist))
                    mr = mr * jnp.where(valid, trow[0, 10], 1.0)
                    mg = mg * jnp.where(valid, trow[0, 11], 1.0)
                    mb = mb * jnp.where(valid, trow[0, 12], 1.0)
                    ma = ma * jnp.where(valid, trow[0, 13], 1.0)
                return mr, mg, mb, ma

            mr, mg, mb, ma = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                (mr, mg, mb, ma))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, row[0, 7]).astype(jnp.int32)
            return it + 1, nxt, mr, mg, mb, ma

        def cond(state):
            it, node, mr, mg, mb, ma = state
            return jnp.logical_and(
                jnp.logical_and(node < n_nodes, it < max_steps),
                jnp.max(ma) >= 1e-4)

        ones = jnp.ones((8, 128), jnp.float32)
        _, _, mr, mg, mb, ma = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), ones, ones, ones, ones))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


def _vec_to_blocks(v, rp):
    """[R,3] -> [nb, 3, 8, 128] (field-major so in-kernel slices are clean)."""
    r = v.shape[0]
    v = jnp.pad(v, ((0, rp - r), (0, 0)))
    return v.T.reshape(3, rp // BLOCK, 8, 128).transpose(1, 0, 2, 3)


def _interpret() -> bool:
    """Mosaic needs real TPU hardware; interpret everywhere else (tests run
    on a virtual CPU mesh). The tunneled chip reports platform 'axon'."""
    return jax.default_backend() not in ("tpu", "axon")


@partial(jax.jit, static_argnames=())
def _packet_closest_impl(origin, direction, near, far, pkt_nodes, pkt_leaves):
    R = origin.shape[0]
    n_nodes = pkt_nodes.shape[0] // 8
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    # padded rays: far=-1 so they never hit anything
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    max_steps = 4 * n_nodes + 8

    grid = (nb,)
    tab_spec = pl.BlockSpec(pkt_nodes.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    leaf_spec = pl.BlockSpec(pkt_leaves.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec((1, 2, 8, 128), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))

    def kern(nodes_ref, leaves_ref, o_ref, d_ref, nf_ref, t_ref, id_ref):
        inner = _closest_kernel(n_nodes, max_steps)
        inner(nodes_ref, leaves_ref, o_ref.at[0], d_ref.at[0], nf_ref.at[0],
              t_ref.at[0], id_ref.at[0])

    t, tid = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)),
        in_specs=[tab_spec, leaf_spec, ray_spec, ray_spec, nf_spec],
        out_specs=(out_spec, out_spec),
        interpret=_interpret(),
    )(pkt_nodes, pkt_leaves, o_b, d_b, nf_b)
    t = t.reshape(rp)[:R]
    tid = tid.reshape(rp)[:R].astype(jnp.int32)
    return t, tid


def packet_closest(origin, direction, near, far, pkt_nodes, pkt_leaves):
    """Closest-hit packet traversal. Returns (t [R], tri_id [R] i32, -1 miss).

    Discrete output — wrapped in stop_gradient (the integrator re-derives
    differentiable t/b1/b2 from the ids via refine_hit)."""
    t, tid = _packet_closest_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, pkt_nodes, pkt_leaves)))
    return jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid)


@jax.jit
def _packet_shadow_impl(origin, direction, dist, pkt_nodes, pkt_leaves):
    R = origin.shape[0]
    n_nodes = pkt_nodes.shape[0] // 8
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    # padded rays: dist=-1 -> no hits
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    max_steps = 4 * n_nodes + 8

    tab_spec = pl.BlockSpec(pkt_nodes.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    leaf_spec = pl.BlockSpec(pkt_leaves.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec((1, 2, 8, 128), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))

    def kern(nodes_ref, leaves_ref, o_ref, d_ref, nf_ref, *outs):
        inner = _shadow_kernel(n_nodes, max_steps)
        inner(nodes_ref, leaves_ref, o_ref.at[0], d_ref.at[0], nf_ref.at[0],
              *[o.at[0] for o in outs])

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)
                        for _ in range(4)),
        in_specs=[tab_spec, leaf_spec, ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
                        for _ in range(4)),
        interpret=_interpret(),
    )(pkt_nodes, pkt_leaves, o_b, d_b, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@jax.custom_vjp
def packet_shadow(origin, direction, dist, pkt_nodes, pkt_leaves,
                  aabb_links, node_begin, node_count,
                  tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    """Shadow packet traversal: (mask_rgb [R,3], mask_a [R]).

    Forward runs the Pallas kernel; backward replays the shadow test through
    the dense differentiable projection path (path-replay backprop) — the
    transmission product over intersected triangles is order-independent, so
    its gradient equals the traversal's wherever the alpha early-out has not
    saturated (where it has, the light term is ~0 anyway)."""
    return _packet_shadow_impl(origin, direction, dist, pkt_nodes, pkt_leaves)


def _shadow_fwd(origin, direction, dist, pkt_nodes, pkt_leaves,
                aabb_links, node_begin, node_count,
                tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    out = _packet_shadow_impl(origin, direction, dist, pkt_nodes, pkt_leaves)
    res = (origin, direction, dist, aabb_links, node_begin, node_count,
           tri_v0, tri_e1, tri_e2, op_rgb, op_a)
    return out, res


def _frames_jnp(v0, e1, e2):
    """Traceable (differentiable) twin of ops.intersect.triangle_frames."""
    n = jnp.cross(e1, e2)
    b = jnp.stack([e1, e2, n], axis=-1)                 # [F,3,3] columns
    det = jnp.linalg.det(b)
    ok = jnp.abs(det) > 1e-30
    b_safe = jnp.where(ok[:, None, None], b, jnp.eye(3, dtype=b.dtype))
    m = jnp.linalg.inv(b_safe)                          # rows: b1, b2, z
    c = -jnp.einsum("fij,fj->fi", m, v0)
    m = jnp.where(ok[:, None, None], m, 0.0)
    c = jnp.where(ok[:, None], c, jnp.asarray([-1.0, -1.0, 1.0]))
    w = jnp.concatenate([m[:, 0, :], m[:, 1, :], m[:, 2, :]], axis=0).T
    cc = jnp.concatenate([c[:, 0], c[:, 1], c[:, 2]], axis=0)
    return w, cc


def _shadow_bwd(res, g):
    (origin, direction, dist, aabb_links, node_begin, node_count,
     tri_v0, tri_e1, tri_e2, op_rgb, op_a) = res

    def f(origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
        tri_pw, tri_pc = _frames_jnp(tri_v0, tri_e1, tri_e2)
        return project_shadow(origin, direction, dist, tri_pw, tri_pc,
                              op_rgb, op_a,
                              chunk=min(512, tri_v0.shape[0]))

    _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     op_rgb, op_a)
    d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_oprgb, d_opa = vjp(g)
    return (d_o, d_d, d_dist, None, None, None, None, None,
            d_v0, d_e1, d_e2, d_oprgb, d_opa)


packet_shadow.defvjp(_shadow_fwd, _shadow_bwd)
