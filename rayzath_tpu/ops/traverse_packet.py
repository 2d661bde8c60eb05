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
* The whole per-node state is ONE 128-lane row of a VMEM-resident table:
  AABB (6), skip links for all 8 octants (16), the 8-triangle leaf block
  (v0/e1/e2 field-major + ids or opacity). A traversal step costs a single
  scalar dynamic-slice (~20 cycles) — not a 262k-row gather — and VMEM holds
  512 B/node, so scenes up to PACKET_MAX_NODES (~50k triangles) stay
  resident. The 128-lane packing matters: narrow tables get padded to 128
  lanes by the tiling anyway (a [8N, 8] layout OOMs VMEM 16x its data size).
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
The shadow kernel carries a custom_vjp whose backward replays the shadow
test through the dense differentiable projection path (path-replay style) —
the transmission product is order-independent, so d(mask)/d(opacity,geometry)
matches wherever the alpha early-out has not saturated (beyond it the light
term is ~0). Shadow opacity lanes are (re)filled in-jit from the live
material table, so material edits and training never see stale opacity.

Used when the scene's table fits VMEM (see PACKET_MAX_NODES); larger scenes
fall back to ops/traverse.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import DET_EPS, BIG, project_shadow

BLOCK = 1024          # rays per grid program (8 sublanes x 128 lanes)
LEAF = 8              # triangles per leaf block
ROW = 128             # table row width (one full lane tile)
PACKET_MAX_NODES = 16384   # table = 512 B/node -> 8 MB VMEM at the cap

# row layout (lane offsets)
L_MIN = 0             # min.xyz
L_MAX = 3             # max.xyz
L_LINK = 6            # (first, skip) x 8 octants -> lanes 6..21
L_AUX = 22            # ids (closest) / op_a (shadow), 8 lanes
L_V0 = 30             # v0.x[8] v0.y[8] v0.z[8]
L_E1 = 54
L_E2 = 78
L_OP = 102            # op.r[8] op.g[8] op.b[8] (shadow only) -> 102..125


def build_packet_table(node_min, node_max, node_begin, node_count,
                       first8, skip8, tri_v0, tri_e1, tri_e2):
    """[N, 128] f32 packet table (geometry + ids; opacity lanes left at 1).

    Row n: AABB, per-octant skip links (first = -1 marks a leaf), the node's
    LEAF-triangle block field-major, triangle ids at L_AUX (-1 padding).
    """
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    node_begin = np.asarray(node_begin, np.int64)
    node_count = np.asarray(node_count, np.int64)
    tri_v0 = np.asarray(tri_v0, np.float32)
    tri_e1 = np.asarray(tri_e1, np.float32)
    tri_e2 = np.asarray(tri_e2, np.float32)
    n = len(node_count)
    leaf = node_count > 0
    tab = np.ones((n, ROW), np.float32)
    tab[:, L_MIN:L_MIN + 3] = node_min
    tab[:, L_MAX:L_MAX + 3] = node_max
    for o in range(8):
        first = np.where(leaf, -1.0, np.asarray(first8[o], np.float32))
        tab[:, L_LINK + 2 * o] = first
        tab[:, L_LINK + 2 * o + 1] = np.asarray(skip8[o], np.float32)

    k = np.arange(LEAF)
    tid = node_begin[:, None] + k[None, :]                  # [N, LEAF]
    valid = leaf[:, None] & (k[None, :] < node_count[:, None])
    n_tri = len(tri_v0)
    tid_c = np.clip(tid, 0, max(n_tri - 1, 0))

    def put(base, arr3):
        for a in range(3):
            v = np.where(valid, arr3[tid_c, a], 0.0)
            tab[:, base + 8 * a:base + 8 * a + 8] = v

    if n_tri:
        put(L_V0, tri_v0)
        put(L_E1, tri_e1)
        put(L_E2, tri_e2)
    tab[:, L_AUX:L_AUX + 8] = np.where(valid, tid_c.astype(np.float32), -1.0)
    return tab


def shadow_table(pkt_tab, op_rgb, op_a):
    """In-jit shadow variant of the packet table: L_AUX lanes become per-
    triangle alpha opacity, L_OP lanes the rgb opacity. Padding slots keep
    opacity 1 (no contribution), so no ids are needed."""
    ids = pkt_tab[:, L_AUX:L_AUX + 8].astype(jnp.int32)     # [N, 8]
    valid = ids >= 0
    ids_c = jnp.clip(ids, 0, op_rgb.shape[0] - 1)
    opa = jnp.where(valid, op_a[ids_c], 1.0)                # [N, 8]
    parts = [pkt_tab[:, :L_AUX], opa, pkt_tab[:, L_AUX + 8:L_OP]]
    for c in range(3):
        parts.append(jnp.where(valid, op_rgb[ids_c, c], 1.0))
    parts.append(pkt_tab[:, L_OP + 24:])
    return jnp.concatenate(parts, axis=1)


def _slab(row, ox, oy, oz, ix, iy, iz):
    """Per-ray slab test of one node AABB (scalars from `row` [1, ROW])."""
    tx1 = (row[0, L_MIN + 0] - ox) * ix
    ty1 = (row[0, L_MIN + 1] - oy) * iy
    tz1 = (row[0, L_MIN + 2] - oz) * iz
    tx2 = (row[0, L_MAX + 0] - ox) * ix
    ty2 = (row[0, L_MAX + 1] - oy) * iy
    tz2 = (row[0, L_MAX + 2] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _links(row, oct_):
    """Block-octant (first, skip) scalars via a static select chain."""
    first = row[0, L_LINK]
    skip = row[0, L_LINK + 1]
    for o in range(1, 8):
        sel = oct_ == o
        first = jnp.where(sel, row[0, L_LINK + 2 * o], first)
        skip = jnp.where(sel, row[0, L_LINK + 2 * o + 1], skip)
    return first, skip


def _mt_scalar_tri(row, k, ox, oy, oz, dx, dy, dz):
    """Moller-Trumbore of leaf triangle k (scalar fields from `row` [1, ROW])
    against all rays ([8,128] registers). Returns (t, bary_ok)."""
    v0x, v0y, v0z = row[0, L_V0 + k], row[0, L_V0 + 8 + k], row[0, L_V0 + 16 + k]
    e1x, e1y, e1z = row[0, L_E1 + k], row[0, L_E1 + 8 + k], row[0, L_E1 + 16 + k]
    e2x, e2y, e2z = row[0, L_E2 + k], row[0, L_E2 + 8 + k], row[0, L_E2 + 16 + k]
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


def _block_octant(dx, dy, dz):
    """Octant (scalar) from the block's first ray."""
    return ((dx[0, 0] < 0).astype(jnp.int32)
            | ((dy[0, 0] < 0).astype(jnp.int32) << 1)
            | ((dz[0, 0] < 0).astype(jnp.int32) << 2))


def _closest_kernel(n_nodes: int, max_steps: int):
    def kern(tab_ref, o_ref, d_ref, nf_ref, t_ref, id_ref):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        near, far = nf_ref[0], nf_ref[1]
        oct_ = _block_octant(dx, dy, dz)

        def body(state):
            it, node, best_t, best_id = state
            row = tab_ref[pl.ds(node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            hit = ((tmax >= near) & (tmin <= tmax)
                   & (tmin <= jnp.minimum(far, best_t)))
            any_hit = jnp.any(hit)
            first, skip = _links(row, oct_)
            is_leaf = first < 0.0

            def leaf_fn(args):
                best_t, best_id = args
                for k in range(LEAF):
                    tid = row[0, L_AUX + k]
                    t, bary_ok = _mt_scalar_tri(row, k, ox, oy, oz, dx, dy, dz)
                    valid = (hit & bary_ok & (tid >= 0.0)
                             & (t > near) & (t < best_t))
                    best_t = jnp.where(valid, t, best_t)
                    best_id = jnp.where(valid, tid, best_id)
                return best_t, best_id

            best_t, best_id = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                (best_t, best_id))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, skip).astype(jnp.int32)
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
    def kern(tab_ref, o_ref, d_ref, nf_ref, mr_ref, mg_ref, mb_ref, ma_ref):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        dist = nf_ref[0]
        oct_ = _block_octant(dx, dy, dz)

        def body(state):
            it, node, mr, mg, mb, ma = state
            row = tab_ref[pl.ds(node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            alive = ma >= 1e-4
            hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist) & alive
            any_hit = jnp.any(hit)
            first, skip = _links(row, oct_)
            is_leaf = first < 0.0

            def leaf_fn(args):
                mr, mg, mb, ma = args
                for k in range(LEAF):
                    t, bary_ok = _mt_scalar_tri(row, k, ox, oy, oz, dx, dy, dz)
                    valid = hit & bary_ok & (t > 0.0) & (t < dist)
                    # padding triangles carry opacity 1 -> no contribution
                    mr = mr * jnp.where(valid, row[0, L_OP + k], 1.0)
                    mg = mg * jnp.where(valid, row[0, L_OP + 8 + k], 1.0)
                    mb = mb * jnp.where(valid, row[0, L_OP + 16 + k], 1.0)
                    ma = ma * jnp.where(valid, row[0, L_AUX + k], 1.0)
                return mr, mg, mb, ma

            mr, mg, mb, ma = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                (mr, mg, mb, ma))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, skip).astype(jnp.int32)
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


def _specs(nb, tab_shape):
    tab_spec = pl.BlockSpec(tab_shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec((1, 2, 8, 128), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
    return tab_spec, ray_spec, nf_spec, out_spec


@jax.jit
def _packet_closest_impl(origin, direction, near, far, pkt_tab):
    R = origin.shape[0]
    n_nodes = pkt_tab.shape[0]
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    # padded rays: far=-1 so they never hit anything
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    max_steps = 4 * n_nodes + 8
    tab_spec, ray_spec, nf_spec, out_spec = _specs(nb, pkt_tab.shape)

    def kern(tab_ref, o_ref, d_ref, nf_ref, t_ref, id_ref):
        inner = _closest_kernel(n_nodes, max_steps)
        inner(tab_ref, o_ref.at[0], d_ref.at[0], nf_ref.at[0],
              t_ref.at[0], id_ref.at[0])

    t, tid = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)),
        in_specs=[tab_spec, ray_spec, ray_spec, nf_spec],
        out_specs=(out_spec, out_spec),
        interpret=_interpret(),
    )(pkt_tab, o_b, d_b, nf_b)
    t = t.reshape(rp)[:R]
    tid = tid.reshape(rp)[:R].astype(jnp.int32)
    return t, tid


def packet_closest(origin, direction, near, far, pkt_tab):
    """Closest-hit packet traversal. Returns (t [R], tri_id [R] i32, -1 miss).

    Discrete output — wrapped in stop_gradient (the integrator re-derives
    differentiable t/b1/b2 from the ids via refine_hit)."""
    t, tid = _packet_closest_impl(
        *map(jax.lax.stop_gradient, (origin, direction, near, far, pkt_tab)))
    return jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid)


@jax.jit
def _packet_shadow_impl(origin, direction, dist, shadow_tab):
    R = origin.shape[0]
    n_nodes = shadow_tab.shape[0]
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    # padded rays: dist=-1 -> no hits
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    max_steps = 4 * n_nodes + 8
    tab_spec, ray_spec, nf_spec, out_spec = _specs(nb, shadow_tab.shape)

    def kern(tab_ref, o_ref, d_ref, nf_ref, *outs):
        inner = _shadow_kernel(n_nodes, max_steps)
        inner(tab_ref, o_ref.at[0], d_ref.at[0], nf_ref.at[0],
              *[o.at[0] for o in outs])

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)
                        for _ in range(4)),
        in_specs=[tab_spec, ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
                        for _ in range(4)),
        interpret=_interpret(),
    )(shadow_tab, o_b, d_b, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@jax.custom_vjp
def packet_shadow(origin, direction, dist, pkt_tab,
                  tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    """Shadow packet traversal: (mask_rgb [R,3], mask_a [R]).

    Forward runs the Pallas kernel on the in-jit shadow table (live opacity);
    backward replays the shadow test through the dense differentiable
    projection path (path-replay backprop) — the transmission product over
    intersected triangles is order-independent, so its gradient equals the
    traversal's wherever the alpha early-out has not saturated (where it has,
    the light term is ~0 anyway)."""
    tab = shadow_table(pkt_tab, op_rgb, op_a)
    return _packet_shadow_impl(origin, direction, dist, tab)


def _shadow_fwd(origin, direction, dist, pkt_tab,
                tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    tab = shadow_table(pkt_tab, op_rgb, op_a)
    out = _packet_shadow_impl(origin, direction, dist, tab)
    res = (origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a)
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
    origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a = res

    def f(origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
        tri_pw, tri_pc = _frames_jnp(tri_v0, tri_e1, tri_e2)
        return project_shadow(origin, direction, dist, tri_pw, tri_pc,
                              op_rgb, op_a,
                              chunk=min(512, tri_v0.shape[0]))

    _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     op_rgb, op_a)
    d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_oprgb, d_opa = vjp(g)
    return (d_o, d_d, d_dist, None, d_v0, d_e1, d_e2, d_oprgb, d_opa)


packet_shadow.defvjp(_shadow_fwd, _shadow_bwd)
