"""Third-generation traversal: shallow BVH with 128-triangle MXU leaves.

Why: the packet walk (ops/traverse_packet.py) is bound by its SERIAL
skip-link iteration — 8-triangle leaves mean thousands of while_loop steps
per block, each a handful of VPU ops, and measured throughput tops out near
5 Mray/s even on perfectly coherent rays. This kernel re-balances the tree
for the hardware: leaves hold up to 128 triangles intersected in ONE step as
two MXU matmuls (the projection-method intersector of ops/intersect.py), so
the tree is ~16x shallower and the serial walk shrinks accordingly; the
per-triangle FLOPs move from the scalar loop onto the systolic array, where
TPU FLOPs are effectively free.

Layout — chosen so nothing ever crosses the sublane/lane boundary (Mosaic
cannot reshape an [8,128] register block into a [1024,1] column):

* a block = 1024 rays ON LANES: o4/d4 are [4, 1024] matrices (x,y,z,1|0);
  per-ray walk state (near, best_t, best_id, shadow masks) is [1, 1024].
* node table [N, 128] rows: AABB + per-octant skip links (the
  traverse_packet row layout) + leaf slot / triangle base at L_AUX.
* leaf table [L, 4, 384]: per leaf, projection frames of <=128 triangles
  (lane blocks [b1 | b2 | z], rows = world x/y/z/offset), so
      ol = dot(lw^T contracted on rows, o4)  -> [384, 1024]
      dl = likewise for d4
  and (t, b1, b2) for all (triangle, ray) pairs follow elementwise on
  [128, 1024] tiles — triangles on sublanes, rays on lanes.
* triangle ids need NO table and NO gather: the BVH build reorders triangles
  so each leaf's are contiguous, so the winner is leaf_base + sublane-iota
  resolved by a min-reduction over sublanes. The kernel emits REORDERED ids;
  wrappers map them back through the build permutation outside the kernel.
* the per-ray AABB 'hit' gate of the packet kernels is intentionally
  dropped: a ray whose (near, min(far, best_t)) segment misses a node's AABB
  cannot intersect triangles contained in it, so masking by t alone yields
  the identical closest hit; the walk decision itself only needs the
  block-level any().
* shadow opacity: per-leaf [4, 128] rgba rows (filled in-jit from the live
  material table — edits/training never stale) are transposed to [128, 4]
  columns with ONE matmul against a constant identity (the MXU as a
  transpose engine), broadcast against the [128, 1024] hit mask, and
  product-reduced over sublanes by a 7-step halving tree (Mosaic has no
  native multiply-reduce).

Scenes whose leaf table exceeds MXLEAF_RESIDENT_LEAVES stream each visited
leaf (6 KB) from HBM into VMEM scratch (pltpu.make_async_copy), so scene
size is HBM-bound; the node table (~512 B per ~128 triangles) stays resident
far past a million triangles.

Reference behavior covered: closest-hit walk (cuda_bvh.cuh:114-171) and the
transmission-accumulating any-hit shadow walk with early-out at
alpha < 1e-4 (cuda_bvh.cuh:172-232). Gradients follow the established
pattern: closest ids are discrete (stop_gradient + differentiable refine in
the integrator); the shadow kernel carries a custom_vjp replaying the test
through the dense differentiable projection path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import build_bvh, compute_skip_links, triangle_aabbs
from .intersect import DET_EPS, BIG, triangle_frames, project_shadow
from .traverse_packet import (_frames_jnp, _interpret, _links, _slab,
                              L_LINK, L_MIN, L_MAX)

BLOCK = 1024          # rays per grid program (all on lanes)
LEAF_T = 128          # triangles per leaf (one full lane tile per part)
ROW = 128             # node-table row width
L_AUX = 22            # node row: leaf slot at L_AUX, triangle base at L_AUX+1
MXLEAF_RESIDENT_LEAVES = 1536   # 6 KB/leaf -> 9 MB VMEM at the cap
_ID_BIG = float(2 ** 30)


def build_mxleaf_tables(tri_v0, tri_e1, tri_e2):
    """Host build.

    Returns (node_tab [N,128] f32, leaf_w [L,4,384] f32, order [T] i32,
    leaf_base [L] i32, leaf_count [L] i32). ``order`` maps reordered ->
    original triangle index."""
    tri_v0 = np.asarray(tri_v0, np.float32)
    tri_e1 = np.asarray(tri_e1, np.float32)
    tri_e2 = np.asarray(tri_e2, np.float32)
    t_count = len(tri_v0)
    pmin, pmax = triangle_aabbs(tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2)
    bvh = build_bvh(pmin, pmax, leaf_size=LEAF_T)
    order = bvh.order if t_count else np.zeros(0, np.int32)
    v0, e1, e2 = tri_v0[order], tri_e1[order], tri_e2[order]
    first8, skip8 = compute_skip_links(bvh.node_begin, bvh.node_count,
                                       bvh.node_axis)

    n = bvh.n_nodes
    leaf = bvh.node_count > 0
    leaf_slot = np.cumsum(leaf) - 1                    # node -> leaf slot
    n_leaves = int(leaf.sum())
    tab = np.zeros((n, ROW), np.float32)
    tab[:, L_MIN:L_MIN + 3] = bvh.node_min
    tab[:, L_MAX:L_MAX + 3] = bvh.node_max
    for o in range(8):
        tab[:, L_LINK + 2 * o] = np.where(leaf, -1.0,
                                          np.asarray(first8[o], np.float32))
        tab[:, L_LINK + 2 * o + 1] = np.asarray(skip8[o], np.float32)
    tab[:, L_AUX] = np.where(leaf, leaf_slot.astype(np.float32), -1.0)
    tab[:, L_AUX + 1] = np.where(leaf, bvh.node_begin.astype(np.float32), 0.0)

    lw = np.zeros((max(n_leaves, 1), 4, 3 * LEAF_T), np.float32)
    # never-hit padding frames: w = 0, c = (-1, -1, 1) => b1 = -1 everywhere
    lw[:, 3, 0 * LEAF_T:1 * LEAF_T] = -1.0
    lw[:, 3, 1 * LEAF_T:2 * LEAF_T] = -1.0
    lw[:, 3, 2 * LEAF_T:3 * LEAF_T] = 1.0
    leaf_base = np.zeros(max(n_leaves, 1), np.int32)
    leaf_count = np.zeros(max(n_leaves, 1), np.int32)
    if t_count:
        w_all, c_all = triangle_frames(v0, e1, e2)     # [3, 3T], [3T]
        for node in np.nonzero(leaf)[0]:
            s = leaf_slot[node]
            b = int(bvh.node_begin[node])
            c = int(bvh.node_count[node])
            leaf_base[s] = b
            leaf_count[s] = c
            for a in range(3):                          # local coord part
                cols = slice(a * t_count + b, a * t_count + b + c)
                lw[s, 0:3, a * LEAF_T:a * LEAF_T + c] = w_all[:, cols]
                lw[s, 3, a * LEAF_T:a * LEAF_T + c] = c_all[cols]
    return tab, lw, order.astype(np.int32), leaf_base, leaf_count


def leaf_opacity(op_rgb, op_a, order, leaf_base, leaf_count):
    """In-jit [L, 4, 128] per-leaf rgba opacity rows from the live material
    opacity tables (original triangle order). Padding slots get 1."""
    ops = jnp.concatenate([op_rgb, op_a[:, None]], axis=1)[order]   # [T,4]
    idx = leaf_base[:, None] + jnp.arange(LEAF_T)[None, :]          # [L,128]
    valid = jnp.arange(LEAF_T)[None, :] < leaf_count[:, None]
    idx = jnp.clip(idx, 0, max(ops.shape[0] - 1, 0))
    vals = jnp.where(valid[:, :, None], ops[idx], 1.0)              # [L,128,4]
    return jnp.transpose(vals, (0, 2, 1))                           # [L,4,128]


def _ray_rows(o4, d4):
    ox, oy, oz = o4[0:1, :], o4[1:2, :], o4[2:3, :]
    dx, dy, dz = d4[0:1, :], d4[1:2, :], d4[2:3, :]
    eps = 1e-12

    def inv1(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v < 0, -eps, eps), v)

    return ox, oy, oz, dx, dy, dz, inv1(dx), inv1(dy), inv1(dz)


def _octant(dx, dy, dz):
    return ((dx[0, 0] < 0).astype(jnp.int32)
            | ((dy[0, 0] < 0).astype(jnp.int32) << 1)
            | ((dz[0, 0] < 0).astype(jnp.int32) << 2))


def _project_leaf(lw, o4, d4, near, limit):
    """(t, valid) of <=128 leaf triangles against the block: [128, 1024]."""
    dims = (((0,), (0,)), ((), ()))
    ol = jax.lax.dot_general(lw, o4, dims,
                             preferred_element_type=jnp.float32)   # [384,1024]
    dl = jax.lax.dot_general(lw, d4, dims,
                             preferred_element_type=jnp.float32)
    olx, oly, olz = ol[0:LEAF_T], ol[LEAF_T:2 * LEAF_T], ol[2 * LEAF_T:]
    dlx, dly, dlz = dl[0:LEAF_T], dl[LEAF_T:2 * LEAF_T], dl[2 * LEAF_T:]
    dlz = dlz + jnp.where(jnp.abs(dlz) < DET_EPS, DET_EPS, 0.0)
    t = -olz / dlz
    b1 = olx + t * dlx
    b2 = oly + t * dly
    valid = ((b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
             & (t > near) & (t < limit))
    return t, valid


def _leaf_loader(streamed, lw_ref, scratch):
    if not streamed:
        return lambda slot: lw_ref[pl.ds(slot, 1), :, :][0]
    buf, sem = scratch

    def load(slot):
        dma = pltpu.make_async_copy(lw_ref.at[pl.ds(slot, 1)], buf, sem)
        dma.start()
        dma.wait()
        return buf[0]
    return load


def _closest_kernel(n_nodes: int, max_steps: int, streamed: bool):
    def kern(tab_ref, lw_ref, o4_ref, d4_ref, nf_ref, t_ref, id_ref,
             *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows(o4, d4)
        near, far = nf_ref[0:1, :], nf_ref[1:2, :]
        oct_ = _octant(dx, dy, dz)
        load_leaf = _leaf_loader(streamed, lw_ref, scratch)
        sub_ids = jax.lax.broadcasted_iota(
            jnp.int32, (LEAF_T, BLOCK), 0).astype(jnp.float32)

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
                slot = row[0, L_AUX].astype(jnp.int32)
                base = row[0, L_AUX + 1]
                lw = load_leaf(slot)
                t, valid = _project_leaf(lw, o4, d4, near, best_t)
                tm = jnp.where(valid, t, BIG)
                t_new = jnp.min(tm, axis=0, keepdims=True)       # [1,1024]
                got = t_new < BIG * 0.5
                ids = jnp.where(tm == t_new, sub_ids + base, _ID_BIG)
                id_new = jnp.min(ids, axis=0, keepdims=True)
                best_id = jnp.where(got, id_new, best_id)
                best_t = jnp.where(got, t_new, best_t)
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
            (jnp.int32(0), jnp.int32(0), jnp.minimum(far, BIG),
             jnp.full((1, BLOCK), -1.0, jnp.float32)))
        t_ref[:] = best_t
        id_ref[:] = best_id
    return kern


def _prod_sublanes(x):
    """Product over the sublane axis of [128, 1024] by halving (7 static
    steps); Mosaic has no native multiply-reduce."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        x = x[:h] * x[h:n]
        n = h
    return x                                            # [1, 1024]


def _shadow_kernel(n_nodes: int, max_steps: int, streamed: bool):
    def kern(tab_ref, lw_ref, op_ref, o4_ref, d4_ref, nf_ref,
             mr_ref, mg_ref, mb_ref, ma_ref, *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows(o4, d4)
        dist = nf_ref[0:1, :]
        oct_ = _octant(dx, dy, dz)
        load_leaf = _leaf_loader(streamed, lw_ref, scratch)
        r128 = jax.lax.broadcasted_iota(jnp.int32, (LEAF_T, LEAF_T), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (LEAF_T, LEAF_T), 1)
        eye = (r128 == c128).astype(jnp.float32)
        zero = jnp.zeros((1, BLOCK), jnp.float32)

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
                slot = row[0, L_AUX].astype(jnp.int32)
                lw = load_leaf(slot)
                t, valid = _project_leaf(lw, o4, d4, zero, dist)
                # [4,128] rgba rows -> [128,4] columns via MXU transpose
                oprows = op_ref[pl.ds(slot, 1), :, :][0]
                opc = jax.lax.dot_general(
                    eye, oprows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)            # [128,4]
                mr = mr * _prod_sublanes(
                    jnp.where(valid, opc[:, 0:1], 1.0))
                mg = mg * _prod_sublanes(
                    jnp.where(valid, opc[:, 1:2], 1.0))
                mb = mb * _prod_sublanes(
                    jnp.where(valid, opc[:, 2:3], 1.0))
                ma = ma * _prod_sublanes(
                    jnp.where(valid, opc[:, 3:4], 1.0))
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

        ones = jnp.ones((1, BLOCK), jnp.float32)
        _, _, mr, mg, mb, ma = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.int32(0), ones, ones, ones, ones))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


def _ray_mats(v, last: float, rp: int):
    """[R,3] -> [nb, 4, 1024] with a constant 4th row (1 for origins, 0 for
    directions — the projection offset row)."""
    r = v.shape[0]
    v = jnp.pad(v, ((0, rp - r), (0, 0)))
    m = jnp.concatenate([v, jnp.full((rp, 1), last, v.dtype)], axis=1)
    return m.T.reshape(4, rp // BLOCK, BLOCK).transpose(1, 0, 2)


def _common_specs(streamed: bool, tab_shape, lw_shape):
    tab_spec = pl.BlockSpec(tab_shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    lw_spec = pl.BlockSpec(lw_shape, lambda i: (0, 0, 0),
                           memory_space=pl.ANY if streamed else pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 4, BLOCK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec((1, 2, BLOCK), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
    return tab_spec, lw_spec, ray_spec, nf_spec, out_spec


def _scratch(streamed: bool):
    if not streamed:
        return []
    return [pltpu.VMEM((1, 4, 3 * LEAF_T), jnp.float32),
            pltpu.SemaphoreType.DMA]


@jax.jit
def _mx_closest_impl(origin, direction, near, far, node_tab, leaf_w):
    R = origin.shape[0]
    n_nodes = node_tab.shape[0]
    streamed = leaf_w.shape[0] > MXLEAF_RESIDENT_LEAVES
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    tab_spec, lw_spec, ray_spec, nf_spec, out_spec = _common_specs(
        streamed, node_tab.shape, leaf_w.shape)

    def kern(tab_ref, lw_ref, o4_ref, d4_ref, nf_ref, t_ref, id_ref,
             *scratch):
        inner = _closest_kernel(n_nodes, 4 * n_nodes + 8, streamed)
        inner(tab_ref, lw_ref, o4_ref.at[0], d4_ref.at[0], nf_ref.at[0],
              t_ref.at[0], id_ref.at[0], *scratch)

    t, tid = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)),
        in_specs=[tab_spec, lw_spec, ray_spec, ray_spec, nf_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(node_tab, leaf_w, o4, d4, nf_b)
    return t.reshape(rp)[:R], tid.reshape(rp)[:R].astype(jnp.int32)


def mx_closest(origin, direction, near, far, node_tab, leaf_w, order):
    """Closest hit. Returns (t [R], tri_id [R] i32 in ORIGINAL order, -1 =
    miss). Discrete output — wrapped in stop_gradient (the integrator
    re-derives differentiable t/b1/b2 from the ids via refine_hit)."""
    t, rid = _mx_closest_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, node_tab, leaf_w)))
    tid = jnp.where(rid >= 0, order[jnp.clip(rid, 0, order.shape[0] - 1)], -1)
    return jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid)


@jax.jit
def _mx_shadow_impl(origin, direction, dist, node_tab, leaf_w, op_tab):
    R = origin.shape[0]
    n_nodes = node_tab.shape[0]
    streamed = leaf_w.shape[0] > MXLEAF_RESIDENT_LEAVES
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    tab_spec, lw_spec, ray_spec, nf_spec, out_spec = _common_specs(
        streamed, node_tab.shape, leaf_w.shape)
    op_spec = pl.BlockSpec(op_tab.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(tab_ref, lw_ref, op_ref, o4_ref, d4_ref, nf_ref, *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel(n_nodes, 4 * n_nodes + 8, streamed)
        inner(tab_ref, lw_ref, op_ref, o4_ref.at[0], d4_ref.at[0],
              nf_ref.at[0], *[o.at[0] for o in outs], *scratch)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(4)),
        in_specs=[tab_spec, lw_spec, op_spec, ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(4)),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(node_tab, leaf_w, op_tab, o4, d4, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@jax.custom_vjp
def mx_shadow(origin, direction, dist, node_tab, leaf_w, order,
              leaf_base, leaf_count, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    """Shadow traversal: (mask_rgb [R,3], mask_a [R]).

    Forward runs the Pallas kernel with the in-jit leaf opacity table (live
    material values); backward replays through the dense differentiable
    projection path (path-replay, same argument as packet_shadow: the
    transmission product is order-independent, so the gradient matches
    wherever the alpha early-out has not saturated)."""
    op_tab = leaf_opacity(op_rgb, op_a, order, leaf_base, leaf_count)
    return _mx_shadow_impl(origin, direction, dist, node_tab, leaf_w, op_tab)


def _mx_shadow_fwd(origin, direction, dist, node_tab, leaf_w, order,
                   leaf_base, leaf_count, tri_v0, tri_e1, tri_e2,
                   op_rgb, op_a):
    out = mx_shadow(origin, direction, dist, node_tab, leaf_w, order,
                    leaf_base, leaf_count, tri_v0, tri_e1, tri_e2,
                    op_rgb, op_a)
    return out, (origin, direction, dist, tri_v0, tri_e1, tri_e2,
                 op_rgb, op_a)


def _mx_shadow_bwd(res, g):
    origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a = res

    def f(origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
        pw, pc = _frames_jnp(tri_v0, tri_e1, tri_e2)
        return project_shadow(origin, direction, dist, pw, pc, op_rgb, op_a,
                              chunk=min(512, tri_v0.shape[0]))

    _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     op_rgb, op_a)
    d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_oprgb, d_opa = vjp(g)
    return (d_o, d_d, d_dist, None, None, None, None, None,
            d_v0, d_e1, d_e2, d_oprgb, d_opa)


mx_shadow.defvjp(_mx_shadow_fwd, _mx_shadow_bwd)
