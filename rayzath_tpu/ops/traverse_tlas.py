"""Two-level packet traversal (TLAS -> instance transform -> segmented BLAS)
as Pallas TPU kernels.

The instancing counterpart of ops/traverse_packet.py, covering the reference's
TLAS walk + per-instance object-space BLAS walk (cuda_bvh.cuh:114-232,
cuda_instance.cuh:35-264) without duplicating shared meshes:

* Blocks of 1024 rays run ONE shared skip-link walk over the VMEM-resident
  TLAS (built over instance x segment units, ops/segments.py). Per-ray hit
  masks keep semantics exact; only the visit order is shared.
* At a TLAS leaf, each referenced unit is visited under ``lax.cond``: the
  block's rays are transformed into the instance's object space with the 12
  scalars of the unit row (the reference's ray->object transform,
  cuda_instance.cuh:186-229; ray direction is NOT renormalized, so the hit
  parameter t stays world-metric and best-t pruning crosses instances), then
  the segment's packet rows are walked exactly like traverse_packet.
* Segment rows live either fully VMEM-resident (small scenes: direct dynamic
  row indexing) or in HBM, DMA-streamed one segment per visit into a VMEM
  scratch buffer (``make_async_copy``) — this is what lets the fast kernel
  scale to scenes far beyond VMEM.
* Shadow rays resolve per-triangle opacity through the instance's material
  slots at runtime: the row stores the mesh-local slot, and a [I*4, 128]
  opacity table (built in-jit from the live material table, so edits and
  training are never stale) is read with a lane-masked reduction — no
  gathers, no per-instance row duplication.

Gradients mirror traverse_packet: closest-hit ids are discrete
(stop_gradient; the integrator re-derives t/b1/b2 via world-transformed
refine), the shadow kernel carries a custom_vjp that replays the test through
the dense differentiable projection path over the expanded (instance,
triangle) set.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect import BIG, project_shadow
from .traverse_packet import (BLOCK, L_AUX, _block_octant, _frames_jnp,
                              _interpret, _links, _mt_scalar_tri, _ray_regs,
                              _slab, _vec_to_blocks)
from .segments import L_SLOT, L_UNIT, U_AINV, U_BINV, U_BASE, U_COUNT, U_INST

# segment rows resident in VMEM up to this many (512 B each -> 8 MB at cap);
# beyond it the kernel streams segments from HBM
RESIDENT_MAX_ROWS = 16384


def _transform_rays(urow, ox, oy, oz, dx, dy, dz):
    """Rays -> object space with the unit row's world->object transform.
    Returns transformed (o, d, 1/d) registers; t is invariant because the
    direction is transformed without renormalization."""
    a = [urow[0, U_AINV + i] for i in range(9)]
    b = [urow[0, U_BINV + i] for i in range(3)]
    tox = a[0] * ox + a[1] * oy + a[2] * oz + b[0]
    toy = a[3] * ox + a[4] * oy + a[5] * oz + b[1]
    toz = a[6] * ox + a[7] * oy + a[8] * oz + b[2]
    tdx = a[0] * dx + a[1] * dy + a[2] * dz
    tdy = a[3] * dx + a[4] * dy + a[5] * dz
    tdz = a[6] * dx + a[7] * dy + a[8] * dz
    eps = 1e-12

    def inv1(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v < 0, -eps, eps), v)

    return tox, toy, toz, tdx, tdy, tdz, inv1(tdx), inv1(tdy), inv1(tdz)


def _row_reader(streamed, blas_ref, scratch, base, seg_nodes):
    """Returns row_of(local_node) -> [1, 128]. Streamed mode first DMAs the
    whole segment (fixed seg_nodes rows from a dynamic base; the table is
    host-padded so the copy never runs off the end) into VMEM scratch."""
    if not streamed:
        return lambda ln: blas_ref[pl.ds(base + ln, 1), :]
    seg_buf, sem = scratch
    dma = pltpu.make_async_copy(blas_ref.at[pl.ds(base, seg_nodes)],
                                seg_buf, sem)
    dma.start()
    dma.wait()
    return lambda ln: seg_buf[pl.ds(ln, 1), :]


def _closest_kernel(tn: int, seg_nodes: int, streamed: bool):
    def kern(tlas_ref, unit_ref, blas_ref, o_ref, d_ref, nf_ref,
             t_ref, id_ref, in_ref, *scratch):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        near, far = nf_ref[0], nf_ref[1]
        oct_w = _block_octant(dx, dy, dz)

        def walk_unit(u, carry):
            best_t, best_id, best_in = carry
            urow = unit_ref[pl.ds(u, 1), :]
            tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz = _transform_rays(
                urow, ox, oy, oz, dx, dy, dz)
            base = urow[0, U_BASE].astype(jnp.int32)
            cnt = urow[0, U_COUNT].astype(jnp.int32)
            inst = urow[0, U_INST]
            oct_l = _block_octant(tdx, tdy, tdz)
            row_of = _row_reader(streamed, blas_ref, scratch, base, seg_nodes)

            def body(state):
                it, lnode, bt, bi, bn = state
                row = row_of(lnode)
                tmin, tmax = _slab(row, tox, toy, toz, tix, tiy, tiz)
                hit = ((tmax >= near) & (tmin <= tmax)
                       & (tmin <= jnp.minimum(far, bt)))
                any_hit = jnp.any(hit)
                first, skip = _links(row, oct_l)
                is_leaf = first < 0.0

                def leaf_fn(args):
                    bt, bi, bn = args
                    for k in range(8):
                        tid = row[0, L_AUX + k]
                        t, ok = _mt_scalar_tri(row, k, tox, toy, toz,
                                               tdx, tdy, tdz)
                        valid = hit & ok & (tid >= 0.0) & (t > near) & (t < bt)
                        bt = jnp.where(valid, t, bt)
                        bi = jnp.where(valid, tid, bi)
                        bn = jnp.where(valid, inst, bn)
                    return bt, bi, bn

                bt, bi, bn = jax.lax.cond(
                    jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                    (bt, bi, bn))
                nxt = jnp.where(jnp.logical_and(any_hit,
                                                jnp.logical_not(is_leaf)),
                                first, skip).astype(jnp.int32)
                return it + 1, nxt, bt, bi, bn

            def cond(state):
                it, lnode, *_ = state
                return jnp.logical_and(lnode < cnt, it < 2 * seg_nodes + 8)

            _, _, bt, bi, bn = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0),
                             best_t, best_id, best_in))
            return bt, bi, bn

        def outer_body(state):
            it, node, best_t, best_id, best_in = state
            row = tlas_ref[pl.ds(node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            hit = ((tmax >= near) & (tmin <= tmax)
                   & (tmin <= jnp.minimum(far, best_t)))
            any_hit = jnp.any(hit)
            first, skip = _links(row, oct_w)
            is_leaf = first < 0.0

            def leaf_fn(carry):
                for k in range(8):
                    u = row[0, L_UNIT + k]
                    carry = jax.lax.cond(
                        u >= 0.0,
                        lambda c: walk_unit(u.astype(jnp.int32), c),
                        lambda c: c, carry)
                return carry

            best_t, best_id, best_in = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda c: c,
                (best_t, best_id, best_in))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, skip).astype(jnp.int32)
            return it + 1, nxt, best_t, best_id, best_in

        def outer_cond(state):
            it, node, *_ = state
            return jnp.logical_and(node < tn, it < 2 * tn + 8)

        neg = jnp.full((8, 128), -1.0, jnp.float32)
        _, _, bt, bi, bn = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.int32(0), jnp.int32(0), jnp.minimum(far, BIG), neg, neg))
        t_ref[:] = bt
        id_ref[:] = bi
        in_ref[:] = bn
    return kern


def _shadow_kernel(tn: int, seg_nodes: int, streamed: bool):
    def kern(tlas_ref, unit_ref, blas_ref, opa_ref, o_ref, d_ref, nf_ref,
             mr_ref, mg_ref, mb_ref, ma_ref, *scratch):
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_regs(o_ref, d_ref)
        dist = nf_ref[0]
        oct_w = _block_octant(dx, dy, dz)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

        def walk_unit(u, carry):
            mr, mg, mb, ma = carry
            urow = unit_ref[pl.ds(u, 1), :]
            tox, toy, toz, tdx, tdy, tdz, tix, tiy, tiz = _transform_rays(
                urow, ox, oy, oz, dx, dy, dz)
            base = urow[0, U_BASE].astype(jnp.int32)
            cnt = urow[0, U_COUNT].astype(jnp.int32)
            inst = urow[0, U_INST].astype(jnp.int32)
            oct_l = _block_octant(tdx, tdy, tdz)
            row_of = _row_reader(streamed, blas_ref, scratch, base, seg_nodes)
            # the instance's slot -> opacity rows (one [1,128] row per channel)
            orows = [opa_ref[pl.ds(inst * 4 + c, 1), :] for c in range(4)]

            def opacity(slot, c):
                sel = lane == slot.astype(jnp.int32)
                return jnp.sum(jnp.where(sel, orows[c], 0.0))

            def body(state):
                it, lnode, mr, mg, mb, ma = state
                row = row_of(lnode)
                tmin, tmax = _slab(row, tox, toy, toz, tix, tiy, tiz)
                alive = ma >= 1e-4
                hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist) & alive
                any_hit = jnp.any(hit)
                first, skip = _links(row, oct_l)
                is_leaf = first < 0.0

                def leaf_fn(args):
                    mr, mg, mb, ma = args
                    for k in range(8):
                        tid = row[0, L_AUX + k]
                        slot = row[0, L_SLOT + k]
                        t, ok = _mt_scalar_tri(row, k, tox, toy, toz,
                                               tdx, tdy, tdz)
                        valid = (hit & ok & (tid >= 0.0)
                                 & (t > 0.0) & (t < dist))
                        mr = mr * jnp.where(valid, opacity(slot, 0), 1.0)
                        mg = mg * jnp.where(valid, opacity(slot, 1), 1.0)
                        mb = mb * jnp.where(valid, opacity(slot, 2), 1.0)
                        ma = ma * jnp.where(valid, opacity(slot, 3), 1.0)
                    return mr, mg, mb, ma

                mr, mg, mb, ma = jax.lax.cond(
                    jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda a: a,
                    (mr, mg, mb, ma))
                nxt = jnp.where(jnp.logical_and(any_hit,
                                                jnp.logical_not(is_leaf)),
                                first, skip).astype(jnp.int32)
                return it + 1, nxt, mr, mg, mb, ma

            def cond(state):
                it, lnode, mr, mg, mb, ma = state
                return jnp.logical_and(
                    jnp.logical_and(lnode < cnt, it < 2 * seg_nodes + 8),
                    jnp.max(ma) >= 1e-4)

            _, _, mr, mg, mb, ma = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), mr, mg, mb, ma))
            return mr, mg, mb, ma

        def outer_body(state):
            it, node, mr, mg, mb, ma = state
            row = tlas_ref[pl.ds(node, 1), :]
            tmin, tmax = _slab(row, ox, oy, oz, ix, iy, iz)
            alive = ma >= 1e-4
            hit = (tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist) & alive
            any_hit = jnp.any(hit)
            first, skip = _links(row, oct_w)
            is_leaf = first < 0.0

            def leaf_fn(carry):
                for k in range(8):
                    u = row[0, L_UNIT + k]
                    carry = jax.lax.cond(
                        u >= 0.0,
                        lambda c: walk_unit(u.astype(jnp.int32), c),
                        lambda c: c, carry)
                return carry

            mr, mg, mb, ma = jax.lax.cond(
                jnp.logical_and(is_leaf, any_hit), leaf_fn, lambda c: c,
                (mr, mg, mb, ma))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, skip).astype(jnp.int32)
            return it + 1, nxt, mr, mg, mb, ma

        def outer_cond(state):
            it, node, mr, mg, mb, ma = state
            return jnp.logical_and(
                jnp.logical_and(node < tn, it < 2 * tn + 8),
                jnp.max(ma) >= 1e-4)

        ones = jnp.ones((8, 128), jnp.float32)
        _, _, mr, mg, mb, ma = jax.lax.while_loop(
            outer_cond, outer_body,
            (jnp.int32(0), jnp.int32(0), ones, ones, ones, ones))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


def _table_specs(streamed: bool, *shapes):
    """Whole-table BlockSpecs; segment rows stay in HBM when streamed."""
    spaces = [pltpu.VMEM, pltpu.VMEM, pl.ANY if streamed else pltpu.VMEM]
    return [pl.BlockSpec(s, lambda i: (0, 0), memory_space=sp)
            for s, sp in zip(shapes, spaces)]


def _ray_specs():
    ray = pl.BlockSpec((1, 3, 8, 128), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    nf = pl.BlockSpec((1, 2, 8, 128), lambda i: (i, 0, 0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
    return ray, nf, out


def _scratch(streamed: bool, seg_nodes: int):
    if not streamed:
        return []
    return [pltpu.VMEM((seg_nodes, 128), jnp.float32),
            pltpu.SemaphoreType.DMA]


@partial(jax.jit, static_argnames=("seg_nodes",))
def _tlas_closest_impl(origin, direction, near, far,
                       tlas_tab, unit_tab, seg_rows, seg_nodes: int):
    R = origin.shape[0]
    tn = tlas_tab.shape[0]
    streamed = seg_rows.shape[0] > RESIDENT_MAX_ROWS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    ray_spec, nf_spec, out_spec = _ray_specs()
    tab_specs = _table_specs(streamed, tlas_tab.shape, unit_tab.shape,
                             seg_rows.shape)

    def kern(tlas_ref, unit_ref, blas_ref, o_ref, d_ref, nf_ref,
             t_ref, id_ref, in_ref, *scratch):
        inner = _closest_kernel(tn, seg_nodes, streamed)
        inner(tlas_ref, unit_ref, blas_ref, o_ref.at[0], d_ref.at[0],
              nf_ref.at[0], t_ref.at[0], id_ref.at[0], in_ref.at[0], *scratch)

    t, tid, inst = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)
                        for _ in range(3)),
        in_specs=tab_specs + [ray_spec, ray_spec, nf_spec],
        out_specs=(out_spec, out_spec, out_spec),
        scratch_shapes=_scratch(streamed, seg_nodes),
        interpret=_interpret(),
    )(tlas_tab, unit_tab, seg_rows, o_b, d_b, nf_b)
    t = t.reshape(rp)[:R]
    tid = tid.reshape(rp)[:R].astype(jnp.int32)
    inst = inst.reshape(rp)[:R].astype(jnp.int32)
    return t, tid, inst


def tlas_closest(origin, direction, near, far, tlas_tab, unit_tab, seg_rows,
                 seg_nodes: int):
    """Two-level closest hit. Returns (t [R], tri_id [R] i32, inst_id [R] i32;
    -1 = miss). Discrete output — wrapped in stop_gradient (the integrator
    re-derives differentiable t/b1/b2 from the ids via a world-space refine)."""
    args = map(jax.lax.stop_gradient,
               (origin, direction, near, far, tlas_tab, unit_tab, seg_rows))
    t, tid, inst = _tlas_closest_impl(*args, seg_nodes=seg_nodes)
    return (jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid),
            jax.lax.stop_gradient(inst))


def build_opacity_rows(op_rgb_is, op_a_is):
    """[I*4, 128] opacity rows from per-(instance, slot) opacity
    ([I,64,3] rgb, [I,64] a): lane s<64 of row i*4+c holds channel c of
    instance i slot s; lanes >= 64 are 1 (never selected)."""
    i = op_rgb_is.shape[0]
    vals = jnp.concatenate([op_rgb_is, op_a_is[..., None]], axis=-1)  # [I,64,4]
    rows = jnp.transpose(vals, (0, 2, 1)).reshape(i * 4, 64)
    return jnp.concatenate([rows, jnp.ones((i * 4, 64), jnp.float32)], axis=1)


@partial(jax.jit, static_argnames=("seg_nodes",))
def _tlas_shadow_impl(origin, direction, dist, tlas_tab, unit_tab, seg_rows,
                      opa_rows, seg_nodes: int):
    R = origin.shape[0]
    tn = tlas_tab.shape[0]
    streamed = seg_rows.shape[0] > RESIDENT_MAX_ROWS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    ray_spec, nf_spec, out_spec = _ray_specs()
    tab_specs = _table_specs(streamed, tlas_tab.shape, unit_tab.shape,
                             seg_rows.shape)
    opa_spec = pl.BlockSpec(opa_rows.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    def kern(tlas_ref, unit_ref, blas_ref, opa_ref, o_ref, d_ref, nf_ref,
             *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel(tn, seg_nodes, streamed)
        inner(tlas_ref, unit_ref, blas_ref, opa_ref, o_ref.at[0], d_ref.at[0],
              nf_ref.at[0], *[o.at[0] for o in outs], *scratch)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32)
                        for _ in range(4)),
        in_specs=tab_specs + [opa_spec, ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))
                        for _ in range(4)),
        scratch_shapes=_scratch(streamed, seg_nodes),
        interpret=_interpret(),
    )(tlas_tab, unit_tab, seg_rows, opa_rows, o_b, d_b, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@partial(jax.custom_vjp, nondiff_argnums=(13,))
def tlas_shadow(origin, direction, dist, tlas_tab, unit_tab, seg_rows,
                op_rgb_is, op_a_is, tri_v0, tri_e1, tri_e2, tri_slot,
                replay, seg_nodes):
    """Two-level shadow traversal: (mask_rgb [R,3], mask_a [R]).

    ``op_rgb_is``/``op_a_is`` are the live per-(instance, slot) opacities
    ([I,64,3]/[I,64]); ``replay`` = (exp_tri, exp_inst, inst_fwd) drives the
    backward pass: the dense differentiable projection replay over the
    expanded (instance, triangle) set (path-replay style, the same argument
    as packet_shadow: the transmission product is order-independent, so the
    gradient matches wherever the alpha early-out has not saturated)."""
    rows = build_opacity_rows(op_rgb_is, op_a_is)
    return _tlas_shadow_impl(origin, direction, dist, tlas_tab, unit_tab,
                             seg_rows, rows, seg_nodes=seg_nodes)


def _shadow_fwd(origin, direction, dist, tlas_tab, unit_tab, seg_rows,
                op_rgb_is, op_a_is, tri_v0, tri_e1, tri_e2, tri_slot,
                replay, seg_nodes):
    out = tlas_shadow(origin, direction, dist, tlas_tab, unit_tab, seg_rows,
                      op_rgb_is, op_a_is, tri_v0, tri_e1, tri_e2, tri_slot,
                      replay, seg_nodes)
    res = (origin, direction, dist, op_rgb_is, op_a_is,
           tri_v0, tri_e1, tri_e2, tri_slot, replay)
    return out, res


def _shadow_bwd(seg_nodes, res, g):
    (origin, direction, dist, op_rgb_is, op_a_is,
     tri_v0, tri_e1, tri_e2, tri_slot, replay) = res
    exp_tri, exp_inst, inst_fwd = replay

    def f(origin, direction, dist, tri_v0, tri_e1, tri_e2,
          op_rgb_is, op_a_is):
        a = inst_fwd[exp_inst].reshape(-1, 3, 4)          # [K,3,4]
        lin = a[:, :, :3]

        def l2g(v, translate):
            w = jnp.einsum("kij,kj->ki", lin, v[exp_tri])
            return w + a[:, :, 3] if translate else w

        v0w = l2g(tri_v0, True)
        e1w = l2g(tri_e1, False)
        e2w = l2g(tri_e2, False)
        slot = tri_slot[exp_tri]
        oprgb = op_rgb_is[exp_inst, slot]
        opa = op_a_is[exp_inst, slot]
        pw, pc = _frames_jnp(v0w, e1w, e2w)
        return project_shadow(origin, direction, dist, pw, pc, oprgb, opa,
                              chunk=min(512, v0w.shape[0]))

    _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     op_rgb_is, op_a_is)
    d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_oprgb, d_opa = vjp(g)
    return (d_o, d_d, d_dist, None, None, None, d_oprgb, d_opa,
            d_v0, d_e1, d_e2, None, None)


tlas_shadow.defvjp(_shadow_fwd, _shadow_bwd)
