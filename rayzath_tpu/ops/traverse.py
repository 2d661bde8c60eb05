"""Vectorized BVH traversal on TPU (wavefront, per-ray stacks).

TPU-native replacement for the reference's per-thread index-stack walk
(RayZath/cuda_bvh.cuh:114-232, cuda_instance.cuh:35-164): every ray in the
wavefront advances one BVH node per iteration of a ``lax.while_loop``; rays
whose stack emptied idle until the slowest ray finishes. Child visit order uses
the node split axis and the per-ray direction sign, matching the reference's
bit-trick ordering. Leaves are processed with a static ``leaf_size``-unrolled
masked loop (no dynamic shapes under jit).

Traversal returns discrete hit ids; gradients flow through the differentiable
re-evaluation in ops/intersect.refine_hit (path-replay style).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .vec import dot, cross
from .intersect import DET_EPS, BIG

STACK_DEPTH = 34  # reference max BVH depth 31 (+ root + push headroom)


class Hit(NamedTuple):
    t: jnp.ndarray        # [R]
    tri_id: jnp.ndarray   # [R] i32, -1 = miss
    b1: jnp.ndarray       # [R]
    b2: jnp.ndarray       # [R]
    external: jnp.ndarray  # [R] bool (front face)


def _safe_inv(direction):
    d = jnp.where(jnp.abs(direction) < 1e-12, jnp.where(direction < 0, -1e-12, 1e-12), direction)
    return 1.0 / d


def _gather_tri_mt(origin, direction, tid, tri_v0, tri_e1, tri_e2):
    v0 = tri_v0[tid]
    e1 = tri_e1[tid]
    e2 = tri_e2[tid]
    pvec = cross(direction, e2)
    det = dot(e1, pvec)
    det = det + jnp.where(jnp.abs(det) < DET_EPS, DET_EPS, 0.0)
    inv_det = 1.0 / det
    tvec = origin - v0
    b1 = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    b2 = dot(direction, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    bary_ok = (b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
    return t, b1, b2, det, bary_ok


@partial(jax.jit, static_argnames=("leaf_size", "max_iters"))
def bvh_closest(origin, direction, near, far,
                node_min, node_max, node_begin, node_count, node_axis,
                tri_v0, tri_e1, tri_e2,
                leaf_size: int = 8, max_iters: int = 100000) -> Hit:
    """Closest-hit traversal for rays [R,3] over the flattened BVH."""
    R = origin.shape[0]
    rows = jnp.arange(R)
    inv_dir = _safe_inv(direction)
    n_tri = tri_v0.shape[0]

    def cond(state):
        it, sp, *_ = state
        return jnp.logical_and(jnp.any(sp > 0), it < max_iters)

    def body(state):
        it, sp, stack, best_t, best_id, best_b1, best_b2, best_ext = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        nmin = node_min[node]
        nmax = node_max[node]
        t1 = (nmin - origin) * inv_dir
        t2 = (nmax - origin) * inv_dir
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit_box = active & (tmax >= near) & (tmin <= tmax) & (tmin <= jnp.minimum(far, best_t))

        count = node_count[node]
        begin = node_begin[node]
        is_leaf = count > 0

        # ---- leaf: masked static loop over <= leaf_size triangles ----
        leaf_active = hit_box & is_leaf
        for k in range(leaf_size):
            tid = jnp.clip(begin + k, 0, n_tri - 1)
            m = leaf_active & (k < count)
            t, b1, b2, det, bary_ok = _gather_tri_mt(origin, direction, tid,
                                                     tri_v0, tri_e1, tri_e2)
            valid = m & bary_ok & (t > near) & (t < best_t)
            best_id = jnp.where(valid, tid.astype(jnp.int32), best_id)
            best_b1 = jnp.where(valid, b1, best_b1)
            best_b2 = jnp.where(valid, b2, best_b2)
            best_ext = jnp.where(valid, det > 0.0, best_ext)
            best_t = jnp.where(valid, t, best_t)

        # ---- inner: push far child then near child ----
        inner = hit_box & ~is_leaf
        axis = node_axis[node]
        d_axis = jnp.take_along_axis(direction, axis[:, None], axis=1)[:, 0]
        flip = (d_axis < 0.0).astype(jnp.int32)
        near_child = begin + flip
        far_child = begin + (1 - flip)
        innv = inner.astype(jnp.int32)
        stack = stack.at[rows, jnp.where(inner, sp, STACK_DEPTH - 1)].set(
            jnp.where(inner, far_child, stack[rows, STACK_DEPTH - 1]))
        sp1 = sp + innv
        stack = stack.at[rows, jnp.where(inner, sp1, STACK_DEPTH - 1)].set(
            jnp.where(inner, near_child, stack[rows, STACK_DEPTH - 1]))
        sp = sp1 + innv
        return it + 1, sp, stack, best_t, best_id, best_b1, best_b2, best_ext

    stack0 = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    state0 = (jnp.int32(0), jnp.ones(R, jnp.int32), stack0,
              jnp.minimum(far, BIG), jnp.full(R, -1, jnp.int32),
              jnp.zeros(R), jnp.zeros(R), jnp.ones(R, bool))
    _, _, _, t, tid, b1, b2, ext = jax.lax.while_loop(cond, body, state0)
    return Hit(t=t, tri_id=tid, b1=b1, b2=b2, external=ext)


@partial(jax.jit, static_argnames=("leaf_size", "max_iters"))
def bvh_shadow(origin, direction, dist,
               node_min, node_max, node_begin, node_count, node_axis,
               tri_v0, tri_e1, tri_e2, tri_opacity_rgb, tri_opacity_a,
               leaf_size: int = 8, max_iters: int = 100000):
    """Transmission-accumulating shadow traversal (reference cuda_bvh.cuh:172-232).

    Returns (mask_rgb [R,3], mask_a [R]); rays stop early once alpha < 1e-4.
    """
    R = origin.shape[0]
    rows = jnp.arange(R)
    inv_dir = _safe_inv(direction)
    n_tri = tri_v0.shape[0]

    def cond(state):
        it, sp, *_ = state
        return jnp.logical_and(jnp.any(sp > 0), it < max_iters)

    def body(state):
        it, sp, stack, mrgb, ma = state
        opaque = ma < 1e-4  # early-out (reference cuda_instance.cuh:110)
        active = (sp > 0) & ~opaque
        sp = jnp.where(opaque, 0, sp)
        top = jnp.maximum(sp - 1, 0)
        node = stack[rows, top]
        sp = jnp.where(active, sp - 1, sp)

        nmin = node_min[node]
        nmax = node_max[node]
        t1 = (nmin - origin) * inv_dir
        t2 = (nmax - origin) * inv_dir
        tmin = jnp.max(jnp.minimum(t1, t2), axis=-1)
        tmax = jnp.min(jnp.maximum(t1, t2), axis=-1)
        hit_box = active & (tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist)

        count = node_count[node]
        begin = node_begin[node]
        is_leaf = count > 0

        leaf_active = hit_box & is_leaf
        for k in range(leaf_size):
            tid = jnp.clip(begin + k, 0, n_tri - 1)
            m = leaf_active & (k < count)
            t, b1, b2, det, bary_ok = _gather_tri_mt(origin, direction, tid,
                                                     tri_v0, tri_e1, tri_e2)
            valid = m & bary_ok & (t > 0.0) & (t < dist)
            mrgb = jnp.where(valid[:, None], mrgb * tri_opacity_rgb[tid], mrgb)
            ma = jnp.where(valid, ma * tri_opacity_a[tid], ma)

        inner = hit_box & ~is_leaf
        innv = inner.astype(jnp.int32)
        child0 = begin
        child1 = begin + 1
        stack = stack.at[rows, jnp.where(inner, sp, STACK_DEPTH - 1)].set(
            jnp.where(inner, child1, stack[rows, STACK_DEPTH - 1]))
        sp1 = sp + innv
        stack = stack.at[rows, jnp.where(inner, sp1, STACK_DEPTH - 1)].set(
            jnp.where(inner, child0, stack[rows, STACK_DEPTH - 1]))
        sp = sp1 + innv
        return it + 1, sp, stack, mrgb, ma

    stack0 = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    state0 = (jnp.int32(0), jnp.ones(R, jnp.int32), stack0,
              jnp.ones((R, 3)), jnp.ones(R))
    _, _, _, mrgb, ma = jax.lax.while_loop(cond, body, state0)
    return mrgb, ma
