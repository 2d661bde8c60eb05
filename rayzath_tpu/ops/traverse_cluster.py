"""Fourth-generation traversal: flat cluster tables, distance-ordered MXU visits.

Why a new generation: stage timings on-chip (tools/stagebench.py) showed every
prior strategy pinned by something other than intersection math —

* the dense projection path (ops/intersect.py) materializes [R, F]
  intermediates through HBM (34 ms per call at F=512: bandwidth-bound 15x
  below the VPU's speed of light);
* the packet/mxleaf tree walks serialize one node per ``while_loop``
  iteration (mesh_heavy: 150-427 ms per call — latency-bound);
* XLA ray sorting costs ~25 ms per call at 512^2 — two orders of magnitude
  over the whole per-bounce budget at the 50 Mrays/s north star.

This kernel removes all three. The acceleration structure is a FLAT table of
triangle clusters (the leaves of an ordinary BVH build, ~128 triangles each;
reference heuristics per RayZath/component_container.hpp:145-364 — there is
deliberately no traversable tree on device):

* Per 1024-ray block, ONE conservative interval slab test of the block's
  (origin box x direction box) against every cluster AABB runs on [1, C]
  lanes and yields a per-cluster lower bound on hit distance (INF = cannot
  hit). This replaces the serial node walk with O(C) vector work done once.
* A ``while_loop`` then visits only profitable clusters in ascending
  distance order (argmin selection per step). Each visit gates on a cheap
  per-ray slab test of the cluster AABB and then intersects all 128
  triangles against all 1024 rays as two MXU matmuls (the projection-method
  intersector of ops/intersect.py) — intermediates never leave VMEM.
* Early exit: the loop stops when the nearest unvisited cluster is farther
  than every ray's current best hit (closest) or every ray's shadow
  distance/opacity budget (shadow, with the reference's alpha < 1e-4
  early-out, cuda_bvh.cuh:172-232).

Coherence comes from 32x32 image tiling (reshape-only, integrator._tile) —
front-to-back visit order restores most of what per-ray walks get from
octant ordering, without any sort.

Reference behavior covered: closest-hit traversal (cuda_bvh.cuh:114-171) and
the transmission-accumulating any-hit shadow walk (cuda_bvh.cuh:172-232,
cuda_instance.cuh:92-164). Masking by the per-ray (near, min(far, best_t))
t-window makes results identical to a per-ray walk; only visit ORDER is
shared per block.

Gradients follow the established pattern: closest ids are discrete
(stop_gradient + differentiable refine in the integrator); the shadow entry
point carries a custom_vjp replaying the test through the dense
differentiable projection path (transmission products are order-independent).

Scenes whose cluster-frame table exceeds ``RESIDENT_CLUSTERS`` keep frames in
HBM and DMA each visited cluster's 6 KB block into VMEM scratch
(pltpu.make_async_copy), so scene size is HBM-bound while the AABB table
(32 B/cluster) stays resident far past a million triangles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bvh import build_bvh, triangle_aabbs
from .intersect import BIG, DET_EPS, triangle_frames, project_shadow

BLOCK = 1024            # rays per grid program (all on lanes)
CLUSTER_T = 128         # triangles per cluster (one lane tile per part)
RESIDENT_CLUSTERS = 1280  # 6 KB/cluster -> 7.5 MB VMEM at the cap
# "unreachable" distance sentinel. Finite on purpose: the rank computation
# runs the distance row through an MXU transpose, and inf * 0 = NaN would
# poison every rank. Anything >= INF_GATE is treated as unreachable.
INF = np.float32(1e37)
INF_GATE = np.float32(1e36)
RANK_CHUNK = 128        # all-pairs rank row-chunk (bounds VMEM at [128, C])

# box_tab sublane layout ([8, Cp] f32, clusters on lanes)
B_MIN = 0               # rows 0..2: cluster AABB min xyz
B_MAX = 3               # rows 3..5: cluster AABB max xyz
B_BASE = 6              # row 6: first triangle (reordered index)
B_CNT = 7               # row 7: triangle count (0 = padding lane)


def _interpret() -> bool:
    """Mosaic needs real TPU hardware; interpret everywhere else (tests run
    on a virtual CPU mesh). The tunneled chip reports platform 'axon'."""
    return jax.default_backend() not in ("tpu", "axon")


def _frames_jnp(v0, e1, e2):
    """Traceable (differentiable) twin of ops.intersect.triangle_frames —
    used by the shadow custom_vjp replay paths."""
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


def _project_leaf(lw, o4, d4, near, limit):
    """(t, valid) of <=CLUSTER_T cluster triangles against the block:
    [CLUSTER_T, BLOCK] tiles from two MXU matmuls + fused elementwise."""
    ct = CLUSTER_T
    dims = (((0,), (0,)), ((), ()))
    ol = jax.lax.dot_general(lw, o4, dims,
                             preferred_element_type=jnp.float32)
    dl = jax.lax.dot_general(lw, d4, dims,
                             preferred_element_type=jnp.float32)
    olx, oly, olz = ol[0:ct], ol[ct:2 * ct], ol[2 * ct:]
    dlx, dly, dlz = dl[0:ct], dl[ct:2 * ct], dl[2 * ct:]
    dlz = dlz + jnp.where(jnp.abs(dlz) < DET_EPS, DET_EPS, 0.0)
    t = -olz / dlz
    b1 = olx + t * dlx
    b2 = oly + t * dly
    valid = ((b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
             & (t > near) & (t < limit))
    return t, valid


def _prod_sublanes(x):
    """Product over the sublane axis of [CLUSTER_T, BLOCK] by halving
    (static steps); Mosaic has no native multiply-reduce."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        x = x[:h] * x[h:n]
        n = h
    return x                                            # [1, BLOCK]


# ---------------------------------------------------------------------------
# host build
# ---------------------------------------------------------------------------

def build_cluster_tables(tri_v0, tri_e1, tri_e2, cluster_t: int = CLUSTER_T):
    """Host build of the flat cluster tables.

    Returns (box_tab [8, Cp] f32, frames [C, 4, 3*cluster_t] f32,
    order [T] i32 reordered -> original, base [C] i32, count [C] i32).
    ``box_tab`` is lane-major for the [1, C] block cull; the row-major twin
    for per-visit scalar reads (Mosaic cannot dynamically index lanes) is
    derived in-jit by :func:`box_rows`.
    """
    tri_v0 = np.asarray(tri_v0, np.float32)
    tri_e1 = np.asarray(tri_e1, np.float32)
    tri_e2 = np.asarray(tri_e2, np.float32)
    t_count = len(tri_v0)
    pmin, pmax = triangle_aabbs(tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2)
    bvh = build_bvh(pmin, pmax, leaf_size=cluster_t)
    order = bvh.order if t_count else np.zeros(0, np.int32)
    v0, e1, e2 = tri_v0[order], tri_e1[order], tri_e2[order]

    leaf = bvh.node_count > 0
    c = int(leaf.sum()) if t_count else 0
    cp = max(128, -(-max(c, 1) // 128) * 128)
    box = np.zeros((8, cp), np.float32)
    # padding lanes: inverted boxes that no interval test can reach
    box[B_MIN:B_MIN + 3, :] = 3e38
    box[B_MAX:B_MAX + 3, :] = -3e38
    base = np.zeros(max(c, 1), np.int32)
    count = np.zeros(max(c, 1), np.int32)
    frames = np.zeros((max(c, 1), 4, 3 * cluster_t), np.float32)
    # never-hit padding frames: w = 0, c = (-1, -1, 1) => b1 = -1 everywhere
    frames[:, 3, 0 * cluster_t:1 * cluster_t] = -1.0
    frames[:, 3, 1 * cluster_t:2 * cluster_t] = -1.0
    frames[:, 3, 2 * cluster_t:3 * cluster_t] = 1.0
    if t_count:
        w_all, c_all = triangle_frames(v0, e1, e2)      # [3, 3T], [3T]
        for s, node in enumerate(np.nonzero(leaf)[0]):
            b = int(bvh.node_begin[node])
            n = int(bvh.node_count[node])
            base[s] = b
            count[s] = n
            box[B_MIN:B_MIN + 3, s] = bvh.node_min[node]
            box[B_MAX:B_MAX + 3, s] = bvh.node_max[node]
            box[B_BASE, s] = float(b)
            box[B_CNT, s] = float(n)
            for a in range(3):                          # local coord part
                cols = slice(a * t_count + b, a * t_count + b + n)
                frames[s, 0:3, a * cluster_t:a * cluster_t + n] = w_all[:, cols]
                frames[s, 3, a * cluster_t:a * cluster_t + n] = c_all[cols]
    return box, frames, order.astype(np.int32), base, count


def box_rows(box_tab):
    """Row-major twin of ``box_tab``: [Cp, 128] with the 8 per-cluster
    scalars in lanes 0..7 of row c (dynamic sublane slices are the one
    dynamic access Mosaic vectorizes well)."""
    rows = jnp.transpose(box_tab)                       # [Cp, 8]
    return jnp.pad(rows, ((0, 0), (0, 128 - rows.shape[1])))


def cluster_opacity(op_rgb, op_a, order, base, count,
                    cluster_t: int = CLUSTER_T):
    """In-jit [C, 4, cluster_t] per-cluster rgba opacity from the live
    material opacity tables (original triangle order). Padding slots get 1."""
    ops = jnp.concatenate([op_rgb, op_a[:, None]], axis=1)[order]   # [T,4]
    idx = base[:, None] + jnp.arange(cluster_t)[None, :]            # [C,ct]
    valid = jnp.arange(cluster_t)[None, :] < count[:, None]
    idx = jnp.clip(idx, 0, max(ops.shape[0] - 1, 0))
    vals = jnp.where(valid[:, :, None], ops[idx], 1.0)              # [C,ct,4]
    return jnp.transpose(vals, (0, 2, 1))                           # [C,4,ct]


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _masked_bounds(v, mask):
    """(min, max) scalars of row ``v`` over lanes where ``mask``."""
    lo = jnp.min(jnp.where(mask, v, 3e38))
    hi = jnp.max(jnp.where(mask, v, -3e38))
    return lo, hi


def _axis_interval(vl, vh, dl, dh):
    """Conservative t-interval [tl, th] (t >= 0) such that some d in
    [dl, dh] reaches some v in [vl, vh] with t*d = v, for one axis.

    vl/vh are [1, C] rows (cluster box relative to the block's origin box);
    dl/dh are scalars (the block's direction bounds). Empty -> th < tl.
    """
    pos = dl > 0.0
    neg = dh < 0.0
    # all-positive d: t*dl <= vh and t*dh >= vl
    tl_pos = jnp.maximum(vl / dh, 0.0)
    th_pos = vh / dl                      # vh < 0 -> th < 0 -> empty
    # all-negative d: t*dl <= vh (flips) and t*dh >= vl (flips)
    tl_neg = jnp.maximum(vh / dl, 0.0)
    th_neg = vl / dh
    # direction interval spans 0: arbitrarily small |d| reaches any far v of
    # the right sign; only a strictly one-sided v with no matching d is empty
    tl_span = jnp.where(vl > 0.0, vl / jnp.maximum(dh, 1e-30),
                        jnp.where(vh < 0.0, vh / jnp.minimum(dl, -1e-30), 0.0))
    empty_span = ((vl > 0.0) & (dh <= 0.0)) | ((vh < 0.0) & (dl >= 0.0))
    th_span = jnp.where(empty_span, -1.0, INF)
    tl = jnp.where(pos, tl_pos, jnp.where(neg, tl_neg, tl_span))
    th = jnp.where(pos, th_pos, jnp.where(neg, th_neg, th_span))
    return tl, th


def _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray, t_cap):
    """[1, Cp] conservative lower-bound hit distance per cluster for the
    block (INF = no ray in the block can hit it within ``t_cap``)."""
    olox, ohix = _masked_bounds(ox, valid_ray)
    oloy, ohiy = _masked_bounds(oy, valid_ray)
    oloz, ohiz = _masked_bounds(oz, valid_ray)
    dlox, dhix = _masked_bounds(dx, valid_ray)
    dloy, dhiy = _masked_bounds(dy, valid_ray)
    dloz, dhiz = _masked_bounds(dz, valid_ray)

    def axis(row_lo, row_hi, olo, ohi, dlo, dhi):
        vl = box_ref[row_lo:row_lo + 1, :] - ohi
        vh = box_ref[row_hi:row_hi + 1, :] - olo
        return _axis_interval(vl, vh, dlo, dhi)

    tlx, thx = axis(B_MIN + 0, B_MAX + 0, olox, ohix, dlox, dhix)
    tly, thy = axis(B_MIN + 1, B_MAX + 1, oloy, ohiy, dloy, dhiy)
    tlz, thz = axis(B_MIN + 2, B_MAX + 2, oloz, ohiz, dloz, dhiz)
    tl = jnp.maximum(jnp.maximum(tlx, tly), tlz)
    th = jnp.minimum(jnp.minimum(thx, thy), thz)
    feasible = (tl <= th) & (tl <= t_cap) & (box_ref[B_CNT:B_CNT + 1, :] > 0.0)
    return jnp.where(feasible, tl, INF)


def _rank_clusters(dist):
    """[1, C] visit rank per cluster (0 = nearest) from the per-cluster
    distance row, ties broken by index.

    One all-pairs compare ([C, C] elementwise + a sublane reduction) replaces
    a per-iteration ``argmin`` chain: measured on-chip, argmin+mask costs
    ~0.6 us per visit step (a serial dependency), while rank extraction by
    masked reduce costs ~0.1 us and leaves iterations independent. The
    compare runs in row chunks inside a sequential fori_loop so the VMEM
    working set stays [RANK_CHUNK, C] (an unrolled or single-shot [C, C]
    table blows the 16 MB scoped-VMEM limit past ~2k candidates)."""
    c = dist.shape[1]
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    n = min(RANK_CHUNK, c)

    def chunk_rank(k, acc):
        i0 = k * n
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0) + i0
        # chunk rows of dist as a column via the MXU-transpose trick
        sel = (jax.lax.broadcasted_iota(jnp.int32, (n, c), 1) == ri)
        dist_col = jax.lax.dot_general(
            sel.astype(jnp.float32), dist, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [n, 1]
        less = (dist_col < dist) | ((dist_col == dist) & (ri < ci))
        return acc + jnp.sum(less.astype(jnp.float32), axis=0, keepdims=True)

    acc = jnp.zeros((1, c), jnp.float32)
    return jax.lax.fori_loop(0, -(-c // n), chunk_rank, acc)


def _rank_extract(rank, k, value_rows):
    """Per-row sum of values at the lane where ``rank == k`` (one masked
    reduce per row; 0 if no such lane)."""
    sel = rank == k
    return [jnp.sum(jnp.where(sel, v, 0.0)) for v in value_rows]


def _lane_iota(n):
    return jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)


def _ray_rows4(o4, d4):
    ox, oy, oz = o4[0:1, :], o4[1:2, :], o4[2:3, :]
    dx, dy, dz = d4[0:1, :], d4[1:2, :], d4[2:3, :]
    eps = 1e-12

    def inv1(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v < 0, -eps, eps), v)

    return ox, oy, oz, dx, dy, dz, inv1(dx), inv1(dy), inv1(dz)


def _box_col(rows_ref, c):
    """The 8 scalars of cluster ``c`` (from the row-major box table)."""
    row = rows_ref[pl.ds(c, 1), :]                      # [1, 128]
    return [row[0, k] for k in range(8)]


def _ray_slab(col, ox, oy, oz, ix, iy, iz):
    """Per-ray slab test of one cluster AABB (scalars from ``col``)."""
    tx1 = (col[B_MIN + 0] - ox) * ix
    ty1 = (col[B_MIN + 1] - oy) * iy
    tz1 = (col[B_MIN + 2] - oz) * iz
    tx2 = (col[B_MAX + 0] - ox) * ix
    ty2 = (col[B_MAX + 1] - oy) * iy
    tz2 = (col[B_MAX + 2] - oz) * iz
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


CLIP_K = 32             # occupancy boxes per scene (kernel loop is unrolled)


def clip_rows_jnp(box_tab, n_real: int):
    """In-jit [CLIP_K, 8] occupancy boxes from the cluster/unit AABB table:
    contiguous lane groups (build order is spatial) are unioned into at most
    CLIP_K coarse boxes. Lives in SMEM inside the kernels (scalar feeds).
    Padding rows keep inverted boxes."""
    cp = box_tab.shape[1]
    k = 1
    while k < CLIP_K and k * 16 < n_real:
        k *= 2                                   # power of two divides cp
    g = cp // k
    mins = jnp.min(box_tab[B_MIN:B_MIN + 3].reshape(3, k, g), axis=2)
    maxs = jnp.max(box_tab[B_MAX:B_MAX + 3].reshape(3, k, g), axis=2)
    rows = jnp.concatenate([mins, maxs], axis=0).T          # [k, 6]
    rows = jnp.pad(rows, ((0, CLIP_K - k), (0, 2)))
    # padding boxes: inverted so no slab test can pass
    inv = jnp.concatenate([jnp.full((CLIP_K - k, 3), 3e38),
                           jnp.full((CLIP_K - k, 3), -3e38),
                           jnp.zeros((CLIP_K - k, 2))], axis=1)
    return rows.at[k:].set(inv)


def _occupancy_clip(clip_ref, ox, oy, oz, ix, iy, iz, near, far):
    """Clip per-ray ``far`` to the last exit from any occupancy box.

    Rays pointing at the sky (or skimming over the geometry) would
    otherwise keep far = BIG, so the front-to-back early exit never fires
    and the block enumerates every feasible cluster. A ray whose segment
    misses every occupancy box is excluded outright (far = -1). Runs in the
    native [8, 128] register layout — [1, BLOCK] rows waste 7/8 of each
    vreg's sublanes."""
    def r8(v):
        return v.reshape(8, BLOCK // 8)

    o8 = (r8(ox), r8(oy), r8(oz))
    i8 = (r8(ix), r8(iy), r8(iz))
    near8, far8 = r8(near), r8(far)
    far_occ = jnp.full((8, BLOCK // 8), -1.0, jnp.float32)
    for j in range(CLIP_K):
        col = [clip_ref[j, k] for k in range(6)]
        tx1 = (col[0] - o8[0]) * i8[0]
        ty1 = (col[1] - o8[1]) * i8[1]
        tz1 = (col[2] - o8[2]) * i8[2]
        tx2 = (col[3] - o8[0]) * i8[0]
        ty2 = (col[4] - o8[1]) * i8[1]
        tz2 = (col[5] - o8[2]) * i8[2]
        tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                       jnp.minimum(ty1, ty2)),
                           jnp.minimum(tz1, tz2))
        tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                       jnp.maximum(ty1, ty2)),
                           jnp.maximum(tz1, tz2))
        hit = (tmax >= near8) & (tmin <= tmax) & (tmin <= far8)
        far_occ = jnp.where(hit, jnp.maximum(far_occ, tmax), far_occ)
    ok = (far_occ > 0.0) & (far8 > 0.0)
    out = jnp.where(ok, jnp.minimum(far8, far_occ * 1.0001 + 1e-4), -1.0)
    return out.reshape(1, BLOCK)


def _frame_loader(streamed, lw_ref, scratch):
    if not streamed:
        return lambda slot: lw_ref[pl.ds(slot, 1), :, :][0]
    buf, sem = scratch

    def load(slot):
        dma = pltpu.make_async_copy(lw_ref.at[pl.ds(slot, 1)], buf, sem)
        dma.start()
        dma.wait()
        return buf[0]
    return load


# ---------------------------------------------------------------------------
# closest-hit kernel
# ---------------------------------------------------------------------------

_ID_BIG = float(2 ** 30)


def _closest_kernel(n_clusters: int, streamed: bool):
    def kern(box_ref, rows_ref, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             t_ref, id_ref, *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows4(o4, d4)
        near, far_in = nf_ref[0:1, :], nf_ref[1:2, :]
        far = _occupancy_clip(clip_ref, ox, oy, oz, ix, iy, iz, near, far_in)
        valid_ray = far > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        sub_ids = jax.lax.broadcasted_iota(
            jnp.int32, (CLUSTER_T, BLOCK), 0).astype(jnp.float32)

        t_cap = jnp.max(jnp.where(valid_ray, far, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        rank = _rank_clusters(dist0)

        def body(state):
            k, best_t, best_id, _ = state
            d_k, c_f = _rank_extract(rank, k, (dist0, _lane_iota(
                dist0.shape[1]).astype(jnp.float32)))
            c = c_f.astype(jnp.int32)
            stop_t = jnp.max(jnp.minimum(best_t, far))
            proceed = jnp.logical_and(d_k <= stop_t, d_k < INF_GATE)
            col = _box_col(rows_ref, c)
            tmin, tmax = _ray_slab(col, ox, oy, oz, ix, iy, iz)
            rhit = ((tmax >= near) & (tmin <= tmax)
                    & (tmin <= jnp.minimum(far, best_t)))

            def visit(args):
                best_t, best_id = args
                lw = load_frames(c)
                t, valid = _project_leaf(lw, o4, d4, near, best_t)
                tm = jnp.where(valid, t, BIG)
                t_new = jnp.min(tm, axis=0, keepdims=True)      # [1, B]
                got = t_new < BIG * 0.5
                ids = jnp.where(tm == t_new, sub_ids + col[B_BASE], _ID_BIG)
                id_new = jnp.min(ids, axis=0, keepdims=True)
                best_id = jnp.where(got, id_new, best_id)
                best_t = jnp.where(got, t_new, best_t)
                return best_t, best_id

            best_t, best_id = jax.lax.cond(
                jnp.logical_and(proceed, jnp.any(rhit)), visit, lambda a: a,
                (best_t, best_id))
            cont = jnp.logical_and(proceed, k + 1 < n_clusters)
            return k + 1, best_t, best_id, cont

        def cond(state):
            return state[3]

        _, best_t, best_id, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.minimum(far, BIG),
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.array(True)))
        t_ref[:] = best_t
        id_ref[:] = best_id
    return kern


# ---------------------------------------------------------------------------
# shadow kernel
# ---------------------------------------------------------------------------

def _shadow_kernel(n_clusters: int, streamed: bool):
    def kern(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, mr_ref, mg_ref, mb_ref, ma_ref, *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows4(o4, d4)
        zero_row = jnp.zeros((1, BLOCK), jnp.float32)
        dist_t = _occupancy_clip(clip_ref, ox, oy, oz, ix, iy, iz, zero_row,
                                 nf_ref[0:1, :])
        valid_ray = dist_t > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        r128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 1)
        eye = (r128 == c128).astype(jnp.float32)
        zero = zero_row

        t_cap = jnp.max(jnp.where(valid_ray, dist_t, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        rank = _rank_clusters(dist0)

        def body(state):
            k, mr, mg, mb, ma, _ = state
            d_k, c_f = _rank_extract(rank, k, (dist0, _lane_iota(
                dist0.shape[1]).astype(jnp.float32)))
            c = c_f.astype(jnp.int32)
            proceed = jnp.logical_and(d_k < INF_GATE, jnp.max(ma) >= 1e-4)
            col = _box_col(rows_ref, c)
            tmin, tmax = _ray_slab(col, ox, oy, oz, ix, iy, iz)
            rhit = ((tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist_t)
                    & (ma >= 1e-4))

            def visit(args):
                mr, mg, mb, ma = args
                lw = load_frames(c)
                t, valid = _project_leaf(lw, o4, d4, zero, dist_t)
                # [4, ct] rgba rows -> [ct, 4] columns via MXU transpose
                oprows = op_ref[pl.ds(c, 1), :, :][0]
                opc = jax.lax.dot_general(
                    eye, oprows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [ct, 4]
                mr = mr * _prod_sublanes(jnp.where(valid, opc[:, 0:1], 1.0))
                mg = mg * _prod_sublanes(jnp.where(valid, opc[:, 1:2], 1.0))
                mb = mb * _prod_sublanes(jnp.where(valid, opc[:, 2:3], 1.0))
                ma = ma * _prod_sublanes(jnp.where(valid, opc[:, 3:4], 1.0))
                return mr, mg, mb, ma

            mr, mg, mb, ma = jax.lax.cond(
                jnp.logical_and(proceed, jnp.any(rhit)), visit, lambda a: a,
                (mr, mg, mb, ma))
            cont = jnp.logical_and(proceed, k + 1 < n_clusters)
            return k + 1, mr, mg, mb, ma, cont

        def cond(state):
            return state[5]

        ones = jnp.ones((1, BLOCK), jnp.float32)
        _, mr, mg, mb, ma, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), ones, ones, ones, ones, jnp.array(True)))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _ray_mats(v, last: float, rp: int):
    """[R, 3] -> [nb, 4, BLOCK] homogeneous ray matrices."""
    r = v.shape[0]
    v = jnp.pad(v, ((0, rp - r), (0, 0)))
    m = jnp.concatenate([v, jnp.full((rp, 1), last, v.dtype)], axis=1)
    return m.T.reshape(4, rp // BLOCK, BLOCK).transpose(1, 0, 2)


def _specs(streamed: bool, box_shape, lw_shape):
    box_spec = pl.BlockSpec(box_shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((box_shape[1], 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    clip_spec = pl.BlockSpec((CLIP_K, 8), lambda i: (0, 0),
                             memory_space=pltpu.SMEM)
    lw_spec = pl.BlockSpec(lw_shape, lambda i: (0, 0, 0),
                           memory_space=pl.ANY if streamed else pltpu.VMEM)
    ray_spec = pl.BlockSpec((1, 4, BLOCK), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    nf_spec = pl.BlockSpec((1, 2, BLOCK), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
    return (box_spec, rows_spec, clip_spec, lw_spec, ray_spec, nf_spec,
            out_spec)


def _scratch(streamed: bool):
    if not streamed:
        return []
    return [pltpu.VMEM((1, 4, 3 * CLUSTER_T), jnp.float32),
            pltpu.SemaphoreType.DMA]


@jax.jit
def _cluster_closest_impl(origin, direction, near, far, box_tab, frames):
    R = origin.shape[0]
    n_clusters = frames.shape[0]
    streamed = n_clusters > RESIDENT_CLUSTERS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    (box_spec, rows_spec, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, box_tab.shape, frames.shape)

    def kern(box_ref, rows_ref, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             t_ref, id_ref, *scratch):
        inner = _closest_kernel(n_clusters, streamed)
        inner(box_ref, rows_ref, clip_ref, lw_ref, o4_ref.at[0],
              d4_ref.at[0], nf_ref.at[0], t_ref.at[0], id_ref.at[0],
              *scratch)

    t, tid = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)),
        in_specs=[box_spec, rows_spec, clip_spec, lw_spec, ray_spec,
                  ray_spec, nf_spec],
        out_specs=(out_spec, out_spec),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(box_tab, box_rows(box_tab), clip_rows_jnp(box_tab, n_clusters),
      frames, o4, d4, nf_b)
    return t.reshape(rp)[:R], tid.reshape(rp)[:R].astype(jnp.int32)


def cluster_closest(origin, direction, near, far, box_tab, frames, order):
    """Closest hit. Returns (t [R], tri_id [R] i32 in ORIGINAL order, -1 =
    miss). Discrete output — wrapped in stop_gradient (the integrator
    re-derives differentiable t/b1/b2 from the ids via refine_hit)."""
    t, rid = _cluster_closest_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, box_tab, frames)))
    tid = jnp.where(rid >= 0, order[jnp.clip(rid, 0, order.shape[0] - 1)], -1)
    return jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid)


@jax.jit
def _cluster_shadow_impl(origin, direction, dist, box_tab, frames, op_tab):
    R = origin.shape[0]
    n_clusters = frames.shape[0]
    streamed = n_clusters > RESIDENT_CLUSTERS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    (box_spec, rows_spec, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, box_tab.shape, frames.shape)
    op_spec = pl.BlockSpec(op_tab.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel(n_clusters, streamed)
        inner(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref.at[0],
              d4_ref.at[0], nf_ref.at[0], *[o.at[0] for o in outs],
              *scratch)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(4)),
        in_specs=[box_spec, rows_spec, clip_spec, lw_spec, op_spec,
                  ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(4)),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(box_tab, box_rows(box_tab), clip_rows_jnp(box_tab, n_clusters),
      frames, op_tab, o4, d4, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@jax.custom_vjp
def cluster_shadow(origin, direction, dist, box_tab, frames, order,
                   base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    """Shadow traversal: (mask_rgb [R,3], mask_a [R]).

    Forward runs the Pallas kernel with the in-jit cluster opacity table
    (live material values); backward replays through the dense
    differentiable projection path (path-replay: the transmission product is
    order-independent, so the gradient matches wherever the alpha early-out
    has not saturated — beyond it the light term is ~0)."""
    op_tab = cluster_opacity(op_rgb, op_a, order, base, count)
    return _cluster_shadow_impl(origin, direction, dist, box_tab, frames,
                                op_tab)


def _cluster_shadow_fwd(origin, direction, dist, box_tab, frames, order,
                        base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
    out = cluster_shadow(origin, direction, dist, box_tab, frames, order,
                         base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a)
    return out, (origin, direction, dist, tri_v0, tri_e1, tri_e2,
                 op_rgb, op_a)


def _cluster_shadow_bwd(res, g):
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


cluster_shadow.defvjp(_cluster_shadow_fwd, _cluster_shadow_bwd)


# ---------------------------------------------------------------------------
# instanced (two-level) variant: units = (instance, mesh cluster)
# ---------------------------------------------------------------------------
#
# The reference's TLAS-over-instances + BLAS-per-mesh traversal
# (cuda_bvh.cuh:114-171 + cuda_instance.cuh:167-264) maps onto the same flat
# design: a UNIT is one (instance, object-space mesh cluster) pair with a
# world-space AABB. The block cull/rank/visit loop is identical to the soup
# kernels; a visit additionally transforms the block's rays into the unit's
# object space (12 scalar FMAs per ray row — the object->world t metric is
# preserved because the direction is transformed UNnormalized, so
# T(o + t d) = T(o) + t L d). Mesh cluster frames are shared by all
# instances of a mesh — geometry is never duplicated (the scaling property
# the reference gets from its shared Cuda::Mesh BLAS).

# u_rows lane layout ([Up, 128] f32, one row per unit)
U_MIN = 0               # lanes 0..2: world AABB min
U_MAX = 3               # lanes 3..5: world AABB max
U_SLOT = 6              # mesh-cluster slot into the frames table
U_INST = 7              # instance id
U_BASE = 8              # first triangle (device order) of the cluster
U_INV = 9               # lanes 9..20: world->object 3x4 (row-major)
U_CNT = 21              # triangle count (0 = padding row)


def _transform_aabb(fwd, bmin, bmax):
    """World AABB of an object-space box under a 3x4 transform (host)."""
    pts = np.array([[x, y, z]
                    for x in (bmin[0], bmax[0])
                    for y in (bmin[1], bmax[1])
                    for z in (bmin[2], bmax[2])], np.float32)
    w = pts @ fwd[:, :3].T + fwd[:, 3]
    return w.min(0), w.max(0)


def build_unit_tables(wmin, wmax, slot, inst, tri_base, count, inv):
    """Host build of the unit tables.

    wmin/wmax [U,3] world AABBs; slot/inst/tri_base/count [U] i32;
    inv [U,3,4] world->object transforms. Returns (u_box [8, Up] lane-major
    — the layout :func:`_cluster_dists` expects — and u_rows [Up, 128])."""
    u = len(slot)
    up = max(128, -(-max(u, 1) // 128) * 128)
    box = np.zeros((8, up), np.float32)
    box[B_MIN:B_MIN + 3, :] = 3e38
    box[B_MAX:B_MAX + 3, :] = -3e38
    rows = np.zeros((max(u, 1), 128), np.float32)
    if u:
        box[B_MIN:B_MIN + 3, :u] = wmin.T
        box[B_MAX:B_MAX + 3, :u] = wmax.T
        box[B_BASE, :u] = slot.astype(np.float32)
        box[B_CNT, :u] = count.astype(np.float32)
        rows[:u, U_MIN:U_MIN + 3] = wmin
        rows[:u, U_MAX:U_MAX + 3] = wmax
        rows[:u, U_SLOT] = slot.astype(np.float32)
        rows[:u, U_INST] = inst.astype(np.float32)
        rows[:u, U_BASE] = tri_base.astype(np.float32)
        rows[:u, U_INV:U_INV + 12] = inv.reshape(u, 12)
        rows[:u, U_CNT] = count.astype(np.float32)
    return box, rows


def unit_opacity(mat_color, inst_slot_map, tri_slot, u_inst, u_slot,
                 cl_base, cl_count, cluster_t: int = CLUSTER_T):
    """In-jit [U, 4, ct] per-unit rgba opacity: the unit's cluster triangles
    resolved through ITS instance's material-slot table (live values —
    material edits and training are never stale). Padding slots get 1."""
    ct = cluster_t
    idx = cl_base[u_slot][:, None] + jnp.arange(ct)[None, :]        # [U,ct]
    valid = jnp.arange(ct)[None, :] < cl_count[u_slot][:, None]
    idx = jnp.clip(idx, 0, max(tri_slot.shape[0] - 1, 0))
    slot = tri_slot[idx]                                            # [U,ct]
    mid = inst_slot_map[u_inst[:, None], slot]                      # [U,ct]
    mc = mat_color[mid]                                             # [U,ct,4]
    ops = jnp.concatenate([mc[..., :3], 1.0 - mc[..., 3:4]], axis=-1)
    vals = jnp.where(valid[..., None], ops, 1.0)
    return jnp.transpose(vals, (0, 2, 1))                           # [U,4,ct]


def _object_rays(row, ox, oy, oz, dx, dy, dz):
    """Transform the block's world rays into a unit's object space and
    repack as [4, B] projection matrices (offset row 1 for origins, 0 for
    directions). ``row`` is the unit's [1, 128] u_rows slice."""
    a = [row[0, U_INV + k] for k in range(12)]
    oxl = a[0] * ox + a[1] * oy + a[2] * oz + a[3]
    oyl = a[4] * ox + a[5] * oy + a[6] * oz + a[7]
    ozl = a[8] * ox + a[9] * oy + a[10] * oz + a[11]
    dxl = a[0] * dx + a[1] * dy + a[2] * dz
    dyl = a[4] * dx + a[5] * dy + a[6] * dz
    dzl = a[8] * dx + a[9] * dy + a[10] * dz
    one = jnp.ones_like(ox)
    o4l = jnp.concatenate([oxl, oyl, ozl, one], axis=0)
    d4l = jnp.concatenate([dxl, dyl, dzl, jnp.zeros_like(ox)], axis=0)
    return o4l, d4l


def _closest_kernel_inst(n_units: int, streamed: bool):
    def kern(box_ref, rows_ref, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             t_ref, id_ref, inst_ref, *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows4(o4, d4)
        near, far_in = nf_ref[0:1, :], nf_ref[1:2, :]
        far = _occupancy_clip(clip_ref, ox, oy, oz, ix, iy, iz, near, far_in)
        valid_ray = far > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        sub_ids = jax.lax.broadcasted_iota(
            jnp.int32, (CLUSTER_T, BLOCK), 0).astype(jnp.float32)

        t_cap = jnp.max(jnp.where(valid_ray, far, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        rank = _rank_clusters(dist0)

        def body(state):
            k, best_t, best_id, best_inst, _ = state
            d_k, c_f = _rank_extract(rank, k, (dist0, _lane_iota(
                dist0.shape[1]).astype(jnp.float32)))
            c = c_f.astype(jnp.int32)
            stop_t = jnp.max(jnp.minimum(best_t, far))
            proceed = jnp.logical_and(d_k <= stop_t, d_k < INF_GATE)
            row = rows_ref[pl.ds(c, 1), :]
            col = [row[0, j] for j in range(8)]
            tmin, tmax = _ray_slab(col, ox, oy, oz, ix, iy, iz)
            rhit = ((tmax >= near) & (tmin <= tmax)
                    & (tmin <= jnp.minimum(far, best_t)))

            def visit(args):
                best_t, best_id, best_inst = args
                o4l, d4l = _object_rays(row, ox, oy, oz, dx, dy, dz)
                slot = row[0, U_SLOT].astype(jnp.int32)
                lw = load_frames(slot)
                t, valid = _project_leaf(lw, o4l, d4l, near, best_t)
                tm = jnp.where(valid, t, BIG)
                t_new = jnp.min(tm, axis=0, keepdims=True)      # [1, B]
                got = t_new < BIG * 0.5
                ids = jnp.where(tm == t_new, sub_ids + row[0, U_BASE],
                                _ID_BIG)
                id_new = jnp.min(ids, axis=0, keepdims=True)
                best_id = jnp.where(got, id_new, best_id)
                best_inst = jnp.where(got, row[0, U_INST], best_inst)
                best_t = jnp.where(got, t_new, best_t)
                return best_t, best_id, best_inst

            best_t, best_id, best_inst = jax.lax.cond(
                jnp.logical_and(proceed, jnp.any(rhit)), visit, lambda a: a,
                (best_t, best_id, best_inst))
            cont = jnp.logical_and(proceed, k + 1 < n_units)
            return k + 1, best_t, best_id, best_inst, cont

        def cond(state):
            return state[4]

        _, best_t, best_id, best_inst, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.minimum(far, BIG),
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.array(True)))
        t_ref[:] = best_t
        id_ref[:] = best_id
        inst_ref[:] = best_inst
    return kern


def _shadow_kernel_inst(n_units: int, streamed: bool):
    def kern(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, mr_ref, mg_ref, mb_ref, ma_ref, *scratch):
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        ox, oy, oz, dx, dy, dz, ix, iy, iz = _ray_rows4(o4, d4)
        zero_row = jnp.zeros((1, BLOCK), jnp.float32)
        dist_t = _occupancy_clip(clip_ref, ox, oy, oz, ix, iy, iz, zero_row,
                                 nf_ref[0:1, :])
        valid_ray = dist_t > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        r128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 1)
        eye = (r128 == c128).astype(jnp.float32)

        t_cap = jnp.max(jnp.where(valid_ray, dist_t, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        rank = _rank_clusters(dist0)

        def body(state):
            k, mr, mg, mb, ma, _ = state
            d_k, c_f = _rank_extract(rank, k, (dist0, _lane_iota(
                dist0.shape[1]).astype(jnp.float32)))
            c = c_f.astype(jnp.int32)
            proceed = jnp.logical_and(d_k < INF_GATE, jnp.max(ma) >= 1e-4)
            row = rows_ref[pl.ds(c, 1), :]
            col = [row[0, j] for j in range(8)]
            tmin, tmax = _ray_slab(col, ox, oy, oz, ix, iy, iz)
            rhit = ((tmax >= 0.0) & (tmin <= tmax) & (tmin <= dist_t)
                    & (ma >= 1e-4))

            def visit(args):
                mr, mg, mb, ma = args
                o4l, d4l = _object_rays(row, ox, oy, oz, dx, dy, dz)
                lw = load_frames(row[0, U_SLOT].astype(jnp.int32))
                t, valid = _project_leaf(lw, o4l, d4l, zero_row, dist_t)
                oprows = op_ref[pl.ds(c, 1), :, :][0]
                opc = jax.lax.dot_general(
                    eye, oprows, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)          # [ct, 4]
                mr = mr * _prod_sublanes(jnp.where(valid, opc[:, 0:1], 1.0))
                mg = mg * _prod_sublanes(jnp.where(valid, opc[:, 1:2], 1.0))
                mb = mb * _prod_sublanes(jnp.where(valid, opc[:, 2:3], 1.0))
                ma = ma * _prod_sublanes(jnp.where(valid, opc[:, 3:4], 1.0))
                return mr, mg, mb, ma

            mr, mg, mb, ma = jax.lax.cond(
                jnp.logical_and(proceed, jnp.any(rhit)), visit, lambda a: a,
                (mr, mg, mb, ma))
            cont = jnp.logical_and(proceed, k + 1 < n_units)
            return k + 1, mr, mg, mb, ma, cont

        def cond(state):
            return state[5]

        ones = jnp.ones((1, BLOCK), jnp.float32)
        _, mr, mg, mb, ma, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), ones, ones, ones, ones, jnp.array(True)))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


@jax.jit
def _cluster_closest_inst_impl(origin, direction, near, far, u_box, u_rows,
                               frames):
    R = origin.shape[0]
    n_units = u_rows.shape[0]
    streamed = frames.shape[0] > RESIDENT_CLUSTERS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    (box_spec, _, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, u_box.shape, frames.shape)
    rows_spec = pl.BlockSpec(u_rows.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    def kern(box_ref, rows_ref, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             t_ref, id_ref, inst_ref, *scratch):
        inner = _closest_kernel_inst(n_units, streamed)
        inner(box_ref, rows_ref, clip_ref, lw_ref, o4_ref.at[0],
              d4_ref.at[0], nf_ref.at[0], t_ref.at[0], id_ref.at[0],
              inst_ref.at[0], *scratch)

    t, tid, inst = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(3)),
        in_specs=[box_spec, rows_spec, clip_spec, lw_spec, ray_spec,
                  ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(3)),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(u_box, u_rows, clip_rows_jnp(u_box, n_units), frames, o4, d4, nf_b)
    return (t.reshape(rp)[:R], tid.reshape(rp)[:R].astype(jnp.int32),
            inst.reshape(rp)[:R].astype(jnp.int32))


def cluster_closest_inst(origin, direction, near, far, u_box, u_rows,
                         frames):
    """Two-level closest hit. Returns (t [R], tri_id [R] i32 in DEVICE
    (cluster) order, inst_id [R] i32; -1 = miss). Discrete outputs — the
    integrator re-derives differentiable t/b1/b2 via refine_tri on the
    instance-transformed triangle."""
    t, tid, inst = _cluster_closest_inst_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, u_box, u_rows, frames)))
    return (jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid),
            jax.lax.stop_gradient(inst))


@jax.jit
def _cluster_shadow_inst_impl(origin, direction, dist, u_box, u_rows,
                              frames, op_tab):
    R = origin.shape[0]
    n_units = u_rows.shape[0]
    streamed = frames.shape[0] > RESIDENT_CLUSTERS
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    (box_spec, _, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, u_box.shape, frames.shape)
    rows_spec = pl.BlockSpec(u_rows.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec(op_tab.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel_inst(n_units, streamed)
        inner(box_ref, rows_ref, clip_ref, lw_ref, op_ref, o4_ref.at[0],
              d4_ref.at[0], nf_ref.at[0], *[o.at[0] for o in outs],
              *scratch)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(4)),
        in_specs=[box_spec, rows_spec, clip_spec, lw_spec, op_spec,
                  ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(4)),
        scratch_shapes=_scratch(streamed),
        interpret=_interpret(),
    )(u_box, u_rows, clip_rows_jnp(u_box, n_units), frames, op_tab, o4, d4,
      nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@jax.custom_vjp
def cluster_shadow_inst(origin, direction, dist, u_box, u_rows, frames,
                        u_inst, u_slot, cl_base, cl_count, tri_slot,
                        inst_slot_map, mat_color, tri_v0, tri_e1, tri_e2,
                        exp_tri, exp_inst, inst_fwd):
    """Two-level shadow traversal: (mask_rgb [R,3], mask_a [R]).

    Opacity comes live from ``mat_color`` through each unit's instance slot
    table (never stale). Backward replays the test through the dense
    differentiable projection over the expanded (instance, triangle) set —
    the same path-replay argument as the soup shadow."""
    op_tab = unit_opacity(mat_color, inst_slot_map, tri_slot, u_inst,
                          u_slot, cl_base, cl_count)
    return _cluster_shadow_inst_impl(origin, direction, dist, u_box, u_rows,
                                     frames, op_tab)


def _cs_inst_fwd(origin, direction, dist, u_box, u_rows, frames,
                 u_inst, u_slot, cl_base, cl_count, tri_slot,
                 inst_slot_map, mat_color, tri_v0, tri_e1, tri_e2,
                 exp_tri, exp_inst, inst_fwd):
    out = cluster_shadow_inst(origin, direction, dist, u_box, u_rows, frames,
                              u_inst, u_slot, cl_base, cl_count, tri_slot,
                              inst_slot_map, mat_color, tri_v0, tri_e1,
                              tri_e2, exp_tri, exp_inst, inst_fwd)
    res = (origin, direction, dist, tri_slot, inst_slot_map, mat_color,
           tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd)
    return out, res


def _cs_inst_bwd(res, g):
    (origin, direction, dist, tri_slot, inst_slot_map, mat_color,
     tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd) = res

    def f(origin, direction, dist, tri_v0, tri_e1, tri_e2, mat_color):
        a = inst_fwd[exp_inst].reshape(-1, 3, 4)          # [K,3,4]
        lin = a[:, :, :3]

        def l2g(v, translate):
            w = jnp.einsum("kij,kj->ki", lin, v[exp_tri])
            return w + a[:, :, 3] if translate else w

        v0w = l2g(tri_v0, True)
        e1w = l2g(tri_e1, False)
        e2w = l2g(tri_e2, False)
        mid = inst_slot_map[exp_inst, tri_slot[exp_tri]]
        mc = mat_color[mid]
        pw, pc = _frames_jnp(v0w, e1w, e2w)
        return project_shadow(origin, direction, dist, pw, pc,
                              mc[:, :3], 1.0 - mc[:, 3],
                              chunk=min(512, v0w.shape[0]))

    _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     mat_color)
    d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_mc = vjp(g)
    return (d_o, d_d, d_dist, None, None, None, None, None, None, None,
            None, None, d_mc, d_v0, d_e1, d_e2, None, None, None)


cluster_shadow_inst.defvjp(_cs_inst_fwd, _cs_inst_bwd)
