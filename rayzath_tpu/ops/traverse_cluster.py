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

Scenes whose cluster-frame table exceeds ``RESIDENT_CLUSTERS`` keep frames
AND per-cluster opacity rows in HBM and DMA each visited cluster's blocks
into VMEM scratch (pltpu.make_async_copy). Residency budget per cluster:
6 KB frames (streamed), 2 KB opacity (streamed on the shadow path), 32 B
AABB lanes + 32 B SMEM scalars (always resident) — so the resident tables
stay under a few MB far past a million triangles, and the f32 triangle-id
rows bound the scene at 2^24 triangles (asserted at build).

Numerical ground rules learned ON the chip (rounds 4-5): the MXU's default
f32 mode rounds operands to bf16 (visible as missing hits at cluster
edges). Every geometry contraction therefore decomposes its f32 operands
into bf16 LIMBS and K-STACKS the significant cross-products along the
contraction axis (_dot_split): the contraction depth here is only 4 while
an MXU pass natively reduces K=128, so the whole multi-limb reconstruction
fits in ONE pass — measured at the same speed as the (wrong) single
bf16 pass and 2.4x faster than the round-4 form that issued each cross
product as its own pass. Three limbs per operand carry the full 24-bit
f32 mantissa at any operand magnitude, which also fixed the distant-origin
precision loss the 2-limb pairs had (tools/r5parity.py, edges_far sweep).
Sub-8-sublane offset slices and scratch buffers narrower than 128 lanes
mis-lower in Mosaic and are avoided throughout; every one-hot/rank trick
quantizes its operands to bf16-exact values so those single-pass MXU
products stay exact.

Scenes with at most TINY_MAX real clusters (Cornell class) skip the rank
pass, occupancy clip and visit loop entirely (statically unrolled gated
visits); mesh-class tables unroll the visit loop 4x (_unroll_for); and
bounce wavefronts are coherence-sorted upstream by a payload-carrying
radix sort (ops/sort_rays.sort_payload, ~0.9 ms per 512^2 call) that cuts
gated visits 2-4x on incoherent wavefronts.
"""
from __future__ import annotations

import functools
import os
from functools import partial

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
RANK_CHUNK = 256        # all-pairs rank row-chunk (bounds VMEM at [256, C])

# box_tab sublane layout ([8, Cp] f32, clusters on lanes)
B_MIN = 0               # rows 0..2: cluster AABB min xyz
B_MAX = 3               # rows 3..5: cluster AABB max xyz
B_BASE = 6              # row 6: first triangle (reordered index)
B_CNT = 7               # row 7: triangle count (0 = padding lane)


_MOSAIC_OK = None


def mosaic_supported() -> bool:
    """Capability probe: can this backend compile and run a Mosaic kernel?

    Probed once by actually compiling a trivial Pallas kernel (cached).
    A name allowlist would silently route real accelerators with unknown
    platform names ('tpu' vs the tunneled chip's 'axon' vs whatever comes
    next) into interpret mode — catastrophically slow with no error
    (round-3 advisor finding). CPU skips the probe: interpret mode IS the
    intended path there (the test suite's virtual mesh)."""
    global _MOSAIC_OK
    if _MOSAIC_OK is None:
        if jax.default_backend() == "cpu":
            _MOSAIC_OK = False
        else:
            try:
                # the probe exercises the pltpu features the real kernels
                # rely on (an SMEM input BlockSpec + VMEM scratch): a
                # non-TPU Pallas backend that can compile a trivial VMEM
                # kernel but not these would otherwise pass the probe and
                # crash later in the real traversal (round-4 advisor finding)
                def k(s_ref, x_ref, o_ref, scratch):
                    scratch[:, :] = x_ref[:, :] + s_ref[0, 0]
                    o_ref[:, :] = scratch[:, :]

                out = pl.pallas_call(
                    k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec((1, 8), lambda: (0, 0),
                                           memory_space=pltpu.SMEM),
                              pl.BlockSpec((8, 128), lambda: (0, 0),
                                           memory_space=pltpu.VMEM)],
                    scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                )(jnp.ones((1, 8), jnp.float32),
                  jnp.zeros((8, 128), jnp.float32))
                jax.block_until_ready(out)
                _MOSAIC_OK = True
            except Exception as e:  # noqa: BLE001 - any compile failure
                import warnings
                warnings.warn(
                    f"backend {jax.default_backend()!r} cannot compile "
                    f"Mosaic kernels ({type(e).__name__}); cluster traversal "
                    "falls back to interpret mode (orders of magnitude "
                    "slower)", RuntimeWarning)
                _MOSAIC_OK = False
    return _MOSAIC_OK


def _interpret() -> bool:
    return not mosaic_supported()


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


def _split16(x):
    """bf16 limb decomposition of f32 values.

    2 limbs (hi, lo) reconstruct x to ~2^-17 relative — enough when the
    contraction's operands are O(cluster size), NOT enough for cluster-local
    ray origins of distant cameras (measured: 200-unit origins lost ~1.5e-3
    absolute in local units and flipped near-edge hits). 3 limbs carry the
    full 24-bit f32 mantissa at any magnitude, and under the K-stacked dot
    (_dot_split) the extra limb costs NO additional MXU pass — the term
    count grows from 4 to 6 along the contraction axis (K=24 < 128)."""
    limbs = []
    r = x
    for _ in range(_LIMBS - 1):
        h = r.astype(jnp.bfloat16)
        limbs.append(h)
        r = r - h.astype(jnp.float32)
    limbs.append(r.astype(jnp.bfloat16))
    return tuple(limbs)


def _dot_split(a_pair, b_pair):
    """f32-accurate contraction from bf16 MXU products.

    The MXU's DEFAULT f32 mode rounds operands to bf16 (measured: 17/221
    brute-force hits missing at cluster edges), and HIGHEST runs 6 passes
    (~3x whole-call cost on visit-bound scenes). bf16 inputs go through
    the MXU losslessly, so (hi+lo)x(hi+lo) expanded into four bf16 cross
    products with f32 accumulation reconstructs the product to ~2^-23 —
    exact for this use.

    ksplit (default): the four cross products are STACKED ALONG THE
    CONTRACTION AXIS into one K=16 dot — the geometry contractions here
    contract over a K of only 4, while an MXU pass natively reduces
    K=128, so four separate K=4 passes waste ~4x pass latency for the
    identical sum. Measured (tools/r5probe.py): the 4-dot form ran the
    36-tri Cornell closest call at 1.72 ms vs 0.71 ms for one pass —
    the stack recovers that gap with bit-equivalent math (same four
    products, f32 accumulation in a different order)."""
    dims = (((0,), (0,)), ((), ()))

    def d(a, b):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=jnp.float32)

    if DOT_MODE == "single":        # measurement probe only: parity-broken
        return d(a_pair[0], b_pair[0])
    if DOT_MODE == "split3":
        a_hi, a_lo = a_pair
        b_hi, b_lo = b_pair
        return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))
    if DOT_MODE == "split4":
        a_hi, a_lo = a_pair
        b_hi, b_lo = b_pair
        return ((d(a_hi, b_hi) + d(a_hi, b_lo))
                + (d(a_lo, b_hi) + d(a_lo, b_lo)))
    # K-stack: every cross product whose combined limb order stays above
    # the f32 accumulation floor (i + j <= 2 keeps terms >= ~2^-27 rel;
    # smaller terms drown in the f32 accumulate anyway)
    terms = [(a, b) for i, a in enumerate(a_pair)
             for j, b in enumerate(b_pair) if i + j <= 2]
    ak = jnp.concatenate([t[0] for t in terms], axis=0)
    bk = jnp.concatenate([t[1] for t in terms], axis=0)
    return d(ak, bk)


def _dot_oh(oh16, vals, dims):
    """Exact one-hot contraction: the one-hot factor is bf16-exact, the
    f32 values ride through as a bf16 (hi, lo) pair stacked along the
    contraction axis (one MXU pass; see _dot_split)."""
    limbs = _split16(vals)
    ca = dims[0][0][0]
    cb = dims[0][1][0]
    oh2 = jnp.concatenate([oh16] * len(limbs), axis=ca)
    v2 = jnp.concatenate(limbs, axis=cb)
    return jax.lax.dot_general(oh2, v2, dims,
                               preferred_element_type=jnp.float32)


def _project_parts(lw, o4s_pair, d4_pair, near, limit=None):
    """(t, valid) [CLUSTER_T, BLOCK] tiles of the cluster's triangles
    against the block: split-bf16 MXU contractions + fused elementwise.
    ``o4s_pair`` must hold CLUSTER-LOCAL ray origins (shifted by the
    cluster's box center, whose offset the frame constants absorb at build
    time): the local magnitudes keep the hi/lo expansion's f32 accumulation
    error below ~1e-5 in barycentric units. ol and dl stay SEPARATE
    contractions: a merged [4, 2B] right-hand side measured no faster and
    its [3ct, 2B] intermediates doubled the scoped-VMEM peak (mesh_heavy
    blew the 16 MB limit by 28 KB)."""
    ct = CLUSTER_T
    lw_pair = _split16(lw)
    ol = _dot_split(lw_pair, o4s_pair)                  # [3ct, B]
    dl = _dot_split(lw_pair, d4_pair)
    olx, oly, olz = ol[0:ct], ol[ct:2 * ct], ol[2 * ct:]
    dlx, dly, dlz = dl[0:ct], dl[ct:2 * ct], dl[2 * ct:]
    # epsilon guard on the divide: a NaN/inf t from dlz == 0 relies on
    # IEEE all-false comparisons to read as a miss, which Mosaic's vector
    # compare/select does not guarantee (observed: NaN accum on-chip with
    # the guard removed, while interpret mode stayed clean)
    dlz = dlz + jnp.where(jnp.abs(dlz) < DET_EPS, DET_EPS, 0.0)
    t = olz / -dlz
    vt = (t > near) if limit is None else ((t > near) & (t < limit))
    b1 = olx + t * dlx
    b2 = oly + t * dly
    valid = ((b1 >= 0.0) & (b1 <= 1.0) & (b2 >= 0.0) & (b1 + b2 <= 1.0)
             & vt)
    return t, valid


def _project_leaf(lw, o4s_pair, d4_pair, near):
    """[CLUSTER_T, BLOCK] hit distances (BIG where invalid). The best-t
    window check happens after the reduce (one [1, B] compare instead of a
    [ct, B] compare + and): the reduced min is the nearest valid hit, so
    comparing IT against best_t is equivalent."""
    t, valid = _project_parts(lw, o4s_pair, d4_pair, near)
    return jnp.where(valid, t, BIG)


def _project_leaf_mask(lw, o4s_pair, d4_pair, limit):
    """[CLUSTER_T, BLOCK] validity mask for the shadow product (t in
    (0, limit))."""
    _, valid = _project_parts(lw, o4s_pair, d4_pair, 0.0, limit)
    return valid


def _local_o4(ox, oy, oz, cx, cy, cz):
    """Cluster-local homogeneous origin rows, pre-split to bf16 (hi, lo)."""
    o4s = jnp.concatenate([ox - cx, oy - cy, oz - cz,
                           jnp.ones_like(ox)], axis=0)
    return _split16(o4s)


def _prod_sublanes(x):
    """Product over the sublane axis of [CLUSTER_T, BLOCK] by halving
    (static steps); Mosaic has no native multiply-reduce.

    Halving stops at 8 sublanes: offset slices below one (8, 128) register
    tile hit a Mosaic mis-lowering (the same bug class crashes outright in
    other shapes — 'vector_extract_strided_slice: limits 8 vs dim 1' — and
    here silently produced NaN shadow masks on-chip). The last three levels
    instead reshape sublanes onto lanes and multiply 128-aligned lane
    slices, which lower cleanly."""
    n = x.shape[0]
    while n > 8:
        h = n // 2
        x = x[:h] * x[h:n]
        n = h
    b = x.shape[1]
    row = x.reshape(1, n * b)
    out = row[:, 0:b]
    for k in range(1, n):
        out = out * row[:, k * b:(k + 1) * b]
    return out                                          # [1, BLOCK]


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
    # triangle ids travel through the kernels as f32 (sub_id + base, miss
    # sentinel 2^30): exact only below 2^24 triangles
    assert t_count < 2 ** 24, "f32 triangle ids overflow at 2^24 triangles"
    pmin, pmax = triangle_aabbs(tri_v0, tri_v0 + tri_e1, tri_v0 + tri_e2)
    bvh = build_bvh(pmin, pmax, leaf_size=cluster_t)
    order = bvh.order if t_count else np.zeros(0, np.int32)
    v0, e1, e2 = tri_v0[order], tri_e1[order], tri_e2[order]

    # leaves -> clusters, SPLITTING any leaf larger than cluster_t (the
    # BVH's too-large-object partition can emit oversized leaves when
    # centroids coincide); chunk bounds recomputed from the chunk's own
    # triangle AABBs so culling stays tight
    pmin_r = pmin[order] if t_count else pmin
    pmax_r = pmax[order] if t_count else pmax
    leaves = []          # (begin, count, bmin, bmax) per CLUSTER
    if t_count:
        for node in np.nonzero(bvh.node_count > 0)[0]:
            b = int(bvh.node_begin[node])
            n = int(bvh.node_count[node])
            if n <= cluster_t:
                leaves.append((b, n, bvh.node_min[node], bvh.node_max[node]))
            else:
                for b0 in range(b, b + n, cluster_t):
                    m = min(cluster_t, b + n - b0)
                    leaves.append((b0, m, pmin_r[b0:b0 + m].min(0),
                                   pmax_r[b0:b0 + m].max(0)))
    c = len(leaves)
    cp = max(128, -(-max(c, 1) // 128) * 128)
    box = np.zeros((8, cp), np.float32)
    # padding lanes: inverted boxes that no interval test can reach
    box[B_MIN:B_MIN + 3, :] = 3e38
    box[B_MAX:B_MAX + 3, :] = -3e38
    # frames/base/count are padded to the SAME 128-lane bucket as the box
    # table: the kernel's static n_clusters then quantizes at 128, so small
    # geometry edits keep every traced shape (and the jit cache) stable.
    # Padding rows are never-hit frames ranked at INF — the visit loop exits
    # before reaching them.
    base = np.zeros(cp, np.int32)
    count = np.zeros(cp, np.int32)
    frames = np.zeros((cp, 4, 3 * cluster_t), np.float32)
    # never-hit padding frames: w = 0, c = (-1, -1, 1) => b1 = -1 everywhere
    frames[:, 3, 0 * cluster_t:1 * cluster_t] = -1.0
    frames[:, 3, 1 * cluster_t:2 * cluster_t] = -1.0
    frames[:, 3, 2 * cluster_t:3 * cluster_t] = 1.0
    if t_count:
        w_all, c_all = triangle_frames(v0, e1, e2)      # [3, 3T], [3T]
        for s, (b, n, bmin, bmax) in enumerate(leaves):
            base[s] = b
            count[s] = n
            box[B_MIN:B_MIN + 3, s] = bmin
            box[B_MAX:B_MAX + 3, s] = bmax
            box[B_BASE, s] = float(b)
            box[B_CNT, s] = float(n)
            # the kernels evaluate frames against CLUSTER-LOCAL ray origins
            # (o - box center): absorb the center into the constant term in
            # f64 so the in-kernel split-bf16 contraction sees small, well-
            # conditioned magnitudes (see _dot_split)
            ctr = (bmin.astype(np.float64) + bmax.astype(np.float64)) * 0.5
            for a in range(3):                          # local coord part
                cols = slice(a * t_count + b, a * t_count + b + n)
                w_c = w_all[:, cols].astype(np.float64)
                frames[s, 0:3, a * cluster_t:a * cluster_t + n] = w_all[:, cols]
                frames[s, 3, a * cluster_t:a * cluster_t + n] = (
                    c_all[cols].astype(np.float64) + ctr @ w_c
                ).astype(np.float32)
    return box, frames, order.astype(np.int32), base, count


def box_rows(box_tab):
    """Row-major twin of ``box_tab``: [Cp, 8], fed to the kernels through
    SMEM so per-visit scalar reads cost ~1 cycle instead of the ~100-cycle
    VMEM lane extract (the round-3 kernels' dominant per-iteration cost)."""
    return jnp.transpose(box_tab)                       # [Cp, 8]


def _pad_lanes(box_tab, n: int = 128):
    """Append ``n`` inverted-box padding lanes so the unrolled visit loop can
    read one group past the last real rank without going out of bounds."""
    pad = jnp.zeros((8, n), box_tab.dtype)
    pad = pad.at[B_MIN:B_MIN + 3].set(3e38).at[B_MAX:B_MAX + 3].set(-3e38)
    return jnp.concatenate([box_tab, pad], axis=1)


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


def _visit_order(dist):
    """[C, 2] visit list from the per-cluster distance row: row k holds
    (candidate index with rank k, its distance) — rank 0 = nearest, ties by
    index, INF lanes trail.

    One fused all-pairs pass per 128-candidate chunk (static Python loop):
    the chunk's distances become a column via an MXU one-hot transpose, the
    [n, C] compare yields the chunk's ranks, and one-hot contractions
    scatter (index, distance) into SUBLANE-major columns. The visit loop
    then reads its per-iteration scalars with one dynamic sublane slice +
    two lane extracts — the round-3 design paid ~2 us/iteration in masked
    reduces for the same information (measured: cluster_closest on 720
    clusters, incoherent rays, 367 ms). A VMEM->SMEM DMA staging of this
    list read ~10x faster per scalar but miscomputed intermittently
    depending on process history (NaN masks with bit-identical inputs), so
    the list deliberately stays in VMEM."""
    c = dist.shape[1]
    # bf16-quantize (round down) so every MXU product below is EXACT at
    # DEFAULT precision: the one-hot factors are exact 0/1 and bf16 values
    # survive the MXU's reduced-precision passes losslessly. Rounding DOWN
    # keeps pdist a conservative lower bound (the early exits compare
    # pd <= stop; a rounded-UP pd could skip a candidate that still holds a
    # closer hit). The visit ORDER is then approximate at bf16 granularity,
    # which only perturbs neighbors with near-equal culling distances.
    fin = jnp.minimum(dist, INF)
    down = jnp.where(fin > 0, fin * (1.0 - 2.0 ** -8), fin * (1.0 + 2.0 ** -8))
    dist = down.astype(jnp.bfloat16).astype(jnp.float32)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    # shrink the chunk for huge tables: the loop body's [n, C] temporaries
    # must fit scoped VMEM beside the visit buffers (n=256 at 5760 lanes
    # was 330 KB over the 16 MB limit even with the fori reuse)
    n = min(RANK_CHUNK if c <= 2048 else 64, c)
    dims = (((1,), (1,)), ((), ()))
    col_dims = (((0,), (0,)), ((), ()))

    def chunk(k, carry):
        # a lax.fori_loop, NOT a python loop: Mosaic stack-allocates every
        # unrolled iteration's [n, C] temporaries SIMULTANEOUSLY, so the
        # unrolled form consumed C^2 * 4 bytes of scoped VMEM regardless of
        # chunk size (55 MB at 3712 clusters — the 500k-tri scene's OOM);
        # the loop body's buffers are reused across iterations instead
        perm, pdist = carry
        i0 = k * n
        ri = jax.lax.broadcasted_iota(jnp.int32, (n, c), 0) + i0
        sel = (jax.lax.broadcasted_iota(jnp.int32, (n, c), 1) == ri)
        dist_col = jax.lax.dot_general(
            sel.astype(jnp.float32), dist, dims,
            preferred_element_type=jnp.float32)          # [n, 1]
        # chunk rows past the table width would read a 0 distance and
        # scatter out-of-range indices into the visit list (observed as an
        # out-of-bounds read -> device fault when C % chunk != 0): force
        # them to INF so their rank lands past every real lane
        dist_col = jnp.where(ri[:, 0:1] < c, dist_col, INF)
        beats_me = (dist < dist_col) | ((dist == dist_col) & (ci < ri))
        rank_col = jnp.sum(beats_me.astype(jnp.float32), axis=1,
                           keepdims=True)                # [n, 1]
        # one-hot over rank lanes; bf16-exact factors keep every
        # contraction below exact at the MXU's native pass
        scat = (rank_col == ci.astype(jnp.float32)).astype(jnp.bfloat16)
        idx_col = (jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
                   + i0).astype(jnp.float32)             # [n, 1]
        ilimbs = _split16(idx_col)
        perm = perm + jax.lax.dot_general(
            jnp.concatenate([scat] * len(ilimbs), axis=0),
            jnp.concatenate(ilimbs, axis=0), col_dims,
            preferred_element_type=jnp.float32)
        pdist = pdist + jax.lax.dot_general(
            scat, dist_col.astype(jnp.bfloat16), col_dims,
            preferred_element_type=jnp.float32)
        return perm, pdist

    n_chunks = -(-c // n)
    perm0 = jnp.zeros((c, 1), jnp.float32)
    pdist0 = jnp.zeros((c, 1), jnp.float32)
    if n_chunks == 1:
        perm, pdist = chunk(0, (perm0, pdist0))
    else:
        perm, pdist = jax.lax.fori_loop(0, n_chunks, chunk, (perm0, pdist0))
    return jnp.concatenate([perm, pdist], axis=1)        # [c, 2]


def _r8(v):
    """[1, BLOCK] row -> native [8, BLOCK // 8] register layout."""
    return v.reshape(8, BLOCK // 8)


def _slab8(bmin, bmax, o8, i8):
    """Per-ray slab test of one AABB (6 scalars) in [8, 128] layout."""
    tx1 = (bmin[0] - o8[0]) * i8[0]
    ty1 = (bmin[1] - o8[1]) * i8[1]
    tz1 = (bmin[2] - o8[2]) * i8[2]
    tx2 = (bmax[0] - o8[0]) * i8[0]
    ty2 = (bmax[1] - o8[1]) * i8[1]
    tz2 = (bmax[2] - o8[2]) * i8[2]
    tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx1, tx2),
                                   jnp.minimum(ty1, ty2)),
                       jnp.minimum(tz1, tz2))
    tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx1, tx2),
                                   jnp.maximum(ty1, ty2)),
                       jnp.maximum(tz1, tz2))
    return tmin, tmax


def _min_tree(t, i):
    """Joint (t, id) min over the sublane axis: native min, then min of ids
    over the argmin rows (ties -> lowest id). A manual halving tree is ~25%
    fewer ops but trips a Mosaic layout bug on sub-8-sublane offset slices
    (vector_extract_strided_slice: limits 8 vs dim 1), so native reductions
    it is."""
    t_new = jnp.min(t, axis=0, keepdims=True)           # [1, BLOCK]
    ids = jnp.where(t == t_new, i, _ID_BIG)
    return t_new, jnp.min(ids, axis=0, keepdims=True)


def _ray_rows4(o4, d4):
    ox, oy, oz = o4[0:1, :], o4[1:2, :], o4[2:3, :]
    dx, dy, dz = d4[0:1, :], d4[1:2, :], d4[2:3, :]
    return ox, oy, oz, dx, dy, dz


def _inv8(d8):
    """Safe per-axis direction inverses in [8, 128] layout (1 vreg per op
    instead of 8 for the [1, BLOCK] row form)."""
    eps = 1e-12

    def inv1(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v < 0, -eps, eps), v)

    return tuple(inv1(v) for v in d8)


CLIP_K = 32             # occupancy boxes per scene (kernel loop is unrolled)


def clip_rows_jnp(box_tab, n_real: int):
    """In-jit [k, 8] occupancy boxes (k static, power of two <= CLIP_K) from
    the cluster/unit AABB table: contiguous lane groups (build order is
    spatial) are unioned into coarse boxes. Lives in SMEM inside the kernels
    (scalar feeds); the kernel unrolls exactly k slab tests — the round-3
    form always unrolled CLIP_K = 32, costing every block ~2 us of dead clip
    tests on small scenes."""
    cp = box_tab.shape[1]
    k = 1
    while k < CLIP_K and k * 16 < n_real:
        k *= 2                                   # power of two divides cp
    g = cp // k
    mins = jnp.min(box_tab[B_MIN:B_MIN + 3].reshape(3, k, g), axis=2)
    maxs = jnp.max(box_tab[B_MAX:B_MAX + 3].reshape(3, k, g), axis=2)
    rows = jnp.concatenate([mins, maxs], axis=0).T          # [k, 6]
    return jnp.pad(rows, ((0, 0), (0, 2)))


def _occupancy_clip(clip_ref, o8, i8, near8, far8):
    """Clip per-ray ``far`` to the last exit from any occupancy box.

    Rays pointing at the sky (or skimming over the geometry) would
    otherwise keep far = BIG, so the front-to-back early exit never fires
    and the block enumerates every feasible cluster. A ray whose segment
    misses every occupancy box is excluded outright (far = -1). Runs in the
    native [8, 128] register layout — [1, BLOCK] rows waste 7/8 of each
    vreg's sublanes."""
    far_occ = jnp.full((8, BLOCK // 8), -1.0, jnp.float32)
    for j in range(clip_ref.shape[0]):
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
    # cap before scaling: a degenerate ray can push an exit distance to inf,
    # and inf * 1.0001 would let the raw (possibly f32-max) far through —
    # which then exceeds even the INF padding distances and turns the
    # front-to-back exit off entirely (observed: 192 visits/block on a
    # 33-cluster scene)
    far_occ = jnp.minimum(far_occ, BIG)
    out = jnp.where(ok, jnp.minimum(far8, far_occ * 1.0001 + 1e-4), -1.0)
    return out.reshape(1, BLOCK)


def _ray_setup(o4, d4, near_row, far_row, clip_ref):
    """Shared per-block ray prologue: [1, B] rows for the interval cull,
    [8, 128] tuples for slab gates, occupancy-clipped far in both layouts."""
    ox, oy, oz, dx, dy, dz = _ray_rows4(o4, d4)
    o8 = (_r8(ox), _r8(oy), _r8(oz))
    d8 = (_r8(dx), _r8(dy), _r8(dz))
    i8 = _inv8(d8)
    far = _occupancy_clip(clip_ref, o8, i8, _r8(near_row), _r8(far_row))
    return (ox, oy, oz, dx, dy, dz), o8, i8, far


def _frame_loader(streamed, lw_ref, scratch):
    if not streamed:
        return lambda slot: lw_ref[pl.ds(slot, 1), :, :][0]
    buf, sem = scratch[1:3]

    def load(slot):
        dma = pltpu.make_async_copy(lw_ref.at[pl.ds(slot, 1)], buf, sem)
        dma.start()
        dma.wait()
        return buf[0]
    return load


def _op_loader(streamed, op_ref, scratch):
    """Per-visit [4, ct] opacity rows: resident VMEM reads, or (streamed)
    DMA'd from HBM like the frames — keeping op_tab fully VMEM-resident past
    RESIDENT_CLUSTERS added ~2 KB/cluster and broke the shadow pass's VMEM
    budget around a few thousand clusters (advisor finding)."""
    if not streamed:
        return lambda slot: op_ref[pl.ds(slot, 1), :, :][0]
    buf, sem = scratch[3:5]

    def load(slot):
        dma = pltpu.make_async_copy(op_ref.at[pl.ds(slot, 1)], buf, sem)
        dma.start()
        dma.wait()
        return buf[0]
    return load


# ---------------------------------------------------------------------------
# closest-hit kernel
# ---------------------------------------------------------------------------

_ID_BIG = float(2 ** 30)
# experiment knobs (read once at import; used by tools/r5probe.py subprocesses)
# ksplit3 = 3 bf16 limbs, 6 cross terms, one K=24 MXU pass (full f32 mantissa
# at any operand magnitude); ksplit = 2 limbs / 4 terms / K=16 (round-4
# accuracy at the same speed); split4/split3/single = separate-pass forms
DOT_MODE = os.environ.get("RZ_DOT", "ksplit3")
_LIMBS = 3 if DOT_MODE == "ksplit3" else 2
KSTATS = os.environ.get("RZ_KSTATS", "") == "1"  # extra per-block visit stats
UNROLL = int(os.environ.get("RZ_UNROLL", "1"))
                        # candidates examined per visit-loop iteration
# Measured (teapot bounce wavefront): removing the per-candidate slab gate
# and visiting every ranked candidate is SLOWER (19.3 vs 16.9 ms/call) even
# at 33 clusters — the gate's tmin <= best_t term keeps pruning candidates
# as best_t shrinks mid-walk, which the front-to-back stop_t alone cannot.
# The visit loop is therefore always gated.


#: above this many box-table rows the per-candidate scalar feed moves from
#: SMEM (1 MB limit — a [5760, 8] table blew it on the 500k-tri scene) to a
#: 128-lane-padded VMEM table read with dynamic sublane slices (slower per
#: scalar, only used by huge streamed scenes)
SMEM_ROWS_MAX = 2048


def _col_getter(box_smem, smem_ok: bool):
    """Per-candidate scalar reader: ``get(c)(j)`` -> box_rows[c, j]."""
    if smem_ok:
        def get(c):
            return lambda j: box_smem[c, j]
    else:
        def get(c):
            row = box_smem[pl.ds(c, 1), :]
            return lambda j: row[0, j]
    return get


def _smem_col(get_c):
    """(bmin, bmax, base) of one candidate from its scalar reader."""
    bmin = (get_c(B_MIN), get_c(B_MIN + 1), get_c(B_MIN + 2))
    bmax = (get_c(B_MAX), get_c(B_MAX + 1), get_c(B_MAX + 2))
    return bmin, bmax, get_c(B_BASE)


def _pad_frames(frames):
    """Append one never-hit frame row (w = 0, c = (-1,-1,1): b1 = -1 for
    every ray): the clamped visit reader sends any out-of-range candidate
    here, making a spurious visit an exact no-op."""
    ct = frames.shape[2] // 3
    pad = jnp.zeros((1, 4, 3 * ct), frames.dtype)
    pad = pad.at[0, 3, 0:ct].set(-1.0).at[0, 3, ct:2 * ct].set(-1.0)
    pad = pad.at[0, 3, 2 * ct:].set(1.0)
    return jnp.concatenate([frames, pad], axis=0)


def _pad_ops(op_tab):
    """Append one all-ones opacity row (multiplicative identity)."""
    return jnp.concatenate(
        [op_tab, jnp.ones((1,) + op_tab.shape[1:], op_tab.dtype)], axis=0)


def _order_reader(pvm, order):
    """Store the [C, 2] visit list in VMEM scratch; returns a reader
    ``(k) -> (candidate f32, distance f32)`` using one dynamic sublane
    slice + two static lane extracts (the round-3-proven access pattern;
    see _visit_order on why this is not an SMEM DMA)."""
    pvm[:, :] = jnp.pad(order, ((0, 0), (0, 128 - order.shape[1])))

    def read(k):
        row = pvm[pl.ds(k, 1), :]
        return row[0, 0], row[0, 1]
    return read


def _clamp_c(c_f, n_pad: int):
    """Candidate index hardened against a miscompiled visit gate: out-of-
    range indices land on the tables' neutral pad row (observed on-chip:
    a visit cond occasionally fired for INF-distance padding candidates
    depending on process history, and the resulting out-of-bounds opacity
    reads surfaced as NaN shadow masks with bit-identical inputs)."""
    return jnp.clip(c_f.astype(jnp.int32), 0, n_pad)


#: scenes with at most this many REAL clusters take the unrolled tiny path:
#: no rank pass, no occupancy clip, no visit loop — just n_real gated visits
#: (a 36-tri Cornell block otherwise spends ~1 us ranking its one candidate)
TINY_MAX = 4


def _tiny_closest(n_real, box_smem, lw_ref, streamed, scratch, rows, o8, i8,
                  near, far, d4p, sub_ids):
    ox, oy, oz, dx, dy, dz = rows
    load_frames = _frame_loader(streamed, lw_ref, scratch)
    near8 = _r8(near)
    best_t = jnp.minimum(far, BIG)
    best_id = jnp.full((1, BLOCK), -1.0, jnp.float32)
    for c in range(n_real):
        bmin, bmax, base = _smem_col(lambda j, c=c: box_smem[c, j])

        def visit(args, c=c, base=base, bmin=bmin, bmax=bmax):
            best_t, best_id = args
            lw = load_frames(c)
            o4sp = _local_o4(ox, oy, oz,
                             (bmin[0] + bmax[0]) * 0.5,
                             (bmin[1] + bmax[1]) * 0.5,
                             (bmin[2] + bmax[2]) * 0.5)
            tm = _project_leaf(lw, o4sp, d4p, near)
            t_new, id_new = _min_tree(tm, sub_ids)
            got = t_new < best_t
            best_id = jnp.where(got, id_new + base, best_id)
            best_t = jnp.where(got, t_new, best_t)
            return best_t, best_id

        tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
        rhit = (tmax8 >= near8) & (tmin8 <= tmax8) & (tmin8 <= _r8(best_t))
        best_t, best_id = jax.lax.cond(jnp.any(rhit), visit, lambda a: a,
                                       (best_t, best_id))
    return best_t, best_id


def _unroll_for(n_clusters: int) -> int:
    """Visit-loop unroll: 4 for mesh-class tables (candidate-scan bound —
    measured on-chip: mesh_heavy bounce 119 -> 97 ms at unroll 4), 1 for
    small tables (unroll overruns past the front-to-back exit: the 36-tri
    Cornell got 70% slower at unroll 4)."""
    if UNROLL != 1:
        return UNROLL            # explicit override for experiments
    return 4 if n_clusters >= 512 else 1


def _closest_kernel(n_clusters: int, streamed: bool, n_real=None,
                    smem_ok: bool = True):
    unroll = _unroll_for(n_clusters)
    def kern(box_ref, box_smem, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             t_ref, id_ref, *scratch, ks=None):
        cp = box_ref.shape[1]
        box_get = _col_getter(box_smem, smem_ok)
        if n_real is not None and n_real <= TINY_MAX:
            o4 = o4_ref[:]
            d4 = d4_ref[:]
            near, far = nf_ref[0:1, :], nf_ref[1:2, :]
            ox, oy, oz, dx, dy, dz = _ray_rows4(o4, d4)
            o8 = (_r8(ox), _r8(oy), _r8(oz))
            d8 = (_r8(dx), _r8(dy), _r8(dz))
            i8 = _inv8(d8)
            far = jnp.where(far > 0.0, jnp.minimum(far, BIG), -1.0)
            sub_ids = jax.lax.broadcasted_iota(
                jnp.int32, (CLUSTER_T, BLOCK), 0).astype(jnp.float32)
            best_t, best_id = _tiny_closest(
                n_real, box_smem, lw_ref, streamed, scratch,
                (ox, oy, oz, dx, dy, dz), o8, i8, near, far,
                _split16(d4), sub_ids)
            t_ref[:] = best_t
            id_ref[:] = best_id
            if ks is not None:
                ks[0][:] = jnp.full((1, BLOCK), float(n_real))
                ks[1][:] = jnp.full((1, BLOCK), float(n_real))
            return
        pvm = scratch[0]
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        near, far_in = nf_ref[0:1, :], nf_ref[1:2, :]
        rows, o8, i8, far = _ray_setup(o4, d4, near, far_in, clip_ref)
        ox, oy, oz, dx, dy, dz = rows
        valid_ray = far > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        near8 = _r8(near)

        t_cap = jnp.max(jnp.where(valid_ray, far, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        read_order = _order_reader(pvm, _visit_order(dist0))
        sub_ids = jax.lax.broadcasted_iota(
            jnp.int32, (CLUSTER_T, BLOCK), 0).astype(jnp.float32)
        d4p = _split16(d4)

        def body(state):
            k, best_t, best_id, stop_t, _, nv = state
            for u in range(unroll):
                c_f, pd = read_order(k + u)
                c = _clamp_c(c_f, n_clusters)   # n_clusters = pad row
                g = box_get(c)
                bmin, bmax, base = _smem_col(g)

                def visit(args, c=c, base=base, bmin=bmin, bmax=bmax):
                    best_t, best_id, nv = args
                    lw = load_frames(c)
                    o4sp = _local_o4(ox, oy, oz,
                                     (bmin[0] + bmax[0]) * 0.5,
                                     (bmin[1] + bmax[1]) * 0.5,
                                     (bmin[2] + bmax[2]) * 0.5)
                    tm = _project_leaf(lw, o4sp, d4p, near)
                    t_new, id_new = _min_tree(tm, sub_ids)
                    got = t_new < best_t
                    best_id = jnp.where(got, id_new + base, best_id)
                    best_t = jnp.where(got, t_new, best_t)
                    return best_t, best_id, nv + 1

                tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
                bt8 = _r8(best_t)
                rhit = (tmax8 >= near8) & (tmin8 <= tmax8) & (tmin8 <= bt8)
                best_t, best_id, nv = jax.lax.cond(
                    (pd <= stop_t) & (pd < INF_GATE) & jnp.any(rhit),
                    visit, lambda a: a, (best_t, best_id, nv))
            stop_t = jnp.max(best_t)
            return (k + unroll, best_t, best_id, stop_t,
                    read_order(k + unroll)[1], nv)

        def cond(state):
            k, _, _, stop_t, pd_next, _ = state
            # the INF_GATE term stops at padding/unreachable candidates even
            # if stop_t is degenerate-large (reference r3 semantics)
            return ((pd_next <= stop_t) & (pd_next < INF_GATE)
                    & (k < cp - unroll))

        best_t0 = jnp.minimum(far, BIG)
        k_end, best_t, best_id, _, _, nv = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), best_t0,
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.max(best_t0), read_order(0)[1], jnp.int32(0)))
        t_ref[:] = best_t
        id_ref[:] = best_id
        if ks is not None:
            ks[0][:] = jnp.full((1, BLOCK), 1.0) * k_end.astype(jnp.float32)
            ks[1][:] = jnp.full((1, BLOCK), 1.0) * nv.astype(jnp.float32)
    return kern


# ---------------------------------------------------------------------------
# shadow kernel
# ---------------------------------------------------------------------------

def _shadow_kernel(n_clusters: int, streamed: bool, n_real=None,
                   smem_ok: bool = True):
    unroll = _unroll_for(n_clusters)
    def kern(box_ref, box_smem, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, mr_ref, mg_ref, mb_ref, ma_ref, *scratch):
        cp = box_ref.shape[1]
        box_get = _col_getter(box_smem, smem_ok)
        if n_real is not None and n_real <= TINY_MAX:
            o4 = o4_ref[:]
            d4 = d4_ref[:]
            dist_t = nf_ref[0:1, :]
            ox, oy, oz, dx, dy, dz = _ray_rows4(o4, d4)
            o8 = (_r8(ox), _r8(oy), _r8(oz))
            i8 = _inv8((_r8(dx), _r8(dy), _r8(dz)))
            load_frames = _frame_loader(streamed, lw_ref, scratch)
            load_ops = _op_loader(streamed, op_ref, scratch)
            dist8 = _r8(dist_t)
            r128 = jax.lax.broadcasted_iota(jnp.int32,
                                            (CLUSTER_T, CLUSTER_T), 0)
            c128 = jax.lax.broadcasted_iota(jnp.int32,
                                            (CLUSTER_T, CLUSTER_T), 1)
            eye = (r128 == c128).astype(jnp.bfloat16)
            d4p = _split16(d4)
            ones = jnp.ones((1, BLOCK), jnp.float32)
            mr, mg, mb, ma = ones, ones, ones, ones
            for c in range(n_real):
                bmin, bmax, _b = _smem_col(lambda j, c=c: box_smem[c, j])

                def visit(args, c=c, bmin=bmin, bmax=bmax):
                    mr, mg, mb, ma = args
                    lw = load_frames(c)
                    o4sp = _local_o4(ox, oy, oz,
                                     (bmin[0] + bmax[0]) * 0.5,
                                     (bmin[1] + bmax[1]) * 0.5,
                                     (bmin[2] + bmax[2]) * 0.5)
                    valid = _project_leaf_mask(lw, o4sp, d4p, dist_t)
                    oprows = load_ops(c)
                    opc = _dot_oh(eye, oprows,
                                  (((1,), (1,)), ((), ())))      # [ct, 4]
                    mr = mr * _prod_sublanes(
                        jnp.where(valid, opc[:, 0:1], 1.0))
                    mg = mg * _prod_sublanes(
                        jnp.where(valid, opc[:, 1:2], 1.0))
                    mb = mb * _prod_sublanes(
                        jnp.where(valid, opc[:, 2:3], 1.0))
                    ma = ma * _prod_sublanes(
                        jnp.where(valid, opc[:, 3:4], 1.0))
                    return mr, mg, mb, ma

                tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
                rhit = ((tmax8 >= 0.0) & (tmin8 <= tmax8)
                        & (tmin8 <= dist8) & (_r8(ma) >= 1e-4))
                mr, mg, mb, ma = jax.lax.cond(jnp.any(rhit), visit,
                                              lambda a: a, (mr, mg, mb, ma))
            mr_ref[:] = mr
            mg_ref[:] = mg
            mb_ref[:] = mb
            ma_ref[:] = ma
            return
        pvm = scratch[0]
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        zero_row = jnp.zeros((1, BLOCK), jnp.float32)
        rows, o8, i8, dist_t = _ray_setup(o4, d4, zero_row, nf_ref[0:1, :],
                                          clip_ref)
        ox, oy, oz, dx, dy, dz = rows
        valid_ray = dist_t > 0.0
        load_frames = _frame_loader(streamed, lw_ref, scratch)
        load_ops = _op_loader(streamed, op_ref, scratch)
        dist8 = _r8(dist_t)

        t_cap = jnp.max(jnp.where(valid_ray, dist_t, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        read_order = _order_reader(pvm, _visit_order(dist0))
        r128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 0)
        c128 = jax.lax.broadcasted_iota(jnp.int32, (CLUSTER_T, CLUSTER_T), 1)
        eye = (r128 == c128).astype(jnp.bfloat16)
        d4p = _split16(d4)

        def body(state):
            k, mr, mg, mb, ma, stop_s, _ = state
            ma8 = _r8(ma)
            live8 = ma8 >= 1e-4
            for u in range(unroll):
                c_f, pd = read_order(k + u)
                c = _clamp_c(c_f, n_clusters)   # n_clusters = pad row
                bmin, bmax, _b = _smem_col(box_get(c))

                def visit(args, c=c, bmin=bmin, bmax=bmax):
                    mr, mg, mb, ma = args
                    lw = load_frames(c)
                    o4sp = _local_o4(ox, oy, oz,
                                     (bmin[0] + bmax[0]) * 0.5,
                                     (bmin[1] + bmax[1]) * 0.5,
                                     (bmin[2] + bmax[2]) * 0.5)
                    valid = _project_leaf_mask(lw, o4sp, d4p, dist_t)
                    # [4, ct] rgba rows -> [ct, 4] columns via MXU transpose
                    oprows = load_ops(c)
                    opc = _dot_oh(eye, oprows,
                                  (((1,), (1,)), ((), ())))      # [ct, 4]
                    mr = mr * _prod_sublanes(
                        jnp.where(valid, opc[:, 0:1], 1.0))
                    mg = mg * _prod_sublanes(
                        jnp.where(valid, opc[:, 1:2], 1.0))
                    mb = mb * _prod_sublanes(
                        jnp.where(valid, opc[:, 2:3], 1.0))
                    ma = ma * _prod_sublanes(
                        jnp.where(valid, opc[:, 3:4], 1.0))
                    return mr, mg, mb, ma

                tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
                rhit = ((tmax8 >= 0.0) & (tmin8 <= tmax8)
                        & (tmin8 <= dist8) & live8)
                mr, mg, mb, ma = jax.lax.cond(
                    (pd <= stop_s) & (pd < INF_GATE) & jnp.any(rhit),
                    visit, lambda a: a, (mr, mg, mb, ma))
            # candidates beyond every still-unblocked ray's segment end
            # cannot change the result: cap the walk there (the round-3
            # shadow kernel had no distance-based exit at all)
            stop_s = jnp.max(jnp.where(_r8(ma) >= 1e-4, dist8, -1.0))
            return (k + unroll, mr, mg, mb, ma, stop_s,
                    read_order(k + unroll)[1])

        def cond(state):
            k, _, _, _, _, stop_s, pd_next = state
            return ((pd_next <= stop_s) & (pd_next < INF_GATE)
                    & (k < cp - unroll))

        ones = jnp.ones((1, BLOCK), jnp.float32)
        _, mr, mg, mb, ma, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), ones, ones, ones, ones, t_cap,
             read_order(0)[1]))
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


def _specs(streamed: bool, box_shape, lw_shape, clip_k: int,
           smem_ok: bool = True):
    box_spec = pl.BlockSpec(box_shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if smem_ok:
        rows_spec = pl.BlockSpec((box_shape[1], 8), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
    else:   # 1 MB SMEM limit: huge streamed tables ride in VMEM instead
        rows_spec = pl.BlockSpec((box_shape[1], 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM)
    clip_spec = pl.BlockSpec((clip_k, 8), lambda i: (0, 0),
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




def _compiler_params(cp: int):
    """Raise the Mosaic scoped-VMEM budget for huge cluster tables: the
    16 MB default left the 500k-triangle scene ~300 KB short (the visit
    list + 128-lane scalar table + rank chunks legitimately need it);
    v5e VMEM is far larger than the compiler's conservative default."""
    if cp <= SMEM_ROWS_MAX:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)


def _scratch(streamed: bool, cp: int, with_op: bool = False):
    # full 128-lane rows: dynamic row slices of a 2-lane-wide scratch are
    # sub-tile accesses, which Mosaic mis-lowers (observed: garbage reads ->
    # runaway visit loops); the r3-proven pattern is a [rows, 128] table
    base = [pltpu.VMEM((cp, 128), jnp.float32)]
    if not streamed:
        return base
    extra = [pltpu.VMEM((1, 4, 3 * CLUSTER_T), jnp.float32),
             pltpu.SemaphoreType.DMA]
    if with_op:
        extra += [pltpu.VMEM((1, 4, CLUSTER_T), jnp.float32),
                  pltpu.SemaphoreType.DMA]
    return base + extra


@partial(jax.jit, static_argnames=("n_real",))
def _cluster_closest_impl(origin, direction, near, far, box_tab, frames,
                          n_real=None):
    R = origin.shape[0]
    n_clusters = frames.shape[0]
    streamed = n_clusters > RESIDENT_CLUSTERS
    frames = _pad_frames(frames)
    box_tab = _pad_lanes(box_tab)
    cp = box_tab.shape[1]
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    clip = clip_rows_jnp(box_tab, n_clusters)
    smem_ok = cp <= SMEM_ROWS_MAX
    rows = box_rows(box_tab)
    if not smem_ok:
        rows = jnp.pad(rows, ((0, 0), (0, 120)))
    (box_spec, rows_spec, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, box_tab.shape, frames.shape, clip.shape[0],
                        smem_ok)

    n_out = 4 if KSTATS else 2

    def kern(box_ref, box_smem, clip_ref, lw_ref, o4_ref, d4_ref, nf_ref,
             *rest):
        outs, scratch = rest[:n_out], rest[n_out:]
        inner = _closest_kernel(n_clusters, streamed, n_real, smem_ok)
        ks = [o.at[0] for o in outs[2:]] if KSTATS else None
        inner(box_ref, box_smem, clip_ref, lw_ref, o4_ref.at[0],
              d4_ref.at[0], nf_ref.at[0], outs[0].at[0], outs[1].at[0],
              *scratch, ks=ks)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(n_out)),
        in_specs=[box_spec, rows_spec, clip_spec, lw_spec, ray_spec,
                  ray_spec, nf_spec],
        out_specs=tuple(out_spec for _ in range(n_out)),
        scratch_shapes=_scratch(streamed, cp),
        compiler_params=_compiler_params(cp),
        interpret=_interpret(),
    )(box_tab, rows, clip, frames, o4, d4, nf_b)
    t, tid = outs[0], outs[1]
    ks = (outs[2][:, 0, 0], outs[3][:, 0, 0]) if KSTATS else None
    return t.reshape(rp)[:R], tid.reshape(rp)[:R].astype(jnp.int32), ks


#: per-block (candidates-examined, gated-visits) rows from the most recent
#: KSTATS=1 cluster_closest call (tools/r5probe.py diagnostics only)
_KS_LAST = {}


def cluster_closest(origin, direction, near, far, box_tab, frames, order,
                    n_real=None):
    """Closest hit. Returns (t [R], tri_id [R] i32 in ORIGINAL order, -1 =
    miss). Discrete output — wrapped in stop_gradient (the integrator
    re-derives differentiable t/b1/b2 from the ids via refine_hit).
    ``n_real``: optional static REAL cluster count; scenes with
    n_real <= TINY_MAX take the unrolled tiny path."""
    t, rid, ks = _cluster_closest_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, box_tab, frames)),
        n_real=n_real if (n_real is not None and n_real <= TINY_MAX)
        else None)
    if ks is not None:
        _KS_LAST["k"], _KS_LAST["visits"] = ks
    tid = jnp.where(rid >= 0, order[jnp.clip(rid, 0, order.shape[0] - 1)], -1)
    return jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid)


@partial(jax.jit, static_argnames=("n_real",))
def _cluster_shadow_impl(origin, direction, dist, box_tab, frames, op_tab,
                         n_real=None):
    R = origin.shape[0]
    n_clusters = frames.shape[0]
    streamed = n_clusters > RESIDENT_CLUSTERS
    frames = _pad_frames(frames)
    op_tab = _pad_ops(op_tab)
    box_tab = _pad_lanes(box_tab)
    cp = box_tab.shape[1]
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    clip = clip_rows_jnp(box_tab, n_clusters)
    smem_ok = cp <= SMEM_ROWS_MAX
    rows = box_rows(box_tab)
    if not smem_ok:
        rows = jnp.pad(rows, ((0, 0), (0, 120)))
    (box_spec, rows_spec, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, box_tab.shape, frames.shape, clip.shape[0],
                        smem_ok)
    op_spec = pl.BlockSpec(op_tab.shape, lambda i: (0, 0, 0),
                           memory_space=pl.ANY if streamed else pltpu.VMEM)

    def kern(box_ref, box_smem, clip_ref, lw_ref, op_ref, o4_ref, d4_ref,
             nf_ref, *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel(n_clusters, streamed, n_real, smem_ok)
        inner(box_ref, box_smem, clip_ref, lw_ref, op_ref, o4_ref.at[0],
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
        scratch_shapes=_scratch(streamed, cp, with_op=True),
        compiler_params=_compiler_params(cp),
        interpret=_interpret(),
    )(box_tab, rows, clip, frames, op_tab, o4, d4, nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@functools.lru_cache(maxsize=None)
def _make_cluster_shadow(n_real):
    """Build the custom_vjp shadow entry for a static real-cluster count
    (None = generic ranked-loop path; <= TINY_MAX = unrolled tiny path).
    A factory because custom_vjp cannot carry a trailing static arg."""

    @jax.custom_vjp
    def shadow(origin, direction, dist, box_tab, frames, order,
               base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
        op_tab = cluster_opacity(op_rgb, op_a, order, base, count)
        return _cluster_shadow_impl(origin, direction, dist, box_tab, frames,
                                    op_tab, n_real=n_real)

    def fwd(origin, direction, dist, box_tab, frames, order,
            base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
        out = shadow(origin, direction, dist, box_tab, frames, order,
                     base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a)
        return out, (origin, direction, dist, tri_v0, tri_e1, tri_e2,
                     op_rgb, op_a)

    def bwd(res, g):
        origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a = res

        def f(origin, direction, dist, tri_v0, tri_e1, tri_e2, op_rgb, op_a):
            pw, pc = _frames_jnp(tri_v0, tri_e1, tri_e2)
            return project_shadow(origin, direction, dist, pw, pc, op_rgb,
                                  op_a, chunk=min(512, tri_v0.shape[0]))

        _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1, tri_e2,
                         op_rgb, op_a)
        d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_oprgb, d_opa = vjp(g)
        return (d_o, d_d, d_dist, None, None, None, None, None,
                d_v0, d_e1, d_e2, d_oprgb, d_opa)

    shadow.defvjp(fwd, bwd)
    return shadow


def cluster_shadow(origin, direction, dist, box_tab, frames, order,
                   base, count, tri_v0, tri_e1, tri_e2, op_rgb, op_a,
                   n_real=None):
    """Shadow traversal: (mask_rgb [R,3], mask_a [R]).

    Forward runs the Pallas kernel with the in-jit cluster opacity table
    (live material values); backward replays through the dense
    differentiable projection path (path-replay: the transmission product is
    order-independent, so the gradient matches wherever the alpha early-out
    has not saturated — beyond it the light term is ~0). ``n_real``: static
    real cluster count; scenes <= TINY_MAX take the unrolled tiny path."""
    key = n_real if (n_real is not None and n_real <= TINY_MAX) else None
    return _make_cluster_shadow(key)(
        origin, direction, dist, box_tab, frames, order, base, count,
        tri_v0, tri_e1, tri_e2, op_rgb, op_a)


# ---------------------------------------------------------------------------
# instanced (two-level) variant: TLAS over instances, shared object-space BLAS
# ---------------------------------------------------------------------------
#
# The reference's TLAS-over-instances + BLAS-per-mesh traversal
# (cuda_bvh.cuh:114-171 + cuda_instance.cuh:167-264) restructured for the
# visit loop: the serial walk ranks INSTANCES (world AABB interval culling +
# front-to-back order, like the soup kernels rank clusters), and a visited
# instance transforms the block's rays into object space ONCE (12 FMAs per
# ray row), then sweeps its mesh's clusters with object-space slab gates and
# MXU projection visits. Mesh cluster frames/boxes are shared by all
# instances of a mesh — geometry is never duplicated, and the rank domain is
# |instances|, not |instances x clusters| (the round-3 unit table ranked
# 3457 candidates for 145 instances and paid ~2 us per candidate).

# ti_rows layout ([Ip, TI_W] f32 in SMEM, one row per instance)
TI_MIN = 0              # 0..2: world AABB min
TI_MAX = 3              # 3..5: world AABB max
TI_INV = 6              # 6..17: world->object 3x4 (row-major)
TI_CL0 = 18             # first mesh-cluster slot (shared cluster tables)
TI_NCL = 19             # cluster count (0 = padding row)
TI_ID = 20              # instance id
TI_W = 24

# cl_obox rows ([Cmp, 8] f32 in SMEM, one row per shared mesh cluster):
# same layout as box_rows (B_MIN/B_MAX/B_BASE/B_CNT) in OBJECT space.


def build_instance_tables(wmin, wmax, inv, cl0, ncl, inst_id):
    """Host build of the TLAS tables: wmin/wmax [I,3] world AABBs,
    inv [I,3,4] world->object, cl0/ncl [I] shared-cluster ranges, inst_id [I].
    Returns (ti_box [8, Ip] lane-major for the interval cull,
    ti_rows [Ip, TI_W] for SMEM scalar feeds)."""
    i = len(cl0)
    ip = max(128, -(-max(i, 1) // 128) * 128)
    box = np.zeros((8, ip), np.float32)
    box[B_MIN:B_MIN + 3, :] = 3e38
    box[B_MAX:B_MAX + 3, :] = -3e38
    rows = np.zeros((ip, TI_W), np.float32)
    if i:
        box[B_MIN:B_MIN + 3, :i] = wmin.T
        box[B_MAX:B_MAX + 3, :i] = wmax.T
        box[B_BASE, :i] = np.arange(i, dtype=np.float32)
        box[B_CNT, :i] = ncl.astype(np.float32)
        rows[:i, TI_MIN:TI_MIN + 3] = wmin
        rows[:i, TI_MAX:TI_MAX + 3] = wmax
        rows[:i, TI_INV:TI_INV + 12] = inv.reshape(i, 12)
        rows[:i, TI_CL0] = cl0.astype(np.float32)
        rows[:i, TI_NCL] = ncl.astype(np.float32)
        rows[:i, TI_ID] = inst_id.astype(np.float32)
    return box, rows


def cluster_slot_rows(tri_slot, cl_base, cl_count,
                      cluster_t: int = CLUSTER_T):
    """[Cm, ct] per-cluster triangle material-SLOT rows (device order), for
    the in-kernel opacity resolve of the instanced shadow walk. Padding
    slots keep slot 0 (their projection rows never validate)."""
    ct = cluster_t
    idx = cl_base[:, None] + jnp.arange(ct)[None, :]
    valid = jnp.arange(ct)[None, :] < cl_count[:, None]
    idx = jnp.clip(idx, 0, max(tri_slot.shape[0] - 1, 0))
    return jnp.where(valid, tri_slot[idx], 0).astype(jnp.float32)


def instance_opacity(mat_color, inst_slot_map):
    """In-jit [I, 4, 64] per-instance slot opacity (rgb, 1 - alpha) resolved
    live from the material table — edits and training are never stale, and
    the footprint is |instances| x 64 slots instead of the round-3
    |units| x ct table the advisor flagged as a VMEM blowup."""
    mc = mat_color[inst_slot_map]                       # [I,64,4]
    ops = jnp.concatenate([mc[..., :3], 1.0 - mc[..., 3:4]], axis=-1)
    return jnp.transpose(ops, (0, 2, 1))                # [I,4,64]


def _object_block(row_get, ox, oy, oz, dx, dy, dz):
    """Transform the block's world rays into an instance's object space.

    Returns ((oxl, oyl, ozl) rows for per-cluster local origins, the
    split-bf16 [4,B] direction pair for the MXU projection, and [8,128]
    triples o8l, i8l for slab gates). The object->world t metric is
    preserved because the direction transforms UNnormalized:
    T(o + t d) = T(o) + t L d."""
    a = [row_get(TI_INV + k) for k in range(12)]
    oxl = a[0] * ox + a[1] * oy + a[2] * oz + a[3]
    oyl = a[4] * ox + a[5] * oy + a[6] * oz + a[7]
    ozl = a[8] * ox + a[9] * oy + a[10] * oz + a[11]
    dxl = a[0] * dx + a[1] * dy + a[2] * dz
    dyl = a[4] * dx + a[5] * dy + a[6] * dz
    dzl = a[8] * dx + a[9] * dy + a[10] * dz
    d4l = jnp.concatenate([dxl, dyl, dzl, jnp.zeros_like(ox)], axis=0)
    eps = 1e-12

    def inv1(v):
        return 1.0 / jnp.where(jnp.abs(v) < eps,
                               jnp.where(v < 0, -eps, eps), v)

    o8l = (_r8(oxl), _r8(oyl), _r8(ozl))
    i8l = (_r8(inv1(dxl)), _r8(inv1(dyl)), _r8(inv1(dzl)))
    return (oxl, oyl, ozl), _split16(d4l), o8l, i8l, d4l


def _cl_col(cl_smem, s):
    bmin = (cl_smem[s, B_MIN], cl_smem[s, B_MIN + 1], cl_smem[s, B_MIN + 2])
    bmax = (cl_smem[s, B_MAX], cl_smem[s, B_MAX + 1], cl_smem[s, B_MAX + 2])
    return bmin, bmax, cl_smem[s, B_BASE]


#: per-instance cluster sweeps at or below this count skip the vectorized
#: cull + mini-rank (its ~2 us/visit fixed cost exceeds the serial sweep of
#: a handful of clusters); above it the ranked shortlist wins (measured:
#: the round-4 serial sweep cost ~0.5 us of fori/cond machinery per
#: (instance, cluster))
MINI_RANK_MIN = 8


def _inst_cluster_order(ibox_ref, orows, d4l, valid_ray, t_cap, cl0, ncl,
                        pvm2):
    """Ranked object-space cluster shortlist for one visited instance.

    The round-4 kernels swept EVERY cluster of the instance's mesh through a
    serial ``fori_loop`` + ``cond`` (~0.5 us of loop machinery per
    (instance, cluster) — the instanced path's measured bottleneck). This
    replaces the sweep with the same trick the soup kernel uses one level
    up: one [1, Cmp] conservative interval cull of the transformed block
    against ALL shared mesh clusters (lanes limited to the instance's
    range), ranked front-to-back; the inner loop then visits only feasible
    clusters in ascending distance order and exits at the first INF."""
    oxl, oyl, ozl = orows
    dxl = d4l[0:1, :]
    dyl = d4l[1:2, :]
    dzl = d4l[2:3, :]
    cmp_ = ibox_ref.shape[1]
    dist1 = _cluster_dists(ibox_ref, oxl, oyl, ozl, dxl, dyl, dzl,
                           valid_ray, t_cap)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, cmp_), 1)
    in_range = (ci >= cl0) & (ci < cl0 + ncl)
    dist1 = jnp.where(in_range, dist1, INF)
    return _order_reader(pvm2, _visit_order(dist1))


def _closest_kernel_inst(n_inst: int, streamed: bool, max_ncl=None):
    direct = max_ncl is not None and max_ncl <= MINI_RANK_MIN
    def kern(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref, o4_ref,
             d4_ref, nf_ref, t_ref, id_ref, inst_ref, *scratch):
        ip = box_ref.shape[1]
        cmp_ = ibox_ref.shape[1]
        pvm, pvm2 = scratch[0], scratch[1]
        rest = scratch[2:]
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        near, far_in = nf_ref[0:1, :], nf_ref[1:2, :]
        rows, o8, i8, far = _ray_setup(o4, d4, near, far_in, clip_ref)
        ox, oy, oz, dx, dy, dz = rows
        valid_ray = far > 0.0
        load_frames = _frame_loader(streamed, lw_ref, (None,) + rest)
        near8 = _r8(near)

        t_cap = jnp.max(jnp.where(valid_ray, far, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        read_order = _order_reader(pvm, _visit_order(dist0))
        sub_ids = jax.lax.broadcasted_iota(
            jnp.int32, (CLUSTER_T, BLOCK), 0).astype(jnp.float32)

        def body(state):
            k, best_t, best_id, best_inst, stop_t, _ = state
            c_f, pd = read_order(k)
            c = _clamp_c(c_f, ip - 1)   # padded ti rows are zeros: ncl = 0
            bmin = (ti_smem[c, TI_MIN], ti_smem[c, TI_MIN + 1],
                    ti_smem[c, TI_MIN + 2])
            bmax = (ti_smem[c, TI_MAX], ti_smem[c, TI_MAX + 1],
                    ti_smem[c, TI_MAX + 2])
            tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
            rhit = (tmax8 >= near8) & (tmin8 <= tmax8) & (tmin8 <= _r8(best_t))

            def visit(args):
                best_t, best_id, best_inst = args
                orows, d4lp, o8l, i8l, d4l = _object_block(
                    lambda j: ti_smem[c, j], ox, oy, oz, dx, dy, dz)
                cl0 = ti_smem[c, TI_CL0].astype(jnp.int32)
                ncl = ti_smem[c, TI_NCL].astype(jnp.int32)
                gid = ti_smem[c, TI_ID]

                def cvisit_at(s, args, cmin, cmax, base):
                    best_t, best_id, best_inst = args
                    lw = load_frames(s)
                    o4sp = _local_o4(*orows,
                                     (cmin[0] + cmax[0]) * 0.5,
                                     (cmin[1] + cmax[1]) * 0.5,
                                     (cmin[2] + cmax[2]) * 0.5)
                    tm = _project_leaf(lw, o4sp, d4lp, near)
                    t_new, id_new = _min_tree(tm, sub_ids)
                    got = t_new < best_t
                    best_id = jnp.where(got, id_new + base, best_id)
                    best_inst = jnp.where(got, gid, best_inst)
                    best_t = jnp.where(got, t_new, best_t)
                    return best_t, best_id, best_inst

                if direct:      # few clusters per mesh: serial gated sweep
                    def inner(j, args):
                        best_t = args[0]
                        s = cl0 + j
                        cmin, cmax, base = _cl_col(cl_smem, s)
                        ctmin8, ctmax8 = _slab8(cmin, cmax, o8l, i8l)
                        chit = ((ctmax8 >= near8) & (ctmin8 <= ctmax8)
                                & (ctmin8 <= _r8(best_t)))
                        return jax.lax.cond(
                            jnp.any(chit),
                            lambda a, s=s, cmin=cmin, cmax=cmax, base=base:
                            cvisit_at(s, a, cmin, cmax, base),
                            lambda a: a, args)

                    return jax.lax.fori_loop(0, ncl, inner,
                                             (best_t, best_id, best_inst))

                cap = jnp.max(jnp.where(valid_ray, best_t, -1.0))
                read2 = _inst_cluster_order(ibox_ref, orows, d4l, valid_ray,
                                            cap, cl0, ncl, pvm2)

                def inner(st):
                    j, best_t, best_id, best_inst, stop_i, _ = st
                    s_f, pdj = read2(j)
                    s = _clamp_c(s_f, cmp_ - 1)
                    cmin, cmax, base = _cl_col(cl_smem, s)
                    ctmin8, ctmax8 = _slab8(cmin, cmax, o8l, i8l)
                    chit = ((ctmax8 >= near8) & (ctmin8 <= ctmax8)
                            & (ctmin8 <= _r8(best_t)))

                    best_t, best_id, best_inst = jax.lax.cond(
                        (pdj <= stop_i) & (pdj < INF_GATE) & jnp.any(chit),
                        lambda a, s=s, cmin=cmin, cmax=cmax, base=base:
                        cvisit_at(s, a, cmin, cmax, base),
                        lambda a: a, (best_t, best_id, best_inst))
                    stop_i = jnp.max(best_t)
                    return (j + 1, best_t, best_id, best_inst, stop_i,
                            read2(j + 1)[1])

                def icond(st):
                    j, _, _, _, stop_i, pd_next = st
                    return ((pd_next <= stop_i) & (pd_next < INF_GATE)
                            & (j < cmp_ - 1))

                _, best_t, best_id, best_inst, _, _ = jax.lax.while_loop(
                    icond, inner,
                    (jnp.int32(0), best_t, best_id, best_inst,
                     jnp.max(best_t), read2(0)[1]))
                return best_t, best_id, best_inst

            best_t, best_id, best_inst = jax.lax.cond(
                (pd <= stop_t) & (pd < INF_GATE) & jnp.any(rhit),
                visit, lambda a: a, (best_t, best_id, best_inst))
            stop_t = jnp.max(best_t)
            return (k + 1, best_t, best_id, best_inst, stop_t,
                    read_order(k + 1)[1])

        def cond(state):
            k, _, _, _, stop_t, pd_next = state
            return ((pd_next <= stop_t) & (pd_next < INF_GATE)
                    & (k < ip - 1))

        best_t0 = jnp.minimum(far, BIG)
        _, best_t, best_id, best_inst, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), best_t0,
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.full((1, BLOCK), -1.0, jnp.float32),
             jnp.max(best_t0), read_order(0)[1]))
        t_ref[:] = best_t
        id_ref[:] = best_id
        inst_ref[:] = best_inst
    return kern


def _shadow_kernel_inst(n_inst: int, streamed: bool, max_ncl=None):
    direct = max_ncl is not None and max_ncl <= MINI_RANK_MIN
    def kern(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref, scl_ref,
             op_ref, o4_ref, d4_ref, nf_ref, mr_ref, mg_ref, mb_ref, ma_ref,
             *scratch):
        ip = box_ref.shape[1]
        cmp_ = ibox_ref.shape[1]
        pvm, pvm2 = scratch[0], scratch[1]
        rest = scratch[2:]
        o4 = o4_ref[:]
        d4 = d4_ref[:]
        zero_row = jnp.zeros((1, BLOCK), jnp.float32)
        rows, o8, i8, dist_t = _ray_setup(o4, d4, zero_row, nf_ref[0:1, :],
                                          clip_ref)
        ox, oy, oz, dx, dy, dz = rows
        valid_ray = dist_t > 0.0
        load_frames = _frame_loader(streamed, lw_ref, (None,) + rest)
        ct = CLUSTER_T
        dist8 = _r8(dist_t)

        t_cap = jnp.max(jnp.where(valid_ray, dist_t, -1.0))
        dist0 = _cluster_dists(box_ref, ox, oy, oz, dx, dy, dz, valid_ray,
                               t_cap)
        read_order = _order_reader(pvm, _visit_order(dist0))
        eye = (jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (ct, ct), 1)
               ).astype(jnp.bfloat16)
        slot64 = jax.lax.broadcasted_iota(jnp.int32, (ct, 64),
                                          1).astype(jnp.float32)

        def body(state):
            k, mr, mg, mb, ma, stop_s, _ = state
            c_f, pd = read_order(k)
            c = _clamp_c(c_f, ip - 1)   # padded ti rows are zeros: ncl = 0
            bmin = (ti_smem[c, TI_MIN], ti_smem[c, TI_MIN + 1],
                    ti_smem[c, TI_MIN + 2])
            bmax = (ti_smem[c, TI_MAX], ti_smem[c, TI_MAX + 1],
                    ti_smem[c, TI_MAX + 2])
            tmin8, tmax8 = _slab8(bmin, bmax, o8, i8)
            rhit = ((tmax8 >= 0.0) & (tmin8 <= tmax8) & (tmin8 <= dist8)
                    & (_r8(ma) >= 1e-4))

            def visit(args):
                mr, mg, mb, ma = args
                orows, d4lp, o8l, i8l, d4l = _object_block(
                    lambda j: ti_smem[c, j], ox, oy, oz, dx, dy, dz)
                cl0 = ti_smem[c, TI_CL0].astype(jnp.int32)
                ncl = ti_smem[c, TI_NCL].astype(jnp.int32)
                gid = ti_smem[c, TI_ID].astype(jnp.int32)
                opi = op_ref[pl.ds(gid, 1), :, :][0]              # [4, 64]

                def cvisit_at(s, args, cmin, cmax):
                    mr, mg, mb, ma = args
                    lw = load_frames(s)
                    o4sp = _local_o4(*orows,
                                     (cmin[0] + cmax[0]) * 0.5,
                                     (cmin[1] + cmax[1]) * 0.5,
                                     (cmin[2] + cmax[2]) * 0.5)
                    valid = _project_leaf_mask(lw, o4sp, d4lp, dist_t)
                    # slot row -> [ct, 1] column -> one-hot -> [ct, 4]
                    srow = scl_ref[pl.ds(s, 1), :]            # [1, ct]
                    # slot ids are small ints (bf16-exact either way);
                    # an all-f32 matvec avoids a Mosaic bf16->f32
                    # broadcast crash in the non-MXU lowering
                    scol = jax.lax.dot_general(
                        eye.astype(jnp.float32), srow,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)   # [ct, 1]
                    oh = (scol == slot64).astype(jnp.bfloat16)  # [ct, 64]
                    opc = _dot_oh(oh, opi,
                                  (((1,), (1,)), ((), ())))   # [ct, 4]
                    mr = mr * _prod_sublanes(
                        jnp.where(valid, opc[:, 0:1], 1.0))
                    mg = mg * _prod_sublanes(
                        jnp.where(valid, opc[:, 1:2], 1.0))
                    mb = mb * _prod_sublanes(
                        jnp.where(valid, opc[:, 2:3], 1.0))
                    ma = ma * _prod_sublanes(
                        jnp.where(valid, opc[:, 3:4], 1.0))
                    return mr, mg, mb, ma

                if direct:      # few clusters per mesh: serial gated sweep
                    def inner(j, args):
                        ma_c = args[3]
                        s = cl0 + j
                        cmin, cmax, _base = _cl_col(cl_smem, s)
                        ctmin8, ctmax8 = _slab8(cmin, cmax, o8l, i8l)
                        chit = ((ctmax8 >= 0.0) & (ctmin8 <= ctmax8)
                                & (ctmin8 <= dist8) & (_r8(ma_c) >= 1e-4))
                        return jax.lax.cond(
                            jnp.any(chit),
                            lambda a, s=s, cmin=cmin, cmax=cmax:
                            cvisit_at(s, a, cmin, cmax),
                            lambda a: a, args)

                    return jax.lax.fori_loop(0, ncl, inner, (mr, mg, mb, ma))

                live = jnp.max(jnp.where(_r8(ma) >= 1e-4, dist8, -1.0))
                read2 = _inst_cluster_order(ibox_ref, orows, d4l, valid_ray,
                                            live, cl0, ncl, pvm2)

                def inner(st):
                    j, mr, mg, mb, ma, stop_i, _ = st
                    s_f, pdj = read2(j)
                    s = _clamp_c(s_f, cmp_ - 1)
                    cmin, cmax, _base = _cl_col(cl_smem, s)
                    ctmin8, ctmax8 = _slab8(cmin, cmax, o8l, i8l)
                    chit = ((ctmax8 >= 0.0) & (ctmin8 <= ctmax8)
                            & (ctmin8 <= dist8) & (_r8(ma) >= 1e-4))

                    mr, mg, mb, ma = jax.lax.cond(
                        (pdj <= stop_i) & (pdj < INF_GATE) & jnp.any(chit),
                        lambda a, s=s, cmin=cmin, cmax=cmax:
                        cvisit_at(s, a, cmin, cmax),
                        lambda a: a, (mr, mg, mb, ma))
                    stop_i = jnp.max(jnp.where(_r8(ma) >= 1e-4, dist8, -1.0))
                    return j + 1, mr, mg, mb, ma, stop_i, read2(j + 1)[1]

                def icond(st):
                    j, _, _, _, _, stop_i, pd_next = st
                    return ((pd_next <= stop_i) & (pd_next < INF_GATE)
                            & (j < cmp_ - 1))

                _, mr, mg, mb, ma, _, _ = jax.lax.while_loop(
                    icond, inner,
                    (jnp.int32(0), mr, mg, mb, ma, live, read2(0)[1]))
                return mr, mg, mb, ma

            mr, mg, mb, ma = jax.lax.cond(
                (pd <= stop_s) & (pd < INF_GATE) & jnp.any(rhit),
                visit, lambda a: a, (mr, mg, mb, ma))
            stop_s = jnp.max(jnp.where(_r8(ma) >= 1e-4, dist8, -1.0))
            return k + 1, mr, mg, mb, ma, stop_s, read_order(k + 1)[1]

        def cond(state):
            k, _, _, _, _, stop_s, pd_next = state
            return ((pd_next <= stop_s) & (pd_next < INF_GATE)
                    & (k < ip - 1))

        ones = jnp.ones((1, BLOCK), jnp.float32)
        _, mr, mg, mb, ma, _, _ = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), ones, ones, ones, ones, t_cap,
             read_order(0)[1]))
        mr_ref[:] = mr
        mg_ref[:] = mg
        mb_ref[:] = mb
        ma_ref[:] = ma
    return kern


def _pad_ti(ti_box, ti_rows):
    box = _pad_lanes(ti_box)
    rows = jnp.pad(ti_rows, ((0, box.shape[1] - ti_rows.shape[0]), (0, 0)))
    return box, rows


def _ibox_from_obox(cl_obox):
    """Lane-major [8, Cmp] twin of the object-space cluster rows, for the
    per-instance vectorized cluster cull (padding lanes: inverted boxes)."""
    box = jnp.transpose(cl_obox)                        # [8, Cm]
    cm = box.shape[1]
    cmp_ = -(-max(cm, 1) // 128) * 128
    pad = jnp.zeros((8, cmp_ - cm), box.dtype)
    pad = pad.at[B_MIN:B_MIN + 3].set(3e38).at[B_MAX:B_MAX + 3].set(-3e38)
    return jnp.concatenate([box, pad], axis=1)


def _scratch_inst(streamed: bool, ip: int, cmp_: int):
    base = [pltpu.VMEM((ip, 128), jnp.float32),
            pltpu.VMEM((cmp_, 128), jnp.float32)]
    if not streamed:
        return base
    return base + [pltpu.VMEM((1, 4, 3 * CLUSTER_T), jnp.float32),
                   pltpu.SemaphoreType.DMA]


@partial(jax.jit, static_argnames=("max_ncl",))
def _cluster_closest_inst_impl(origin, direction, near, far, ti_box, ti_rows,
                               cl_obox, frames, max_ncl=None):
    R = origin.shape[0]
    n_inst = ti_rows.shape[0]
    streamed = frames.shape[0] > RESIDENT_CLUSTERS
    ti_box, ti_rows = _pad_ti(ti_box, ti_rows)
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    clip = clip_rows_jnp(ti_box, n_inst)
    ibox = _ibox_from_obox(cl_obox)
    (box_spec, _, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, ti_box.shape, frames.shape, clip.shape[0])
    ti_spec = pl.BlockSpec(ti_rows.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    cl_spec = pl.BlockSpec(cl_obox.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    ibox_spec = pl.BlockSpec(ibox.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)

    def kern(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref, o4_ref,
             d4_ref, nf_ref, t_ref, id_ref, inst_ref, *scratch):
        inner = _closest_kernel_inst(n_inst, streamed, max_ncl)
        inner(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref,
              o4_ref.at[0], d4_ref.at[0], nf_ref.at[0], t_ref.at[0],
              id_ref.at[0], inst_ref.at[0], *scratch)

    t, tid, inst = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(3)),
        in_specs=[box_spec, ti_spec, cl_spec, ibox_spec, clip_spec, lw_spec,
                  ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(3)),
        scratch_shapes=_scratch_inst(streamed, ti_box.shape[1],
                                     ibox.shape[1]),
        interpret=_interpret(),
    )(ti_box, ti_rows, cl_obox, ibox, clip, frames, o4, d4, nf_b)
    return (t.reshape(rp)[:R], tid.reshape(rp)[:R].astype(jnp.int32),
            inst.reshape(rp)[:R].astype(jnp.int32))


def cluster_closest_inst(origin, direction, near, far, ti_box, ti_rows,
                         cl_obox, frames, max_ncl=None):
    """Two-level closest hit. Returns (t [R], tri_id [R] i32 in DEVICE
    (cluster) order, inst_id [R] i32; -1 = miss). Discrete outputs — the
    integrator re-derives differentiable t/b1/b2 via refine_tri on the
    instance-transformed triangle. ``max_ncl``: static max clusters per
    instance; <= MINI_RANK_MIN selects the serial inner sweep."""
    t, tid, inst = _cluster_closest_inst_impl(
        *map(jax.lax.stop_gradient,
             (origin, direction, near, far, ti_box, ti_rows, cl_obox,
              frames)), max_ncl=max_ncl)
    return (jax.lax.stop_gradient(t), jax.lax.stop_gradient(tid),
            jax.lax.stop_gradient(inst))


@partial(jax.jit, static_argnames=("max_ncl",))
def _cluster_shadow_inst_impl(origin, direction, dist, ti_box, ti_rows,
                              cl_obox, frames, scl, op_tab, max_ncl=None):
    R = origin.shape[0]
    n_inst = ti_rows.shape[0]
    streamed = frames.shape[0] > RESIDENT_CLUSTERS
    ti_box, ti_rows = _pad_ti(ti_box, ti_rows)
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o4 = _ray_mats(origin, 1.0, rp)
    d4 = _ray_mats(direction, 0.0, rp)
    nf = jnp.stack([jnp.pad(dist, (0, rp - R), constant_values=-1.0),
                    jnp.zeros(rp, jnp.float32)], axis=0)
    nf_b = nf.reshape(2, nb, BLOCK).transpose(1, 0, 2)
    clip = clip_rows_jnp(ti_box, n_inst)
    ibox = _ibox_from_obox(cl_obox)
    (box_spec, _, clip_spec, lw_spec, ray_spec, nf_spec,
     out_spec) = _specs(streamed, ti_box.shape, frames.shape, clip.shape[0])
    ti_spec = pl.BlockSpec(ti_rows.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    cl_spec = pl.BlockSpec(cl_obox.shape, lambda i: (0, 0),
                           memory_space=pltpu.SMEM)
    ibox_spec = pl.BlockSpec(ibox.shape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    scl_spec = pl.BlockSpec(scl.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    op_spec = pl.BlockSpec(op_tab.shape, lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)

    def kern(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref, scl_ref,
             op_ref, o4_ref, d4_ref, nf_ref, *rest):
        outs, scratch = rest[:4], rest[4:]
        inner = _shadow_kernel_inst(n_inst, streamed, max_ncl)
        inner(box_ref, ti_smem, cl_smem, ibox_ref, clip_ref, lw_ref, scl_ref,
              op_ref, o4_ref.at[0], d4_ref.at[0], nf_ref.at[0],
              *[o.at[0] for o in outs], *scratch)

    outs = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=tuple(jax.ShapeDtypeStruct((nb, 1, BLOCK), jnp.float32)
                        for _ in range(4)),
        in_specs=[box_spec, ti_spec, cl_spec, ibox_spec, clip_spec, lw_spec,
                  scl_spec, op_spec, ray_spec, ray_spec, nf_spec],
        out_specs=tuple(pl.BlockSpec((1, 1, BLOCK), lambda i: (i, 0, 0))
                        for _ in range(4)),
        scratch_shapes=_scratch_inst(streamed, ti_box.shape[1],
                                     ibox.shape[1]),
        interpret=_interpret(),
    )(ti_box, ti_rows, cl_obox, ibox, clip, frames, scl, op_tab, o4, d4,
      nf_b)
    mr, mg, mb, ma = [x.reshape(rp)[:R] for x in outs]
    return jnp.stack([mr, mg, mb], axis=1), ma


@functools.lru_cache(maxsize=None)
def _make_cluster_shadow_inst(max_ncl):
    """custom_vjp factory keyed on the static max-clusters-per-instance
    (selects the serial vs ranked inner sweep; see _shadow_kernel_inst)."""

    @jax.custom_vjp
    def shadow_inst(origin, direction, dist, ti_box, ti_rows, cl_obox,
                    frames, cl_slot, tri_slot, inst_slot_map, mat_color,
                    tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd):
        op_tab = instance_opacity(mat_color, inst_slot_map)
        return _cluster_shadow_inst_impl(origin, direction, dist, ti_box,
                                         ti_rows, cl_obox, frames, cl_slot,
                                         op_tab, max_ncl=max_ncl)

    def fwd(origin, direction, dist, ti_box, ti_rows, cl_obox,
            frames, cl_slot, tri_slot, inst_slot_map, mat_color,
            tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd):
        out = shadow_inst(origin, direction, dist, ti_box, ti_rows,
                          cl_obox, frames, cl_slot, tri_slot,
                          inst_slot_map, mat_color, tri_v0, tri_e1,
                          tri_e2, exp_tri, exp_inst, inst_fwd)
        res = (origin, direction, dist, tri_slot, inst_slot_map, mat_color,
               tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd)
        return out, res

    def bwd(res, g):
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

        _, vjp = jax.vjp(f, origin, direction, dist, tri_v0, tri_e1,
                         tri_e2, mat_color)
        d_o, d_d, d_dist, d_v0, d_e1, d_e2, d_mc = vjp(g)
        return (d_o, d_d, d_dist, None, None, None, None, None, None, None,
                d_mc, d_v0, d_e1, d_e2, None, None, None)

    shadow_inst.defvjp(fwd, bwd)
    return shadow_inst


def cluster_shadow_inst(origin, direction, dist, ti_box, ti_rows, cl_obox,
                        frames, cl_slot, tri_slot, inst_slot_map, mat_color,
                        tri_v0, tri_e1, tri_e2, exp_tri, exp_inst, inst_fwd,
                        max_ncl=None):
    """Two-level shadow traversal: (mask_rgb [R,3], mask_a [R]).

    Opacity comes live from ``mat_color`` through each instance's slot
    table (never stale; resolved in-kernel via a one-hot MXU contraction).
    Backward replays the test through the dense differentiable projection
    over the expanded (instance, triangle) set — the same path-replay
    argument as the soup shadow."""
    return _make_cluster_shadow_inst(max_ncl)(
        origin, direction, dist, ti_box, ti_rows, cl_obox, frames, cl_slot,
        tri_slot, inst_slot_map, mat_color, tri_v0, tri_e1, tri_e2,
        exp_tri, exp_inst, inst_fwd)
