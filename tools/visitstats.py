"""Offline per-block candidate statistics for the cluster traversal.

Recomputes the kernel's block cull (occupancy clip -> interval dists ->
per-ray slab gates) in NumPy for a scene's primary rays and a synthetic
bounce wavefront, reporting how many candidates each 1024-ray block
enumerates and how many pass the per-ray gate. Multiplied by the measured
~0.2-0.6 us per-iteration and ~1-4 us per-visit costs, this pins where
traversal time goes without touching the chip.

Usage: python tools/visitstats.py --scene teapot_like
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def block_stats(box, cmin, cmax, o, d, far_in, clip_boxes):
    """Candidate stats for ONE block of rays ([B,3] each)."""
    eps = 1e-12
    inv = 1.0 / np.where(np.abs(d) < eps, np.where(d < 0, -eps, eps), d)

    # occupancy clip
    far = np.full(len(o), -1.0, np.float32)
    for k in range(len(clip_boxes)):
        bmin, bmax = clip_boxes[k, :3], clip_boxes[k, 3:6]
        t1 = (bmin[None] - o) * inv
        t2 = (bmax[None] - o) * inv
        tmin = np.minimum(t1, t2).max(1)
        tmax = np.maximum(t1, t2).min(1)
        hit = (tmax >= 0) & (tmin <= tmax) & (tmin <= far_in)
        far = np.where(hit, np.maximum(far, tmax), far)
    far = np.where(far > 0, np.minimum(far_in, far * 1.0001 + 1e-4), -1.0)
    alive = far > 0

    if not alive.any():
        return 0, 0, alive.mean()

    # block interval-dist cull (approximated by the same box bounds logic)
    olo, ohi = o[alive].min(0), o[alive].max(0)
    dlo, dhi = d[alive].min(0), d[alive].max(0)
    t_cap = far[alive].max()

    feas = 0
    gate_hits = 0
    for c in range(len(cmin)):
        # conservative axis t-intervals
        tl, th = 0.0, np.inf
        ok = True
        for a in range(3):
            vl = cmin[c, a] - ohi[a]
            vh = cmax[c, a] - olo[a]
            if dlo[a] > 0:
                lo, hi = max(vl / dhi[a], 0.0), vh / dlo[a]
            elif dhi[a] < 0:
                lo, hi = max(vh / dlo[a], 0.0), vl / dhi[a]
            else:
                if vl > 0 and dhi[a] <= 0 or vh < 0 and dlo[a] >= 0:
                    ok = False
                    break
                lo = vl / dhi[a] if vl > 0 else (vh / dlo[a] if vh < 0 else 0.0)
                lo, hi = max(lo, 0.0), np.inf
            tl, th = max(tl, lo), min(th, hi)
        if not ok or tl > th or tl > t_cap:
            continue
        feas += 1
        # per-ray slab gate
        t1 = (cmin[c][None] - o) * inv
        t2 = (cmax[c][None] - o) * inv
        tmin = np.minimum(t1, t2).max(1)
        tmax = np.maximum(t1, t2).min(1)
        if ((tmax >= 0) & (tmin <= tmax) & (tmin <= far) & alive).any():
            gate_hits += 1
    return feas, gate_hits, alive.mean()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="teapot_like")
    ap.add_argument("--blocks", type=int, default=48)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.ops.traverse_cluster import B_MIN, B_MAX, B_CNT

    W = H = 512
    R = W * H
    world = rz.scenes.SCENES[args.scene](W, H)
    scene = compile_world(world)
    two = scene.two_level
    box = np.asarray(scene.ti_box if two else scene.cl_box)
    n_real = (scene.ti_rows.shape[0] if two else scene.cl_lw.shape[0])
    cnt = box[B_CNT]
    real = cnt > 0
    cmin = box[B_MIN:B_MIN + 3, real].T
    cmax = box[B_MAX:B_MAX + 3, real].T
    # occupancy boxes: contiguous groups of candidates (what the kernel's
    # clip would use); computed here in NumPy
    k = 1
    while k < 32 and k * 16 < len(cmin):
        k *= 2
    g = -(-len(cmin) // k)
    clip = np.zeros((k, 6), np.float32)
    for j in range(k):
        sl = slice(j * g, min((j + 1) * g, len(cmin)))
        if sl.start >= len(cmin):
            clip[j, :3], clip[j, 3:] = 3e38, -3e38
        else:
            clip[j, :3] = cmin[sl].min(0)
            clip[j, 3:] = cmax[sl].max(0)
    print(f"{args.scene}: candidates={len(cmin)} clip_boxes={k}")

    cam = compile_camera(world.cameras[0])
    pix = cam_ops.pixel_grid(W, H, 0)
    u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
    co, cd = cam_ops.generate_rays(cam, pix, u)

    def tile(x):
        rest = x.shape[1:]
        x = x.reshape(16, 32, 16, 32, *rest)
        return np.asarray(x.transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
                          .reshape(R, *rest))

    co_t, cd_t = tile(co), tile(cd)
    far = np.full(1024, 1e30, np.float32)

    rng = np.random.default_rng(0)
    picks = rng.choice(256, size=args.blocks, replace=False)
    for label, o_all, d_all in (("primary", co_t, cd_t),):
        stats = []
        for b in picks:
            sl = slice(b * 1024, (b + 1) * 1024)
            stats.append(block_stats(box, cmin, cmax, o_all[sl], d_all[sl],
                                     far, clip))
        feas = np.array([s[0] for s in stats])
        gate = np.array([s[1] for s in stats])
        alive = np.array([s[2] for s in stats])
        print(f"  {label}: feasible/block mean {feas.mean():.1f} "
              f"p90 {np.percentile(feas, 90):.0f} max {feas.max()}  |  "
              f"gate-hit/block mean {gate.mean():.1f} "
              f"p90 {np.percentile(gate, 90):.0f}  |  alive {alive.mean():.2f}")

    # synthetic bounce wavefront: origins at primary hit points estimate
    # (just jitter origins into the scene), random cosine directions
    o2 = co_t + cd_t * 2.0
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    stats = []
    for b in picks:
        sl = slice(b * 1024, (b + 1) * 1024)
        stats.append(block_stats(box, cmin, cmax, o2[sl], d2[sl], far, clip))
    feas = np.array([s[0] for s in stats])
    gate = np.array([s[1] for s in stats])
    print(f"  bounce-like: feasible/block mean {feas.mean():.1f} "
          f"p90 {np.percentile(feas, 90):.0f} max {feas.max()}  |  "
          f"gate-hit mean {gate.mean():.1f}")


if __name__ == "__main__":
    main()


def sorted_stats(scene_name="mesh_heavy", blocks=32):
    """Candidate stats for bounce-like rays under different sort keys."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import rayzath_tpu as rz
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.ops import camera as cam_ops
    from rayzath_tpu.ops.traverse_cluster import B_MIN, B_MAX, B_CNT

    W = H = 512
    R = W * H
    world = rz.scenes.SCENES[scene_name](W, H)
    scene = compile_world(world)
    box = np.asarray(scene.ti_box if scene.two_level else scene.cl_box)
    real = box[B_CNT] > 0
    cmin = box[B_MIN:B_MIN + 3, real].T
    cmax = box[B_MAX:B_MAX + 3, real].T
    k = 1
    while k < 32 and k * 16 < len(cmin):
        k *= 2
    g = -(-len(cmin) // k)
    clip = np.zeros((k, 6), np.float32)
    for j in range(k):
        sl = slice(j * g, min((j + 1) * g, len(cmin)))
        clip[j, :3] = cmin[sl].min(0)
        clip[j, 3:] = cmax[sl].max(0)

    cam = compile_camera(world.cameras[0])
    pix = cam_ops.pixel_grid(W, H, 0)
    u = jax.random.uniform(jax.random.key(1), (R, 4), jnp.float32)
    co, cd = cam_ops.generate_rays(cam, pix, u)
    co, cd = np.asarray(co), np.asarray(cd)
    rng = np.random.default_rng(0)
    o2 = co + cd * 2.0
    d2 = rng.normal(size=(R, 3)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    far = np.full(1024, 1e30, np.float32)

    def quant(v, lo, hi, n):
        return np.clip(((v - lo) / np.maximum(hi - lo, 1e-9) * n), 0,
                       n - 1).astype(np.uint32)

    def keys(kind):
        lo, hi = o2.min(0), o2.max(0)
        oct_ = ((d2[:, 0] < 0).astype(np.uint32)
                | ((d2[:, 1] < 0).astype(np.uint32) << 1)
                | ((d2[:, 2] < 0).astype(np.uint32) << 2))
        if kind == "none":
            return None
        if kind == "coarse-oct-dir":
            cm = (quant(o2[:, 0], lo[0], hi[0], 4)
                  | quant(o2[:, 1], lo[1], hi[1], 4) << 2
                  | quant(o2[:, 2], lo[2], hi[2], 4) << 4)
            ad = np.abs(d2)
            mx = ad.max(1)
            dq = quant(ad[:, 0] / mx, 0, 1, 8) << 3 | quant(
                ad[:, 1] / mx, 0, 1, 8)
            fm = (quant(o2[:, 0], lo[0], hi[0], 32)
                  | quant(o2[:, 1], lo[1], hi[1], 32) << 5
                  | quant(o2[:, 2], lo[2], hi[2], 32) << 10)
            return (cm.astype(np.uint64) << 32 | oct_ << 29
                    | dq.astype(np.uint64) << 23 | fm)
        if kind == "morton-major":
            m = (quant(o2[:, 0], lo[0], hi[0], 128)
                 | quant(o2[:, 1], lo[1], hi[1], 128) << 7
                 | quant(o2[:, 2], lo[2], hi[2], 128) << 14)
            return m.astype(np.uint64) << 3 | oct_
        raise ValueError(kind)

    for kind in ("none", "morton-major", "coarse-oct-dir"):
        kk = keys(kind)
        order = np.arange(R) if kk is None else np.argsort(kk, kind="stable")
        oo, dd = o2[order], d2[order]
        picks = rng.choice(R // 1024, size=blocks, replace=False)
        feas, gate = [], []
        for b in picks:
            sl = slice(b * 1024, (b + 1) * 1024)
            f, gh, _ = block_stats(box, cmin, cmax, oo[sl], dd[sl], far, clip)
            feas.append(f)
            gate.append(gh)
        print(f"  {kind:16s}: feasible mean {np.mean(feas):7.1f} "
              f"p90 {np.percentile(feas, 90):5.0f}  gate-hit mean "
              f"{np.mean(gate):6.1f}")
