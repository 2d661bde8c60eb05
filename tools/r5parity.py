"""On-chip brute-force parity sweep for the cluster kernels.

The round-4 lesson: Mosaic kernels can be silently wrong ON THE CHIP while
interpret mode is clean, so every kernel change re-runs this sweep on real
hardware. Compares cluster_closest / cluster_shadow against the dense XLA
brute force (HIGHEST precision) on random soups with (a) bulk random rays,
(b) adversarial rays aimed exactly at triangle edges/vertices from distant
origins — the configurations that exposed the MXU bf16 rounding bug.

Emits one JSON line per check; "hit_mismatch" must be 0.
"""
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def emit(**kw):
    print(json.dumps(kw), flush=True)


def soup(n, seed, spread=4.0, size=0.35):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    e1 = rng.uniform(-size, size, (n, 3)).astype(np.float32)
    e2 = rng.uniform(-size, size, (n, 3)).astype(np.float32)
    return v0, e1, e2


def adversarial_rays(v0, e1, e2, n_rays, seed, far_origin=False):
    """Rays through points NEAR triangle boundaries: signed barycentric
    offsets of +-1e-3 / +-1e-4 from an edge, hypotenuse, or vertex, so the
    true hit/miss decision is unambiguous for f32-exact math but flips under
    errors at the offset scale. ``far_origin`` places origins 200 units out,
    stressing the cluster-local bf16 limb decomposition."""
    rng = np.random.default_rng(seed)
    n = len(v0)
    ti = rng.integers(0, n, n_rays)
    mode = rng.integers(0, 4, n_rays)
    delta = rng.choice(np.float64([1e-3, -1e-3, 1e-4, -1e-4]), n_rays)
    u = rng.uniform(0.05, 0.9, n_rays)
    b1 = np.where(mode == 0, delta,
                  np.where(mode == 1, u,
                           np.where(mode == 2, u * 0.5, delta)))
    b2 = np.where(mode == 0, u,
                  np.where(mode == 1, delta,
                           np.where(mode == 2, 1.0 - delta - u * 0.5, delta)))
    target = (v0[ti].astype(np.float64) + b1[:, None] * e1[ti]
              + b2[:, None] * e2[ti])
    dist = 200.0 if far_origin else 6.0
    o = target + dist * _unit(rng, n_rays)
    d = _unit_to((target - o).astype(np.float32))
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d)


def _unit(rng, n):
    v = rng.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _unit_to(v):
    return (v / np.linalg.norm(v, axis=1, keepdims=True)).astype(np.float32)


def check(tag, n_tri, seed, rays):
    from rayzath_tpu.ops.intersect import (brute_force_closest,
                                           brute_force_shadow)
    from rayzath_tpu.ops.traverse_cluster import (build_cluster_tables,
                                                  cluster_closest,
                                                  cluster_shadow)
    v0, e1, e2 = soup(n_tri, seed)
    box, frames, order, base, count = build_cluster_tables(v0, e1, e2)
    if rays == "bulk":
        rng = np.random.default_rng(seed + 1)
        r = 65536
        o = jnp.asarray(rng.uniform(-6, 6, (r, 3)).astype(np.float32))
        d = jnp.asarray(_unit(rng, r))
    elif rays == "edges":
        o, d = adversarial_rays(v0, e1, e2, 65536, seed + 2)
    else:
        o, d = adversarial_rays(v0, e1, e2, 65536, seed + 3, far_origin=True)
    r = o.shape[0]
    near = jnp.zeros(r)
    far = jnp.full(r, 1e30)
    t, tid = cluster_closest(o, d, near, far, jnp.asarray(box),
                             jnp.asarray(frames), jnp.asarray(order))
    t_ref, tid_ref, _, _, _ = brute_force_closest(
        o, d, near, far, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        chunk=min(512, n_tri))
    hit = np.asarray(tid) >= 0
    hit_ref = np.asarray(tid_ref) >= 0
    mism = int((hit != hit_ref).sum())
    both = hit & hit_ref
    dt = np.abs(np.asarray(t)[both] - np.asarray(t_ref)[both])
    rel = dt / np.maximum(np.asarray(t_ref)[both], 1e-6)
    idm = int((np.asarray(tid)[both] != np.asarray(tid_ref)[both]).sum())
    emit(check=f"closest_{tag}_{rays}", rays=r, hits=int(hit_ref.sum()),
         hit_mismatch=mism, id_mismatch=idm,
         t_rel_max=float(rel.max()) if both.any() else 0.0)

    rng = np.random.default_rng(seed + 9)
    op_rgb = jnp.asarray(rng.uniform(0.3, 1.0, (n_tri, 3)).astype(np.float32))
    op_a = jnp.asarray(rng.uniform(0.4, 1.0, n_tri).astype(np.float32))
    dist = jnp.full(r, 12.0)
    rgb, a = cluster_shadow(o, d, dist, jnp.asarray(box), jnp.asarray(frames),
                            jnp.asarray(order), jnp.asarray(base),
                            jnp.asarray(count), jnp.asarray(v0),
                            jnp.asarray(e1), jnp.asarray(e2), op_rgb, op_a)
    rgb_ref, a_ref = brute_force_shadow(
        o, d, dist, jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2),
        op_rgb, op_a, chunk=min(512, n_tri))
    live = np.asarray(a_ref) >= 1e-3
    bad_a = int((~np.isclose(np.asarray(a)[live], np.asarray(a_ref)[live],
                             rtol=2e-4, atol=2e-5)).sum())
    emit(check=f"shadow_{tag}_{rays}", rays=r, shadow_mismatch=bad_a)


def main():
    import rayzath_tpu.ops.traverse_cluster as tc
    emit(parity_variant=tc.DOT_MODE, device=str(jax.devices()[0]))
    for n_tri, seed, tag in ((700, 0, "s700"), (9000, 5, "s9000")):
        for rays in ("bulk", "edges", "edges_far"):
            check(tag, n_tri, seed, rays)


if __name__ == "__main__":
    main()
