"""Count traversal steps per block: tiled vs untiled coherent rays."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.ops import camera as cam_ops
from rayzath_tpu.ops.traverse_packet import (
    _closest_kernel, _vec_to_blocks, _specs, _interpret, BLOCK)
from rayzath_tpu.engine.integrator import _tile

W = H = 512
R = W * H
world = rz.scenes.teapot_like(W, H)
scene = compile_world(world)
cam = compile_camera(world.cameras[0])
n_nodes = scene.pkt_tab.shape[0]
print("nodes:", n_nodes)

pix = cam_ops.pixel_grid(W, H)
u = jax.random.uniform(jax.random.key(0), (R, 8))
o_c, d_c = cam_ops.generate_rays(cam, pix, u[:, 4:8])
near = jnp.full(R, 1e-3); far = jnp.full(R, 1e9)


def steps(origin, direction, near, far, pkt_tab):
    rp = ((R + BLOCK - 1) // BLOCK) * BLOCK
    nb = rp // BLOCK
    o_b = _vec_to_blocks(origin, rp)
    d_b = _vec_to_blocks(direction, rp)
    nf = jnp.stack([jnp.pad(near, (0, rp - R)),
                    jnp.pad(far, (0, rp - R), constant_values=-1.0)], axis=0)
    nf_b = nf.reshape(2, nb, 8, 128).transpose(1, 0, 2, 3)
    max_steps = 4 * n_nodes + 8
    tab_spec, ray_spec, nf_spec, out_spec = _specs(nb, pkt_tab.shape)
    import rayzath_tpu.ops.traverse_packet as tp

    def kern(tab_ref, o_ref, d_ref, nf_ref, t_ref, id_ref, it_ref):
        # replicate the closest kernel but record the step count
        ox, oy, oz, dx, dy, dz, ix, iy, iz = tp._ray_regs(o_ref.at[0], d_ref.at[0])
        nearr, farr = nf_ref[0, 0], nf_ref[0, 1]
        oct_ = tp._block_octant(dx, dy, dz)

        def body(state):
            it, node, best_t, best_id, n_leaf = state
            row = tab_ref[pl.ds(node, 1), :]
            tmin, tmax = tp._slab(row, ox, oy, oz, ix, iy, iz)
            hit = ((tmax >= nearr) & (tmin <= tmax)
                   & (tmin <= jnp.minimum(farr, best_t)))
            any_hit = jnp.any(hit)
            first, skip = tp._links(row, oct_)
            is_leaf = first < 0.0

            def leaf_fn(args):
                best_t, best_id = args
                for k in range(tp.LEAF):
                    tid = row[0, tp.L_AUX + k]
                    t, bary_ok = tp._mt_scalar_tri(row, k, ox, oy, oz, dx, dy, dz)
                    valid = (hit & bary_ok & (tid >= 0.0)
                             & (t > nearr) & (t < best_t))
                    best_t = jnp.where(valid, t, best_t)
                    best_id = jnp.where(valid, tid, best_id)
                return best_t, best_id

            do_leaf = jnp.logical_and(is_leaf, any_hit)
            best_t, best_id = jax.lax.cond(do_leaf, leaf_fn, lambda a: a,
                                           (best_t, best_id))
            nxt = jnp.where(jnp.logical_and(any_hit, jnp.logical_not(is_leaf)),
                            first, skip).astype(jnp.int32)
            return it + 1, nxt, best_t, best_id, n_leaf + do_leaf.astype(jnp.int32)

        def cond(state):
            it, node, *_ = state
            return jnp.logical_and(node < n_nodes, it < max_steps)

        it, _, best_t, best_id, n_leaf = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0),
             jnp.minimum(farr, tp.BIG), jnp.full((8, 128), -1.0, jnp.float32),
             jnp.int32(0)))
        t_ref[0] = best_t
        id_ref[0] = best_id
        row_i = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        it_ref[0] = jnp.where(row_i == 1, n_leaf, it)

    t, tid, its = pl.pallas_call(
        kern,
        grid=(nb,),
        out_shape=(jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nb, 8, 128), jnp.int32)),
        in_specs=[tab_spec, ray_spec, ray_spec, nf_spec],
        out_specs=(out_spec, out_spec, pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0))),
        interpret=_interpret(),
    )(pkt_tab, o_b, d_b, nf_b)
    return its


its = steps(o_c, d_c, near, far, scene.pkt_tab)
s = np.asarray(its[:, 0, 0]); lf = np.asarray(its[:, 1, 0])
print(f"untiled: steps mean {s.mean():.0f} max {s.max()} | leaf steps mean {lf.mean():.0f}")

o_t, d_t = _tile(o_c, (H, W)), _tile(d_c, (H, W))
its = steps(o_t, d_t, near, far, scene.pkt_tab)
s = np.asarray(its[:, 0, 0]); lf = np.asarray(its[:, 1, 0])
print(f"tiled:   steps mean {s.mean():.0f} max {s.max()} | leaf steps mean {lf.mean():.0f}")
