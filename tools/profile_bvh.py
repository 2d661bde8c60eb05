"""Break down per-bounce cost on a mesh-heavy scene (teapot_like 512^2):
packet closest, packet shadow, full bounce_step, coherent vs incoherent rays."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp
import numpy as np
import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.engine.state import init_state
from rayzath_tpu.engine.integrator import render_steps
from rayzath_tpu.ops.traverse_packet import packet_closest, packet_shadow

W = H = 512
R = W * H
world = rz.scenes.teapot_like(W, H)
cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=8, rpp=8))
scene = compile_world(world)
cam = compile_camera(world.cameras[0])
print("triangles:", scene.n_triangles, "nodes:", scene.node_begin.shape[0])
key = jax.random.key(0)

def timeit(f, *a, n=5):
    out = f(*a); jax.tree.map(lambda x: np.asarray(x) if hasattr(x, 'shape') else x, out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    r = jax.tree.leaves(out)[0]; np.asarray(r[:1])
    return (time.perf_counter() - t0) / n

# coherent primary rays
from rayzath_tpu.ops import camera as cam_ops
pix = cam_ops.pixel_grid(W, H)
u = jax.random.uniform(key, (R, 8))
o_c, d_c = cam_ops.generate_rays(cam, pix, u[:, 4:8])
near = jnp.full(R, 1e-3); far = jnp.full(R, 1e9)

# incoherent rays: random origins in bbox, random directions
k1, k2 = jax.random.split(key)
o_i = jax.random.uniform(k1, (R, 3), minval=-2.0, maxval=2.0)
d_i = o_i - jax.random.uniform(k2, (R, 3), minval=-2.0, maxval=2.0)
d_i = d_i / jnp.linalg.norm(d_i, axis=1, keepdims=True)

cl = jax.jit(lambda o, d: packet_closest(o, d, near, far, scene.pkt_tab))
t_coh = timeit(cl, o_c, d_c)
t_inc = timeit(cl, o_i, d_i)
print(f"packet_closest coherent:   {t_coh*1e3:8.2f} ms  ({R/t_coh/1e6:6.1f} Mray/s)")
print(f"packet_closest incoherent: {t_inc*1e3:8.2f} ms  ({R/t_inc/1e6:6.1f} Mray/s)")

op_rgb = scene.mat_color[scene.tri_mat][:, :3]
op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]
sh = jax.jit(lambda o, d: packet_shadow(o, d, far, scene.pkt_tab,
                                        scene.tri_v0, scene.tri_e1, scene.tri_e2,
                                        op_rgb, op_a))
t_sh = timeit(sh, o_c, d_c)
t_shi = timeit(sh, o_i, d_i)
print(f"packet_shadow coherent:    {t_sh*1e3:8.2f} ms  ({R/t_sh/1e6:6.1f} Mray/s)")
print(f"packet_shadow incoherent:  {t_shi*1e3:8.2f} ms  ({R/t_shi/1e6:6.1f} Mray/s)")

# full bounce: steady-state (mixed coherence)
state = init_state(W, H)
state = render_steps(scene, cam, cfg, state, key, 16)  # warm into incoherence
np.asarray(state.accum[0, 0])
def steps8(st):
    return render_steps(scene, cam, cfg, st, key, 8)
t_full = timeit(steps8, state, n=3) / 8
print(f"full bounce_step (steady): {t_full*1e3:8.2f} ms  ({R/t_full/1e6:6.1f} Mray/s)")
