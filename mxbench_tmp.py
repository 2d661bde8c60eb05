import time, numpy as np, jax, jax.numpy as jnp, rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.ops.traverse_mxleaf import mx_closest
from rayzath_tpu.ops import camera as cam_ops

t0=time.perf_counter()
world = rz.scenes.mesh_heavy(512, 512)
scene = compile_world(world)
print(f"compile_world {time.perf_counter()-t0:.1f}s", flush=True)
cam = compile_camera(world.cameras[0])
R = 512*512
pix = cam_ops.pixel_grid(512, 512)
u = jax.random.uniform(jax.random.key(1), (R,4))
o, d = cam_ops.generate_rays(cam, pix, u)
near = jnp.zeros(R); far = jnp.full(R, 3.4e38)
f = jax.jit(lambda o,d: mx_closest(o,d,near,far,scene.mx_tab,scene.mx_lw,scene.mx_order))
t0=time.perf_counter()
t,tid = f(o,d); np.asarray(t[0])
print(f"first call (compile+run) {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(3): t,tid = f(o,d)
np.asarray(t[0]); dt=(time.perf_counter()-t0)/3
print(f"mx_closest primary : {dt*1e3:6.1f} ms  ({R/dt/1e6:6.2f} Mray/s), hit frac {float((np.asarray(tid)>=0).mean()):.2f}", flush=True)
ko = jax.random.uniform(jax.random.key(2), (R,3))*4-2
kd = jax.random.normal(jax.random.key(3), (R,3)); kd/= jnp.linalg.norm(kd,axis=1,keepdims=True)
t0=time.perf_counter()
t,tid = f(ko,kd); np.asarray(t[0])
dt=time.perf_counter()-t0
print(f"mx_closest random  : {dt*1e3:6.1f} ms  ({R/dt/1e6:6.2f} Mray/s)", flush=True)
