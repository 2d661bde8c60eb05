"""Device mesh + sharding layout for the render wavefront.

Layout contract: rays are row-major over the image (R = H*W), so sharding the
ray axis into ``n`` contiguous blocks is identical to sharding image rows —
every [R, ...] buffer shards on axis 0 with PartitionSpec('rays') and every
[H, W, ...] buffer shards on axis 0 too. The scene pytree is replicated.
XLA/GSPMD then partitions the whole jitted integrator with no communication
inside a bounce (the wavefront is embarrassingly parallel; only result
gather / gradient psum cross chips).

Requires H % n_devices == 0 (the driver-facing helpers assert this).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.state import RenderState
from ..engine.integrator import _render_steps_impl

RAYS_AXIS = "rays"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis name 'rays'."""
    devs = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devs), (RAYS_AXIS,))


def _state_sharding(mesh: Mesh, state: RenderState):
    """Per-leaf NamedSharding: axis 0 sharded for every buffer, scalar pass
    counter replicated."""
    row = NamedSharding(mesh, P(RAYS_AXIS))
    rep = NamedSharding(mesh, P())

    def leaf(x):
        x = jax.numpy.asarray(x)
        return row if x.ndim >= 1 else rep

    return jax.tree.map(leaf, state)


def shard_state(state: RenderState, mesh: Mesh) -> RenderState:
    """Place a RenderState on the mesh with rays/rows sharded across chips."""
    assert state.height % mesh.devices.size == 0, (
        f"image height {state.height} not divisible by {mesh.devices.size} devices")
    return jax.device_put(state, _state_sharding(mesh, state))


def replicate_scene(tree, mesh: Mesh):
    """Replicate a scene/camera pytree on every chip."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(tree, jax.tree.map(lambda _: rep, tree))


def _state_pspecs(state: RenderState):
    """PartitionSpec pytree matching :func:`_state_sharding`."""
    def leaf(x):
        return P(RAYS_AXIS) if jax.numpy.asarray(x).ndim >= 1 else P()
    return jax.tree.map(leaf, state)


@partial(jax.jit, static_argnames=("cfg", "n_steps", "mesh"),
         donate_argnames=("state",))
def _sharded_impl(scene, cam, cfg, state: RenderState, key, n_steps: int,
                  mesh: Mesh) -> RenderState:
    n = mesh.devices.size
    h_local = state.height // n
    state_spec = _state_pspecs(state)
    rep = jax.tree.map(lambda _: P(), (scene, cam))

    def local(scene, cam, st, key):
        # this shard owns image rows [row0, row0 + h_local); the row-keyed
        # RNG (integrator.pass_uniforms) and the pixel-grid offset make the
        # shard's rays bit-identical to the same rows of an unsharded render
        row0 = jax.lax.axis_index(RAYS_AXIS) * h_local
        st = st.replace(height=h_local)
        out = _render_steps_impl(scene, cam, cfg, st, key, n_steps, row0=row0)
        return out.replace(height=state.height)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(rep[0], rep[1], state_spec, P()),
        out_specs=state_spec, check_vma=False,
    )(scene, cam, state, key)


def sharded_render_steps(scene, cam, cfg, state: RenderState, key, n_steps: int,
                         mesh: Mesh) -> RenderState:
    """Run ``n_steps`` bounce passes with the wavefront sharded over the mesh.

    Inputs are placed (scene replicated, state row-sharded), then the FULL
    integrator — including the Pallas packet / TLAS traversal kernels — runs
    per-device under ``jax.shard_map``: each chip renders its block of image
    rows with the scene replicated, so no collective crosses chips until the
    host fetches the image (or a training step psums gradients). Results are
    bit-identical to a single-device render of the same state (row-keyed RNG
    + pixel-grid row offset). The input state is donated.
    """
    scene = replicate_scene(scene, mesh)
    cam = replicate_scene(cam, mesh)
    state = shard_state(state, mesh)
    return _sharded_impl(scene, cam, cfg, state, key, n_steps, mesh)
