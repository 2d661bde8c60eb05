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

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.state import RenderState
from ..engine.integrator import render_steps

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


def sharded_render_steps(scene, cam, cfg, state: RenderState, key, n_steps: int,
                         mesh: Mesh) -> RenderState:
    """Run ``n_steps`` bounce passes with the wavefront sharded over the mesh.

    Inputs are placed (scene replicated, state row-sharded) and the existing
    jitted integrator runs under GSPMD — XLA partitions every per-ray op and
    keeps the accumulation image sharded by rows; no collective is needed
    until the host fetches the image.
    """
    scene = replicate_scene(scene, mesh)
    cam = replicate_scene(cam, mesh)
    state = shard_state(state, mesh)
    # pallas_call does not auto-partition under GSPMD; the XLA traversal does
    cfg = cfg.with_(packet_traversal=False)
    return render_steps(scene, cam, cfg, state, key, n_steps)
