"""Parity: Pallas packet traversal (interpret mode on CPU) vs XLA skip-links.

The packet kernel shares one walk per 1024-ray block but keeps per-ray hit
masks, so closest-hit results must match ops/traverse.py exactly; shadow
transmission must match wherever the alpha early-out (reference
cuda_instance.cuh:110) has not been crossed — beyond it the accumulated rgb
is traversal-order-defined even in the reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world, compile_camera
from rayzath_tpu.engine.integrator import render_steps
from rayzath_tpu.engine.state import init_state
from rayzath_tpu.ops.camera import pixel_grid, generate_rays
from rayzath_tpu.ops.traverse import bvh_closest, bvh_shadow
from rayzath_tpu.ops.traverse_packet import packet_closest, packet_shadow


@pytest.fixture(scope="module")
def scene_and_rays():
    w = rz.scenes.teapot_like(48, 32)
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    r = 48 * 32
    u = jax.random.uniform(jax.random.key(3), (r, 4))
    o, d = generate_rays(cam, pixel_grid(48, 32), u)
    return scene, o, d


def test_packet_closest_matches_xla(scene_and_rays):
    scene, o, d = scene_and_rays
    r = o.shape[0]
    near = jnp.full(r, 1e-4)
    far = jnp.full(r, 1e30)
    t_p, id_p = packet_closest(o, d, near, far, scene.pkt_tab)
    hit = bvh_closest(o, d, near, far, scene.aabb_links, scene.node_begin,
                      scene.node_count, scene.tri_v0, scene.tri_e1,
                      scene.tri_e2)
    assert np.asarray(hit.tri_id).min() >= -1
    assert (np.asarray(id_p) == np.asarray(hit.tri_id)).all()
    both = np.asarray(id_p) >= 0
    assert both.any(), "no hits in test scene"
    np.testing.assert_allclose(np.asarray(t_p)[both],
                               np.asarray(hit.t)[both], rtol=1e-5, atol=1e-6)


def test_packet_shadow_matches_xla(scene_and_rays):
    scene, o, d = scene_and_rays
    r = o.shape[0]
    dist = jnp.full(r, 30.0)
    op_rgb = scene.mat_color[scene.tri_mat][:, :3]
    op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]
    rgb_p, a_p = packet_shadow(o, d, dist, scene.pkt_tab,
                               scene.tri_v0, scene.tri_e1, scene.tri_e2,
                               op_rgb, op_a)
    rgb_x, a_x = bvh_shadow(o, d, dist, scene.aabb_links, scene.node_begin,
                            scene.node_count, scene.tri_v0, scene.tri_e1,
                            scene.tri_e2, op_rgb, op_a)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_x),
                               rtol=1e-5, atol=1e-6)
    live = np.asarray(a_x) >= 1e-4   # below: rgb is order-defined (early-out)
    np.testing.assert_allclose(np.asarray(rgb_p)[live],
                               np.asarray(rgb_x)[live], rtol=1e-5, atol=1e-6)


def test_packet_render_matches_xla_render(scene_and_rays):
    """Whole-renderer equivalence: packet vs XLA traversal, forced BVH path."""
    w = rz.scenes.teapot_like(32, 24)
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    key = jax.random.key(7)
    imgs = []
    for pkt in (True, False):
        cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=4, rpp=2)).with_(
            brute_force_threshold=0, packet_traversal=pkt)
        st = render_steps(scene, cam, cfg, init_state(32, 24), key, 4)
        imgs.append(np.asarray(st.accum))
    np.testing.assert_allclose(imgs[0], imgs[1], rtol=2e-4, atol=2e-5)


def test_packet_shadow_gradients_match_xla():
    """custom_vjp backward replays through XLA: d(mask)/d(opacity) matches."""
    w = rz.scenes.glass_and_fog(16, 16)
    scene = compile_world(w)
    r = 64
    u = jax.random.uniform(jax.random.key(5), (r, 3)) * 2.0 - 1.0
    o = u * 0.5 + jnp.asarray([[0.0, 1.0, -3.0]])
    d = jax.vmap(lambda v: v / jnp.linalg.norm(v))(
        jnp.asarray([[0.1, -0.2, 1.0]]) + 0.2 * u)
    dist = jnp.full(r, 20.0)
    op_rgb = scene.mat_color[scene.tri_mat][:, :3]
    op_a = 1.0 - scene.mat_color[scene.tri_mat][:, 3]
    # restrict the loss to rays that never cross the alpha early-out: beyond
    # it the reference's own accumulated rgb is traversal-order-defined (the
    # light term there is ~0), so gradients are compared where well-defined
    _, a0 = bvh_shadow(o, d, dist, scene.aabb_links, scene.node_begin,
                       scene.node_count, scene.tri_v0, scene.tri_e1,
                       scene.tri_e2, op_rgb, op_a)
    live = jax.lax.stop_gradient((a0 >= 1e-2).astype(jnp.float32))[:, None]
    assert float(live.sum()) > 10

    def loss_pkt(op_rgb, op_a):
        rgb, a = packet_shadow(o, d, dist, scene.pkt_tab,
                               scene.tri_v0, scene.tri_e1, scene.tri_e2,
                               op_rgb, op_a)
        return jnp.sum(rgb * a[:, None] * live)

    def loss_dense(op_rgb, op_a):
        # same frame recomputation the packet bwd uses, so decision-exact
        from rayzath_tpu.ops.intersect import project_shadow
        from rayzath_tpu.ops.traverse_packet import _frames_jnp
        pw, pc = _frames_jnp(scene.tri_v0, scene.tri_e1, scene.tri_e2)
        rgb, a = project_shadow(o, d, dist, pw, pc, op_rgb, op_a,
                                chunk=min(512, scene.tri_v0.shape[0]))
        return jnp.sum(rgb * a[:, None] * live)

    g_p = jax.grad(loss_pkt, argnums=(0, 1))(op_rgb, op_a)
    g_d = jax.grad(loss_dense, argnums=(0, 1))(op_rgb, op_a)
    assert any(float(jnp.abs(g).max()) > 0 for g in g_p), "gradient all-zero"
    for a, b in zip(g_p, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tile_untile_roundtrip():
    """_untile(_tile(x)) identity for every rank the dispatcher tiles."""
    from rayzath_tpu.engine.integrator import _tile, _untile, TILE
    hw = (2 * TILE, 3 * TILE)
    r = hw[0] * hw[1]
    key = jax.random.key(11)
    for shape in ((r,), (r, 3), (r, 2)):
        x = jax.random.normal(key, shape)
        y = _untile(_tile(x, hw), hw)
        assert (np.asarray(x) == np.asarray(y)).all()
        # tiling is a permutation: same multiset of values
        assert np.allclose(np.sort(np.asarray(x).ravel()),
                           np.sort(np.asarray(_tile(x, hw)).ravel()))


def test_tiled_dispatch_matches_untiled():
    """closest_hit / shadow_test give identical results with and without the
    image-tile permutation (hw=None disables tiling)."""
    from rayzath_tpu.engine.integrator import closest_hit, shadow_test, TILE
    w = rz.scenes.teapot_like(2 * TILE, TILE)
    scene = compile_world(w)
    cam = compile_camera(w.cameras[0])
    hw = (TILE, 2 * TILE)  # (H, W)
    r = hw[0] * hw[1]
    u = jax.random.uniform(jax.random.key(13), (r, 4))
    o, d = generate_rays(cam, pixel_grid(hw[1], hw[0]), u)
    cfg = rz.RenderConfig().with_(brute_force_threshold=0)
    near = jnp.full(r, 1e-4)
    far = jnp.full(r, 1e30)
    a = closest_hit(scene, cfg, o, d, near, far, hw=hw)
    b = closest_hit(scene, cfg, o, d, near, far, hw=None)
    for x, y in zip(a, b):
        assert (np.asarray(x) == np.asarray(y)).all()
    dist = jnp.full(r, 25.0)
    sa = shadow_test(scene, cfg, o, d, dist, hw=hw)
    sb = shadow_test(scene, cfg, o, d, dist, hw=None)
    for x, y in zip(sa, sb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
