import numpy as np
import pytest

from rayzath_tpu.models import (World, Material, MATERIAL_PRESETS, Mesh)
from rayzath_tpu.models.mesh import (
    generate_cube, generate_plane, generate_uv_sphere, generate_icosphere,
    generate_cone, generate_cylinder, generate_torus)
from rayzath_tpu.utils.hostmath import Transform, look_at_rotation, rotation_look_at


def tri_area_sum(mesh):
    v0 = mesh.vertices[mesh.tri_v[:, 0]]
    v1 = mesh.vertices[mesh.tri_v[:, 1]]
    v2 = mesh.vertices[mesh.tri_v[:, 2]]
    return 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()


def test_cube():
    m = generate_cube()
    assert m.vertices.shape == (8, 3)
    assert m.triangle_count == 12
    assert np.isclose(tri_area_sum(m), 6.0, atol=1e-5)  # unit cube surface
    n = m.flat_normals()
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)


def test_plane():
    m = generate_plane(sides=4, width=2.0, height=3.0)
    assert m.triangle_count == 2
    assert np.allclose(m.vertices[:, 1], 0.0)


@pytest.mark.parametrize("gen,kwargs", [
    (generate_uv_sphere, dict(resolution=16)),
    (generate_icosphere, dict(subdivisions=2)),
])
def test_spheres_on_unit_sphere(gen, kwargs):
    m = gen(**kwargs)
    r = np.linalg.norm(m.vertices, axis=1)
    assert np.allclose(r, 1.0, atol=1e-5)
    assert m.triangle_count > 50
    # watertight-ish: every edge appears exactly twice
    edges = {}
    for tri in m.tri_v:
        for a, b in ((tri[0], tri[1]), (tri[1], tri[2]), (tri[2], tri[0])):
            key = (min(a, b), max(a, b))
            edges[key] = edges.get(key, 0) + 1
    assert set(edges.values()) == {2}


def test_cone_cylinder_torus():
    assert generate_cone(16).triangle_count == 16 + 14
    assert generate_cylinder(16).triangle_count == 2 * 16 + 2 * 14
    t = generate_torus(major_resolution=8, minor_resolution=6)
    assert t.triangle_count == 2 * 8 * 6


def test_material_presets():
    for p in MATERIAL_PRESETS:
        m = Material.preset(p)
        assert m.color.shape == (4,)
    glass = Material.preset("glass")
    assert glass.color[3] == 0.0 and glass.ior == 1.45


def test_world_containers():
    w = World()
    v0 = w.version
    mat = w.generate_material("gold")
    mesh = w.generate_mesh("cube")
    inst = w.create_instance(mesh=mesh, materials=[mat])
    assert w.version > v0
    assert w.materials.find("generated_gold") is mat
    assert w.triangle_count() == 12
    assert w.instances.destroy(inst)
    assert w.triangle_count() == 0
    # world material is a transparent white medium (reference world.cpp:33-38)
    assert w.material.color[3] == 0.0


def test_transform_compose_and_lookat():
    t1 = Transform(position=(1, 0, 0), rotation=(0, np.pi / 2, 0))
    t2 = Transform(position=(0, 1, 0))
    c = t1.compose_with(t2)
    assert np.allclose(c.position, [1, 1, 0], atol=1e-6)
    # look-at: camera z-axis points at target
    rot = look_at_rotation((0, 0, 0), (3, 4, 5))
    M = rotation_look_at(rot)
    z = M[:, 2]
    d = np.array([3, 4, 5]) / np.linalg.norm([3, 4, 5])
    assert np.allclose(z, d, atol=1e-5)


def test_group_chain():
    w = World()
    mesh = w.generate_mesh("cube")
    g_outer = w.create_group(transform=Transform(position=(10, 0, 0)))
    g_inner = w.create_group(transform=Transform(position=(0, 5, 0)))
    g_outer.add_group(g_inner)
    inst = w.create_instance(mesh=mesh, transform=Transform(position=(0, 0, 1)))
    g_inner.add_instance(inst)
    eff = inst.effective_transform()
    assert np.allclose(eff.position, [10, 5, 1], atol=1e-6)
    lo, hi = inst.bounding_box()
    assert np.allclose((lo + hi) / 2, [10, 5, 1], atol=1e-5)
