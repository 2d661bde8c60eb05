"""Destroy/reference semantics (reference Owner/Handle/Observer notification,
roho.hpp:18-502): destroying an object detaches every live reference to it,
and a dangling reference that still reaches compile_world is reported and
substituted with the default material instead of rendering stale data."""
import warnings

import numpy as np
import pytest

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import (compile_world,
                                             DEFAULT_MATERIAL_ID)


def _world():
    w = rz.World()
    m = w.create_material("red", color=(1.0, 0.1, 0.1, 1.0))
    mesh = w.generate_mesh("cube")
    inst = w.create_instance(name="box", mesh=mesh, materials=[m])
    w.create_camera(resolution=(16, 16))
    return w, m, mesh, inst


def test_destroy_material_detaches_instance_slots():
    w, m, mesh, inst = _world()
    assert inst.materials[0] is m
    assert w.materials.destroy(m)
    assert inst.materials[0] is None
    scene = compile_world(w)
    # the slot now resolves to the default material, silently and by design
    tri_mat = np.asarray(scene.tri_mat)[:mesh.triangle_count]
    assert (tri_mat == DEFAULT_MATERIAL_ID).all()


def test_destroy_mesh_detaches_instances():
    w, m, mesh, inst = _world()
    assert w.meshes.destroy(mesh)
    assert inst.mesh is None
    scene = compile_world(w)          # instance without a mesh is skipped
    assert scene.n_triangles == 0


def test_destroy_map_detaches_materials():
    w, m, mesh, inst = _world()
    tex = rz.Texture(name="t", data=np.zeros((4, 4, 4), np.float32))
    w.textures.create(tex)
    m.texture = tex
    assert w.textures.destroy(tex)
    assert m.texture is None


def test_dangling_material_warns_and_substitutes_default():
    w, m, mesh, inst = _world()
    # bypass destroy(): simulate a reference the world never knew about
    rogue = rz.Material(name="rogue")
    inst.materials[0] = rogue
    w.touch()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        scene = compile_world(w)
    assert any("rogue" in str(r.message) for r in rec)
    tri_mat = np.asarray(scene.tri_mat)[:mesh.triangle_count]
    assert (tri_mat == DEFAULT_MATERIAL_ID).all()


def test_destroy_group_unlinks_children_and_instances():
    w, m, mesh, inst = _world()
    g = w.create_group()
    sub = w.create_group()
    g.add_group(sub)
    g.add_instance(inst) if hasattr(g, "add_instance") else g.instances.append(inst)
    inst.group = g
    assert w.groups.destroy(g)
    assert inst.group is None
    assert sub.parent is None
