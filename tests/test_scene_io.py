"""Scene IO tests: JSON schema load/save round-trip, OBJ/MTL round-trip.

The JSON fixture exercises the reference schema constructs
(json_loader.cpp): generate statements, inline mesh arrays, name references,
color-as-int vs color-as-float, world Material/DefaultMaterial overrides,
groups with nesting + circular detection.
"""
import json
import os

import numpy as np
import pytest

from rayzath_tpu.models.world import World
from rayzath_tpu.io.obj import (parse_obj, load_mtl, save_obj, save_mtl,
                                load_instances)

SCENE = {
    "Objects": {
        "Material": [
            {"name": "red", "color": [255, 10, 10], "roughness": 0.5},
            {"name": "glassy", "generate glass": {}, "emission": 2.0},
        ],
        "Mesh": [
            {"name": "box", "generate cube": {}},
            {"name": "tri",
             "vertices": [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
             "texcrds": [[0, 0], [1, 0], [0, 1]],
             "triangles": [{"v": [0, 1, 2], "t": [0, 1, 2], "m": 0}]},
        ],
        "Camera": {
            "name": "cam", "position": [0, 1, -5], "resolution": [64, 48],
            "fov": 1.2, "near plane": 0.1, "far plane": 500.0,
            "focal distance": 5.0, "aperture": 0.01, "exposure time": 0.5,
            "enabled": True,
        },
        "SpotLight": {"name": "lamp", "position": [0, 3, 0],
                      "direction": [0, -1, 0], "color": [1.0, 0.5, 0.25],
                      "size": 0.3, "emission": 50.0, "angle": 0.8},
        "DirectLight": {"name": "sun", "direction": [0, -1, 1],
                        "emission": 5.0, "size": 0.05},
        "Instance": [
            {"name": "box1", "Mesh": "box", "Material": ["red"],
             "position": [1, 0, 0], "rotation": [0, 0.5, 0],
             "scale": [2, 1, 1]},
            {"name": "tri1", "Mesh": "tri", "Material": "glassy"},
        ],
        "Group": [
            {"name": "inner", "position": [0, 1, 0], "objects": ["box1"]},
            {"name": "outer", "groups": ["inner"]},
        ],
    },
    "Material": {"color": [0.2, 0.3, 0.4, 0.0], "emission": 1.5},
    "DefaultMaterial": {"generate paper": {}},
}


@pytest.fixture
def scene_path(tmp_path):
    p = tmp_path / "scene.json"
    p.write_text(json.dumps(SCENE))
    return str(p)


def test_json_load(scene_path):
    w = World()
    result = w.load_scene(scene_path)
    assert result.ok, str(result)
    assert len(w.materials) == 2
    red = w.materials.find("red")
    assert np.allclose(red.color, [1.0, 10 / 255, 10 / 255, 1.0])
    assert red.roughness == 0.5
    glassy = w.materials.find("glassy")
    assert glassy.ior == pytest.approx(1.45)   # generate glass preset
    assert glassy.emission == 2.0              # override after generate

    assert len(w.meshes) == 2
    box = w.meshes.find("box")
    assert box.triangle_count == 12
    tri = w.meshes.find("tri")
    assert tri.triangle_count == 1 and len(tri.vertices) == 3

    cam = w.cameras.find("cam")
    assert cam.resolution == (64, 48)
    assert cam.near_far[0] == pytest.approx(0.1)
    assert cam.near_far[1] == pytest.approx(500.0)
    assert cam.exposure_time == 0.5

    lamp = w.spot_lights.find("lamp")
    assert lamp.emission == 50.0 and lamp.beam_angle == pytest.approx(0.8)
    sun = w.direct_lights.find("sun")
    assert sun.angular_size == pytest.approx(0.05)

    box1 = w.instances.find("box1")
    assert box1.mesh is box
    assert box1.materials[0] is red
    assert np.allclose(box1.transform.scale, [2, 1, 1])

    inner = w.groups.find("inner")
    outer = w.groups.find("outer")
    assert box1.group is inner
    assert inner.parent is outer
    # group transform flattens into the instance's effective transform
    et = box1.effective_transform()
    assert np.allclose(et.points_l2g(np.zeros((1, 3)))[0], [1, 1, 0], atol=1e-5)

    assert w.material.emission == 1.5
    assert np.allclose(w.material.color, [0.2, 0.3, 0.4, 0.0])
    assert w.default_material.ior == 1.0  # paper preset


def test_json_roundtrip(scene_path, tmp_path):
    w = World()
    w.load_scene(scene_path)
    out = str(tmp_path / "resaved" / "scene.json")
    w.save_scene(out)

    w2 = World()
    result = w2.load_scene(out)
    assert result.ok, str(result)
    assert len(w2.materials) == len(w.materials)
    assert len(w2.meshes) == len(w.meshes)
    assert len(w2.instances) == len(w.instances)
    assert len(w2.groups) == len(w.groups)
    box2 = w2.meshes.find("box")
    assert box2.triangle_count == 12
    b1 = w.instances.find("box1").effective_transform()
    b2 = w2.instances.find("box1").effective_transform()
    pts = np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32)
    assert np.allclose(b1.points_l2g(pts), b2.points_l2g(pts), atol=1e-5)


def test_circular_group_detection(tmp_path):
    scene = {"Objects": {"Group": [
        {"name": "a", "groups": ["b"]},
        {"name": "b", "groups": ["a"]},
    ]}}
    p = tmp_path / "circ.json"
    p.write_text(json.dumps(scene))
    w = World()
    result = w.load_scene(str(p))
    assert any("Circular" in e for e in result.errors)


OBJ_TEXT = """
mtllib test.mtl
o quad
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 -1
usemtl matA
f 1/1/1 2/2/1 3/3/1 4/4/1
o tri_neg
v 2 0 0
v 3 0 0
v 2 1 0
usemtl matB
f -3 -2 -1
"""

MTL_TEXT = """
newmtl matA
Kd 0.5 0.25 0.125
Ns 1000
d 0.75
Ni 1.5
Ke 2.0
newmtl matB
Kd 0.8
Pm 0.9
Pr 0.2
Tr 0.25
"""


@pytest.fixture
def obj_path(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ_TEXT)
    (tmp_path / "test.mtl").write_text(MTL_TEXT)
    return str(tmp_path / "test.obj")


def test_obj_parse(obj_path):
    meshes, mtllibs = parse_obj(obj_path)
    assert mtllibs == ["test.mtl"]
    assert len(meshes) == 2
    quad = meshes[0].mesh
    assert quad.name == "quad"
    assert len(quad.vertices) == 4
    assert quad.triangle_count == 2  # quad fan-triangulated
    # z negated: v 0 0 0 stays, normals too
    assert np.allclose(quad.normals[0], [0, 0, 1])
    # reference fan winding: (0, i+2, i+1)
    assert quad.tri_v[0].tolist() == [0, 2, 1]
    assert quad.tri_v[1].tolist() == [0, 3, 2]
    tri = meshes[1].mesh
    assert tri.name == "tri_neg"
    assert tri.triangle_count == 1
    # negative (relative) indices resolve + re-base to this mesh's pool
    assert sorted(tri.tri_v[0].tolist()) == [0, 1, 2]
    assert meshes[0].material_slots == {"matA": 0}
    assert meshes[1].material_slots == {"matB": 0}


def test_mtl_parse(tmp_path):
    p = tmp_path / "m.mtl"
    p.write_text(MTL_TEXT)
    mats = load_mtl(str(p))
    a = mats[0]
    assert np.allclose(a.color[:3], [0.5, 0.25, 0.125])
    assert a.color[3] == pytest.approx(0.75)     # d
    assert a.roughness == pytest.approx(0.0)     # Ns 1000 -> roughness 0
    assert a.ior == 1.5
    assert a.emission == 2.0
    b = mats[1]
    assert np.allclose(b.color[:3], 0.8)         # single-value Kd broadcast
    assert b.metalness == pytest.approx(0.9)
    assert b.roughness == pytest.approx(0.2)
    assert b.color[3] == pytest.approx(0.75)     # Tr 0.25 -> alpha 0.75


def test_obj_instances_and_roundtrip(obj_path, tmp_path):
    w = World()
    instances = load_instances(obj_path, w)
    assert len(instances) == 2
    assert instances[0].materials[0].name == "matA"
    assert instances[1].materials[0].name == "matB"

    # round-trip: save + reload preserves geometry
    out_obj = str(tmp_path / "out" / "resave.obj")
    save_mtl(str(tmp_path / "out" / "resave.mtl"),
             [m for m in w.materials], save_maps=False)
    save_obj(out_obj, [m for m in w.meshes], mtl_name="resave.mtl")
    meshes2, _ = parse_obj(out_obj)
    assert len(meshes2) == 2
    q1, q2 = w.meshes[0], meshes2[0].mesh
    assert np.allclose(q1.vertices, q2.vertices, atol=1e-5)
    assert np.array_equal(q1.tri_v, q2.tri_v)


def test_save_options_selective_and_dedup(tmp_path):
    """SaveOptions (reference saver.hpp:104-111): selective group save,
    content-hash map dedup (no rewrite), rollback on failure."""
    import os
    import numpy as np
    import rayzath_tpu as rz
    from rayzath_tpu.io.loader import SaveOptions, save_scene

    w = rz.scenes.textured_room(32, 24)
    out = str(tmp_path / "scene.json")

    # selective: lights only
    save_scene(w, out, SaveOptions(only=frozenset({"lights"})))
    import json
    doc = json.load(open(out))
    assert "SpotLight" in doc["Objects"] or "DirectLight" in doc["Objects"]
    assert "Mesh" not in doc["Objects"]
    assert "Instance" not in doc["Objects"]

    # full save twice: hash-named map files are written once, not rewritten
    save_scene(w, out)
    maps_dir = tmp_path / "maps"
    files = sorted(os.listdir(maps_dir))
    mtimes = {f: os.path.getmtime(maps_dir / f) for f in files}
    import time
    time.sleep(0.05)
    save_scene(w, out)
    assert sorted(os.listdir(maps_dir)) == files
    for f in files:
        assert os.path.getmtime(maps_dir / f) == mtimes[f], f"{f} rewritten"

    # duplicate_textures=True restores per-slot naming (distinct files)
    save_scene(w, out, SaveOptions(duplicate_textures=True))
    assert any("_0_" in f for f in os.listdir(maps_dir))


def test_save_options_rollback_on_failure(tmp_path, monkeypatch):
    import rayzath_tpu as rz
    from rayzath_tpu.io.loader import SaveOptions
    from rayzath_tpu.io.json_scene import JsonSaver

    w = rz.scenes.textured_room(32, 24)
    out = str(tmp_path / "x" / "scene.json")
    saver = JsonSaver(w, out)

    calls = {"n": 0}
    orig = JsonSaver._write_map_file

    def failing(self, kind, i, m, options):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise OSError("disk full")
        return orig(self, kind, i, m, options)

    monkeypatch.setattr(JsonSaver, "_write_map_file", failing)
    try:
        saver.save(SaveOptions(allow_partial_write=False))
        assert False, "should have raised"
    except OSError:
        pass
    import os
    maps = tmp_path / "x" / "maps"
    assert not maps.exists() or os.listdir(maps) == []


def test_cross_load_dedup_reuses_maps(tmp_path):
    """Loading two scenes that reference the same map file into one world
    must reuse the loaded map object (reference LoadedSet,
    loader.hpp:16-134)."""
    import json
    import numpy as np
    import rayzath_tpu as rz
    from rayzath_tpu.io.bitmap import save_image

    img = np.random.default_rng(0).random((8, 8, 4)).astype(np.float32)
    save_image(str(tmp_path / "shared.png"), img)
    scene = {"Objects": {"Texture": [
        {"name": "tex", "file": "shared.png"}]}}
    for name in ("a.json", "b.json"):
        (tmp_path / name).write_text(json.dumps(scene))

    w = rz.World()
    w.load_scene(str(tmp_path / "a.json"))
    assert len(w.textures) == 1
    w.load_scene(str(tmp_path / "b.json"))
    assert len(w.textures) == 1, "same-path map duplicated across loads"
