"""textured_room: all five map kinds through the atlas path (BASELINE config 5
analog — maps + instancing + NEE + progressive)."""
import numpy as np

import rayzath_tpu as rz
from rayzath_tpu.models.device_scene import compile_world


def test_textured_room_compiles_all_map_kinds():
    w = rz.scenes.textured_room(32, 32)
    scene = compile_world(w)
    assert scene.has_maps
    # one map of each kind made it into an atlas with a valid rect
    assert len(w.textures) == len(w.normal_maps) == 1
    assert len(w.metalness_maps) == len(w.roughness_maps) == 1
    assert len(w.emission_maps) == 1
    rects = np.asarray(scene.map_rect)
    assert (rects[:, 2] > 0).all() and (rects[:, 3] > 0).all()
    # materials reference their maps
    maps = np.asarray(scene.mat_maps)
    assert (maps >= 0).any(axis=0).all(), "every map slot used by some material"


def test_textured_room_renders_with_map_variation():
    w = rz.scenes.textured_room(48, 48)
    r = rz.Renderer(w)
    r.render(rpp=8)
    img = r.image_f32()
    assert not np.isnan(img).any()
    assert img.mean() > 0.02
    # the checkerboard should give the bottom rows real spatial variance
    bottom = img[36:, :, 0]
    assert bottom.std() > 0.01
