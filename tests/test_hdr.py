"""HDR bitmap loading (reference BitmapLoader::loadHDR, loader.cpp:103-138):
Radiance RGBE parsing, texture+emission pair split, JSON hook, and an
HDR-environment-lit render."""
import json
import os

import numpy as np
import jax

import rayzath_tpu as rz
from rayzath_tpu.io.bitmap import load_hdr, hdr_to_texture_emission
from rayzath_tpu.io.loader import load_hdr as load_hdr_pair, load_scene


def _write_hdr_flat(path, rgb):
    """Encode float rgb [H,W,3] as a flat (non-RLE) Radiance file."""
    h, w, _ = rgb.shape
    mx = rgb.max(axis=2)
    e = np.zeros((h, w), np.int32)
    nz = mx > 1e-32
    e[nz] = np.frexp(mx[nz])[1]               # mx = m * 2^e, m in [0.5,1)
    scale = np.where(nz, np.ldexp(1.0, -e + 8), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(np.rint(rgb * scale[..., None]), 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(nz, e + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def test_hdr_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    rgb = (rng.uniform(0.1, 50.0, (6, 7, 3))).astype(np.float32)
    p = str(tmp_path / "probe.hdr")
    _write_hdr_flat(p, rgb)
    out = load_hdr(p)
    assert out.shape == (6, 7, 3)
    # RGBE shares one exponent across channels: error bounded by the
    # pixel's max-channel quantum (~1/256 of the max component)
    quantum = rgb.max(axis=2, keepdims=True) / 256.0
    assert np.all(np.abs(out - rgb) <= quantum * 2.1 + 1e-4)


def test_hdr_npy_and_pair_split(tmp_path):
    rgb = np.asarray([[[2.0, 4.0, 1.0]]], np.float32)
    p = str(tmp_path / "e.npy")
    np.save(p, rgb)
    out = load_hdr(p)
    np.testing.assert_allclose(out, rgb)
    tex, emi = hdr_to_texture_emission(out)
    np.testing.assert_allclose(emi, [[4.0]])
    np.testing.assert_allclose(tex[0, 0], [0.5, 1.0, 0.25, 1.0])


def test_loader_hdr_pair_api(tmp_path):
    rgb = np.full((4, 8, 3), 3.0, np.float32)
    rgb[:, :, 1] = 6.0
    p = str(tmp_path / "sky.hdr")
    _write_hdr_flat(p, rgb)
    w = rz.World()
    tex, emi = load_hdr_pair(w, p, address_mode="clamp")
    assert tex in list(w.textures) and emi in list(w.emission_maps)
    assert emi.name == "sky emission"
    np.testing.assert_allclose(np.asarray(emi.data).max(), 6.0, rtol=0.02)


def test_json_scene_hdr_texture(tmp_path):
    rgb = np.full((4, 4, 3), 2.0, np.float32)
    _write_hdr_flat(str(tmp_path / "env.hdr"), rgb)
    scene = {"Objects": {"Texture": [{"name": "env", "file": "env.hdr"}]}}
    sp = tmp_path / "scene.json"
    sp.write_text(json.dumps(scene))
    w = rz.World()
    res = load_scene(w, str(sp))
    assert not res.errors
    names = [t.name for t in w.textures]
    assert "env" in names
    assert any(m.name == "env emission" for m in w.emission_maps)


def test_hdr_environment_lights_scene(tmp_path):
    """An HDR sky (texture+emission on the world material) must actually
    light a diffuse scene through the miss path."""
    from rayzath_tpu.models.device_scene import compile_world, compile_camera
    from rayzath_tpu.engine.state import init_state
    from rayzath_tpu.engine.integrator import render_steps
    # bright band in the upper hemisphere
    rgb = np.full((8, 16, 3), 0.05, np.float32)
    rgb[0:2] = (20.0, 10.0, 5.0)
    p = str(tmp_path / "sky.hdr")
    _write_hdr_flat(p, rgb)

    w = rz.World()
    tex, emi = load_hdr_pair(w, p)
    w.material.texture = tex
    w.material.emission_map = emi
    w.material.emission = 1.0
    white = w.create_material("white", color=(0.8, 0.8, 0.8, 1.0))
    plane = w.generate_mesh("plane", sides=4, width=6.0, height=6.0)
    w.create_instance(name="ground", mesh=plane, materials=[white])
    cam = w.create_camera("camera", position=(0, 1.0, -4.0),
                          resolution=(32, 32), fov=1.1, focal_distance=4.0,
                          aperture=0.01, exposure_time=0.5)
    cam.look_at((0, 0.0, 0))

    scene = compile_world(w)
    dcam = compile_camera(w.cameras[0])
    cfg = rz.RenderConfig(tracing=rz.Tracing(max_depth=3, rpp=4))
    st = render_steps(scene, dcam, cfg, init_state(32, 32), jax.random.key(0), 6)
    img = np.asarray(st.accum[..., :3])
    assert np.isfinite(img).all()
    assert img.max() > 0.05, "HDR environment contributed no light"


def test_old_rle_hdr_decodes(tmp_path):
    """Old-style RLE (repeat marker (1,1,1,count)) must decode, not be
    misparsed as flat RGBE (advisor finding)."""
    import numpy as np
    from rayzath_tpu.io.bitmap import load_hdr

    h, w = 4, 16
    # reference image: row pattern with long constant runs
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., 0] = 64
    rgbe[..., 1] = 32
    rgbe[..., 2] = 16
    rgbe[..., 3] = 128  # exponent 0 -> scale 2^-8
    rgbe[1, :, 0] = 200  # distinct second row

    # encode with old RLE: first pixel literal, then one run marker
    out = bytearray()
    out += b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
    out += f"-Y {h} +X {w}\n".encode()
    for y in range(h):
        px = rgbe[y, 0]
        out += bytes(px)                       # literal first pixel
        out += bytes([1, 1, 1, w - 1])         # repeat it w-1 times
    (tmp_path / "old.hdr").write_bytes(bytes(out))

    img = load_hdr(str(tmp_path / "old.hdr"))
    assert img.shape == (h, w, 3)
    # every pixel of a row equals its first pixel (run repeated)
    assert np.all(img == img[:, :1, :])
    # rows differ where the source differs
    assert img[1, 0, 0] != img[0, 0, 0]
    # value check: mantissa/256 * 2^(e-128) semantics
    assert np.isclose(img[0, 0, 0], (64 / 256) * 2.0 ** (128 - 128), rtol=1e-6)
