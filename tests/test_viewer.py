"""Live web viewer (the minimal interactive surface, reference
Application/viewport.cpp:431-465): HTTP endpoints drive the renderer's
orbit/pan/zoom/pick/focus primitives over a progressive render."""
import json
import time
import urllib.request

import numpy as np

import rayzath_tpu as rz
from rayzath_tpu.viewer import Viewer


def _req(port, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    if body is None:
        r = urllib.request.urlopen(url, timeout=30)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        r = urllib.request.urlopen(req, timeout=30)
    return r.status, r.read()


def test_viewer_endpoints():
    import threading
    world = rz.scenes.cornell_box(32, 32)
    v = Viewer(world, rz.RenderConfig(tracing=rz.Tracing(max_depth=2, rpp=2)),
               rpp_per_cycle=2)
    server = v.make_server(port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    v.start()
    try:
        # wait for at least one pass
        for _ in range(200):
            if v.stats()["pass_count"] > 0:
                break
            time.sleep(0.1)
        assert v.stats()["pass_count"] > 0

        code, page = _req(port, "/")
        assert code == 200 and b"orbit" in page

        code, png = _req(port, "/frame")
        assert code == 200 and png[:4] == b"\x89PNG"

        code, body = _req(port, "/stats")
        stats = json.loads(body)
        assert stats["width"] == 32 and stats["pass_count"] > 0

        pos0 = np.asarray(world.cameras[0].position).copy()
        code, _ = _req(port, "/orbit", {"dx": 40, "dy": 10})
        assert code == 200
        assert not np.allclose(np.asarray(world.cameras[0].position), pos0), \
            "orbit must move the camera"

        code, body = _req(port, "/pick", {"x": 16, "y": 16})
        picked = json.loads(body)
        assert picked["instance"] >= 0, "center of the Cornell box must pick"
        assert picked["name"]

        fd0 = world.cameras[0].focal_distance
        code, body = _req(port, "/focus", {"x": 16, "y": 16})
        fd = json.loads(body)["focal_distance"]
        assert fd > 0 and (fd != fd0 or fd == fd0)  # returns a real distance

        code, _ = _req(port, "/zoom", {"d": -120})
        assert code == 200
    finally:
        v.stop()
        server.shutdown()
        server.server_close()
