"""End-to-end viewer tests: every HTTP route over a live ViewerApp.

Drives the browser editor's API (apps/viewer.py) against a tiny procedural
scene on the CPU backend — the coverage the reference's Swing UI never had.
"""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.scene.scene import ModelInstance, Scene
from raytracer_tpu.utils import assets

W, H = 64, 48


@pytest.fixture(scope="module")
def viewer(tmp_path_factory):
    from raytracer_tpu.apps.viewer import ViewerApp, make_handler

    tmp = tmp_path_factory.mktemp("viewer")
    cube_path = str(tmp / "cube.obj")
    assets.write_obj(cube_path, assets.make_cube() * 4.0)

    scene = Scene()
    scene.add_instance(ModelInstance(model_path=cube_path,
                                     display_name="cube_a",
                                     position=(0.0, -6.0, 0.0)))
    cfg = RenderConfig(width=W, height=H)
    app = ViewerApp(cfg, scene)
    app.start()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(app))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield app, base, str(tmp), cube_path
    server.shutdown()
    app.stop()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, r.read()


def _post(base, path, data):
    req = urllib.request.Request(
        base + path, data=json.dumps(data).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _state(base):
    return json.loads(_get(base, "/api/state")[1])


def _wait(pred, timeout=180.0, interval=0.25):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_index_and_state(viewer):
    app, base, _, _ = viewer
    status, body = _get(base, "/")
    assert status == 200 and b"raytracer_tpu" in body
    s = _state(base)
    assert [i["display_name"] for i in s["instances"]] == ["cube_a"]
    assert s["camera"]["origin"] == [-25.0, 30.0, 140.0]


def test_frame_renders_and_stats_flow(viewer):
    app, base, _, _ = viewer
    assert _wait(lambda: _state(base)["stats"] is not None), \
        "no frame rendered within timeout"
    status, body = _get(base, "/frame.jpg")
    assert status == 200 and len(body) > 100
    s = _state(base)
    assert s["stats"]["samples"] >= 1
    # Observability wiring: per-stage times come from the engine StageTimer.
    assert "dispatch" in s["stages"] and "readback" in s["stages"]
    assert s["stages"]["build"]["count"] >= 1


def test_key_moves_camera_and_resets_accumulation(viewer):
    app, base, _, _ = viewer
    z0 = _state(base)["camera"]["origin"][2]
    _post(base, "/api/key", {"key": "W"})  # -6.5 z (VulkanApp.java:756)
    s = _state(base)
    assert s["camera"]["origin"][2] == pytest.approx(z0 - 6.5)
    # The key press resets accumulation; the VRT may legitimately have
    # rendered a frame or two before the state query (raced under load).
    assert s["camera"]["frame_count"] <= 3


def test_settings_routes(viewer):
    app, base, _, _ = viewer
    _post(base, "/api/settings", {"sky": False, "exposure": 1.5})
    s = _state(base)
    assert s["sky_enabled"] is False and s["exposure"] == 1.5
    _post(base, "/api/settings", {"sky": True, "exposure": 99.0})
    s = _state(base)
    assert s["exposure"] == 5.0  # clamped to the reference slider range


def test_add_update_remove_preserves_order(viewer):
    app, base, _, cube_path = viewer
    _post(base, "/api/instance/add",
          {"model_path": cube_path, "display_name": "cube_b",
           "position": [8, -6, 0]})
    _post(base, "/api/instance/add",
          {"model_path": cube_path, "display_name": "cube_c",
           "position": [-8, -6, 0]})
    names = [i["display_name"] for i in _state(base)["instances"]]
    assert names == ["cube_a", "cube_b", "cube_c"]

    # Update the middle instance: values change, order must not
    # (the remove/clear/re-add sequence in update_instance).
    _post(base, "/api/instance/1/update",
          {"position": [9, -5, 1], "material_type": 1.0})
    s = _state(base)
    assert [i["display_name"] for i in s["instances"]] == \
        ["cube_a", "cube_b", "cube_c"]
    assert s["instances"][1]["position"] == [9, -5, 1]
    assert s["instances"][1]["material_type"] == 1.0

    _post(base, "/api/instance/1/remove", {})
    names = [i["display_name"] for i in _state(base)["instances"]]
    assert names == ["cube_a", "cube_c"]


def test_scene_save_load_roundtrip(viewer):
    app, base, tmp, _ = viewer
    path = tmp + "/saved.json"
    _post(base, "/api/scene/save", {"path": path})
    before = [i["display_name"] for i in _state(base)["instances"]]
    _post(base, "/api/instance/0/remove", {})
    assert len(_state(base)["instances"]) == len(before) - 1
    _post(base, "/api/scene/load", {"path": path})
    after = [i["display_name"] for i in _state(base)["instances"]]
    assert after == before


def test_resolution_ladder_preview_then_full(viewer):
    """Right after a camera event (frame_count resets to 0) the engine
    serves upscaled half-res preview frames; once still past the ladder
    window it switches to full resolution (VERDICT r2 #7). Pixels are
    always published at the full frame size."""
    app, base, _, _ = viewer
    assert app.engine._preview is not None  # 64x48 is 16-divisible
    assert _wait(lambda: _state(base)["stats"] is not None)

    _post(base, "/api/key", {"key": "Q"})  # reset accumulation
    # While frame_count < ladder window, frames must be previews.
    assert _wait(lambda: (_state(base)["stats"] or {}).get("preview")
                 is True, timeout=60), "no preview frame after camera event"
    status, body = _get(base, "/frame.jpg")
    assert status == 200 and len(body) > 100  # upscaled to full size

    # Once still long enough, full-res frames resume.
    assert _wait(lambda: (_state(base)["stats"] or {}).get("preview")
                 is False, timeout=120), "never switched back to full res"
    f = app.engine.latest_frame() or app._last_frame
    if f is not None:
        assert f.pixels.shape == (H, W, 3)


def test_unknown_routes_404(viewer):
    app, base, _, _ = viewer
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/api/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/nope", {})
    assert e.value.code == 404


def test_api_error_returns_500(viewer):
    app, base, _, _ = viewer
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base, "/api/instance/99/update", {"position": [0, 0, 0]})
    assert e.value.code == 500


def test_keypress_latency_instrumented(viewer):
    """VERDICT r3 item 5: every user event's first post-event frame
    carries input_latency_ms with a consistent stage split
    (wait + render == latency). Host-side structural assertions only —
    absolute budgets are measured on TPU (exp26 rerun), not here."""
    app, base, _, _ = viewer
    assert _wait(lambda: _state(base)["stats"] is not None)

    # Fire a key event and wait for its tagged frame (the engine retains
    # it in last_event_frame — the frame mailbox is drain-to-latest and
    # the UI tick loop competes for it).
    before = app.engine.last_event_frame
    app.key("E")
    assert _wait(lambda: app.engine.last_event_frame is not before,
                 timeout=120, interval=0.01), \
        "no frame carried the keypress latency"
    tagged = app.engine.last_event_frame
    # Stage split: event -> dispatch (wait) + dispatch -> publish
    # (render_ms) must sum to the end-to-end number (same clock).
    assert tagged.wait_ms is not None
    assert tagged.input_latency_ms == pytest.approx(
        tagged.wait_ms + tagged.render_ms, abs=1.0)
    assert 0.0 <= tagged.wait_ms <= tagged.input_latency_ms
    # The HTTP state surface remembers it.
    assert _wait(lambda: (_state(base)["stats"] or {}).get(
        "input_latency_ms") is not None, timeout=30)

    # Exactly the FIRST post-event frame is tagged: with no new event,
    # last_event_frame stays put while frame numbers advance past it.
    def advanced_past():
        f = app._last_frame
        return (f is not None and f.input_latency_ms is None
                and f.frame_number > tagged.frame_number
                and app.engine.last_event_frame is tagged)
    assert _wait(advanced_past, timeout=60)
