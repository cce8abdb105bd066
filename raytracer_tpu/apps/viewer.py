"""Interactive editor/viewer: the Swing UI (reference VulkanApp) as a
browser app over a threaded HTTP server.

Full reference editor surface (``VulkanApp.java``): object list with
Add/Remove model, per-object position / uniform scale / color presets +
custom RGB / material combo (Matte 0.0, Metal 1.0, Fuzzy Metal 2.0,
Emissive 3.0, :483-488), global sky checkbox (:407-425) and exposure
slider -5..+5 (:428-452 — functional here, not a TODO), WASD/QE camera
keys with the reference step vectors (:726-770), FPS + accumulated-sample
readout (:226-234), accumulation paused while a rebuild is in flight
(:199-208) and reset on camera/scene/sky events.

Run: python -m raytracer_tpu.apps.viewer [--port 8000] [--width 640 ...]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from raytracer_tpu.core.camera import Camera, default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.loop import RenderEngine
from raytracer_tpu.scene.scene import ModelInstance, Scene, default_scene
from raytracer_tpu.utils.log import get_logger

_log = get_logger("ui")

COLOR_PRESETS = {  # reference VulkanApp.java:475-481
    "Grey": (0.5, 0.5, 0.5), "White": (1.0, 1.0, 1.0),
    "Red": (1.0, 0.0, 0.0), "Green": (0.0, 1.0, 0.0),
    "Blue": (0.0, 0.0, 1.0),
}


class ViewerApp:
    """Single-writer owner of camera/scene/settings state."""

    def __init__(self, cfg: RenderConfig, scene: Scene,
                 ladder_frames: int = 8):
        self.cfg = cfg
        self.scene = scene
        self.camera = default_camera(cfg.width, cfg.height)
        self.sky_enabled = True
        self.exposure = 0.0
        # Resolution ladder: half-res upscaled frames while the camera is
        # moving / right after an edit, full res + accumulation when still
        # — keypress-to-updated-frame stays interactive at 720p.
        self.engine = RenderEngine(cfg, ladder_frames=ladder_frames)
        self._lock = threading.RLock()
        self._last_frame = None
        self._running = False
        self._event_t = None  # perf_counter of the latest user action

    # --- lifecycle -----------------------------------------------------------

    def start(self):
        self._running = True
        self.engine.start()
        self.engine.on_scene_swapped = self._on_scene_swapped
        self.engine.rebuild_scene_async(self.scene)
        self._ticker = threading.Thread(target=self._tick_loop, name="UI",
                                        daemon=True)
        self._ticker.start()

    def stop(self):
        self._running = False
        self.engine.stop()

    def _tick_loop(self):
        """The 16 ms Swing-timer analogue (VulkanApp.java:171,194-235),
        with one correction over the reference: the accumulation counter
        advances once per *rendered* frame (not per wall-clock tick), so
        slow renders still weight every new sample correctly."""
        last_rendered = -1
        while self._running:
            with self._lock:
                self._refresh_frame()
                frame = self._last_frame
                if (frame is not None and frame.frame_number != last_rendered
                        and not self.engine.build_in_progress):
                    last_rendered = frame.frame_number
                    self.camera.increment_frame_count()
                self.engine.submit_camera_update(self._uniforms())
            time.sleep(0.016)

    def _refresh_frame(self):
        frame = self.engine.latest_frame()
        if frame is not None:
            self._last_frame = frame

    def _uniforms(self):
        uni = self.camera.uniforms(sky_enabled=self.sky_enabled,
                                   exposure=self.exposure)
        # Latency probe: timestamp of the most recent user action (key /
        # sky / edit). The VRT reads it only when the accumulation counter
        # goes backward, i.e. exactly once per event (engine/loop.py).
        uni.event_t = self._event_t
        return uni

    def _on_scene_swapped(self):
        with self._lock:
            self.camera.reset_accumulation()

    # --- edits (each is an 'event': reset accumulation) ----------------------

    def key(self, k: str):
        with self._lock:
            self._event_t = time.perf_counter()
            self.camera.move(k)  # includes reset_accumulation
            # Submit immediately instead of waiting out the 16 ms tick
            # (the reference also submits inside the key action,
            # VulkanApp.java:747-750) — mean keypress latency drops ~8 ms.
            self.engine.submit_camera_update(self._uniforms())

    def set_sky(self, enabled: bool):
        with self._lock:
            self._event_t = time.perf_counter()
            self.sky_enabled = bool(enabled)
            self.camera.reset_accumulation()

    def set_exposure(self, stops: float):
        with self._lock:  # tonemap-only: no accumulation reset needed
            self.exposure = max(-5.0, min(5.0, float(stops)))

    def add_instance(self, data: dict):
        inst = ModelInstance(
            model_path=data["model_path"],
            display_name=data.get("display_name", ""),
            position=tuple(data.get("position", (0, 0, 0))),
            scale=tuple(data.get("scale", (1, 1, 1))),
            color=tuple(data.get("color", (0.8, 0.8, 0.8))),
            material_type=float(data.get("material_type", 0.0)))
        with self._lock:
            self.scene.add_instance(inst)
        self._rebuild()

    def update_instance(self, index: int, data: dict):
        with self._lock:
            old = self.scene.get_instances()[index]
            import dataclasses

            new = dataclasses.replace(
                old,
                position=tuple(data.get("position", old.position)),
                scale=tuple(data.get("scale", old.scale)),
                color=tuple(data.get("color", old.color)),
                material_type=float(
                    data.get("material_type", old.material_type)))
            self.scene.remove_at(index)
            instances = self.scene.get_instances()
            self.scene.clear()
            for i, inst in enumerate(instances[:index]):
                self.scene.add_instance(inst)
            self.scene.add_instance(new)
            for inst in instances[index:]:
                self.scene.add_instance(inst)
        self._rebuild()

    def remove_instance(self, index: int):
        with self._lock:
            self.scene.remove_at(index)
        self._rebuild()

    def save_scene(self, path: str):
        self.scene.save_json(path)

    def load_scene(self, path: str):
        loaded = Scene.load_json(path)
        with self._lock:
            self.scene.clear()
            for inst in loaded.get_instances():
                self.scene.add_instance(inst)
        self._rebuild()

    def _rebuild(self):
        with self._lock:
            self._event_t = time.perf_counter()
        self.engine.rebuild_scene_async(self.scene)

    # --- frame/state for HTTP -------------------------------------------------

    def frame_png(self) -> bytes:
        with self._lock:
            self._refresh_frame()
            frame = self._last_frame
        if frame is None:
            return b""
        try:
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(frame.pixels).save(buf, "JPEG", quality=90)
            return buf.getvalue()
        except ImportError:
            from raytracer_tpu.utils.png import write_png
            import tempfile, os

            with tempfile.NamedTemporaryFile(suffix=".png",
                                             delete=False) as f:
                path = f.name
            write_png(path, frame.pixels)
            data = open(path, "rb").read()
            os.unlink(path)
            return data

    def state(self) -> dict:
        with self._lock:
            self._refresh_frame()
            frame = self._last_frame
            return {
                "instances": [i.to_json()
                              for i in self.scene.get_instances()],
                "camera": {
                    "origin": list(self.camera.origin),
                    "look_at": list(self.camera.look_at),
                    "frame_count": self.camera.frame_count,
                },
                "sky_enabled": self.sky_enabled,
                "exposure": self.exposure,
                "building": self.engine.build_in_progress,
                # FPS/Mrays from the engine's rolling FrameCounter (1 Hz
                # window like the reference title bar); per-stage wall
                # times from its StageTimer.
                "stats": None if frame is None else {
                    "frame": frame.frame_number,
                    "samples": frame.samples,
                    "render_ms": round(frame.render_ms, 1),
                    "fps": round(self.engine.meter.fps, 2),
                    "mrays": round(self.engine.meter.mrays_per_s, 2),
                    "preview": frame.preview,
                    # Keypress->frame latency of the most recent user
                    # event (ms; None until the first event lands).
                    "input_latency_ms": (
                        None if self.engine.last_input_latency_ms is None
                        else round(self.engine.last_input_latency_ms, 1)),
                },
                "stages": self.engine.profiler.summary(),
                "color_presets": COLOR_PRESETS,
                "materials": {"Matte (Lambertian)": 0.0,
                              "Metal (Shiny)": 1.0,
                              "Metal (Fuzzy)": 2.0,
                              "Emissive (Light)": 3.0},
            }


PAGE = """<!DOCTYPE html>
<html><head><title>raytracer_tpu viewer</title><style>
body{font-family:sans-serif;margin:0;display:flex;background:#222;color:#ddd}
#view{flex:1;padding:10px}#panel{width:320px;padding:10px;background:#2b2b2b;
overflow-y:auto;height:100vh}img{max-width:100%;image-rendering:pixelated}
input,select,button{margin:2px;background:#444;color:#ddd;border:1px solid
#666}h3{margin:8px 0 4px}#objlist div{padding:2px;cursor:pointer}
#objlist .sel{background:#446}label{font-size:12px}</style></head><body>
<div id=view><img id=frame><div id=stats></div>
<p>Move: W/A/S/D forward/left/back/right, Q/E up/down (click the image
first)</p></div>
<div id=panel>
<h3>Objects</h3><div id=objlist></div>
<button onclick=removeSel()>Remove</button>
<h3>Add model</h3>
<input id=addpath placeholder=/root/reference/objects/cube.obj size=28>
<button onclick=addModel()>Add</button>
<h3>Selected object</h3>
<label>Pos</label><br>
<input id=px size=5><input id=py size=5><input id=pz size=5><br>
<label>Scale</label> <input id=sc size=6><br>
<label>Color</label> <select id=cpreset></select>
<input id=cr size=4><input id=cg size=4><input id=cb size=4><br>
<label>Material</label> <select id=mat></select><br>
<button onclick=applySel()>Apply</button>
<h3>Global settings</h3>
<label><input type=checkbox id=sky checked onchange=setSky()> Enable sky
light</label><br>
<label>Exposure <span id=expv>0.0</span></label><br>
<input type=range id=exp min=-5 max=5 step=0.1 value=0 oninput=setExp()>
<h3>Scene</h3>
<input id=scenepath value=scene.json size=20>
<button onclick="sceneIO('save')">Save</button>
<button onclick="sceneIO('load')">Load</button>
</div>
<script>
let sel=0,state=null;
const mats={"Matte (Lambertian)":0,"Metal (Shiny)":1,"Metal (Fuzzy)":2,
"Emissive (Light)":3};
function api(p,body){return fetch(p,{method:'POST',
body:JSON.stringify(body||{})}).then(r=>r.json())}
function refresh(){fetch('/api/state').then(r=>r.json()).then(s=>{
 state=s;const ol=document.getElementById('objlist');ol.innerHTML='';
 s.instances.forEach((o,i)=>{const d=document.createElement('div');
  d.textContent=o.display_name+(i==sel?' *':'');
  if(i==sel)d.className='sel';d.onclick=()=>{sel=i;fillSel();refresh()};
  ol.appendChild(d)});
 const st=s.stats;document.getElementById('stats').textContent=st?
  `frame ${st.frame} | ${st.fps} FPS | ${st.render_ms} ms | samples `+
  `${st.samples} | ${st.mrays} Mrays/s`+(s.building?' | rebuilding...':'')
  :'waiting for first frame...';})}
function fillSel(){if(!state||!state.instances[sel])return;
 const o=state.instances[sel];px.value=o.position[0];py.value=o.position[1];
 pz.value=o.position[2];sc.value=o.scale[0];cr.value=o.color[0];
 cg.value=o.color[1];cb.value=o.color[2];mat.value=o.material_type}
function applySel(){api('/api/instance/'+sel+'/update',{
 position:[+px.value,+py.value,+pz.value],
 scale:[+sc.value,+sc.value,+sc.value],
 color:[+cr.value,+cg.value,+cb.value],
 material_type:+mat.value}).then(refresh)}
function removeSel(){api('/api/instance/'+sel+'/remove').then(()=>{sel=0;
 refresh()})}
function addModel(){api('/api/instance/add',{model_path:addpath.value})
 .then(refresh)}
function setSky(){api('/api/settings',{sky:sky.checked})}
function setExp(){expv.textContent=exp.value;
 api('/api/settings',{exposure:+exp.value})}
function sceneIO(op){api('/api/scene/'+op,{path:scenepath.value})
 .then(refresh)}
document.addEventListener('keydown',e=>{
 const k=e.key.toUpperCase();
 if('WASDQE'.includes(k)&&document.activeElement.tagName!='INPUT')
  api('/api/key',{key:k})});
const matsel=document.getElementById('mat');
Object.entries(mats).forEach(([n,v])=>{const o=document.createElement(
 'option');o.text=n;o.value=v;matsel.add(o)});
const cp=document.getElementById('cpreset');
['Grey','White','Red','Green','Blue'].forEach(n=>{const o=
 document.createElement('option');o.text=n;cp.add(o)});
cp.onchange=()=>{const c={Grey:[.5,.5,.5],White:[1,1,1],Red:[1,0,0],
 Green:[0,1,0],Blue:[0,0,1]}[cp.value];cr.value=c[0];cg.value=c[1];
 cb.value=c[2]};
setInterval(()=>{document.getElementById('frame').src=
 '/frame.jpg?t='+Date.now()},100);
setInterval(refresh,1000);refresh();
</script></body></html>"""


def make_handler(app: ViewerApp):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code, body, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/" or self.path.startswith("/index"):
                self._send(200, PAGE.encode(), "text/html")
            elif self.path.startswith("/frame.jpg"):
                self._send(200, app.frame_png(), "image/jpeg")
            elif self.path.startswith("/api/state"):
                self._send(200, json.dumps(app.state()).encode())
            else:
                self._send(404, b"{}")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(n) or b"{}")
            try:
                path = self.path
                if path == "/api/key":
                    app.key(data["key"])
                elif path == "/api/settings":
                    if "sky" in data:
                        app.set_sky(data["sky"])
                    if "exposure" in data:
                        app.set_exposure(data["exposure"])
                elif path == "/api/instance/add":
                    app.add_instance(data)
                elif path.startswith("/api/instance/"):
                    parts = path.split("/")
                    idx = int(parts[3])
                    if parts[4] == "update":
                        app.update_instance(idx, data)
                    elif parts[4] == "remove":
                        app.remove_instance(idx)
                elif path == "/api/scene/save":
                    app.save_scene(data["path"])
                elif path == "/api/scene/load":
                    app.load_scene(data["path"])
                else:
                    return self._send(404, b"{}")
                self._send(200, b'{"ok": true}')
            except Exception as e:  # surface errors like the Swing dialogs
                _log.exception("api error")
                self._send(500, json.dumps({"error": str(e)}).encode())

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address; pass 0.0.0.0 to expose the unauthenticated "
                        "edit API on the network (opt-in)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--kernel", choices=("packet", "wavefront"),
                   default="packet")
    p.add_argument("--scene", help="scene JSON to open")
    p.add_argument("--assets", default="/root/reference/objects")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"),
                   default="auto")
    p.add_argument("--ladder", type=int, default=8,
                   help="preview (quarter-res) frames after each "
                        "camera/scene event before switching to full res; "
                        "0 disables. Default 8: with the r5 pipelined "
                        "readbacks (the VRT no longer blocks in a stale "
                        "frame's fetch) exp26 r5c measured keypress->frame "
                        "median 174 ms ladder-on vs 260 ms ladder-off at "
                        "720p — the cheap preview now publishes ahead of "
                        "the in-flight full-res frame. (Under r4c's "
                        "blocking loop the same A/B read 161 vs 142 ms, "
                        "which is why the default was briefly 0.)")
    args = p.parse_args(argv)
    from raytracer_tpu.apps.headless import apply_device_flag

    apply_device_flag(args.device)

    cfg = RenderConfig(width=args.width, height=args.height,
                       samples_per_pixel=args.spp, kernel=args.kernel)
    scene = (Scene.load_json(args.scene) if args.scene
             else default_scene(asset_dir=args.assets))
    app = ViewerApp(cfg, scene, ladder_frames=args.ladder)
    app.start()

    server = ThreadingHTTPServer((args.host, args.port), make_handler(app))
    _log.info("viewer at http://localhost:%d", args.port)
    print(f"viewer at http://localhost:{args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        app.stop()
    return 0


if __name__ == "__main__":
    main()
