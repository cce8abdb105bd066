"""The three-"thread" runtime: UI / render loop / scene rebuild.

Reproduces the reference's decoupled architecture (README.md:22-25) with
the same single-writer ownership discipline that its
"(3-THREAD-RACE-CONDITION-FIX)" comments document (``VulkanApp.java:34-38``,
``VulkanEngine.java:34-41``):

* the **app/UI** owns all mutable state: camera, scene graph, accumulation
  counter, sky/exposure settings;
* the **render thread** ("VRT") is a dumb consumer: it drains
  drain-to-latest mailboxes (camera / scene / settings — the analogue of
  the reference's ``ConcurrentLinkedQueue``s, ``VulkanEngine.java:59-63``)
  and publishes frames into a latest-frame mailbox
  (``AtomicReference<FrameData>``, ``VulkanApp.java:70``);
* **scene rebuilds** ("SRT") run in a worker pool; while one is in flight
  the accumulation counter is paused (``VulkanApp.java:199-208``), and on
  completion the new device scene is swapped in and accumulation resets.

Failure policy mirrors the reference: a rebuild failure keeps the old
scene rendering (``VulkanApp.java:270-272``); a render-step failure is
logged and the loop continues; ``stop()`` joins gracefully with a 5 s
timeout (``VulkanEngine.java:142-150``).
"""

from __future__ import annotations

import collections
import dataclasses
import os
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Optional

import numpy as np

from raytracer_tpu.core.camera import Camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.scene.builder import build_fast_scene, build_gpu_scene
from raytracer_tpu.scene.scene import Scene
from raytracer_tpu.utils.log import get_logger
from raytracer_tpu.utils.profiler import FrameCounter, StageTimer

_log_vrt = get_logger("vrt")
_log_srt = get_logger("srt")


@dataclasses.dataclass
class FrameData:
    """VRT -> UI frame mailbox payload (reference renderer/FrameData.java,
    with the 'RENDER STATISTICS' TODO actually implemented)."""

    pixels: np.ndarray          # u8[H, W, 3]
    frame_number: int
    samples: float
    rays_traced: float
    # Submit-to-publish latency. Under pipelined dispatch (RAYTPU_PIPELINE
    # frames in flight) this includes queue dwell, so it exceeds the
    # per-frame device time; FrameCounter's rolling FPS is the
    # throughput number.
    render_ms: float
    # True while the resolution ladder is serving upscaled preview frames
    # (pixels are still full-size; see RenderEngine ladder_frames).
    preview: bool = False
    # Input-event -> this-frame-published latency, carried ONLY by the
    # first frame rendered with post-event state (None otherwise). The
    # event timestamp originates at the UI action (ViewerApp.key/set_sky
    # attach `event_t` to the uniforms); the VRT detects the event by the
    # accumulation counter going backward. Stage split: `wait_ms` =
    # event -> dispatch start (tick + mailbox + stale-frame drop dwell),
    # render_ms = dispatch -> publish, readback inside render_ms.
    input_latency_ms: Optional[float] = None
    wait_ms: Optional[float] = None


class _Mailbox:
    """Drain-to-latest single-slot mailbox."""

    def __init__(self):
        self._lock = threading.Lock()
        self._value = None
        self._fresh = False

    def put(self, value) -> None:
        with self._lock:
            self._value = value
            self._fresh = True

    def take(self):
        """Return (value, fresh) and clear the fresh flag."""
        with self._lock:
            fresh = self._fresh
            self._fresh = False
            return self._value, fresh


class RenderEngine:
    """Owns the render thread and the rebuild pool."""

    def __init__(self, config: Optional[RenderConfig] = None,
                 renderer: Optional[Renderer] = None,
                 device_rebuild: bool = True,
                 ladder_frames: Optional[int] = None):
        self.cfg = config or RenderConfig()
        self.renderer = renderer or Renderer(self.cfg)
        # Resolution laddering (VERDICT r2 #7): while the camera is moving
        # or a rebuild just landed, render at half resolution and upscale —
        # every accumulation-resetting event zeroes frame_count, so
        # "interactive" is simply frame_count < ladder_frames. Once still,
        # switch to full resolution with the counter shifted so the first
        # full-res sample overwrites (fc=0 semantics). This is the
        # TPU-idiomatic version of the reference's 16 ms-tick feel
        # (VulkanApp.java:171,194-235) at resolutions where a full frame
        # is slower than the tick.
        if ladder_frames is None:
            ladder_frames = int(os.environ.get("RAYTPU_LADDER", "0"))
        self._ladder_frames = int(ladder_frames)
        self._preview: Optional[Renderer] = None
        # RAYTPU_LADDER_SCALE: preview downscale per axis (default 2 =
        # quarter-area). 4 renders 1/16 of the rays — at 720p that is a
        # ~10 ms preview dispatch, trading blockier motion frames for
        # keypress latency.
        scale = max(2, int(os.environ.get("RAYTPU_LADDER_SCALE", "2")))
        if (self._ladder_frames > 0
                and self.cfg.width % (8 * scale) == 0
                and self.cfg.height % (8 * scale) == 0):
            pcfg = dataclasses.replace(self.cfg,
                                       width=self.cfg.width // scale,
                                       height=self.cfg.height // scale)
            self._preview = Renderer(pcfg)
        # On-device LBVH rebuild (jitted transform+build; geometry stays in
        # HBM) — packet kernel only; wavefront scenes use the host builder.
        self._device_builder = None
        if device_rebuild and self.cfg.kernel == "packet":
            from raytracer_tpu.scene.device_builder import DeviceSceneBuilder

            self._device_builder = DeviceSceneBuilder()
        # Observability: per-stage wall times (build/dispatch/readback) and
        # a rolling FPS / Mrays meter — FrameData carries per-frame numbers,
        # these aggregate them (the reference's FPS title + build logs,
        # VulkanApp.java:226-234, BVHBuilder.java:34-39).
        self.profiler = StageTimer()
        self.meter = FrameCounter()
        self._camera_box = _Mailbox()
        self._scene_box = _Mailbox()
        self._frame_box = _Mailbox()
        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._publisher: Optional[threading.Thread] = None
        # Pipelined readbacks (r5, VERDICT item 5): each frame's
        # device->host fetch STARTS at dispatch time on a reader pool and
        # a dedicated publisher thread emits frames in order, so the VRT
        # never blocks in np.asarray. exp26 measured the event frame's
        # latency as wait (median ~36 ms: the VRT stuck in a stale
        # frame's readback when the key lands) + ~105 ms tunnel RTT
        # floor; this removes the wait term — the VRT sees the keypress
        # within ~1 ms and the preview/full dispatch overlaps the stale
        # readback instead of queueing behind it.
        self._readback_pool = ThreadPoolExecutor(
            max_workers=2, thread_name_prefix="RB")
        self._pending = collections.deque()
        self._pending_cv = threading.Condition()
        self._rebuild_pool = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="SRT")
        self._build_in_flight = threading.Event()
        self._frame_number = 0
        self.on_scene_swapped: Optional[Callable[[], None]] = None
        # Most recent keypress->frame latency (ms), None until the first
        # user event's frame publishes (VERDICT r3 item 5 observability).
        # last_event_frame keeps the whole tagged FrameData: the frame
        # mailbox is drain-to-latest, so a latency-tagged frame can be
        # overwritten before a consumer sees it.
        self.last_input_latency_ms: Optional[float] = None
        self.last_event_frame: Optional[FrameData] = None

    # --- submission API (UI thread side) -----------------------------------

    def submit_camera_update(self, uniforms) -> None:
        self._camera_box.put(uniforms)

    def submit_scene(self, device_scene) -> None:
        """Swap in an already-built device scene."""
        self._scene_box.put(device_scene)

    def rebuild_scene_async(self, scene: Scene,
                            on_done: Optional[Callable] = None):
        """Snapshot + background build + swap (the SRT path,
        VulkanApp.rebuildSceneAsync, :242-304). Returns the future."""
        if self._build_in_flight.is_set():
            _log_srt.info("rebuild already in flight; skipping")
            return None
        self._build_in_flight.set()
        snapshot = scene.create_snapshot()

        def work():
            t0 = time.perf_counter()
            try:
                with self.profiler.stage("build"):
                    if self._device_builder is not None:
                        built = self._device_builder.build(snapshot)
                    elif self.cfg.kernel == "packet":
                        built = build_fast_scene(snapshot)
                    else:
                        built = build_gpu_scene(snapshot)
                self._scene_box.put(built)
                _log_srt.info("rebuild done in %.1f ms",
                              (time.perf_counter() - t0) * 1e3)
                return built
            except Exception:
                _log_srt.exception("scene rebuild failed; keeping old scene")
                raise
            finally:
                self._build_in_flight.clear()
                if on_done is not None:
                    on_done()

        return self._rebuild_pool.submit(work)

    @property
    def build_in_progress(self) -> bool:
        """UI pauses accumulation while true (VulkanApp.java:199-208)."""
        return self._build_in_flight.is_set()

    # --- frame consumption (UI thread side) ---------------------------------

    def latest_frame(self) -> Optional[FrameData]:
        frame, fresh = self._frame_box.take()
        return frame if fresh else None

    # --- lifecycle -----------------------------------------------------------

    def start(self) -> None:
        if self._running:
            return
        self._running = True
        self._thread = threading.Thread(target=self._main_loop, name="VRT",
                                        daemon=True)
        self._publisher = threading.Thread(target=self._publish_loop,
                                           name="PUB", daemon=True)
        self._thread.start()
        self._publisher.start()

    def stop(self, timeout: float = 5.0) -> None:
        self._running = False
        with self._pending_cv:
            self._pending_cv.notify_all()
        if self._thread is not None:
            self._thread.join(timeout)
            if self._thread.is_alive():
                _log_vrt.warning("render thread did not stop in %.1fs",
                                 timeout)
        if self._publisher is not None:
            # The publisher drains the in-flight tail before exiting, so
            # the last submitted frame is never lost.
            self._publisher.join(timeout)
            if self._publisher.is_alive():
                _log_vrt.warning("publisher did not stop in %.1fs", timeout)
        self._rebuild_pool.shutdown(wait=False)
        self._readback_pool.shutdown(wait=False)

    # --- the render loop (VRT) ----------------------------------------------

    def _main_loop(self) -> None:
        _log_vrt.info("render thread started")
        scene = None
        cam = None
        accum = None
        accum_p = None  # preview-resolution accumulator (ladder)
        # Pipelined dispatch (depth RAYTPU_PIPELINE, default 2 frames in
        # flight): frame N is enqueued on the device before frame
        # N-depth's pixels are fetched, so by publish time that frame's
        # compute certainly finished and the readback costs only the
        # host copy (never a device wait) — replacing the reference's
        # submit + blocking fence-wait + copy per frame
        # (VulkanEngine.java:410-426). Depth 1 = the old double buffer.
        # Interactive (ladder) sessions default to depth 1: readback still
        # overlaps the next dispatch, but at most one full-res frame can sit
        # on the device queue ahead of a keypress preview. Benches and
        # headless runs keep depth 2 for max device occupancy.
        default_depth = "1" if self._preview is not None else "2"
        depth = max(1, int(os.environ.get("RAYTPU_PIPELINE", default_depth)))
        last_fc = 0
        pending_event_t = None  # keypress time awaiting its first frame
        last_event_t = None     # latest user-action stamp already seen
        try:
            while self._running:
                new_scene, scene_fresh = self._scene_box.take()
                if scene_fresh:
                    # Let the publisher flush in-flight frames, then swap.
                    self._drain_pending()
                    scene = new_scene
                    accum = None  # scene swap resets accumulation buffers
                    accum_p = None
                    if self.on_scene_swapped is not None:
                        self.on_scene_swapped()
                new_cam, cam_fresh = self._camera_box.take()
                if cam_fresh:
                    cam = new_cam
                    # Latency over throughput when the user DID something:
                    # drop every in-flight (stale) frame so the first
                    # new-state frame isn't queued behind full-res
                    # readbacks (exp26: ~1 s keypress-to-frame otherwise).
                    # "Did something" = the accumulation counter went
                    # BACKWARD (every key/edit/sky event resets it to 0;
                    # the UI also submits uniforms every 16 ms tick with a
                    # growing counter — those must NOT drop frames, or
                    # full-res publishes starve: each loop iteration would
                    # clear the frame the previous one rendered).
                    fc_now = self._host_fc(cam)
                    # A user action is detected by its timestamp changing
                    # (ViewerApp attaches `event_t` to the uniforms). The
                    # counter-went-backward check is the fallback for
                    # hand-built uniforms without the stamp — alone it can
                    # MISS an event: the UI tick may increment the counter
                    # (0 -> 1+) between the keypress and the VRT's next
                    # mailbox take, so fc never appears to go backward.
                    ev = getattr(cam, "event_t", None)
                    if ev is not None and ev != last_event_t:
                        last_event_t = ev
                        self._clear_pending()
                        pending_event_t = float(ev)
                    elif ev is None and fc_now < last_fc:
                        self._clear_pending()
                        pending_event_t = time.perf_counter()
                    last_fc = fc_now

                if scene is None or cam is None:
                    time.sleep(0.016)  # idle until scene+camera arrive
                    continue

                # Backpressure: previews wait for a fully drained pipe
                # (they exist to minimize latency, not throughput); full
                # frames run up to `depth` ahead of the publisher. The
                # wait is a short poll so mailbox events stay live.
                fc = self._host_fc(cam)
                preview = (self._preview is not None
                           and fc < self._ladder_frames)
                with self._pending_cv:
                    room = len(self._pending) <= (0 if preview else depth)
                if not room:
                    time.sleep(0.001)
                    continue

                try:
                    t0 = time.perf_counter()
                    if preview:
                        if accum_p is None:
                            accum_p = self._preview.new_accumulator()
                        with self.profiler.stage("dispatch"):
                            accum_p, image, stats = self._preview.render(
                                scene, cam, accum_p)
                    else:
                        if accum is None:
                            # frame_count == 0 overwrites the buffer anyway
                            # (accum*0 + sample): no reset on camera events.
                            accum = self.renderer.new_accumulator()
                        cam_r = cam
                        if self._preview is not None:
                            # Shift the counter so the first full-res frame
                            # after a preview burst overwrites the buffer.
                            cam_r = dataclasses.replace(
                                cam, frame_count=np.int32(
                                    max(0, fc - self._ladder_frames)))
                        with self.profiler.stage("dispatch"):
                            accum, image, stats = self.renderer.render(
                                scene, cam_r, accum)
                    # Device->host fetch starts NOW, on the reader pool;
                    # the publisher emits it in order when it completes.
                    fut = self._readback_pool.submit(np.asarray, image)
                    with self._pending_cv:
                        self._pending.append((fut, stats, t0, preview,
                                              pending_event_t))
                        self._pending_cv.notify_all()
                    pending_event_t = None
                except Exception:
                    _log_vrt.exception("render step failed; continuing")
                    self._clear_pending()
                    time.sleep(0.1)
        finally:
            _log_vrt.info("render thread exiting")

    def _publish_loop(self) -> None:
        """Publisher thread: pop in-order, wait the readback, publish.
        Exits once stopped AND drained (the stop() flush guarantee)."""
        _log_vrt.info("publisher thread started")
        try:
            while True:
                with self._pending_cv:
                    while not self._pending and self._running:
                        self._pending_cv.wait(0.05)
                    if not self._pending:
                        if not self._running:
                            return
                        continue
                    entry = self._pending.popleft()
                    self._pending_cv.notify_all()  # wake VRT backpressure
                fut, stats, t0, preview, event_t = entry
                try:
                    with self.profiler.stage("readback"):
                        pixels = fut.result()
                    self._publish(pixels, stats, t0, preview, event_t)
                except Exception:
                    _log_vrt.exception("frame readback failed; continuing")
        finally:
            _log_vrt.info("publisher thread exiting")

    def _clear_pending(self) -> None:
        """Drop unpublished in-flight frames (stale after a user event).
        Their readbacks finish in the background and are discarded."""
        with self._pending_cv:
            self._pending.clear()
            self._pending_cv.notify_all()

    def _drain_pending(self, timeout: float = 30.0) -> None:
        """Wait until the publisher has emitted every in-flight frame."""
        deadline = time.monotonic() + timeout
        with self._pending_cv:
            while self._pending and time.monotonic() < deadline:
                self._pending_cv.wait(0.05)

    @staticmethod
    def _host_fc(cam) -> int:
        """Accumulation counter without a device readback: Camera.uniforms
        attaches a host mirror (``fc_host``); hand-built CameraUniforms
        without one fall back to the device fetch (a tunnel RTT — fine for
        tests/benches that submit once)."""
        fc = getattr(cam, "fc_host", None)
        if fc is None:
            fc = int(np.asarray(cam.frame_count))
        return int(fc)

    def _publish(self, pixels: np.ndarray, stats, t_submit, preview=False,
                 event_t=None) -> None:
        """Publisher-thread only (single-writer: profiler/meter/frame_box
        and the latency fields are written here and nowhere else)."""
        if preview:
            # Upscale to the full frame size so consumers see one shape.
            fy = self.cfg.height // pixels.shape[0]
            fx = self.cfg.width // pixels.shape[1]
            pixels = pixels.repeat(fy, axis=0).repeat(fx, axis=1)
        now = time.perf_counter()
        dt = (now - t_submit) * 1e3
        latency = wait = None
        if event_t is not None:
            latency = (now - event_t) * 1e3
            wait = (t_submit - event_t) * 1e3
            self.last_input_latency_ms = latency
            remember = True
        else:
            remember = False
        self._frame_number += 1
        rays = float(stats["rays_traced"])
        self.meter.tick(rays)
        frame = FrameData(
            pixels=pixels,
            frame_number=self._frame_number,
            samples=float(stats["samples"]),
            rays_traced=rays,
            render_ms=dt,
            preview=preview,
            input_latency_ms=latency,
            wait_ms=wait,
        )
        if remember:
            self.last_event_frame = frame
        self._frame_box.put(frame)
