"""exp24: where does the per-frame host gap come from?

The timed bench loop is fully async (one readback after N frames), yet
wall/frame exceeds device/frame by ~10 ms in fast worker phases (round-2
trace; parse_trace busy% is ~98 within the device span). Candidate: the
per-frame `cam.uniforms()` rebuild — fresh NumPy scalars every frame mean
one host->device transfer batch per dispatch, each paying tunnel RTT.

A/B on the flagship frame, same code path as bench.py:
  A fresh-uniforms : cam.uniforms() per frame (bench today)
  B pre-put        : all N uniform pytrees device_put BEFORE the clock
                     (what a device-resident frame counter would achieve)

If B ~= A the gap is dispatch bookkeeping, not transfers; if B is
meaningfully faster, move the frame counter on-device (AccumState).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main():
    import jax  # noqa: E402

    from __graft_entry__ import _flagship_scene  # noqa: E402
    from raytracer_tpu.core.camera import default_camera  # noqa: E402
    from raytracer_tpu.core.types import RenderConfig  # noqa: E402
    from raytracer_tpu.engine.renderer import Renderer  # noqa: E402

    w, h, frames = 1280, 720, 12
    scene = _flagship_scene()
    cfg = RenderConfig(width=w, height=h, max_bounces=10, kernel="packet")
    r = Renderer(cfg)
    cam = default_camera(w, h)

    # Warm up / compile.
    accum, img, _ = r.render(scene, cam.uniforms())
    np.asarray(img)

    def run(uniform_seq, label):
        nonlocal accum
        t0 = time.perf_counter()
        img = None
        for u in uniform_seq:
            accum, img, _ = r.render(scene, u, accum)
        np.asarray(img)
        dt = (time.perf_counter() - t0) / len(uniform_seq) * 1e3
        print(f"[{label}] {dt:.1f} ms/frame")
        return dt

    for trial in range(3):
        # A: fresh NumPy uniforms per frame (bench.py today).
        seq_a = []
        for _ in range(frames):
            cam.increment_frame_count()
            seq_a.append(cam.uniforms())
        a = run(seq_a, f"A fresh-uniforms t{trial}")

        # B: same uniforms, device-resident before the clock.
        seq_b = []
        for _ in range(frames):
            cam.increment_frame_count()
            seq_b.append(jax.device_put(cam.uniforms()))
        jax.block_until_ready(jax.tree.leaves(seq_b[-1]))
        b = run(seq_b, f"B pre-put       t{trial}")
        print(f"  trial {trial}: B/A = {b / a:.3f}")


if __name__ == "__main__":
    main()
