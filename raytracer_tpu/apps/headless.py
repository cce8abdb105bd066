"""Headless renderer CLI: scene -> accumulated frames -> PNG.

Restores the reference's lost headless mode ("saved a PNG and exited",
DEVELOPMENT_LOG.md:51) as a first-class tool.

Examples:
  python -m raytracer_tpu.apps.headless --default-scene -o out.png
  python -m raytracer_tpu.apps.headless --scene scene.json --frames 64 \
      --width 1280 --height 720 --exposure 1.0 --no-sky -o out.png
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from raytracer_tpu.core.camera import Camera, default_camera
from raytracer_tpu.core.types import RenderConfig
from raytracer_tpu.engine.renderer import Renderer
from raytracer_tpu.scene.builder import build_fast_scene, build_gpu_scene
from raytracer_tpu.scene.scene import Scene, default_scene
from raytracer_tpu.utils.log import get_logger
from raytracer_tpu.utils.png import write_png

_log = get_logger("headless")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="raytracer_tpu.apps.headless",
        description="TPU path tracer, headless: render a scene to PNG.")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--scene", help="scene JSON file (Scene.save_json)")
    src.add_argument("--default-scene", action="store_true",
                     help="reference default scene (ground plane + car "
                          "slot, VulkanApp.populateDefaultScene)")
    p.add_argument("-o", "--output", default="render.png")
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--frames", type=int, default=16,
                   help="accumulation frames (progressive samples)")
    p.add_argument("--spp", type=int, default=1,
                   help="samples per pixel per frame")
    p.add_argument("--max-bounces", type=int, default=10)
    p.add_argument("--exposure", type=float, default=0.0, help="stops")
    p.add_argument("--no-sky", action="store_true")
    p.add_argument("--kernel", choices=("packet", "wavefront"),
                   default="packet")
    p.add_argument("--rng", choices=("progressive", "reference"),
                   default="progressive")
    p.add_argument("--camera", metavar="X,Y,Z",
                   help="camera origin (default: reference pose -25,30,140)")
    p.add_argument("--look-at", metavar="X,Y,Z", default="0,0,0")
    p.add_argument("--vfov", type=float, default=20.0)
    p.add_argument("--assets", help="asset search dir override")
    p.add_argument("--stats-json", action="store_true",
                   help="print a stats JSON line at the end")
    p.add_argument("--device", choices=("auto", "cpu", "tpu"),
                   default="auto",
                   help="force a JAX platform (the axon TPU plugin ignores "
                        "JAX_PLATFORMS, so this uses the config knob)")
    p.add_argument("--devices", type=int, default=0,
                   help="render on an N-device (dp x sp) mesh via "
                        "shard_map (0 = single device). Pair with "
                        "--device cpu and XLA_FLAGS="
                        "--xla_force_host_platform_device_count=N to "
                        "validate sharding without hardware")
    p.add_argument("--sp", type=int, default=1,
                   help="sample-parallel mesh axis (devices = dp * sp; "
                        "--spp must be divisible by sp)")
    p.add_argument("--checkpoint", metavar="FILE.npz",
                   help="save the accumulation state here at the end; if "
                        "the file exists, resume from it (render N more "
                        "frames on top)")
    p.add_argument("--chain", type=int, default=0,
                   help="progressive frames per device dispatch "
                        "(engine/renderer.render_chain; bit-identical to "
                        "sequential frames, amortizes per-dispatch tunnel "
                        "overhead). 0 = auto (largest of 8/4/2 dividing "
                        "--frames), 1 = off")
    return p


def apply_device_flag(device: str) -> None:
    if device == "auto":
        return
    import jax

    jax.config.update("jax_platforms",
                      "cpu" if device == "cpu" else "tpu,axon")


def _parse_vec(s: str):
    return tuple(float(x) for x in s.split(","))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.frames < 1:
        build_parser().error("--frames must be >= 1")
    if args.devices and args.spp % args.sp:
        build_parser().error("--spp must be divisible by --sp")
    if args.devices:
        # Multi-device meshes on the host platform need the virtual-device
        # flag set before backend init.
        import os as _o

        flags = _o.environ.get("XLA_FLAGS", "")
        if ("xla_force_host_platform_device_count" not in flags
                and args.device == "cpu"):
            _o.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{args.devices}").strip()
    apply_device_flag(args.device)

    if args.assets:
        import os

        os.environ["RAYTPU_ASSETS"] = args.assets

    if args.default_scene:
        scene_graph = default_scene(asset_dir=args.assets or
                                    "/root/reference/objects")
    else:
        scene_graph = Scene.load_json(args.scene)

    cfg = RenderConfig(width=args.width, height=args.height,
                       max_bounces=args.max_bounces,
                       samples_per_pixel=args.spp,
                       kernel=args.kernel, rng_mode=args.rng)

    t0 = time.perf_counter()
    snapshot = scene_graph.create_snapshot()
    if cfg.kernel == "packet":
        device_scene = build_fast_scene(snapshot)
    else:
        device_scene = build_gpu_scene(snapshot)
    build_ms = (time.perf_counter() - t0) * 1e3

    if args.camera:
        cam = Camera(origin=_parse_vec(args.camera),
                     look_at=_parse_vec(args.look_at),
                     vfov_deg=args.vfov,
                     aspect_ratio=args.width / args.height)
    else:
        cam = default_camera(args.width, args.height)

    if args.devices:
        from raytracer_tpu.parallel.sharding import MeshRenderer, make_mesh

        mesh = make_mesh(n_devices=args.devices, sp=args.sp)
        renderer = MeshRenderer(cfg, mesh=mesh)
        device_scene = renderer.prepare_scene(device_scene)
    else:
        renderer = Renderer(cfg)
    # Checkpoint/resume: the accumulation buffer + frame counter persist
    # across runs (the capability the reference lost with headless mode,
    # DEVELOPMENT_LOG.md:51 — extended to progressive-render resume).
    accum = None
    start_frame = 0
    import os as _os

    if args.checkpoint and _os.path.exists(args.checkpoint):
        ckpt = np.load(args.checkpoint)
        if tuple(ckpt["accum"].shape) == (args.height, args.width, 3):
            import jax.numpy as jnp

            accum = jnp.asarray(ckpt["accum"])
            start_frame = int(ckpt["frame_count"])
            _log.info("resumed %s at frame %d", args.checkpoint,
                      start_frame)
        else:
            _log.warning("checkpoint resolution mismatch; starting fresh")

    chain = args.chain
    if chain <= 0:  # auto: chain when it divides the frame budget
        chain = next((k for k in (8, 4, 2) if args.frames % k == 0), 1)
    if args.devices:
        chain = 1  # MeshRenderer steps frame-by-frame

    t0 = time.perf_counter()
    stats = {}
    for f in range(start_frame, start_frame + args.frames, chain):
        cam.frame_count = f
        uniforms = cam.uniforms(sky_enabled=not args.no_sky,
                                exposure=args.exposure)
        if chain > 1:
            accum, image, stats = renderer.render_chain(
                device_scene, uniforms, accum, chain)
        else:
            accum, image, stats = renderer.render(device_scene, uniforms,
                                                  accum)
    pixels = np.asarray(image)
    render_s = time.perf_counter() - t0

    write_png(args.output, pixels)
    _log.info("wrote %s", args.output)
    if args.checkpoint:
        np.savez(args.checkpoint, accum=np.asarray(accum),
                 frame_count=start_frame + args.frames)

    if args.stats_json:
        print(json.dumps({
            "output": args.output,
            "resolution": f"{args.width}x{args.height}",
            "triangles": int(np.asarray(device_scene.num_triangles)),
            "frames": args.frames,
            "samples": float(stats["samples"]),
            "build_ms": round(build_ms, 1),
            "render_s": round(render_s, 3),
            "fps": round(args.frames / render_s, 3),
            "mrays_per_s": round(
                float(stats["rays_traced"]) * args.frames / render_s / 1e6,
                3),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
