"""exp38: headless --chain A/B on the flagship-class scene (real TPU).

VERDICT r5 item 7: headless accumulation workloads should default to
chunked chains (render_chain) for the dispatch/tunnel-overhead saving
measured on c12 (1.51x) — price it on a DEEP frame. Each arm runs
headless.main twice with identical args in one process: the first run
pays the jit compile, the second is the measured (warm) arm. The
measured number is the warm run's --stats-json `fps` (render_s starts
AFTER the host build, apps/headless.py:185), NOT wall clock — the v1
wall-clock harness was dominated by the ~10 s host SAH build per
invocation and measured nothing (r5b cell, 2026-08-21).

Run from the repo root on the TPU: python experiments/exp38_headless_chain.py
"""
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCENE = [
    {"model_path": "/root/reference/objects/ground_plane.obj",
     "display_name": "ground", "position": [0, -10, 0],
     "scale": [150, 1, 150], "color": [0.5, 0.5, 0.5],
     "material_type": 0.0},
    {"model_path": "/root/reference/objects/FinalBaseMesh.obj",
     "display_name": "body", "position": [0, -10, 0], "scale": [2, 2, 2],
     "color": [0.6, 0.7, 0.1], "material_type": 1.0},
]

FRAMES = int(os.environ.get("EXP38_FRAMES", "32"))


def _run(headless_main, args):
    """Run headless_main capturing its --stats-json line; return stats."""
    buf = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stdout(buf):
        rc = headless_main(args)
    wall = time.perf_counter() - t0
    assert rc == 0, buf.getvalue()
    line = [l for l in buf.getvalue().splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    stats["wall_s"] = round(wall, 2)
    return stats


def main():
    import tempfile

    from raytracer_tpu.apps.headless import main as headless_main

    td = tempfile.mkdtemp()
    scene = os.path.join(td, "scene.json")
    with open(scene, "w") as f:
        json.dump(SCENE, f)

    results = {}
    for chain in (1, 8):
        args = ["--scene", scene, "--frames", str(FRAMES),
                "--chain", str(chain), "--stats-json",
                "-o", os.path.join(td, f"c{chain}.png")]
        cold = _run(headless_main, args)   # pays jit compile
        warm = _run(headless_main, args)   # the measured arm
        results[chain] = warm["fps"]
        print(f"chain={chain}: cold wall {cold['wall_s']}s, warm render "
              f"{warm['render_s']}s = {warm['fps']} FPS over {FRAMES} "
              f"frames (build {warm['build_ms']} ms)", flush=True)
    print({"chain1_fps": results[1], "chain8_fps": results[8],
           "speedup": round(results[8] / results[1], 3)}, flush=True)


if __name__ == "__main__":
    main()
