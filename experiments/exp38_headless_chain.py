"""exp38: headless --chain A/B on the flagship-class scene (real TPU).

VERDICT r5 item 7: headless accumulation workloads should default to
chunked chains (render_chain) for the dispatch/tunnel-overhead saving
measured on c12 (1.51x) — price it on a DEEP frame. Each arm runs
headless.main twice with identical args in one process: the first run
pays the jit compile, the second is the measured (warm) number.

Run from the repo root on the TPU: python experiments/exp38_headless_chain.py
"""
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


def main():
    import tempfile

    from raytracer_tpu.apps.headless import main as headless_main

    td = tempfile.mkdtemp()
    scene = os.path.join(td, "scene.json")
    with open(scene, "w") as f:
        json.dump(SCENE, f)

    results = {}
    for chain in (1, 8):
        args = ["--scene", scene, "--frames", "16", "--chain", str(chain),
                "-o", os.path.join(td, f"c{chain}.png")]
        t0 = time.perf_counter()
        headless_main(args)  # cold: pays compile
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        headless_main(args)  # warm: the measured arm
        warm = time.perf_counter() - t0
        fps = 16 / warm
        results[chain] = fps
        print(f"chain={chain}: cold {cold:.1f}s, warm {warm:.2f}s "
              f"= {fps:.2f} FPS over 16 frames", flush=True)
    print({"chain1_fps": round(results[1], 3),
           "chain8_fps": round(results[8], 3),
           "speedup": round(results[8] / results[1], 3)}, flush=True)


if __name__ == "__main__":
    main()
