"""Headless CLI: render, stats, checkpoint/resume."""

import json
import os

import numpy as np
import pytest

from raytracer_tpu.apps.headless import build_parser, main
from raytracer_tpu.utils import assets
from raytracer_tpu.utils.png import read_png


@pytest.fixture()
def scene_json(tmp_path):
    obj = str(tmp_path / "cube.obj")
    assets.write_obj(obj, assets.make_cube() * 6.0)
    scene = tmp_path / "scene.json"
    scene.write_text(json.dumps([{
        "model_path": obj, "display_name": "Cube",
        "position": [0, 0, 0], "scale": [1, 1, 1],
        "color": [1.0, 0.3, 0.2], "material_type": 0.0}]))
    return str(scene)


def test_headless_renders_png(tmp_path, scene_json, capsys):
    out = str(tmp_path / "out.png")
    rc = main(["--scene", scene_json, "-o", out, "--width", "32",
               "--height", "24", "--frames", "2", "--max-bounces", "2",
               "--camera", "0,2,25", "--vfov", "40", "--stats-json"])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (24, 32, 3)
    assert img.max() > 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["triangles"] == 12
    assert stats["samples"] == 2.0


def test_headless_checkpoint_resume(tmp_path, scene_json):
    out = str(tmp_path / "out.png")
    ckpt = str(tmp_path / "state.npz")
    args = ["--scene", scene_json, "-o", out, "--width", "32",
            "--height", "24", "--max-bounces", "2", "--camera", "0,2,25",
            "--vfov", "40", "--checkpoint", ckpt]
    main(args + ["--frames", "2"])
    assert int(np.load(ckpt)["frame_count"]) == 2
    main(args + ["--frames", "3"])
    assert int(np.load(ckpt)["frame_count"]) == 5

    # 2+3 resumed frames == 5 straight frames (same seeds per frame idx).
    out2 = str(tmp_path / "straight.png")
    main(["--scene", scene_json, "-o", out2, "--width", "32",
          "--height", "24", "--max-bounces", "2", "--camera", "0,2,25",
          "--vfov", "40", "--frames", "5"])
    np.testing.assert_array_equal(read_png(out), read_png(out2))


def test_parser_rejects_missing_scene():
    with pytest.raises(SystemExit):
        build_parser().parse_args([])


def test_parser_rejects_zero_frames(scene_json):
    with pytest.raises(SystemExit):
        main(["--scene", scene_json, "--frames", "0"])


def test_headless_chain_matches_unchained(tmp_path, scene_json):
    """--chain k (k frames per dispatch via lax.scan, the default for
    divisible frame budgets) must be bit-identical to sequential frames."""
    common = ["--scene", scene_json, "--width", "32", "--height", "24",
              "--max-bounces", "2", "--camera", "0,2,25", "--vfov", "40",
              "--frames", "4"]
    seq = str(tmp_path / "seq.png")
    main(common + ["-o", seq, "--chain", "1"])
    chained = str(tmp_path / "chained.png")
    main(common + ["-o", chained, "--chain", "4"])
    np.testing.assert_array_equal(read_png(seq), read_png(chained))


def test_headless_multichip_matches_single(tmp_path, scene_json):
    """--devices 8 --sp 2 on the virtual CPU mesh must produce the
    bit-identical image to the single-device run (same seeds, same
    viewport mapping; the psum-mean is exact for identical shards)."""
    common = ["--scene", scene_json, "--width", "64", "--height", "32",
              "--max-bounces", "2", "--camera", "0,2,25", "--vfov", "40",
              "--frames", "2", "--spp", "2"]
    single = str(tmp_path / "single.png")
    main(common + ["-o", single])
    meshed = str(tmp_path / "meshed.png")
    main(common + ["-o", meshed, "--devices", "8", "--sp", "2"])
    np.testing.assert_array_equal(read_png(single), read_png(meshed))
