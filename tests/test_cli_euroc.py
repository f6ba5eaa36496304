"""End-to-end CLI test: synthetic frames written as an EuRoC directory tree,
driven through examples/run_slam.py stereo-euroc (dataset loader + YAML
config + rectification pass-through + tracking + trajectory export) —
the integration surface a user of the reference's stereo_euroc binary hits.
"""
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_cli_stereo_euroc_on_synthetic_tree(tmp_path):
    from PIL import Image

    from jetson_slam_tpu.io.synthetic import make_stereo_sequence

    seq = make_stereo_sequence(seed=8, n_frames=10, h=240, w=320)
    cam0 = tmp_path / "mav0" / "cam0" / "data"
    cam1 = tmp_path / "mav0" / "cam1" / "data"
    cam0.mkdir(parents=True)
    cam1.mkdir(parents=True)
    for i in range(len(seq.lefts)):
        ns = int(seq.timestamps[i] * 1e9)
        Image.fromarray(seq.lefts[i]).save(cam0 / f"{ns}.png")
        Image.fromarray(seq.rights[i]).save(cam1 / f"{ns}.png")

    yaml = tmp_path / "settings.yaml"
    yaml.write_text(f"""%YAML:1.0
Camera.fx: {seq.fx}
Camera.fy: {seq.fy}
Camera.cx: {seq.cx}
Camera.cy: {seq.cy}
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.width: 320
Camera.height: 240
Camera.bf: {seq.bf}
Camera.fps: 20.0
Camera.RGB: 1
ThDepth: 35
gpu.use_gpu: 1
ORBextractor.nLevels: 4
ORBextractor.scaleFactor: 1.2
ORBextractor.th_FAST_MIN: 20
ORBextractor.th_FAST_MAX: 20
ORBextractor.FAST_N_MIN: 9
ORBextractor.FAST_N_MAX: 16
ORBextractor.tile_h: 16
ORBextractor.tile_w: 16
ORBextractor.fixed_multi_scale_tile_size: 0
ORBextractor.apply_nms_ms: 0
ORBextractor.nms_ms_mode_gpu: 1
""")
    out = tmp_path / "traj.txt"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "run_slam.py"),
         "stereo-euroc", str(yaml), str(tmp_path), "--out", str(out)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "median tracking time" in r.stdout
    rows = [l for l in out.read_text().splitlines() if l.strip()]
    assert len(rows) >= 8, r.stdout
    # TUM format: 8 columns, monotonic timestamps
    vals = np.array([[float(x) for x in row.split()] for row in rows])
    assert vals.shape[1] == 8
    assert (np.diff(vals[:, 0]) > 0).all()
