"""Real-data readiness kit self-test: the turnkey EuRoC replay-and-gate
script (examples/euroc_gate.py) must run end-to-end on synthetic data laid
out in the EuRoC directory format and produce a passing JSON verdict."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))


@pytest.mark.slow
def test_gate_on_synthetic_euroc_layout(tmp_path):
    import euroc_gate

    seq_dir = str(tmp_path / "fake_mh01")
    euroc_gate.make_synthetic(seq_dir, frames=24, degrade=False, seed=3)
    assert os.path.exists(os.path.join(seq_dir, "mav0", "cam0", "data"))
    out = str(tmp_path / "verdict.json")
    v = euroc_gate.run_gate(
        os.path.join(seq_dir, "settings.yaml"), seq_dir,
        os.path.join(seq_dir, "groundtruth_tum.txt"),
        gate_m=0.12, vocab_name="", max_frames=0, out_path=out)
    assert v["pass"], v
    assert v["tracked_frac"] > 0.8
    with open(out) as f:
        assert json.load(f)["ate_rmse_m"] == v["ate_rmse_m"]


@pytest.mark.slow
def test_gate_on_degraded_synthetic(tmp_path):
    """The harder stand-in profile: exposure jitter + noise + motion blur +
    occluders.  The system must still track and meet a looser gate."""
    import euroc_gate

    seq_dir = str(tmp_path / "fake_hard")
    euroc_gate.make_synthetic(seq_dir, frames=24, degrade=True, seed=3)
    v = euroc_gate.run_gate(
        os.path.join(seq_dir, "settings.yaml"), seq_dir,
        os.path.join(seq_dir, "groundtruth_tum.txt"),
        gate_m=0.25, vocab_name="", max_frames=0, out_path="")
    assert v["tracked_frac"] > 0.6, v
    assert v["ate_rmse_m"] < 0.25, v
