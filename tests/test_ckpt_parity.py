"""CI for the checkpoint-parity harness (benchmarks/checkpoint_parity.py):
a random reference-schema module3 state dict saved with torch round-trips
through BOTH loaders — io/torch_ckpt.fill_fusion_network into the JAX
graph, and the harness's independent raw-key torch/numpy mirror — and the
two pipelines must agree box for box."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_checkpoint_parity_random_sd(tmp_path):
    from benchmarks.checkpoint_parity import (
        make_random_module3_state_dict, run_parity, _synthetic_frames)
    from millieye_tpu.io.torch_ckpt import read_state_dict

    sd = make_random_module3_state_dict(img_size=64, seed=0)
    path = str(tmp_path / "module3.pth")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)
    sd2 = read_state_dict(path)
    assert set(sd2) == set(sd)

    frames = _synthetic_frames(2, 64, max_radar=8)
    rep = run_parity(sd2, frames, 64, max_radar=8)
    assert rep["ok"] and rep["frames"] == 2
    assert rep["boxes"] > 0, "no boxes compared — fixture too sparse"
