"""End-to-end epoch loop: dataset -> loader -> trainer -> checkpoint ->
resume -> eval harness (small shapes, CPU)."""
import os
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.data.datasets import RadarFusionDataset
from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.train import recipes
from millieye_tpu.eval import harness

S = 64


def test_fusion_training_loop_and_eval(tmp_path):
    from test_cli import _write_fusion_dataset
    root = str(tmp_path / "ds")
    _write_fusion_dataset(root, n=6, img=S)

    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=8, max_radar=4, pre_nms_top_k=32))
    params, state = model.init(jax.random.PRNGKey(0))

    trainer = recipes.fusion_trainer(model, params, state,
                                     str(tmp_path / "ckpt"), every_k=1,
                                     viz=True)
    trainer.viz_every = 2
    ds = RadarFusionDataset(root, "train", ("H",), test_list=0)
    loader = DataLoader(ds, 2, PaddedCollate(S, max_targets=8, max_radar=4,
                                             max_points=16), num_workers=1)
    ts = trainer.fit(loader, epochs=2, rng=jax.random.PRNGKey(1),
                     batch_fn=lambda b: recipes.fusion_device_batch(b, S))
    assert int(ts.step) == 2 * len(loader)
    ckpt0 = os.path.join(str(tmp_path / "ckpt"), "module3_ckpt_0.npz")
    assert os.path.exists(ckpt0)
    # metrics were logged
    log = os.path.join(str(tmp_path / "ckpt"), "logs", "metrics.jsonl")
    assert os.path.exists(log)
    # image summaries (radar maps + attention grids) were dumped
    pngs = [f for f in os.listdir(os.path.join(str(tmp_path / "ckpt"),
                                               "logs"))
            if f.endswith(".png")]
    assert pngs

    # resume restores exactly
    trainer2 = recipes.fusion_trainer(model, params, state,
                                      str(tmp_path / "ckpt2"))
    trainer2.resume(trainer.save("final"))
    for a, b in zip(jax.tree.leaves(trainer.ts.params),
                    jax.tree.leaves(trainer2.ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval harness over the held-out fold runs end to end
    test_ds = RadarFusionDataset(root, "test", ("H",), test_list=0)
    test_loader = DataLoader(test_ds, 2,
                             PaddedCollate(S, max_targets=8, max_radar=4,
                                           max_points=16), num_workers=1)
    batches = [recipes.fusion_device_batch(b, S) for b in test_loader]
    result = harness.evaluate_fusion(model, trainer.ts.params,
                                     trainer.ts.state, iter(batches), mode=0)
    table, m_ap = harness.summarize(result)
    assert 0.0 <= m_ap <= 1.0
    # PR-curve artifact writes when there are detections
    harness.save_pr_curve(result, str(tmp_path / "pr.jpg"))


def test_demo_cli_end_to_end(tmp_path):
    from test_runtime import _write_recording, FRAME, CALIB
    rec = str(tmp_path / "rec")
    _write_recording(rec, n_frames=3)
    calib_yaml = tmp_path / "calib.yaml"
    calib_yaml.write_text(
        "camera_matrix:\n  data: [40.0, 0.0, 32.0, 0.0, 40.0, 24.0, "
        "0.0, 0.0, 1.0]\n"
        "distortion_coefficients:\n  data: [0.0, 0.0, 0.0, 0.0, 0.0]\n")
    out_dir = str(tmp_path / "frames_out")

    from millieye_tpu.cli import demo
    report = demo.main([
        "--recording", rec, "--calib", str(calib_yaml),
        "--img_size", "64", "--frame_w", str(FRAME[0]),
        "--frame_h", str(FRAME[1]), "--save_dir", out_dir,
    ])
    assert report["e2e_fps"] > 0
    assert len(os.listdir(out_dir)) == 3
