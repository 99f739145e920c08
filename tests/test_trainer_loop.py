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


def test_yolo_and_refine_training_loops(tmp_path):
    """Stage-1 (YOLO) and stage-2 (refine) epoch loops on a tiny list
    dataset (module2_mixed/train.py phases)."""
    from PIL import Image
    import numpy as np
    from millieye_tpu.data.datasets import ImageListDataset
    from millieye_tpu.models.fusion import RefineNetwork

    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    os.makedirs(lbl_dir)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        p = img_dir / f"{i}.jpg"
        os.makedirs(img_dir, exist_ok=True)
        Image.fromarray((rng.uniform(size=(S, S, 3)) * 255).astype(
            np.uint8)).save(p)
        (lbl_dir / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        lines.append(str(p))
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(lines) + "\n")

    ds = ImageListDataset(str(lst))
    loader = DataLoader(ds, 2, PaddedCollate(S, max_targets=8),
                        num_workers=1)
    batch_fn = lambda b: recipes.fusion_device_batch(b, S)

    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    p0, s0 = darknet.init(jax.random.PRNGKey(0))
    t1 = recipes.yolo_trainer(darknet, p0, s0, str(tmp_path / "c1"),
                              every_k=1)
    ts1 = t1.fit(loader, 1, jax.random.PRNGKey(1), batch_fn)
    assert int(ts1.step) == len(loader)

    rmodel = RefineNetwork(darknet, FusionConfig(
        conf_thresh=0.05, class_num=12, max_det=8, pre_nms_top_k=32,
        loss_variant="module2", loss_lambda=(15.0, 5.0)))
    rp, rs = rmodel.init(jax.random.PRNGKey(2))
    # the trainer donates its state buffers — snapshot before training
    dark0 = [np.array(x) for x in jax.tree.leaves(rp["darknet"])]
    t2 = recipes.refine_trainer(rmodel, rp, rs, str(tmp_path / "c2"),
                                every_k=1)
    ts2 = t2.fit(loader, 1, jax.random.PRNGKey(3), batch_fn)
    # stage 2: darknet untouched
    for a, b in zip(dark0, jax.tree.leaves(ts2.params["darknet"])):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_evaluate_cli_end_to_end(tmp_path):
    """`evaluate --what fusion` over a synthetic dataset + npz weights."""
    from test_cli import _write_fusion_dataset
    from millieye_tpu.io.checkpoint import save_checkpoint
    from millieye_tpu.cli import evaluate as eval_cli

    root = str(tmp_path / "ds")
    _write_fusion_dataset(root, n=4, img=S)
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=8, max_radar=4, pre_nms_top_k=32))
    params, state = model.init(jax.random.PRNGKey(0))
    w = str(tmp_path / "w.npz")
    save_checkpoint(w, {"params": params, "state": state})

    m_ap = eval_cli.main([
        "--what", "fusion", "--weights", w, "--data_root", root,
        "--img_size", str(S), "--conf_thresh", "0.05", "--batch_size", "2",
        "--illumination", "H", "--test_list", "0", "--model_mode", "0",
    ])
    assert m_ap is None or 0.0 <= m_ap <= 1.0


def test_three_stage_workflow(tmp_path):
    """The reference's full recipe in miniature: stage-1 YOLO -> stage-2
    refine (frozen YOLO) -> native module2->module3 transfer -> stage-3
    fusion training with the transferred subtrees frozen."""
    import numpy as np
    from test_cli import _write_fusion_dataset
    from millieye_tpu.models.fusion import RefineNetwork
    from millieye_tpu.train.recipes import transfer_module2_to_fusion
    from millieye_tpu.train import frozen_adam, STAGE3_FROZEN
    from millieye_tpu.train.steps import (init_train_state,
                                          make_fusion_train_step)

    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    rmodel = RefineNetwork(darknet, FusionConfig(
        conf_thresh=0.05, class_num=12, max_det=8, pre_nms_top_k=32,
        loss_variant="module2", loss_lambda=(15.0, 5.0)))
    rp, rs = rmodel.init(jax.random.PRNGKey(0))

    fmodel = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=8, max_radar=4, pre_nms_top_k=32))
    fp, fs = fmodel.init(jax.random.PRNGKey(1))
    fp2, fs2 = transfer_module2_to_fusion(rp, rs, fp, fs)
    # transferred leaves identical; radar branch untouched
    for a, b in zip(jax.tree.leaves(rp["fcn"]),
                    jax.tree.leaves(fp2["img_cnn"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(fp["radar_enc"][0]["w"]),
        np.asarray(fp2["radar_enc"][0]["w"]))

    # one stage-3 step: transferred subtrees stay bit-identical
    tx = frozen_adam(fp2, lr=1e-3, frozen_prefixes=STAGE3_FROZEN)
    ts = init_train_state(fp2, fs2, tx)
    step = jax.jit(make_fusion_train_step(fmodel, tx))
    rng2 = np.random.default_rng(3)
    rb = np.zeros((2, 4, 4), np.float32)
    rb[..., :2] = rng2.uniform(0.1, 0.5, (2, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    tg = np.zeros((2, 5, 5), np.float32)
    tg[..., 1:3] = rng2.uniform(0.3, 0.7, (2, 5, 2))
    tg[..., 3:5] = 0.2
    batch = {"images": rng2.uniform(size=(2, S, S, 3)).astype(np.float32),
             "radar_maps": rng2.uniform(size=(2, S // 16, S // 16, 3)).astype(
                 np.float32),
             "radar_boxes": rb, "rmask": np.ones((2, 4), bool),
             "targets": tg, "tmask": np.ones((2, 5), bool)}
    img_cnn0 = [np.array(x) for x in jax.tree.leaves(fp2["img_cnn"])]
    net0_0 = np.array(fp2["refine"]["net0"]["w"])
    ts2, metrics = step(ts, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(metrics["loss"]))
    for a, b in zip(img_cnn0, jax.tree.leaves(ts2.params["img_cnn"])):
        np.testing.assert_array_equal(a, np.asarray(b))
    np.testing.assert_array_equal(net0_0,
                                  np.asarray(ts2.params["refine"]["net0"]["w"]))
