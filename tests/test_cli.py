"""CLI smoke tests: argument parsing + tiny end-to-end eval run."""
import os
import pickle

import numpy as np
import pytest


def test_train_cli_parses():
    from millieye_tpu.cli.train import parse_args
    a = parse_args(["--stage", "fusion", "--data_root", "x",
                    "--illumination", "H", "L", "--test_list", "2"])
    assert a.stage == "fusion" and a.test_list == 2
    assert a.illumination == ["H", "L"]
    assert a.grad_accum == 2          # reference cadence default


def test_evaluate_cli_parses():
    from millieye_tpu.cli.evaluate import parse_args
    a = parse_args(["--what", "fusion", "--weights", "w.npz",
                    "--model_mode", "3"])
    assert a.model_mode == 3


def test_demo_cli_parses():
    from millieye_tpu.cli.demo import parse_args
    a = parse_args(["--recording", "r", "--calib", "c.yaml"])
    assert a.refine_threshold_radar == pytest.approx(0.56)


def _write_fusion_dataset(root, n=4, img=64):
    """Minimal our_dataset layout for RadarFusionDataset."""
    from PIL import Image
    rng = np.random.default_rng(0)
    for sub in ("image", "label", "radar_box", "radar_point"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    stems = []
    for i in range(n):
        # stem "H0-xxx": illumination H, scene 0 (datasets.py fold logic)
        stem = f"H{i % 2}-{i:03d}"
        Image.fromarray((rng.uniform(size=(img, img, 3)) * 255).astype(
            np.uint8)).save(os.path.join(root, "image", stem + ".jpg"))
        with open(os.path.join(root, "label", stem + ".txt"), "w") as f:
            f.write("0 0.5 0.5 0.4 0.4\n")
        with open(os.path.join(root, "radar_box", stem + ".pkl"), "wb") as f:
            pickle.dump(np.array([[5.0, 5.0, 40.0, 50.0]]), f)
        with open(os.path.join(root, "radar_point", stem + ".pkl"),
                  "wb") as f:
            pickle.dump(rng.uniform(0, img, size=(6, 4)), f)
        stems.append(stem)
    with open(os.path.join(root, "dataset.txt"), "w") as f:
        for s in stems:
            f.write(s + "\n")
    return stems


def test_fusion_dataset_and_loader(tmp_path):
    from millieye_tpu.data.datasets import RadarFusionDataset
    from millieye_tpu.data.loader import DataLoader, PaddedCollate
    from millieye_tpu.train.recipes import fusion_device_batch

    root = str(tmp_path / "ds")
    _write_fusion_dataset(root)
    ds = RadarFusionDataset(root, "train", ("H",), test_list=0)
    assert len(ds) == 2               # scene 0 held out
    loader = DataLoader(ds, 2, PaddedCollate(64, max_radar=4, max_points=16))
    batches = list(loader)
    assert len(batches) == 1
    b = fusion_device_batch(batches[0], 64)
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["radar_maps"].shape == (2, 4, 4, 3)
    assert b["radar_boxes"].shape == (2, 4, 4)
    assert bool(b["rmask"][0, 0])


def test_loader_propagates_worker_errors(tmp_path):
    """Producer-thread exceptions must surface, not end iteration quietly."""
    from millieye_tpu.data.loader import DataLoader, PaddedCollate

    class Broken:
        def __len__(self):
            return 4

        def get(self, idx):
            raise RuntimeError("boom")

    loader = DataLoader(Broken(), 2, PaddedCollate(64))
    with pytest.raises(RuntimeError, match="boom"):
        list(loader)


def test_train_cli_synthetic_stage1(tmp_path):
    """--synthetic N drives stage-1 training end-to-end from the CLI."""
    from millieye_tpu.cli.train import main
    main(["--stage", "yolo", "--synthetic", "4", "--epochs", "1",
          "--batch_size", "2", "--img_size", "128",
          "--checkpoint_dir", str(tmp_path)])
    import os
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))


@pytest.mark.slow
def test_train_cli_fusion_fold_frozen(tmp_path):
    """--fold_frozen arms the folded-darknet + Pallas-stem training
    forward (train/steps.py fold_frozen; interpret-mode kernels on CPU)
    and trains stage 3 end-to-end from the CLI."""
    from millieye_tpu.cli.train import main
    main(["--stage", "fusion", "--synthetic", "4", "--epochs", "1",
          "--batch_size", "2", "--img_size", "128", "--fold_frozen",
          "--checkpoint_dir", str(tmp_path)])
    assert any(f.endswith(".npz") for f in os.listdir(tmp_path))
