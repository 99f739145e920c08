"""Dataset reader tests (synthetic on-disk layouts)."""
import os

import numpy as np
import pytest
from PIL import Image

from millieye_tpu.data.datasets import (ImageListDataset, ExDarkDataset,
                                        EXDARK_NAMES)
from millieye_tpu.collection.prepare import prepare_dataset
from millieye_tpu.radar.pipeline import RadarParams


def _save_img(path, w=64, h=48, seed=0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray((rng.uniform(size=(h, w, 3)) * 255).astype(
        np.uint8)).save(path)


def test_image_list_dataset(tmp_path):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    os.makedirs(lbl_dir)
    _save_img(str(img_dir / "a.jpg"))
    (lbl_dir / "a.txt").write_text("2 0.5 0.5 0.5 0.5\n")
    lst = tmp_path / "train.txt"
    lst.write_text(str(img_dir / "a.jpg") + "\n")

    ds = ImageListDataset(str(lst))
    assert len(ds) == 1
    item = ds.get(0)
    # letterboxed square
    assert item["image"].shape[0] == item["image"].shape[1]
    t = item["targets"]
    assert t.shape == (1, 5) and t[0, 0] == 2
    # normalized cx stays 0.5 after symmetric pad
    assert t[0, 1] == pytest.approx(0.5, abs=0.02)
    # w=0.5 of 64px = 32px over the padded 64 square -> still 0.5
    assert t[0, 3] == pytest.approx(0.5, abs=0.02)
    # h=0.5 of 48px = 24px over 64 -> 0.375
    assert t[0, 4] == pytest.approx(24 / 64, abs=0.02)


def test_exdark_dataset(tmp_path):
    root = tmp_path
    cdir = EXDARK_NAMES[0]            # class-1 directory
    _save_img(str(root / "Img" / cdir / "x.jpg"))
    os.makedirs(root / "Label" / cdir)
    (root / "Label" / cdir / "x.jpg.txt").write_text(
        "% bbGt version=3\nBicycle 10 12 20 16 0 0 0 0 0 0 0\n")
    (root / "imageclasslist.txt").write_text("x.jpg 1 2 3 3\n")

    ds = ExDarkDataset(str(root), mode="test")
    assert len(ds) == 1
    item = ds.get(0)
    t = item["targets"]
    assert t.shape == (1, 5)
    # ExDark 'Bicycle' -> 12-class id for bicycle
    from millieye_tpu.data.datasets import EXDARK_CLASS_IN_COCO, COCO_NAMES
    assert int(t[0, 0]) == EXDARK_CLASS_IN_COCO.index(
        COCO_NAMES.index("bicycle"))
    # left,top,w,h -> normalized cxcywh over 64-square with 8px top pad
    assert t[0, 1] == pytest.approx((10 + 10) / 64, abs=1e-3)
    assert t[0, 2] == pytest.approx((12 + 8 + 8) / 64, abs=1e-3)

    # train split excludes split-3 entries
    assert len(ExDarkDataset(str(root), mode="train")) == 0


def test_prepare_dataset_emits_layout(tmp_path):
    # synthesize a recording (reuses the runtime test helper)
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_runtime import _write_recording, FRAME, CALIB
    rec = str(tmp_path / "rec")
    _write_recording(rec, n_frames=6)
    out = str(tmp_path / "ds")
    stems = prepare_dataset(
        rec, out, CALIB,
        RadarParams(frame_size=FRAME, num_pts_filter=1, min_hits=1,
                    min_velocity=0.0),
        keep_every=2, scene="H0-")
    assert stems and all(s.startswith("H0-") for s in stems)
    for s in stems:
        assert os.path.exists(os.path.join(out, "image", s + ".jpg"))
        assert os.path.exists(os.path.join(out, "radar_point", s + ".pkl"))
        assert os.path.exists(os.path.join(out, "radar_box", s + ".pkl"))
    listed = open(os.path.join(out, "dataset.txt")).read().splitlines()
    assert len(listed) == len(stems)


def test_augment_flip(tmp_path):
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    os.makedirs(lbl_dir)
    _save_img(str(img_dir / "a.jpg"), w=64, h=64)
    (lbl_dir / "a.txt").write_text("0 0.25 0.5 0.2 0.2\n")
    lst = tmp_path / "t.txt"
    lst.write_text(str(img_dir / "a.jpg") + "\n")
    ds = ImageListDataset(str(lst), augment=True)
    # flip is Bernoulli(0.5): over many draws both branches occur and the
    # flipped cx mirrors to 0.75 (utils/augmentations.py:6-9 semantics)
    seen = {round(float(ds.get(0)["targets"][0, 1]), 2) for _ in range(40)}
    assert seen == {0.25, 0.75}


def test_exdark_coco_detector_mapping(tmp_path):
    """coco_detector=True keeps COCO ids (for evaluating an 80-class
    pretrained detector on ExDark, test_mixed.py usage)."""
    root = tmp_path
    cdir = EXDARK_NAMES[0]
    _save_img(str(root / "Img" / cdir / "x.jpg"))
    os.makedirs(root / "Label" / cdir)
    (root / "Label" / cdir / "x.jpg.txt").write_text("Bicycle 1 1 10 10\n")
    (root / "imageclasslist.txt").write_text("x.jpg 1 2 3 3\n")
    from millieye_tpu.data.datasets import COCO_NAMES
    ds = ExDarkDataset(str(root), mode="test", coco_detector=True)
    t = ds.get(0)["targets"]
    assert int(t[0, 0]) == COCO_NAMES.index("bicycle")


def test_concat_dataset(tmp_path):
    from millieye_tpu.data.datasets import ConcatDataset
    img_dir = tmp_path / "images"
    lbl_dir = tmp_path / "labels"
    os.makedirs(lbl_dir)
    for i in range(3):
        _save_img(str(img_dir / f"{i}.jpg"))
        (lbl_dir / f"{i}.txt").write_text(f"{i} 0.5 0.5 0.2 0.2\n")
    l1 = tmp_path / "a.txt"
    l1.write_text("\n".join(str(img_dir / f"{i}.jpg") for i in (0, 1)) + "\n")
    l2 = tmp_path / "b.txt"
    l2.write_text(str(img_dir / "2.jpg") + "\n")
    ds = ConcatDataset(ImageListDataset(str(l1)), ImageListDataset(str(l2)))
    assert len(ds) == 3
    assert int(ds.get(2)["targets"][0, 0]) == 2
    with pytest.raises(IndexError):
        ds.get(3)
