"""The real-photo mini-set builder (benchmarks/real_mini.py) must
produce the SAME ground truth through both on-disk layouts.

Regression: the 12-class ids index the SORTED coco-id list
(data/datasets.py EXDARK_CLASS_IN_COCO), so People maps to 0 — the
builder once wrote 10 (the EXDARK_NAMES position) into the YOLO labels,
making the ImageList and ExDark views of the same images disagree and
zeroing the stage-2 eval."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "benchmarks"))


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    from real_mini import build
    root = str(tmp_path_factory.mktemp("real_mini"))
    counts = build(root, seed=0)
    assert counts["boxes"] > 0 and counts["dark"] > 0
    return root


def test_layouts_agree_on_class_and_boxes(mini_root):
    from millieye_tpu.data.datasets import (ImageListDataset, ExDarkDataset,
                                            EXDARK_CLASS_IN_COCO)
    il = ImageListDataset(os.path.join(mini_root, "train.txt"))
    ex = ExDarkDataset(mini_root, "train")
    # People -> coco person (0) -> sorted-list index 0
    assert EXDARK_CLASS_IN_COCO.index(0) == 0

    ex_by_name = {os.path.basename(p): i for i, (p, _) in
                  enumerate(ex.items)}
    n_pos = 0
    for i, path in enumerate(il.img_files):
        a = il.get(i)
        b = ex.get(ex_by_name[os.path.basename(path)])
        assert a["targets"].shape == b["targets"].shape, path
        if len(a["targets"]):
            n_pos += 1
            # same class ids through both pipelines
            np.testing.assert_array_equal(a["targets"][:, 0],
                                          b["targets"][:, 0])
            assert set(a["targets"][:, 0]) == {0.0}
            # same normalized boxes (ExDark ltwh vs YOLO xywh roundtrip;
            # both letterbox to the same square)
            np.testing.assert_allclose(a["targets"][:, 1:],
                                       b["targets"][:, 1:], atol=2e-3)
    assert n_pos > 0


def test_split_files_disjoint_and_dark_present(mini_root):
    with open(os.path.join(mini_root, "train.txt")) as f:
        train = set(f.read().split())
    with open(os.path.join(mini_root, "test.txt")) as f:
        test = set(f.read().split())
    assert train and test and not (train & test)
    assert any("_L" in p for p in test), "no low-light test images"
    # ExDark split column agrees
    from millieye_tpu.data.datasets import ExDarkDataset
    ex_tr = {os.path.basename(p) for p, _ in
             ExDarkDataset(mini_root, "train").items}
    ex_te = {os.path.basename(p) for p, _ in
             ExDarkDataset(mini_root, "test").items}
    assert ex_tr == {os.path.basename(p) for p in train}
    assert ex_te == {os.path.basename(p) for p in test}


def test_fold_sweep_partitions_pool():
    from millieye_tpu.data.synthetic import SyntheticScenes
    from fold_sweep import N_FOLDS
    for light in ("H", "L"):
        pool = SyntheticScenes(60, seed=777, illumination=(light,))
        all_items, seen = list(pool.items), []
        for f in range(N_FOLDS):
            ds = SyntheticScenes(60, seed=777, illumination=(light,))
            ds.items = ds.items[f::N_FOLDS]
            seen += list(ds.items)
        assert sorted(seen) == sorted(all_items)
        assert len(set(seen)) == len(seen)
