"""Synthetic scene generator: determinism, split semantics, label and
radar-correlation invariants, collate/ingest integration."""
import numpy as np

from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.data.synthetic import SyntheticScenes


def test_deterministic_and_disjoint_seeds():
    a = SyntheticScenes(10, seed=3).get(4)
    b = SyntheticScenes(10, seed=3).get(4)
    assert np.array_equal(a["image"], b["image"])
    assert np.array_equal(a["radar_points"], b["radar_points"])
    c = SyntheticScenes(10, seed=4).get(4)
    assert not np.array_equal(a["image"], c["image"])


def test_illumination_split_and_brightness():
    ds_h = SyntheticScenes(40, seed=0, illumination=("H",))
    ds_l = SyntheticScenes(40, seed=0, illumination=("L",))
    assert len(ds_h) == len(ds_l) == 20
    mh = np.mean([ds_h.get(i)["image"].mean() for i in range(5)])
    ml = np.mean([ds_l.get(i)["image"].mean() for i in range(5)])
    # auto-mode threshold (test_fusion.py:24-32): dark under 0.1, bright over
    assert ml < 0.05 < 0.1 < mh
    # same scene index -> same layout: dark targets equal bright targets
    full = SyntheticScenes(40, seed=0)
    t_even = full.get(0)["targets"]
    assert full.light_of(0) == "H" and full.light_of(1) == "L"
    assert len(t_even) >= 1


def test_targets_are_valid_person_boxes():
    ds = SyntheticScenes(30, seed=1)
    for i in range(10):
        t = ds.get(i)["targets"]
        assert t.shape[1] == 5 and len(t) >= 1
        assert (t[:, 0] == 0).all()              # person class only
        assert (t[:, 1:] > 0).all() and (t[:, 1:] < 1).all()
        # boxes stay inside the letterboxed square
        assert (t[:, 1] - t[:, 3] / 2 > -1e-6).all()
        assert (t[:, 1] + t[:, 3] / 2 < 1 + 1e-6).all()


def test_radar_points_correlate_with_objects():
    """Most radar returns fall inside a true box (the informative-in-the-
    dark signal the fusion stage is supposed to exploit)."""
    ds = SyntheticScenes(30, seed=2)
    inside, total = 0, 0
    for i in range(10):
        it = ds.get(i)
        w, h = it["frame_size"]
        t = it["targets"]
        s = it["image"].shape[0]
        pad_top = (s - h) / 2
        for u, v, z, sp in it["radar_points"]:
            total += 1
            cx, cy = u / s, (v + pad_top) / s
            hit = ((np.abs(cx - t[:, 1]) < t[:, 3] / 2 + 0.02)
                   & (np.abs(cy - t[:, 2]) < t[:, 4] / 2 + 0.02)).any()
            inside += bool(hit)
        assert (it["radar_points"][:, 2] > 0).all()   # positive depth
    assert inside / total > 0.6, (inside, total)


def test_radar_proposals_overlap_targets():
    ds = SyntheticScenes(30, seed=5)
    got_overlap = 0
    for i in range(10):
        it = ds.get(i)
        t, rb = it["targets"], it["radar_boxes"]
        if not len(rb):
            continue
        txyxy = np.stack([t[:, 1] - t[:, 3] / 2, t[:, 2] - t[:, 4] / 2,
                          t[:, 1] + t[:, 3] / 2, t[:, 2] + t[:, 4] / 2], -1)
        for b in rb:
            ix = (np.minimum(b[2], txyxy[:, 2])
                  - np.maximum(b[0], txyxy[:, 0])).clip(0)
            iy = (np.minimum(b[3], txyxy[:, 3])
                  - np.maximum(b[1], txyxy[:, 1])).clip(0)
            inter = ix * iy
            union = ((b[2] - b[0]) * (b[3] - b[1])
                     + t[:, 3] * t[:, 4] - inter)
            if (inter / union > 0.4).any():
                got_overlap += 1
                break
    assert got_overlap >= 7, got_overlap


def test_collate_integration():
    ds = SyntheticScenes(8, seed=0)
    collate = PaddedCollate(img_size=416, max_targets=8, max_radar=16,
                            max_points=128)
    loader = DataLoader(ds, 4, collate, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (4, 416, 416, 3)
    assert b["targets"].shape == (4, 8, 5)
    assert b["radar_boxes"].shape == (4, 16, 4)
    assert b["radar_points"].shape == (4, 128, 4)
    assert b["tmask"].any() and b["pmask"].any()
    assert b["frame_size"] == (640, 480)
