"""Device-resident dataset cache (data/device_cache.py).

The cache must yield the SAME batches the host DataLoader path produces
(modulo the float16 image storage), reshuffle per epoch, and honor
drop_last semantics — it is a drop-in loader for Trainer.fit and the
eval harnesses.
"""
import numpy as np
import pytest

from millieye_tpu.data.device_cache import DeviceCache
from millieye_tpu.data.loader import DataLoader, PaddedCollate
from millieye_tpu.data.synthetic import SyntheticScenes


def _collate():
    return PaddedCollate(img_size=128, max_targets=8, max_radar=16,
                         max_points=128)


@pytest.fixture(scope="module")
def cache():
    ds = SyntheticScenes(10, seed=5, frame_hw=(96, 128))
    return DeviceCache.build(ds, _collate())


def test_matches_host_collate(cache):
    ds = SyntheticScenes(10, seed=5, frame_hw=(96, 128))
    host = next(iter(DataLoader(ds, 10, _collate())))
    got = next(iter(cache.loader(10)))
    assert int(got["_n"]) == 10
    np.testing.assert_allclose(np.asarray(got["images"]), host["images"],
                               atol=2e-3)  # f16 storage
    for k in ("targets", "tmask", "radar_boxes", "rmask", "radar_points",
              "pmask"):
        np.testing.assert_array_equal(np.asarray(got[k]), host[k])
    assert got["frame_size"] == host["frame_size"]
    assert np.asarray(got["images"]).dtype == np.float32


def test_epoch_reshuffle_and_coverage(cache):
    loader = cache.loader(4, shuffle=True, seed=1, drop_last=False)
    assert len(loader) == 3
    e1 = [np.asarray(b["targets"])[:b["_n"]] for b in loader]
    e2 = [np.asarray(b["targets"])[:b["_n"]] for b in loader]
    # different order across epochs...
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))
    # ...same multiset of real (unpadded) rows
    tot1 = np.sort(np.concatenate(e1, 0).sum((1, 2)))
    tot2 = np.sort(np.concatenate(e2, 0).sum((1, 2)))
    np.testing.assert_allclose(tot1, tot2, rtol=1e-6)


def test_drop_last_and_tail_padding(cache):
    assert len(cache.loader(4, drop_last=True)) == 2
    batches = list(cache.loader(4, drop_last=True))
    assert len(batches) == 2
    tail = list(cache.loader(4, drop_last=False))[-1]
    assert int(tail["_n"]) == 2
    imgs = np.asarray(tail["images"])
    assert imgs.shape[0] == 4
    np.testing.assert_array_equal(imgs[2], imgs[3])  # repeated last row
