"""Device-resident dataset cache: one H2D put, per-step index gathers.

Why this exists (TPU-native design + this box's relay):

* On a real TPU host, input pipelines overlap H2D with execution; through
  the axon relay every interleaved host transfer serializes with
  executions (~40 ms/switch) — a 33 MB image batch per step dominates the
  step itself.
* The relay client additionally RETAINS every H2D payload for the life of
  the process (measured: +32 MB RSS per 33 MB put, unaffected by
  ``Array.delete()`` or donation), so an epoch-scale training run is
  OOM-killed after a few thousand steps.
* Detection datasets at this scale (thousands of padded 416x416 scenes)
  fit HBM easily — the classic accelerator-resident cache (tf.data
  ``cache().device()`` / FFCV "OS-cache" mode) is simply the right
  design: put the whole padded set on device ONCE, and per step transfer
  only the batch's index vector (a few dozen bytes). Batch assembly is a
  device-side gather fused into the train step's program stream.

Usage::

    cache = DeviceCache.build(dataset, PaddedCollate(...))
    for batch in cache.loader(batch_size=16, shuffle=True, seed=0):
        ...  # dict of device arrays: images f32, targets, masks, radar_*

Images are stored float16 (huge HBM/H2D savings, ~1e-3 relative error —
far below sensor noise) and cast back to float32 inside the gather
program; all other tensors keep their collate dtypes.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

_F16_KEYS = ("images",)
_HOST_KEYS = ("paths", "frame_size", "brightness")


@functools.partial(jax.jit, static_argnames=("f16_keys",))
def _gather(arrays, idx, f16_keys):
    out = {k: v[idx] for k, v in arrays.items()}
    for k in f16_keys:
        if k in out:
            out[k] = out[k].astype(jnp.float32)
    return out


class DeviceCache:
    """Whole padded dataset as device arrays + host-side metadata."""

    def __init__(self, arrays, host_meta=None, device=None):
        put = (lambda x: jax.device_put(x, device)) if device is not None \
            else jax.device_put
        self.arrays = {k: put(v) for k, v in arrays.items()}
        self.host_meta = host_meta or {}
        self.n = len(next(iter(arrays.values())))

    @classmethod
    def build(cls, dataset, collate, device=None, image_dtype=np.float16):
        """Collate the whole dataset once (host) and put it on device."""
        cols, paths, bright = {}, [], []
        step = 64
        for lo in range(0, len(dataset), step):
            items = [dataset.get(i)
                     for i in range(lo, min(lo + step, len(dataset)))]
            b = collate(items)
            paths.extend(b.get("paths", ()))
            # per-item brightness stays HOST-side so auto-mode selection
            # never fetches from device (harness.evaluate_fusion)
            bright.extend(np.asarray(b["images"],
                                     np.float32).mean(axis=(1, 2, 3)))
            for k, v in b.items():
                if k in _HOST_KEYS:
                    continue
                if k in _F16_KEYS and image_dtype is not None:
                    v = np.asarray(v, image_dtype)
                cols.setdefault(k, []).append(v)
        arrays = {k: np.concatenate(v, 0) for k, v in cols.items()}
        meta = {"paths": paths, "brightness": np.asarray(bright, np.float32)}
        # frame_size is per-dataset constant (collate takes item[0]'s)
        if hasattr(dataset, "get") and "frame_size" in dataset.get(0):
            meta["frame_size"] = dataset.get(0)["frame_size"]
        return cls(arrays, meta, device=device)

    def __len__(self):
        return self.n

    def loader(self, batch_size, shuffle=False, seed=0, drop_last=None):
        """``drop_last=None`` resolves to ``shuffle``: training loaders
        (shuffle=True) keep full fixed batches, eval loaders keep the
        tail (padded to the fixed shape, true count in ``batch["_n"]``)
        so no sample is silently skipped."""
        if drop_last is None:
            drop_last = shuffle
        return _CacheLoader(self, batch_size, shuffle, seed, drop_last)


class _CacheLoader:
    """DataLoader-shaped view over a DeviceCache: ``__iter__`` yields
    dicts of device arrays; reshuffles each epoch like data.loader."""

    def __init__(self, cache, batch_size, shuffle, seed, drop_last):
        self.cache = cache
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n, b = len(self.cache), self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def __iter__(self):
        self.epoch += 1
        n, b = len(self.cache), self.batch_size
        idx = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        f16 = tuple(k for k in _F16_KEYS if k in self.cache.arrays)
        fs = self.cache.host_meta.get("frame_size")
        bright = self.cache.host_meta.get("brightness")
        for lo in range(0, n, b):
            chunk = true_chunk = idx[lo:lo + b]
            if len(chunk) < b:
                if self.drop_last:
                    return
                # pad the tail by repeating the last row: fixed shapes keep
                # the gather/step programs cache-hot; callers see the true
                # count via batch["_n"]
                chunk = np.concatenate(
                    [chunk, np.full(b - len(chunk), chunk[-1])])
            batch = dict(_gather(self.cache.arrays, jnp.asarray(chunk), f16))
            batch["_n"] = min(b, n - lo)
            if bright is not None:
                batch["brightness"] = float(bright[true_chunk].mean())
            if fs is not None:
                batch["frame_size"] = fs
            yield batch
