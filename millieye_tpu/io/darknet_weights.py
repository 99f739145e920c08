"""Binary darknet ``.weights`` I/O.

Format (ref: yolov3/models.py:269-352): 5 little-endian int32 header
(major, minor, revision, seen, _), then a flat float32 stream. Per
convolutional block, in graph order:

* with batch_normalize: bn_bias(beta), bn_weight(gamma), running_mean,
  running_var — each [C] — then conv weights;
* without: conv bias [C], then conv weights.

Conv weights are stored OIHW (darknet/torch layout); this framework keeps
HWIO (TPU/NHWC), so load transposes (2,3,1,0) and save transposes back.

Backbone-only files keep their conventional cutoffs: ``darknet53.conv.74``
loads 75 blocks, ``yolov3-tiny.conv.15`` loads 15 (models.py:279-284).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _cutoff_for(path):
    if "darknet53.conv.74" in path:
        return 75
    if "yolov3-tiny.conv.15" in path:
        return 15
    return None


def load_darknet_weights(model, params, state, path):
    """Fill (params, state) pytrees of a ``models.darknet.Darknet`` from a
    .weights file. Returns (params, state, header).
    """
    with open(path, "rb") as fh:
        header = np.fromfile(fh, dtype=np.int32, count=5)
        flat = np.fromfile(fh, dtype=np.float32)

    cutoff = _cutoff_for(path)
    params = [dict(p) for p in params]
    state = [dict(s) for s in state]
    ptr = 0

    def take(n, shape):
        nonlocal ptr
        chunk = flat[ptr:ptr + n].reshape(shape)
        ptr += n
        return jnp.asarray(chunk)

    for i, info in enumerate(model._plan):
        if cutoff is not None and i == cutoff:
            break
        if info["type"] != "convolutional":
            continue
        c = info["filters"]
        if info["bn"]:
            params[i]["beta"] = take(c, (c,))
            params[i]["gamma"] = take(c, (c,))
            state[i]["mean"] = take(c, (c,))
            state[i]["var"] = take(c, (c,))
        else:
            params[i]["b"] = take(c, (c,))
        k, cin = info["size"], info["in_ch"]
        w = take(c * cin * k * k, (c, cin, k, k))  # OIHW
        params[i]["w"] = jnp.transpose(w, (2, 3, 1, 0))  # -> HWIO
    if cutoff is None and ptr != flat.size:
        raise ValueError(
            f"weight file size mismatch: consumed {ptr} of {flat.size} floats"
        )
    return params, state, header


def save_darknet_weights(model, params, state, path, header=None, cutoff=-1):
    """Serialize (params, state) back to .weights (models.py:326-352)."""
    if header is None:
        header = np.zeros(5, np.int32)
    chunks = [np.asarray(header, np.int32).tobytes()]
    plan = model._plan[:cutoff] if cutoff != -1 else model._plan
    for i, info in enumerate(plan):
        if info["type"] != "convolutional":
            continue
        p, s = params[i], state[i]
        if info["bn"]:
            for arr in (p["beta"], p["gamma"], s["mean"], s["var"]):
                chunks.append(np.asarray(arr, np.float32).tobytes())
        else:
            chunks.append(np.asarray(p["b"], np.float32).tobytes())
        w = np.transpose(np.asarray(p["w"], np.float32), (3, 2, 0, 1))  # -> OIHW
        chunks.append(w.tobytes())
    with open(path, "wb") as fh:
        fh.write(b"".join(chunks))
