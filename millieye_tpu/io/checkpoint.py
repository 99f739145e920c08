"""Native checkpoints: pytree <-> single-file .npz (+ optional orbax).

The reference checkpoints are ``torch.save(state_dict)`` per epoch
(module3 train.py:242-243) and resume via ``--checkpoint``; the rich part
of its checkpoint story is heterogeneous LOADING (darknet ``.weights``,
ultralytics ``.pt`` positional zips, module2->module3 remaps) — those
live in io/darknet_weights.py and io/torch_ckpt.py. This module is the
framework's own save/restore: the pytree's leaves go into one ``.npz``
keyed by key-path (human-inspectable, dependency-free, byte-stable);
restore rebuilds into a same-structure template so arbitrary containers
(optax NamedTuple states, lists, dicts) round-trip exactly.
``save_orbax``/``load_orbax`` cover sharded multi-host arrays when orbax
is wanted.
"""
from __future__ import annotations

import os

import numpy as np
import jax


def _leaf_items(tree):
    """[(path_string, leaf)] with deterministic ordering."""
    leaves = jax.tree_util.tree_leaves_with_path(tree)
    items = []
    for path, leaf in leaves:
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        items.append(("/".join(parts) or "_root", leaf))
    return items


def save_checkpoint(path, tree):
    """tree: nested dict/list/tuple/NamedTuple of arrays, e.g.
    {"params": ..., "state": ..., "opt_state": ..., "step": ...}."""
    flat = {}
    for i, (key, leaf) in enumerate(_leaf_items(tree)):
        flat[f"{i:05d}|{key}"] = np.asarray(leaf)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    np.savez(path, **flat)


def load_checkpoint(path, like):
    """Restore into the structure of ``like`` (same model/optimizer built
    the same way — the usual resume path, train.py:109-111). Leaf count
    and key paths must match; shapes are taken from the file."""
    with np.load(path, allow_pickle=False) as z:
        entries = sorted(z.files, key=lambda k: int(k.split("|")[0]))
        arrays = [z[k] for k in entries]
    expect = _leaf_items(like)
    if len(expect) != len(arrays):
        raise ValueError(
            f"checkpoint has {len(arrays)} leaves, template has "
            f"{len(expect)}")
    for (key, _), entry in zip(expect, entries):
        if entry.split("|", 1)[1] != key:
            raise ValueError(
                f"checkpoint key {entry.split('|', 1)[1]!r} != template "
                f"key {key!r}")
    treedef = jax.tree_util.tree_structure(like)
    return jax.tree_util.tree_unflatten(treedef, arrays)


def save_orbax(path, tree):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), tree)


def load_orbax(path):
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
