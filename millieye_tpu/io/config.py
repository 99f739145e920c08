"""Config-file readers.

Three text formats from the reference ecosystem are supported so existing
assets keep working (ref: ``module*/utils/parse_config.py``):

* darknet ``.cfg`` model DSL (INI-ish ``[block]`` sections) — drives graph
  construction and keeps ``.weights`` compatibility;
* ``.data`` dataset descriptors (``key=value`` lines);
* ``.names`` class-name lists (one per line).

Models can also be declared natively in Python (``millieye_tpu.models.zoo``)
— the cfg parser and the zoo emit the same block-dict schema.
"""
from __future__ import annotations


def parse_model_config(path):
    """Parse a darknet ``.cfg`` into a list of block dicts.

    Each ``[type]`` section becomes ``{"type": ..., key: value, ...}``;
    convolutional blocks get ``batch_normalize`` defaulted to "0".
    Schema-compatible with the reference parser (parse_config.py:3-21).
    """
    blocks = []
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            if line.startswith("["):
                block = {"type": line[1:line.index("]")].strip()}
                if block["type"] == "convolutional":
                    block["batch_normalize"] = "0"
                blocks.append(block)
            else:
                key, _, value = line.partition("=")
                blocks[-1][key.strip()] = value.strip()
    return blocks


def parse_data_config(path):
    """Parse a ``.data`` descriptor into a dict (parse_config.py:23-38)."""
    options = {"gpus": "0,1,2,3", "num_workers": "10"}
    with open(path) as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            key, _, value = line.partition("=")
            value = value.strip()
            parts = value.split(" ")
            options[key.strip()] = parts if len(parts) > 1 else value
    return options


def load_classes(path):
    """Read class names, one per line; trailing empty line dropped
    (utils/utils.py:20-26).
    """
    with open(path) as fh:
        return fh.read().split("\n")[:-1]
