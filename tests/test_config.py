"""Darknet .cfg parsing: a textual cfg must build the same plan as the
native zoo definition (weight-file compatibility path)."""
import numpy as np
import pytest

from millieye_tpu.io.config import (parse_model_config, parse_data_config,
                                    load_classes)
from millieye_tpu.models import Darknet, tiny_yolov3_defs


CFG_TEXT = """
[net]
channels=3
width=416
height=416

[convolutional]
batch_normalize=1
filters=16
size=3
stride=1
pad=1
activation=leaky

[maxpool]
size=2
stride=2

[convolutional]
batch_normalize=0
filters=33
size=1
stride=1
pad=1
activation=linear

[yolo]
mask = 0,1,2
anchors = 10,14,  23,27,  37,58
classes=6
num=3
"""


def test_parse_model_config_blocks(tmp_path):
    p = tmp_path / "m.cfg"
    p.write_text(CFG_TEXT)
    blocks = parse_model_config(str(p))
    assert blocks[0]["type"] == "net"
    assert blocks[1]["type"] == "convolutional"
    assert blocks[1]["batch_normalize"] == "1"
    assert blocks[-1]["type"] == "yolo"
    assert blocks[-1]["anchors"].replace(" ", "") == "10,14,23,27,37,58"


def test_darknet_from_cfg_file(tmp_path, rng):
    import jax
    import jax.numpy as jnp
    p = tmp_path / "m.cfg"
    p.write_text(CFG_TEXT)
    model = Darknet(str(p), img_size=64, feature_tap=0)
    params, state = model.init(jax.random.PRNGKey(0))
    out = model.apply(params, state,
                      jnp.asarray(rng.uniform(size=(1, 64, 64, 3)),
                                  jnp.float32))
    # 64 -> maxpool/2 -> 32 grid, 3 anchors, 5+6 channels
    assert out["detections"].shape == (1, 3 * 32 * 32, 11)


def test_cfg_matches_zoo_plan():
    zoo = Darknet(tiny_yolov3_defs(num_classes=12, img_size=416))
    # plan invariants the .weights loader depends on
    convs = [i for i, p in enumerate(zoo._plan)
             if p["type"] == "convolutional"]
    assert len(convs) == 13
    assert zoo._plan[convs[0]]["filters"] == 16
    assert zoo.num_classes == 12
    assert len(zoo.anchors_per_scale) == 2


def test_parse_data_config_and_classes(tmp_path):
    d = tmp_path / "x.data"
    d.write_text("classes=12\ntrain=train.txt\nvalid=test.txt\n")
    cfg = parse_data_config(str(d))
    assert cfg["classes"] == "12"
    n = tmp_path / "x.names"
    n.write_text("bicycle\nboat\n")
    assert load_classes(str(n)) == ["bicycle", "boat"]


def test_collate_multiscale_rolls(rng):
    from millieye_tpu.data.loader import PaddedCollate
    c = PaddedCollate(416, multiscale=True, seed=3)
    items = [{"path": "p", "image": rng.uniform(
        size=(416, 416, 3)).astype(np.float32), "targets": np.zeros((0, 5))}]
    sizes = set()
    for _ in range(30):
        sizes.add(c(items)["images"].shape[1])
    assert sizes <= set(range(416 - 96, 416 + 97, 32))
    assert len(sizes) > 1
