"""Checkpoint key-schema insurance for the released reference weights.

The OneDrive checkpoints (reference README.md:68) are unreachable here, so
these tests rebuild the reference Networks as REAL torch ``nn.Module``
hierarchies with the exact attribute naming of
``module3_our_dataset/my_models.py:411-431`` and
``module2_mixed/my_models.py:280-297`` (no torchvision needed), save
``state_dict()``, and prove the loaders in ``io/torch_ckpt.py`` consume that
exact key schema: every key is either used or on the known-dead list
(``num_batches_tracked`` buffers plus the reference's unused
``refinement_head.net3``/``fusion_head`` submodules, my_models.py:244-258).
The day the real checkpoints are reachable, loading is a proven one-liner.
"""
import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork, RefineNetwork
from millieye_tpu.io.torch_ckpt import (fill_fusion_network,
                                        fill_refine_network,
                                        load_module2_pretrain)

S = 128


class TrackingDict(dict):
    """Records which keys the loader reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.used = set()

    def __getitem__(self, key):
        self.used.add(key)
        return super().__getitem__(key)


def torch_darknet(plan):
    """Reference Darknet module tree (yolov3/models.py:18-76): a ModuleList
    of Sequentials named conv_{i} / batch_norm_{i} / leaky_{i} / ..."""
    ml = nn.ModuleList()
    for i, info in enumerate(plan):
        mods = nn.Sequential()
        t = info["type"]
        if t == "convolutional":
            mods.add_module(
                f"conv_{i}",
                nn.Conv2d(info["in_ch"], info["filters"], info["size"],
                          info["stride"], (info["size"] - 1) // 2,
                          bias=not info["bn"]))
            if info["bn"]:
                mods.add_module(f"batch_norm_{i}",
                                nn.BatchNorm2d(info["filters"], momentum=0.9,
                                               eps=1e-5))
            if info["act"] == "leaky":
                mods.add_module(f"leaky_{i}", nn.LeakyReLU(0.1))
        elif t == "maxpool":
            mods.add_module(f"maxpool_{i}",
                            nn.MaxPool2d(info["size"], info["stride"]))
        elif t == "upsample":
            mods.add_module(f"upsample_{i}", nn.Upsample(scale_factor=2))
        else:  # route / shortcut / yolo: parameter-free placeholders
            mods.add_module(f"{t}_{i}", nn.Identity())
        ml.append(mods)
    holder = nn.Module()
    holder.module_list = ml
    return holder


class RefCnnLayers1(nn.Module):
    """cnn_layers_1 (my_models.py:55-77)."""

    def __init__(self, channels=(256, 490)):
        super().__init__()
        self.net = nn.Sequential()
        for i in range(len(channels) - 1):
            self.net.add_module(f"conv_{i}",
                                nn.Conv2d(channels[i], channels[i + 1], 1, 1))
            self.net.add_module(f"batch_norm_{i}",
                                nn.BatchNorm2d(channels[i + 1], momentum=0.1))
            self.net.add_module(f"leaky_{i}", nn.LeakyReLU(0.1))


class RefCnnLayers3(nn.Module):
    """cnn_layers_3 (my_models.py:130-157)."""

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(3, 32, 3, 1, 1),
                                   nn.BatchNorm2d(32), nn.LeakyReLU(0.1))
        self.conv2 = nn.Sequential(nn.Conv2d(32, 64, 3, 1, 1),
                                   nn.BatchNorm2d(64), nn.LeakyReLU(0.1))
        self.conv3 = nn.Sequential(nn.Conv2d(64, 128, 3, 1, 1),
                                   nn.BatchNorm2d(128), nn.LeakyReLU(0.1),
                                   nn.Conv2d(128, 10, 1, 1))


class RefRefinementHead3(nn.Module):
    """module3 refinement_head (my_models.py:229-258) — INCLUDING the dead
    net3/fusion_head submodules that appear in real checkpoints."""

    def __init__(self):
        super().__init__()
        self.net0 = nn.Sequential(nn.Linear(490, 256), nn.LeakyReLU(0.1))
        self.net1 = nn.Sequential(nn.Linear(256, 4))
        self.net2 = nn.Sequential(nn.Linear(256, 13), nn.Sigmoid())
        self.net3 = nn.Sequential(nn.Linear(256, 49), nn.Sigmoid())
        self.radar_net = nn.Sequential(
            nn.Conv2d(10, 10, 7, 1, 0), nn.BatchNorm2d(10, momentum=0.1),
            nn.LeakyReLU(0.1), nn.Conv2d(10, 1, 1, 1, 0), nn.Sigmoid())
        self.fusion_head = nn.Sequential(nn.Linear(98, 1), nn.Sigmoid())


class RefRefinementHead2(nn.Module):
    """module2 refinement_head (module2_mixed/my_models.py:96-118)."""

    def __init__(self, class_num=12):
        super().__init__()
        self.net0 = nn.Sequential(nn.Linear(490, 256), nn.LeakyReLU(0.1),
                                  nn.Dropout(0.5))
        self.net1 = nn.Sequential(nn.Linear(256, 4))
        self.net2 = nn.Sequential(nn.Linear(256, class_num + 1), nn.Sigmoid())


class RefEnsembleHead(nn.Module):
    """ensemble_head (my_models.py:185-200)."""

    def __init__(self, channels):
        super().__init__()
        self.fc1 = nn.Sequential(nn.Linear(channels[0], channels[1]),
                                 nn.LeakyReLU(0.1))
        self.fc2 = nn.Sequential(nn.Linear(channels[2], channels[3]))


class RefFusionNetwork(nn.Module):
    """module3 Network attribute tree (my_models.py:426-431)."""

    def __init__(self, plan):
        super().__init__()
        self.base_detector = torch_darknet(plan)
        self.img_cnn_layers = RefCnnLayers1((256, 490))
        self.radar_cnn_layers = RefCnnLayers3()
        self.refinement_head = RefRefinementHead3()
        self.ensemble_head = RefEnsembleHead((2, 32, 64, 2))


class RefRefineNetwork(nn.Module):
    """module2 Network attribute tree (module2_mixed/my_models.py:294-297):
    class_num=12, fcn_layers is cnn_layers_1 renamed."""

    def __init__(self, plan):
        super().__init__()
        self.base_detector = torch_darknet(plan)
        self.fcn_layers = RefCnnLayers1((256, 490))
        self.refinement_head = RefRefinementHead2(class_num=12)
        self.ensemble_head = RefEnsembleHead((2, 32, 32 * 13, 2))


def _sd(net):
    torch.manual_seed(0)
    for p in net.parameters():
        with torch.no_grad():
            p.add_(0.01 * torch.randn_like(p))
    return TrackingDict({k: v.numpy() for k, v in net.state_dict().items()})


DEAD_SUFFIX = ("num_batches_tracked",)
DEAD_PREFIX3 = ("refinement_head.net3.", "refinement_head.fusion_head.")


def _unused_ok(sd, dead_prefixes):
    unused = set(sd.keys()) - sd.used
    bad = [k for k in unused
           if not (k.endswith(DEAD_SUFFIX) or k.startswith(dead_prefixes))]
    return unused, bad


def test_fusion_network_exact_key_schema():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    params, state = model.init(jax.random.PRNGKey(0))

    ref = RefFusionNetwork(model.darknet._plan)
    sd = _sd(ref)
    p2, s2 = fill_fusion_network(model, params, state, sd)

    # every non-dead key consumed, nothing missing raised a KeyError above
    unused, bad = _unused_ok(sd, DEAD_PREFIX3)
    assert not bad, f"loader ignored live reference keys: {sorted(bad)[:8]}"
    assert any(k.startswith("refinement_head.net3.") for k in unused)

    # spot-check placements incl. layout transposes
    np.testing.assert_array_equal(
        np.asarray(p2["darknet"][0]["w"]),
        np.transpose(sd["base_detector.module_list.0.conv_0.weight"],
                     (2, 3, 1, 0)))
    np.testing.assert_array_equal(
        np.asarray(s2["refine"]["radar_net"]["var"]),
        sd["refinement_head.radar_net.1.running_var"])
    np.testing.assert_array_equal(
        np.asarray(p2["ensemble"]["fc1"]["w"]),
        np.transpose(sd["ensemble_head.fc1.0.weight"]))

    # loaded model shapes are consistent: forward runs
    import jax.numpy as jnp
    out = model.apply(p2, s2, jnp.zeros((1, S, S, 3)),
                      jnp.zeros((1, S // 16, S // 16, 3)),
                      jnp.zeros((1, 4, 4)), jnp.zeros((1, 4), bool))
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_refine_network_exact_key_schema():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = RefineNetwork(darknet, FusionConfig(
        conf_thresh=0.05, class_num=12, max_det=16, pre_nms_top_k=64,
        loss_variant="module2"))
    params, state = model.init(jax.random.PRNGKey(0))

    ref = RefRefineNetwork(model.darknet._plan)
    sd = _sd(ref)
    p2, s2 = fill_refine_network(model, params, state, sd)
    unused, bad = _unused_ok(sd, ())
    assert not bad, f"loader ignored live reference keys: {sorted(bad)[:8]}"

    np.testing.assert_array_equal(
        np.asarray(p2["fcn"][0]["bn"]["gamma"]),
        sd["fcn_layers.net.batch_norm_0.weight"])

    # module2 -> module3 cross-load (module3 train.py:117-149): img_cnn and
    # refinement nets 0-2 land, marked frozen
    fmodel = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    fparams, fstate = fmodel.init(jax.random.PRNGKey(1))
    fp, fs, frozen = load_module2_pretrain(fparams, fstate, sd)
    np.testing.assert_array_equal(
        np.asarray(fp["refine"]["net0"]["w"]),
        np.transpose(sd["refinement_head.net0.0.weight"]))
    assert frozen == {"img_cnn": True, "refine_nets": True}
