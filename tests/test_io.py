"""Legacy torch-checkpoint ingestion tests (synthetic state dicts)."""
import numpy as np
import jax
import pytest

torch = pytest.importorskip("torch")

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork, RefineNetwork
from millieye_tpu.io.torch_ckpt import (read_state_dict, fill_darknet,
                                        load_ultralytics_pt,
                                        fill_fusion_network,
                                        fill_refine_network,
                                        load_module2_pretrain)

S = 128


def _darknet_sd(model, prefix="", rng=None):
    """Synthesize torch keys for the darknet plan."""
    rng = rng or np.random.default_rng(0)
    sd = {}
    for i, info in enumerate(model._plan):
        if info["type"] != "convolutional":
            continue
        k = info["size"]
        base = f"{prefix}module_list.{i}"
        sd[f"{base}.conv_{i}.weight"] = rng.standard_normal(
            (info["filters"], info["in_ch"], k, k)).astype(np.float32)
        if info["bn"]:
            bn = f"{base}.batch_norm_{i}"
            c = info["filters"]
            for name, val in (("weight", rng.standard_normal(c)),
                              ("bias", rng.standard_normal(c)),
                              ("running_mean", rng.standard_normal(c)),
                              ("running_var", rng.uniform(0.5, 2, c))):
                sd[f"{bn}.{name}"] = val.astype(np.float32)
            sd[f"{bn}.num_batches_tracked"] = np.asarray(1)
        else:
            sd[f"{base}.conv_{i}.bias"] = rng.standard_normal(
                info["filters"]).astype(np.float32)
    return sd


def _lin_sd(sd, key, out_d, in_d, rng):
    sd[f"{key}.weight"] = rng.standard_normal((out_d, in_d)).astype(np.float32)
    sd[f"{key}.bias"] = rng.standard_normal(out_d).astype(np.float32)


def _conv_sd(sd, key, cout, cin, k, rng, bias=True):
    sd[f"{key}.weight"] = rng.standard_normal(
        (cout, cin, k, k)).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32)


def _bn_sd(sd, key, c, rng):
    sd[f"{key}.weight"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{key}.bias"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{key}.running_mean"] = rng.standard_normal(c).astype(np.float32)
    sd[f"{key}.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)


def _fusion_sd(model, rng):
    sd = _darknet_sd(model.darknet, prefix="base_detector.", rng=rng)
    _conv_sd(sd, "img_cnn_layers.net.conv_0", 490, 256, 1, rng)
    _bn_sd(sd, "img_cnn_layers.net.batch_norm_0", 490, rng)
    for i, (cin, cout) in enumerate(((3, 32), (32, 64), (64, 128))):
        _conv_sd(sd, f"radar_cnn_layers.conv{i+1}.0", cout, cin, 3, rng)
        _bn_sd(sd, f"radar_cnn_layers.conv{i+1}.1", cout, rng)
    _conv_sd(sd, "radar_cnn_layers.conv3.3", 10, 128, 1, rng)
    _lin_sd(sd, "refinement_head.net0.0", 256, 490, rng)
    _lin_sd(sd, "refinement_head.net1.0", 4, 256, rng)
    _lin_sd(sd, "refinement_head.net2.0", 13, 256, rng)
    _conv_sd(sd, "refinement_head.radar_net.0", 10, 10, 7, rng)
    _bn_sd(sd, "refinement_head.radar_net.1", 10, rng)
    _conv_sd(sd, "refinement_head.radar_net.3", 1, 10, 1, rng)
    _lin_sd(sd, "ensemble_head.fc1.0", 32, 2, rng)
    _lin_sd(sd, "ensemble_head.fc2.0", 2, 64, rng)
    return sd


def test_fill_darknet_layout(rng):
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    params, state = model.init(jax.random.PRNGKey(0))
    sd = _darknet_sd(model)
    p2, s2 = fill_darknet(model, params, state, sd)
    # OIHW -> HWIO transposition of the first conv
    np.testing.assert_array_equal(
        p2[0]["w"], np.transpose(sd["module_list.0.conv_0.weight"],
                                 (2, 3, 1, 0)))
    np.testing.assert_array_equal(s2[0]["mean"],
                                  sd["module_list.0.batch_norm_0.running_mean"])


def test_ultralytics_positional_load(tmp_path, rng):
    model = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S), img_size=S)
    params, state = model.init(jax.random.PRNGKey(0))
    sd = _darknet_sd(model)
    # arbitrary foreign key names: positional zip must still land correctly
    renamed = {f"foreign.{i}.{k.split('.')[-1]}": v
               for i, (k, v) in enumerate(sd.items())}
    path = tmp_path / "w.pt"
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in renamed.items()}, str(path))
    p2, s2 = load_ultralytics_pt(model, params, state, str(path))
    np.testing.assert_array_equal(
        p2[0]["w"], np.transpose(sd["module_list.0.conv_0.weight"],
                                 (2, 3, 1, 0)))


def test_fill_fusion_network_and_forward(tmp_path, rng):
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    params, state = model.init(jax.random.PRNGKey(0))
    sd = _fusion_sd(model, rng)
    path = tmp_path / "fusion.pth"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               str(path))
    sd_back = read_state_dict(str(path))
    p2, s2 = fill_fusion_network(model, params, state, sd_back)
    # placements
    np.testing.assert_allclose(
        p2["refine"]["net0"]["w"],
        np.transpose(sd["refinement_head.net0.0.weight"]), rtol=1e-6)
    np.testing.assert_allclose(
        p2["ensemble"]["fc2"]["w"],
        np.transpose(sd["ensemble_head.fc2.0.weight"]), rtol=1e-6)
    # loaded network still runs
    import jax.numpy as jnp
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)), jnp.float32)
    rb = jnp.zeros((1, 4, 4), jnp.float32)
    out = model.apply(p2, s2, images, maps, rb, jnp.zeros((1, 4), bool))
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_refine_network_fill(rng):
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = RefineNetwork(darknet, FusionConfig(
        conf_thresh=0.05, class_num=12, max_det=16, pre_nms_top_k=64,
        loss_variant="module2"))
    params, state = model.init(jax.random.PRNGKey(0))
    sd = _darknet_sd(model.darknet, prefix="base_detector.", rng=rng)
    _conv_sd(sd, "fcn_layers.net.conv_0", 490, 256, 1, rng)
    _bn_sd(sd, "fcn_layers.net.batch_norm_0", 490, rng)
    _lin_sd(sd, "refinement_head.net0.0", 256, 490, rng)
    _lin_sd(sd, "refinement_head.net1.0", 4, 256, rng)
    _lin_sd(sd, "refinement_head.net2.0", 13, 256, rng)
    _lin_sd(sd, "ensemble_head.fc1.0", 32, 2, rng)
    _lin_sd(sd, "ensemble_head.fc2.0", 2, 32 * 13, rng)
    p2, s2 = fill_refine_network(model, params, state, sd)
    np.testing.assert_allclose(
        p2["fcn"][0]["bn"]["gamma"], sd["fcn_layers.net.batch_norm_0.weight"],
        rtol=1e-6)

    # module2 -> module3 cross-load (train.py:117-149)
    fmodel = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    fparams, fstate = fmodel.init(jax.random.PRNGKey(1))
    fp, fs, frozen = load_module2_pretrain(fparams, fstate, sd)
    np.testing.assert_allclose(
        fp["img_cnn"][0]["w"],
        np.transpose(sd["fcn_layers.net.conv_0.weight"], (2, 3, 1, 0)),
        rtol=1e-6)
    assert frozen["img_cnn"] and frozen["refine_nets"]
