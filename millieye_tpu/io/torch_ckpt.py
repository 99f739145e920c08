"""Legacy torch checkpoint ingestion.

The reference ecosystem has three torch-side formats the framework must
keep loading (SURVEY.md §5 checkpoint/resume):

* full-network ``.pth`` state dicts saved by the reference's train loops
  (``torch.save(model.state_dict())``, module3 train.py:242-243) — for the
  fusion Network (module3) and refine Network (module2);
* ultralytics ``.pt`` files loaded *positionally* against the darknet
  (my_models.py:34-41);
* module2 -> module3 cross-loading with the explicit fcn_layers ->
  img_cnn_layers rename + freezing (train.py:117-149).

All loaders read tensors with torch (CPU) and place numpy copies into this
framework's (params, state) pytrees. Layout transforms: conv OIHW -> HWIO,
linear [out, in] -> [in, out].
"""
from __future__ import annotations

import numpy as np


def read_state_dict(path):
    """Load a torch file into {key: np.ndarray}. Handles raw state dicts and
    ultralytics-style {"model": state_dict} containers."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and not _is_tensor(obj["model"]):
        obj = obj["model"]
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()}


def _is_tensor(x):
    return hasattr(x, "detach")


def _conv(sd, key):
    return np.transpose(sd[key], (2, 3, 1, 0))  # OIHW -> HWIO


def _lin(sd, key):
    return np.transpose(sd[key], (1, 0))


# --------------------------------------------------------------- darknet
def fill_darknet(model, params, state, sd, prefix=""):
    """Fill Darknet pytrees from torch keys
    ``{prefix}module_list.{i}.conv_{i}.*`` / ``batch_norm_{i}.*``."""
    params = [dict(p) for p in params]
    state = [dict(s) for s in state]
    for i, info in enumerate(model._plan):
        if info["type"] != "convolutional":
            continue
        base = f"{prefix}module_list.{i}"
        params[i]["w"] = _conv(sd, f"{base}.conv_{i}.weight")
        if info["bn"]:
            bn = f"{base}.batch_norm_{i}"
            params[i]["gamma"] = sd[f"{bn}.weight"]
            params[i]["beta"] = sd[f"{bn}.bias"]
            state[i]["mean"] = sd[f"{bn}.running_mean"]
            state[i]["var"] = sd[f"{bn}.running_var"]
        else:
            params[i]["b"] = sd[f"{base}.conv_{i}.bias"]
    return params, state


def load_ultralytics_pt(model, params, state, path):
    """Positional load (my_models.py:34-41): zip the source file's tensors
    against this darknet's parameters in torch state-dict order
    (conv.weight[, conv.bias | bn.weight, bn.bias, mean, var, n_tracked])."""
    sd = read_state_dict(path)
    values = list(sd.values())
    params = [dict(p) for p in params]
    state = [dict(s) for s in state]
    ptr = 0

    def take():
        nonlocal ptr
        v = values[ptr]
        ptr += 1
        return v

    for i, info in enumerate(model._plan):
        if info["type"] != "convolutional":
            continue
        params[i]["w"] = np.transpose(take(), (2, 3, 1, 0))
        if info["bn"]:
            params[i]["gamma"] = take()
            params[i]["beta"] = take()
            state[i]["mean"] = take()
            state[i]["var"] = take()
            take()  # num_batches_tracked
        else:
            params[i]["b"] = take()
    return params, state


# ------------------------------------------------------------- head fills
def _fill_conv_bn_stack(p, s, sd, prefix):
    """cnn_layers_1 / fcn_layers keys: {prefix}.net.conv_{i} / batch_norm_{i}."""
    p = [dict(x) for x in p]
    s = [dict(x) for x in s]
    for i in range(len(p)):
        p[i]["w"] = _conv(sd, f"{prefix}.net.conv_{i}.weight")
        p[i]["b"] = sd[f"{prefix}.net.conv_{i}.bias"]
        bn = f"{prefix}.net.batch_norm_{i}"
        p[i]["bn"] = {"gamma": sd[f"{bn}.weight"], "beta": sd[f"{bn}.bias"]}
        s[i] = {"mean": sd[f"{bn}.running_mean"], "var": sd[f"{bn}.running_var"]}
    return p, s


def _fill_radar_encoder(p, s, sd, prefix="radar_cnn_layers"):
    """cnn_layers_3: conv1/conv2 Sequential[Conv,BN,Leaky]; conv3
    Sequential[Conv,BN,Leaky,Conv] (module3 my_models.py:130-157)."""
    p = [dict(x) for x in p]
    s = [dict(x) for x in s]
    specs = [("conv1.0", "conv1.1"), ("conv2.0", "conv2.1"), ("conv3.0", "conv3.1")]
    for i, (ck, bk) in enumerate(specs):
        p[i]["w"] = _conv(sd, f"{prefix}.{ck}.weight")
        p[i]["b"] = sd[f"{prefix}.{ck}.bias"]
        p[i]["bn"] = {"gamma": sd[f"{prefix}.{bk}.weight"],
                      "beta": sd[f"{prefix}.{bk}.bias"]}
        s[i] = {"mean": sd[f"{prefix}.{bk}.running_mean"],
                "var": sd[f"{prefix}.{bk}.running_var"]}
    p[3]["w"] = _conv(sd, f"{prefix}.conv3.3.weight")
    p[3]["b"] = sd[f"{prefix}.conv3.3.bias"]
    return p, s


def _fill_refinement(p, s, sd, prefix="refinement_head", with_radar=True):
    p = dict(p)
    s = dict(s)
    for net in ("net0", "net1", "net2"):
        p[net] = {"w": _lin(sd, f"{prefix}.{net}.0.weight"),
                  "b": sd[f"{prefix}.{net}.0.bias"]}
    if with_radar:
        rn = f"{prefix}.radar_net"
        p["radar_net"] = {
            "conv7": {"w": _conv(sd, f"{rn}.0.weight"), "b": sd[f"{rn}.0.bias"]},
            "bn": {"gamma": sd[f"{rn}.1.weight"], "beta": sd[f"{rn}.1.bias"]},
            "conv1": {"w": _conv(sd, f"{rn}.3.weight"), "b": sd[f"{rn}.3.bias"]},
        }
        s["radar_net"] = {"mean": sd[f"{rn}.1.running_mean"],
                          "var": sd[f"{rn}.1.running_var"]}
    return p, s


def _fill_ensemble(p, sd, prefix="ensemble_head"):
    return {
        "fc1": {"w": _lin(sd, f"{prefix}.fc1.0.weight"),
                "b": sd[f"{prefix}.fc1.0.bias"]},
        "fc2": {"w": _lin(sd, f"{prefix}.fc2.0.weight"),
                "b": sd[f"{prefix}.fc2.0.bias"]},
    }


# -------------------------------------------------------------- full models
def fill_fusion_network(model, params, state, sd):
    """module3 Network .pth -> FusionNetwork pytrees."""
    params, state = dict(params), dict(state)
    params["darknet"], state["darknet"] = fill_darknet(
        model.darknet, params["darknet"], state["darknet"], sd,
        prefix="base_detector.")
    params["img_cnn"], state["img_cnn"] = _fill_conv_bn_stack(
        params["img_cnn"], state["img_cnn"], sd, "img_cnn_layers")
    params["radar_enc"], state["radar_enc"] = _fill_radar_encoder(
        params["radar_enc"], state["radar_enc"], sd)
    params["refine"], state["refine"] = _fill_refinement(
        params["refine"], state["refine"], sd, with_radar=True)
    params["ensemble"] = _fill_ensemble(params["ensemble"], sd)
    return params, state


def fill_refine_network(model, params, state, sd):
    """module2 Network .pth -> RefineNetwork pytrees."""
    params, state = dict(params), dict(state)
    params["darknet"], state["darknet"] = fill_darknet(
        model.darknet, params["darknet"], state["darknet"], sd,
        prefix="base_detector.")
    params["fcn"], state["fcn"] = _fill_conv_bn_stack(
        params["fcn"], state["fcn"], sd, "fcn_layers")
    params["refine"], state["refine"] = _fill_refinement(
        params["refine"], state["refine"], sd, with_radar=False)
    params["ensemble"] = _fill_ensemble(params["ensemble"], sd)
    return params, state


def load_module2_pretrain(params, state, sd):
    """Cross-model load for stage 3 (train.py:117-149): take module2's
    fcn_layers (-> img_cnn) and refinement nets 0-2 into a FusionNetwork;
    returns (params, state, frozen) where ``frozen`` marks the loaded
    subtrees for the optimizer mask."""
    params, state = dict(params), dict(state)
    params["img_cnn"], state["img_cnn"] = _fill_conv_bn_stack(
        params["img_cnn"], state["img_cnn"], sd, "fcn_layers")
    refine = dict(params["refine"])
    for net in ("net0", "net1", "net2"):
        refine[net] = {"w": _lin(sd, f"refinement_head.{net}.0.weight"),
                       "b": sd[f"refinement_head.{net}.0.bias"]}
    params["refine"] = refine
    frozen = {"img_cnn": True, "refine_nets": True}
    return params, state, frozen
