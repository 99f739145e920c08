"""Demo-CLI serving presets (--serving ladder): each preset must build,
calibrate when needed (int8_acts), and stream a tiny recording end to
end with finite outputs."""
import os
import pickle

import numpy as np
import pytest

from millieye_tpu.cli._common import SERVING_PRESETS, serving_overrides

FRAME = (64, 48)


def _write_recording(root, n_frames=3):
    from PIL import Image
    os.makedirs(os.path.join(root, "frames"), exist_ok=True)
    rng = np.random.default_rng(1)
    with open(os.path.join(root, "timestamps.txt"), "w") as f:
        for i in range(n_frames):
            f.write(f"{100.0 + 0.05 * i} {i}\n")
    for i in range(n_frames):
        img = (rng.uniform(size=(FRAME[1], FRAME[0], 3)) * 255).astype(
            np.uint8)
        Image.fromarray(img).save(
            os.path.join(root, "frames", f"{i:06d}.jpg"))
    records = []
    for i in range(n_frames):
        n = 5
        records.append({
            "Data": {"numObj": n,
                     "x": rng.uniform(-0.5, 0.5, n),
                     "y": rng.uniform(1.0, 3.0, n),
                     "z": rng.uniform(-0.2, 0.2, n),
                     "velocity": rng.uniform(-1, 1, n)},
            "Time": 100.0 + 0.05 * i, "Frame_ID": i})
    with open(os.path.join(root, "pointcloud.pkl"), "wb") as f:
        pickle.dump(records, f)


def _write_calib(path):
    import yaml
    doc = {"camera_matrix": {"data": [40.0, 0, 32.0, 0, 40.0, 24.0,
                                      0, 0, 1]},
           "distortion_coefficients": {"data": [0.0] * 5}}
    with open(path, "w") as f:
        yaml.safe_dump(doc, f)


_NO_PALLAS = {"pallas_stem": (), "pallas_pair": False,
              "pallas_precision": "highest", "pallas_variant": "select",
              "pallas_pairs": "first"}


def test_serving_overrides_shape():
    assert serving_overrides("f32") == ((), (), None, _NO_PALLAS, {})
    s2d, hi, store, pkw, over = serving_overrides("int8_acts")
    assert s2d == (0, 2) and hi == () and store is None
    assert over == {"weights_int8": True, "acts_int8": True}
    s2d, hi, store, pkw, over = serving_overrides("bf16_f16stem")
    assert s2d == () and hi == (0, 2, 4) and store == "float16"
    assert over == {"compute_dtype": "bfloat16"}
    assert set(SERVING_PRESETS) == {"f32", "bf16", "bf16_f16stem",
                                    "bf16_f32stem", "bf16_heads",
                                    "pallas_stem", "pallas_stem2",
                                    "pallas_phase", "pallas_max",
                                    "pallas_max4", "pallas_packed",
                                    "pallas_s2d", "pallas_s2d8",
                                    "pallas_deep", "pallas_pair2",
                                    "pallas_maxv", "pallas_max_k256",
                                    "pallas_max_d64", "pallas_max_k128",
                                    "pallas_max_pk", "pallas_max_s2d",
                                    "pallas_max_s01", "pallas_max_vm",
                                    "pallas_max_vm_s01",
                                    "pallas_max_vm_bf16s",
                                    "pallas_max_bf16s",
                                    "pallas_max_pk_bf16s",
                                    "pallas_max_s2d_bf16s",
                                    "pallas_lat", "s2d",
                                    "bf16_s2d", "int8", "int8_acts"}
    # the r5 stem-variant presets: scratch dtype rides the variant NAME
    _, _, _, pkw_pk, over_pk = serving_overrides("pallas_max_pk")
    assert pkw_pk["pallas_variant"] == "packed"
    assert over_pk["pre_nms_top_k"] == 128 and over_pk["max_det"] == 64
    _, _, _, pkw_b, _ = serving_overrides("pallas_max_bf16s")
    assert pkw_b["pallas_variant"] == "phase_bf16s"
    # the round-4 RoI/latency presets carry their FusionConfig overrides
    _, _, _, _, over_v = serving_overrides("pallas_maxv")
    assert over_v["roi_reduce"] == "vpu"
    _, _, _, _, over_l = serving_overrides("pallas_lat")
    assert over_l["pre_nms_top_k"] == 256 and over_l["nms_use_blocked"]
    _, _, _, _, over_d = serving_overrides("pallas_max_d64")
    assert over_d["pre_nms_top_k"] == 256 and over_d["max_det"] == 64
    s2d, hi, store, pkw, over = serving_overrides("pallas_stem")
    assert pkw == {"pallas_stem": (0, 2), "pallas_pair": False,
                   "pallas_precision": "highest",
                   "pallas_variant": "select", "pallas_pairs": "first"}
    assert over["heads_dtype"] == "bfloat16"
    s2d, hi, store, pkw, over = serving_overrides("pallas_stem2")
    assert pkw == {"pallas_stem": (0, 2), "pallas_pair": True,
                   "pallas_precision": "default",
                   "pallas_variant": "select", "pallas_pairs": "first"}
    assert store == "float16"
    s2d, hi, store, pkw, over = serving_overrides("bf16_heads")
    assert s2d == () and hi == (0, 2, 4) and store == "float16"
    assert over == {"compute_dtype": "bfloat16",
                    "heads_dtype": "bfloat16"}


def test_evaluate_cli_serving(tmp_path):
    """evaluate --what fusion --serving: preset build + fold_for_serving
    + eval-set calibration path, end to end on synthetic scenes."""
    import jax
    from millieye_tpu.cli import evaluate
    from millieye_tpu.cli._common import build_fusion
    from millieye_tpu.io.checkpoint import save_checkpoint

    class A:  # minimal args_cfg for build_fusion
        model_def = None
        img_size = 128

    model, params, state = build_fusion(A())
    ckpt = str(tmp_path / "fusion.npz")
    save_checkpoint(ckpt, {"params": params, "state": state})
    m_ap = evaluate.main([
        "--what", "fusion", "--weights", ckpt, "--synthetic", "8",
        "--img_size", "128", "--batch_size", "4",
        "--conf_thresh", "0.05", "--serving", "int8_acts"])
    assert isinstance(m_ap, float)


@pytest.mark.parametrize("preset", ["bf16_f16stem", "int8_acts"])
def test_demo_cli_serving_end_to_end(tmp_path, preset):
    from millieye_tpu.cli import demo
    rec = str(tmp_path / "rec")
    _write_recording(rec)
    calib = str(tmp_path / "calib.yaml")
    _write_calib(calib)
    report = demo.main([
        "--recording", rec, "--calib", calib, "--serving", preset,
        "--img_size", "128", "--frame_w", str(FRAME[0]),
        "--frame_h", str(FRAME[1])])
    assert report["e2e_fps"] > 0
