"""Mixed-precision stem (Darknet hi_prec_stages): under a bf16
compute_dtype, listed convs run f32 — dim night frames use ~1/30 of the
input range and bf16's 8-bit mantissa there costs dark-frame accuracy
(measured −0.043 mAP on the trained net, SYNTH_RESULTS serving table)."""
import numpy as np

import jax
import jax.numpy as jnp

from millieye_tpu.models import Darknet, tiny_yolov3_defs

STEM = (0, 2, 4)


def _nets(img=128):
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    full = Darknet(defs, img_size=img)
    mixed = Darknet(defs, img_size=img, hi_prec_stages=STEM)
    params, state = full.init(jax.random.PRNGKey(0))
    return full, mixed, params, state


def test_f16_store_keeps_dim_precision():
    """f32 arithmetic + f16 storage on the stem: within ~4x of the pure
    f32-stem error on dim inputs, far below all-bf16 (the stem is
    HBM-bound, so the f16 store is what makes the config fast)."""
    img = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    full = Darknet(defs, img_size=img)
    mixed = Darknet(defs, img_size=img, hi_prec_stages=STEM)
    f16s = Darknet(defs, img_size=img, hi_prec_stages=STEM,
                   hi_prec_store=jnp.float16)
    params, state = full.init(jax.random.PRNGKey(0))
    fp32, fs = full.fold_batchnorm(params, state)
    fbf, _ = full.fold_batchnorm(params, state, dtype=jnp.bfloat16)
    fmix, _ = mixed.fold_batchnorm(params, state, dtype=jnp.bfloat16)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(2, img, img, 3)) * 0.03, jnp.float32)
    ref = np.asarray(full.apply(fp32, fs, x)["feature_map"], np.float64)

    def err(net, p):
        fm = net.apply(p, fs, x, compute_dtype=jnp.bfloat16)["feature_map"]
        return np.abs(np.asarray(fm, np.float64) - ref).mean() / (
            np.abs(ref).mean() + 1e-9)

    e_bf = err(full, fbf)
    e_mx = err(mixed, fmix)
    e_f16 = err(f16s, fmix)
    # the shared bf16 tail (stages 5+) dominates all three errors; the
    # stem choice must strictly order the residual: f32 store <= f16
    # store < bf16 stem
    assert e_mx <= e_f16 < e_bf, (e_mx, e_f16, e_bf)


def test_fold_keeps_stem_f32():
    full, mixed, params, state = _nets()
    fp, _ = mixed.fold_batchnorm(params, state, dtype=jnp.bfloat16)
    for i, p in enumerate(fp):
        if "w" not in p:
            continue
        want = jnp.float32 if i in STEM else jnp.bfloat16
        assert p["w"].dtype == want, (i, p["w"].dtype)


def test_dim_input_precision_recovered():
    full, mixed, params, state = _nets()
    fp32, fs = full.fold_batchnorm(params, state)
    fbf, _ = full.fold_batchnorm(params, state, dtype=jnp.bfloat16)
    fmix, _ = mixed.fold_batchnorm(params, state, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    # dim frame: the night regime (values in [0, 0.03])
    x = jnp.asarray(rng.uniform(size=(2, 128, 128, 3)) * 0.03, jnp.float32)

    ref = np.asarray(full.apply(fp32, fs, x)["feature_map"], np.float64)
    bf = np.asarray(full.apply(fbf, fs, x,
                               compute_dtype=jnp.bfloat16)["feature_map"],
                    np.float64)
    mx = np.asarray(mixed.apply(fmix, fs, x,
                                compute_dtype=jnp.bfloat16)["feature_map"],
                    np.float64)

    scale = np.abs(ref).mean() + 1e-9
    err_bf = np.abs(bf - ref).mean() / scale
    err_mx = np.abs(mx - ref).mean() / scale
    assert err_mx < err_bf, (err_mx, err_bf)
    assert np.isfinite(mx).all()


def test_heads_dtype_bf16_close_to_f32():
    """FusionConfig.heads_dtype="bfloat16" (serving, VERDICT r2 #3): the
    score-map convs, RoI einsums and head matmuls run bf16; the output
    rows must stay close to the f32 graph and the train path must be
    unaffected (the cast is inference-only)."""
    from millieye_tpu.models.fusion import FusionConfig, FusionNetwork

    img = 128
    defs = tiny_yolov3_defs(num_classes=12, img_size=img)
    darknet = Darknet(defs, img_size=img)
    kw = dict(conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64,
              nms_use_pallas=False)
    m32 = FusionNetwork(darknet, FusionConfig(**kw))
    m16 = FusionNetwork(darknet, FusionConfig(heads_dtype="bfloat16", **kw))
    params, state = m32.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(size=(2, img, img, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(2, img // 16, img // 16, 3)),
                       jnp.float32)
    rb = np.zeros((2, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, (2, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    rb = jnp.asarray(rb)
    rm = jnp.asarray(np.ones((2, 4), bool))

    o32 = m32.apply(params, state, x, maps, rb, rm, mode=0)
    o16 = m16.apply(params, state, x, maps, rb, rm, mode=0)
    v32 = np.asarray(o32["valid"])
    v16 = np.asarray(o16["valid"])
    # same number of surviving proposals (scores move by <1e-2 typically;
    # threshold comparisons are far from the boundary with random nets)
    assert abs(int(v32.sum()) - int(v16.sum())) <= 2
    # rows may permute under the priority sort (tiny score shifts), and
    # exp(dw) amplifies bf16 rounding of the random-weight regression
    # outputs — so match rows by confidence proximity, not position
    for b in range(2):
        c32 = np.sort(np.asarray(o32["boxes"])[b][v32[b]][:, 4])
        c16 = np.sort(np.asarray(o16["boxes"])[b][v16[b]][:, 4])
        n = min(len(c32), len(c16))
        np.testing.assert_allclose(c16[:n], c32[:n], atol=0.05)

    # train path ignores heads_dtype (bit-identical losses)
    t = np.zeros((2, 3, 5), np.float32)
    t[..., 1:3] = rng.uniform(0.3, 0.7, (2, 3, 2))
    t[..., 3:5] = rng.uniform(0.1, 0.3, (2, 3, 2))
    tm = jnp.asarray(np.ones((2, 3), bool))
    key = jax.random.PRNGKey(7)
    l32 = m32.apply(params, state, x, maps, rb, rm, mode=0, train=True,
                    targets=jnp.asarray(t), tmask=tm, rng=key)["loss"]
    l16 = m16.apply(params, state, x, maps, rb, rm, mode=0, train=True,
                    targets=jnp.asarray(t), tmask=tm, rng=key)["loss"]
    assert float(l32) == float(l16)
