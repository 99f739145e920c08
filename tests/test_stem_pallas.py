"""Pallas fused stem (ops/stem_pallas.py, interpret mode): exactness vs
the XLA conv+bias+leaky+pool composition. The planar ``fused_stem_planar``
(batched variant) is the one that compiles under Mosaic and runs on-chip
(validated round 3: exact to 2.4e-7 vs a HIGHEST-precision reference,
1.9x the plain XLA stage at b32 — benchmarks/stem_pallas_check.py); the
NHWC ``fused_stem`` spellings remain interpret-only references."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from millieye_tpu.ops.stem_pallas import fused_stem, fused_stem_planar


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_tests():
    """Per-TEST compiler-state flush, this module only. The module-
    boundary flush (conftest) bounds cross-module accumulation, but
    this file alone now compiles ~40 big interpret-Pallas graphs and
    reproducibly re-hit the XLA:CPU backend_compile segfault WITHIN the
    module once the r5 tests were added (crash at the second-to-last
    test, serial and concurrent runs alike; every test passes alone).
    Recompiles are absorbed by the persistent ``.jax_cache_cpu``."""
    yield
    jax.clear_caches()


def _plain(x, w, b):
    y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO",
                                                    "NHWC")) + b
    y = jnp.where(y > 0, y, 0.1 * y)
    return lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), [(0, 0)] * 4)


@pytest.mark.parametrize("shape,th", [((2, 32, 32, 3, 16), 8),
                                      ((1, 64, 48, 5, 8), 16)])
def test_fused_stem_matches_plain(shape, th):
    n, h, wd, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cout)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(x, w, b)
    got = fused_stem(x, w, b, th=th, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("variant", ["batched", "rowdot"])
@pytest.mark.parametrize("shape", [(2, 32, 32, 3, 16),
                                   (1, 40, 24, 5, 8)])
def test_fused_stem_planar_auto_band(shape, variant):
    """Planar kernel with band=None: 8-aligned bands (40 -> band 8,
    32 -> band 16) must reproduce the XLA composition, including odd
    lane-padding (W=24 pads to 128)."""
    n, h, wd, cin, cout = shape
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cout)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(x, w, b)
    got = fused_stem_planar(x, w, b, interpret=True, variant=variant)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


@pytest.mark.parametrize("shape", [(1, 26, 26, 32, 16),   # h%8 != 0:
                                   (1, 20, 20, 16, 8)])   # band-grid pad
def test_fused_stem_planar_row_padded_bands(shape):
    """Heights off the 8-row band grid (the deep stem stages: 52px at
    stage 6, or any odd crop) are zero-padded up to it and the garbage
    pooled rows sliced off — values must still match XLA exactly."""
    n, h, wd, cin, cout = shape
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cout)),
                    jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    got = fused_stem_planar(x, w, b, interpret=True)
    assert got.shape == (n, h // 2, wd // 2, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_plain(x, w, b)),
                               atol=1e-4)


def test_fused_stem_planar_deep_stage_channels():
    """Stage-4/6-like channel counts (cin 32/64 — K=288/576 patch
    scratches) through the same generic planar kernel, at a reduced
    spatial size so interpret mode stays fast."""
    rng = np.random.default_rng(5)
    for (cin, cout) in ((32, 64), (64, 128)):
        x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, cin)), jnp.float32)
        w = jnp.asarray(0.2 * rng.standard_normal((3, 3, cin, cout)),
                        jnp.float32)
        b = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
        got = fused_stem_planar(x, w, b, interpret=True)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_plain(x, w, b)), atol=1e-4)


def test_fused_stem_out_dtype():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((3, 3, 3, 4)), jnp.float32)
    b = jnp.zeros(4, jnp.float32)
    out = fused_stem(x, w, b, th=8, interpret=True,
                     out_dtype=jnp.bfloat16)
    assert out.dtype == jnp.bfloat16 and out.shape == (1, 8, 8, 4)


def test_darknet_pallas_stem_matches_plain():
    """Darknet(pallas_stem_stages=(0, 2)) with folded BN must reproduce
    the plain graph (interpret mode on CPU); train/unfolded params fall
    back to the XLA path."""
    import jax
    import jax.numpy as jnp
    from millieye_tpu.models import Darknet, tiny_yolov3_defs

    S = 64
    defs = tiny_yolov3_defs(num_classes=12, img_size=S)
    plain_net = Darknet(defs, img_size=S)
    pal_net = Darknet(defs, img_size=S, pallas_stem_stages=(0, 2))
    params, state = plain_net.init(jax.random.PRNGKey(0))
    fp, fs = plain_net.fold_batchnorm(params, state)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, S, S, 3)), jnp.float32)
    ref = plain_net.apply(fp, fs, x)
    got = pal_net.apply(fp, fs, x)
    np.testing.assert_allclose(np.asarray(got["feature_map"]),
                               np.asarray(ref["feature_map"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["detections"]),
                               np.asarray(ref["detections"]),
                               rtol=1e-4, atol=1e-3)
    # unfolded (BN present) params: kernel must NOT engage; still exact
    got2 = pal_net.apply(params, state, x)
    ref2 = plain_net.apply(params, state, x)
    np.testing.assert_allclose(np.asarray(got2["detections"]),
                               np.asarray(ref2["detections"]),
                               rtol=1e-6, atol=1e-6)


def test_fused_stem2_matches_two_stages():
    """Double-fused kernel == two XLA conv+pool stages (interpret),
    incl. the DMA input path, halo layout, and f16 store."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_planar

    rng = np.random.default_rng(3)
    n, h, cin, cmid, cout = 1, 64, 3, 8, 16
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, h, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    got = fused_stem2_planar(x, w0, b0, w1, b1, interpret=True)
    assert got.shape == (n, h // 4, h // 4, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)
    g16 = fused_stem2_planar(x, w0, b0, w1, b1, interpret=True,
                             out_dtype=jnp.float16)
    assert g16.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(g16, dtype=np.float32),
                               np.asarray(ref), atol=2e-2)


def test_darknet_pallas_stem_pair_matches_plain():
    """Darknet(pallas_stem_pair=True): stages 0+2 run as ONE kernel, the
    pass-through slots don't disturb the rest of the graph, and unfolded
    params fall back to XLA."""
    import jax
    from millieye_tpu.models import Darknet, tiny_yolov3_defs

    S = 64
    defs = tiny_yolov3_defs(num_classes=12, img_size=S)
    plain_net = Darknet(defs, img_size=S)
    pair_net = Darknet(defs, img_size=S, pallas_stem_stages=(0, 2),
                       pallas_stem_pair=True)
    params, state = plain_net.init(jax.random.PRNGKey(0))
    fp, fs = plain_net.fold_batchnorm(params, state)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(2, S, S, 3)), jnp.float32)
    ref = plain_net.apply(fp, fs, x)
    got = pair_net.apply(fp, fs, x)
    np.testing.assert_allclose(np.asarray(got["feature_map"]),
                               np.asarray(ref["feature_map"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got["detections"]),
                               np.asarray(ref["detections"]),
                               rtol=1e-4, atol=1e-3)
    # unfolded params: pair must NOT engage
    got2 = pair_net.apply(params, state, x)
    ref2 = plain_net.apply(params, state, x)
    np.testing.assert_allclose(np.asarray(got2["detections"]),
                               np.asarray(ref2["detections"]),
                               rtol=1e-6, atol=1e-6)
    # _bf16s variant names route the SAME kernel with bf16 scratches
    # (DEFAULT precision enforced by the kernel): detections stay within
    # the bf16 product-rounding class of the f32-scratch pair
    bf_net = Darknet(defs, img_size=S, pallas_stem_stages=(0, 2),
                     pallas_stem_pair=True,
                     pallas_stem_pair_variant="packed_bf16s",
                     pallas_stem_precision="default")
    got3 = bf_net.apply(fp, fs, x)
    np.testing.assert_allclose(np.asarray(got3["feature_map"]),
                               np.asarray(ref["feature_map"]),
                               rtol=0.05, atol=0.05)


def test_pallas_stem_pair_validation():
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    with pytest.raises(ValueError, match="consecutive"):
        Darknet(tiny_yolov3_defs(num_classes=12, img_size=64), img_size=64,
                pallas_stem_stages=(0, 4), pallas_stem_pair=True)
    # scratch dtype rides the variant NAME (r5): _bf16s suffixes are
    # valid for the kernel families, typos and select_bf16s are not
    for bad in ("packedx", "select_bf16s", "phase_bf16"):
        with pytest.raises(ValueError, match="pair_variant"):
            Darknet(tiny_yolov3_defs(num_classes=12, img_size=64),
                    img_size=64, pallas_stem_pair_variant=bad)
    for ok in ("phase_bf16s", "packed_bf16s", "s2d_bf16s", "s2d8_bf16s"):
        Darknet(tiny_yolov3_defs(num_classes=12, img_size=64),
                img_size=64, pallas_stem_pair_variant=ok)


def test_serving_preset_pallas_stem_builds():
    from millieye_tpu.cli._common import build_fusion, serving_overrides
    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_stem")
    model, params, state = build_fusion(
        None, s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    assert model.darknet.pallas_stem_stages == (0, 2)


@pytest.mark.parametrize("shape", [(2, 64, 64, 3, 16, 32),
                                   (1, 32, 48, 5, 8, 16)])
def test_fused_stem2_phase_matches_two_stages(shape):
    """Phase-split double-fused kernel (lane-block pool, no select
    matmul) == two XLA conv+pool stages (interpret), including non-square
    widths, f16 store, and the bf16-scratch default-precision variant
    (which must stay within DEFAULT-dot rounding of the exact result)."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_phase

    n, h, wd, cin, cmid, cout = shape
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    got = fused_stem2_phase(x, w0, b0, w1, b1, interpret=True)
    assert got.shape == (n, h // 4, wd // 4, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)
    g16 = fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                            out_dtype=jnp.float16)
    assert g16.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(g16, dtype=np.float32),
                               np.asarray(ref), atol=2e-2)
    gbf = fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                            precision="default",
                            scratch_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(ref),
                               atol=0.05, rtol=0.03)


def test_fused_stem2_phase_rejects_bf16_scratch_at_highest():
    from millieye_tpu.ops.stem_pallas import fused_stem2_phase

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    w0 = jnp.zeros((3, 3, 3, 8), jnp.float32)
    w1 = jnp.zeros((3, 3, 8, 16), jnp.float32)
    with pytest.raises(AssertionError):
        fused_stem2_phase(x, w0, jnp.zeros(8), w1, jnp.zeros(16),
                          interpret=True, scratch_dtype=jnp.bfloat16)


def test_fused_stem2_phase_bf16_bisect_and_f32_default_twins():
    """Round-5 additions: (a) the ``bf16_only`` bisect knob (ONE buffer
    bf16 at a time — the on-chip compile-crash localizer for the
    bf16-scratch variants) stays within DEFAULT-dot rounding of the
    exact two-stage result; (b) the DEFAULT-precision f32-scratch
    packed/s2d kernels — the flagship-replacement candidates the r4
    gate never measured — match the phase kernel to accumulation-order
    tolerance (identical products, identical operand rounding)."""
    from millieye_tpu.ops.stem_pallas import (fused_stem2_packed,
                                              fused_stem2_phase,
                                              fused_stem2_s2d)

    n, h, wd, cin, cmid, cout = 1, 64, 52, 3, 16, 32
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = np.asarray(_plain(_plain(x, w0, b0), w1, b1))
    for part in ("xb", "s0", "s1"):
        got = fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                                precision="default", bf16_only=part)
        np.testing.assert_allclose(np.asarray(got), ref, atol=0.05,
                                   rtol=0.03, err_msg=part)
    # bf16_only bisects the f32-scratch kernel only
    with pytest.raises(AssertionError):
        fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                          precision="default",
                          scratch_dtype=jnp.bfloat16, bf16_only="xb")
    with pytest.raises(AssertionError):
        fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                          bf16_only="xb")
    ph = np.asarray(fused_stem2_phase(x, w0, b0, w1, b1, interpret=True,
                                      precision="default"))
    for fn in (fused_stem2_packed, fused_stem2_s2d):
        got = np.asarray(fn(x, w0, b0, w1, b1, interpret=True,
                            precision="default"))
        np.testing.assert_allclose(got, ph, atol=1e-5, rtol=1e-5,
                                   err_msg=fn.__name__)


def test_serving_preset_pallas_max_builds_and_runs():
    """pallas_max preset (phase stem pair + pallas RoI): builds, and one
    mode-0 forward on CPU (interpret kernels) matches the einsum/select
    build within the DEFAULT-dot rounding class."""
    import numpy as np

    from millieye_tpu.cli._common import build_fusion, serving_overrides

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_max")
    assert over["roi_impl"] == "pallas"
    assert pallas_kw["pallas_variant"] == "phase"

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(params, state, images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()


@pytest.mark.parametrize("shape", [(2, 64, 64, 3, 16, 32),
                                   (1, 96, 48, 3, 8, 16),
                                   (1, 32, 64, 5, 8, 16)])
def test_fused_stem2_packed_matches_two_stages(shape):
    """K-packed double-fused kernel (stage-0 row-groups packed into the
    MXU K dimension via a block-diagonal weight tile) == two XLA
    conv+pool stages (interpret), covering the full-superband, epilogue
    (h % 64 == 32) and epilogue-only (h < 64) paths, plus f16 store and
    the bf16-scratch default-precision variant."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_packed

    n, h, wd, cin, cmid, cout = shape
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    got = fused_stem2_packed(x, w0, b0, w1, b1, interpret=True)
    assert got.shape == (n, h // 4, wd // 4, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)
    g_s1 = fused_stem2_packed(x, w0, b0, w1, b1, interpret=True,
                              pack_stage1=False)
    np.testing.assert_allclose(np.asarray(g_s1), np.asarray(ref),
                               atol=1e-4)
    g16 = fused_stem2_packed(x, w0, b0, w1, b1, interpret=True,
                             out_dtype=jnp.float16)
    assert g16.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(g16, dtype=np.float32),
                               np.asarray(ref), atol=2e-2)
    gbf = fused_stem2_packed(x, w0, b0, w1, b1, interpret=True,
                             precision="default",
                             scratch_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(ref),
                               atol=0.05, rtol=0.03)


def test_serving_preset_pallas_packed_builds_and_runs():
    """pallas_packed preset (K-packed stem pair + pallas RoI): builds,
    darknet passes f32 scratches (scratch dtype rides the variant
    NAME since r5 — bf16 was the compile-crash config), and one mode-0
    forward on CPU (interpret kernels) returns finite boxes."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_packed")
    assert over["roi_impl"] == "pallas"
    assert pallas_kw["pallas_variant"] == "packed"

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(params, state, images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()


@pytest.mark.parametrize("shape", [(2, 64, 64, 3, 16, 32),
                                   (1, 96, 48, 3, 8, 16),
                                   (1, 128, 64, 3, 8, 16),
                                   (1, 32, 64, 5, 8, 16)])
def test_fused_stem2_s2d_matches_two_stages(shape):
    """s2d-stage-1 double-fused kernel (2x2 space-to-depth phase grids,
    one full-M [4*c_out, 16*c_mid] dot per 8-output-row band) == two XLA
    conv+pool stages (interpret), over the superband, epilogue and
    epilogue-only stage-0 paths at BOTH stage-0 group counts (4 and the
    full-M 8), plus f16 store and the bf16-scratch default-precision
    variant."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_s2d

    n, h, wd, cin, cmid, cout = shape
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    for g0 in (4, 8):
        got = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True,
                              groups0=g0)
        assert got.shape == (n, h // 4, wd // 4, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4)
    g16 = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True,
                          out_dtype=jnp.float16)
    assert g16.dtype == jnp.float16
    np.testing.assert_allclose(np.asarray(g16, dtype=np.float32),
                               np.asarray(ref), atol=2e-2)
    gbf = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True,
                          precision="default",
                          scratch_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(ref),
                               atol=0.05, rtol=0.03)


@pytest.mark.parametrize("shape", [(1, 40, 40, 8, 16, 24),    # h%32 != 0
                                   (1, 104, 24, 4, 8, 16),    # stage-4 h
                                   (1, 20, 20, 6, 8, 12)])    # h < 32
def test_fused_stem2_s2d_row_padded_and_g2(shape):
    """Deep-pair generalization: heights off the 32-row grid are padded
    up to it (the kernel re-zeroes the padded phase rows after stage 0,
    so the LAST valid output row keeps true zero-halo semantics), and
    groups0=2 (the c_mid=64 full-M tiling) matches the XLA two-stage
    composition like 4/8 do."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_s2d

    n, h, wd, cin, cmid, cout = shape
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, wd, cin)), jnp.float32)
    w0 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cin, cmid)),
                     jnp.float32)
    b0 = jnp.asarray(0.1 * rng.standard_normal(cmid), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.standard_normal((3, 3, cmid, cout)),
                     jnp.float32)
    b1 = jnp.asarray(0.1 * rng.standard_normal(cout), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    for g0 in (2, 4):
        got = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True,
                              groups0=g0)
        assert got.shape == (n, h // 4, wd // 4, cout), (got.shape, g0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, err_msg=f"groups0={g0}")


def test_fused_stem2_s2d_deep_pair_channels():
    """Stage-4/6 channel counts (cin 32 -> c_mid 64 -> c_out 128) at a
    reduced spatial size: the g0=2 tiling the pallas_pair2 preset uses,
    plus its bf16-scratch default-precision serving spelling."""
    from millieye_tpu.ops.stem_pallas import fused_stem2_s2d

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 24, 24, 32)), jnp.float32)
    w0 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 32, 64)),
                     jnp.float32)
    b0 = jnp.asarray(0.05 * rng.standard_normal(64), jnp.float32)
    w1 = jnp.asarray(0.1 * rng.standard_normal((3, 3, 64, 128)),
                     jnp.float32)
    b1 = jnp.asarray(0.05 * rng.standard_normal(128), jnp.float32)
    ref = _plain(_plain(x, w0, b0), w1, b1)
    got = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True, groups0=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)
    gbf = fused_stem2_s2d(x, w0, b0, w1, b1, interpret=True, groups0=2,
                          precision="default",
                          scratch_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(gbf), np.asarray(ref),
                               atol=0.08, rtol=0.05)


def test_serving_preset_pallas_s2d_builds_and_runs():
    """pallas_s2d preset: builds, darknet dispatches the s2d pair kernel
    with f32 scratches at default precision (r5: scratch dtype rides
    the variant name), and one mode-0 forward on
    CPU (interpret kernels) returns finite boxes."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_s2d")
    assert over["roi_impl"] == "pallas"
    assert pallas_kw["pallas_variant"] == "s2d"

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(params, state, images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_serving_preset_pallas_deep_builds_and_runs():
    """pallas_deep preset: the s2d pair on stages 0+2 PLUS single-stage
    planar kernels on stages 4 and 6 (the maxpools behind them become
    pass-throughs); one mode-0 forward on CPU returns finite boxes."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_deep")
    assert pallas_kw["pallas_stem"] == (0, 2, 4, 6)
    assert pallas_kw["pallas_pair"] and pallas_kw["pallas_variant"] == "s2d"

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(params, state, images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()


def test_serving_preset_pallas_pair2_builds_and_runs():
    """pallas_pair2: BOTH stem pairs double-fused (0+2 at the variant's
    group count, 4+6 at the deep g0=2 tiling). Finite forward, and the
    darknet forward matches the plain XLA composition at the same
    folded weights (interpret kernels are exact at HIGHEST; at the
    preset's DEFAULT precision CPU interpret is still f32, so only
    storage rounding separates them)."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides
    from millieye_tpu.models import Darknet, tiny_yolov3_defs

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_pair2")
    assert pallas_kw["pallas_pairs"] == "all"
    assert pallas_kw["pallas_stem"] == (0, 2, 4, 6)

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(dict(params, darknet=fp), dict(state, darknet=fs),
                      images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()

    # darknet-level value check vs the plain XLA graph at f32
    dn_pair = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S, pallas_stem_stages=(0, 2, 4, 6),
                      pallas_stem_pair=True, pallas_stem_pairs="all",
                      pallas_stem_pair_variant="s2d")
    dn_ref = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                     img_size=S)
    p, s = dn_pair.init(jax.random.PRNGKey(1))
    fp2, fs2 = dn_pair.fold_batchnorm(p, s)
    got = dn_pair.apply(fp2, fs2, images)
    ref = dn_ref.apply(fp2, fs2, images)
    np.testing.assert_allclose(np.asarray(got["feature_map"]),
                               np.asarray(ref["feature_map"]),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["detections"]),
                               np.asarray(ref["detections"]),
                               atol=2e-3, rtol=1e-3)


def test_pallas_deep_matches_s2d_preset():
    """pallas_deep differs from pallas_s2d only in HOW stages 4/6 are
    computed (planar kernel, f32 interpret arithmetic vs the XLA ladder's
    stage-4-f32 / stage-6-bf16 convs) — detections must agree to the
    bf16 rounding class with the identical keep set."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    rng = np.random.default_rng(3)
    S = 128
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    rmask = jnp.ones((1, 4), bool)

    outs = {}
    for preset in ("pallas_s2d", "pallas_deep"):
        s2d, hi, store, pallas_kw, over = serving_overrides(preset)

        class A:
            model_def = None
            img_size = S

        model, params, state = build_fusion(
            A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
            **pallas_kw, conf_thresh=0.05, max_det=16, max_radar=4,
            pre_nms_top_k=64, nms_use_pallas=False, **over)
        fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                              state["darknet"])
        out = model.apply(dict(params, darknet=fp),
                          dict(state, darknet=fs), images, maps,
                          jnp.asarray(rb), rmask, mode=0)
        outs[preset] = (np.asarray(out["boxes"]),
                        np.asarray(out["valid"]))

    ref_b, ref_v = outs["pallas_s2d"]
    b, v = outs["pallas_deep"]
    np.testing.assert_array_equal(v, ref_v)
    np.testing.assert_allclose(b, ref_b, atol=5e-2, rtol=5e-3)


def test_pallas_preset_family_cross_parity():
    """pallas_packed / pallas_s2d / pallas_s2d8 share the same dots
    (DEFAULT precision, f32 scratches since r5, pallas RoI) — at identical
    weights the three presets must produce the same detections to the
    bf16 rounding class, and the identical keep set."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    rng = np.random.default_rng(3)
    S = 128
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    rmask = jnp.ones((1, 4), bool)

    outs = {}
    for preset in ("pallas_packed", "pallas_s2d", "pallas_s2d8"):
        s2d, hi, store, pallas_kw, over = serving_overrides(preset)

        class A:
            model_def = None
            img_size = S

        model, params, state = build_fusion(
            A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
            **pallas_kw, conf_thresh=0.05, max_det=16, max_radar=4,
            pre_nms_top_k=64, nms_use_pallas=False, **over)
        fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                              state["darknet"])
        out = model.apply(dict(params, darknet=fp),
                          dict(state, darknet=fs), images, maps,
                          jnp.asarray(rb), rmask, mode=0)
        outs[preset] = (np.asarray(out["boxes"]),
                        np.asarray(out["valid"]))

    ref_b, ref_v = outs["pallas_packed"]
    for preset in ("pallas_s2d", "pallas_s2d8"):
        b, v = outs[preset]
        np.testing.assert_array_equal(v, ref_v)
        np.testing.assert_allclose(b, ref_b, atol=2e-3)


def test_serving_preset_pallas_max4_builds_and_runs():
    """pallas_max4: the phase pair on stages 0+2, a single-stage planar
    kernel on stage 4 only (stage 6 stays XLA — its 64-channel input is
    MXU-native and xla_default outran the kernel 11x in the r3 chip
    gate); Pallas RoI crops. One mode-0 forward on CPU returns finite
    boxes."""
    import numpy as np
    from millieye_tpu.cli._common import build_fusion, serving_overrides

    s2d, hi, store, pallas_kw, over = serving_overrides("pallas_max4")
    assert pallas_kw["pallas_stem"] == (0, 2, 4)
    assert pallas_kw["pallas_pair"]
    assert pallas_kw["pallas_variant"] == "phase"
    assert pallas_kw["pallas_pairs"] == "first"
    assert over["roi_impl"] == "pallas"

    class A:
        model_def = None
        img_size = 128

    model, params, state = build_fusion(
        A(), s2d_stages=s2d, hi_prec_stages=hi, hi_prec_store=store,
        **pallas_kw, conf_thresh=0.05, max_det=16,
        max_radar=4, pre_nms_top_k=64, nms_use_pallas=False, **over)
    assert model.darknet.pallas_stem_stages == (0, 2, 4)
    fp, fs = model.darknet.fold_batchnorm(params["darknet"],
                                          state["darknet"])
    params = dict(params, darknet=fp)
    state = dict(state, darknet=fs)
    S = model.darknet.img_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(1, S, S, 3)), jnp.float32)
    maps = jnp.asarray(rng.uniform(size=(1, S // 16, S // 16, 3)),
                       jnp.float32)
    rb = np.zeros((1, 4, 4), np.float32)
    rb[..., :2] = rng.uniform(0.1, 0.5, size=(1, 4, 2))
    rb[..., 2:] = rb[..., :2] + 0.3
    out = model.apply(params, state, images, maps, jnp.asarray(rb),
                      jnp.ones((1, 4), bool), mode=0)
    assert np.isfinite(np.asarray(out["boxes"])).all()
