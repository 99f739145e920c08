"""Functional, cfg-driven Darknet (tiny-YOLOv3 family) for TPU.

Design (vs. reference ``module*/yolov3/models.py``):

* **Functional**: parameters and BN running statistics are explicit pytrees
  (``params``, ``state``); ``apply`` is a pure function, jit/grad/vmap/pjit
  compose over it. No module objects hold tensors.
* **NHWC layout** (TPU-native); conv kernels are HWIO. The darknet
  ``.weights`` loader (io/darknet_weights.py) does the transposition.
* **One compiled graph**: the layer walk is traced once; the YOLO decode
  (sigmoid/exp/grid offsets, yolov3/models.py:132-176) happens in the same
  program. Decode runs in float32 (exp overflows bf16).
* **Feature tap**: the stride-16, 256-channel map after block
  ``feature_tap`` (=8 in tiny-YOLOv3) is returned with a
  ``stop_gradient``, mirroring the ``.detach()`` at models.py:253-255 that
  freezes the backbone w.r.t. the fusion heads.
* ``fold_batchnorm`` bakes eval-mode BN into conv weights for the
  inference path — the conv+BN+leaky block becomes a single MXU conv with
  bias, nothing left for the VPU but the activation (which XLA fuses).

Block-dict schema is shared with ``io.config.parse_model_config`` and
``models.zoo``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from millieye_tpu.io.config import parse_model_config

_BN_EPS = 1e-5
# torch BatchNorm2d(momentum=0.9) at models.py:39: running <- 0.1*running + 0.9*batch
_BN_MOMENTUM = 0.9


def _conv2d(x, w, stride, pad, dtype):
    return lax.conv_general_dilated(
        x.astype(dtype),
        w.astype(dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _maxpool(x, size, stride):
    if size == 2 and stride == 1:
        # reference pads right/bottom by 1 to keep the grid size, with
        # ZEROS (nn.ZeroPad2d((0,1,0,1)), models.py:46-48) — an explicit
        # zero pad, NOT reduce_window padding (which fills with the -inf
        # init value): where every border activation is negative, the
        # reference's max includes the 0 and clamps there. Caught by the
        # checkpoint-parity harness (benchmarks/checkpoint_parity.py) as
        # an up-to-0.009 objectness divergence on the last grid row/col.
        x = jnp.pad(x, [(0, 0), (0, 1), (0, 1), (0, 0)])
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, size, size, 1),
        window_strides=(1, stride, stride, 1),
        padding=[(0, 0)] * 4,
    )


def _upsample2x(x, factor):
    return jnp.repeat(jnp.repeat(x, factor, axis=1), factor, axis=2)


def space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C], phase-major channel layout."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


def im2col_stem_weight(w):
    """[3, 3, C, D] conv kernel -> [16*C, 4*D] patch-matmul matrix.

    Rewrites ``maxpool2(conv3x3_s1(x))`` as ONE matmul over 4x4 stride-2
    patches: pooled output (i, j) needs the 4 conv outputs at
    (2i+a, 2j+b), a,b in {0,1}, whose 3x3 taps all lie in the 4x4 input
    window starting at (2i-1, 2j-1). Patch channel layout is
    (dy*4+dx)-major then input channel; output column layout is
    (a*2+b)-major then output channel, so a reshape to [..., 4, D] +
    max(axis=-2) IS the pool. Exact for the same reason as s2d
    (phase groups are the pool window, leaky is monotone), but the
    patch extraction is 16 SPATIAL slices — no lane-dimension shuffle
    (the s2d transpose that made fold_s2d lose end-to-end) — and the
    matmul contracts over 16*C lanes (48 for the 3-channel stem vs 3:
    the stage-0 conv otherwise runs at ~2% MXU lane utilization).

    MEASURED NEGATIVE RESULT (BENCH_DETAILS fusion_fwd_*_im2col_*): the
    XLA lowering of the stride-2 spatial slices + concat is ~7x slower
    than the plain stage end-to-end (443 vs 3279 fps b32) — sublane-
    granular strided reads are their own transpose pathology. Kept as an
    exact, tested opt-in and as documentation that the stem's lane
    problem needs a Pallas kernel (fused conv+pool with VMEM-resident
    patches), not an XLA-level layout rewrite.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "im2col stem transform expects 3x3 kernels"
    wm = jnp.zeros((16 * cin, 4 * cout), w.dtype)
    for p in range(4):
        a, b = p // 2, p % 2
        for u in range(3):
            for v in range(3):
                t = (a + u) * 4 + (b + v)
                wm = wm.at[t * cin:(t + 1) * cin,
                           p * cout:(p + 1) * cout].set(w[u, v])
    return wm


def s2d_conv_weight(w):
    """[3, 3, C, D] conv kernel -> [3, 3, 4C, 4D] phase-decomposed kernel.

    Rewrites ``maxpool2(conv3x3_s1(x))`` as a stride-1 conv over the
    half-resolution space-to-depth tensor: output phase (a, b) of the
    full-res conv at block (i, j) reads input pixels (2i+a+u-1, 2j+b+v-1),
    i.e. a 3x3 window of 2x2 blocks; the mapping below places each
    original tap at its (block-offset, input-phase) slot — a pure
    rearrangement with structural zeros (4x MACs, 4x MXU input lanes;
    measured 2.5x faster than the plain stage for the 3->16 stem conv).
    Exactness: the 4 output-phase channel groups ARE the 2x2 pool window,
    so ``max`` over them + bias + (monotone) activation reproduces
    conv -> bias -> act -> maxpool bit-for-bit.
    """
    k, _, cin, cout = w.shape
    assert k == 3, "s2d transform expects 3x3 kernels"
    wp = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for ph_out in range(4):
        a, b = ph_out // 2, ph_out % 2
        for u in range(3):
            for v in range(3):
                by, py = divmod(a + u - 1 + 2, 2)
                bx, px = divmod(b + v - 1 + 2, 2)
                ph_in = py * 2 + px
                wp = wp.at[by - 1 + 1, bx - 1 + 1,
                           ph_in * cin:(ph_in + 1) * cin,
                           ph_out * cout:(ph_out + 1) * cout].set(w[u, v])
    return wp


def decode_yolo(raw, anchors, num_classes, img_dim):
    """Decode one YOLO scale.

    raw: [N, G, G, A*(5+C)] conv output. Returns
    (detections [N, A*G*G, 5+C] in image scale, pred [N, A, G, G, 5+C]
    with (sigmoid-x, sigmoid-y, tw, th, sigmoid-conf, sigmoid-cls) — the
    representation the loss consumes, yolov3/models.py:150-167).

    Flattening order is anchor-major then row then column, matching the
    reference's ``view(num_samples, -1, ...)`` on an [N, A, G, G] tensor.
    """
    n, g = raw.shape[0], raw.shape[1]
    a = len(anchors)
    f = 5 + num_classes
    raw = raw.reshape(n, g, g, a, f).transpose(0, 3, 1, 2, 4)  # [N,A,G,G,F]
    raw = raw.astype(jnp.float32)

    stride = img_dim / g
    anchors = jnp.asarray(anchors, jnp.float32)  # pixel units

    xy = jax.nn.sigmoid(raw[..., 0:2])
    twh = raw[..., 2:4]
    conf = jax.nn.sigmoid(raw[..., 4:5])
    cls = jax.nn.sigmoid(raw[..., 5:])

    gy = lax.broadcasted_iota(jnp.float32, (g, g), 0)
    gx = lax.broadcasted_iota(jnp.float32, (g, g), 1)
    grid = jnp.stack([gx, gy], -1)[None, None]                 # [1,1,G,G,2]
    bxy = (xy + grid) * stride
    # clamp keeps decode finite for arbitrary weights (exp(20)*anchor is
    # ~1e10 px — unreachable by any trained net, so no behavior change)
    bwh = jnp.exp(jnp.clip(twh, -20.0, 20.0)) * anchors[None, :, None, None, :]

    det = jnp.concatenate([bxy, bwh, conf, cls], -1).reshape(n, a * g * g, f)
    pred = jnp.concatenate([xy, twh, conf, cls], -1)
    return det, pred


class Darknet:
    """cfg/zoo-driven YOLO graph. Stateless; owns only the layer plan."""

    def __init__(self, config, img_size=416, feature_tap=8, s2d_stages=(),
                 hi_prec_stages=(), hi_prec_store=None, im2col_stages=(),
                 pallas_stem_stages=(), pallas_stem_variant="batched",
                 pallas_stem_pair=False, pallas_stem_precision="highest",
                 pallas_stem_pair_variant="select",
                 pallas_stem_pairs="first"):
        if isinstance(config, (str,)):
            config = parse_model_config(config)
        self.hyperparams = config[0]
        self.block_defs = list(config[1:])
        self.img_size = img_size
        self.feature_tap = feature_tap
        self._plan = self._build_plan()
        self.s2d_stages = tuple(s2d_stages)
        self.im2col_stages = tuple(im2col_stages)
        # Pallas fused conv+pool stem (ops/stem_pallas.py): the full-res
        # conv output never touches HBM — inference path, folded BN only
        self.pallas_stem_stages = tuple(pallas_stem_stages)
        self.pallas_stem_variant = pallas_stem_variant
        # double-fused pair (ops/stem_pallas.py:fused_stem2_planar): the
        # FIRST two pallas stages run as ONE kernel — the half-res
        # intermediate never leaves VMEM, so its hi_prec_store slot is
        # moot and stage lo+1..lo+3 become pass-throughs at inference
        self.pallas_stem_pair = bool(pallas_stem_pair)
        # "first" = only the lowest pair (stages lo/lo+2, the shipped
        # round-3 behavior); "all" = also double-fuse every later
        # consecutive stage pair in pallas_stem_stages (4+6 — the deep
        # pair, s2d-family kernels only)
        if pallas_stem_pairs not in ("first", "all"):
            raise ValueError(
                f"unknown pallas_stem_pairs {pallas_stem_pairs!r}")
        self.pallas_stem_pairs = pallas_stem_pairs
        # pair-kernel spelling: "select" = one-hot pool-select matmuls
        # (fused_stem2_planar), "phase" = phase-grouped lanes with the
        # pool as lane-block maxes (fused_stem2_phase, ~9% faster
        # on-chip at DEFAULT dots, bit-comparable), "packed" = phase +
        # stage-0 K-packing (4 row-groups per MXU column via a block-
        # diagonal weight tile, fused_stem2_packed — same numerics),
        # "s2d" = packed stage 0 + 2x2 space-to-depth stage 1 (one
        # full-M [4*c_out, 16*c_mid] dot per 8-output-row band,
        # fused_stem2_s2d — same products, s2d-regrouped). A "_bf16s"
        # suffix (phase/packed/s2d/s2d8, DEFAULT precision only) stores
        # the DMA'd bands and patch scratches in bf16 — bit-identical
        # numerics (DEFAULT dots round inputs to bf16 regardless) at
        # half the fill traffic. Scratch dtype is part of the VARIANT
        # NAME, not inferred from precision: the old auto-bf16 coupling
        # selected the one configuration that crashes the Mosaic
        # compile helper (r4 on-chip gate, 2026-08-19, log lost in a
        # runs/ wipe; ops/stem_pallas_rejected.py mirrors the record —
        # every bf16-scratch kernel, pre the DMA tile-alignment fix).
        base_variant = (pallas_stem_pair_variant[:-6]
                        if pallas_stem_pair_variant.endswith("_bf16s")
                        else pallas_stem_pair_variant)
        if (base_variant not in ("select", "phase", "packed", "s2d",
                                 "s2d8", "phase_s01", "phase_vmem",
                                 "phase_vmem_s01")
                or (pallas_stem_pair_variant.endswith("_bf16s")
                    and base_variant in ("select", "phase_s01",
                                         "phase_vmem_s01"))):
            raise ValueError(
                f"unknown pallas_stem_pair_variant "
                f"{pallas_stem_pair_variant!r} (a typo would otherwise "
                "silently run the fallback 'select' kernel)")
        self.pallas_stem_pair_variant = pallas_stem_pair_variant
        # conv-dot MXU passes inside the kernels ("highest"/"high"/
        # "default") — on-chip the dots dominate, and one-pass bf16
        # products with f32 accumulate ("default") run the fused pair
        # 2.4x faster than the XLA stages; stores stay on the hi_prec
        # ladder either way (the dark-mAP-critical knob)
        self.pallas_stem_precision = pallas_stem_precision
        if self.pallas_stem_pair:
            lo = min(self.pallas_stem_stages, default=0)
            if (lo, lo + 2) != tuple(sorted(self.pallas_stem_stages))[:2]:
                raise ValueError("pallas_stem_pair needs two consecutive "
                                 "fused stages (lo, lo+2) in "
                                 f"pallas_stem_stages, got "
                                 f"{self.pallas_stem_stages}")
        overlap = (set(self.s2d_stages) & set(self.im2col_stages)
                   | set(self.s2d_stages) & set(self.pallas_stem_stages)
                   | set(self.im2col_stages) & set(self.pallas_stem_stages))
        if overlap:
            raise ValueError(f"stages {sorted(overlap)} assigned to more "
                             "than one stem transform")
        # convs kept in float32 under a low-precision compute_dtype.
        # Mechanism (measured on the trained net): dark-frame object
        # contrast (~0.007) rides on O(1) bias-dominated activations, so
        # an 8-bit-mantissa dtype quantizes it to ~50% error at every
        # early-layer STORE — all-bf16 costs -0.043 dark mAP, f32 stem
        # convs recover it exactly. The stem stages are HBM-bound, so
        # ``hi_prec_store`` (e.g. jnp.float16, 11-bit mantissa) restores
        # the bandwidth saving while keeping f32 arithmetic.
        self.hi_prec_stages = tuple(hi_prec_stages)
        self.hi_prec_store = hi_prec_store
        self._validate_s2d_stages()
        self.yolo_blocks = [
            (i, b) for i, b in enumerate(self.block_defs) if b["type"] == "yolo"
        ]
        self.num_classes = (
            int(self.yolo_blocks[0][1]["classes"]) if self.yolo_blocks else 0
        )

    # -- static planning ----------------------------------------------------
    def _build_plan(self):
        """Resolve per-block channel counts and anchor sets."""
        plan = []
        channels = [int(self.hyperparams.get("channels", 3))]
        for block in self.block_defs:
            t = block["type"]
            info = {"type": t}
            if t == "convolutional":
                info.update(
                    in_ch=channels[-1],
                    filters=int(block["filters"]),
                    size=int(block["size"]),
                    stride=int(block["stride"]),
                    bn=int(block.get("batch_normalize", 0)) == 1,
                    act=block.get("activation", "linear"),
                )
                out = info["filters"]
            elif t == "maxpool":
                info.update(size=int(block["size"]), stride=int(block["stride"]))
                out = channels[-1]
            elif t == "upsample":
                info.update(factor=int(block["stride"]))
                out = channels[-1]
            elif t == "route":
                layers = [int(v) for v in block["layers"].split(",")]
                # mirror python negative-list indexing over prior outputs
                abs_layers = [
                    l if l >= 0 else len(plan) + l for l in layers
                ]
                info.update(layers=abs_layers)
                out = sum(channels[1:][l] for l in abs_layers)
            elif t == "shortcut":
                frm = int(block["from"])
                info.update(frm=len(plan) + frm if frm < 0 else frm)
                out = channels[1:][info["frm"]]
            elif t == "yolo":
                mask = [int(v) for v in block["mask"].split(",")]
                flat = [int(v) for v in block["anchors"].split(",")]
                pairs = list(zip(flat[::2], flat[1::2]))
                info.update(
                    anchors=tuple(pairs[m] for m in mask),
                    classes=int(block["classes"]),
                )
                out = channels[-1]
            else:
                raise ValueError(f"unknown block type {t!r}")
            plan.append(info)
            channels.append(out)
        return plan

    def _validate_s2d_stages(self):
        """Each s2d/im2col stage must be a 3x3 stride-1 conv immediately
        followed by a 2x2 stride-2 maxpool, with neither block
        route/shortcut-referenced or the feature tap (the fused output
        replaces both plan slots' resolutions)."""
        referenced = set()
        for info in self._plan:
            referenced.update(info.get("layers", ()))
            if "frm" in info:
                referenced.add(info["frm"])
        for i in (self.s2d_stages + self.im2col_stages
                  + self.pallas_stem_stages):
            if not 0 <= i < len(self._plan) - 1:
                raise ValueError(f"stem stage index {i} out of range "
                                 f"(plan has {len(self._plan)} blocks)")
            info, nxt = self._plan[i], self._plan[i + 1]
            ok = (info["type"] == "convolutional" and info["size"] == 3
                  and info["stride"] == 1 and nxt["type"] == "maxpool"
                  and nxt["size"] == 2 and nxt["stride"] == 2)
            if not ok:
                raise ValueError(f"block {i} is not a conv3x3s1+maxpool2s2 "
                                 "stage; cannot stem-fuse it")
            if i in referenced or i == self.feature_tap:
                raise ValueError(f"block {i} is route/tap-referenced; "
                                 "stem fusion would change its resolution")
        if self.pallas_stem_pair and self.pallas_stem_stages:
            lo = min(self.pallas_stem_stages)
            for j in (lo + 1, lo + 3):
                # the pair's pass-through slots hold the pair output, not
                # the real intermediates — nothing may read them
                if j in referenced or j == self.feature_tap:
                    raise ValueError(f"block {j} is route/tap-referenced; "
                                     "cannot double-fuse the stem pair")

    # -- parameters ----------------------------------------------------------
    def init(self, rng):
        """(params, state) pytrees; init matches weights_init_normal
        (utils/utils.py:29-37): conv ~ N(0, .02), BN gamma ~ N(1, .02).
        """
        params, state = [], []
        for info in self._plan:
            if info["type"] != "convolutional":
                params.append({})
                state.append({})
                continue
            rng, k1, k2 = jax.random.split(rng, 3)
            k = info["size"]
            w = 0.02 * jax.random.normal(
                k1, (k, k, info["in_ch"], info["filters"]), jnp.float32
            )
            if info["bn"]:
                c = info["filters"]
                params.append(
                    {
                        "w": w,
                        "gamma": 1.0 + 0.02 * jax.random.normal(k2, (c,), jnp.float32),
                        "beta": jnp.zeros((c,), jnp.float32),
                    }
                )
                state.append(
                    {
                        "mean": jnp.zeros((c,), jnp.float32),
                        "var": jnp.ones((c,), jnp.float32),
                    }
                )
            else:
                params.append({"w": w, "b": jnp.zeros((info["filters"],), jnp.float32)})
                state.append({})
        return params, state

    # -- forward --------------------------------------------------------------
    def apply(
        self,
        params,
        state,
        images,
        train=False,
        compute_dtype=jnp.float32,
        collect_act_stats=False,
    ):
        """Run the graph.

        images: [N, H, W, 3]. Returns a dict:
          feature_map  [N, H/16, W/16, 256] (stop_gradient, NHWC)
          detections   [N, sum(A*G*G), 5+C] image-scale decode (stop_gradient)
          preds        list of [N, A, G, G, 5+C] per YOLO scale (live grads,
                       for the training loss)
          state        updated BN running stats (train=True only)
          act_absmax   [n_blocks] conv-input absmax (collect_act_stats=True;
                       calibration input for int8-activation serving)
        """
        img_dim = images.shape[1]
        outputs = []
        feature_map = None
        dets, preds = [], []
        new_state = list(state)
        act_absmax = [jnp.zeros(()) for _ in self._plan]

        def _weight(p, key):
            # int8 weight slots dequantize in-graph: the conv's HBM read
            # is int8 (4x less weight traffic than f32), the cast+scale
            # fuse into the consumer (ops/quantize.py)
            if key in p:
                return p[key]
            q = p["q" if key == "w" else "q2"]
            return q.astype(compute_dtype) * p["scale"].astype(compute_dtype)

        def _layer_dtype(i):
            return (jnp.float32 if i in self.hi_prec_stages
                    else compute_dtype)

        def _conv_maybe_int8(i, p, z, key, stride, pad):
            # int8 ACTIVATION path ("xs" slot from calibrate_act_scales):
            # the input quantizes on the VPU (fuses into the producer's
            # epilogue), the conv runs int8 x int8 -> int32 on the MXU
            # (2x bf16 peak on v5e) with the int8 weight read straight
            # from HBM; dequant by xs * per-channel weight scale fuses
            # into the bias/activation epilogue.
            if collect_act_stats:
                act_absmax[i] = jnp.max(jnp.abs(z)).astype(jnp.float32)
            qk = "q" if key == "w" else "q2"
            if qk in p and "xs" in p:
                zq = jnp.clip(jnp.round(z / p["xs"]), -127, 127).astype(
                    jnp.int8)
                y = lax.conv_general_dilated(
                    zq, p[qk], window_strides=(stride, stride),
                    padding=[(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32)
                sc = (p["xs"] * p["scale"]).astype(compute_dtype)
                return y.astype(compute_dtype) * sc.reshape(1, 1, 1, -1)
            return _conv2d(z, _weight(p, key), stride, pad, _layer_dtype(i))

        def _pallas_fused(j):
            # Pallas stem engages at inference on FOLDED weights only
            # (the kernel bakes bias+leaky+pool; train/BN keeps XLA)
            return (j in self.pallas_stem_stages and not train
                    and "gamma" not in params[j] and "w" in params[j])

        pair_los, pair_skip = (), ()
        if (self.pallas_stem_pair and self.pallas_stem_stages
                and not collect_act_stats):
            stages = sorted(self.pallas_stem_stages)
            # "first" = the shipped single-pair behavior; "all" also
            # pairs the deeper stem stages (4+6) — s2d-family kernels
            # only (the generalized fused_stem2_s2d; the other pair
            # spellings are tuned to the 3-channel stage-0 layout)
            cand = (stages[:1] if self.pallas_stem_pairs == "first"
                    else stages)
            los, taken = [], set()
            for lo in cand:
                if lo in taken:
                    continue
                if (lo != stages[0]
                        and self.pallas_stem_pair_variant.replace(
                            "_bf16s", "") not in ("s2d", "s2d8")):
                    continue
                if (lo + 2 in self.pallas_stem_stages
                        and _pallas_fused(lo) and _pallas_fused(lo + 2)):
                    los.append(lo)
                    taken.update((lo, lo + 1, lo + 2, lo + 3))
            pair_los = tuple(los)
            pair_skip = tuple(t for lo in los
                              for t in (lo + 1, lo + 2, lo + 3))

        for i, info in enumerate(self._plan):
            t = info["type"]
            p = params[i]
            if i in pair_skip:
                x = outputs[-1]   # consumed by the double-fused pair
            elif i in pair_los:
                from millieye_tpu.ops.stem_pallas import (
                    fused_stem2_packed, fused_stem2_phase,
                    fused_stem2_planar, fused_stem2_s2d)
                variant = self.pallas_stem_pair_variant
                bf16s = variant.endswith("_bf16s")
                base = variant[:-6] if bf16s else variant
                pair_fn = {"phase": fused_stem2_phase,
                           # bf16 patch scratches over an f32 DMA (the
                           # two chip-proven bf16 buffers; bf16 xb DMA
                           # is the compile-crash vector)
                           "phase_s01": functools.partial(
                               fused_stem2_phase, bf16_only="s0s1"),
                           # input as a pipelined VMEM block (no user
                           # DMA — the only chip-legal bf16-input path)
                           "phase_vmem": functools.partial(
                               fused_stem2_phase, input_mode="vmem"),
                           "phase_vmem_s01": functools.partial(
                               fused_stem2_phase, input_mode="vmem",
                               bf16_only="s0s1"),
                           "packed": fused_stem2_packed,
                           "s2d": fused_stem2_s2d,
                           "s2d8": functools.partial(fused_stem2_s2d,
                                               groups0=8)}.get(
                    base, fused_stem2_planar)
                pair_kw = {}
                if bf16s:
                    # bf16 scratches are bit-identical under DEFAULT
                    # dots (which round inputs to bf16 regardless) at
                    # half the fill traffic; the kernels assert
                    # precision == "default"
                    pair_kw["scratch_dtype"] = jnp.bfloat16
                if (i != min(pair_los) and base in ("s2d", "s2d8")):
                    # deep pairs: c_mid fills the 128-row M tile at a
                    # smaller group count (2 at c_mid=64) — the stage-0
                    # K-packing factor is a 3-channel-stem artifact
                    c_mid = p["w"].shape[3]
                    pair_fn = functools.partial(
                        fused_stem2_s2d,
                        groups0=max(2, min(8, 128 // max(c_mid, 1))))
                xin = outputs[-1] if outputs else images
                assert (info["act"] == "leaky"
                        and self._plan[i + 2]["act"] == "leaky"), \
                    "stem kernel bakes leaky"
                p2 = params[i + 2]
                # store ladder of the pair's FINAL conv (the intermediate
                # never stores); f16 handled inside the wrapper
                store = (self.hi_prec_store
                         if (i + 2 in self.hi_prec_stages
                             and self.hi_prec_store is not None)
                         else (jnp.float32 if i + 2 in self.hi_prec_stages
                               else compute_dtype))
                x = pair_fn(
                    xin.astype(jnp.float32), p["w"], p["b"],
                    p2["w"], p2["b"],
                    interpret=jax.default_backend() != "tpu",
                    out_dtype=jnp.dtype(store),
                    precision=self.pallas_stem_precision, **pair_kw)
            elif t == "convolutional" and _pallas_fused(i):
                from millieye_tpu.ops.stem_pallas import fused_stem_planar
                xin = outputs[-1] if outputs else images
                if collect_act_stats:
                    act_absmax[i] = jnp.max(jnp.abs(xin)).astype(
                        jnp.float32)
                assert info["act"] == "leaky", "stem kernel bakes leaky"
                # f32 arithmetic in VMEM regardless of compute dtype (the
                # hi-prec-stem property for free); store dtype follows
                # the hi_prec_store / compute_dtype ladder
                store = (self.hi_prec_store
                         if (i in self.hi_prec_stages
                             and self.hi_prec_store is not None)
                         else (jnp.float32 if i in self.hi_prec_stages
                               else compute_dtype))
                x = fused_stem_planar(
                    xin.astype(jnp.float32), p["w"], p["b"],
                    variant=self.pallas_stem_variant,
                    interpret=jax.default_backend() != "tpu",
                    out_dtype=jnp.dtype(store),
                    precision=self.pallas_stem_precision)
            elif t == "convolutional" and "wi" in p:
                # im2col-fused conv+pool stage (see im2col_stem_weight):
                # 16 spatial slices -> one full-lane matmul -> phase-max
                xin = outputs[-1] if outputs else images
                dt = _layer_dtype(i)
                if collect_act_stats:
                    act_absmax[i] = jnp.max(jnp.abs(xin)).astype(
                        jnp.float32)
                n_, h_, w_, _ = xin.shape
                xp = jnp.pad(xin, ((0, 0), (1, 1), (1, 1), (0, 0)))
                z = jnp.concatenate(
                    [xp[:, dy:dy + h_:2, dx:dx + w_:2, :]
                     for dy in range(4) for dx in range(4)], -1)
                y = jnp.einsum("nhwk,kd->nhwd", z.astype(dt),
                               p["wi"].astype(dt))
                x = y.reshape(n_, h_ // 2, w_ // 2, 4,
                              info["filters"]).max(3)
                x = x + p["b"]
                if info["act"] == "leaky":
                    x = jnp.where(x > 0, x, 0.1 * x)
            elif t == "convolutional" and ("w2" in p or "q2" in p):
                # space-to-depth-fused conv+pool stage (see s2d_conv_weight)
                z = space_to_depth(outputs[-1] if outputs else images)
                x = _conv_maybe_int8(i, p, z, "w2", 1, 1)
                n_, h_, w_, _ = x.shape
                x = x.reshape(n_, h_, w_, 4, info["filters"]).max(3)
                x = x + p["b"]
                if info["act"] == "leaky":
                    x = jnp.where(x > 0, x, 0.1 * x)
            elif t == "convolutional":
                pad = (info["size"] - 1) // 2
                x = _conv_maybe_int8(i, p,
                                     outputs[-1] if outputs else images,
                                     "w", info["stride"], pad)
                if "gamma" in p:  # BN not folded away
                    if train:
                        mean = jnp.mean(x, axis=(0, 1, 2))
                        var = jnp.var(x, axis=(0, 1, 2))
                        m = _BN_MOMENTUM
                        # torch BN normalizes with the biased batch variance
                        # but updates running_var with the UNBIASED one
                        # (Bessel n/(n-1) over N*H*W elements)
                        cnt = x.shape[0] * x.shape[1] * x.shape[2]
                        var_u = var * (cnt / max(cnt - 1, 1))
                        new_state[i] = {
                            "mean": (1 - m) * state[i]["mean"] + m * mean,
                            "var": (1 - m) * state[i]["var"] + m * var_u,
                        }
                    else:
                        mean, var = state[i]["mean"], state[i]["var"]
                    x = (x - mean) * lax.rsqrt(var + _BN_EPS)
                    x = x * p["gamma"] + p["beta"]
                else:
                    x = x + p["b"]
                if info["act"] == "leaky":
                    x = jnp.where(x > 0, x, 0.1 * x)
            elif t == "maxpool":
                fused = (i - 1 in self.s2d_stages and (
                    "w2" in params[i - 1] or "q2" in params[i - 1])) or (
                    i - 1 in self.im2col_stages and "wi" in params[i - 1]
                ) or _pallas_fused(i - 1)
                if fused:
                    x = outputs[-1]   # pool already fused into the stage
                else:
                    x = _maxpool(outputs[-1], info["size"], info["stride"])
            elif t == "upsample":
                x = _upsample2x(outputs[-1], info["factor"])
            elif t == "route":
                x = jnp.concatenate([outputs[l] for l in info["layers"]], -1)
            elif t == "shortcut":
                x = outputs[-1] + outputs[info["frm"]]
            elif t == "yolo":
                det, pred = decode_yolo(
                    outputs[-1], info["anchors"], info["classes"], img_dim
                )
                dets.append(det)
                preds.append(pred)
                x = det  # occupies the slot, like the reference layer_outputs
            if (t == "convolutional" and self.hi_prec_store is not None
                    and i in self.hi_prec_stages and not train
                    and i not in pair_los):
                # f32 arithmetic above, compact storage between stages:
                # the cast fuses into the epilogue, HBM sees hi_prec_store.
                # The double-fused pair is EXCLUDED: its output is
                # semantically stage i+2's, whose store dtype the pair
                # branch already resolved (keying on i here re-cast the
                # pair output whenever i was hi-prec but i+2 was not —
                # a dtype divergence from the XLA reference path)
                x = x.astype(self.hi_prec_store)
            outputs.append(x)
            if i == self.feature_tap:
                feature_map = lax.stop_gradient(x)

        out = {
            "feature_map": feature_map,
            # truncated configs (profiling prefixes) have no yolo blocks
            "detections": (lax.stop_gradient(jnp.concatenate(dets, 1))
                           if dets else outputs[-1]),
            "preds": preds,
        }
        if collect_act_stats:
            out["act_absmax"] = jnp.stack(act_absmax)
        if train:
            out["state"] = new_state
        return out

    def fold_batchnorm(self, params, state, dtype=None):
        """Bake eval-mode BN into conv weight+bias for inference speed.

        Returns params usable with ``apply(..., state=folded_state)`` where
        BN blocks are replaced by biased convs (detected by the absence of
        "gamma"). Numerically identical to eval-mode BN.

        ``dtype`` (e.g. jnp.bfloat16) casts the folded weights AND biases
        once, so with a matching ``compute_dtype`` the whole conv stack
        stays in that dtype — no per-layer f32 promotion ping-pong (the
        bias add in f32 would otherwise upcast every activation). Decode
        still runs in float32.
        """
        folded_params, folded_state = [], []
        for i, (info, p, s) in enumerate(zip(self._plan, params, state)):
            if info["type"] == "convolutional" and info["bn"]:
                scale = p["gamma"] * jax.lax.rsqrt(s["var"] + _BN_EPS)
                fp = {"w": p["w"] * scale, "b": p["beta"] - s["mean"] * scale}
                folded_state.append({})
            elif info["type"] == "convolutional":
                fp = dict(p)
                folded_state.append(s)
            else:
                folded_params.append(p)
                folded_state.append(s)
                continue
            # hi-prec stages keep f32 weights: casting them down here
            # would lose the precision the mixed-precision stem exists
            # to preserve
            if dtype is not None and i not in self.hi_prec_stages:
                fp = {k: v.astype(dtype) for k, v in fp.items()}
            folded_params.append(fp)
        return folded_params, folded_state

    def fold_im2col(self, folded_params):
        """Rewrite the ``im2col_stages`` convs of a BN-folded param tree
        into patch-matmul form ({"wi", "b"} slots consumed by ``apply``).
        Inference-path transform; exact (see im2col_stem_weight)."""
        out = list(folded_params)
        for i in self.im2col_stages:
            p = folded_params[i]
            if "wi" in p:
                continue
            if "b" not in p:
                raise ValueError("fold_batchnorm must run before "
                                 "fold_im2col")
            out[i] = {"wi": im2col_stem_weight(p["w"]), "b": p["b"]}
        return out

    def fold_s2d(self, folded_params):
        """Rewrite the ``s2d_stages`` convs of a BN-folded param tree into
        their space-to-depth form ({"w2", "b"} slots consumed by ``apply``).
        Inference-path transform; exact (see ``s2d_conv_weight``)."""
        out = list(folded_params)
        for i in self.s2d_stages:
            p = folded_params[i]
            if "w2" in p:
                continue
            if "b" not in p:
                raise ValueError("fold_batchnorm must run before fold_s2d")
            out[i] = {"w2": s2d_conv_weight(p["w"]), "b": p["b"]}
        return out

    @property
    def act_int8_skip(self):
        """Conv blocks to keep in float activations under int8 serving:
        the linear-activation YOLO head convs, whose raw outputs feed the
        exp/sigmoid decode (quantization error there moves boxes)."""
        return tuple(i for i, info in enumerate(self._plan)
                     if info["type"] == "convolutional"
                     and info["act"] != "leaky")

    @property
    def anchors_per_scale(self):
        return [info["anchors"] for _, info in
                ((i, self._plan[i]) for i, _ in self.yolo_blocks)]
