"""Fusion networks (camera-only "module2" and radar+camera "module3"),
re-designed as single compiled TPU graphs.

The reference forward (``module3_our_dataset/my_models.py:433-641``) leaves
the device twice per step: NMS runs on CPU mid-graph (:457) and IoU
labeling is a Python loop (:556). Here the full path —

  backbone -> YOLO decode -> fixed-shape NMS -> score maps -> RoI kernels
  -> refinement/ensemble heads -> (train only) vectorized IoU labeling,
  balanced sampling, losses

— is one jit program over padded tensors:

* image proposals: [B, K, 7+C] + validity (K = detections_per_img = 200);
* radar proposals: [B, R, 4] normalized + validity (R configurable);
* outputs: [B, K+R, 7] rows (x1, y1, x2, y2, conf, class_score,
  class_pred) + validity, sorted per image by the reference's priority
  (radar confidence divided by 5, my_models.py:537-539).

Run modes are STATIC arguments (0 millieye / 1 yolo / 2 radar / 3 auto is
resolved by the caller per mode_selection, test_fusion.py:24-32), so each
mode compiles to its own lean program.

Training-semantics notes:
* IoU labels use max IoU over same-image same-class targets with the
  +1 pixel convention; ``multi_boxes`` is effectively always True in the
  reference call sites (my_models.py:556 passes a truthy tuple), so the
  "detected boxes" bookkeeping never engages — the vectorized max is exact.
* 1:balance_factor pos/neg sampling keeps the reference's random uniform
  choice of k = min(5*pos, neg) negatives, expressed as a rank-threshold
  over random keys (data-dependent k works as a traced comparison).
* module2's category loss indexes labels by enumerate position instead of
  sample position (module2 my_models.py:450-452) — judged a bug; this
  framework aligns labels with samples. All other loss terms follow the
  reference, including module3 shipping with regression+category terms
  excluded from the total (my_models.py:635) — select via ``loss_variant``.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from millieye_tpu.models.darknet import Darknet
from millieye_tpu.models import heads
from millieye_tpu.ops.boxes import box_regress, xywh_to_xyxy, iou_matrix
from millieye_tpu.ops.nms import batched_nms
from millieye_tpu.ops.roi_align import (roi_align_batched,
                                         ps_roi_align_batched)


@dataclass
class FusionConfig:
    conf_thresh: float = 0.2
    nms_thresh: float = 0.5
    class_num: int = 1            # module3: person-only refinement
    class_idx: int = 0            # keep only this YOLO class (module3:463)
    max_det: int = 200            # detections_per_img
    max_radar: int = 32           # padded radar proposals per image
    pre_nms_top_k: int = 512
    iou_thresh: tuple = (0.3, 0.7)
    alpha: float = 0.75
    balance_factor: int = 5
    loss_lambda: tuple = (6.0, 1.0)      # module3 my_models.py:421
    refine_threshold_img: float = 0.0
    refine_threshold_radar: float = 0.0
    loss_variant: str = "module3"        # or "module2"
    sampling_max: int = 4                # RoIAlign adaptive grid bound
    compute_dtype: str = "float32"       # backbone conv dtype; "bfloat16"
                                         # runs the MXU at 2x (decode/NMS/
                                         # heads stay float32 for parity)
    heads_dtype: str = "float32"         # serving: dtype of the f32 tail
                                         # (score-map convs, RoI einsums,
                                         # refinement/ensemble heads) —
                                         # "bfloat16" takes the 2.2 ms
                                         # RoI+heads slice of the b32
                                         # graph to bf16; decode, NMS,
                                         # box_regress (exp!) and losses
                                         # stay f32; inference-only
    nms_use_pallas: bool = None          # None = auto (pallas on TPU);
                                         # set False when running on CPU
                                         # devices of a TPU-default process
    nms_use_blocked: bool = None         # None = auto (blocked kernel at
                                         # K%128==0, MILLIEYE_NMS_BLOCKED
                                         # env opt-out); False pins the
                                         # chip-proven whole-matrix kernel
                                         # without touching process env
    roi_impl: str = "einsum"             # RoI crop engine: "einsum" (the
                                         # parity-exact XLA formulation)
                                         # or "pallas" (VMEM-resident
                                         # kernel, ops/roi_pallas.py —
                                         # the einsum's ~450 MB b32
                                         # intermediate never touches
                                         # HBM); inference-only, falls
                                         # back to einsum in training
    roi_precision: str = "default"       # pallas RoI dot ladder:
                                         # "default" (1-pass bf16-input
                                         # dots — the bf16-heads rounding
                                         # class), "split" (~2^-16), or
                                         # "highest" (exact f32)
    roi_reduce: str = "dot"              # pallas RoI segmented w-sum:
                                         # "dot" (S-matrix MXU matmul) or
                                         # "vpu" (minor-split + sublane
                                         # sum — skips half the img
                                         # kernel's MXU passes; same
                                         # bf16-rounded products at
                                         # roi_precision="default")
    weights_int8: bool = False           # serving: backbone conv weights
                                         # stored int8 (per-out-channel
                                         # scales), dequant fused in-graph
    acts_int8: bool = False              # serving: conv activations also
                                         # int8 (per-conv calibrated
                                         # scales) -> int8 MXU convs;
                                         # needs weights_int8 + an
                                         # act_absmax calibration
                                         # (ops.quantize.calibrate_act_scales)


def _eff_sampling_max(cfg, img_size):
    """torchvision's adaptive grid is ceil(roi_size/7) UNBOUNDED; the
    static-shape port masks a fixed sampling_max x sampling_max grid. An
    image-spanning RoI needs ceil(img/16/7) sample rows, so the
    configured bound is raised to cover it (416 px -> 4 = the default,
    so nothing changes there; 608 px multiscale eval -> 6). RoIs LARGER
    than the image (unclipped decode garbage) still clamp — the only
    remaining divergence from the reference, and one no trained
    operating point produces."""
    import math
    return max(cfg.sampling_max, math.ceil(img_size / 16 / 7))


def _cast_floats(tree, dtype):
    """Cast every floating leaf of a pytree (params/state) to ``dtype``."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.result_type(a), jnp.floating) else a, tree)


class FusionNetwork:
    """Radar+camera fusion detector ("module3 Network")."""

    def __init__(self, darknet: Darknet, config: FusionConfig = None):
        self.darknet = darknet
        self.cfg = config or FusionConfig()

    # ------------------------------------------------------------------ init
    def init(self, rng):
        k = jax.random.split(rng, 5)
        d_params, d_state = self.darknet.init(k[0])
        img_cnn_p, img_cnn_s = heads.conv_bn_stack_init(k[1], (256, 490))
        radar_p, radar_s = heads.radar_encoder_init(k[2])
        ref_p, ref_s = heads.refinement_head_init(k[3], with_radar=True)
        ens_p = heads.ensemble_head_init(k[4], self.cfg.class_num)
        params = {"darknet": d_params, "img_cnn": img_cnn_p,
                  "radar_enc": radar_p, "refine": ref_p, "ensemble": ens_p}
        state = {"darknet": d_state, "img_cnn": img_cnn_s,
                 "radar_enc": radar_s, "refine": ref_s}
        return params, state

    # --------------------------------------------------------------- forward
    def apply(self, params, state, images, radar_maps, radar_boxes,
              radar_mask, mode=0, train=False, targets=None, tmask=None,
              rng=None):
        """
        images      [B, S, S, 3] float, letterboxed
        radar_maps  [B, S/16, S/16, 3] heatmaps
        radar_boxes [B, R, 4] xyxy normalized to (0,1); radar_mask [B, R]
        mode        static: 0 millieye, 1 yolo-only, 2 radar-only
        train       static; targets [B, T, 5] (class, cx, cy, w, h in 0..1)

        Returns dict with ``boxes`` [B, K+R, 7], ``valid`` [B, K+R] and, in
        training, ``loss`` plus per-term metrics and updated ``state``.
        """
        cfg = self.cfg
        b_sz = images.shape[0]
        img_size = images.shape[1]
        k_img, r_rad = cfg.max_det, cfg.max_radar

        # 1. frozen base detector (eval-mode BN always, train.py:169-170)
        d_out = self.darknet.apply(params["darknet"], state["darknet"],
                                   images,
                                   compute_dtype=jnp.dtype(cfg.compute_dtype))
        feature_map = d_out["feature_map"]
        det, det_valid = batched_nms(
            d_out["detections"], cfg.conf_thresh, cfg.nms_thresh,
            max_det=k_img, pre_top_k=cfg.pre_nms_top_k,
            use_pallas=cfg.nms_use_pallas,
            use_blocked=cfg.nms_use_blocked)
        det = jax.lax.stop_gradient(det)
        # keep only the fused class (my_models.py:463)
        det_valid = det_valid & (det[:, :, 6].astype(jnp.int32) == cfg.class_idx)

        img_xyxy = det[:, :, 0:4]
        img_conf = det[:, :, 4]
        img_class_score = det[:, :, 5]
        img_class_pred = det[:, :, 6]
        img_cls_scores = det[:, :, 7:]

        if mode == 1:  # yolo-only early exit (my_models.py:476-477)
            boxes_out = jnp.concatenate(
                [img_xyxy, img_conf[..., None], img_class_score[..., None],
                 img_class_pred[..., None]], -1)
            return {"boxes": boxes_out, "valid": det_valid,
                    "num_img": k_img}

        # 2. score maps. Default: heads stay float32 whatever the backbone
        # dtype; cfg.heads_dtype="bfloat16" (inference only) runs the
        # score-map convs, RoI einsums and head matmuls in bf16 — the
        # results are cast back to f32 before decode-sensitive math
        hd = jnp.dtype(cfg.heads_dtype)
        use_hd = hd != jnp.float32 and not train
        if use_hd:
            p_img, s_img = _cast_floats(
                (params["img_cnn"], state["img_cnn"]), hd)
            p_rad, s_rad = _cast_floats(
                (params["radar_enc"], state["radar_enc"]), hd)
            p_ref, s_ref = _cast_floats(
                (params["refine"], state["refine"]), hd)
            p_ens = _cast_floats(params["ensemble"], hd)
            radar_maps = radar_maps.astype(hd)
        else:
            hd = jnp.float32
            p_img, s_img = params["img_cnn"], state["img_cnn"]
            p_rad, s_rad = params["radar_enc"], state["radar_enc"]
            p_ref, s_ref = params["refine"], state["refine"]
            p_ens = params["ensemble"]
        use_pallas_roi = cfg.roi_impl == "pallas" and not train
        roi_c_out = None
        if use_pallas_roi:
            # permute AND pad the score-map conv's OUTPUT channels
            # (weights + per-channel BN vectors, a few KB) into
            # 128-aligned per-bin-row blocks, so the 50 MB map is born in
            # the layout the RoI kernel reads directly — no XLA relayout
            # of the map at any granularity (measured ~3 ms/b32 for any
            # transpose of it; ops/roi_pallas.py:ps_channel_perm_pad)
            from millieye_tpu.ops.roi_pallas import ps_channel_perm_pad
            roi_c_out = p_img[-1]["w"].shape[-1] // 49
            dst = jnp.asarray(ps_channel_perm_pad(roi_c_out, 7, 7))
            c_pad = 7 * 128

            def _scat(v, fill):
                out = jnp.full(v.shape[:-1] + (c_pad,), fill, v.dtype)
                return out.at[..., dst].set(v)

            last = dict(p_img[-1])
            last["w"] = _scat(last["w"], 0.0)
            last["b"] = _scat(last["b"], 0.0)
            last["bn"] = {"gamma": _scat(last["bn"]["gamma"], 0.0),
                          "beta": _scat(last["bn"]["beta"], 0.0)}
            p_img = list(p_img[:-1]) + [last]
            s_img = list(s_img[:-1]) + [
                {"mean": _scat(s_img[-1]["mean"], 0.0),
                 "var": _scat(s_img[-1]["var"], 1.0)}]
        roi_score_map, img_cnn_s = heads.conv_bn_stack_apply(
            p_img, s_img, feature_map.astype(hd), train)
        radar_score_map, radar_enc_s = heads.radar_encoder_apply(
            p_rad, s_rad, radar_maps, train)

        # 3. aggregate proposals, one block per image [B, K+R, 4]
        radar_xyxy = radar_boxes * img_size                     # (:490-492)
        all_xyxy = jnp.concatenate([img_xyxy, radar_xyxy], axis=1)
        all_valid = jnp.concatenate([det_valid, radar_mask], axis=1)
        n_all = k_img + r_rad
        flat_valid = all_valid.reshape(-1)

        # 4. RoI cropping (my_models.py:495-496) — batched einsum variants:
        # the per-image roi layout is already blocked, so cropping is two
        # MXU contractions for the whole batch, no gathers, no image loop.
        # Serving alternative (cfg.roi_impl="pallas"): the VMEM-resident
        # kernel — the separable intermediate never touches HBM
        # (measured 2.75 -> ~sub-ms ms/b32, benchmarks/roi_variants.py)
        smax = _eff_sampling_max(cfg, images.shape[1])
        if use_pallas_roi:
            from millieye_tpu.ops.roi_pallas import (
                ps_roi_align_pallas_padded, ps_roi_align_pallas_padded_g1,
                roi_align_pallas)
            interp = jax.default_backend() != "tpu"
            # "default": one-program-per-image bf16-operand kernel (the
            # f32-operand VMEM residency exceeds the 16 MB scoped budget
            # at b32); split/highest: the grid-(b,p) f32 form
            if cfg.roi_precision == "default":
                img_crop = ps_roi_align_pallas_padded_g1(
                    roi_score_map, all_xyxy, (7, 7),
                    1.0 / 16, sampling_max=smax,
                    c_out=roi_c_out, precision=cfg.roi_precision,
                    interpret=interp, reduce=cfg.roi_reduce)
            else:
                img_crop = ps_roi_align_pallas_padded(
                    roi_score_map, all_xyxy, (7, 7),
                    1.0 / 16, sampling_max=smax,
                    c_out=roi_c_out, precision=cfg.roi_precision,
                    interpret=interp)
            img_crop = img_crop.astype(hd).reshape(b_sz * n_all, 7, 7, -1)
            radar_crop = roi_align_pallas(
                radar_score_map.astype(jnp.float32), all_xyxy, (7, 7),
                1.0 / 16, sampling_max=smax,
                precision=cfg.roi_precision, interpret=interp,
            ).astype(hd).reshape(b_sz * n_all, 7, 7, -1)
        else:
            img_crop = ps_roi_align_batched(
                roi_score_map, all_xyxy, (7, 7), 1.0 / 16,
                sampling_max=smax,
                compute_dtype=hd).reshape(b_sz * n_all, 7, 7, -1)
            radar_crop = roi_align_batched(
                radar_score_map, all_xyxy, (7, 7), 1.0 / 16,
                sampling_max=smax,
                compute_dtype=hd).reshape(b_sz * n_all, 7, 7, -1)

        # 5. refinement head (img-feature scoring + radar-confidence fusion)
        regress_param, refinement_vector, refine_s = heads.refinement_head_apply(
            p_ref, s_ref, radar_crop, img_crop,
            valid=flat_valid.astype(hd), train=train,
            class_num=cfg.class_num)
        # back to f32 before regression (exp!) / sorting / losses
        regress_param = regress_param.astype(jnp.float32).reshape(
            b_sz, n_all, 4)
        refinement_vector = refinement_vector.astype(jnp.float32).reshape(
            b_sz, n_all, 1 + cfg.class_num)

        # 6. ensemble head on image proposals only (my_models.py:509-513);
        # yolo_vector carries conf + the first class_num class scores
        # (img_boxes keeps detections[:, :7+class_num], my_models.py:466)
        yolo_vector = jax.lax.stop_gradient(jnp.concatenate(
            [img_conf[..., None], img_cls_scores[:, :, :cfg.class_num]], -1))
        ens = heads.ensemble_head_apply(
            p_ens,
            refinement_vector[:, :k_img].astype(hd).reshape(
                b_sz * k_img, -1),
            yolo_vector.astype(hd).reshape(b_sz * k_img, -1),
        ).astype(jnp.float32).reshape(b_sz, k_img, 2)
        # module3 convention: ensemble channel 0 is p(foreground)
        fg = jnp.concatenate(
            [ens[:, :, 0], refinement_vector[:, k_img:, 0]], axis=1)

        # 7. thresholding + regression + priority sort (my_models.py:517-539)
        thr = jnp.concatenate([
            jnp.full((k_img,), 1.0 if mode == 2 else cfg.refine_threshold_img),
            jnp.full((r_rad,), cfg.refine_threshold_radar)])
        positive = all_valid & (fg > thr[None, :])

        if mode == 2:
            out_xyxy = all_xyxy                     # no regression (:529-534)
        else:
            out_xyxy = box_regress(regress_param, all_xyxy)

        # radar rows carry refinement_vector column 1 (the class score) as
        # their class_score, not column 0 (confidence) — my_models.py:500-507
        class_score = jnp.concatenate(
            [img_class_score, refinement_vector[:, k_img:, 1]], axis=1)
        class_pred = jnp.concatenate(
            [img_class_pred, jnp.zeros((b_sz, r_rad))], axis=1)
        boxes_out = jnp.concatenate(
            [out_xyxy, fg[..., None], class_score[..., None],
             class_pred[..., None]], -1)

        priority = fg * jnp.concatenate(
            [jnp.ones((k_img,)), jnp.full((r_rad,), 1.0 / 5)])[None, :]
        priority = jnp.where(positive, priority, -jnp.inf)
        order = jnp.argsort(-priority, axis=1)
        boxes_out = jnp.take_along_axis(boxes_out, order[..., None], axis=1)
        out_valid = jnp.take_along_axis(positive, order, axis=1)
        # padded rows carry garbage regressions (exp(dw)*0 -> NaN); keep the
        # output well-defined everywhere
        boxes_out = jnp.where(out_valid[..., None], boxes_out, 0.0)

        result = {"boxes": boxes_out, "valid": out_valid, "num_img": k_img,
                  "radar_attention": radar_score_map[..., :1]}

        if not train:
            return result

        # ----------------------------------------------------------- training
        new_state = {"darknet": state["darknet"], "img_cnn": img_cnn_s,
                     "radar_enc": radar_enc_s, "refine": refine_s}
        loss, metrics = self._losses(
            cfg, rng, targets, tmask, all_xyxy, all_valid, class_pred,
            regress_param, refinement_vector, fg, positive, k_img, img_size)
        result.update(loss=loss, metrics=metrics, state=new_state)
        return result

    # ------------------------------------------------------------- training
    @staticmethod
    def _losses(cfg, rng, targets, tmask, all_xyxy, all_valid, class_pred,
                regress_param, refinement_vector, fg, positive, k_img,
                img_size):
        b_sz, n_all = all_valid.shape
        t_cls = targets[..., 0]
        t_xyxy = xywh_to_xyxy(targets[..., 1:5]) * img_size   # (:548-549)

        # vectorized obtain_iou_labels (my_models.py:317-375)
        def per_image(bx, bcls, bval, txy, tcl, tms):
            iou = iou_matrix(bx, txy, plus_one=True)          # [N, T]
            same_class = bcls[:, None] == tcl[None, :]
            ok = same_class & tms[None, :] & bval[:, None]
            iou = jnp.where(ok, iou, 0.0)
            best = jnp.argmax(iou, axis=1)
            return jnp.max(iou, axis=1), txy[best]

        iou_labels, target_loc = jax.vmap(per_image)(
            all_xyxy, class_pred, all_valid, t_xyxy, t_cls, tmask)

        pos = (iou_labels > cfg.iou_thresh[1]) & all_valid
        neg = (iou_labels < cfg.iou_thresh[0]) & all_valid

        # balanced sampling: k = min(5*pos, neg) random negatives (:590-601)
        flat_pos = pos.reshape(-1)
        flat_neg = neg.reshape(-1)
        top_k = jnp.minimum(flat_pos.sum() * cfg.balance_factor,
                            flat_neg.sum())
        keys = jax.random.uniform(rng, flat_neg.shape)
        keys = jnp.where(flat_neg, keys, jnp.inf)
        rank = jnp.argsort(jnp.argsort(keys))      # rank of each key
        chosen_neg = flat_neg & (rank < top_k)
        sample = flat_pos | chosen_neg

        is_img = (jnp.arange(n_all) < k_img)[None, :].repeat(b_sz, 0).reshape(-1)
        flat_fg = fg.reshape(-1)
        masks2 = jnp.stack([1 - flat_fg, flat_fg], -1)
        label2 = jnp.stack([1.0 - flat_pos, flat_pos.astype(jnp.float32)], -1)

        # focal loss over sampled IMAGE proposals only (:603-610)
        w_img = (sample & is_img).astype(jnp.float32)
        masks_loss = heads.focal_loss(masks2, label2, w_img, cfg.alpha)

        # confidence BCE over all sampled proposals (:613-619)
        conf = refinement_vector.reshape(-1, refinement_vector.shape[-1])[:, 0]
        conf_loss = heads.bce_sum(conf, flat_pos.astype(jnp.float32),
                                  sample.astype(jnp.float32))

        # regression smooth-L1 on positives (:621-625)
        from millieye_tpu.ops.boxes import encode_boxes
        enc = encode_boxes(all_xyxy.reshape(-1, 4), target_loc.reshape(-1, 4))
        w_pos = flat_pos.astype(jnp.float32)
        rp = regress_param.reshape(-1, 4)
        loss_xy = heads.smooth_l1_sum(rp[:, :2], enc[:, :2], w_pos)
        loss_wh = heads.smooth_l1_sum(rp[:, 2:], enc[:, 2:], w_pos)

        # category BCE on positives (:627-633; label indexing fixed).
        # class_pred carries the DETECTOR's class ids; the refinement
        # vector's channels start at cfg.class_idx (kept proposals are
        # filtered to it when class_num < the detector's classes), so
        # shift before one-hot — with the shipped class_idx=0 this is
        # the identity
        cls_onehot = jax.nn.one_hot(
            class_pred.reshape(-1).astype(jnp.int32) - cfg.class_idx,
            cfg.class_num)
        category_loss = heads.bce_sum(
            refinement_vector.reshape(-1, refinement_vector.shape[-1])[:, 1:],
            cls_onehot, w_pos)

        if cfg.loss_variant == "module2":
            total = (masks_loss
                     + (conf_loss + category_loss) / cfg.loss_lambda[0]
                     + (loss_xy + loss_wh) / cfg.loss_lambda[1])
        else:  # module3 ships with regression/category excluded (:635)
            total = masks_loss + conf_loss / cfg.loss_lambda[0]

        flat_positive = positive.reshape(-1)
        metrics = {
            "masks_loss": masks_loss,
            "conf_loss": conf_loss,
            "category_loss": category_loss,
            "loss_xy": loss_xy,
            "loss_wh": loss_wh,
            "total": flat_pos.sum() + flat_neg.sum(),
            "true": flat_pos.sum(),
            "positive": flat_positive.sum(),
            "tp": (flat_positive & flat_pos).sum(),
        }
        return total, metrics


class RefineNetwork:
    """Camera-only refinement detector ("module2 Network",
    module2_mixed/my_models.py:280-461): frozen YOLO -> NMS -> PSRoIAlign
    over a 490-ch score map -> refinement head (with dropout) -> ensemble
    head over (refinement, yolo) vectors -> re-scored, regressed boxes.

    Differences from FusionNetwork: no radar branch, all classes kept
    (class_num=12), ensemble fc2 has a LeakyReLU, masks channel 1 is
    p(foreground), and the loss includes category + regression terms
    (loss_lambda = (15, 5), module2:290,457).
    """

    def __init__(self, darknet: Darknet, config: FusionConfig = None):
        self.darknet = darknet
        cfg = config or FusionConfig(
            class_num=12, loss_variant="module2", loss_lambda=(15.0, 5.0))
        if cfg.loss_variant != "module2":
            # this IS the module2 network: a caller passing a config for
            # one knob (e.g. conf_thresh) must not silently inherit the
            # module3 loss, which drops the category + regression terms
            # this head trains on
            from dataclasses import replace
            cfg = replace(cfg, loss_variant="module2")
        self.cfg = cfg

    def init(self, rng):
        k = jax.random.split(rng, 4)
        d_params, d_state = self.darknet.init(k[0])
        fcn_p, fcn_s = heads.conv_bn_stack_init(k[1], (256, 490))
        ref_p, ref_s = heads.refinement_head_init(
            k[2], net2_out=self.cfg.class_num + 1, with_radar=False)
        ens_p = heads.ensemble_head_init(k[3], self.cfg.class_num)
        params = {"darknet": d_params, "fcn": fcn_p,
                  "refine": ref_p, "ensemble": ens_p}
        state = {"darknet": d_state, "fcn": fcn_s, "refine": ref_s}
        return params, state

    def apply(self, params, state, images, train=False, targets=None,
              tmask=None, rng=None):
        cfg = self.cfg
        b_sz, img_size = images.shape[0], images.shape[1]
        k_img = cfg.max_det

        d_out = self.darknet.apply(params["darknet"], state["darknet"],
                                   images,
                                   compute_dtype=jnp.dtype(cfg.compute_dtype))
        det, det_valid = batched_nms(
            d_out["detections"], cfg.conf_thresh, cfg.nms_thresh,
            max_det=k_img, pre_top_k=cfg.pre_nms_top_k,
            use_pallas=cfg.nms_use_pallas,
            use_blocked=cfg.nms_use_blocked)
        det = jax.lax.stop_gradient(det)

        img_xyxy = det[:, :, 0:4]
        hd = jnp.dtype(cfg.heads_dtype)
        use_hd = hd != jnp.float32 and not train
        if use_hd:
            p_fcn, s_fcn = _cast_floats((params["fcn"], state["fcn"]), hd)
            p_ref, s_ref = _cast_floats(
                (params["refine"], state["refine"]), hd)
            p_ens = _cast_floats(params["ensemble"], hd)
        else:
            hd = jnp.float32
            p_fcn, s_fcn = params["fcn"], state["fcn"]
            p_ref, s_ref = params["refine"], state["refine"]
            p_ens = params["ensemble"]
        roi_score_map, fcn_s = heads.conv_bn_stack_apply(
            p_fcn, s_fcn, d_out["feature_map"].astype(hd), train)

        smax = _eff_sampling_max(cfg, images.shape[1])
        if cfg.roi_impl == "pallas" and not train:
            from millieye_tpu.ops.roi_pallas import ps_roi_align_pallas
            img_crop = ps_roi_align_pallas(
                roi_score_map.astype(jnp.float32), img_xyxy, (7, 7),
                1.0 / 16, sampling_max=smax,
                precision=cfg.roi_precision,
                interpret=jax.default_backend() != "tpu",
            ).astype(hd).reshape(b_sz * k_img, 7, 7, -1)
        else:
            img_crop = ps_roi_align_batched(
                roi_score_map, img_xyxy, (7, 7), 1.0 / 16,
                sampling_max=smax,
                compute_dtype=hd).reshape(b_sz * k_img, 7, 7, -1)

        drop_rng = None
        if train and rng is not None:
            rng, drop_rng = jax.random.split(rng)
        regress_param, refinement_vector, refine_s = heads.refinement_head_apply(
            p_ref, s_ref, None, img_crop,
            train=train, dropout_rng=drop_rng, class_num=cfg.class_num)
        regress_param = regress_param.astype(jnp.float32).reshape(
            b_sz, k_img, 4)
        refinement_vector = refinement_vector.astype(jnp.float32).reshape(
            b_sz, k_img, -1)

        yolo_vector = jax.lax.stop_gradient(jnp.concatenate(
            [det[:, :, 4:5], det[:, :, 7:]], -1))
        masks = heads.ensemble_head_apply(
            p_ens,
            refinement_vector.astype(hd).reshape(b_sz * k_img, -1),
            yolo_vector.astype(hd).reshape(b_sz * k_img, -1),
            fc2_leaky=True,
        ).astype(jnp.float32).reshape(b_sz, k_img, 2)
        fg = masks[:, :, 1]                       # module2:352-353

        positive = det_valid & (fg > cfg.refine_threshold_img)
        out_xyxy = box_regress(regress_param, img_xyxy)
        boxes_out = jnp.concatenate(
            [out_xyxy, fg[..., None], det[:, :, 5:6], det[:, :, 6:7]], -1)

        priority = jnp.where(positive, fg, -jnp.inf)
        order = jnp.argsort(-priority, axis=1)
        boxes_out = jnp.take_along_axis(boxes_out, order[..., None], axis=1)
        out_valid = jnp.take_along_axis(positive, order, axis=1)
        boxes_out = jnp.where(out_valid[..., None], boxes_out, 0.0)
        result = {"boxes": boxes_out, "valid": out_valid, "num_img": k_img}

        if not train:
            return result

        new_state = {"darknet": state["darknet"], "fcn": fcn_s,
                     "refine": refine_s}
        loss, metrics = FusionNetwork._losses(
            cfg, rng, targets, tmask, img_xyxy, det_valid,
            det[:, :, 6], regress_param, refinement_vector, fg, positive,
            k_img, img_size)
        result.update(loss=loss, metrics=metrics, state=new_state)
        return result
