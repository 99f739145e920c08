"""RoIAlign and position-sensitive RoIAlign, TPU-native.

The reference calls torchvision's C++/CUDA kernels
(``my_models.py:495-496``: ``ps_roi_align(roi_score_map, boxes, (7,7),
1/16)`` on a 490-channel score map and ``roi_align(radar_score_map, boxes,
(7,7), 1/16)`` on a 10-channel radar map). Here both are expressed as one
vectorized bilinear-gather over a padded RoI tensor:

* every (roi, bin, sample) position is computed in closed form, so the op
  is a fixed-shape gather + weighted sum — no per-roi loops, no dynamic
  shapes, batched over all RoIs of all images at once;
* torchvision's *adaptive* sampling (``roi_bin_grid = ceil(roi_size/bins)``
  — a data-dependent loop bound in CUDA) becomes a masked fixed grid of
  ``sampling_max`` points per bin axis: samples beyond the adaptive count
  contribute zero and the divisor is the true adaptive count, preserving
  the numerics under static shapes;
* PSRoIAlign never materializes per-sample 490-vectors: the score map is
  viewed as [..., C_out, bins] and the bin index participates in the
  gather, so each tap reads only the C_out(=10) channels it needs.

Numeric conventions (torchvision 0.6, what the reference pins):
* ``roi_align``: ``aligned=False`` — no half-pixel offset,
  ``roi_size = max(end - start, 1.0)``;
* ``ps_roi_align``: inherent −0.5 half-pixel offset,
  ``roi_size = max(end - start, 0.1)``;
* bilinear taps outside [−1, H)×[−1, W) contribute 0 but still count in
  the average; borders clamp.

RoIs are [K, 5] rows of (batch_index, x1, y1, x2, y2) in image coordinates
— the ``box_locations`` layout of my_models.py:492. Invalid/padded RoIs are
the caller's concern (outputs for them are well-defined, never NaN).
"""
from __future__ import annotations

import jax.numpy as jnp


def _bin_samples(start, roi_size, bins, grid_n, smax):
    """Sample coordinates for one axis.

    start, roi_size, grid_n: [K]; returns (pos [K, bins, smax],
    valid [K, bins, smax]).  pos = start + bin*bin_sz + (s+0.5)*bin_sz/grid.
    """
    bin_sz = (roi_size / bins)[:, None, None]
    b = jnp.arange(bins, dtype=jnp.float32)[None, :, None]
    s = jnp.arange(smax, dtype=jnp.float32)[None, None, :]
    pos = start[:, None, None] + b * bin_sz + (s + 0.5) * bin_sz / grid_n[:, None, None]
    valid = s < grid_n[:, None, None]
    return pos, valid


def _bilinear_terms(y, x, h, w):
    """Corner indices + weights for bilinear taps; out-of-range -> weight 0."""
    inside = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    weights = jnp.stack(
        [(1 - ly) * (1 - lx), (1 - ly) * lx, ly * (1 - lx), ly * lx], -1
    ) * inside[..., None]
    ys = jnp.stack([y0, y0, y1, y1], -1).astype(jnp.int32)
    xs = jnp.stack([x0, x1, x0, x1], -1).astype(jnp.int32)
    return ys, xs, weights


def _grid_counts(roi_h, roi_w, ph, pw, sampling_ratio, smax):
    if sampling_ratio > 0:
        gh = jnp.full_like(roi_h, float(sampling_ratio))
        gw = jnp.full_like(roi_w, float(sampling_ratio))
    else:
        gh = jnp.ceil(roi_h / ph)
        gw = jnp.ceil(roi_w / pw)
    return jnp.clip(gh, 1, smax), jnp.clip(gw, 1, smax)


def _interp_matrix(start, roi_size, bins, grid_n, smax, size):
    """Separable interpolation operator for one axis: M [K, bins, size]
    with sum_h M[k, p, h] * F[h, ...] = the tap-averaged bilinear sample
    of bin p along this axis (weights fold in sample validity, the
    outside-[-1, size) zero rule, border clamping, and the 1/grid_n
    average).

    Bilinear weights are products of 1D hat functions and the tap average
    is linear in F, so 2D RoIAlign factorizes exactly into two of these
    matrices — turning the gather-per-tap formulation into two batched
    matmuls that run on the MXU with zero gathers (the TPU-native design;
    gathers serialize on TPU, matmuls are its fast path).
    """
    pos, valid = _bin_samples(start, roi_size, bins, grid_n, smax)
    inside = (pos > -1.0) & (pos < size)
    wv = (valid & inside).astype(jnp.float32)
    p = jnp.clip(pos, 0.0, size - 1)
    p0 = jnp.floor(p)
    frac = p - p0
    p0i = p0.astype(jnp.int32)
    p1i = jnp.minimum(p0i + 1, size - 1)
    hh = jnp.arange(size)
    lo = (p0i[..., None] == hh) * ((1 - frac) * wv)[..., None]
    hi = (p1i[..., None] == hh) * (frac * wv)[..., None]
    return (lo + hi).sum(axis=2) / grid_n[:, None, None]


def _per_image(batch, n, out_of):
    """Accumulate a per-image computation over the static batch dim."""
    out = None
    for b in range(n):
        o = out_of(b)
        sel = (batch == b)[:, None, None, None]
        out = jnp.where(sel, o, 0.0) if out is None else (
            out + jnp.where(sel, o, 0.0))
    return out


def roi_align(features, rois, output_size=(7, 7), spatial_scale=1.0 / 16,
              sampling_ratio=-1, sampling_max=4, method="einsum"):
    """features [N, H, W, C]; rois [K, 5]. Returns [K, ph, pw, C].

    method="einsum" (default): gather-free separable-matmul formulation
    (see _interp_matrix). method="gather": direct bilinear-tap gather,
    kept as the golden reference implementation.
    """
    if method == "einsum":
        n, h, w, c = features.shape
        ph, pw = output_size
        batch = rois[:, 0].astype(jnp.int32)
        start_x = rois[:, 1] * spatial_scale
        start_y = rois[:, 2] * spatial_scale
        roi_w = jnp.maximum(rois[:, 3] * spatial_scale - start_x, 1.0)
        roi_h = jnp.maximum(rois[:, 4] * spatial_scale - start_y, 1.0)
        gh, gw = _grid_counts(roi_h, roi_w, ph, pw, sampling_ratio,
                              sampling_max)
        by = _interp_matrix(start_y, roi_h, ph, gh, sampling_max, h)
        bx = _interp_matrix(start_x, roi_w, pw, gw, sampling_max, w)

        def one(b):
            t = jnp.einsum("kph,hwc->kpwc", by, features[b],
                           preferred_element_type=jnp.float32)
            return jnp.einsum("kqw,kpwc->kpqc", bx, t,
                              preferred_element_type=jnp.float32)

        return _per_image(batch, n, one)
    return _roi_align_gather(features, rois, output_size, spatial_scale,
                             sampling_ratio, sampling_max)


def _roi_align_gather(features, rois, output_size=(7, 7),
                      spatial_scale=1.0 / 16, sampling_ratio=-1,
                      sampling_max=4):
    """features [N, H, W, C]; rois [K, 5]. Returns [K, ph, pw, C]."""
    n, h, w, c = features.shape
    k = rois.shape[0]
    ph, pw = output_size

    batch = rois[:, 0].astype(jnp.int32)
    start_x = rois[:, 1] * spatial_scale
    start_y = rois[:, 2] * spatial_scale
    roi_w = jnp.maximum(rois[:, 3] * spatial_scale - start_x, 1.0)
    roi_h = jnp.maximum(rois[:, 4] * spatial_scale - start_y, 1.0)

    gh, gw = _grid_counts(roi_h, roi_w, ph, pw, sampling_ratio, sampling_max)
    ypos, yval = _bin_samples(start_y, roi_h, ph, gh, sampling_max)
    xpos, xval = _bin_samples(start_x, roi_w, pw, gw, sampling_max)

    # full (bin_y, bin_x, sy, sx) lattice
    y = ypos[:, :, None, :, None]                      # [K,ph,1,S,1]
    x = xpos[:, None, :, None, :]                      # [K,1,pw,1,S]
    samp_valid = (yval[:, :, None, :, None] & xval[:, None, :, None, :])
    y = jnp.broadcast_to(y, (k, ph, pw, sampling_max, sampling_max))
    x = jnp.broadcast_to(x, (k, ph, pw, sampling_max, sampling_max))
    samp_valid = jnp.broadcast_to(samp_valid, y.shape)

    ys, xs, wts = _bilinear_terms(y, x, h, w)          # [..., 4]
    wts = wts * samp_valid[..., None]

    flat = features.reshape(n * h * w, c)
    idx = batch.reshape(k, 1, 1, 1, 1, 1) * (h * w) + ys * w + xs
    vals = flat[idx.reshape(-1)].reshape(*idx.shape, c)
    acc = (vals * wts[..., None]).sum(axis=(-2, -3, -4))   # sum taps+samples
    count = (gh * gw)[:, None, None, None]
    return acc / count


def ps_roi_align(features, rois, output_size=(7, 7), spatial_scale=1.0 / 16,
                 sampling_ratio=-1, sampling_max=4, method="einsum"):
    """Position-sensitive RoIAlign.

    features [N, H, W, C_in] with C_in = C_out * ph * pw laid out
    C_out-major (torch channel order: c_in = (c_out*ph + by)*pw + bx).
    Returns [K, ph, pw, C_out]. Position-sensitivity makes the einsum
    path even cheaper: the bin index rides along as a shared einsum
    index, so only each bin's own C_out channel block is ever touched.
    """
    if method == "einsum":
        return _ps_roi_align_einsum(features, rois, output_size,
                                    spatial_scale, sampling_ratio,
                                    sampling_max)
    return _ps_roi_align_gather(features, rois, output_size, spatial_scale,
                                sampling_ratio, sampling_max)


def _ps_roi_align_einsum(features, rois, output_size, spatial_scale,
                         sampling_ratio, sampling_max):
    n, h, w, c_in = features.shape
    ph, pw = output_size
    c_out = c_in // (ph * pw)
    assert c_out * ph * pw == c_in, "channels must factor as C_out*ph*pw"

    batch = rois[:, 0].astype(jnp.int32)
    start_x = rois[:, 1] * spatial_scale - 0.5
    start_y = rois[:, 2] * spatial_scale - 0.5
    roi_w = jnp.maximum(rois[:, 3] * spatial_scale - 0.5 - start_x, 0.1)
    roi_h = jnp.maximum(rois[:, 4] * spatial_scale - 0.5 - start_y, 0.1)
    gh, gw = _grid_counts(roi_h, roi_w, ph, pw, sampling_ratio, sampling_max)
    by = _interp_matrix(start_y, roi_h, ph, gh, sampling_max, h)
    bx = _interp_matrix(start_x, roi_w, pw, gw, sampling_max, w)

    fv = features.reshape(n, h, w, c_out, ph, pw)

    def one(b):
        # p, q (bin indices) are shared, h/w are contracted: each bin reads
        # only its own channel block
        t = jnp.einsum("kph,hwupq->kpqwu", by, fv[b],
                       preferred_element_type=jnp.float32)
        return jnp.einsum("kqw,kpqwu->kpqu", bx, t,
                          preferred_element_type=jnp.float32)

    return _per_image(batch, n, one)


def _ps_roi_align_gather(features, rois, output_size=(7, 7),
                         spatial_scale=1.0 / 16, sampling_ratio=-1,
                         sampling_max=4):
    """Golden gather-formulation reference."""
    n, h, w, c_in = features.shape
    k = rois.shape[0]
    ph, pw = output_size
    bins = ph * pw
    c_out = c_in // bins
    assert c_out * bins == c_in, "channels must factor as C_out*ph*pw"

    batch = rois[:, 0].astype(jnp.int32)
    start_x = rois[:, 1] * spatial_scale - 0.5
    start_y = rois[:, 2] * spatial_scale - 0.5
    end_x = rois[:, 3] * spatial_scale - 0.5
    end_y = rois[:, 4] * spatial_scale - 0.5
    roi_w = jnp.maximum(end_x - start_x, 0.1)
    roi_h = jnp.maximum(end_y - start_y, 0.1)

    gh, gw = _grid_counts(roi_h, roi_w, ph, pw, sampling_ratio, sampling_max)
    ypos, yval = _bin_samples(start_y, roi_h, ph, gh, sampling_max)
    xpos, xval = _bin_samples(start_x, roi_w, pw, gw, sampling_max)

    y = jnp.broadcast_to(ypos[:, :, None, :, None],
                         (k, ph, pw, sampling_max, sampling_max))
    x = jnp.broadcast_to(xpos[:, None, :, None, :], y.shape)
    samp_valid = jnp.broadcast_to(
        yval[:, :, None, :, None] & xval[:, None, :, None, :], y.shape)

    ys, xs, wts = _bilinear_terms(y, x, h, w)
    wts = wts * samp_valid[..., None]

    # view channels as [bins-last]: flat index (((b*H + y)*W + x)*bins + bin)
    # reading the C_out channels for that spatial tap & bin in one gather row
    fm = features.reshape(n, h, w, c_out, bins).transpose(0, 1, 2, 4, 3)
    flat = fm.reshape(n * h * w * bins, c_out)
    bin_idx = (jnp.arange(ph)[:, None] * pw + jnp.arange(pw)[None, :])
    bin_idx = jnp.broadcast_to(
        bin_idx[None, :, :, None, None, None], ys.shape).astype(jnp.int32)
    idx = ((batch.reshape(k, 1, 1, 1, 1, 1) * h + ys) * w + xs) * bins + bin_idx
    vals = flat[idx.reshape(-1)].reshape(*idx.shape, c_out)
    acc = (vals * wts[..., None]).sum(axis=(-2, -3, -4))
    count = (gh * gw)[:, None, None, None]
    return acc / count


def _batched_prep(boxes, h, w, bins, spatial_scale, offset, min_size,
                  sampling_ratio, smax):
    b, n, _ = boxes.shape
    flat = boxes.reshape(b * n, 4)
    start_x = flat[:, 0] * spatial_scale + offset
    start_y = flat[:, 1] * spatial_scale + offset
    roi_w = jnp.maximum(flat[:, 2] * spatial_scale + offset - start_x,
                        min_size)
    roi_h = jnp.maximum(flat[:, 3] * spatial_scale + offset - start_y,
                        min_size)
    gh, gw = _grid_counts(roi_h, roi_w, bins[0], bins[1], sampling_ratio,
                          smax)
    by = _interp_matrix(start_y, roi_h, bins[0], gh, smax, h)
    bx = _interp_matrix(start_x, roi_w, bins[1], gw, smax, w)
    return (by.reshape(b, n, bins[0], h), bx.reshape(b, n, bins[1], w))


def roi_align_batched(features, boxes, output_size=(7, 7),
                      spatial_scale=1.0 / 16, sampling_ratio=-1,
                      sampling_max=4, compute_dtype=None):
    """Per-image RoIAlign with NO cross-image selection: features
    [B, H, W, C], boxes [B, N, 4] xyxy (image coordinates) -> crops
    [B, N, ph, pw, C].

    Same numerics as ``roi_align`` (tv0.6 aligned=False); used when rois
    are already laid out one block per image (the fusion network), where
    it removes the per-image accumulation loop of the flat-roi API —
    one pair of batched MXU contractions for the whole batch.

    ``compute_dtype``: einsum operand dtype (the interp matrices are
    always BUILT in f32 and MXU accumulation stays f32); bf16 halves the
    contraction cost for the serving heads_dtype ladder.
    """
    _, h, w, _ = features.shape
    by, bx = _batched_prep(boxes, h, w, output_size, spatial_scale, 0.0,
                           1.0, sampling_ratio, sampling_max)
    cd = compute_dtype or features.dtype
    by, bx = by.astype(cd), bx.astype(cd)
    t = jnp.einsum("bnph,bhwc->bnpwc", by, features.astype(cd),
                   preferred_element_type=jnp.float32).astype(cd)
    return jnp.einsum("bnqw,bnpwc->bnpqc", bx, t,
                      preferred_element_type=jnp.float32).astype(cd)


def ps_roi_align_batched(features, boxes, output_size=(7, 7),
                         spatial_scale=1.0 / 16, sampling_ratio=-1,
                         sampling_max=4, compute_dtype=None):
    """Position-sensitive variant of ``roi_align_batched``: features
    [B, H, W, C_out*ph*pw] (torch C_out-major bin layout), boxes
    [B, N, 4] -> [B, N, ph, pw, C_out]."""
    b, h, w, c_in = features.shape
    ph, pw = output_size
    c_out = c_in // (ph * pw)
    assert c_out * ph * pw == c_in
    by, bx = _batched_prep(boxes, h, w, output_size, spatial_scale, -0.5,
                           0.1, sampling_ratio, sampling_max)
    cd = compute_dtype or features.dtype
    by, bx = by.astype(cd), bx.astype(cd)
    fv = features.astype(cd).reshape(b, h, w, c_out, ph, pw)
    t = jnp.einsum("bnph,bhwupq->bnpqwu", by, fv,
                   preferred_element_type=jnp.float32).astype(cd)
    return jnp.einsum("bnqw,bnpqwu->bnpqu", bx, t,
                      preferred_element_type=jnp.float32).astype(cd)
