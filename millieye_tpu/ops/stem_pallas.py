"""Pallas fused stem: conv3x3(s1) + bias + leaky + maxpool2(s2) in VMEM.

Why: the tiny-YOLO stem stages own 4.8 of the 6.75 ms b32-bf16 backbone
(stage 0 = a 3-input-channel conv at ~2% MXU lane utilization), and both
XLA-level rewrites fail end-to-end — s2d loses its per-stage win to
lane-dimension transposes, the im2col patch matmul is 7x slower
(strided-slice lowering). The only way to win is to keep the full-res
conv output OUT of HBM entirely: this kernel reads the padded input once,
builds tap patches in VMEM band by band, contracts them on the MXU,
applies bias+leaky and the 2x2 pool in registers, and writes only the
pooled half-res result.

HBM traffic per image (416x416x3 f32 -> 208x208x16): read 2.1 MB + write
2.8 MB, vs the plain stage's ~13 MB full-res intermediate round trip.

``fused_stem(x, w, b)`` == ``maxpool2(leaky(conv3x3(x) + b))`` exactly
(tested vs the XLA composition; CPU/tests run interpret mode).

Variant history (Mosaic = the TPU Pallas compiler, libtpu of 2026-08):

* ``im2col`` (round 2): one [2th*W, 9C] x [9C, D] dot per band. Mosaic
  rejects both patch-build spellings — lane-dim ``concatenate`` of the
  nine 3-channel shifted views ("result/input offset mismatch on
  non-concat dimension": the v-shifts live in the sublane (W) dim, so
  the pieces carry sublane offsets 0/1/2 and no single result layout
  matches), and ``stack`` + merged-minor ``reshape``
  [2th, W, 9, C] -> [2th*W, 27] ("infer-vector-layout: unsupported
  shape cast"). Kept for interpret-mode reference.
* ``vconcat`` (round 3, default): group taps by v — for a fixed
  horizontal shift v, the three u-pieces ``x[u:u+2th, v:v+W, :]``
  differ only in the LEADING (h) dim, so they share one sublane offset
  and the lane-dim concat is layout-consistent. Three [2th*W, 3C] x
  [3C, D] dots accumulate the conv. 3x the MXU row-passes of the ideal
  single dot, but it compiles.
* ``vroll``: ``vconcat`` with ``pltpu.roll`` pre-shifting each v-slice
  to sublane offset 0 — fallback if offset-v concat still trips Mosaic.

Reference role: the cuDNN fused conv+pool stem blocks,
``module3_our_dataset/yolov3/models.py:12-79``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pool_store(y, o_ref, *, i, th, w_in, w_out, cout):
    """[2th, W, D] pre-pool band -> bias'd/pooled [th, W/2, D] store."""
    # 2x2 pool: row pairs via a leading split, column pairs via a
    # sublane-adjacent split (both layout-preserving reshapes: the minor
    # lane dim D is untouched)
    from jax.experimental import pallas as pl

    y = y.reshape(th, 2, w_in, cout).max(1)       # [th, W, D]
    y = y.reshape(th, w_out, 2, cout).max(2)      # [th, W/2, D]
    o_ref[pl.dslice(th * i, th)] = y.astype(o_ref.dtype)


def _stem_kernel_im2col(x_ref, w_ref, b_ref, o_ref, *, th, w_out, cin,
                        cout, n_bands):
    from jax.experimental import pallas as pl

    wm = w_ref[...]                       # [9*C, D], tap-major (u, v, c)
    bias = b_ref[...]                     # [D]
    w_in = 2 * w_out                      # unpadded input width

    def band(i, _):
        x = x_ref[pl.dslice(2 * th * i, 2 * th + 2)]
        cols = [x[u:u + 2 * th, v:v + w_in, :]
                for u in range(3) for v in range(3)]
        z = jnp.stack(cols, axis=2)                   # [2th, W, 9, C]
        y = jax.lax.dot_general(
            z.reshape(2 * th * w_in, 9 * cin), wm,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)       # [2th*W, D]
        y = y.reshape(2 * th, w_in, cout) + bias
        y = jnp.where(y > 0, y, 0.1 * y)
        _pool_store(y, o_ref, i=i, th=th, w_in=w_in, w_out=w_out,
                    cout=cout)
        return 0

    jax.lax.fori_loop(0, n_bands, band, 0)


def _stem_kernel_vgroup(x_ref, w_ref, b_ref, o_ref, *, th, w_out, cin,
                        cout, n_bands, roll_v):
    """Per-v grouped patches: 3 accumulated dots of K=3*cin.

    For fixed v all three u-pieces share sublane offset v (u indexes the
    leading dim), so the lane concat has a consistent layout; with
    ``roll_v`` the band is sublane-rotated so every group sits at
    offset 0.
    """
    from jax.experimental import pallas as pl

    bias = b_ref[...]                     # [D]
    w_in = 2 * w_out

    def band(i, _):
        x = x_ref[pl.dslice(2 * th * i, 2 * th + 2)]  # [2th+2, W+2, C]
        acc = jnp.zeros((2 * th * w_in, cout), jnp.float32)
        for v in range(3):
            if roll_v and v:
                from jax.experimental.pallas import tpu as pltpu
                # cyclic left-shift by v (roll requires shift >= 0); the
                # wrapped tail lands beyond the [0:w_in] slice
                xv, vv = pltpu.roll(x, w_in + 2 - v, 1), 0
            else:
                xv, vv = x, v
            zv = jnp.concatenate(
                [xv[u:u + 2 * th, vv:vv + w_in, :] for u in range(3)],
                axis=2)                               # [2th, W, 3C]
            acc = acc + jax.lax.dot_general(
                zv.reshape(2 * th * w_in, 3 * cin),
                w_ref[3 * cin * v:3 * cin * (v + 1)],
                (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)   # [2th*W, D]
        y = acc.reshape(2 * th, w_in, cout) + bias
        y = jnp.where(y > 0, y, 0.1 * y)
        _pool_store(y, o_ref, i=i, th=th, w_in=w_in, w_out=w_out,
                    cout=cout)
        return 0

    jax.lax.fori_loop(0, n_bands, band, 0)


def _stem_kernel_planar(x_ref, a_ref, b_ref, p_ref, o_ref, s_ref, *,
                        band, w_pad, cin, cout, k_pad, n_bands,
                        precision):
    """Planar stencil: C-major input, W in lanes, taps in sublanes.

    Every VMEM buffer is lane-dense (the NHWC spelling lane-pads C=3 to
    128 and OOMs VMEM at 86 MB for one 416px image). Per band of
    ``band`` pre-pool rows:

    * 9*C slab copies build the patch scratch S[(c,u,v), r, w] =
      x[c, r0+r+u, w+v] — leading-dim writes of lane-rolled row slabs,
      no lane concat or minor reshape anywhere;
    * one transposed MXU dot A[D, K] @ S[K, band*W] does the whole conv
      (output channels in sublanes, pixels in lanes — nothing wasted
      when D < 128, unlike the [pixels, K] orientation);
    * 2x2 pool: row pairs become adjacent W-lane halves after an
      aligned minor split; column pairs via lane-roll + max; the even-
      column select is a one-hot matmul (strided lane slices don't
      lower well — a selection matrix rides the MXU instead).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_mat = a_ref[...]                    # [D, K_pad] (zero-padded cols)
    bias = b_ref[...]                     # [D, 1]
    psel = p_ref[...]                     # [W_pad, W_pad//2] one-hot
    half = band // 2
    if k_pad > 9 * cin:
        # zero the K-pad tail once: A's pad columns are zero, but
        # 0 * uninitialized(NaN) would still poison the dot
        s_ref[9 * cin:] = jnp.zeros((k_pad - 9 * cin, band, w_pad),
                                    jnp.float32)

    def band_fn(i, _):
        # dynamic sublane offsets: CLAIM 8-alignment only when band
        # actually guarantees it — a false multiple_of hint is silent
        # miscompilation under Mosaic, not an error
        r0 = (pl.multiple_of(band * i, 8) if band % 8 == 0
              else band * i)
        for c in range(cin):
            big = x_ref[c, pl.dslice(r0, band + 8)]        # [band+8, W]
            # roll the whole (band+8)-row block once per v (lane roll and
            # row slice commute): 2 rolls per channel-band instead of 6
            for v in range(3):
                bv = big if v == 0 else pltpu.roll(big, w_pad - v, 1)
                for u in range(3):
                    s_ref[c * 9 + u * 3 + v] = bv[u:u + band]
        z = s_ref[...].reshape(k_pad, band * w_pad)
        y = jax.lax.dot_general(
            a_mat, z, (((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)            # [D, band*W]
        y = y + bias
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(cout, half, 2 * w_pad)
        rmax = jnp.maximum(y3[:, :, :w_pad], y3[:, :, w_pad:])
        cmax = jnp.maximum(rmax, pltpu.roll(rmax, w_pad - 1, 2))
        pooled = _pool_select_dot(
            cmax.reshape(cout * half, w_pad), psel,
            precision)                                     # [D*half, W/2]
        o_ref[:, pl.dslice(half * i, half)] = pooled.reshape(
            cout, half, w_pad // 2).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands, band_fn, 0)


def _stem_kernel_planar_rowdot(x_ref, a_ref, b_ref, p_ref, o_ref, s_ref,
                               y_ref, *, band, w_pad, cin, cout, k_pad,
                               n_bands, precision):
    """Row-pair planar spelling with NO sublane<->lane reshape anywhere —
    the batched spelling's [K, band, W] -> [K, band*W] collapse is the
    likeliest Mosaic-hang suspect. Per output row: two K-row scratch
    fills (single-sublane writes of lane-rolled rows), two [D, K] x
    [K, W] dots, elementwise row-pair max, lane-roll + max for columns,
    and the one-hot select matmul. Pooled rows land in a band scratch at
    STATIC sublane offsets; one aligned store per band writes them out.
    More op overhead than the batched spelling, still well under the XLA
    stage."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a_mat = a_ref[...]                    # [D, K_pad]
    bias = b_ref[...]                     # [D, 1]
    psel = p_ref[...]                     # [W_pad, W_pad//2]
    half = band // 2
    if k_pad > 9 * cin:
        s_ref[9 * cin:] = jnp.zeros((k_pad - 9 * cin, w_pad), jnp.float32)

    def band_fn(i, _):
        r0 = (pl.multiple_of(band * i, 8) if band % 8 == 0
              else band * i)
        bigs = [x_ref[c, pl.dslice(r0, band + 8)] for c in range(cin)]

        for o in range(half):             # static python loop
            ys = []
            for dr in (0, 1):
                r = 2 * o + dr
                for c in range(cin):
                    for u in range(3):
                        row = bigs[c][r + u:r + u + 1]     # [1, W_pad]
                        for v in range(3):
                            rv = row if v == 0 else pltpu.roll(
                                row, w_pad - v, 1)
                            k = c * 9 + u * 3 + v
                            s_ref[k:k + 1] = rv
                y = jax.lax.dot_general(
                    a_mat, s_ref[...], (((1,), (0,)), ((), ())),
                    precision=precision,
                    preferred_element_type=jnp.float32)    # [D, W_pad]
                y = y + bias
                ys.append(jnp.where(y > 0, y, 0.1 * y))
            rmax = jnp.maximum(ys[0], ys[1])
            cmax = jnp.maximum(rmax, pltpu.roll(rmax, w_pad - 1, 1))
            y_ref[:, o, :] = _pool_select_dot(
                cmax, psel, precision)                     # [D, W_pad/2]
        o_ref[:, pl.dslice(half * i, half)] = y_ref[...].astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands, band_fn, 0)


def _stem_kernel_planar2(x_ref, a0_ref, b0_ref, a1_ref, b1_ref, p0_ref,
                         p1_ref, o_ref, xb, s0, y1, s1, sem, *,
                         w_pad, cin, c_mid, c_out, k0_pad, k1,
                         n_bands0, n_bands1, precision):
    """Double-fused stem: TWO conv3x3+pool stages in one kernel — the
    half-res intermediate lives in a VMEM scratch (``y1``) and never
    touches HBM (nor the planar<->NHWC transposes between two single-
    stage calls).

    The input stays in HBM (``memory_space=ANY``): whole-image VMEM
    blocks plus the resident intermediate exceed the 16 MB budget, so
    stage-0 bands are DMA'd in with two revolving [cin, 24, W] buffers
    (prefetch next while computing current).

    ``y1`` layout bakes stage-1's halo: valid pooled row q at sublane
    8+q (8 zero rows above keep every dynamic store/load offset a
    multiple of 8), valid pooled col w at lane w+1 (a one-lane roll
    after the pool select; the masked select matrix zeroes every
    out-of-range column, so the roll wraps a zero into lane 0 and the
    right halo is already zero). Stage-1 taps are then static slab
    slices ``[u+7 : u+23]`` of an aligned 32-row load, exactly like the
    single-stage kernel's ``[u : u+band]``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    a0 = a0_ref[...]                      # [c_mid, K0_pad]
    bias0 = b0_ref[...]                   # [c_mid, 1]
    a1 = a1_ref[...]                      # [c_out, K1]
    bias1 = b1_ref[...]                   # [c_out, 1]
    p0 = p0_ref[...]                      # [W, W/2] masked one-hot
    p1 = p1_ref[...]                      # [W/2, W/4] masked one-hot
    w_mid = w_pad // 2
    w_out = w_pad // 4

    if k0_pad > 9 * cin:
        s0[9 * cin:] = jnp.zeros((k0_pad - 9 * cin, 16, w_pad),
                                 jnp.float32)
    # y1 halos: 8 alignment rows above, bottom halo + unwritten tail
    y1[:, 0:8] = jnp.zeros((c_mid, 8, w_mid), jnp.float32)
    tail = y1.shape[1] - (8 + 8 * n_bands0)
    if tail:
        y1[:, 8 + 8 * n_bands0:] = jnp.zeros((c_mid, tail, w_mid),
                                             jnp.float32)

    def in_dma(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(16 * i, 24)], xb.at[slot], sem.at[slot])

    in_dma(0, 0).start()

    def band0(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_bands0)
        def _():
            in_dma(i + 1, 1 - slot).start()

        in_dma(i, slot).wait()
        for c in range(cin):
            big = xb[slot, c]                              # [24, W]
            for v in range(3):
                bv = big if v == 0 else pltpu.roll(big, w_pad - v, 1)
                for u in range(3):
                    s0[c * 9 + u * 3 + v] = bv[u:u + 16]
        z = s0[...].reshape(k0_pad, 16 * w_pad)
        y = jax.lax.dot_general(
            a0, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_mid, 16W]
        y = y + bias0
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_mid, 8, 2 * w_pad)
        rmax = jnp.maximum(y3[:, :, :w_pad], y3[:, :, w_pad:])
        cmax = jnp.maximum(rmax, pltpu.roll(rmax, w_pad - 1, 2))
        pooled = _pool_select_dot(
            cmax.reshape(c_mid * 8, w_pad), p0, precision)
        pooled = pltpu.roll(pooled.reshape(c_mid, 8, w_mid), 1, 2)
        y1[:, pl.dslice(pl.multiple_of(8 + 8 * i, 8), 8)] = pooled
        return 0

    jax.lax.fori_loop(0, n_bands0, band0, 0)

    def band1(i, _):
        r1 = pl.multiple_of(16 * i, 8)
        for c in range(c_mid):
            big = y1[c, pl.dslice(r1, 32)]                 # [32, W/2]
            for v in range(3):
                bv = big if v == 0 else pltpu.roll(big, w_mid - v, 1)
                for u in range(3):
                    s1[c * 9 + u * 3 + v] = bv[u + 7:u + 23]
        z = s1[...].reshape(k1, 16 * w_mid)
        y = jax.lax.dot_general(
            a1, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_out, 16W/2]
        y = y + bias1
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_out, 8, 2 * w_mid)
        rmax = jnp.maximum(y3[:, :, :w_mid], y3[:, :, w_mid:])
        cmax = jnp.maximum(rmax, pltpu.roll(rmax, w_mid - 1, 2))
        pooled = _pool_select_dot(
            cmax.reshape(c_out * 8, w_mid), p1, precision)
        o_ref[:, pl.dslice(pl.multiple_of(8 * i, 8), 8)] = pooled.reshape(
            c_out, 8, w_out).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands1, band1, 0)


def _round_up(x, m):
    return (x + m - 1) // m * m


# conv-dot MXU passes: "highest" = true f32 (exact vs the XLA f32 stage),
# "default" = one-pass bf16 products with f32 accumulate. On-chip (b32,
# both stem stages): highest 5015 us, default 3493 us vs 8499 us for the
# default-precision XLA stages — the dots, not the VMEM copies, dominate
# the kernel. Precision.HIGH is NOT offered: Mosaic's dot lowering
# raises "Unsupported dot precision: HIGH" (only DEFAULT/HIGHEST lower).
_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "default": jax.lax.Precision.DEFAULT}


def _pool_select_dot(v, psel, conv_prec):
    """The pool's even-column one-hot select as MXU passes.

    At ``highest`` conv dots: one HIGHEST (6-pass) matmul — the kernel's
    bit-exactness property vs the f32 XLA stage. Otherwise a manual
    hi/lo split into TWO 1-pass DEFAULT matmuls: ``v_hi`` is exactly
    bf16 so its product is exact, ``v_lo`` carries the remainder with
    ~2^-16 relative error — far below both the f16 store step (2^-11)
    and the conv dots' own bf16 rounding, at a third of the HIGHEST
    pass count. (A single DEFAULT select would round the selected
    VALUES to bf16 — the dark-mAP store problem — and Mosaic cannot
    lower Precision.HIGH, hence the manual split.)"""
    if conv_prec == jax.lax.Precision.HIGHEST:
        return jax.lax.dot_general(
            v, psel, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    v_hi = v.astype(jnp.bfloat16).astype(jnp.float32)
    lo = jax.lax.dot_general(
        v - v_hi, psel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    hi = jax.lax.dot_general(
        v_hi, psel, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return hi + lo


def _pool_select(w_pad, n_valid):
    """[w_pad, w_pad//2] even-column one-hot with out-of-range columns
    zeroed — the pool's strided lane select as one MXU pass, and the
    mask keeps roll-wrapped halo lanes exactly zero."""
    row = jax.lax.broadcasted_iota(jnp.int32, (w_pad, w_pad // 2), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w_pad, w_pad // 2), 1)
    return ((row == 2 * col) & (col < n_valid)).astype(jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_dtype", "precision"))
def fused_stem2_planar(x, w0, b0, w1, b1, interpret=False, out_dtype=None,
                       precision="highest"):
    """Two fused stem stages in ONE Pallas call:

    [N, H, W, C] -> [N, H/4, W/4, D1] ==
        maxpool2(leaky(conv3x3_w1(maxpool2(leaky(conv3x3_w0(x) + b0)))
                 + b1))

    The half-res intermediate (the largest activation in the network
    after the stage-0 pre-pool map) stays in VMEM — no HBM round trip
    and no planar<->NHWC transposes between the stages. f32 arithmetic
    on the MXU regardless of input dtype; ``out_dtype`` follows the
    store ladder (f16 is cast outside the kernel — Mosaic has no f16).

    Reference role: consecutive cuDNN fused conv+pool stem blocks,
    ``module3_our_dataset/yolov3/models.py:12-79``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w_in, cin = x.shape
    c_mid = w0.shape[3]
    c_out = w1.shape[3]
    assert w0.shape[:3] == (3, 3, cin), w0.shape
    assert w1.shape[:3] == (3, 3, c_mid), w1.shape
    assert h % 32 == 0 and w_in % 4 == 0, (h, w_in)
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    store_dtype = (jnp.dtype(jnp.float32) if out_dtype == jnp.float16
                   else out_dtype)
    w_pad = _round_up(w_in + 2, 128)
    assert w_pad // 2 >= w_in // 2 + 2, (w_pad, w_in)
    k0_pad = _round_up(9 * cin, 8)
    k1 = _round_up(9 * c_mid, 8)
    assert k1 == 9 * c_mid, "c_mid*9 must be sublane-aligned"
    n_bands0 = h // 16
    n_bands1 = h // 2 // 16
    h_mid = 16 * (n_bands1 - 1) + 32      # y1 rows: last aligned load
    prec = _PRECISIONS[precision]

    xp = jnp.pad(x.astype(jnp.float32).transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (1, 7), (1, w_pad - w_in - 1)))
    a0 = jnp.pad(w0.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
        c_mid, 9 * cin), ((0, 0), (0, k0_pad - 9 * cin)))
    a1 = w1.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(c_out, k1)

    kernel = functools.partial(
        _stem_kernel_planar2, w_pad=w_pad, cin=cin, c_mid=c_mid,
        c_out=c_out, k0_pad=k0_pad, k1=k1, n_bands0=n_bands0,
        n_bands1=n_bands1, precision=prec)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # x: HBM + DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, c_out, h // 4, w_pad // 4),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c_out, h // 4, w_pad // 4),
                                       store_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, 24, w_pad), jnp.float32),      # xb
            pltpu.VMEM((k0_pad, 16, w_pad), jnp.float32),      # s0
            pltpu.VMEM((c_mid, h_mid, w_pad // 2), jnp.float32),  # y1
            pltpu.VMEM((k1, 16, w_pad // 2), jnp.float32),     # s1
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, a0, b0.astype(jnp.float32).reshape(c_mid, 1), a1,
      b1.astype(jnp.float32).reshape(c_out, 1),
      _pool_select(w_pad, w_in // 2),
      _pool_select(w_pad // 2, w_in // 4))
    return (out[:, :, :, :w_in // 4].transpose(0, 2, 3, 1)
            .astype(out_dtype))


@functools.partial(jax.jit,
                   static_argnames=("band", "interpret", "out_dtype",
                                    "variant", "precision"))
def fused_stem_planar(x, w, b, band=None, interpret=False, out_dtype=None,
                      variant="batched", precision="highest"):
    """NHWC drop-in for ``fused_stem`` via the planar kernel.

    [N, H, W, C] -> [N, H/2, W/2, D] == maxpool2(leaky(conv3x3(x)+b)).
    ``band``: pre-pool rows per VMEM band (even; H is zero-padded up to
    the band grid and the garbage pooled rows sliced off); None picks 16
    or 8, preferring whichever wastes <= 4 pad rows (band=16 measured
    fastest at the stem shapes; 32 exceeds the 16 MB scoped-VMEM stack).
    ``variant``: "batched" (one [D,K]x[K,band*W] dot per band) or
    "rowdot" (per-row dots, no sublane<->lane reshapes).
    ``precision``: MXU passes for the conv dot — "highest" (default)
    keeps true f32 arithmetic (exact vs the XLA f32 stage and the
    hi-prec-stem property for free; the stem's MXU work is tiny, so the
    extra passes are free next to the VMEM copies); "default" is the
    one-pass bf16 MXU product. The pool's one-hot select matmul is
    always HIGHEST (anything less rounds the selected VALUES to bf16).
    The wrapper pays one NHWC->planar transpose on the 2 MB input and
    one planar->NHWC transpose on the pooled output — both tiny next to
    the full-res intermediate the fused kernel keeps out of HBM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w_in, cin = x.shape
    cout = w.shape[3]
    assert w.shape[:3] == (3, 3, cin), w.shape
    # rows are padded up to an 8-aligned band grid rather than falling
    # back to unaligned bands (Mosaic-provable dynamic offsets beat a
    # few garbage rows: h=52 -> 56 costs one band's compute, h=104 is
    # already clean) — the padded pooled rows are sliced off below
    h_eff = h if band is None else _round_up(h, band)
    if band is None:
        h_eff = next((_round_up(h, k) for k in (16, 8)
                      if _round_up(h, k) - h <= 4), _round_up(h, 8))
        band = next(k for k in (16, 8) if h_eff % k == 0)
    assert h % 2 == 0 and w_in % 2 == 0 and band % 2 == 0 \
        and h_eff % band == 0
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    # Mosaic has no f16 type ("Unsupported type in mosaic dialect: 'f16'"
    # kills the whole e2e compile): when the hi_prec_store ladder asks
    # for f16, the KERNEL stores f32 and the cast rides the planar->NHWC
    # output transpose below — one fused XLA pass, no extra HBM trip.
    store_dtype = (jnp.dtype(jnp.float32) if out_dtype == jnp.float16
                   else out_dtype)
    w_pad = _round_up(w_in + 2, 128)
    k_pad = _round_up(9 * cin, 8)
    assert variant in ("batched", "rowdot"), variant
    prec = _PRECISIONS[precision]

    # rows padded 1 above + 7 below (+ the band-grid pad): the kernel
    # loads aligned (band+8)-row blocks, so the last band reads 6 rows
    # past the halo
    xp = jnp.pad(x.astype(jnp.float32).transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (1, 7 + h_eff - h),
                  (1, w_pad - w_in - 1)))
    # A[d, c*9 + u*3 + v] = w[u, v, c, d]; zero K-pad columns make the
    # scratch's uninitialized tail rows contribute nothing
    a_mat = jnp.pad(w.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
        cout, 9 * cin), ((0, 0), (0, k_pad - 9 * cin)))
    row = jax.lax.broadcasted_iota(jnp.int32, (w_pad, w_pad // 2), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (w_pad, w_pad // 2), 1)
    psel = (row == 2 * col).astype(jnp.float32)

    if variant == "batched":
        kernel = functools.partial(
            _stem_kernel_planar, band=band, w_pad=w_pad, cin=cin,
            cout=cout, k_pad=k_pad, n_bands=h_eff // band, precision=prec)
        scratch = [pltpu.VMEM((k_pad, band, w_pad), jnp.float32)]
    else:
        kernel = functools.partial(
            _stem_kernel_planar_rowdot, band=band, w_pad=w_pad, cin=cin,
            cout=cout, k_pad=k_pad, n_bands=h_eff // band, precision=prec)
        scratch = [pltpu.VMEM((k_pad, w_pad), jnp.float32),
                   pltpu.VMEM((cout, band // 2, w_pad // 2), jnp.float32)]
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, cin, h_eff + 8, w_pad),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, cout, h_eff // 2, w_pad // 2),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, cout, h_eff // 2, w_pad // 2),
                                       store_dtype),
        scratch_shapes=scratch,
        # the deep stages (cin 64) need ~17.3 MB of scoped stack — over
        # Mosaic's 16 MB default but nowhere near the chip's 128 MB VMEM
        # (measured: the s6 52x52x64->128 compile dies by 1.33 MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xp, a_mat, b.astype(jnp.float32).reshape(cout, 1), psel)
    return (out[:, :, :h // 2, :w_in // 2].transpose(0, 2, 3, 1)
            .astype(out_dtype))


@functools.partial(jax.jit,
                   static_argnames=("th", "interpret", "out_dtype",
                                    "variant"))
def fused_stem(x, w, b, th=26, interpret=False, out_dtype=None,
               variant="vconcat"):
    """[N, H, W, C] -> [N, H/2, W/2, D] == maxpool2(leaky(conv3x3(x)+b)).

    ``th``: output rows per VMEM band (H/2 % th == 0). Compute is f32 on
    the MXU regardless of input dtype (the stem is where low-precision
    STORES lose dark-frame contrast — see Darknet.hi_prec_stages);
    ``out_dtype`` sets the store dtype (default: x.dtype).
    ``variant``: patch-build spelling — "vconcat" (default), "vroll",
    or "im2col" (round-2 spelling, interpret-only on current Mosaic).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w_in, cin = x.shape
    cout = w.shape[3]
    assert w.shape[:3] == (3, 3, cin), w.shape
    assert h % 2 == 0 and w_in % 2 == 0 and (h // 2) % th == 0
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    # Mosaic has no f16 (see fused_stem_planar): store f32, cast outside
    store_dtype = (jnp.dtype(jnp.float32) if out_dtype == jnp.float16
                   else out_dtype)

    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (1, 1), (1, 1), (0, 0)))
    if variant == "im2col":
        # tap-major (u, v, c) rows, matching the stacked patch order
        wm = w.astype(jnp.float32).reshape(9 * cin, cout)
        kernel = functools.partial(
            _stem_kernel_im2col, th=th, w_out=w_in // 2, cin=cin,
            cout=cout, n_bands=h // 2 // th)
    elif variant in ("vconcat", "vroll"):
        # v-major (v, u, c) rows, matching the per-v concat order
        wm = w.astype(jnp.float32).transpose(1, 0, 2, 3).reshape(
            9 * cin, cout)
        kernel = functools.partial(
            _stem_kernel_vgroup, th=th, w_out=w_in // 2, cin=cin,
            cout=cout, n_bands=h // 2 // th, roll_v=variant == "vroll")
    else:
        raise ValueError(f"unknown variant {variant!r}")

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, h + 2, w_in + 2, cin),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, h // 2, w_in // 2, cout),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w_in // 2, cout),
                                       store_dtype),
        interpret=interpret,
    )(xp, wm, b.astype(jnp.float32)).astype(out_dtype)


# ---------------------------------------------------------------------------
# Phase-split double-fused stem (round 3b).
#
# The select-kernel's measured profile: conv dots ~0.3 ms, pool-select
# matmuls ~0.4-0.8 ms, patch-fill VMEM copies ~1-1.5 ms of the 3.07 ms
# b32 pair. Two structural fixes, composable:
#
# * PHASE-GROUPED LANES: the input's padded columns are regrouped so lane
#   d*Q + m holds column 4m+d (stage 0; 2 phases for stage 1). A conv
#   tap +v then maps phase d -> (d+v)%4 with an m+1 carry on the wrapped
#   blocks — ONE whole-row lane-roll plus one masked select per tap
#   group, exactly like the old v-roll. The payoff is the pool: output
#   col 2m = max(conv 4m, 4m+1) = max(block0, block1)[m] — the 2x2 pool
#   becomes LANE-BLOCK maxes. No one-hot select matmul, no cmax roll,
#   and the pooled result is born lane-compact.
# * bf16 SCRATCHES (precision="default" only): DEFAULT-precision MXU
#   dots round their inputs to bf16 anyway, so storing the patch
#   scratches (and the DMA'd input bands) in bf16 is bit-identical to
#   the f32-scratch default-precision kernel while halving the dominant
#   copy traffic. The inter-stage intermediate y1 stays f32 (stem STORE
#   precision is the dark-mAP-critical knob, DESIGN.md).
#
# Reference role: the cuDNN fused conv+pool stem blocks,
# ``module3_our_dataset/yolov3/models.py:12-79``.
# ---------------------------------------------------------------------------


def _u_shifted(bv, u, sdtype):
    """(value, base_offset) such that value[base+off : ...] reads the
    rows ``bv[base+u : ...]``.

    f32 path: ``(bv, u)`` — the direct (possibly odd-offset) sublane
    slice, unchanged from the chip-proven kernels. bf16 path: bf16
    vector tiles pack two sublanes per 32-bit word, and the odd-offset
    (u = 1, 2) sublane value-slices are what crashes Mosaic's compile
    helper on the bf16-scratch kernels (round-4 on-chip finding: every
    *_bf16s variant dies in tpu_compile_helper while the f32-scratch
    twins compile) — so the u-shift becomes ONE whole-value sublane
    roll (a supported relayout) and every later slice is 16-aligned:
    ``roll(bv, n-u)[16g : 16g+16] == bv[16g+u : 16g+u+16]``."""
    from jax.experimental.pallas import tpu as pltpu

    if u == 0 or sdtype != jnp.bfloat16:
        return bv, u
    return pltpu.roll(bv, bv.shape[0] - u, 0), 0


def _stem_kernel_planar2_phase(x_ref, a0_ref, b0_ref, a1_ref, b1_ref,
                               o_ref, xb, s0, y1, s1, sem, *,
                               q, cin, c_mid, c_out, k0_pad, k1,
                               n_bands0, n_bands1, precision, n_e, n_o,
                               xb_dt, s0_dt, s1_dt, dma_rows):
    """Phase-grouped double-fused stem kernel (see module comment).

    Lane layouts: stage-0 input 4 phase blocks of ``q`` lanes (block d,
    lane m = padded col 4m+d); y1 two parity blocks (block p, lane m =
    stage-1 padded input col 2m+p); output lane-compact pooled cols.

    ``xb_dt``/``s0_dt``/``s1_dt``: per-buffer dtypes (f32 or bf16 —
    the ``bf16_only`` bisect knob of the wrapper); ``dma_rows``: rows
    per stage-0 input DMA — 24 for f32, 32 for bf16 so the copy covers
    whole (16, 128) bf16 tiles (24 = 3 f32 tiles but 1.5 bf16 tiles;
    fractional-tile DMAs are the round-4 compile-crash suspect shared
    by every bf16-scratch variant while the f32 twins compile).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    a0 = a0_ref[...]                      # [c_mid, K0_pad]
    bias0 = b0_ref[...]                   # [c_mid, 1]
    a1 = a1_ref[...]                      # [c_out, K1]
    bias1 = b1_ref[...]                   # [c_out, 1]
    wq = 4 * q
    w_mid = 2 * q

    if k0_pad > 9 * cin:
        s0[9 * cin:] = jnp.zeros((k0_pad - 9 * cin, 16, wq), s0_dt)
    y1[:, 0:8] = jnp.zeros((c_mid, 8, w_mid), jnp.float32)
    tail = y1.shape[1] - (8 + 8 * n_bands0)
    if tail:
        y1[:, 8 + 8 * n_bands0:] = jnp.zeros((c_mid, tail, w_mid),
                                             jnp.float32)

    # hoisted masks (band-invariant)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (dma_rows, wq), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (32, w_mid), 1)
    lanep = jax.lax.broadcasted_iota(jnp.int32, (c_mid, 8, q), 2)

    def in_dma(i, slot):
        return pltpu.make_async_copy(
            x_ref.at[b, :, pl.ds(16 * i, dma_rows)], xb.at[slot],
            sem.at[slot])

    in_dma(0, 0).start()

    def band0(i, _):
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_bands0)
        def _():
            in_dma(i + 1, 1 - slot).start()

        in_dma(i, slot).wait()
        for c in range(cin):
            big = xb[slot, c]                              # [dma_rows, wq]
            for v in range(3):
                if v == 0:
                    bv = big
                else:
                    sh = (4 - v) * q
                    t = pltpu.roll(big, sh, 1)         # src = dest + v*q
                    fx = pltpu.roll(big, sh - 1, 1)    # src = dest + v*q+1
                    bv = jnp.where(lane0 >= (4 - v) * q, fx, t)
                for u in range(3):
                    sv, du = _u_shifted(bv, u, xb_dt)
                    val = sv[du:du + 16]
                    if val.dtype != s0_dt:
                        val = val.astype(s0_dt)
                    s0[c * 9 + u * 3 + v] = val
        z = s0[...].reshape(k0_pad, 16 * wq)
        y = jax.lax.dot_general(
            a0, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_mid, 16wq]
        y = y + bias0
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_mid, 8, 2 * wq)
        rmax = jnp.maximum(y3[:, :, :wq], y3[:, :, wq:])   # [c_mid, 8, wq]
        pe = jnp.maximum(rmax[:, :, 0:q], rmax[:, :, q:2 * q])
        po = jnp.maximum(rmax[:, :, 2 * q:3 * q], rmax[:, :, 3 * q:])
        # exact-zero the out-of-range tail: stage-1's halo reads and the
        # parity-roll wrap both rely on zeros there
        pe = jnp.where(lanep < n_e, pe, 0.0)
        po = jnp.where(lanep < n_o, po, 0.0)
        # y1 parity blocks: xp1[2m] = pooled[2m-1] = po[m-1] (left halo
        # zero rides the roll wrap of the masked tail); xp1[2m+1] = pe[m]
        r = pl.multiple_of(8 + 8 * i, 8)
        y1[:, pl.dslice(r, 8), 0:q] = pltpu.roll(po, 1, 2)
        y1[:, pl.dslice(r, 8), q:2 * q] = pe
        return 0

    jax.lax.fori_loop(0, n_bands0, band0, 0)

    def band1(i, _):
        r1 = pl.multiple_of(16 * i, 8)
        for c in range(c_mid):
            big = y1[c, pl.dslice(r1, 32)]                 # [32, 2q] f32
            for v in range(3):
                if v == 0:
                    bv = big
                elif v == 1:
                    t = pltpu.roll(big, q, 1)          # src = dest + q
                    fx = pltpu.roll(big, q - 1, 1)     # src = dest + q+1
                    bv = jnp.where(lane1 >= q, fx, t)
                else:
                    # src = dest+1 per block; the two block-crossing
                    # lanes land at m = q-1, beyond the valid range
                    bv = pltpu.roll(big, 2 * q - 1, 1)
                for u in range(3):
                    s1[c * 9 + u * 3 + v] = bv[u + 7:u + 23].astype(s1_dt)
        z = s1[...].reshape(k1, 16 * w_mid)
        y = jax.lax.dot_general(
            a1, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_out, 16*2q]
        y = y + bias1
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_out, 8, 2 * w_mid)
        rmax = jnp.maximum(y3[:, :, :w_mid], y3[:, :, w_mid:])
        pooled = jnp.maximum(rmax[:, :, 0:q], rmax[:, :, q:])
        o_ref[:, pl.dslice(pl.multiple_of(8 * i, 8), 8)] = pooled.astype(
            o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands1, band1, 0)


def _stem_kernel_planar2_phase_vmem(x_ref, a0_ref, b0_ref, a1_ref,
                                    b1_ref, o_ref, s0, y1, s1, *,
                                    q, cin, c_mid, c_out, k0_pad, k1,
                                    n_bands0, n_bands1, precision, n_e,
                                    n_o, s0_dt, s1_dt, in_rows):
    """``_stem_kernel_planar2_phase`` with the input as a per-image VMEM
    BlockSpec instead of revolving DMA buffers: band reads are direct
    ref slices, the Pallas pipeline stages the HBM fetch across grid
    steps, and a bf16 input works (the bf16 user-DMA is the chip's
    compile-crash vector — wrapper docstring). Stage-1 is identical."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    a0 = a0_ref[...]                      # [c_mid, K0_pad]
    bias0 = b0_ref[...]                   # [c_mid, 1]
    a1 = a1_ref[...]                      # [c_out, K1]
    bias1 = b1_ref[...]                   # [c_out, 1]
    wq = 4 * q
    w_mid = 2 * q

    if k0_pad > 9 * cin:
        s0[9 * cin:] = jnp.zeros((k0_pad - 9 * cin, 16, wq), s0_dt)
    y1[:, 0:8] = jnp.zeros((c_mid, 8, w_mid), jnp.float32)
    tail = y1.shape[1] - (8 + 8 * n_bands0)
    if tail:
        y1[:, 8 + 8 * n_bands0:] = jnp.zeros((c_mid, tail, w_mid),
                                             jnp.float32)

    lane0 = jax.lax.broadcasted_iota(jnp.int32, (in_rows, wq), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (32, w_mid), 1)
    lanep = jax.lax.broadcasted_iota(jnp.int32, (c_mid, 8, q), 2)

    def band0(i, _):
        r0 = pl.multiple_of(16 * i, 8)
        for c in range(cin):
            big = x_ref[c, pl.dslice(r0, in_rows)]        # [in_rows, wq]
            for v in range(3):
                if v == 0:
                    bv = big
                else:
                    sh = (4 - v) * q
                    t = pltpu.roll(big, sh, 1)         # src = dest + v*q
                    fx = pltpu.roll(big, sh - 1, 1)    # src = dest + v*q+1
                    bv = jnp.where(lane0 >= (4 - v) * q, fx, t)
                for u in range(3):
                    sv, du = _u_shifted(bv, u, bv.dtype)
                    val = sv[du:du + 16]
                    if val.dtype != s0_dt:
                        val = val.astype(s0_dt)
                    s0[c * 9 + u * 3 + v] = val
        z = s0[...].reshape(k0_pad, 16 * wq)
        y = jax.lax.dot_general(
            a0, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_mid, 16wq]
        y = y + bias0
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_mid, 8, 2 * wq)
        rmax = jnp.maximum(y3[:, :, :wq], y3[:, :, wq:])   # [c_mid, 8, wq]
        pe = jnp.maximum(rmax[:, :, 0:q], rmax[:, :, q:2 * q])
        po = jnp.maximum(rmax[:, :, 2 * q:3 * q], rmax[:, :, 3 * q:])
        pe = jnp.where(lanep < n_e, pe, 0.0)
        po = jnp.where(lanep < n_o, po, 0.0)
        r = pl.multiple_of(8 + 8 * i, 8)
        y1[:, pl.dslice(r, 8), 0:q] = pltpu.roll(po, 1, 2)
        y1[:, pl.dslice(r, 8), q:2 * q] = pe
        return 0

    jax.lax.fori_loop(0, n_bands0, band0, 0)

    def band1(i, _):
        r1 = pl.multiple_of(16 * i, 8)
        for c in range(c_mid):
            big = y1[c, pl.dslice(r1, 32)]                 # [32, 2q] f32
            for v in range(3):
                if v == 0:
                    bv = big
                elif v == 1:
                    t = pltpu.roll(big, q, 1)          # src = dest + q
                    fx = pltpu.roll(big, q - 1, 1)     # src = dest + q+1
                    bv = jnp.where(lane1 >= q, fx, t)
                else:
                    bv = pltpu.roll(big, 2 * q - 1, 1)
                for u in range(3):
                    s1[c * 9 + u * 3 + v] = bv[u + 7:u + 23].astype(s1_dt)
        z = s1[...].reshape(k1, 16 * w_mid)
        y = jax.lax.dot_general(
            a1, z, (((1,), (0,)), ((), ())), precision=precision,
            preferred_element_type=jnp.float32)            # [c_out, 16*2q]
        y = y + bias1
        y = jnp.where(y > 0, y, 0.1 * y)
        y3 = y.reshape(c_out, 8, 2 * w_mid)
        rmax = jnp.maximum(y3[:, :, :w_mid], y3[:, :, w_mid:])
        pooled = jnp.maximum(rmax[:, :, 0:q], rmax[:, :, q:])
        o_ref[:, pl.dslice(pl.multiple_of(8 * i, 8), 8)] = pooled.astype(
            o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_bands1, band1, 0)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_dtype", "precision",
                                    "scratch_dtype", "bf16_only",
                                    "input_mode"))
def fused_stem2_phase(x, w0, b0, w1, b1, interpret=False, out_dtype=None,
                      precision="highest", scratch_dtype=None,
                      bf16_only=None, input_mode="dma"):
    """Phase-split spelling of ``fused_stem2_planar`` — same contract:

    [N, H, W, C] -> [N, H/4, W/4, D1] ==
        maxpool2(leaky(conv3x3_w1(maxpool2(leaky(conv3x3_w0(x) + b0)))
                 + b1))

    ``scratch_dtype`` (default f32): dtype of the DMA'd input bands and
    both patch scratches. bfloat16 is only allowed with
    precision="default", where it is bit-identical to the f32-scratch
    kernel (DEFAULT dots round inputs to bf16 on the MXU regardless)
    but with half the fill-copy traffic. The inter-stage intermediate
    stays f32 either way. When the input buffer is bf16, the stage-0
    DMA window grows 24 -> 32 rows (and the input row pad 7 -> 15) so
    every async copy covers whole (16, 128) bf16 tiles — the r4 gate
    showed every bf16-scratch kernel crashing the remote compile helper
    while its f32 twin compiled, and the 24/72/136-row DMA buffers
    (whole f32 tiles, fractional bf16 tiles) are the one structural
    difference (r4 on-chip gate, 2026-08-19; the log was lost in a
    runs/ wipe — verdicts mirrored in ops/stem_pallas_rejected.py).

    ``bf16_only`` (None | "xb" | "s0" | "s1" | "s0s1",
    precision="default" + f32 ``scratch_dtype`` only): flips the named
    buffer(s) to bf16 — the compile-crash bisect knob for
    benchmarks/stem_pallas_check.py. The r5 on-chip gate verdict
    (2026-08-20; regenerated evidence in
    runs_archive/r5/03_stem2new_gate.log): bf16 s0 (2650 us) and bf16 s1
    (2607) each compile AND beat the all-f32 kernel (2746); bf16 xb
    still crashes the compile helper even with the 32-row tile-aligned
    DMA — the bf16 HBM->VMEM user DMA itself is the crash vector.
    "s0s1" combines the two proven wins over an f32 DMA.

    ``input_mode`` ("dma" | "vmem"): "vmem" drops the revolving xb
    DMA buffers entirely — the input rides a per-image VMEM BlockSpec
    (Pallas pipelines the HBM fetch across grid steps) and band reads
    are direct ref slices. This is the only path to a bf16 INPUT
    (halving the dominant HBM read) given the bf16 user-DMA crash; it
    fits VMEM because the round-3 16 MB scoped budget was raised to 64
    (one 416px image block is 2.65 MB f32 / 1.33 MB bf16, double-
    buffered by the pipeline).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w_in, cin = x.shape
    c_mid = w0.shape[3]
    c_out = w1.shape[3]
    assert w0.shape[:3] == (3, 3, cin), w0.shape
    assert w1.shape[:3] == (3, 3, c_mid), w1.shape
    assert h % 32 == 0 and w_in % 4 == 0, (h, w_in)
    assert input_mode in ("dma", "vmem"), input_mode
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    store_dtype = (jnp.dtype(jnp.float32) if out_dtype == jnp.float16
                   else out_dtype)
    sdtype = jnp.dtype(scratch_dtype or jnp.float32)
    assert sdtype == jnp.float32 or precision == "default", \
        "bf16 scratches change numerics unless the dots are DEFAULT"
    assert bf16_only in (None, "xb", "s0", "s1", "s0s1"), bf16_only
    if bf16_only is not None:
        assert sdtype == jnp.float32 and precision == "default", \
            "bf16_only bisects the f32-scratch default-precision kernel"
    bf16 = jnp.dtype(jnp.bfloat16)
    xb_dt = bf16 if (sdtype == bf16 or bf16_only == "xb") else jnp.float32
    s0_dt = (bf16 if (sdtype == bf16 or bf16_only in ("s0", "s0s1"))
             else jnp.float32)
    s1_dt = (bf16 if (sdtype == bf16 or bf16_only in ("s1", "s0s1"))
             else jnp.float32)
    if input_mode == "vmem":
        # direct ref slices — no DMA, no tile-extent constraint
        dma_rows = 24
        pad_bot = 7
    else:
        dma_rows = 32 if xb_dt == bf16 else 24
        pad_bot = dma_rows - 16 - 1       # 7 (f32) or 15 (bf16)
    w_pad = _round_up(w_in + 2, 128)
    assert w_pad % 4 == 0
    q = w_pad // 4
    k0_pad = _round_up(9 * cin, 8)
    k1 = _round_up(9 * c_mid, 8)
    assert k1 == 9 * c_mid, "c_mid*9 must be sublane-aligned"
    n_bands0 = h // 16
    n_bands1 = h // 2 // 16
    h_mid = 16 * (n_bands1 - 1) + 32
    prec = _PRECISIONS[precision]
    # stage-0 pooled cols split by parity: even m < n_e, odd m < n_o
    n_e = (w_in // 2 + 1) // 2
    n_o = w_in // 2 - n_e

    # phase-grouped input: lane d*q + m = padded col 4m+d
    xpf = jnp.pad(x.astype(jnp.float32).transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (1, pad_bot), (1, 4 * q - w_in - 1)))
    xq = (xpf.reshape(n, cin, h + 1 + pad_bot, q, 4)
          .transpose(0, 1, 2, 4, 3)
          .reshape(n, cin, h + 1 + pad_bot, 4 * q).astype(xb_dt))
    a0 = jnp.pad(w0.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
        c_mid, 9 * cin), ((0, 0), (0, k0_pad - 9 * cin))).astype(s0_dt)
    a1 = w1.astype(jnp.float32).transpose(3, 2, 0, 1).reshape(
        c_out, k1).astype(s1_dt)

    if input_mode == "vmem":
        kernel = functools.partial(
            _stem_kernel_planar2_phase_vmem, q=q, cin=cin, c_mid=c_mid,
            c_out=c_out, k0_pad=k0_pad, k1=k1, n_bands0=n_bands0,
            n_bands1=n_bands1, precision=prec, n_e=n_e, n_o=n_o,
            s0_dt=s0_dt, s1_dt=s1_dt, in_rows=dma_rows)
        in0 = pl.BlockSpec((None, cin, h + 1 + pad_bot, 4 * q),
                           lambda i: (i, 0, 0, 0))
        scratch = [
            pltpu.VMEM((k0_pad, 16, 4 * q), s0_dt),           # s0
            pltpu.VMEM((c_mid, h_mid, 2 * q), jnp.float32),   # y1
            pltpu.VMEM((k1, 16, 2 * q), s1_dt),               # s1
        ]
        params = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    else:
        kernel = functools.partial(
            _stem_kernel_planar2_phase, q=q, cin=cin, c_mid=c_mid,
            c_out=c_out, k0_pad=k0_pad, k1=k1, n_bands0=n_bands0,
            n_bands1=n_bands1, precision=prec, n_e=n_e, n_o=n_o,
            xb_dt=xb_dt, s0_dt=s0_dt, s1_dt=s1_dt, dma_rows=dma_rows)
        in0 = pl.BlockSpec(memory_space=pl.ANY)           # xq: HBM + DMA
        scratch = [
            pltpu.VMEM((2, cin, dma_rows, 4 * q), xb_dt),     # xb
            pltpu.VMEM((k0_pad, 16, 4 * q), s0_dt),           # s0
            pltpu.VMEM((c_mid, h_mid, 2 * q), jnp.float32),   # y1
            pltpu.VMEM((k1, 16, 2 * q), s1_dt),               # s1
            pltpu.SemaphoreType.DMA((2,)),
        ]
        params = None
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            in0,
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, c_out, h // 4, q),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c_out, h // 4, q),
                                       store_dtype),
        scratch_shapes=scratch,
        **({"compiler_params": params} if params else {}),
        interpret=interpret,
    )(xq, a0, b0.astype(jnp.float32).reshape(c_mid, 1), a1,
      b1.astype(jnp.float32).reshape(c_out, 1))
    return (out[:, :, :, :w_in // 4].transpose(0, 2, 3, 1)
            .astype(out_dtype))



# ---------------------------------------------------------------------------
# Mosaic-REJECTED variants (K-packed stage 0, s2d stage 1, s2d8, the
# stage-4+6 deep pair) are quarantined in ops/stem_pallas_rejected.py —
# interpret-exact, cannot compile on this libtpu (see that module's
# docstring for the failure analyses). Re-exported here so the darknet
# variant dispatch and the tests keep one import surface.
# ---------------------------------------------------------------------------
from millieye_tpu.ops.stem_pallas_rejected import (  # noqa: E402,F401
    fused_stem2_packed, fused_stem2_s2d)
