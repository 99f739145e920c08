"""Pallas TPU kernel: greedy NMS keep-mask in one on-chip program.

The XLA formulation (ops/nms.py) runs the fixpoint as a lax.while_loop of
[K, K] vector ops — correct and fast, but every iteration is a separate
XLA loop step over HBM-resident state. Here the whole suppression runs as
ONE Pallas program: boxes land in VMEM, the [K, K] IoU matrix is computed
once on the VPU and stays on-chip, and the fixpoint loop iterates over
VMEM state with zero dispatch overhead. K=512 -> 1 MB of VMEM for the
matrix, well within the ~16 MB budget.

Exactness: same fixpoint operator as ops/nms.py:nms_keep_mask (which is
itself tested against the sequential greedy reference), so all three
implementations agree bit-for-bit on the keep set.

Used automatically by ``batched_nms(..., use_pallas=True)`` on TPU
backends; the CPU/test path keeps the XLA fixpoint. Grid = batch dim, one
program per image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(thresh_ref, boxes_ref, tboxes_ref, valid_ref, keep_ref):
    """One image. boxes [K, 4] score-sorted (class-shifted for class-aware
    NMS); tboxes [4, K] the transpose (precomputed on host side of the
    graph — cheaper than transposing in-kernel); valid/keep [K, 1] int32
    masks."""
    t = thresh_ref[0]
    boxes = boxes_ref[0]                           # [K, 4]
    tb = tboxes_ref[0]                             # [4, K]
    k = boxes.shape[0]

    x1, y1, x2, y2 = (boxes[:, 0:1], boxes[:, 1:2],
                      boxes[:, 2:3], boxes[:, 3:4])
    x1t, y1t, x2t, y2t = tb[0:1, :], tb[1:2, :], tb[2:3, :], tb[3:4, :]

    ix1 = jnp.maximum(x1, x1t)                     # [K, K]
    iy1 = jnp.maximum(y1, y1t)
    ix2 = jnp.minimum(x2, x2t)
    iy2 = jnp.minimum(y2, y2t)
    inter = (jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0))
    area = (x2 - x1) * (y2 - y1)                   # [K, 1]
    areat = (x2t - x1t) * (y2t - y1t)              # [1, K]
    iou = inter / (area + areat - inter + 1e-16)

    row = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # int32 masks throughout: Mosaic cannot carry vector<i1> through
    # scf.while (captured bool vectors become loop carries)
    overlap = jnp.where((iou > t) & (col < row), 1, 0).astype(jnp.int32)

    valid = valid_ref[0, :, 0]                     # [K] int32

    def suppress(keep):
        hit = jnp.max(overlap * keep[None, :], axis=1)
        return valid * (1 - hit)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < k,
                               jnp.max(jnp.abs(keep - prev)) > 0)

    def body(state):
        keep, _, it = state
        return suppress(keep), keep, it + 1

    init = suppress(valid)
    keep, _, _ = lax.while_loop(cond, body, (init, valid, jnp.int32(0)))
    keep_ref[0, :, 0] = keep


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_keep_mask_pallas(boxes, valid, iou_thresh, interpret=False):
    """boxes [B, K, 4] score-sorted (+class offsets); valid [B, K] bool.
    Returns keep [B, K] bool."""
    b, k, _ = boxes.shape
    thresh = jnp.full((1,), iou_thresh, jnp.float32)
    tboxes = boxes.transpose(0, 2, 1)
    keep = pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, 1), jnp.int32),
        interpret=interpret,
    )(thresh,
      boxes.astype(jnp.float32),
      tboxes.astype(jnp.float32),
      valid.astype(jnp.int32)[..., None])
    return keep[..., 0] != 0


# ---------------------------------------------------------------------------
# Block-sequential greedy NMS ("blocked"): the fixpoint kernel's VPU fix.
#
# The one-shot kernel above iterates a [K, K] operator until stable —
# chain-depth iterations over the FULL matrix, each a K*K multiply +
# lane reduction, and the keep vector flips orientation (lane<->sublane)
# every iteration. Greedy suppression only flows from higher- to lower-
# ranked rows, so processing 128-row blocks IN RANK ORDER is exact:
#
#   for block j (static unroll):
#     iou_j   = iou(block rows, ALL K cols)                [Bk, K]
#     settle the block's keep bits by fixpoint on a [Bk, Bk] block-local
#       IoU (hit = O @ keep as an MXU [Bk,Bk]x[Bk,1] dot — the state
#       stays a sublane vector, no per-iteration transpose)
#     hitS += iou_j^T @ keep  (full-width MXU dot; settled rows are
#       never re-read, so their spurious hits are harmless)
#
# Work drops from chain_depth * K^2 to ~K^2 + chain_depth * Bk^2 per
# image, and every iteration touches a 16x smaller matrix. Bit-identical
# keep set: same IoU arithmetic, same fixpoint operator, same ordering
# (tests/test_nms.py pins all implementations to the sequential golden).
# ---------------------------------------------------------------------------


def _nms_kernel_blocked(thresh_ref, boxes_ref, tboxes_ref, valid_ref,
                        keep_ref, *, bk):
    """One image, rank-ordered 128-row blocks (see module comment).
    boxes [K, 4] score-sorted; tboxes [4, K]; valid/keep [K, 1] int32.

    Every vector pattern here is one the whole-matrix kernel above has
    already proven on-chip: 1-D int32 lane-vector while_loop carries,
    ``max(o * keep[None, :], axis=1)`` suppression reduces, [Bk, 1] ->
    [Bk, Bk] lane broadcasts of offset-free values, and offset REF
    loads/stores. Two on-chip traps shaped this spelling (interpret
    mode was exact every time, so both only show on the real chip):

    * Mosaic rejects broadcasting an OFFSET [1, w] SLICE of a loaded
      value up to [Bk, w] ("vector.broadcast 1x384 -> 128x384 invalid
      input layout") — so per-block row vectors come from fresh ref
      loads (offset handled by the load, value layout canonical);
    * materialising those rows via ones[Bk,1] x row[1,Bk] MXU dots
      instead silently bf16-rounds the f32 coordinates (in-kernel dots
      run at DEFAULT precision) and flipped ~1% of the keep bits.

    The block-pair overlap matrices cost nb^2/2 extra [Bk, Bk] IoU
    evaluations ~= the one-shot kernel's single [K, K] pass, and ALL
    running state lives in 1-D int32 lane vectors.
    """
    t = thresh_ref[0]
    k = boxes_ref.shape[1]
    nb = k // bk

    rowB = lax.broadcasted_iota(jnp.int32, (bk, bk), 0)
    colB = lax.broadcasted_iota(jnp.int32, (bk, bk), 1)

    # column-side operands of every block: [1, Bk] rows straight off a
    # REF load — offset-free values, so the [1, Bk] -> [Bk, Bk]
    # broadcast inside over_vs is exactly the whole-matrix kernel's
    # proven pattern. (Materialising these via ones[Bk,1] x row[1,Bk]
    # MXU dots instead silently bf16-rounds the f32 coordinates: TPU
    # dots run at DEFAULT precision in-kernel, which flipped ~1% of
    # keep bits on-chip while interpret mode stayed exact.)
    cols = []
    for jp in range(nb):
        tbj = tboxes_ref[0, :, jp * bk:(jp + 1) * bk]    # [4, Bk]
        x1B, y1B, x2B, y2B = (tbj[0:1], tbj[1:2], tbj[2:3], tbj[3:4])
        cols.append((x1B, y1B, x2B, y2B, (x2B - x1B) * (y2B - y1B)))

    keeps = []
    for j in range(nb):
        r0 = j * bk
        blk = boxes_ref[0, r0:r0 + bk]             # [Bk, 4] ref load
        x1, y1, x2, y2 = (blk[:, 0:1], blk[:, 1:2],
                          blk[:, 2:3], blk[:, 3:4])
        area = (x2 - x1) * (y2 - y1)               # [Bk, 1]

        def over_vs(jp):
            """[Bk, Bk] int32: IoU(block-j row, block-jp col) > t.
            Same arithmetic on the same values as the golden, so the
            keep set stays bit-equal."""
            x1B, y1B, x2B, y2B, areaB = cols[jp]
            inter = (jnp.maximum(jnp.minimum(x2, x2B)
                                 - jnp.maximum(x1, x1B), 0.0)
                     * jnp.maximum(jnp.minimum(y2, y2B)
                                   - jnp.maximum(y1, y1B), 0.0))
            iou = inter / (area + areaB - inter + 1e-16)
            return jnp.where(iou > t, 1, 0).astype(jnp.int32)

        # suppression from already-settled blocks: one [Bk, Bk] pass
        # per earlier block against its final keep vector
        hit = jnp.zeros((bk,), jnp.int32)
        for jp in range(j):
            hit = jnp.maximum(
                hit, jnp.max(over_vs(jp) * keeps[jp][None, :], axis=1))
        valid_j = valid_ref[0, r0:r0 + bk, 0]      # [Bk] int32
        alive = valid_j * (1 - hit)

        o_blk = over_vs(j) * jnp.where(colB < rowB, 1, 0)

        def suppress(keep):
            h = jnp.max(o_blk * keep[None, :], axis=1)
            return alive * (1 - h)

        def cond(state):
            keep, prev, it = state
            return jnp.logical_and(it < bk,
                                   jnp.max(jnp.abs(keep - prev)) > 0)

        def body(state):
            keep, _, it = state
            return suppress(keep), keep, it + 1

        init = suppress(alive)
        keep_blk, _, _ = jax.lax.while_loop(cond, body,
                                            (init, alive, jnp.int32(0)))
        keeps.append(keep_blk)
        keep_ref[0, r0:r0 + bk, 0] = keep_blk


@functools.partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def nms_keep_mask_pallas_blocked(boxes, valid, iou_thresh, interpret=False):
    """Block-sequential spelling of ``nms_keep_mask_pallas`` — identical
    contract and keep set. Requires K % 128 == 0 (serving K=512)."""
    b, k, _ = boxes.shape
    bk = 128
    assert k % bk == 0, k
    thresh = jnp.full((1,), iou_thresh, jnp.float32)
    tboxes = boxes.transpose(0, 2, 1)
    keep = pl.pallas_call(
        functools.partial(_nms_kernel_blocked, bk=bk),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, 1), jnp.int32),
        interpret=interpret,
    )(thresh,
      boxes.astype(jnp.float32),
      tboxes.astype(jnp.float32),
      valid.astype(jnp.int32)[..., None])
    return keep[..., 0] != 0
