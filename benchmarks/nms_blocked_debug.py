"""Localize the blocked-NMS on-chip miscompile (runs on the real chip).

Compares, on the nms_tpu_check seed-0 inputs:
  ref       sequential golden (host loop over XLA nms_keep_mask)
  emul      the blocked ALGORITHM spelled in plain XLA (no Pallas)
  pallas    the Pallas blocked kernel
  pallas1b  the Pallas blocked kernel with k=128 (single block: fixpoint
            only, no cross-block hit state)

If emul == ref but pallas != ref, the algorithm is sound and Mosaic
miscompiles the kernel; the mismatch block indices say which block's
state went wrong (block 0 = the fixpoint itself, later = hitS flow).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emul_blocked(boxes, valid, t, bk=128):
    """Plain-jnp re-spelling of _nms_kernel_blocked for ONE image."""
    import jax
    import jax.numpy as jnp

    k = boxes.shape[0]
    nb = k // bk
    x1t, y1t, x2t, y2t = (boxes[:, 0][None], boxes[:, 1][None],
                          boxes[:, 2][None], boxes[:, 3][None])
    areat = (x2t - x1t) * (y2t - y1t)
    hitS = jnp.zeros((k, 1), jnp.float32)
    keep_out = []
    for j in range(nb):
        r0 = j * bk
        blk = boxes[r0:r0 + bk]
        x1, y1, x2, y2 = (blk[:, 0:1], blk[:, 1:2],
                          blk[:, 2:3], blk[:, 3:4])
        area = (x2 - x1) * (y2 - y1)
        inter = (jnp.maximum(jnp.minimum(x2, x2t) - jnp.maximum(x1, x1t),
                             0.0)
                 * jnp.maximum(jnp.minimum(y2, y2t) - jnp.maximum(y1, y1t),
                               0.0))
        iou = inter / (area + areat - inter + 1e-16)
        over = jnp.where(iou > t, 1.0, 0.0)              # [bk, k]
        o_blk = over[:, r0:r0 + bk] * np.tril(np.ones((bk, bk)), -1)
        alive = (valid[r0:r0 + bk, None].astype(jnp.float32)
                 * jnp.where(hitS[r0:r0 + bk] > 0, 0.0, 1.0))

        def suppress(keep):
            hit = o_blk @ keep
            return alive * jnp.where(hit > 0, 0.0, 1.0)

        keep = suppress(alive)
        prev = alive
        it = 0
        while it < bk and bool(jnp.max(jnp.abs(keep - prev)) > 0):
            prev, keep, it = keep, suppress(keep), it + 1
        keep_out.append(keep)
        hitS = hitS + over.T @ keep
    return (jnp.concatenate(keep_out)[:, 0] > 0)


def main():
    import jax
    import jax.numpy as jnp
    import __graft_entry__  # noqa: F401  (compile cache)
    from millieye_tpu.ops.nms import nms_keep_mask
    from millieye_tpu.ops.nms_pallas import nms_keep_mask_pallas_blocked

    rng = np.random.default_rng(0)
    b, k = 2, 512
    xy = rng.uniform(0, 400, size=(b, k, 2))
    wh = rng.uniform(5, 120, size=(b, k, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(b, k)) > 0.1)
    t = 0.3

    ref = np.stack([np.asarray(nms_keep_mask(boxes[i], valid[i], t))
                    for i in range(b)])
    emul = np.stack([np.asarray(emul_blocked(boxes[i], valid[i], t))
                     for i in range(b)])
    print("emul == ref:", bool((emul == ref).all()), flush=True)

    blk = np.asarray(nms_keep_mask_pallas_blocked(boxes, valid, t))
    same = blk == ref
    print("pallas == ref:", bool(same.all()), flush=True)
    if not same.all():
        for i in range(b):
            idx = np.nonzero(~same[i])[0]
            print(f"img {i}: {len(idx)} mismatches at rows {idx.tolist()} "
                  f"(blocks {sorted(set(idx // 128))})", flush=True)

    # single-block case: k=128 exercises ONLY the fixpoint
    b1, k1 = boxes[:, :128], valid[:, :128]
    ref1 = np.stack([np.asarray(nms_keep_mask(b1[i], k1[i], t))
                     for i in range(b)])
    blk1 = np.asarray(nms_keep_mask_pallas_blocked(b1, k1, t))
    print("pallas k=128 (fixpoint only) == ref:",
          bool((blk1 == ref1).all()), flush=True)


if __name__ == "__main__":
    main()
