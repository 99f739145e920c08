"""Per-op backbone latency profile + stem-variant shootout on the real chip.

Methodology note (this box): ``jax.block_until_ready`` through the axon
relay can return EARLY while the remote compile is still pending — a
device->host fetch is the only reliable completion barrier. Every timing
here forces a scalar checksum fetch after warm-up and after each window.

Benches, at batch 1 and 32, f32 and bf16:
  * each conv/pool stage of tiny-YOLOv3 as a standalone program
    (direct attribution: which ops own the 0.72 ms b1 backbone);
  * the full folded backbone graph;
  * space-to-depth variants of the early conv+pool stages:
      - "offset4": maxpool(conv3x3_s1(x)) == max of 4 stride-2 convs
        (same MACs, no full-res intermediate);
      - "s2d": phase-decomposed conv3x3 on the 4x-channel s2d tensor +
        phase-max (4x MACs, 4x input channels for MXU lane packing).
Writes JSON to /tmp/backbone_profile.json.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def barrier(out):
    """Reliable completion barrier: fetch a scalar that depends on out."""
    leaf = jax.tree.leaves(out)[-1]
    return float(jnp.sum(leaf.astype(jnp.float32)).block_until_ready()
                 if leaf.ndim == 0 else jnp.max(leaf).astype(jnp.float32))


def bench(step, args, iters=30, windows=3):
    out = step(*args)
    barrier(out)                       # forces compile + first execution
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        barrier(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def bench_scanned(op, x, k=50, windows=3):
    """Device time per op execution, amortizing the ~1 ms relay
    round-trip floor: run the op ``k`` times inside ONE program, chained
    by a negligible data dependency so XLA cannot collapse the loop."""

    def body(carry, _):
        y = op(carry)
        # scalar dependency: carry changes by 0 but depends on y
        return carry + jnp.zeros((), carry.dtype) * jnp.max(y).astype(
            carry.dtype), jnp.max(y)

    @jax.jit
    def many(x0):
        _, ys = lax.scan(body, x0, None, length=k)
        return ys

    @jax.jit
    def once(x0):
        _, ys = lax.scan(body, x0, None, length=1)
        return ys

    t_many = bench(many, (x,), iters=5, windows=windows)
    t_once = bench(once, (x,), iters=5, windows=windows)
    return max((t_many - t_once) / (k - 1), 0.0)


def leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def conv_bias(x, w, b, stride=1, pad=None):
    k = w.shape[0]
    pad = (k - 1) // 2 if pad is None else pad
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def maxpool2(x):
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1),
                             (1, 2, 2, 1), [(0, 0)] * 4)


# ---------------------------------------------------------------- variants
def stage_plain(x, w, b):
    """conv3x3 s1 + leaky + maxpool2 (the reference stage)."""
    return maxpool2(leaky(conv_bias(x, w, b)))


def stage_offset4(x, w, b):
    """Identical result: max over the 4 stride-2 offset convs, activation
    moved after the max (leaky is monotone)."""
    pads = [((1, 0), (1, 0)), ((1, 0), (0, 1)), ((0, 1), (1, 0)),
            ((0, 1), (0, 1))]
    ys = [lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), list(p),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) for p in pads]
    y = jnp.maximum(jnp.maximum(ys[0], ys[1]), jnp.maximum(ys[2], ys[3]))
    return leaky(y + b.astype(x.dtype))


def s2d(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C], phase-major channel layout."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)


@functools.lru_cache(maxsize=None)
def _s2d_weight_spec(k, cin, cout):
    """Index maps for building the phase-decomposed 3x3 kernel."""
    assert k == 3
    spec = []
    for ph_out in range(4):           # output phase (a, b)
        a, b = ph_out // 2, ph_out % 2
        for u in range(3):
            for v in range(3):
                ry, rx = a + u - 1, b + v - 1       # input pixel rel. block
                by, py = divmod(ry + 2, 2)
                bx, px = divmod(rx + 2, 2)
                by, bx = by - 1, bx - 1             # block offset in -1..1
                spec.append((ph_out, u, v, by + 1, bx + 1, py * 2 + px))
    return spec


def make_s2d_im2col_stage(w, b):
    """Same math as make_s2d_stage, but the 3x3 block window is
    materialized as patches so the matmul contraction is 36*Cin (full MXU
    lanes even for the 3-channel stem), at the cost of writing the patch
    tensor to HBM. Wins when the stage is lane-bound, loses when the
    patch traffic exceeds the MXU saving."""
    cout = w.shape[3]
    wp = s2d_conv_weight_np(w)                   # [3, 3, 4C, 4D]
    wm = jnp.asarray(wp.reshape(9 * wp.shape[2], wp.shape[3]))

    def fn(z):                                  # z: [N, H/2, W/2, 4C]
        n, h, ww, c4 = z.shape
        zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
        patches = jnp.concatenate(
            [zp[:, dy:dy + h, dx:dx + ww] for dy in range(3)
             for dx in range(3)], -1)           # [N, H/2, W/2, 36C]
        y = jnp.einsum("nhwk,kd->nhwd", patches, wm.astype(z.dtype))
        y = y.reshape(n, h, ww, 4, cout).max(axis=3)
        return leaky(y + b.astype(y.dtype))

    return fn


def s2d_conv_weight_np(w):
    k, _, cin, cout = w.shape
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    w_np = np.asarray(w, np.float32)
    for (ph_out, u, v, wy, wx, ph_in) in _s2d_weight_spec(k, cin, cout):
        wp[wy, wx, ph_in * cin:(ph_in + 1) * cin,
           ph_out * cout:(ph_out + 1) * cout] += w_np[u, v]
    return wp


def make_s2d_stage(w, b):
    """conv3x3+pool stage -> (fn over s2d input, s2d weights).

    Builds W' [3, 3, 4*Cin, 4*Cout] over the half-res block grid such that
    conv(W') computes all 4 output phases, then max-reduces phases.
    """
    k, cin, cout = w.shape[0], w.shape[2], w.shape[3]
    wp = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    w_np = np.asarray(w, np.float32)
    for (ph_out, u, v, wy, wx, ph_in) in _s2d_weight_spec(k, cin, cout):
        wp[wy, wx, ph_in * cin:(ph_in + 1) * cin,
           ph_out * cout:(ph_out + 1) * cout] += w_np[u, v]
    wp = jnp.asarray(wp)

    def fn(z):                        # z: [N, H/2, W/2, 4C]
        y = lax.conv_general_dilated(
            z, wp.astype(z.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        n, hh, ww, _ = y.shape
        y = y.reshape(n, hh, ww, 4, cout).max(axis=3)
        return leaky(y + b.astype(y.dtype))

    return fn


# ----------------------------------------------------------------- profile
STAGES = [  # (H_in, C_in, C_out, kernel, pooled) for tiny-YOLOv3 @416
    (416, 3, 16, 3, True),
    (208, 16, 32, 3, True),
    (104, 32, 64, 3, True),
    (52, 64, 128, 3, True),
    (26, 128, 256, 3, False),
    (13, 256, 512, 3, False),
    (13, 512, 1024, 3, False),
    (13, 1024, 256, 1, False),
    (13, 256, 512, 3, False),
    (26, 384, 256, 3, False),
]


def profile(batches=(1, 32), dtypes=("float32", "bfloat16")):
    rng = np.random.default_rng(0)
    results = {}
    for bsz in batches:
        for dt in dtypes:
            dd = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            key = f"b{bsz}_{dt}"
            res = {}
            for si, (hin, cin, cout, k, pooled) in enumerate(STAGES):
                x = jnp.asarray(
                    rng.uniform(-1, 1, (bsz, hin, hin, cin)), dd)
                w = jnp.asarray(
                    0.05 * rng.standard_normal((k, k, cin, cout)),
                    jnp.float32)
                b = jnp.asarray(0.01 * rng.standard_normal(cout),
                                jnp.float32)
                name = f"s{si}_{hin}x{cin}->{cout}"
                if pooled:
                    t = bench_scanned(lambda xx, _w=w, _b=b:
                                      stage_plain(xx, _w, _b), x)
                    res[name] = {"plain_us": round(t * 1e6, 1)}
                    t = bench_scanned(lambda xx, _w=w, _b=b:
                                      stage_offset4(xx, _w, _b), x)
                    res[name]["offset4_us"] = round(t * 1e6, 1)
                    z = s2d(x)
                    fn = make_s2d_stage(w, b)
                    t = bench_scanned(fn, z)
                    res[name]["s2d_us"] = round(t * 1e6, 1)
                else:
                    t = bench_scanned(
                        lambda xx, _w=w, _b=b:
                        leaky(conv_bias(xx, _w, _b)), x)
                    res[name] = {"plain_us": round(t * 1e6, 1)}
                print(key, name, res[name], flush=True)
            results[key] = res
    return results


def full_graph(batches=(1, 32), dtypes=("float32", "bfloat16"), img=416):
    from millieye_tpu.models import Darknet, tiny_yolov3_defs
    net = Darknet(tiny_yolov3_defs(num_classes=12, img_size=img),
                  img_size=img)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        params, state = net.init(jax.random.PRNGKey(0))
        fp, fs = net.fold_batchnorm(params, state)
        fp16, fs16 = net.fold_batchnorm(params, state, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    out = {}
    for bsz in batches:
        x = jnp.asarray(rng.uniform(size=(bsz, img, img, 3)), jnp.float32)
        for dt in dtypes:
            p, s = (fp16, fs16) if dt == "bfloat16" else (fp, fs)
            cd = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
            t = bench(jax.jit(lambda xx, _p=p, _s=s, _c=cd:
                              net.apply(_p, _s, xx, compute_dtype=_c)[
                                  "detections"]), (x,))
            out[f"full_b{bsz}_{dt}_us"] = round(t * 1e6, 1)
            # scan-amortized: pure device time without the relay floor
            td = bench_scanned(lambda xx, _p=p, _s=s, _c=cd:
                               net.apply(_p, _s, xx, compute_dtype=_c)[
                                   "detections"], x, k=20)
            out[f"full_b{bsz}_{dt}_device_us"] = round(td * 1e6, 1)
            print(f"full_b{bsz}_{dt}", out[f"full_b{bsz}_{dt}_us"],
                  "device", out[f"full_b{bsz}_{dt}_device_us"], flush=True)
    return out


def verify_variants():
    """Bit-level equivalence of the stem variants (run on CPU)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 16)), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((3, 3, 16, 24)), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(24), jnp.float32)
    ref = stage_plain(x, w, b)
    v1 = stage_offset4(x, w, b)
    v2 = make_s2d_stage(w, b)(s2d(x))
    v3 = make_s2d_im2col_stage(w, b)(s2d(x))
    assert jnp.allclose(ref, v1, atol=1e-5), float(jnp.abs(ref - v1).max())
    assert jnp.allclose(ref, v2, atol=1e-5), float(jnp.abs(ref - v2).max())
    assert jnp.allclose(ref, v3, atol=1e-5), float(jnp.abs(ref - v3).max())
    return True


if __name__ == "__main__":
    res = {"ops": profile(), "full": full_graph()}
    with open("/tmp/backbone_profile.json", "w") as f:
        json.dump(res, f, indent=1)
    print("PROFILE DONE")
