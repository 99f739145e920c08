"""End-to-end fusion inference benchmark. Prints ONE JSON line.

Metric: frames/sec for the full single-frame fusion graph (tiny-YOLOv3
backbone -> YOLO decode -> on-device NMS -> score maps -> PSRoIAlign +
RoIAlign over 200 image + 32 radar proposals -> refinement/ensemble
heads) at 416x416, batch 1, BN folded — the reference's ``run_mp.py``
consumer path (SURVEY.md §3.3, the ``gpu_fps`` it prints per frame).

Baseline: the same workload in plain PyTorch on this host's CPU
(benchmarks/torch_baseline.py — the reference stack is torch; its exact
scripts need torchvision/CUDA/datasets that are absent). Measured once
and cached in bench_baseline.json so round-end runs are cheap.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

_BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baseline.json")


def _baseline_fps():
    if os.path.exists(_BASELINE_PATH):
        with open(_BASELINE_PATH) as f:
            return json.load(f)["torch_cpu_fps"]
    try:
        from benchmarks.torch_baseline import measure_torch_fps
        fps = measure_torch_fps()
    except Exception:
        return None
    with open(_BASELINE_PATH, "w") as f:
        json.dump({"torch_cpu_fps": fps,
                   "note": "fusion e2e forward, torch CPU, batch 1, 416px"},
                  f, indent=1)
    return fps


def _warm_one(serving, retry_ok=True):
    """Build + compile + one warmed call of a preset; (step, args).

    On a FAILED_PRECONDITION TPU backend error (stale/foreign persistent-
    cache entry or a flaky relay fetch — the BENCH_r02 failure mode),
    clears this backend's persistent-cache dir, disables the cache, and
    retries once from scratch.
    """
    import jax
    from __graft_entry__ import bench_entry as entry

    try:
        fn, args = entry(serving=serving)
        step = jax.jit(fn)
        # Compile + warm-up barrier: through the axon relay,
        # block_until_ready can return EARLY while the remote compile is
        # still pending — an actual device->host fetch is the only
        # reliable completion barrier, so every window ends with one.
        np.asarray(step(*args)[1])
        return step, args
    except jax.errors.JaxRuntimeError as e:
        if not (retry_ok and "FAILED_PRECONDITION" in str(e)):
            raise
        import shutil
        cache_dir = jax.config.jax_compilation_cache_dir
        if cache_dir:
            shutil.rmtree(cache_dir, ignore_errors=True)
        jax.config.update("jax_compilation_cache_dir", None)
        jax.clear_caches()
        return _warm_one(serving, retry_ok=False)


def _warm(presets=("pallas_max_s01", "pallas_max", "pallas_stem2", "f32")):
    """First preset that builds+compiles wins: the flagship serving
    config normally, the plain-f32 parity config as a driver-proof
    fallback (a Mosaic/libtpu regression must degrade the number, not
    zero it)."""
    last = None
    for serving in presets:
        try:
            step, args = _warm_one(serving)
            return step, args, serving
        except Exception as e:                  # noqa: BLE001
            last = e
            import sys
            print(f"# preset {serving} failed: {type(e).__name__}: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)
    raise last


def main(presets=None):
    import __graft_entry__  # noqa: F401  bounded relay guard BEFORE any
    import jax              # backend touch (a dead relay hangs jax)
    if (jax.default_backend() == "cpu"
            and os.environ.get("MILLIEYE_ALLOW_CPU") != "1"):
        # __graft_entry__'s import guard falls back to CPU when the
        # relay dies; a CPU fps must never be reported as the chip
        # number (set MILLIEYE_ALLOW_CPU=1 for deliberate dev runs)
        import sys
        print("# backend is cpu — refusing to report a chip benchmark",
              file=sys.stderr, flush=True)
        raise SystemExit(1)
    step, args, serving = (_warm((presets,)) if isinstance(presets, str)
                           else _warm() if presets is None
                           else _warm(presets))
    # MEDIAN of several measurement windows: the tunnel adds bursty host
    # jitter that a single window conflates with device time, and the
    # round-3 record showed best-of-3 wobbling +/-10% across same-code
    # sessions — the median over more windows is the defensible number,
    # with the spread reported alongside.
    iters, windows = 100, 7
    per = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(*args)
        np.asarray(out[1])                      # fetch barrier (tiny mask)
        per.append((time.perf_counter() - t0) / iters)
    per.sort()
    med = per[len(per) // 2]
    fps = 1.0 / med
    fps_best = 1.0 / per[0]
    spread_pct = 100.0 * (per[-1] - per[0]) / med

    # scan-amortized per-frame DEVICE latency (stable across sessions —
    # the wall fps above is dispatch-floored through the relay).
    # MILLIEYE_BENCH_SCAN=0 skips it (cold scan compiles cost minutes).
    lat_us = None
    if os.environ.get("MILLIEYE_BENCH_SCAN", "1") != "0":
        try:
            import sys
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from benchmarks.backbone_profile import bench_scanned
            images, rest = args[0], args[1:]
            lat = bench_scanned(lambda im: step(im, *rest)[0], images,
                                k=16, windows=3)
            lat_us = round(lat * 1e6, 1)
        except Exception as e:                  # noqa: BLE001
            import sys
            print(f"# scan latency skipped: {type(e).__name__}: "
                  f"{str(e)[:160]}", file=sys.stderr, flush=True)

    base = _baseline_fps()
    vs = fps / base if base else 0.0
    line = {
        "metric": "fusion_e2e_fps_b1_416",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
        "config": serving,
        "wall_fps_best": round(fps_best, 2),
        "wall_spread_pct": round(spread_pct, 1),
        "windows": windows,
    }
    if lat_us is not None:
        line["device_latency_us_b1"] = lat_us
    print(json.dumps(line))
    _record_variance(line)


def _record_variance(line):
    """Mirror the run's variance stats into BENCH_DETAILS.json
    (bench_variance block) so the official record carries its own error
    bars."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")
        merged = {}
        if os.path.exists(path):
            with open(path) as f:
                merged = json.load(f)
        merged["bench_variance"] = {
            "config": line["config"],
            "wall_fps_median": line["value"],
            "wall_fps_best": line["wall_fps_best"],
            "wall_spread_pct": line["wall_spread_pct"],
            "windows": line["windows"],
            "device_latency_us_b1": line.get("device_latency_us_b1"),
        }
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)
    except Exception:                           # noqa: BLE001
        pass


def _stale_line(reason):
    """Relay-outage fallback (VERDICT r4 #8): when no live chip number
    can be produced, report the last WARM on-chip median recorded by
    `_record_variance` (BENCH_DETAILS.json:bench_variance) with an
    explicit ``"stale": true`` flag instead of rc=1 silence — the
    driver record stays parseable and honest when the code didn't
    regress but the relay did. Returns 0 if a stale line was printed,
    1 if there is no recorded warm number either."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_DETAILS.json")
        with open(path) as f:
            bv = json.load(f)["bench_variance"]
        fps = float(bv["wall_fps_median"])
        base = _baseline_fps()
        line = {
            "metric": "fusion_e2e_fps_b1_416",
            "value": round(fps, 2),
            "unit": "frames/s",
            "vs_baseline": round(fps / base, 2) if base else 0.0,
            "config": bv.get("config"),
            "stale": True,
            "stale_reason": reason,
            "wall_spread_pct": bv.get("wall_spread_pct"),
            "device_latency_us_b1": bv.get("device_latency_us_b1"),
        }
        print(json.dumps(line))
        return 0
    except Exception as e:                      # noqa: BLE001
        import sys
        print(f"# no stale fallback available: {e}", file=sys.stderr,
              flush=True)
        return 1


def _ladder():
    """Driver-proof preset ladder: each preset attempt runs in a BOUNDED
    subprocess. The in-process `_warm` ladder already catches compile
    ERRORS, but a pathological Mosaic compile can HANG the remote
    compile terminal (observed round 3) — a hang in preset 1 must cost
    a timeout, not the whole bench. Warm-cache runs finish in seconds,
    so the bounds only bite on cold/broken presets."""
    import subprocess
    import sys

    # Fast liveness probe: when the axon relay is down, backend init
    # HANGS (observed round 3) — without this, every rung burns its
    # full timeout and the bench takes 2h to report a dead tunnel. The
    # probe requires a NON-CPU backend (millieye_tpu/tunnel.py), so a
    # CPU-mode invocation cannot poison the stamp cache or fake a
    # chip number.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from millieye_tpu.tunnel import tunnel_alive
    if not tunnel_alive(timeout=600):
        print("# device probe failed: backend init hung, errored, or "
              "resolved to CPU (relay down?) — reporting last warm "
              "number with stale=true", file=sys.stderr, flush=True)
        return _stale_line("device probe failed (relay down?)")

    # Each rung also de-risks the NEWEST Mosaic surface (trace-time env
    # knobs, ops/nms.py): the second-to-last rung is the exact r3d
    # chip-proven config (pallas_stem2 + whole-matrix NMS kernel), the
    # last is fully Mosaic-free (XLA fixpoint NMS, plain XLA convs).
    # benchmarks/r*_campaign.py overwrites the leading rungs with the
    # MEASURED-fastest preset order via runs/bench_ladder.json.
    # Default order = the r5 MEASURED ladder: pallas_max_s01 first
    # (5315.8 fps b32 = 18.7% MFU — k128 + bf16 s0/s1 patch scratches,
    # accuracy row equal to k128's to 4 decimals on both splits), then
    # the chip-proven fallbacks.
    rungs = [("pallas_max_s01", {}, 2400),
             ("pallas_max_k128", {}, 2000),
             ("pallas_max", {"MILLIEYE_NMS_BLOCKED": "0"}, 1500),
             ("pallas_stem2", {"MILLIEYE_NMS_BLOCKED": "0",
                               "MILLIEYE_BENCH_SCAN": "0"}, 1500),
             ("f32", {"MILLIEYE_NMS_PALLAS": "0",
                      "MILLIEYE_BENCH_SCAN": "0"}, 2400)]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "runs", "bench_ladder.json")
    if os.path.exists(path):
        try:
            with open(path) as f:
                rungs = [(r["preset"], dict(r.get("env", {})),
                          int(r.get("timeout", 1500)))
                         for r in json.load(f)["rungs"]]
        except Exception as e:                  # noqa: BLE001
            print(f"# ignoring malformed {path}: {e}", file=sys.stderr)
    for serving, extra, tmo in rungs:
        env = dict(os.environ, MILLIEYE_BENCH_PRESET=serving, **extra)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                               env=env, timeout=tmo,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# preset {serving} timed out after {tmo}s",
                  file=sys.stderr, flush=True)
            continue
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("{")]
        if r.returncode == 0 and line:
            print(line[-1])
            return 0
        print(f"# preset {serving} failed rc={r.returncode}: "
              f"{(r.stderr or '')[-300:]}", file=sys.stderr, flush=True)
    return _stale_line("all ladder rungs failed or timed out")


if __name__ == "__main__":
    one = os.environ.get("MILLIEYE_BENCH_PRESET")
    if one:
        main(one)
    else:
        raise SystemExit(_ladder())
