"""Round-4 SECOND campaign: rebuild the accuracy record on the retrained
checkpoint, measure the new serving candidates, leave the bench warm.

Why a second campaign: the round-4 ablations proved the serving-accuracy
table is CHECKPOINT-relative (CLAUDE.md round-4 notes) — the r3-regen
model scored ~0.86 H where the lost r2 original scored ~0.94, with every
kernel exonerated — and the stage-3 recipe was undertrained (the
per-epoch curve never plateaued at 24 epochs). After synthetic_e2e
retrains stage 3 (72 epochs + held-out-seed best-epoch selection), this
campaign rebuilds EVERY serving-accuracy row against the ONE new
checkpoint, so the table is internally comparable again.

Sequence (each step a bounded subprocess, runs/r4b_campaign/NN_*.log):

    1. probe + health     refuse to record from a degraded relay session
    2. quantized_eval     full compile-able variant set (the Mosaic-
                          rejected stem variants would crash the sweep)
    3. eval_variance      seed-noise error bar on the new checkpoint
    4. details            pallas_max_k256 (b1/b32 fps of the halved-NMS
                          flagship candidate)
    5. sufficiency        top-k 256 evidence on the NEW checkpoint
    6. stream_bench       tracker-capacity row with the 2x host tracker
    7. bench_ladder       measured-fastest b1 order (incl. k256 / lat)
    8. warm entry + bench.py twice (LAST: leaves the driver's round-end
       bench warm; no traced-source edits after this)

Usage: nohup python -u benchmarks/r4b_campaign.py > runs/r4b.out 2>&1 &
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "runs", "r4b_campaign")
SUMMARY = os.path.join(OUT, "summary.json")

sys.path.insert(0, ROOT)
from millieye_tpu.tunnel import PROBE  # noqa: E402

# every quantized_eval variant that can compile on this chip (the
# packed/s2d/s2d8/deep/pair2 stem rows are Mosaic-rejected and would
# kill the sweep mid-run)
EVAL_VARIANTS = ",".join([
    "f32", "bf16_f32stem", "bf16_f16stem", "bf16_heads",
    "pallas_stem", "pallas_stem2", "pallas_phase",
    "pallas_max", "pallas_max_k256", "pallas_lat",
    "s2d", "s2d_int8", "s2d_int8_acts", "s2d_int8_acts_fstem", "bf16_s2d",
])


def run(name, argv, timeout, env=None, idx=[0]):
    idx[0] += 1
    log = os.path.join(OUT, f"{idx[0]:02d}_{name}.log")
    e = dict(os.environ, **(env or {}))
    t0 = time.time()
    try:
        with open(log, "w") as f:
            r = subprocess.run([sys.executable, *argv], cwd=ROOT, env=e,
                               stdout=f, stderr=subprocess.STDOUT,
                               timeout=timeout)
        rc = r.returncode
    except subprocess.TimeoutExpired:
        rc = -2
    dt = time.time() - t0
    tail = ""
    if os.path.exists(log):
        with open(log) as f:
            tail = f.read()[-6000:]
    print(f"[{name}] rc={rc} {dt:.0f}s -> {log}", flush=True)
    return rc, tail, dt


def main():
    os.makedirs(OUT, exist_ok=True)
    summary = {"started": time.strftime("%Y-%m-%d %H:%M:%S"), "steps": {}}

    def record(name, rc, dt, **extra):
        summary["steps"][name] = {"rc": rc, "seconds": round(dt, 1), **extra}
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=1)

    rc, tail, dt = run("probe", ["-c", PROBE], 600)
    record("probe", rc, dt)
    if rc != 0:
        print("tunnel not alive; aborting", flush=True)
        return 1

    rc, tail, dt = run("health", ["benchmarks/tunnel_health.py"], 1800)
    record("health", rc, dt, tail=tail[-300:])
    if rc != 0:
        print("relay session DEGRADED — refusing to record", flush=True)
        return 1

    rc, tail, dt = run("quantized_eval", ["benchmarks/quantized_eval.py"],
                       14400, env={"MILLIEYE_ONLY": EVAL_VARIANTS})
    record("quantized_eval", rc, dt)

    rc, tail, dt = run("eval_variance", ["benchmarks/eval_variance.py"],
                       7200)
    record("eval_variance", rc, dt, tail=tail[-300:])

    rc, tail, dt = run("details_k256", ["benchmarks/details.py"], 4200,
                       env={"MILLIEYE_ONLY": "pallas_max_k256",
                            "MILLIEYE_PALLAS_STEM": "1"})
    record("details_k256", rc, dt)

    # plain-bf16 tail decomposition: refreshes the einsum-tail rows and
    # retires the stale negative-"residual" key under its own dtype
    # prefix (the r4 run profiled under MILLIEYE_SERVING=pallas_max, a
    # different key prefix, so the old row survived)
    rc, tail, dt = run("fusion_tail", ["benchmarks/fusion_profile.py",
                                       "tail"], 4200)
    record("fusion_tail", rc, dt)

    rc, tail, dt = run("sufficiency", ["benchmarks/sufficiency_check.py"],
                       4800)
    record("sufficiency", rc, dt, tail=tail[-300:])

    rc, tail, dt = run("stream_bench", ["benchmarks/stream_bench.py"], 4800)
    record("stream_bench", rc, dt, tail=tail[-300:])

    # ladder: measured-fastest b1 wall fps first. k256 vs lat vs max is
    # settled by their own bench runs below if BENCH_DETAILS lacks them;
    # default to k256 (strictly less NMS work than pallas_max, same
    # kernels) ahead of max, with stem2 + f32 as the proven fallbacks.
    try:
        with open(os.path.join(ROOT, "BENCH_DETAILS.json")) as f:
            det = json.load(f)
        k256_b32 = det.get("fusion_fwd_bfloat16_pallas_max_k256_b32_fps", 0)
        max_b32 = det.get("fusion_fwd_bfloat16_pallas_max_b32_fps", 0)
        first = ("pallas_max_k256"
                 if k256_b32 and k256_b32 >= max_b32 else "pallas_max")
        rungs = [{"preset": first,
                  "env": {"MILLIEYE_NMS_BLOCKED": "0"}, "timeout": 2000},
                 {"preset": "pallas_lat", "env": {}, "timeout": 2000},
                 {"preset": "pallas_stem2",
                  "env": {"MILLIEYE_NMS_BLOCKED": "0",
                          "MILLIEYE_BENCH_SCAN": "0"}, "timeout": 1500},
                 {"preset": "f32", "env": {"MILLIEYE_NMS_PALLAS": "0",
                                           "MILLIEYE_BENCH_SCAN": "0"},
                  "timeout": 2400}]
        if first != "pallas_max":
            rungs.insert(1, {"preset": "pallas_max",
                             "env": {"MILLIEYE_NMS_BLOCKED": "0"},
                             "timeout": 1500})
        with open(os.path.join(ROOT, "runs", "bench_ladder.json"),
                  "w") as f:
            json.dump({"rungs": rungs,
                       "b32_fps": {"pallas_max_k256": k256_b32,
                                   "pallas_max": max_b32}}, f, indent=1)
        record("bench_ladder", 0, 0, first=first, k256_b32=k256_b32,
               max_b32=max_b32)
    except Exception as e:                      # noqa: BLE001
        print(f"bench_ladder write failed: {e}", flush=True)

    rc, tail, dt = run("warm_entry", ["__graft_entry__.py"], 3600)
    record("warm_entry", rc, dt)

    for i in (1, 2):
        rc, tail, dt = run(f"bench_{i}", ["bench.py"],
                           7200 if i == 1 else 3600)
        line = next((ln for ln in tail.splitlines()
                     if ln.startswith("{")), None)
        record(f"bench_{i}", rc, dt, json_line=line)

    print(json.dumps(summary, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
