"""Round-3 on-chip measurement campaign, one command, outage-tolerant.

The r3d campaign was cut short when the axon relay died with three new
kernels committed but unmeasured (K-packed stem, block-sequential NMS,
padded-128 RoI). This orchestrator runs the whole remaining sequence the
moment the tunnel is back, with every step in a BOUNDED subprocess (a
pathological Mosaic compile can wedge the remote-compile terminal — the
round-3 incident), gate-first so an on-chip rejection of a new kernel
degrades the downstream steps instead of killing them:

    1. probe      tiny matmul + D2H fetch (is the tunnel alive at all?)
    2. stem_gate  stem_pallas_check.py stem2  -> standalone us per stem
                  spelling (packed / s2d / s2d8); best TWO go e2e
    2b. deep_gate stem_pallas_check.py deep -> pallas_deep (stages 4/6
                  via the planar kernel) joins the e2e candidates only
                  if it beats xla_default standalone at BOTH shapes
    2c. pair2_gate stem_pallas_check.py pair2 -> pallas_pair2 (stages
                  4+6 as ONE s2d kernel) replaces pallas_deep in the
                  candidates if it beats both xla and the singles
    3. nms_gate   benchmarks/nms_tpu_check.py -> blocked kernel ok?
    4. details    MILLIEYE_ONLY=pallas_max  (+ blocked-NMS fallback env)
    5. details    MILLIEYE_ONLY=<each gated stem candidate>
    6. write runs/bench_ladder.json: measured-fastest preset first
    7. nms_profile
    8. quantized_eval  MILLIEYE_ONLY=<surviving presets>
    9. bench.py twice  (LAST: leaves the driver's round-end run warm)

Logs: runs/r3_campaign/NN_<step>.log; decisions + rcs + wall times:
runs/r3_campaign/summary.json (updated after every step, so a mid-
campaign outage still leaves a record).

Usage:  nohup python benchmarks/r3_campaign.py > runs/r3_campaign.out 2>&1 &
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "runs", "r3_campaign")
SUMMARY = os.path.join(OUT, "summary.json")

sys.path.insert(0, ROOT)
from millieye_tpu.tunnel import PROBE  # noqa: E402  (shared probe text)


def run(name, argv, timeout, env=None, idx=[0]):
    """Bounded subprocess; returns (rc, stdout_tail). rc -2 == timeout."""
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
            tail = f.read()[-4000:]
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
        print("tunnel not alive; aborting campaign", flush=True)
        return 1

    # --- gates -----------------------------------------------------------
    rc, tail, dt = run("stem_gate",
                       ["benchmarks/stem_pallas_check.py", "stem2"], 5400)

    def _us(name):
        m = re.search(name + r"\.*\s+(\d+) us/batch", tail)
        return int(m.group(1)) if m else None

    stem_us = {"pallas_packed": _us("packed_bf16s"),
               "pallas_s2d": _us("s2d_bf16s"),
               "pallas_s2d8": _us("s2d8_bf16s")}
    # e2e-measure the best TWO gated stem spellings (each details run is
    # a ~10 min cold compile through the tunnel — don't spend three on
    # the same stage)
    gated = sorted((p for p, us in stem_us.items() if us is not None),
                   key=lambda p: stem_us[p])[:2]
    # copy: summary.json is re-serialized after every step, and the deep
    # gate below appends to `gated` — a live reference would rewrite
    # this step's record
    record("stem_gate", rc, dt, stem_us=stem_us, candidates=list(gated))

    # deep stem stages (4/6 via the generic planar kernel): the
    # pallas_deep preset enters the e2e ladder only if the kernel beats
    # the DEFAULT-precision XLA stage at BOTH shapes standalone (the
    # round-3 lesson: the e2e XLA stem is cheaper than standalone
    # HIGHEST, so gate against the honest baseline)
    rc, tail, dt = run("deep_gate",
                       ["benchmarks/stem_pallas_check.py", "deep"], 3600)

    def _us2(name):
        m = re.search(re.escape(name) + r"\.*\s+(\d+) us/batch", tail)
        return int(m.group(1)) if m else None

    deep_wins = []
    for tag in ("s4", "s6"):
        ref = _us2(f"deep_{tag}_xla_def")
        ker = _us2(f"deep_{tag}_default")
        deep_wins.append(ref is not None and ker is not None and ker < ref)
    deep_ok = rc == 0 and all(deep_wins)
    record("deep_gate", rc, dt, deep_ok=deep_ok,
           us={t: {"xla_def": _us2(f"deep_{t}_xla_def"),
                   "pallas_def": _us2(f"deep_{t}_default")}
               for t in ("s4", "s6")})
    if deep_ok:
        gated.append("pallas_deep")

    # deep PAIR (stages 4+6 as one s2d kernel): enters only if it beats
    # BOTH the XLA stages and the two single-stage kernels standalone —
    # and then REPLACES pallas_deep in the candidate list (same stages,
    # strictly stronger fusion; don't spend two ~10 min details runs on
    # the weaker spelling)
    rc, tail, dt = run("pair2_gate",
                       ["benchmarks/stem_pallas_check.py", "pair2"], 3600)
    p_xla, p_single = _us2("pair2_xla_def"), _us2("pair2_singles")
    p_pair = _us2("pair2_s2d_bf16s")
    pair2_ok = (rc == 0 and None not in (p_xla, p_pair)
                and p_pair < p_xla
                and (p_single is None or p_pair < p_single))
    record("pair2_gate", rc, dt, pair2_ok=pair2_ok,
           us={"xla_def": p_xla, "singles": p_single, "pair": p_pair})
    if pair2_ok:
        if "pallas_deep" in gated:
            gated.remove("pallas_deep")
        gated.append("pallas_pair2")

    rc, tail, dt = run("nms_gate", ["benchmarks/nms_tpu_check.py"], 2400)
    blocked_ok = rc == 0
    record("nms_gate", rc, dt, blocked_ok=blocked_ok)

    nms_env = {} if blocked_ok else {"MILLIEYE_NMS_BLOCKED": "0"}
    if not blocked_ok:
        print("blocked NMS rejected on-chip -> MILLIEYE_NMS_BLOCKED=0 "
              "for all downstream steps (revert ops/nms.py auto flip "
              "before the next round)", flush=True)

    # --- measurements ----------------------------------------------------
    base_env = dict(MILLIEYE_PALLAS_STEM="1", **nms_env)
    rc, tail, dt = run("details_pallas_max", ["benchmarks/details.py"],
                       4200, env=dict(base_env, MILLIEYE_ONLY="pallas_max"))
    record("details_pallas_max", rc, dt)
    presets = ["pallas_max"] if rc == 0 else []

    for cand in gated:
        rc, tail, dt = run(f"details_{cand}", ["benchmarks/details.py"],
                           4200, env=dict(base_env, MILLIEYE_ONLY=cand))
        record(f"details_{cand}", rc, dt)
        if rc == 0:
            presets.append(cand)
    if not gated:
        print("no stem spelling survived the gate -> ladder falls back "
              "to the proven presets", flush=True)

    # measured-fastest preset first for bench.py's ladder (the driver's
    # round-end bench reads runs/bench_ladder.json), proven fallbacks
    # always appended
    fps = {}
    try:
        with open(os.path.join(ROOT, "BENCH_DETAILS.json")) as f:
            det = json.load(f)
        fps = {p: det.get(f"fusion_fwd_bfloat16_{p}_b32_fps", 0)
               for p in presets}
        order = sorted((p for p in presets if fps[p]),
                       key=lambda p: -fps[p])
        rungs = [{"preset": p, "env": nms_env, "timeout": 1500}
                 for p in order]
        rungs += [{"preset": "pallas_stem2",
                   "env": {**nms_env, "MILLIEYE_NMS_BLOCKED": "0"},
                   "timeout": 1500},
                  {"preset": "f32", "env": {"MILLIEYE_NMS_PALLAS": "0"},
                   "timeout": 2400}]
        with open(os.path.join(ROOT, "runs", "bench_ladder.json"),
                  "w") as f:
            json.dump({"rungs": rungs, "b32_fps": fps}, f, indent=1)
        record("bench_ladder", 0, 0, order=order, b32_fps=fps)
    except Exception as e:                      # noqa: BLE001
        print(f"bench_ladder write failed: {e}", flush=True)

    rc, tail, dt = run("nms_profile", ["benchmarks/nms_profile.py"], 2400,
                       env=nms_env)
    record("nms_profile", rc, dt)

    if presets:
        # backbone/NMS/RoI+heads attribution of the measured-fastest
        # preset (fusion_profile reuses the details run's warm cache)
        best = max(presets, key=lambda p: fps.get(p, 0))
        rc, tail, dt = run("fusion_profile", ["benchmarks/fusion_profile.py"],
                           3600, env=dict(nms_env, MILLIEYE_SERVING=best))
        record("fusion_profile", rc, dt, preset=best)

    if presets:
        rc, tail, dt = run("quantized_eval", ["benchmarks/quantized_eval.py"],
                           10800,
                           env=dict(nms_env,
                                    MILLIEYE_ONLY=",".join(presets)))
        record("quantized_eval", rc, dt, presets=presets)

    # warm the driver's entry() compile-check graph (weights as jit
    # ARGUMENTS — a different executable than bench_entry's closure-
    # constant graph, so the bench runs below do not warm it)
    rc, tail, dt = run("warm_entry", ["__graft_entry__.py"], 3600)
    record("warm_entry", rc, dt)

    # bench LAST, twice: run 1 pays any residual compile, run 2 is the
    # warm number AND leaves the persistent cache hot for the driver's
    # round-end bench (do not edit traced sources after this point —
    # cache keys include HLO source locations)
    for i in (1, 2):
        rc, tail, dt = run(f"bench_{i}", ["bench.py"], 7200 if i == 1
                           else 3600, env=nms_env)
        line = next((ln for ln in tail.splitlines()
                     if ln.startswith("{")), None)
        record(f"bench_{i}", rc, dt, json_line=line)

    print(json.dumps(summary, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
