"""Round-4 on-chip measurement campaign, one command, outage-tolerant.

Same bounded-subprocess discipline as r3_campaign.py (a pathological
Mosaic compile can wedge the remote-compile terminal; a dead relay must
cost a timeout, not the campaign). Round-4 sequence:

    1. probe       tiny matmul round trip (alive at all?)
    2. health      benchmarks/tunnel_health.py — ABORTS the campaign if
                   the chip/relay session is in the degraded state seen
                   on 2026-08-19 (every timing uniformly ~10-25x slow);
                   recording numbers from such a session poisons the
                   official record
    3. stem_gate   stem_pallas_check.py stem2 — with the round-4
                   roll-aligned bf16 fills; best TWO bf16s spellings to
                   e2e
    3b. pair2_gate only if s2d compiled (same kernel family)
    4. nms_gate    blocked kernel still bit-exact
    5. details     pallas_max, pallas_maxv (VPU RoI reduce), then each
                   gated stem candidate
    6. nms_profile new rows: prep_new / full_k256 / full_blocked /
                   full_xla (decision-grade deltas between FULL graphs)
    7. details     MILLIEYE_ONLY=train MILLIEYE_TRAIN_VARIANTS=1 —
                   stop-grad / bf16 / fold+Pallas-stem train steps
    8. sufficiency pre_top_k=256 evidence for pallas_lat (needs the
                   stage-3 checkpoint; artifacts/ mirror suffices)
    9. lat_bench   bench.py MILLIEYE_BENCH_PRESET=pallas_lat (b1 wall +
                   scan device latency of the latency preset)
    10. fusion_profile + quantized_eval of the measured winners
    11. tracker_profile (host-only)
    12. bench_ladder.json, warm entry(), bench.py twice (LAST — leaves
        the driver's round-end bench warm; no traced-source edits after)

Logs: runs/r4_campaign/NN_<step>.log; summary (updated after every
step): runs/r4_campaign/summary.json.

Usage:  nohup python benchmarks/r4_campaign.py > runs/r4_campaign.out 2>&1 &
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "runs", "r4_campaign")
SUMMARY = os.path.join(OUT, "summary.json")

sys.path.insert(0, ROOT)
from millieye_tpu.tunnel import PROBE  # noqa: E402


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
        print("tunnel not alive; aborting campaign", flush=True)
        return 1

    rc, tail, dt = run("health", ["benchmarks/tunnel_health.py"], 1800)
    record("health", rc, dt, tail=tail[-400:])
    if rc != 0:
        print("chip/relay session DEGRADED — refusing to record official "
              "numbers this session; re-run when healthy", flush=True)
        return 1

    # --- gates -----------------------------------------------------------
    rc, tail, dt = run("stem_gate",
                       ["benchmarks/stem_pallas_check.py", "stem2"], 5400)

    def _us(pat, text):
        m = re.search(re.escape(pat) + r"\.*\s+(\d+) us/batch", text)
        return int(m.group(1)) if m else None

    stem_us = {"pallas_phase": _us("phase_bf16s", tail),
               "pallas_packed": _us("packed_bf16s", tail),
               "pallas_s2d": _us("s2d_bf16s", tail),
               "pallas_s2d8": _us("s2d8_bf16s", tail)}
    gated = sorted((p for p, us in stem_us.items()
                    if us is not None and p != "pallas_phase"),
                   key=lambda p: stem_us[p])[:2]
    # only candidates that actually beat the proven phase spelling
    # standalone are worth a ~10 min e2e compile
    if stem_us["pallas_phase"] is not None:
        gated = [p for p in gated if stem_us[p] < stem_us["pallas_phase"]]
    record("stem_gate", rc, dt, stem_us=stem_us, candidates=list(gated))

    if "pallas_s2d" in gated or stem_us["pallas_s2d"] is not None:
        rc, tail, dt = run("pair2_gate",
                           ["benchmarks/stem_pallas_check.py", "pair2"],
                           3600)
        p_xla, p_single = _us("pair2_xla_def", tail), _us("pair2_singles",
                                                          tail)
        p_pair = _us("pair2_s2d_bf16s", tail)
        pair2_ok = (rc == 0 and None not in (p_xla, p_pair)
                    and p_pair < p_xla
                    and (p_single is None or p_pair < p_single))
        record("pair2_gate", rc, dt, pair2_ok=pair2_ok,
               us={"xla_def": p_xla, "singles": p_single, "pair": p_pair})
        if pair2_ok:
            gated.append("pallas_pair2")

    rc, tail, dt = run("nms_gate", ["benchmarks/nms_tpu_check.py"], 2400)
    blocked_ok = rc == 0
    record("nms_gate", rc, dt, blocked_ok=blocked_ok)
    nms_env = {} if blocked_ok else {"MILLIEYE_NMS_BLOCKED": "0"}

    # --- e2e fwd measurements ---------------------------------------------
    base_env = dict(MILLIEYE_PALLAS_STEM="1", **nms_env)
    presets = []
    for cand in ["pallas_max", "pallas_maxv"] + gated:
        rc, tail, dt = run(f"details_{cand}", ["benchmarks/details.py"],
                           4200, env=dict(base_env, MILLIEYE_ONLY=cand))
        record(f"details_{cand}", rc, dt)
        if rc == 0:
            presets.append(cand)

    def b32_fps():
        try:
            with open(os.path.join(ROOT, "BENCH_DETAILS.json")) as f:
                det = json.load(f)
            return {p: det.get(f"fusion_fwd_bfloat16_{p}_b32_fps", 0)
                    for p in presets}
        except Exception:                       # noqa: BLE001
            return {}

    fps = b32_fps()

    rc, tail, dt = run("nms_profile", ["benchmarks/nms_profile.py"], 3600,
                       env=nms_env)
    record("nms_profile", rc, dt)

    rc, tail, dt = run("details_train", ["benchmarks/details.py"], 10800,
                       env=dict(base_env, MILLIEYE_ONLY="train",
                                MILLIEYE_TRAIN_VARIANTS="1"))
    record("details_train", rc, dt)

    rc, tail, dt = run("sufficiency", ["benchmarks/sufficiency_check.py"],
                       4800, env=nms_env)
    record("sufficiency", rc, dt, tail=tail[-400:])

    rc, tail, dt = run("lat_bench", ["bench.py"], 4800,
                       env=dict(nms_env,
                                MILLIEYE_BENCH_PRESET="pallas_lat"))
    line = next((ln for ln in tail.splitlines() if ln.startswith("{")),
                None)
    record("lat_bench", rc, dt, json_line=line)

    if presets:
        best = max(presets, key=lambda p: fps.get(p, 0))
        rc, tail, dt = run("fusion_profile",
                           ["benchmarks/fusion_profile.py"], 3600,
                           env=dict(nms_env, MILLIEYE_SERVING=best))
        record("fusion_profile", rc, dt, preset=best)

        rc, tail, dt = run("quantized_eval",
                           ["benchmarks/quantized_eval.py"], 10800,
                           env=dict(nms_env,
                                    MILLIEYE_ONLY=",".join(presets)))
        record("quantized_eval", rc, dt, presets=presets)

    rc, tail, dt = run("tracker_profile",
                       ["benchmarks/tracker_profile.py"], 1800)
    record("tracker_profile", rc, dt, tail=tail[-400:])

    # --- ladder + final warm bench ----------------------------------------
    fps = b32_fps()
    try:
        order = sorted((p for p in presets if fps.get(p)),
                       key=lambda p: -fps[p])
        rungs = [{"preset": p, "env": nms_env, "timeout": 2000}
                 for p in order]
        rungs += [{"preset": "pallas_stem2",
                   "env": {**nms_env, "MILLIEYE_NMS_BLOCKED": "0",
                           "MILLIEYE_BENCH_SCAN": "0"}, "timeout": 1500},
                  {"preset": "f32", "env": {"MILLIEYE_NMS_PALLAS": "0",
                                            "MILLIEYE_BENCH_SCAN": "0"},
                   "timeout": 2400}]
        with open(os.path.join(ROOT, "runs", "bench_ladder.json"),
                  "w") as f:
            json.dump({"rungs": rungs, "b32_fps": fps}, f, indent=1)
        record("bench_ladder", 0, 0, order=order, b32_fps=fps)
    except Exception as e:                      # noqa: BLE001
        print(f"bench_ladder write failed: {e}", flush=True)

    rc, tail, dt = run("warm_entry", ["__graft_entry__.py"], 3600)
    record("warm_entry", rc, dt)

    for i in (1, 2):
        rc, tail, dt = run(f"bench_{i}", ["bench.py"],
                           7200 if i == 1 else 3600, env=nms_env)
        line = next((ln for ln in tail.splitlines()
                     if ln.startswith("{")), None)
        record(f"bench_{i}", rc, dt, json_line=line)

    print(json.dumps(summary, indent=1), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
