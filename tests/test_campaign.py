"""Logic tests for the round-3 on-chip campaign orchestrator
(benchmarks/r3_campaign.py) with every subprocess stubbed — the gating,
candidate selection, env propagation and bench-ladder ordering must be
right BEFORE the one chance to run it against the real tunnel."""
import importlib.util
import json
import os
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

GATE_OUT = """stem2 b32 416x3->16->32: maxerr 4.05e-05
  packed_bf16s...... 1900 us/batch (16842 fps)
  s2d_bf16s......... 1300 us/batch (24615 fps)
  s2d8_bf16s........ 1100 us/batch (29091 fps)
"""

DEEP_OUT = """deep s4 b32 104x32->64: maxerr 3.11e-05
  deep_s4_xla_hi........ 700 us/batch (45714 fps)
  deep_s4_xla_def....... 400 us/batch (80000 fps)
  deep_s4_default....... 300 us/batch (106667 fps)
deep s6 b32 52x64->128: maxerr 2.87e-05
  deep_s6_xla_def....... 380 us/batch (84211 fps)
  deep_s6_default....... 290 us/batch (110345 fps)
"""

PAIR2_OUT = """pair2 b32 104x32->64->128: maxerr 3.40e-05
  pair2_xla_def......... 780 us/batch (41026 fps)
  pair2_singles......... 590 us/batch (54237 fps)
  pair2_s2d_hi.......... 620 us/batch (51613 fps)
  pair2_s2d_bf16s....... 430 us/batch (74419 fps)
  pair2_s2d4_bf16s...... 520 us/batch (61538 fps)
"""


def _load(tmp_path):
    spec = importlib.util.spec_from_file_location(
        "r3_campaign", os.path.join(REPO, "benchmarks", "r3_campaign.py"))
    camp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(camp)
    camp.ROOT = str(tmp_path)
    camp.OUT = str(tmp_path / "runs" / "r3_campaign")
    camp.SUMMARY = os.path.join(camp.OUT, "summary.json")
    os.makedirs(tmp_path / "runs", exist_ok=True)
    return camp


def _fake_run(tmp_path, calls, gates_ok):
    def fake(argv, cwd=None, env=None, stdout=None, stderr=None,
             timeout=None):
        name = " ".join(argv[1:]) or argv[0][:20]
        calls.append((name, {k: env[k] for k in
                             ("MILLIEYE_ONLY", "MILLIEYE_NMS_BLOCKED")
                             if env and k in env}))
        rc, out = 0, ""
        if argv[0] == "-c":
            out = "PROBE_OK 128.0\n"
        elif "stem_pallas_check" in name:
            good = (PAIR2_OUT if "pair2" in argv
                    else DEEP_OUT if "deep" in argv else GATE_OUT)
            out, rc = (good, 0) if gates_ok else ("boom\n", 1)
        elif "nms_tpu_check" in name:
            rc = 0 if gates_ok else 1
        elif "details" in name:
            only = env.get("MILLIEYE_ONLY")
            det_path = tmp_path / "BENCH_DETAILS.json"
            det = (json.loads(det_path.read_text())
                   if det_path.exists() else {})
            fps = {"pallas_max": 4000.0, "pallas_s2d": 4400.0,
                   "pallas_s2d8": 4600.0, "pallas_packed": 4100.0,
                   "pallas_deep": 4800.0, "pallas_pair2": 5000.0}[only]
            det[f"fusion_fwd_bfloat16_{only}_b32_fps"] = fps
            det_path.write_text(json.dumps(det))
        elif "bench.py" in name:
            out = '{"metric": "fusion_e2e_fps_b1_416", "value": 1600}\n'
        if stdout is not None:
            stdout.write(out)
        return types.SimpleNamespace(returncode=rc)
    return fake


def test_campaign_happy_path_orders_ladder_by_measured_fps(tmp_path,
                                                            monkeypatch):
    camp = _load(tmp_path)
    calls = []
    # camp does a plain `import subprocess`, so camp.subprocess IS the
    # shared module — patch through monkeypatch so it is restored
    monkeypatch.setattr(camp.subprocess, "run",
                        _fake_run(tmp_path, calls, gates_ok=True))
    assert camp.main() == 0
    s = json.loads(open(camp.SUMMARY).read())
    # best TWO stem spellings by standalone us (s2d8 1100 < s2d 1300)
    assert s["steps"]["stem_gate"]["candidates"] == ["pallas_s2d8",
                                                     "pallas_s2d"]
    # deep gate: kernel beats xla_default at both shapes -> joins e2e;
    # pair2 beats both xla and the singles -> REPLACES pallas_deep
    assert s["steps"]["deep_gate"]["deep_ok"] is True
    assert s["steps"]["pair2_gate"]["pair2_ok"] is True
    assert s["steps"]["nms_gate"]["blocked_ok"] is True
    lad = json.loads((tmp_path / "runs" / "bench_ladder.json").read_text())
    assert [r["preset"] for r in lad["rungs"]] == [
        "pallas_pair2", "pallas_s2d8", "pallas_s2d", "pallas_max",
        "pallas_stem2", "f32"]
    # proven-fallback rungs keep their protective env
    assert lad["rungs"][4]["env"] == {"MILLIEYE_NMS_BLOCKED": "0"}
    assert lad["rungs"][5]["env"] == {"MILLIEYE_NMS_PALLAS": "0"}
    assert s["steps"]["bench_2"]["json_line"].startswith("{")


def test_campaign_gate_failures_degrade_to_proven_configs(tmp_path,
                                                           monkeypatch):
    camp = _load(tmp_path)
    calls = []
    monkeypatch.setattr(camp.subprocess, "run",
                        _fake_run(tmp_path, calls, gates_ok=False))
    assert camp.main() == 0
    s = json.loads(open(camp.SUMMARY).read())
    assert s["steps"]["stem_gate"]["candidates"] == []
    assert s["steps"]["nms_gate"]["blocked_ok"] is False
    lad = json.loads((tmp_path / "runs" / "bench_ladder.json").read_text())
    assert [r["preset"] for r in lad["rungs"]] == [
        "pallas_max", "pallas_stem2", "f32"]
    # every measurement step (but NOT the gates, which must exercise the
    # new kernel) runs with the blocked-NMS fallback env
    nms = [e.get("MILLIEYE_NMS_BLOCKED") for n, e in calls
           if "details.py" in n or "nms_profile" in n
           or "quantized_eval" in n or n == "bench.py"]
    assert nms and all(v == "0" for v in nms)
