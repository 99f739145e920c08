"""bench.py's relay-outage fallback must emit a parseable, honestly
flagged line (VERDICT r4 #8): the driver record should never regress to
rc=1 silence when the code didn't change but the relay died."""
import io
import json
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_stale_line_parseable(capsys):
    import bench
    rc = bench._stale_line("unit-test reason")
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    assert rc == 0
    assert d["stale"] is True
    assert d["stale_reason"] == "unit-test reason"
    assert d["metric"] == "fusion_e2e_fps_b1_416"
    assert d["value"] > 0 and d["unit"] == "frames/s"
    # the stale value is the recorded warm median, verbatim
    with open(os.path.join(os.path.dirname(bench.__file__),
                           "BENCH_DETAILS.json")) as f:
        bv = json.load(f)["bench_variance"]
    assert d["value"] == bv["wall_fps_median"]
    assert d["config"] == bv["config"]
