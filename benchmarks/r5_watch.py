"""Relay watcher: poll the tunnel, run the round-5 campaign when it
returns, exit with the campaign's rc.

The axon relay has died four times across rounds 3-5 (CLAUDE.md); the
prior watchers lived in runs/ and were wiped with it. This one is
tracked. It polls with the bounded probe (millieye_tpu/tunnel.py — a
dead relay hangs any backend touch, so the probe runs in a killable
subprocess), and on liveness launches benchmarks/r5_campaign.py, which
does its own health gating and archiving.

Usage: nohup python -u benchmarks/r5_watch.py > runs/r5_watch.out 2>&1 &
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from millieye_tpu.tunnel import tunnel_alive  # noqa: E402


def main(hours=11.0, poll=240, campaign_timeout=8 * 3600):
    deadline = time.time() + hours * 3600
    n = 0
    while time.time() < deadline:
        n += 1
        # ttl=0: always re-probe (the cached OK stamp must not launch a
        # multi-hour campaign against a relay that died seconds ago)
        # 300s probe: a half-recovered relay answers in ~2-4 min (the
        # 10:37 recovery probe took 113s; 200s timeouts missed the
        # 10:06 window under load)
        if tunnel_alive(ttl=0, timeout=300):
            print(f"[watch] relay ALIVE after {n} probes — campaign",
                  flush=True)
            try:
                r = subprocess.run(
                    [sys.executable, "-u",
                     os.path.join(ROOT, "benchmarks", "r5_campaign.py")],
                    cwd=ROOT, timeout=campaign_timeout)
                if r.returncode == 0:
                    return 0
                # rc=1 = campaign aborted at its own probe/health gate
                # (slow recovery, degraded session) — keep watching
                # rather than dying with it
                print(f"[watch] campaign aborted rc={r.returncode}; "
                      "resuming watch", flush=True)
            except subprocess.TimeoutExpired:
                print("[watch] campaign timed out", flush=True)
                return 2
        print(f"[watch] probe {n}: relay down "
              f"({(deadline - time.time()) / 3600:.1f} h left)",
              flush=True)
        time.sleep(poll)
    print("[watch] gave up: relay never came back", flush=True)
    return 3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=11.0)
    ap.add_argument("--poll", type=int, default=240)
    args = ap.parse_args()
    raise SystemExit(main(args.hours, args.poll))
