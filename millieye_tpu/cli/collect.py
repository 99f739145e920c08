"""Recorder CLI (reference data_collection/collect.py).

  python -m millieye_tpu.cli.collect --out data/$(date +%Y%m%d-%H%M%S) \
      --cfg cfg/indoor.cfg --duration 30 --fps 20
"""
from __future__ import annotations

import argparse

from millieye_tpu.collection.recorder import record


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True)
    p.add_argument("--cfg", required=True, help="TI radar .cfg file")
    p.add_argument("--duration", type=float, default=30.0)
    p.add_argument("--fps", type=int, default=20)
    args = p.parse_args(argv)
    record(args.out, args.cfg, args.duration, args.fps)


if __name__ == "__main__":
    main()
