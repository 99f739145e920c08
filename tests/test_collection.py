"""Sensor-toolkit tests: UART framing, cfg parsing, time sync."""
import io
import pickle
import struct

import numpy as np
import pytest

from millieye_tpu.collection.sync import (load_timestamps, load_pointcloud,
                                          match_frames)
from millieye_tpu.collection.uart import (FrameAssembler, parse_radar_cfg,
                                          RadarReader)

MAGIC = bytes([2, 1, 4, 3, 6, 5, 8, 7])


def build_frame(frame_no, points):
    """Synthesize one TI demo-protocol packet with a type-1 TLV."""
    points = np.asarray(points, np.float32).reshape(-1, 4)
    payload = points.tobytes()
    tlv = struct.pack("<II", 1, len(payload)) + payload
    total = 40 + len(tlv)
    header = MAGIC + struct.pack(
        "<IIIIIIII", 0x0A0B0C0D, total, 0x68430000, frame_no, 12345,
        len(points), 1, 0)
    return header + tlv


@pytest.mark.parametrize("use_native", [False, True])
def test_frame_assembler_parses_stream(use_native):
    pts1 = [[1.0, 2.0, 0.5, -0.3], [0.1, 4.0, 0.2, 1.5]]
    pts2 = [[2.0, 3.0, 1.0, 0.8]]
    stream = b"\xde\xad" + build_frame(7, pts1) + build_frame(8, pts2)
    fa = FrameAssembler(use_native=use_native)
    # feed in awkward chunk sizes to exercise reassembly
    frames = []
    for i in range(0, len(stream), 11):
        frames.extend(fa.feed(stream[i:i + 11]))
    assert [f[0] for f in frames] == [7, 8]
    np.testing.assert_allclose(frames[0][1], pts1, rtol=1e-6)
    np.testing.assert_allclose(frames[1][1], pts2, rtol=1e-6)


def test_frame_assembler_skips_unknown_tlv():
    pts = [[1.0, 1.0, 1.0, 1.0]]
    payload = np.asarray(pts, np.float32).tobytes()
    junk_tlv = struct.pack("<II", 6, 8) + b"\x00" * 8
    pt_tlv = struct.pack("<II", 1, len(payload)) + payload
    total = 40 + len(junk_tlv) + len(pt_tlv)
    frame = MAGIC + struct.pack(
        "<IIIIIIII", 1, total, 2, 3, 4, 1, 2, 0) + junk_tlv + pt_tlv
    frames = FrameAssembler(use_native=False).feed(frame)
    assert len(frames) == 1
    np.testing.assert_allclose(frames[0][1], pts)


def test_parse_radar_cfg(tmp_path):
    cfg = tmp_path / "indoor.cfg"
    cfg.write_text("\n".join([
        "% comment",
        "sensorStop",
        "profileCfg 0 60 7 3 24 0 0 166 1 256 12500 0 0 30",
        "frameCfg 0 2 16 0 55 1 0",
        "sensorStart",
    ]))
    out = parse_radar_cfg(str(cfg))
    assert out["num_adc_samples"] == 256
    assert out["frame_period_ms"] == 55
    assert out["range_resolution_m"] == pytest.approx(
        3e8 / (2 * 166e12 * 256 / 12500e3))
    assert "sensorStop" in out["commands"]


def test_radar_reader_with_filelike(tmp_path):
    cfg = tmp_path / "r.cfg"
    cfg.write_text("profileCfg 0 60 7 3 24 0 0 166 1 256 12500 0 0 30\n"
                   "frameCfg 0 2 16 0 55 1 0\n")
    data = io.BytesIO(build_frame(3, [[1, 2, 3, 4]]))
    cli = io.BytesIO()
    rd = RadarReader(str(cfg), cli=cli, data=data)
    rd.boot(inter_command_delay=0)
    frames = rd.poll()
    assert frames and frames[0][0] == 3
    assert b"profileCfg" in cli.getvalue()


def test_time_sync_roundtrip(tmp_path):
    ts = tmp_path / "timestamps.txt"
    ts.write_text("".join(f"{100.0 + i * 0.05} {i}\n" for i in range(5)))
    vt = load_timestamps(str(ts))
    assert len(vt) == 5

    records = [{"Data": {"numObj": 1, "x": [1.0], "y": [2.0], "z": [0.1],
                         "velocity": [0.5]},
                "Time": 100.0 + i * 0.05 + 0.01, "Frame_ID": i}
               for i in range(5)]
    pkl = tmp_path / "pointcloud.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(records, f)
    rt, frames = load_pointcloud(str(pkl))
    assert frames[0].shape == (4, 1)

    matches = match_frames(vt, rt, num_nearest=2)
    assert len(matches) == 5
    # each radar frame consumed at most once across consecutive dedupe
    assert matches[0] and 0 in matches[0]
    flat = [i for m in matches for i in m]
    assert len(flat) == len(set(flat))
