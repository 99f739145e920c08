"""Adversarial-input robustness: the engine and sensor parsers must return
well-defined outputs on malformed inputs (SURVEY §5 — the reference's
degenerate paths are behavioral requirements, generalized to hostile data:
NaN radar returns, out-of-range boxes, corrupted UART streams, odd frame
geometries)."""
import numpy as np
import jax
import pytest

from millieye_tpu.models import Darknet, tiny_yolov3_defs
from millieye_tpu.models.fusion import FusionConfig, FusionNetwork
from millieye_tpu.runtime.engine import FusionEngine
from millieye_tpu.collection.uart import FrameAssembler, _MAGIC

S = 128
FRAME = (64, 48)


@pytest.fixture(scope="module")
def engine():
    darknet = Darknet(tiny_yolov3_defs(num_classes=12, img_size=S),
                      img_size=S)
    model = FusionNetwork(darknet, FusionConfig(
        conf_thresh=0.05, max_det=16, max_radar=4, pre_nms_top_k=64))
    params, state = model.init(jax.random.PRNGKey(0))
    return FusionEngine(model, params, state, frame_size=FRAME,
                        max_points=32)


def _check(engine, frame, pts, props):
    boxes, valid = engine.infer(frame, pts, props, mode=0)
    assert boxes.shape[1] == 6 and valid.shape[0] == boxes.shape[0]
    assert np.isfinite(boxes).all(), boxes
    return boxes, valid


def test_nan_inf_radar_points(engine, rng):
    frame = (rng.uniform(size=(FRAME[1], FRAME[0], 3)) * 255).astype(np.uint8)
    pts = np.array([[10.0, 10.0, np.nan, 1.0],
                    [np.inf, 20.0, 3.0, -0.5],
                    [30.0, -np.inf, 2.0, np.nan],
                    [20.0, 20.0, 2.0, 0.5]])
    _check(engine, frame, pts, np.zeros((0, 4)))


def test_nan_and_out_of_range_proposals(engine, rng):
    frame = (rng.uniform(size=(FRAME[1], FRAME[0], 3)) * 255).astype(np.uint8)
    props = np.array([
        [np.nan, 5.0, 30.0, 40.0],          # NaN corner
        [-1e9, -1e9, 1e9, 1e9],             # absurd extent
        [50.0, 40.0, 10.0, 5.0],            # inverted (x2<x1, y2<y1)
        [20.0, 20.0, 20.0, 20.0],           # empty
        [5.0, 5.0, 30.0, 40.0],             # one sane box
    ])
    _check(engine, frame, np.zeros((0, 4)), props)


def test_degenerate_all_garbage(engine):
    frame = np.zeros((FRAME[1], FRAME[0], 3), np.uint8)
    pts = np.full((8, 4), np.nan)
    props = np.full((6, 4), np.inf)
    boxes, valid = _check(engine, frame, pts, props)
    # every garbage radar proposal was masked out on-device, so any valid
    # rows can only be camera detections with in-graph coordinates
    assert np.isfinite(boxes[valid]).all()


def test_nonstandard_frame_geometry(engine, rng):
    """Frames that differ from the configured frame_size (e.g. a camera
    renegotiated resolution mid-stream) still produce finite outputs —
    the step retraces for the new static shape."""
    for shape in ((47, 63, 3), (96, 64, 3)):
        frame = (rng.uniform(size=shape) * 255).astype(np.uint8)
        _check(engine, frame, np.zeros((0, 4)), np.zeros((0, 4)))


def test_empty_inputs_as_lists(engine):
    frame = np.zeros((FRAME[1], FRAME[0], 3), np.uint8)
    _check(engine, frame, [], [])


# ------------------------------------------------------------------- UART
def _frame_bytes(frame_no, pts):
    pts = np.asarray(pts, np.float32).reshape(-1, 4)
    tlv = pts.tobytes()
    total = 40 + 8 + len(tlv)
    head = bytearray(_MAGIC.tobytes())
    head += np.asarray([1], np.uint32).tobytes()                 # version
    head += np.asarray([total], np.uint32).tobytes()             # totalLen
    head += np.asarray([0], np.uint32).tobytes()                 # platform
    head += np.asarray([frame_no], np.uint32).tobytes()
    head += np.asarray([0], np.uint32).tobytes()                 # cpu time
    head += np.asarray([len(pts)], np.uint32).tobytes()          # numObj
    head += np.asarray([1], np.uint32).tobytes()                 # numTLVs
    head += np.asarray([0], np.uint32).tobytes()                 # subframe
    head += np.asarray([1, len(tlv)], np.uint32).tobytes()       # TLV hdr
    return bytes(head) + tlv


@pytest.mark.parametrize("use_native", [False, True])
def test_uart_zero_byte_and_garbage_chunks(use_native):
    fa = FrameAssembler(use_native=use_native)
    good = _frame_bytes(7, [[1, 2, 3, 4]])
    assert fa.feed(b"") == []
    assert fa.feed(b"\x00" * 100) == []          # pure garbage
    # frame delivered one byte at a time with empty chunks interleaved
    got = []
    for i, b in enumerate(good):
        got += fa.feed(bytes([b]))
        if i % 3 == 0:
            got += fa.feed(b"")
    assert len(got) == 1 and got[0][0] == 7
    np.testing.assert_allclose(got[0][1], [[1, 2, 3, 4]])


@pytest.mark.parametrize("use_native", [False, True])
def test_uart_corrupt_total_len_does_not_stall(use_native):
    """A header claiming a multi-GB frame must be skipped, not awaited."""
    fa = FrameAssembler(use_native=use_native)
    bad = bytearray(_frame_bytes(3, [[1, 2, 3, 4]]))
    bad[12:16] = np.asarray([0xFFFFFF00], np.uint32).tobytes()
    good = _frame_bytes(9, [[5, 6, 7, 8]])
    got = fa.feed(bytes(bad) + good)
    assert [f for f, _ in got] == [9]
    # buffer must not be accumulating the "giant frame"
    assert len(fa.buf) < 64


@pytest.mark.parametrize("use_native", [False, True])
def test_uart_truncated_then_valid(use_native):
    fa = FrameAssembler(use_native=use_native)
    good = _frame_bytes(1, [[1, 1, 1, 1]])
    # truncated frame (header promises more bytes than ever arrive is the
    # stall case above; here the tail is cut and a fresh frame follows)
    cut = _frame_bytes(0, [[9, 9, 9, 9], [8, 8, 8, 8]])[:50]
    got = fa.feed(cut)
    assert got == []
    got = fa.feed(good)
    # the truncated frame's magic shadows the stream until its promised
    # length arrives; feeding yet another frame must eventually resync
    got += fa.feed(_frame_bytes(2, [[2, 2, 2, 2]]))
    assert any(f in (1, 2) for f, _ in got)
