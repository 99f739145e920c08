"""Tracked-checkpoint fallback resolution (millieye_tpu/io/artifacts.py).

Round-3 incident: ``runs/`` (gitignored) was wiped between sessions, so
``quantized_eval``/``eval_variance`` lost their checkpoint and needed a
full synthetic re-train. Benchmarks now resolve checkpoints through
``resolve_checkpoint`` with an ``artifacts/`` (tracked) mirror.
"""
import os

import pytest

from millieye_tpu.io import artifacts


def test_existing_path_wins(tmp_path, monkeypatch):
    p = tmp_path / "runs" / "stage3_final.npz"
    p.parent.mkdir()
    p.write_bytes(b"x")
    # even with a mirror present, the fresh runs/ copy is preferred
    monkeypatch.setattr(artifacts, "ARTIFACTS", str(tmp_path / "artifacts"))
    os.makedirs(artifacts.ARTIFACTS)
    (tmp_path / "artifacts" / "stage3_final.npz").write_bytes(b"y")
    assert artifacts.resolve_checkpoint(str(p)) == str(p)


def test_falls_back_to_mirror(tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(artifacts, "ARTIFACTS", str(tmp_path / "artifacts"))
    os.makedirs(artifacts.ARTIFACTS)
    mirror = tmp_path / "artifacts" / "stage3_final.npz"
    mirror.write_bytes(b"y")
    # fallback applies to the DEFAULT runs/synthetic/ location only
    got = artifacts.resolve_checkpoint(
        str(tmp_path / "runs" / "synthetic" / "stage3_final.npz"))
    assert got == str(mirror)
    # and it says so, so numbers can't be mis-attributed
    assert "using tracked mirror" in capsys.readouterr().out


def test_non_default_path_never_falls_back(tmp_path, monkeypatch):
    # a typo'd experiment path must NOT silently score the stale mirror
    monkeypatch.setattr(artifacts, "ARTIFACTS", str(tmp_path / "artifacts"))
    os.makedirs(artifacts.ARTIFACTS)
    (tmp_path / "artifacts" / "stage3_final.npz").write_bytes(b"y")
    with pytest.raises(FileNotFoundError) as e:
        artifacts.resolve_checkpoint("runs/exp_ablation/stage3_final.npz")
    assert "non-default path" in str(e.value)


def test_missing_everywhere_names_both(tmp_path, monkeypatch):
    monkeypatch.setattr(artifacts, "ARTIFACTS", str(tmp_path / "artifacts"))
    missing = str(tmp_path / "runs" / "synthetic" / "stage3_final.npz")
    with pytest.raises(FileNotFoundError) as e:
        artifacts.resolve_checkpoint(missing)
    msg = str(e.value)
    assert missing in msg
    assert "synthetic_e2e" in msg          # regeneration hint


def test_mirror_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(artifacts, "ARTIFACTS", str(tmp_path / "artifacts"))
    src = tmp_path / "stage3_final.npz"
    src.write_bytes(b"payload")
    dst = artifacts.mirror_checkpoint(str(src))
    assert dst == str(tmp_path / "artifacts" / "stage3_final.npz")
    with open(dst, "rb") as f:
        assert f.read() == b"payload"
    # and the resolver finds the mirror by basename (default path only)
    assert artifacts.resolve_checkpoint(
        str(tmp_path / "runs" / "synthetic" / "stage3_final.npz")) == dst
