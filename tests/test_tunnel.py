"""millieye_tpu.tunnel.tunnel_alive: stamp caching and probe semantics
(the probe subprocess itself is stubbed — its real behavior against the
live/dead relay is exercised by bench.py and __graft_entry__)."""
import os
import types

import millieye_tpu.tunnel as tunnel


def _patch_stamps(monkeypatch, tmp_path):
    monkeypatch.setattr(tunnel, "_OK_STAMP", str(tmp_path / "ok"))
    monkeypatch.setattr(tunnel, "_DEAD_STAMP", str(tmp_path / "dead"))
    monkeypatch.delenv("MILLIEYE_SKIP_PROBE", raising=False)


def test_probe_success_cached(monkeypatch, tmp_path):
    _patch_stamps(monkeypatch, tmp_path)
    calls = []

    def fake(argv, timeout=None, capture_output=None, text=None):
        calls.append(timeout)
        return types.SimpleNamespace(returncode=0, stdout="PROBE_OK 128.0")

    monkeypatch.setattr(tunnel.subprocess, "run", fake)
    assert tunnel.tunnel_alive(timeout=5) is True
    assert os.path.exists(tunnel._OK_STAMP)
    assert tunnel.tunnel_alive(timeout=5) is True   # cached: no re-probe
    assert len(calls) == 1


def test_probe_failure_cached_negative(monkeypatch, tmp_path):
    _patch_stamps(monkeypatch, tmp_path)
    calls = []

    def fake(argv, timeout=None, capture_output=None, text=None):
        calls.append(timeout)
        return types.SimpleNamespace(returncode=1, stdout="")

    monkeypatch.setattr(tunnel.subprocess, "run", fake)
    assert tunnel.tunnel_alive(timeout=5) is False
    assert os.path.exists(tunnel._DEAD_STAMP)
    assert not os.path.exists(tunnel._OK_STAMP)
    assert tunnel.tunnel_alive(timeout=5) is False  # negative cache
    assert len(calls) == 1


def test_probe_timeout_is_dead(monkeypatch, tmp_path):
    _patch_stamps(monkeypatch, tmp_path)

    def fake(argv, timeout=None, capture_output=None, text=None):
        raise tunnel.subprocess.TimeoutExpired(argv, timeout)

    monkeypatch.setattr(tunnel.subprocess, "run", fake)
    assert tunnel.tunnel_alive(timeout=5) is False
    assert os.path.exists(tunnel._DEAD_STAMP)


def test_skip_probe_env(monkeypatch, tmp_path):
    _patch_stamps(monkeypatch, tmp_path)
    monkeypatch.setenv("MILLIEYE_SKIP_PROBE", "1")

    def boom(*a, **k):
        raise AssertionError("probe must not run")

    monkeypatch.setattr(tunnel.subprocess, "run", boom)
    assert tunnel.tunnel_alive() is True


def test_probe_requires_non_cpu_backend():
    """The probe snippet itself must refuse a CPU backend — a CPU-mode
    'success' must not mark the tunnel alive."""
    assert "!= 'cpu'" in tunnel.PROBE
