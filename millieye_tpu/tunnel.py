"""Bounded liveness probe for the remote TPU relay (axon tunnel).

When the relay is down, the FIRST jax backend touch in a process hangs
indefinitely (observed round 3: even ``jax.devices()``), so the probe
must run in a killable subprocess. The probe requires a NON-CPU backend
— a probe that "succeeds" on CPU (e.g. under the documented
``PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu`` dev mode) must not convince
axon-mode processes that the tunnel is alive, and must not let chip
benchmarks silently record CPU numbers.

Single source of truth for ``__graft_entry__`` (driver import guard),
``bench.py`` (fail-fast before the rung ladder) and
``benchmarks/r3_campaign.py`` (campaign step 1). This module imports no
jax itself.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

PROBE = ("import jax, numpy as np, jax.numpy as jnp;"
         "assert jax.default_backend() != 'cpu', jax.default_backend();"
         "x = jnp.ones((128,128));"
         "print('PROBE_OK', float(np.asarray(x @ x)[0,0]))")

_OK_STAMP = "/tmp/millieye_tunnel_ok"
_DEAD_STAMP = "/tmp/millieye_tunnel_dead"


def _fresh(path, ttl):
    try:
        return time.time() - os.path.getmtime(path) < ttl
    except OSError:
        return False


def tunnel_alive(ttl=1800, timeout=240, dead_ttl=600):
    """True iff a tiny non-CPU program round-trips within ``timeout``.

    Results are cached in /tmp (positive for ``ttl`` s, negative for
    ``dead_ttl`` s) so a fleet of subprocesses doesn't each re-pay the
    probe — and, when the relay is down, doesn't each burn the timeout.
    ``MILLIEYE_SKIP_PROBE=1`` short-circuits to True (the CPU test
    suite, and bench rungs running under an already-probed ladder).
    """
    if os.environ.get("MILLIEYE_SKIP_PROBE") == "1":
        return True
    if _fresh(_OK_STAMP, ttl):
        return True
    if _fresh(_DEAD_STAMP, dead_ttl):
        return False
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], timeout=timeout,
                           capture_output=True, text=True)
        ok = r.returncode == 0 and "PROBE_OK" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    with open(_OK_STAMP if ok else _DEAD_STAMP, "w"):
        pass
    return ok
