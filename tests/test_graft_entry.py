"""Driver contract: entry() compiles; dryrun_multichip runs (subprocess —
it reconfigures the JAX backend)."""

import subprocess
import sys
import os

import pytest


def test_entry_returns_jittable(monkeypatch):
    import jax

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    # Lowering (abstract trace) is enough to prove jittability on CPU;
    # execution happens in the driver's compile check.
    jax.jit(fn).lower(*args)


def test_dryrun_multichip_subprocess():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
