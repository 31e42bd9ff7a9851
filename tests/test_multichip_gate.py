"""The driver's multichip gate must pass from ANY caller environment.

Round 1 failed this gate because dryrun_multichip only forced the CPU
platform under __main__ and the driver's import-and-call hit a broken TPU
backend (MULTICHIP_r01.json ok=false). These tests pin the hermetic
behavior: the subprocess path works from an unmodified environment, and the
in-process fast path works under the test suite's spoofed 8-CPU mesh.
"""

import importlib.util
import os
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "graft_entry_for_test", os.path.join(REPO, "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_subprocess_path_passes_with_hostile_env(capfd):
    """Even when the parent env pins a TPU platform, the subprocess path
    must force CPU before any jax import in the child."""
    entry = _load_entry()
    old = {k: os.environ.get(k) for k in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        os.environ["JAX_PLATFORMS"] = "tpu"  # hostile parent env
        os.environ.pop("XLA_FLAGS", None)
        entry._dryrun_multichip_subprocess(4)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    out = capfd.readouterr().out
    assert "dryrun_multichip(4)" in out and "OK" in out


def test_inprocess_path_under_spoofed_mesh():
    import jax

    if len(jax.devices()) < 4 or jax.default_backend() != "cpu":
        pytest.skip("needs the conftest's spoofed CPU mesh")
    entry = _load_entry()
    entry.dryrun_multichip(4)  # dispatches to the in-process fast path
