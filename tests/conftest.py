# -*- coding: utf-8 -*-
"""Test harness configuration.

Tests run on the CPU backend with 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware, and with x64 enabled so
golden-curve validation happens at full precision (the engine is explicitly
float32 everywhere it matters, so this also catches any implicit-dtype
leaks).
"""
import os
import pathlib

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin ignores JAX_PLATFORMS; pin the default device to the
# CPU backend explicitly so tests never touch the (single, slow-to-attach)
# real chip and the 8 virtual CPU devices are used for sharding tests.
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:  # no cpu backend — fall back to whatever exists
    pass

_REPO = pathlib.Path(__file__).resolve().parent.parent
# The suite shares the PACKAGE's persistent compile cache: importing
# mcsas_tpu re-points jax_compilation_cache_dir to this path
# (mcsas_tpu/__init__.py::_setup_default_compile_cache), so a repo-local
# dir here would be dead config — only programs compiled before the
# first mcsas_tpu import would ever land in it (measured 2026-08-19: a
# full suite run left 3 entries in a repo-local dir and ~950 in the
# package one).  Resolution mirrors _setup_default_compile_cache.
_CACHE_DIR = os.environ.get("MCSAS_TPU_COMPILE_CACHE")
if _CACHE_DIR is None:
    _CACHE_DIR = str(pathlib.Path.home() / ".cache" / "mcsas_tpu_xla")
# exactly the package's gate: '' and 'off' both disable; the dir is
# created here too so PRE-import compiles can land in it
if _CACHE_DIR and _CACHE_DIR.lower() != "off":
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
# threshold 0, NOT 0.1: the remote compile service makes the locally
# measured compile time the RPC wrapper's (often <0.1 s), so a nonzero
# threshold silently filters every entry — a full suite run at 0.1 s
# wrote 0 cache entries (measured 2026-08-18)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import pytest  # noqa: E402


def _compile_service_alive(timeout: float) -> bool:
    """Probe ONE trivial jit in a subprocess with a hard timeout.

    All XLA compilation in this sandbox is REMOTE (CLAUDE.md): when the
    compile service is down, the first ``jax.jit`` call of any process
    hangs indefinitely — the suite would sit forever at the first
    compile instead of failing.  A subprocess probe (fresh process, CPU
    platform, same persistent cache) turns that hang into a bounded,
    explainable skip.  A cached executable counts as alive: the suite
    only needs compiles *served*, whether by the service or the cache.
    """
    import subprocess
    import sys
    env = dict(os.environ)
    # same cache the suite uses (the package default — see _CACHE_DIR
    # above), so a warm cache passes the probe even during an outage —
    # but the probe program must NOT be one the suite compiles (a hit
    # would prove nothing about uncached programs), so it uses a
    # shape/op combination nothing else builds
    cache_cfg = (
        "jax.config.update('jax_compilation_cache_dir', "
        f"{_CACHE_DIR!r});" if _CACHE_DIR.lower() != "off" else "")
    probe = (
        "import jax, jax.numpy as jnp;"
        "jax.config.update('jax_default_device', jax.devices('cpu')[0]);"
        + cache_cfg +
        # threshold 0 or the probe's own compile is never persisted
        # (remote-compile RPC wrapper times are <0.1 s) and the
        # warm-cache-during-outage design below never engages
        "jax.config.update("
        "'jax_persistent_cache_min_compile_time_secs', 0.0);"
        "print(jax.jit(lambda a: (a * 3 + 1).sum())(jnp.ones((17,))))"
    )
    try:
        r = subprocess.run([sys.executable, "-c", probe], env=env,
                           timeout=timeout, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if os.environ.get("MCSAS_TPU_SKIP_COMPILE_PROBE") != "1":
    _probe_s = float(os.environ.get("MCSAS_TPU_COMPILE_PROBE_S", "90"))
    if not _compile_service_alive(_probe_s):
        pytest.exit(
            "remote XLA compile service unreachable (a trivial CPU jit "
            f"did not finish within {_probe_s:.0f}s in a subprocess "
            "probe) — the suite would hang at its first compile. "
            "Re-run when the service is back, or set "
            "MCSAS_TPU_SKIP_COMPILE_PROBE=1 to bypass the probe.",
            returncode=2)

# golden data ships with the repo (testdata/ — measurement *data*, not
# code, copied from the reference's published test datasets) so the
# suite runs in a bare checkout; the reference tree is the fallback
_BUNDLED = _REPO / "testdata"
REFDATA = (_BUNDLED if _BUNDLED.is_dir()
           else pathlib.Path("/root/reference/testdata"))
_BUNDLED_MODELS = _BUNDLED / "models"
REFMODELDATA = (_BUNDLED_MODELS if _BUNDLED_MODELS.is_dir()
                else pathlib.Path(
                    "/root/reference/src/mcsas/models/testData"))


@pytest.fixture(scope="session")
def refdata():
    if not REFDATA.is_dir():
        pytest.skip("golden testdata not available")
    return REFDATA


@pytest.fixture(scope="session")
def refmodeldata():
    if not REFMODELDATA.is_dir():
        pytest.skip("golden model testData not available")
    return REFMODELDATA
