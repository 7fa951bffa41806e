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
jax.config.update("jax_compilation_cache_dir", str(_REPO / ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import pytest  # noqa: E402

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
