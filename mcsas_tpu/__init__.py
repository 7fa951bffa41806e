# -*- coding: utf-8 -*-
"""mcsas_tpu — TPU-native Monte Carlo size-distribution retrieval for
small-angle scattering: a ground-up JAX/XLA rebuild of the capabilities of
BAMresearch/McSAS (form-free particle size distributions via accept/reject
MC over analytical form-factor models).

Quick start::

    import mcsas_tpu as mt
    result = mt.fit("mydata.csv", model="Sphere")
    mt.OutputFiles(result).write_all(plot=True)
"""

__version__ = "0.1.0"


def _setup_default_compile_cache():
    """First-compile latency in this stack is tens of seconds; a persistent
    compilation cache makes repeat runs fast across processes.  x64 is
    enabled package-wide: host-side analysis runs float64 like the
    reference, while the device hot loop requests float32 explicitly."""
    import os
    import jax
    jax.config.update("jax_enable_x64", True)
    path = os.environ.get("MCSAS_TPU_COMPILE_CACHE")
    if path is None:
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "mcsas_tpu_xla")
    if path and path.lower() != "off":
        try:
            os.makedirs(path, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", path)
            # threshold 0: behind a remote compile service the LOCAL
            # measured compile time is the RPC wrapper's, often near 0 —
            # any positive threshold can silently filter every entry
            # (a full test-suite run at 0.1 s wrote zero cache entries)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception:  # pragma: no cover - cache is best-effort
            pass


_setup_default_compile_cache()

from .config import McSASConfig                      # noqa: E402
from .data import (DataConfig, GaussianSmearing, SASData,  # noqa: E402
                   TrapezoidSmearing, from_raw, load)
from .models import (REGISTRY, get_model,  # noqa: E402
                     load_model_dir, load_model_file)
from .post.histogram import HistogramSpec            # noqa: E402
from .api import (McSASResult, OutputFiles, fit,     # noqa: E402
                  run_files)

__all__ = [
    "__version__", "McSASConfig", "DataConfig", "SASData",
    "TrapezoidSmearing", "GaussianSmearing", "from_raw", "load",
    "REGISTRY", "get_model", "load_model_file", "load_model_dir",
    "HistogramSpec",
    "McSASResult", "OutputFiles", "fit", "run_files",
]
