# -*- coding: utf-8 -*-
"""mcsas_tpu — TPU-native Monte Carlo size-distribution retrieval for
small-angle scattering, a ground-up JAX/XLA rebuild of the capabilities of
BAMresearch/McSAS."""

__version__ = "0.1.0"
