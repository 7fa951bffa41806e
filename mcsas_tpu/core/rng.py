# -*- coding: utf-8 -*-
"""Proposal generators: counter-based (threefry) replacements for the
reference's global-state numpy RNGs.

Distribution semantics preserved (reference:
src/mcsas/bases/algorithm/numbergenerator.py:28-31,168-189 and the range
scaling at bases/algorithm/parameter.py:66-84):

- ``uniform``:   lo + U(0,1)·(hi−lo)
- ``logdecN``:   lo + g·(hi−lo) with g = (10^U(0,N) − 1)/10^N — inverse-log
  probability over N decades ("RandomExponential{1,2,3}")
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_DECADES = {"logdec1": 1.0, "logdec2": 2.0, "logdec3": 3.0}


def draw_unit(key, generators, count=None, dtype=jnp.float32):
    """Draws unit-interval samples, one column per generator.

    Returns shape (P,) if count is None else (count, P).
    """
    p = len(generators)
    shape = (p,) if count is None else (count, p)
    un = jax.random.uniform(key, shape, dtype=dtype)
    cols = []
    for i, g in enumerate(generators):
        col = un[..., i]
        if g in _DECADES:
            n = _DECADES[g]
            col = (10.0 ** (col * n) - 1.0) / (10.0 ** n)
        elif g != "uniform":
            raise ValueError(f"unknown generator {g!r}")
        cols.append(col)
    return jnp.stack(cols, axis=-1)


def scale_to_ranges(unit_samples, ranges, dtype=jnp.float32):
    """Maps unit samples (…, P) onto the per-parameter (lo, hi) ranges."""
    lo = jnp.asarray([r[0] for r in ranges], dtype)
    hi = jnp.asarray([r[1] for r in ranges], dtype)
    return unit_samples * (hi - lo) + lo


def draw_params(key, bound, count=None, dtype=jnp.float32):
    """Draws proposal parameter vectors for a BoundModel's active set."""
    un = draw_unit(key, bound.generators, count=count, dtype=dtype)
    return scale_to_ranges(un, bound.ranges, dtype=dtype)
