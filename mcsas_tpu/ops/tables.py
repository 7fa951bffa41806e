# -*- coding: utf-8 -*-
"""Scale-invariant form-factor tables: fit-grade evaluation for
quadrature-heavy models.

The orientation/propagator integrals of the quadrature models depend on q
and the size parameters only through one or two *scale-invariant* products
(e.g. the isotropic cylinder's ff is a pure function of (qR, qL);
reference integrand: src/mcsas/models/cylindersisotropic.py:50-90).  The
MC hot loop therefore never needs to re-integrate: the invariant plane is
tabulated ONCE per engine on a log-log grid with the model's exact rule,
and every proposal row becomes a bilinear texture lookup — a ~100x
per-proposal FLOP reduction that turns these models from
transcendental-bound into dispatch-bound.

Accuracy contract: this is the same "fit-grade" tier as ``ff_fast``
(engine.py:156-160) — the float32 MC loop trades ~1e-3 kernel accuracy
for throughput, and all float64 analysis (post-processing, observability,
final scaling) re-evaluates the exact ``ff``.

The table is built by one jitted evaluation whose *shapes* are static
(grids are runtime arguments), so the builder executable is compiled once
and shared across datasets/ranges via the persistent cache.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LogTable2D(NamedTuple):
    """A log-log-gridded 2D table of a non-negative function f(a, b).

    ``values[i, j] = f(exp(la0 + i*dla), exp(lb0 + j*dlb))``.
    The axis metadata are static Python floats so the interpolation
    compiles to pure arithmetic + two clamped gathers.
    """
    values: jnp.ndarray          # (n_a, n_b)
    la0: float
    dla: float
    lb0: float
    dlb: float

    @property
    def n_a(self) -> int:
        return self.values.shape[0]

    @property
    def n_b(self) -> int:
        return self.values.shape[1]


def log_grid(lo: float, hi: float, n: int) -> np.ndarray:
    """Log-spaced grid; degenerate ranges widen to a factor-2 bracket so
    the interpolation stays well-defined."""
    lo = max(float(lo), 1e-300)
    hi = max(float(hi), lo)
    if hi / lo < 1.0001:
        lo, hi = lo / 2.0, hi * 2.0
    return np.geomspace(lo, hi, n)


def from_grids(values, a_grid: np.ndarray, b_grid: np.ndarray,
               dtype=jnp.float32) -> LogTable2D:
    la = np.log(a_grid)
    lb = np.log(b_grid)
    return LogTable2D(
        values=jnp.asarray(values, dtype),
        la0=float(la[0]), dla=float((la[-1] - la[0]) / (len(la) - 1)),
        lb0=float(lb[0]), dlb=float((lb[-1] - lb[0]) / (len(lb) - 1)))


def interp2d(table: LogTable2D, a, b):
    """Bilinear interpolation at (a, b), clamped to the table domain.

    a and b must be broadcast-compatible; the result has their broadcast
    shape and the table's dtype.
    """
    dt = table.values.dtype
    a = jnp.asarray(a, dt)
    b = jnp.asarray(b, dt)
    fa = (jnp.log(jnp.maximum(a, 1e-300)) - table.la0) / table.dla
    fb = (jnp.log(jnp.maximum(b, 1e-300)) - table.lb0) / table.dlb
    fa = jnp.clip(fa, 0.0, table.n_a - 1.000001)
    fb = jnp.clip(fb, 0.0, table.n_b - 1.000001)
    ia = jnp.floor(fa).astype(jnp.int32)
    ib = jnp.floor(fb).astype(jnp.int32)
    wa = fa - ia
    wb = fb - ib
    flat = table.values.reshape(-1)
    base = ia * table.n_b + ib
    v00 = jnp.take(flat, base, mode="clip")
    v01 = jnp.take(flat, base + 1, mode="clip")
    v10 = jnp.take(flat, base + table.n_b, mode="clip")
    v11 = jnp.take(flat, base + table.n_b + 1, mode="clip")
    return ((1 - wa) * ((1 - wb) * v00 + wb * v01)
            + wa * ((1 - wb) * v10 + wb * v11))


_TABLE_CACHE = {}


class ParamTable(NamedTuple):
    """Rows of a function f(params, q_grid) over a log-spaced parameter
    grid, with the fit-grid q axis exact (no q interpolation).

    ``values[flat(j1..jP)] = f((exp(l0_k + j_k*dl_k))_k, q_grid)``.
    The lookup per proposal is a multilinear blend of 2^P *row* gathers —
    on TPU a row gather (`take(axis=0)`) is ~40x faster in-graph than the
    per-element gather a (q, param)-invariant texture needs.
    """
    values: jnp.ndarray                    # (n_rows, Nq)
    axes: tuple                            # ((l0, dl, n), ...) per param

    @property
    def n_q(self) -> int:
        return self.values.shape[1]


def build_param_table(row_fn, grids, dtype=jnp.float32, block: int = 256,
                      cache_key=None) -> ParamTable:
    """Evaluates ``row_fn(vals (P,)) -> (Nq,)`` over the cartesian product
    of the log-spaced *grids* (blockwise, one jitted vmap executable).

    *cache_key* memoizes the built table within the process.
    """
    grids = [np.asarray(g, np.float64) for g in grids]
    if cache_key is not None:
        key = (cache_key, tuple((len(g), float(g[0]), float(g[-1]))
                                for g in grids), jnp.dtype(dtype).name)
        hit = _TABLE_CACHE.get(key)
        if hit is not None:
            return hit
    if grids:
        mesh = np.meshgrid(*grids, indexing="ij")
        pts = np.stack([m.ravel() for m in mesh], axis=-1)
    else:
        pts = np.zeros((1, 0))
    n_rows = len(pts)
    pad = (-n_rows) % block
    if pad:
        pts = np.concatenate([pts, np.repeat(pts[-1:], pad, axis=0)])
    fn = jax.jit(jax.vmap(row_fn))
    rows = [fn(jnp.asarray(pts[i:i + block], dtype))
            for i in range(0, len(pts), block)]
    values = jnp.concatenate(rows, axis=0)[:n_rows]
    axes = []
    for g in grids:
        lg = np.log(g)
        dl = float((lg[-1] - lg[0]) / max(len(g) - 1, 1))
        axes.append((float(lg[0]), dl if dl > 0 else 1.0, len(g)))
    table = ParamTable(values=values, axes=tuple(axes))
    if cache_key is not None:
        _TABLE_CACHE[key] = table
    return table


def lookup_param_table(table: ParamTable, pvals):
    """Multilinear row blend at scalar parameter values ``pvals`` (one per
    table axis, traced scalars); returns the (Nq,) row.  Clamped to the
    table domain."""
    dt = table.values.dtype
    idx0 = jnp.zeros((), jnp.int32)
    stride = 1
    corners = [(idx0, jnp.ones((), dt))]
    # build corner (index, weight) pairs axis by axis, last axis fastest
    for (l0, dl, n), v in zip(reversed(table.axes), reversed(list(pvals))):
        if n == 1:
            stride *= n
            continue
        f = (jnp.log(jnp.maximum(jnp.asarray(v, dt), 1e-300)) - l0) / dl
        f = jnp.clip(f, 0.0, n - 1.000001)
        i = jnp.floor(f).astype(jnp.int32)
        w = (f - i).astype(dt)
        corners = [(c + i * stride, cw * (1.0 - w)) for c, cw in corners] \
            + [(c + (i + 1) * stride, cw * w) for c, cw in corners]
        stride *= n
    out = None
    for c, cw in corners:
        row = jnp.take(table.values, c, axis=0, mode="clip") * cw
        out = row if out is None else out + row
    return out


def build_table(core_fn, a_grid: np.ndarray, b_grid: np.ndarray,
                dtype=jnp.float32, block: int = 64,
                cache_key=None) -> LogTable2D:
    """Evaluates ``core_fn(a[:, None], b[None, :]) -> (B, n_b)`` blockwise
    over the log grids and wraps the result.

    One jitted executable per (block, n_b) shape — grids are runtime
    arguments, so the compile is shared across ranges/datasets via the
    persistent cache.  *cache_key* additionally memoizes the built table
    within the process (engines over the same model/ranges are frequent
    in tests and series fits).
    """
    if cache_key is not None:
        key = (cache_key, len(a_grid), len(b_grid),
               float(a_grid[0]), float(a_grid[-1]),
               float(b_grid[0]), float(b_grid[-1]), jnp.dtype(dtype).name)
        hit = _TABLE_CACHE.get(key)
        if hit is not None:
            return hit
    n_a = len(a_grid)
    pad = (-n_a) % block
    a_pad = np.concatenate([a_grid, np.full(pad, a_grid[-1])]) if pad \
        else a_grid
    fn = jax.jit(core_fn)
    bg = jnp.asarray(b_grid, dtype)[None, :]
    rows = [fn(jnp.asarray(a_pad[i:i + block], dtype)[:, None], bg)
            for i in range(0, len(a_pad), block)]
    values = jnp.concatenate(rows, axis=0)[:n_a]
    table = from_grids(values, a_grid, b_grid, dtype)
    if cache_key is not None:
        _TABLE_CACHE[key] = table
    return table


def param_product_range(bound, name_or_value) -> tuple:
    """(lo, hi) of one parameter: its sampling range if active, else the
    fixed value as a degenerate range."""
    if name_or_value in bound.active:
        return bound.ranges[bound.active.index(name_or_value)]
    for n, v in bound.fixed:
        if n == name_or_value:
            return (v, v)
    raise KeyError(name_or_value)
