# -*- coding: utf-8 -*-
"""Result plotting: the reference's double-panel figure — log-log data+fit
with background level, size-distribution bars with uncertainty and the
minimum-observability line, and a stats box — rendered headlessly.

Reference: PlotResults / plot1D / plotHist / plotStats
(src/mcsas/mcsas/plotting.py:80-643).  The reference pushes interactive Qt
windows through a subprocess to avoid blocking (mcsas.py:693-708); here
plotting is a pure host-side function on the Agg backend writing a PDF/PNG
(interactive display optional), so no process gymnastics are needed.
"""
from __future__ import annotations

import logging
from typing import Optional

import numpy as np

import matplotlib
matplotlib.use("Agg", force=False)
import matplotlib.pyplot as plt  # noqa: E402

log = logging.getLogger(__name__)


def _format_moments_box(hist) -> str:
    m = hist.moments
    rows = [("total", m.total), ("mean", m.mean), ("var", m.variance),
            ("skew", m.skew), ("kurt", m.kurtosis)]
    return "\n".join(f"{name:>6s}: {v[0]:.3e} ± {v[1]:.1e}"
                     for name, v in rows)


def plot_results(result, output_filename: Optional[str] = None,
                 axis_margin: float = 0.3, auto_close: bool = True,
                 show: bool = False):
    """Draws the fit panel plus one histogram panel per histogram spec.

    Returns the matplotlib Figure (closed if auto_close and not shown).
    """
    hists = result.histograms
    n_panels = 1 + len(hists)
    fig, axes = plt.subplots(1, n_panels,
                             figsize=(5.0 * n_panels, 4.2))
    axes = np.atleast_1d(axes)

    # --- fit panel (reference plot1D: plotting.py:413-486) --------------
    ax = axes[0]
    d = result.data
    q_disp = d.q * 1e-9          # show in nm⁻¹ like the reference UI
    ax.errorbar(q_disp, d.f, yerr=d.fu, fmt=".", color="#666666",
                markersize=3, elinewidth=0.5, label="data")
    ax.plot(q_disp, result.fit_measval_mean, "r-", lw=1.5, label="MC fit")
    lo = result.fit_measval_mean - result.fit_measval_std
    hi = result.fit_measval_mean + result.fit_measval_std
    ax.fill_between(q_disp, lo, hi, color="r", alpha=0.2, lw=0)
    bg_mean, _ = result.background
    if bg_mean > 0:
        ax.axhline(bg_mean, color="b", ls="--", lw=1,
                   label="background")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("q (nm$^{-1}$)")
    ax.set_ylabel("I (m sr)$^{-1}$")
    ax.legend(loc="lower left", fontsize=8)
    ax.set_title(d.title or "fit", fontsize=9)

    # --- histogram panels (reference plotHist: plotting.py:510-604) -----
    for ax, h in zip(axes[1:], hists):
        unit = result.bound.model.spec(h.spec.param).unit
        x = unit.to_display(h.x_mean)
        width = unit.to_display(h.x_width)
        ax.bar(x, h.bins.mean, width=0.9 * width, yerr=h.bins.std,
               color="orange", edgecolor="k", linewidth=0.3,
               error_kw=dict(elinewidth=0.7), label=h.spec.yweight)
        ax.plot(x, h.observability, "r--", lw=1.2,
                label="min. observability")
        if h.spec.xscale == "log":
            ax.set_xscale("log")
        ax.set_xlabel(f"{h.spec.param} ({unit.display})")
        ax.set_ylabel(f"{h.spec.yweight} fraction")
        ax.legend(fontsize=7)
        ax.text(0.98, 0.97, _format_moments_box(h),
                transform=ax.transAxes, fontsize=6, family="monospace",
                ha="right", va="top",
                bbox=dict(boxstyle="round", fc="w", alpha=0.7))

    fig.tight_layout()
    if output_filename:
        fig.savefig(output_filename)
        log.info("wrote plot to %s", output_filename)
    if show:  # pragma: no cover - interactive
        plt.show()
    elif auto_close:
        plt.close(fig)
    return fig


def plot_series_stats(series: dict, output_filename: Optional[str] = None,
                      auto_close: bool = True):
    """Mean ± std of each histogram range across a file series
    (reference PlotSeriesStats: plotting.py:606-643)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for (param, lo, hi, weight), entries in series.items():
        labels = [str(t) for t, _ in entries]
        means = [f[2] for _, f in entries]      # mean field
        stds = [f[3] for _, f in entries]       # meanStd field
        ax.errorbar(range(len(entries)), means, yerr=stds, marker="o",
                    label=f"{param} [{lo:g},{hi:g}] {weight}")
        ax.set_xticks(range(len(entries)))
        ax.set_xticklabels(labels, rotation=45, fontsize=7)
    ax.set_ylabel("distribution mean")
    ax.legend(fontsize=7)
    fig.tight_layout()
    if output_filename:
        fig.savefig(output_filename)
    if auto_close:
        plt.close(fig)
    return fig
