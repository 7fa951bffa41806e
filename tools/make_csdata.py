# -*- coding: utf-8 -*-
"""Generate the synthetic 2-population core-shell-sphere dataset used
for the second joint multi-parameter MC crossval (round 5; the first is
the cylinder radius x length fit, tools/make_cyldata.py).

The reference ships no core-shell dataset, so the crossval target is
synthesized: two monodisperse SphericalCoreShell populations plus a flat
background.  Unlike the cylinder case there is no quadrature rule to
match — the Spherical Shell III form factor (SASfit §3.1.4; reference:
models/sphericalcoreshell.py:50-69) is ANALYTIC and the two
implementations agree to float64 roundoff (test_crossval_formfactor_
curves: 1e-9), so both MCs fit an exactly representable curve and the
comparison measures joint (core radius, shell thickness) distribution
reconstruction only.

The curve is noiseless with a declared 1 % uncertainty column — exactly
the fuMin floor both pipelines clamp to, the most demanding declared
uncertainty that survives the floor (same reasoning as make_cyldata.py).

Output: testdata/csmix.dat  (q [nm^-1], I [a.u.], sigma) — 3-column
whitespace ASCII, parseable by both loaders' default dialect.
"""
import os

import numpy as np

# ----------------------------------------------------------------- config
# q range: q(R+t) reaches ~32 for the larger population — several ff
# oscillations, pinning both the outer radius (fringe period) and the
# core/shell split (fringe depth) at the 1 % sigma level.
Q_NM = np.logspace(np.log10(0.05), np.log10(3.0), 180)   # nm^-1
# two populations (core_radius_nm, shell_thickness_nm, weight at q->0)
POPS = [(3.0, 1.0, 0.6), (8.0, 2.5, 0.4)]
# active box the crossval fit will search; true values well inside
R_BOX_NM = (1.0, 15.0)
T_BOX_NM = (0.3, 5.0)
SIGMA_REL = 0.01
# the SLD defaults shared by both implementations (reference
# sphericalcoreshell.py:31-42 == mcsas_tpu ellipsoids.py SphericalCoreShell)
ETA_C, ETA_S, ETA_SOL = 3.16e-6, 2.53e-6, 0.0


def _k(qr):
    """3(sin x - x cos x)/x^3, the normalized sphere amplitude."""
    qr = np.asarray(qr, np.float64)
    return 3.0 * (np.sin(qr) - qr * np.cos(qr)) / qr ** 3


def ff2(q_nm, r_nm, t_nm):
    """Unnormalized ff^2 (qr is unit-free, so nm-scale inputs are exact;
    the overall eta scale cancels under the q->0 weight normalization)."""
    vratio = r_nm ** 3 / (r_nm + t_nm) ** 3
    f = (ETA_S - ETA_SOL) * _k(np.asarray(q_nm) * (r_nm + t_nm)) \
        - vratio * (ETA_S - ETA_C) * _k(np.asarray(q_nm) * r_nm)
    return f * f


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata", "csmix.dat")
    curves = []
    for r, t, w in POPS:
        c = ff2(Q_NM, r, t)
        curves.append(w * c / c[0])          # weight fixed at q->0
    intensity = np.sum(curves, axis=0)
    intensity *= 100.0 / intensity.max()     # a.u., max 100
    bg = 0.5 * intensity.min()
    intensity = intensity + bg
    sigma = SIGMA_REL * intensity
    np.savetxt(out, np.column_stack([Q_NM, intensity, sigma]),
               fmt="%.9e")
    print(f"wrote {out}: {len(Q_NM)} pts, bg={bg:.4g}, "
          f"I range [{intensity.min():.4g}, {intensity.max():.4g}]")


if __name__ == "__main__":
    main()
