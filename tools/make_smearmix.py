# -*- coding: utf-8 -*-
"""Generate the synthetic slit-smeared 2-population sphere dataset for
the SMEARED MC-level crossval (round 5).

All prior MC-level crossvals fit unsmeared workloads; the smearing path
itself is anchored deterministically (bitwise locs, intensities
≤7.3e-10 — test_crossval_smearing_path).  This dataset lets the running
reference and our engine each fit a slit-smeared curve END TO END, so
the crossval covers the composition smearing × MC engine.

The observed curve IS the slit-smeared model curve: two monodisperse
sphere populations, each smeared with the same trapezoidal slit profile
both pipelines implement (reference: sasconfig.py:122-149 setIntPoints +
sasmodel.py:46-73 2·trapz; ours: the (ff²·w)@smear_w contraction, proven
≤7.3e-10 against it), plus a flat background.  Both forward models can
therefore represent the data to ~1e-9 — far below the declared 1 % σ —
and χ²≤1 is attainable by both MCs.

The no-rebin route is used by both pipelines (nBin=0, the gauss-fixture
precedent): the fit grid is the raw 120-point grid, so the synthesized
curve is exactly the curve both models evaluate (no bin-averaging
representability error).

Output: testdata/smearmix.dat (q [nm^-1], I [a.u.], sigma).
Smearing geometry (SI): trapezoid slit, umbra 0.1e9, penumbra 0.4e9,
nSteps 25 — pass `--smear 0.1e9:0.4e9` to tools/run_reference.py.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q_NM = np.logspace(np.log10(0.05), np.log10(3.0), 120)   # nm^-1
# two populations (radius_nm, weight of the SMEARED curve at q->0).
# REPRESENTABILITY constraint (cost a plateau to discover): McSAS
# contributions carry w(r)=v(r)^{4/3} each, so a weight split (W1,W2)
# at radii (R1,R2) demands n2 = 100/(1 + (W1/W2)(c2(0)/c1(0))(R2/R1)^4)
# contribs on the large population — an INTEGER >= ~3, or neither MC can
# reach chi2<=1 (the original (2.5, 0.6)/(8.0, 0.4) design needs
# n2=0.74 and both engines plateau at chi2~30).  This design lands
# n2 = 6.0 (tools/design probe, smeared-curve c2(0)/c1(0)=0.9267).
POPS = [(3.0, 0.514), (6.0, 0.486)]
R_BOX_NM = (0.5, 15.0)          # active box for both fits
SIGMA_REL = 0.01
UMBRA_SI, PENUMBRA_SI = 0.1e9, 0.4e9
N_STEPS = 25


def _sphere_ff(qr):
    """3(sin x - x cos x)/x^3 (reference models/sphere.py:55-63)."""
    qr = np.asarray(qr, np.float64)
    return 3.0 * (np.sin(qr) - qr * np.cos(qr)) / qr ** 3


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata", "smearmix.dat")
    # pass 1: provisional file so the loader hands back the exact locs /
    # smear_w it will use at fit time (they depend only on q + config)
    np.savetxt(out, np.column_stack(
        [Q_NM, np.ones_like(Q_NM), np.ones_like(Q_NM)]), fmt="%.9e")

    from mcsas_tpu import data as mtdata
    from mcsas_tpu.data import DataConfig, TrapezoidSmearing

    d = mtdata.load(out, config=DataConfig(
        n_bin=0, smearing=TrapezoidSmearing(
            do_smear=True, n_steps=N_STEPS,
            umbra=UMBRA_SI, penumbra=PENUMBRA_SI)))
    assert d.locs is not None and len(d.q) == len(Q_NM)

    # pass 2: the smeared population curves on that grid (locs is SI;
    # qr is unit-free so radius in meters is exact float64 math)
    curves = []
    for r_nm, w in POPS:
        ff2 = _sphere_ff(d.locs * (r_nm * 1e-9)) ** 2
        c = ff2 @ d.smear_w
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
