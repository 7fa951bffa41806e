# -*- coding: utf-8 -*-
"""Generate the synthetic 2-population cylinder dataset used for the
joint multi-parameter MC crossval (VERDICT r4 #2).

The reference ships no cylinder dataset, so the crossval target is
synthesized here: two monodisperse CylindersIsotropic populations plus a
flat background, evaluated with THIS package's form factor at the
reference's own quadrature rule (intDiv=100 trapezoid with endpoint
limits — crossvalidated <=1e-6 vs the running reference's
models/cylindersisotropic.py:50-90 in test_crossval_formfactor_curves).
Both MC implementations therefore fit a curve that is exactly
representable under the rule each uses in its hot loop (the crossval
engine run sets table_ff='off' so it rides the same intDiv=100 rule
instead of the converged-quadrature table).

The curve is noiseless with a declared 2 % uncertainty column (the
pattern of the reference's own sasfit_* simulated fixtures): reduced
chi^2 <= 1 is then comfortably reachable by both engines, and the
comparison measures distribution-reconstruction agreement, not noise.

Output: testdata/cylmix.dat  (q [nm^-1], I [a.u.], sigma) — 3-column
whitespace ASCII, parseable by both loaders' default dialect.

Also prints the intDiv=100-vs-converged(n=801) rule mismatch over the
active (R, L) box, recording whether the table tier would see the same
curve (decides table_ff for the crossval config).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import mcsas_tpu  # noqa: F401  (enables x64)

jax.config.update("jax_default_device", jax.devices("cpu")[0])

from mcsas_tpu.models.cylinders import _cyl_iso_ff_ab  # noqa: E402

# ----------------------------------------------------------------- config
# q range chosen so qR stays <= ~12 over the active radius range: the
# reference's intDiv=100 trapezoid is accurate there (its discretization
# noise grows at qR in [10, 100], see _cyl_iso_table_factory docstring).
Q_NM = np.logspace(np.log10(0.03), np.log10(1.5), 180)   # nm^-1
# two populations (radius_nm, length_nm, intensity weight at q->0)
POPS = [(2.0, 50.0, 0.6), (5.0, 20.0, 0.4)]
# active box the crossval fit will search (radius 0.5-8 nm, length
# 5-150 nm): true values sit comfortably inside
R_BOX_NM = (0.5, 8.0)
L_BOX_NM = (5.0, 150.0)
# exactly the fuMin floor (both pipelines clamp sigma to 1% of I), the
# most demanding declared uncertainty that survives the floor: chi^2<=1
# then requires ~1% RMS agreement, genuinely pinning both populations
# (at 2% a random initial population converged in ~400 iterations —
# too weak to constrain the reconstruction)
SIGMA_REL = 0.01


def ff2(q_nm, r_nm, l_nm, n):
    """Unnormalized ff^2 at the given rule (q in nm^-1 — the invariants
    a=qR, b=qL are unit-free, so nm-scale inputs are exact)."""
    a = np.asarray(q_nm, np.float64) * r_nm
    b = np.asarray(q_nm, np.float64) * l_nm
    f = np.asarray(_cyl_iso_ff_ab(a, b, n, np.dtype(np.float64)))
    return f * f


def main():
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "testdata", "cylmix.dat")
    curves = []
    for r, ll, w in POPS:
        c = ff2(Q_NM, r, ll, 100)
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

    # rule-mismatch audit over the active box
    rng = np.random.default_rng(7)
    worst = 0.0
    for _ in range(64):
        r = np.exp(rng.uniform(np.log(R_BOX_NM[0]), np.log(R_BOX_NM[1])))
        ll = np.exp(rng.uniform(np.log(L_BOX_NM[0]), np.log(L_BOX_NM[1])))
        a = ff2(Q_NM, r, ll, 100)
        b = ff2(Q_NM, r, ll, 801)
        worst = max(worst, float(np.max(np.abs(a - b) / b)))
    print(f"intDiv=100 vs n=801 rule mismatch over active box: "
          f"max rel {worst:.3e}")


if __name__ == "__main__":
    main()
