# -*- coding: utf-8 -*-
"""fit() defaulting of unbounded active ranges and engine range guards."""
import numpy as np
import pytest

import mcsas_tpu as mt
from mcsas_tpu.api import _default_unbounded_ranges
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.models import get_model


@pytest.fixture(scope="module")
def sphere_data(refdata):
    return mt.load(refdata / "sasfit_sphere-10-1.dat")


def test_engine_rejects_infinite_range(sphere_data):
    bound = get_model("CylindersIsotropic").bind()   # radius hi = inf
    with pytest.raises(ValueError, match="not finite"):
        McSASEngine(sphere_data, bound,
                    McSASConfig(num_contribs=5, num_reps=1))


def test_fit_defaults_from_size_estimate(sphere_data):
    bound = get_model("CylindersIsotropic").bind()
    fixed = _default_unbounded_ranges(bound, sphere_data)
    lo, hi = fixed.ranges[0]
    est = sphere_data.spherical_size_estimate
    assert np.isfinite(hi)
    assert hi == pytest.approx(est[1])
    assert lo == pytest.approx(est[0])


def test_finite_ranges_untouched(sphere_data):
    bound = get_model("Sphere").bind()
    assert _default_unbounded_ranges(bound, sphere_data) is bound


def test_fit_runs_with_defaulted_range(sphere_data):
    cfg = McSASConfig(num_contribs=8, num_reps=1, max_iterations=200,
                      chunk_steps=100, seed=0, max_retries=0,
                      show_incomplete=True)
    res = mt.fit(sphere_data, model="LMADenseSphere", cfg=cfg)
    assert np.all(np.isfinite(res.engine.conval))
