# -*- coding: utf-8 -*-
"""Fused Pallas MC kernel: validated in interpreter mode on CPU against the
XLA scan path (same math, different RNG stream → statistical equivalence,
plus exact internal-consistency invariants)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcsas_tpu import data
from mcsas_tpu.config import McSASConfig
from mcsas_tpu.core.engine import McSASEngine
from mcsas_tpu.core.fitcore import solve_scale_bg
from mcsas_tpu.models import get_model


@pytest.fixture(scope="module")
def sphere_data(refdata):
    return data.load(refdata / "sasfit_sphere-10-1.dat")


def make_engine(sphere_data, use_pallas, **kw):
    base = dict(num_contribs=40, num_reps=2, max_iterations=2000,
                chunk_steps=250, candidates_per_step=4, seed=11,
                max_retries=0, use_pallas=use_pallas)
    base.update(kw)
    return McSASEngine(sphere_data, get_model("Sphere").bind(),
                       McSASConfig(**base))


@pytest.fixture(scope="module")
def pallas_state(sphere_data):
    eng = make_engine(sphere_data, "on")
    assert eng.uses_pallas
    state = eng._init_batch(jax.random.split(jax.random.PRNGKey(7), 2))
    ri = jnp.zeros((), jnp.int32)
    states = [state]
    for _ in range(3):
        state, ri = eng._chunk_batch(state, ri)
        states.append(state)
    return eng, states, ri


def test_grid_lane_padded(pallas_state):
    eng, states, _ = pallas_state
    assert eng.grid.shape[0] % 128 == 0
    assert np.asarray(eng.consts.u)[eng.data.count:].sum() == 0.0


def test_descent_and_moves(pallas_state):
    _, states, _ = pallas_state
    convals = np.array([np.asarray(s.conval) for s in states])
    assert np.all(np.diff(convals, axis=0) <= 1e-4)
    assert convals[-1].max() < convals[0].min()
    assert np.asarray(states[-1].n_moves).min() > 0


def test_cursor_advances(pallas_state):
    eng, states, ri = pallas_state
    assert int(ri) == (3 * 250) % 40


def test_internal_consistency(pallas_state):
    """ibank rows must equal the kernel evaluated at the stored parameters;
    ft must equal the bank total; conval must equal chi2(ft)."""
    eng, states, _ = pallas_state
    s = states[-1]
    for r in range(2):
        rows = jax.vmap(
            lambda p: eng._intensity_row(eng.grid, p))(s.rset[r])
        rows_np = np.asarray(rows)
        bank_np = np.asarray(s.ibank[r])
        # rtol alone traps deep form-factor minima (elements 9+ decades
        # below the row max are pure float32 round-off); give each row an
        # atol floor scaled to its magnitude
        row_max = np.max(np.abs(bank_np), axis=1, keepdims=True)
        tol = 2e-4 * np.abs(bank_np) + 1e-6 * row_max
        err = np.abs(rows_np - bank_np)
        assert np.all(err <= tol), (
            f"rep {r}: max excess {np.max(err - tol):g}")
        ft = jnp.sum(rows, axis=0)
        sol = solve_scale_bg(ft, eng.consts, True, False)
        assert float(sol.chisqr) == pytest.approx(float(s.conval[r]),
                                                  rel=5e-3)


def test_params_within_range(pallas_state):
    eng, states, _ = pallas_state
    rset = np.asarray(states[-1].rset)
    lo, hi = eng.bound.ranges[0]
    assert rset.min() >= lo - 1e-12
    assert rset.max() <= hi * (1 + 1e-6)


def test_full_run_matches_xla_statistically(sphere_data):
    """Same config, pallas vs XLA path: final chi2 after a fixed proposal
    budget should land in the same range (different RNG streams)."""
    budget = dict(max_iterations=6000, chunk_steps=500,
                  candidates_per_step=4, num_contribs=40, num_reps=3,
                  show_incomplete=True)
    r_pal = make_engine(sphere_data, "on", **budget).run()
    r_xla = make_engine(sphere_data, "off", **budget).run()
    assert np.all(r_pal.n_iter == r_xla.n_iter)
    # chi2 after the same budget: within 2x of each other
    ratio = r_pal.conval.mean() / r_xla.conval.mean()
    assert 0.5 < ratio < 2.0


def test_auto_mode_off_on_cpu(sphere_data):
    eng = make_engine(sphere_data, "auto")
    # tests pin the default device to CPU → auto must choose the XLA path
    assert not eng.uses_pallas


def test_on_mode_rejects_unsupported(refdata):
    d = data.load(refdata / "sasfit_sphere-10-1.dat")
    cfg = McSASConfig(num_contribs=10, num_reps=1, use_pallas="on")
    with pytest.raises(ValueError):
        McSASEngine(d, get_model("CylindersIsotropic").bind(), cfg)


def test_logdec_generator_in_kernel(refdata):
    """GaussianChain uses the logdec1 proposal transform in-kernel."""
    d = data.load(refdata / "sasfit_gauss2-5-1.5-2-1.dat")
    cfg = McSASConfig(num_contribs=20, num_reps=1, max_iterations=500,
                      chunk_steps=250, candidates_per_step=2, seed=0,
                      max_retries=0, use_pallas="on", show_incomplete=True)
    eng = McSASEngine(d, get_model("GaussianChain").bind(), cfg)
    assert eng.uses_pallas
    res = eng.run()
    assert np.all(np.isfinite(res.conval))
    lo, hi = eng.bound.ranges[0]
    assert res.contribs.min() >= lo - 1e-15
    assert res.contribs.max() <= hi * (1 + 1e-6)


def test_rep_blocked_grid(sphere_data):
    """The kernel grids over repetition blocks when the ensemble exceeds
    VMEM: forcing 1-rep blocks (4 programs) must still descend, move,
    respect ranges, and leave every repetition's state independent."""
    from mcsas_tpu.ops import mc_kernel
    eng = make_engine(sphere_data, "on", num_reps=4)
    chunk = mc_kernel.build_chunk_fn(eng, rep_block=1)
    state = eng._init_batch(jax.random.split(jax.random.PRNGKey(9), 4))
    chi0 = np.asarray(state.conval)
    ri = jnp.zeros((), jnp.int32)
    for _ in range(3):
        state, ri = chunk(state, ri)
    chi = np.asarray(state.conval)
    assert np.all(np.isfinite(chi))
    assert np.all(chi <= chi0 + 1e-4)
    assert np.asarray(state.n_moves).min() > 0
    lo, hi = eng.bound.ranges[0]
    r = np.asarray(state.rset)
    assert r.min() >= lo - 1e-15 and r.max() <= hi * (1 + 1e-6)
    # per-block seeds: different blocks draw different proposal streams
    assert not np.array_equal(np.asarray(state.rset[0]),
                              np.asarray(state.rset[1]))
    # blocked and unblocked kernels agree statistically (same math):
    # rep-0 conval magnitudes in the same decade after equal budgets
    chunk_full = mc_kernel.build_chunk_fn(eng, rep_block=4)
    s2 = eng._init_batch(jax.random.split(jax.random.PRNGKey(9), 4))
    ri2 = jnp.zeros((), jnp.int32)
    for _ in range(3):
        s2, ri2 = chunk_full(s2, ri2)
    assert int(ri2) == int(ri)
    ratio = np.asarray(s2.conval) / chi
    assert np.all(ratio < 30) and np.all(ratio > 1 / 30)


def test_rep_block_size_divisor():
    """rep_block_size picks the largest VMEM-fitting divisor."""
    from mcsas_tpu.ops import mc_kernel

    class _Cfg:
        num_reps = 12
        num_contribs = 300
        candidates_per_step = 128

    class _Bound:
        n_active = 1

    class _Eng:
        cfg = _Cfg()
        bound = _Bound()
        grid = jnp.zeros((128,), jnp.float32)

    rb = mc_kernel.rep_block_size(_Eng())
    assert rb > 0 and 12 % rb == 0
    assert mc_kernel.fits_vmem(_Eng(), n_reps=rb)
