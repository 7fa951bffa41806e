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


def _cyl_engine(sphere_data, use_pallas, **kw):
    base = dict(num_reps=4, num_contribs=50, convergence_criterion=2.0,
                max_iterations=200000, chunk_steps=64,
                candidates_per_step=8, seed=7, max_retries=0,
                use_pallas=use_pallas)
    base.update(kw)
    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (1e-10, 5e-8)},
        fixed={"useAspect": 1.0, "aspect": 10.0})
    return McSASEngine(sphere_data, bound, McSASConfig(**base))


def test_prefetch_matches_scan_exactly(sphere_data, monkeypatch):
    """The prefetch kernel consumes the SAME threefry proposal stream and
    the SAME intensity_row evaluations as the XLA scan path — after equal
    step budgets the ensembles must agree bitwise (the only difference,
    solve reduction association, changes no accept decision here)."""
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    ep = _cyl_engine(sphere_data, "on")
    ex = _cyl_engine(sphere_data, "off")
    assert ep.uses_prefetch and ep.uses_table and not ep.uses_pallas
    assert not ex.uses_prefetch
    from mcsas_tpu.ops import mc_kernel
    assert mc_kernel.prefetch_seg_steps(ep) == 64  # = chunk_steps here
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri_p = ri_x = jnp.zeros((), jnp.int32)
    for _ in range(2):
        st_p, ri_p = ep._chunk_batch(st_p, ri_p)
        st_x, ri_x = ex._chunk_batch(st_x, ri_x)
    assert int(ri_p) == int(ri_x)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.array_equal(np.asarray(st_p.n_moves),
                          np.asarray(st_x.n_moves))
    np.testing.assert_allclose(np.asarray(st_p.conval),
                               np.asarray(st_x.conval), rtol=1e-5)
    nq = ex.consts.y.shape[0]
    np.testing.assert_allclose(np.asarray(st_p.ft)[:, :nq],
                               np.asarray(st_x.ft), rtol=2e-4)
    # pad lanes stay zero in the bank
    assert np.asarray(st_p.ibank)[:, :, nq:].sum() == 0.0


def test_auto_mode_mosaic_runtime_fallback(sphere_data, monkeypatch):
    """'auto' must DEGRADE on a Mosaic compile failure surfacing at run
    time (engine.run's wrapper), not crash the fit; 'on' stays a force
    override and re-raises.  The real failure needs a backend bug (e.g.
    the pre-fix single-rep multi_reduction), so it is simulated here."""
    class FakeMosaic(RuntimeError):
        pass

    def boom(*a, **k):
        raise FakeMosaic(
            "Mosaic failed to compile TPU kernel: Not implemented")

    cfg = dict(num_reps=2, max_iterations=500,
               convergence_criterion=1e9, show_incomplete=True)
    eng = make_engine(sphere_data, "on", **cfg)
    assert eng.uses_pallas
    # simulate a TPU 'auto' engine that selected the kernel tier
    eng.cfg = eng.cfg.replace(use_pallas="auto")
    monkeypatch.setattr(eng, "_run_attempts", boom)
    res = eng.run()
    assert not res.used_pallas          # completed on the XLA scan path
    assert res.conval.shape == (2,)
    assert np.isfinite(res.conval).all()

    eng2 = make_engine(sphere_data, "on", **cfg)
    monkeypatch.setattr(eng2, "_run_attempts", boom)
    with pytest.raises(FakeMosaic):
        eng2.run()                      # 'on' re-raises

    # unrelated errors propagate even under 'auto'
    eng3 = make_engine(sphere_data, "on", **cfg)
    eng3.cfg = eng3.cfg.replace(use_pallas="auto")
    monkeypatch.setattr(
        eng3, "_run_attempts",
        lambda *a, **k: (_ for _ in ()).throw(ValueError("no")))
    with pytest.raises(ValueError):
        eng3.run()


def test_mosaic_fallback_proven_per_executable(sphere_data, monkeypatch):
    """Proven-ness is per step executable: a cached engine whose DRIVE
    launch is proven must still degrade when the standalone chunk
    executable (progress-callback path, a different XLA program)
    first-fails Mosaic — while a Mosaic-flavored error in an
    already-proven mode re-raises (runtime/watchdog failure, not a
    compile failure; restarting would silently discard the run)."""
    class FakeMosaic(RuntimeError):
        pass

    cfg = dict(num_reps=2, max_iterations=500,
               convergence_criterion=1e9, show_incomplete=True)
    eng = make_engine(sphere_data, "on", **cfg)
    eng.cfg = eng.cfg.replace(use_pallas="auto")
    eng.run()                             # proves whatever mode ran
    proven_mode = eng._active_step_mode
    assert proven_mode in eng._proven_step_modes

    def boom_in(mode):
        def boom(*a, **k):
            eng._active_step_mode = mode  # _run_attempts sets this first
            raise FakeMosaic(
                "Mosaic failed to compile TPU kernel: Not implemented")
        return boom

    # same (proven) executable: runtime failure semantics → re-raise
    monkeypatch.setattr(eng, "_run_attempts", boom_in(proven_mode))
    with pytest.raises(FakeMosaic):
        eng.run()

    # other (never-compiled) executable: compile failure → degrade
    other = "chunk" if proven_mode == "drive" else "drive"
    assert other not in eng._proven_step_modes
    monkeypatch.setattr(eng, "_run_attempts", boom_in(other))
    res = eng.run()
    assert not res.used_pallas


def test_single_rep_block(sphere_data, monkeypatch):
    """num_reps=1 (and per-device rep shards of 1 on a mesh) must keep
    both kernels alive: the one-hot row sums lower as matmuls
    (mc_kernel._onehot_rowsum) because Mosaic cannot legalize the
    (1, K)→(1, 1) vector.multi_reduction at a single-rep block
    ("Not implemented: Offset change", measured on v5e).  Interpret mode
    cannot reproduce the legalization failure itself, so this exercises
    the rewritten path at rb=1 and certifies the prefetch variant stays
    bitwise-equal to the scan; the chip-side proof is
    tools/rep_scaling.py --reps 1 (BENCHMARKS.md rep-scaling table)."""
    e1 = make_engine(sphere_data, "on", num_reps=1)
    assert e1.uses_pallas
    st = e1._init_batch(jax.random.split(jax.random.PRNGKey(3), 1))
    c0 = float(np.asarray(st.conval)[0])
    ri = jnp.zeros((), jnp.int32)
    for _ in range(2):
        st, ri = e1._chunk_batch(st, ri)
    assert float(np.asarray(st.conval)[0]) < c0
    assert int(np.asarray(st.n_moves)[0]) > 0

    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    ep = _cyl_engine(sphere_data, "on", num_reps=1)
    ex = _cyl_engine(sphere_data, "off", num_reps=1)
    assert ep.uses_prefetch
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    st_p, _ = ep._chunk_batch(st_p, ri)
    st_x, _ = ex._chunk_batch(st_x, ri)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.array_equal(np.asarray(st_p.n_moves),
                          np.asarray(st_x.n_moves))


def test_prefetch_smeared_table(refdata, monkeypatch):
    """Smeared-intensity tables ride the prefetch kernel unchanged: rows
    are baked against the dataset's own contraction, so the kernel needs
    no smearing math.  Exact agreement with the scan path."""
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    from mcsas_tpu.data import DataConfig, TrapezoidSmearing
    dc = DataConfig(smearing=TrapezoidSmearing(
        do_smear=True, n_steps=9, umbra=0.05e9, penumbra=0.2e9))
    d = data.load(refdata / "sasfit_sphere-10-1.dat", config=dc)
    bound = get_model("CylindersIsotropic").bind(
        active=("radius",), active_ranges={"radius": (1e-10, 5e-8)},
        fixed={"useAspect": 1.0, "aspect": 10.0})
    cfg = dict(num_reps=2, num_contribs=30, convergence_criterion=2.0,
               max_iterations=200000, chunk_steps=32,
               candidates_per_step=4, seed=3, max_retries=0)
    ep = McSASEngine(d, bound, McSASConfig(use_pallas="on", **cfg))
    ex = McSASEngine(d, bound, McSASConfig(use_pallas="off", **cfg))
    assert ep.uses_prefetch and ep.uses_table
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    st_p, ri_p = ep._chunk_batch(st_p, ri)
    st_x, ri_x = ex._chunk_batch(st_x, ri)
    assert int(ri_p) == int(ri_x)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.asarray(st_p.n_moves).min() >= 0


def test_prefetch_local_moves_match_scan(sphere_data, monkeypatch):
    """Local moves ride the prefetch kernel: a segment visits strictly
    distinct slots (seg <= num_contribs), so every local proposal is
    computable from the segment-start rset — the stream stays
    bitwise-identical to the XLA scan path."""
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    from mcsas_tpu.ops import mc_kernel
    # chunk_steps=64 > num_contribs=50: the segment cap must bind
    ep = _cyl_engine(sphere_data, "on", local_moves=0.5)
    ex = _cyl_engine(sphere_data, "off", local_moves=0.5)
    assert ep.uses_prefetch and ep.uses_table and not ep.uses_pallas
    assert mc_kernel.prefetch_seg_steps(ep) == 50  # = num_contribs
    keys = jax.random.split(jax.random.PRNGKey(2), 4)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri_p = ri_x = jnp.zeros((), jnp.int32)
    # key-stream alignment: each prefetch segment splits the rep key once
    # and draws seg=50 steps, so the scan side must chunk at 50 too
    ex50 = _cyl_engine(sphere_data, "off", local_moves=0.5,
                       chunk_steps=50)
    for _ in range(3):
        st_p, ri_p = ep._chunk_batch(st_p, ri_p)
        st_x, ri_x = ex50._chunk_batch(st_x, ri_x)
    assert int(ri_p) == int(ri_x)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.array_equal(np.asarray(st_p.n_moves),
                          np.asarray(st_x.n_moves))
    assert np.asarray(st_p.n_moves).min() > 0
    np.testing.assert_allclose(np.asarray(st_p.conval),
                               np.asarray(st_x.conval), rtol=1e-5)


def test_prefetch_eligibility_gates(sphere_data, monkeypatch):
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    # elementwise models take the fully fused kernel, not the prefetch
    es = make_engine(sphere_data, "on", num_reps=2)
    assert es.uses_pallas and not es.uses_prefetch


def test_prefetch_rep_blocked(sphere_data, monkeypatch):
    """Multi-block grids (rep_block < num_reps) keep per-rep state
    independent and consistent with the scan path."""
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "64")
    from mcsas_tpu.ops import mc_kernel
    ep = _cyl_engine(sphere_data, "on")
    ex = _cyl_engine(sphere_data, "off")
    chunk = mc_kernel.build_prefetch_chunk_fn(ep, rep_block=2,
                                              seg_steps=32)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri = jnp.zeros((), jnp.int32)
    st_p, ri_p = chunk(st_p, ri)
    assert int(ri_p) == 32 % 50
    # same 32 steps on the scan path: use a 32-step chunk engine
    ex32 = _cyl_engine(sphere_data, "off", chunk_steps=32)
    st_x, _ = ex32._chunk_batch(st_x, ri)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))


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


def test_prefetch_kholodenko_partial_table(refdata, monkeypatch):
    """Kholodenko's PARTIAL table (backbone tabulated, exact q-axis
    cross-section applied in the lookup) rides the prefetch kernel with
    local moves: stream stays bitwise-identical to the scan path at
    seg-aligned chunking."""
    monkeypatch.setenv("MCSAS_TPU_TABLE_RES_CAP", "32")
    from mcsas_tpu import data as mtdata
    from mcsas_tpu.ops import mc_kernel
    d = mtdata.load(refdata / "sasfit_kho-1-10-1000.dat")
    bound = get_model("Kholodenko").bind()

    def eng(mode, chunk):
        return McSASEngine(d, bound, McSASConfig(
            num_reps=2, num_contribs=40, convergence_criterion=2.0,
            max_iterations=100000, chunk_steps=chunk,
            candidates_per_step=4, seed=5, max_retries=0,
            local_moves=0.5, use_pallas=mode, table_ff="on"))

    ep = eng("on", 64)
    assert ep.uses_prefetch and ep.uses_table and not ep.uses_pallas
    seg = mc_kernel.prefetch_seg_steps(ep)
    assert seg == 40  # local moves cap the segment at num_contribs
    ex = eng("off", seg)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    st_p = ep._init_batch(keys)
    st_x = ex._init_batch(keys)
    ri_p = ri_x = jnp.zeros((), jnp.int32)
    for _ in range(3):
        st_p, ri_p = ep._chunk_batch(st_p, ri_p)
        st_x, ri_x = ex._chunk_batch(st_x, ri_x)
    assert int(ri_p) == int(ri_x)
    assert np.array_equal(np.asarray(st_p.rset), np.asarray(st_x.rset))
    assert np.array_equal(np.asarray(st_p.n_moves),
                          np.asarray(st_x.n_moves))
    assert np.asarray(st_p.n_moves).min() > 0
