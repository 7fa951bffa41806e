# -*- coding: utf-8 -*-
"""End-to-end API: fit(), result accessors, output writers, archive
round-trip, re-histogramming, CLI."""
import configparser
import glob
import os
import pickle

import numpy as np
import pytest

import mcsas_tpu as mt
from mcsas_tpu.config import McSASConfig


@pytest.fixture(scope="module")
def result(refdata):
    cfg = McSASConfig(num_contribs=30, num_reps=2, max_iterations=3000,
                      chunk_steps=1000, seed=42, max_retries=0,
                      candidates_per_step=4, show_incomplete=True)
    return mt.fit(refdata / "sasfit_sphere-10-1.dat", model="Sphere",
                  cfg=cfg)


def test_fit_runs_and_shapes(result):
    assert result.contribs.shape == (30, 1, 2)       # reference layout
    assert result.fit_measval_mean.shape == (result.data.count,)
    assert len(result.histograms) == 1
    assert result.engine.iters_per_sec > 0


def test_scaling_tuple(result):
    mean, std = result.scaling
    assert mean > 0
    assert std >= 0


def test_rehistogram_without_refit(result):
    spec = mt.HistogramSpec("radius", 1e-9, 1e-7, bin_count=25,
                            xscale="log", yweight="num")
    r2 = result.histogram([spec])
    assert len(r2.histograms) == 1
    h = r2.histograms[0]
    assert h.bins.full.shape == (25, 2)
    # engine result unchanged (no refit)
    assert r2.engine is result.engine


def test_output_files(result, tmp_path):
    out = mt.OutputFiles(result, out_dir=tmp_path)
    written = out.write_all(plot=True)
    for key in ("settings", "fit", "contributions"):
        pth = written[key]
        assert os.path.exists(pth)
    assert all(os.path.exists(p) for p in written["distributions"])
    assert all(os.path.exists(p) for p in written["statistics"])
    assert os.path.exists(written["plot"])

    # fit file columns (written in SI units like the reference writer)
    from mcsas_tpu.io import load_raw
    raw, _ = load_raw(written["fit"])
    assert raw.shape[1] == 5
    np.testing.assert_allclose(raw[:, 0], result.fit_x0, rtol=1e-5)

    # contributions pickle round-trips the reference layout
    with open(written["contributions"], "rb") as fd:
        contribs = pickle.load(fd)
    np.testing.assert_array_equal(contribs, result.contribs)

    # settings readable by configparser with reference-style keys
    cp = configparser.RawConfigParser()
    cp.read(written["settings"])
    assert cp.get("MCSAS Settings", "numContribs") == "30"
    assert cp.get("MCSAS Settings", "model") == "Sphere"


def test_archive_roundtrip(result, tmp_path):
    pytest.importorskip("h5py")
    from mcsas_tpu.io.hdf import load_archive
    out = mt.OutputFiles(result, out_dir=tmp_path)
    fn = out.write_archive()
    state = load_archive(fn)
    np.testing.assert_array_equal(state["contribs"], result.contribs)
    assert state["model"] == "Sphere"
    assert state["cfg"].num_contribs == 30
    assert state["data"].count == result.data.count
    # restored state supports re-histogramming
    from mcsas_tpu.post.histogram import histogram_all
    contribs_rfirst = np.transpose(state["contribs"], (2, 0, 1))
    bound = mt.get_model(state["model"]).bind(
        active=state["active"],
        active_ranges=dict(zip(state["active"], state["ranges"])))
    fr, hists = histogram_all(contribs_rfirst, state["data"], bound,
                              state["cfg"])
    np.testing.assert_allclose(hists[0].bins.full,
                               result.histograms[0].bins.full, rtol=1e-8)


def test_fit_accepts_path_and_default_model(refdata):
    cfg = McSASConfig(num_contribs=5, num_reps=1, max_iterations=100,
                      chunk_steps=100, seed=0, max_retries=0,
                      show_incomplete=True)
    res = mt.fit(refdata / "sasfit_sphere-10-1.dat", cfg=cfg)
    assert res.bound.model.name == "Sphere"


def test_fit_prewarm_full_pipeline(refdata):
    """fit(prewarm=True) AOT-compiles the engine launch plan AND warms
    the post pass on a dummy contribution set before running — results
    must be identical to the unwarmed fit (cold-start remedy,
    VERDICT r4 #6)."""
    cfg = McSASConfig(num_contribs=10, num_reps=2, max_iterations=400,
                      chunk_steps=200, seed=3, max_retries=0,
                      show_incomplete=True)
    path = refdata / "sasfit_sphere-10-1.dat"
    warm = mt.fit(path, cfg=cfg, prewarm=True)
    plain = mt.fit(path, cfg=cfg)
    np.testing.assert_array_equal(warm.engine.contribs,
                                  plain.engine.contribs)
    np.testing.assert_array_equal(warm.histograms[0].bins.full,
                                  plain.histograms[0].bins.full)


def test_fit_prewarm_once_per_cached_engine(refdata, monkeypatch):
    """Over a same-shape series, prewarm runs ONCE per cached engine —
    re-prewarming every file would re-trace the launch plan and
    re-execute the dummy post pass for nothing."""
    cfg = McSASConfig(num_contribs=10, num_reps=2, max_iterations=400,
                      chunk_steps=200, seed=7, max_retries=0,
                      show_incomplete=True)
    path = refdata / "sasfit_sphere-10-1.dat"
    mt.fit(path, cfg=cfg, prewarm=True)      # engine cached + prewarmed
    from mcsas_tpu.core.engine import McSASEngine
    calls = []
    monkeypatch.setattr(McSASEngine, "prewarm",
                        lambda self: calls.append(1))
    mt.fit(path, cfg=cfg, prewarm=True)      # same engine: no re-prewarm
    assert calls == []


def test_cli_list_models(capsys):
    from mcsas_tpu.cli import main
    # works WITHOUT a data file (round 4: filenames are nargs='*' so
    # informational flags stand alone); a fit without files still errors
    assert main(["--list-models"]) == 0
    out = capsys.readouterr().out
    assert "Sphere" in out and "Kholodenko" in out
    with pytest.raises(SystemExit) as e:
        main([])
    assert e.value.code == 2


_USER_MODEL_SRC = """
import math
from mcsas_tpu.models import ParamSpec, SASModel
from mcsas_tpu.utils.units import NM

{name} = SASModel(
    name="{name}",
    elementwise_q=True,
    doc="test plugin model",
    params=(ParamSpec("radius", NM.to_si(1.0), NM, (0.0, float("inf")),
                      active_range=NM.to_si((0.1, 100.0)),
                      generator="logdec1", is_fit=True),),
    ff=lambda q, p: (q * p["radius"]) ** -2,
    volume=lambda p: 4.0 / 3.0 * math.pi * p["radius"] ** 3,
)
"""


def test_load_model_dir(tmp_path, caplog):
    """Directory model discovery (reference FindModels semantics,
    utils/findmodels.py:73-186): recursive walk, skip private files,
    warn-and-skip broken files, priority-order the result."""
    import logging

    from mcsas_tpu.models import REGISTRY, load_model_dir
    (tmp_path / "zz_plugin.py").write_text(
        _USER_MODEL_SRC.format(name="ZzPlugin"))
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "aa_plugin.py").write_text(
        _USER_MODEL_SRC.format(name="AaPlugin"))
    # a file that re-exports a priority model plus a broken file
    (tmp_path / "prio.py").write_text(
        "from mcsas_tpu.models import Sphere\n")
    (tmp_path / "broken.py").write_text("raise RuntimeError('nope')\n")
    (tmp_path / "_private.py").write_text(
        _USER_MODEL_SRC.format(name="NeverLoaded"))
    with caplog.at_level(logging.WARNING):
        found = load_model_dir(tmp_path)
    names = [m.name for m in found]
    assert names == ["Sphere", "AaPlugin", "ZzPlugin"]  # priority first
    assert "NeverLoaded" not in REGISTRY
    assert "AaPlugin" in REGISTRY and "ZzPlugin" in REGISTRY
    assert any("broken.py" in r.message for r in caplog.records)
    for n in ("AaPlugin", "ZzPlugin"):
        REGISTRY.pop(n, None)


def test_cli_model_file_and_dir(tmp_path, capsys):
    from mcsas_tpu.cli import main
    from mcsas_tpu.models import REGISTRY
    (tmp_path / "cli_plugin.py").write_text(
        _USER_MODEL_SRC.format(name="CliPlugin"))
    assert main(["--model-dir", str(tmp_path),
                 "--list-models", "dummy"]) == 0
    out = capsys.readouterr().out
    assert "CliPlugin" in out
    REGISTRY.pop("CliPlugin", None)


def test_cli_full_run(refdata, tmp_path, capsys):
    from mcsas_tpu.cli import main
    rc = main([str(refdata / "sasfit_sphere-10-1.dat"),
               "-m", "Sphere", "-o", str(tmp_path),
               "--contribs", "10", "--reps", "1", "--max-iter", "300",
               "--candidates", "2", "--seed", "3", "--nolog"])
    out = capsys.readouterr().out
    assert "sasfit_sphere-10-1" in out
    assert rc == 1                      # cannot converge in 300 iters
    subdirs = list(tmp_path.iterdir())
    assert len(subdirs) == 1
    files = {f.name.split("_")[-1] for f in subdirs[0].iterdir()}
    assert "fit.dat" in files and "settings.cfg" in files


def test_cli_multi_histograms(refdata, tmp_path):
    """Repeatable --hist = the reference GUI's range list: several
    ranges/weightings per parameter in one run."""
    from mcsas_tpu.cli import main
    rc = main([str(refdata / "sasfit_sphere-10-1.dat"),
               "-m", "Sphere", "-o", str(tmp_path),
               "--contribs", "15", "--reps", "1", "--max-iter", "400",
               "--hist", "radius=5:20,25,log,num",
               "--hist", "radius,10,surf"])
    assert rc in (0, 1)          # converged or not — outputs must exist
    hists = glob.glob(str(tmp_path / "*" / "*_hist-*.dat"))
    # default vol histogram + the two extra ranges
    assert len(hists) == 3
    assert any("log-num" in h for h in hists)
    assert any("surf" in h for h in hists)


def test_cli_bad_range(refdata, capsys):
    from mcsas_tpu.cli import main
    rc = main([str(refdata / "sasfit_sphere-10-1.dat"),
               "--range", "radius=banana"])
    assert rc == 2


def test_cli_range_override(refdata, tmp_path):
    from mcsas_tpu.cli import main
    rc = main([str(refdata / "sasfit_sphere-10-1.dat"),
               "-o", str(tmp_path), "--contribs", "8", "--reps", "1",
               "--max-iter", "200", "--nolog", "--seed", "1",
               "--range", "radius=5:50"])
    subdir = list(tmp_path.iterdir())[0]
    cfgfile = next(f for f in subdir.iterdir()
                   if f.name.endswith("settings.cfg"))
    cp = configparser.RawConfigParser()
    cp.read(cfgfile)
    assert float(cp.get("Model Settings", "radius_min")) == \
        pytest.approx(5e-9)
    assert float(cp.get("Model Settings", "radius_max")) == \
        pytest.approx(5e-8)


def test_config_json_roundtrip():
    cfg = McSASConfig(num_contribs=123, candidates_per_step=7,
                      find_background=False)
    s = cfg.to_json()
    back = McSASConfig.from_json(s)
    assert back == cfg
    assert '"numContribs": 123' in s


def test_config_from_reference_json():
    path = "/root/reference/src/mcsas/mcsas/mcsasparameters.json"
    if not os.path.exists(path):
        pytest.skip("reference json unavailable")
    cfg = McSASConfig.from_reference_json(path)
    assert cfg.num_contribs == 300
    assert cfg.num_reps == 10
    assert cfg.max_iterations == 100000
    assert cfg.compensation_exponent == pytest.approx(2 / 3, rel=1e-4)
    assert cfg.find_background is True
    assert cfg.max_retries == 5


def test_config_validation():
    with pytest.raises(ValueError):
        McSASConfig(num_contribs=0)
    with pytest.raises(ValueError):
        McSASConfig(candidates_per_step=0)


def test_fit_with_mesh_full_pipeline(refdata):
    """fit(mesh=...) runs the COMPLETE pipeline (sharded MC + f64 post
    + histograms) and reproduces the unsharded contributions (XLA path:
    identical threefry stream, f64-psum'd solve)."""
    import jax
    from mcsas_tpu.parallel import make_mesh
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    cfg = McSASConfig(num_contribs=24, num_reps=4, max_iterations=3000,
                      chunk_steps=500, seed=9, max_retries=0,
                      candidates_per_step=4, use_pallas="off",
                      show_incomplete=True)
    path = refdata / "sasfit_sphere-10-1.dat"
    res_m = mt.fit(path, model="Sphere", cfg=cfg,
                   mesh=make_mesh((4, 2), devs))
    res_u = mt.fit(path, model="Sphere", cfg=cfg)
    assert res_m.contribs.shape == (24, 1, 4)
    assert len(res_m.histograms) == 1
    assert np.all(np.isfinite(res_m.fit_measval_mean))
    # engine-layout contribs: (R, N, P) on both sides
    a = np.asarray(res_m.engine.contribs)
    b = np.asarray(res_u.engine.contribs)
    rep_eq = np.array([np.array_equal(x, y) for x, y in zip(a, b)])
    assert rep_eq.sum() >= len(rep_eq) - 1     # tie-cascade tolerance
    np.testing.assert_allclose(np.sort(res_m.engine.conval),
                               np.sort(res_u.engine.conval), rtol=2e-2)


def test_cli_mesh_run(refdata, tmp_path, capsys):
    """--mesh REP,Q runs the series driver SPMD over a device mesh."""
    import jax
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual cpu devices")
    from mcsas_tpu.cli import main
    rc = main([str(refdata / "sasfit_sphere-10-1.dat"),
               "-m", "Sphere", "-o", str(tmp_path), "--mesh", "4,2",
               "--contribs", "16", "--reps", "4", "--max-iter", "3000",
               "--candidates", "4", "--seed", "3", "--nolog"])
    out = capsys.readouterr().out
    assert "sasfit_sphere-10-1" in out
    assert rc in (0, 1)
    assert len(list(tmp_path.iterdir())) == 1


def test_cli_mesh_rejects_garbage(capsys):
    from mcsas_tpu.cli import main
    rc = main(["nofile.dat", "--mesh", "banana", "--nolog"])
    assert rc == 2
    assert "bad --mesh" in capsys.readouterr().err


def test_plot_negative_intensity_no_warnings(tmp_path):
    """Background-subtracted data can carry negative I points
    (f_mask_neg defaults off): the fit-panel y-floor must use the
    smallest POSITIVE intensity or matplotlib silently drops the
    log-axis limit, and the layout must not warn on the axis-off info
    strip (round-4 fixes)."""
    import warnings

    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.plotting import plot_results
    raw = np.column_stack([np.geomspace(0.1, 1, 40),
                           np.linspace(1.0, -0.1, 40),   # negative tail
                           0.05 * np.ones(40)])
    d = mt.from_raw(raw, title="neg-tail")
    cfg = McSASConfig(num_contribs=8, num_reps=2, max_iterations=2000,
                      chunk_steps=64, candidates_per_step=2, seed=5,
                      convergence_criterion=1e9, show_incomplete=True)
    res = mt.fit(d, model="Sphere", cfg=cfg)
    out = tmp_path / "neg.pdf"
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        plot_results(res, output_filename=str(out))
    assert out.exists()


def test_plot_algo_info_and_partial_curves(tmp_path):
    """Round-4 plot parity features (reference plotting.py:281-303,
    407-411): the algorithm-information strip carries the fitted
    scaling/background/χ²/timing, and show_reps draws one partial curve
    per repetition."""
    from mcsas_tpu.config import McSASConfig
    from mcsas_tpu.plotting import _format_algo_info, plot_results
    raw = np.column_stack([np.geomspace(0.1, 1, 40),
                           np.linspace(1.0, 0.5, 40),
                           0.05 * np.ones(40)])
    d = mt.from_raw(raw, title="info-panel")
    cfg = McSASConfig(num_contribs=8, num_reps=3, max_iterations=2000,
                      chunk_steps=64, candidates_per_step=2, seed=7,
                      convergence_criterion=1e9, show_incomplete=True)
    res = mt.fit(d, model="Sphere", cfg=cfg)
    info = _format_algo_info(res)
    for token in ("info-panel", "Background level", "Scaling factor",
                  "Timing: 3 repetitions", "Reduced χ²", "radius"):
        assert token in info, f"missing {token!r} in algo info:\n{info}"
    fig = plot_results(res, output_filename=str(tmp_path / "reps.pdf"),
                       show_reps=True, auto_close=False)
    try:
        fit_ax = fig.axes[1]          # [0] is the info strip
        # data errorbar + 3 partial curves + MC fit mean + legend stub
        assert sum(1 for ln in fit_ax.get_lines()
                   if ln.get_color() == "b") >= 3
    finally:
        import matplotlib.pyplot as plt
        plt.close(fig)
