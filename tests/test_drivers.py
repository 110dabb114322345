"""Smoke tests: every PDECO driver runs end-to-end at tiny sizes.

Exercises the full driver surface (§2.5 of the reference inventory): target
generation, data loading, PGD with Armijo, registry rows, CSV outputs.
"""

import os

import pytest


@pytest.fixture()
def in_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _common(argv):
    return argv + ["--max-iter-gd", "2", "--tol", "1e-8"]


def test_nonlinear_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import nonlinear_pdeco as d

    out = d.main(_common(["--T", "0.02", "--dx", "0.1"]))
    assert out["result"].iterations >= 1
    assert os.path.exists(out["registry_row"]["out_folder_name"])


def test_nonlinear_driver_alltime(in_tmp):
    from fem_fct_pdeco_tpu.drivers import nonlinear_pdeco as d

    out = d.main(_common(["--T", "0.02", "--dx", "0.1", "--optim", "alltime"]))
    assert out["result"].iterations >= 1


def test_chemotaxis_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    out = d.main(_common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05"]))
    assert out["result"].iterations >= 1


def test_chemotaxis_driver_linear_armijo(in_tmp):
    """Legacy coupled-system (w_m, w_f) linear-increment Armijo path."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    out = d.main(_common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05",
                          "--linear-armijo"]))
    res = out["result"]
    assert res.iterations >= 1
    assert res.history["cost"][-1] < res.history["cost"][0]


def test_chemotaxis_driver_quad_degree(in_tmp):
    """--quad-degree 2 (reduced-quadrature transport assembly) runs the
    PDECO loop end-to-end and still descends."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    out = d.main(_common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05",
                          "--quad-degree", "2"]))
    res = out["result"]
    assert res.iterations >= 1
    assert res.history["cost"][-1] < res.history["cost"][0]


def test_chemotaxis_driver_alltime(in_tmp):
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    out = d.main(_common(["--T", "0.005", "--dx", "0.05", "--optim", "alltime"]))
    assert out["result"].iterations >= 1


def test_schnak_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import schnak_pdeco as d

    out = d.main(_common(["--T", "0.01", "--T-data", "0.01", "--dx", "0.05"]))
    assert out["result"].iterations >= 1


def test_advection_exact_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import advection_pdeco as d

    out = d.main(_common(["--exact", "--optim", "alltime", "--T", "0.02", "--dx", "0.05"]))
    assert "mms_errors" in out
    errs = out["mms_errors"]
    assert set(errs) == {"u", "c", "p"}


def test_advection_stripes_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import advection_pdeco as d

    out = d.main(_common(["--T", "0.02", "--dx", "0.05"]))
    assert out["result"].iterations >= 1


def test_solidbody_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import solidbody_pdeco as d

    out = d.main(_common(["--T", "0.02"]))
    assert out["result"].iterations >= 1


def test_solidbody_garvie_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import solidbody_pdeco as d

    out = d.main(_common(["--T", "0.02", "--garvie"]))
    assert out["result"].iterations >= 1


def test_solidbody_gaussian_alltime_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import solidbody_pdeco as d

    out = d.main(_common(["--T", "0.02", "--optim", "alltime", "--gaussian"]))
    assert out["result"].iterations >= 1


def test_mimura_driver(in_tmp):
    from fem_fct_pdeco_tpu.drivers import mimura_pdeco as d

    out = d.main(_common(["--T", "0.2", "--T-data", "0.5", "--dt", "0.1",
                          "--dx", "1.0", "--a2", "10.0"]))
    assert out["result"].iterations >= 1


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/mimura_tsujikawa_t14_m.csv"),
    reason="reference fixture unavailable")
def test_mimura_driver_reference_fixture_targets(in_tmp):
    """At the historical fixture config (129², a2=16, dx=1/8) the driver
    loads the REAL reference snapshot CSVs as the PDECO targets û
    (mimura_pdeco._load_targets prefers /root/reference/data), matching
    the reference's own use of these files (chemotaxis_mimura_FCT_PGD.py).
    BASELINE.md parity-fixture row 'mimura_tsujikawa snapshots'."""
    import numpy as np

    from fem_fct_pdeco_tpu.drivers import mimura_pdeco as d
    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.io.csvio import import_data_final

    out = d.main(_common(["--T", "0.1", "--T-data", "14", "--dt", "0.01",
                          "--dx", "0.125", "--a2", "16.0"]))
    res = out["result"]
    assert res.iterations >= 1
    assert res.history["cost"][-1] <= res.history["cost"][0]

    # provenance: the loaded targets ARE the reference snapshots (the
    # fallback would have generated into data_generated/ in this tmp cwd)
    g = Grid(0.0, 16.0, 129)
    want = import_data_final(
        "/root/reference/data/mimura_tsujikawa_t14_m.csv", g, num_steps=0)
    prob = d.MimuraProblem(_mimura_fixture_cfg(d))
    np.testing.assert_allclose(np.asarray(prob._targets[0], dtype=np.float64),
                               np.asarray(want), rtol=1e-6)


def _mimura_fixture_cfg(d):
    from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig

    cfg_d = {**d.DEFAULTS, "T": 0.1, "T_data": 14.0, "dt": 0.01,
             "dx": 0.125, "a2": 16.0, "max_iter_gd": 1}
    cfg = ExperimentConfig(**cfg_d)
    cfg.out_folder = "mimura_fixture_cfg_probe"
    return cfg


def test_mimura_driver_alltime(in_tmp):
    """All-time Mimura PDECO (chemotaxis_mimura_FCT_PGD_alltime.py): target =
    own trajectory over [0, T]; at the true control c=1 the misfit is ~0, so
    PGD starting from c=0 must strictly decrease the cost toward
    J(c_true) = beta/2 ||c_true||^2."""
    from fem_fct_pdeco_tpu.drivers import mimura_pdeco as d

    out = d.main(["--optim", "alltime", "--dt", "0.1", "--dx", "1.0",
                  "--a2", "10.0", "--max-iter-gd", "3", "--tol", "1e-10"])
    res = out["result"]
    assert res.iterations >= 1
    hist = res.history["cost"]
    assert hist[-1] < hist[0]
    row = out["registry_row"]
    assert row["status"].startswith(("converged", "max_iterations"))


def test_generate_targets_cli(in_tmp):
    from fem_fct_pdeco_tpu.drivers.generate_targets import chemotaxis

    g, (m, f) = chemotaxis(str(in_tmp / "gen"), T=0.002, dt=1e-3, dx=0.1)
    assert os.path.exists(in_tmp / "gen" / "chtxs_m_t0.002.csv")


def test_mimura_driver_legacy_m4(in_tmp):
    """Legacy m(4-m) system (--legacy-m4, old_helpers.py:87-111 builders)."""
    from fem_fct_pdeco_tpu.drivers import mimura_pdeco as d

    out = d.main(_common(["--legacy-m4", "--T", "0.2", "--T-data", "0.5",
                          "--dt", "0.1", "--dx", "1.0", "--a2", "10.0"]))
    assert out["result"].iterations >= 1


def test_chemotaxis_driver_mixed_precision(in_tmp):
    """--mixed-precision: f32 sweeps with f64 objectives (optimize/cost.py)."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    out = d.main(_common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05",
                          "--mixed-precision"]))
    res = out["result"]
    assert res.iterations >= 1
    assert res.history["cost"][-1] < res.history["cost"][0]


@pytest.mark.parametrize("mod,argv,rtol", [
    ("nonlinear_pdeco", ["--T", "0.02", "--dx", "0.1"], 1e-5),
    # Schnakenberg is the stiffest system (gamma=230.82 reaction, Dv=8.67):
    # the f32 trajectory itself carries ~1e-5 relative error, which enters
    # the f64-evaluated misfit linearly
    ("schnak_pdeco", ["--T", "0.01", "--T-data", "0.01", "--dx", "0.05"], 5e-5),
    ("solidbody_pdeco", ["--T", "0.02"], 1e-5),
    ("advection_pdeco", ["--T", "0.02", "--dx", "0.05"], 1e-5),
    ("mimura_pdeco", ["--T", "0.2", "--T-data", "0.5", "--dt", "0.1",
                      "--dx", "1.0", "--a2", "10.0"], 1e-5),
])
def test_driver_mixed_precision_objective_parity(in_tmp, mod, argv, rtol):
    """--mixed-precision on every driver: the f32-sweep + f64-norm objective
    matches the all-f64 objective closely (VERDICT item 7: the initial cost
    — one state sweep + cost evaluation, no Armijo branching — is the
    apples-to-apples comparison)."""
    import importlib

    d = importlib.import_module(f"fem_fct_pdeco_tpu.drivers.{mod}")
    args = argv + ["--max-iter-gd", "1", "--tol", "1e-8"]
    out64 = d.main(args)
    outmx = d.main(args + ["--mixed-precision"])
    j64 = out64["result"].history["cost"][0]
    jmx = outmx["result"].history["cost"][0]
    assert abs(jmx - j64) / max(abs(j64), 1e-30) < rtol, (mod, j64, jmx)
    assert outmx["result"].iterations >= 1


def test_per_iteration_progress_flush(in_tmp):
    """Each GD iteration appends a row to <out>/progress.csv (per-iteration
    observability of a long run) and --plots renders per-iteration panels."""
    from fem_fct_pdeco_tpu.drivers import nonlinear_pdeco as d

    out = d.main(_common(["--T", "0.02", "--dx", "0.1", "--plots"]))
    res = out["result"]
    folder = out["registry_row"]["out_folder_name"]
    prog = os.path.join(folder, "progress.csv")
    assert os.path.exists(prog)
    rows = open(prog).read().strip().splitlines()
    assert len(rows) == res.iterations + 1  # header + one row per iteration
    assert "cost" in rows[0] and "armijo_its" in rows[0]
    import glob

    assert glob.glob(os.path.join(folder, "*.png"))


def test_armijo_batch_driver_equivalence(in_tmp):
    """--armijo-batch 2: identical cost history and accepted-trial counts to
    the sequential driver run (the batched trials change wall-clock, never
    the optimization path)."""
    from fem_fct_pdeco_tpu.drivers import nonlinear_pdeco as d

    args = ["--T", "0.02", "--dx", "0.1", "--max-iter-gd", "3", "--tol", "1e-10"]
    out1 = d.main(args + ["--armijo-batch", "1"])
    out2 = d.main(args + ["--armijo-batch", "2"])
    h1, h2 = out1["result"].history, out2["result"].history
    assert h1["armijo_iters"] == h2["armijo_iters"]
    import numpy as np

    np.testing.assert_allclose(h1["cost"], h2["cost"], rtol=1e-12)


def test_chemotaxis_driver_spectral(in_tmp):
    """--spectral (DCT-preconditioned XLA Krylov solves) reproduces the
    Jacobi-path cost on the same config."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d

    argv = _common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05"])
    base = d.main(argv)
    spec = d.main(argv + ["--spectral"])
    cb = base["result"].cost
    cs = spec["result"].cost
    assert abs(cs - cb) / max(abs(cb), 1e-30) < 1e-6


def test_chemotaxis_driver_on_lean_kernels(in_tmp, monkeypatch):
    """Full PDECO loop (targets, PGD, Armijo, registry) with every sweep on
    the LEAN whole-sweep kernels (forced at a small grid), matching the
    XLA-path cost."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as d
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    argv = _common(["--T", "0.005", "--T-data", "0.005", "--dx", "0.05"])
    base = d.main(argv)
    monkeypatch.setattr(ChemotaxisModel, "force_lean", True)
    lean = d.main(argv + ["--backend", "pallas_fused"])
    cb = base["result"].cost
    cl = lean["result"].cost
    assert abs(cl - cb) / max(abs(cb), 1e-30) < 1e-6
