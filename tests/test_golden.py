"""Golden-value regression tests over the driver surface.

Small fixed PDECO configurations with their final cost values pinned
(generated on CPU f64). Protects the full pipeline — target generation, data
loading, assembly, FCT, solvers, adjoints, Armijo — against silent behavior
changes during refactors. Tolerance 1e-6 absorbs BLAS/libm variation across
machines; any real semantic change moves these by orders of magnitude more.
"""

import pytest

GOLDEN = {
    "nonlinear_ft": ("nonlinear_pdeco",
                     ["--T", "0.05", "--dx", "0.05", "--max-iter-gd", "5", "--tol", "1e-10"],
                     2.288846925674e-04),
    "chemotaxis_ft": ("chemotaxis_pdeco",
                      ["--T", "0.01", "--T-data", "0.01", "--dx", "0.05",
                       "--max-iter-gd", "5", "--tol", "1e-10"],
                      5.377196024216e-05),
    "schnak_ft": ("schnak_pdeco",
                  ["--T", "0.02", "--T-data", "0.02", "--dx", "0.05",
                   "--max-iter-gd", "5", "--tol", "1e-10"],
                  3.227294255599e-01),
    "advection_exact_at": ("advection_pdeco",
                           ["--exact", "--optim", "alltime", "--T", "0.05",
                            "--dx", "0.05", "--max-iter-gd", "5", "--tol", "1e-10"],
                           4.166931975062e-04),
    "solidbody_ft": ("solidbody_pdeco",
                     ["--T", "0.02", "--max-iter-gd", "3", "--tol", "1e-10"],
                     8.757514264809e-03),
    "mimura_at": ("mimura_pdeco",
                  ["--optim", "alltime", "--dt", "0.1", "--dx", "1.0",
                   "--a2", "10.0", "--max-iter-gd", "3", "--tol", "1e-10"],
                  5.203654938075e-01),
    "advection_exact_ft": ("advection_pdeco",
                           ["--exact", "--optim", "finaltime", "--dx", "0.1",
                            "--dt", "0.01", "--max-iter-gd", "5", "--tol", "1e-10"],
                           1.452274016076e+00),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_cost(name, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from importlib import import_module

    mod, args, expected = GOLDEN[name]
    d = import_module(f"fem_fct_pdeco_tpu.drivers.{mod}")
    out = d.main(args)
    assert out["result"].cost == pytest.approx(expected, rel=1e-6), name
