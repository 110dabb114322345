"""Always-on FCT safety telemetry (VERDICT r3 item 4).

The reference validates the low-order matrix's M-matrix row-sum property
unconditionally EVERY step and prints admissible dt bounds on violation
(helpers.py:1784-1810). The rebuild's debug=True replicates that as a hard
checkify failure but forces the XLA path; these tests pin the ALWAYS-ON
soft telemetry: every sweep — XLA scan and fused whole-sweep kernels alike
— carries a min-rowsum reduction, surfaced as ``model.last_invariants`` /
``invariant_report()`` / ``check_invariants()``, accumulated across sweeps
by ``pop_invariants()``, and recorded per PGD iteration in
``history["min_rowsum"]``.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

N = 16
DT = 1e-3
STEPS = 3
_OPTS = dict(dtype=jnp.float64,
             solver_opts=SolverOpts(tol=1e-12, maxiter=200))


def _chemo(backend, **kw):
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, N)
    return ChemotaxisModel(g, rescaling=1.0, backend=backend, **_OPTS, **kw)


def _report(m):
    rep = m.invariant_report()
    assert rep is not None and rep["reported"], rep
    return rep


def test_chemotaxis_xla_vs_fused_tiers_agree():
    """min-rowsum agrees to solver precision between the XLA scan and every
    fused tier (resident/synth/lean), forward and adjoint."""
    mx = _chemo("xla")
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in mx.ic())
    c = jnp.full((STEPS + 1, N, N), mx.params.gamma, jnp.float64)
    ux, vx = mx.forward(c, u0, v0, DT)
    ref_f = _report(mx)
    assert ref_f["ok"] and ref_f["min_rowsum"] > 0
    px, _ = mx.adjoint(ux, vx, 1.01 * ux[-1], 1.02 * vx[-1], c, DT,
                       "finaltime")
    ref_a = _report(mx)

    for tier in (None, "synth", "lean"):
        mf = _chemo("pallas_fused")
        if tier == "synth":
            mf.force_synth = True
        elif tier == "lean":
            mf.force_lean = True
        uf, vf = mf.forward(c, u0, v0, DT)
        got = _report(mf)
        assert abs(got["min_rowsum"] - ref_f["min_rowsum"]) < 1e-9, tier
        mf.adjoint(ux, vx, 1.01 * ux[-1], 1.02 * vx[-1], c, DT, "finaltime")
        got_a = _report(mf)
        assert abs(got_a["min_rowsum"] - ref_a["min_rowsum"]) < 1e-9, tier


def test_overlarge_dt_violation_surfaces_on_fused_path():
    """The VERDICT done-criterion: an over-large dt must surface a
    violation on the FUSED path (not just debug-mode XLA), via a loud
    warning from check_invariants()."""
    mf = _chemo("pallas_fused")
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in mf.ic())
    c = jnp.full((3, N, N), mf.params.gamma, jnp.float64)
    mf.forward(c, u0, v0, 0.3)  # far beyond the admissible dt
    rep = mf.invariant_report()
    assert rep["reported"] and not rep["ok"] and rep["min_rowsum"] <= 0.0
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mf.check_invariants()
    assert any("M-matrix" in str(w.message) for w in rec)


def test_overlarge_dt_violation_surfaces_on_xla_path():
    mx = _chemo("xla")
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in mx.ic())
    c = jnp.full((3, N, N), mx.params.gamma, jnp.float64)
    mx.forward(c, u0, v0, 0.3)
    rep = mx.invariant_report()
    assert rep["reported"] and not rep["ok"]


@pytest.mark.parametrize("family", ["schnak", "nonlinear", "advection",
                                    "drift", "mimura", "legacy"])
def test_all_families_report_both_backends(family):
    """Every model family's forward sweep reports min-rowsum on both the
    XLA and the fused path, with matching values."""
    vals = {}
    for backend in ("xla", "pallas_fused"):
        if family == "schnak":
            from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

            g = Grid(0.0, 1.0, N)
            m = SchnakenbergModel(g, backend=backend, **_OPTS)
            u0, v0 = (jnp.asarray(a) for a in m.ic())
            c = jnp.full((STEPS + 1, N, N), m.params.c_a, jnp.float64)
            m.forward(c, u0, v0, DT)
        elif family == "nonlinear":
            from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

            g = Grid(0.0, 1.0, N)
            m = NonlinearModel(g, backend=backend, **_OPTS)
            u0 = jnp.asarray(m.ic(), jnp.float64)
            c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
            m.forward(c, u0, DT)
        elif family == "advection":
            from fem_fct_pdeco_tpu.models.advection import (
                AdvectionModel, vortex_wind)

            g = Grid(0.0, 1.0, N)
            m = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend=backend,
                               **_OPTS)
            u0 = jnp.asarray(np.exp(-20.0 * ((g.xy[0] - 0.5) ** 2
                                             + (g.xy[1] - 0.5) ** 2)))
            c = jnp.full((STEPS + 1, N, N), 0.5, jnp.float64)
            m.forward(c, u0, DT)
        elif family == "drift":
            from fem_fct_pdeco_tpu.models.advection import (
                DriftControlModel, slotted_cylinder_ic)

            g = Grid(-1.0, 1.0, N)
            m = DriftControlModel(g, eps=0.0, om=np.pi / 40,
                                  drift=(1.0, 1.0), backend=backend,
                                  solver_opts=SolverOpts(tol=1e-12,
                                                         maxiter=200))
            u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05), jnp.float64)
            rng = np.random.RandomState(7)
            c = jnp.asarray(0.5 * rng.rand(STEPS + 1, N, N))
            m.forward(c, u0, DT)
        elif family == "mimura":
            from fem_fct_pdeco_tpu.models.mimura import MimuraModel

            g = Grid(0.0, 1.0, N)
            m = MimuraModel(g, backend=backend, **_OPTS)
            u0, v0 = (jnp.asarray(a) for a in m.ic())
            c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
            m.forward(c, u0, v0, DT)
        else:  # legacy m(4-m): XLA only (no fused kernel)
            if backend == "pallas_fused":
                continue
            from fem_fct_pdeco_tpu.models.legacy_mimura import (
                LegacyM4MimuraModel)

            g = Grid(0.0, 1.0, N)
            m = LegacyM4MimuraModel(g, **_OPTS)
            m0, f0 = (jnp.asarray(a) for a in m.ic())
            c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
            m.forward(c, m0, f0, DT)
        vals[backend] = _report(m)["min_rowsum"]
    if len(vals) == 2:
        assert abs(vals["xla"] - vals["pallas_fused"]) < 1e-9, (family, vals)
    assert min(vals.values()) > 0.0


def test_checkpointed_adjoint_reports():
    """adjoint_checkpointed covers all executed sweeps (initial forward,
    recomputed segments, adjoint) in one reduction."""
    mx = _chemo("xla")
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in mx.ic())
    steps = 4
    c = jnp.full((steps + 1, N, N), mx.params.gamma, jnp.float64)
    ux, vx = mx.forward(c, u0, v0, DT)
    mx.adjoint_checkpointed(c, u0, v0, 1.01 * ux[-1], 1.02 * vx[-1], DT,
                            "finaltime", num_segments=2)
    rep = _report(mx)
    assert rep["ok"] and rep["min_rowsum"] > 0.0


def test_pop_invariants_accumulates_and_resets():
    mx = _chemo("xla")
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in mx.ic())
    c_ok = jnp.full((3, N, N), mx.params.gamma, jnp.float64)
    mx.forward(c_ok, u0, v0, DT)          # fine sweep
    mx.forward(c_ok, u0, v0, 0.3)         # violating sweep
    mx.forward(c_ok, u0, v0, DT)          # fine again (last_invariants ok)
    assert mx.invariant_report()["ok"]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rep = mx.pop_invariants()         # min over all three sweeps
    assert rep is not None and not rep["ok"]
    assert any("M-matrix" in str(w.message) for w in rec)
    assert mx.pop_invariants() is None    # reset


def test_pgd_history_records_min_rowsum(tmp_path):
    """run_pdeco surfaces the telemetry once per GD iteration (history dict,
    progress.csv column, registry column)."""
    import csv
    import os

    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as drv
    from fem_fct_pdeco_tpu.drivers.common import run_pdeco

    cfg = drv.build_config(T=0.002, T_data=0.002, dt=1e-3, dx=1.0 / 15.0,
                           max_iter_gd=2, out_folder=str(tmp_path),
                           produce_plots=False)
    cfg.registry_csv = str(tmp_path / "registry.csv")
    problem = drv.ChemotaxisProblem(cfg)
    out = run_pdeco(problem, cfg)
    hist = out["result"].history
    assert hist["min_rowsum"] and all(v > 0 for v in hist["min_rowsum"])
    with open(os.path.join(str(tmp_path), "progress.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and "min_rowsum" in rows[0]
    assert float(rows[-1]["min_rowsum"]) > 0.0
    with open(cfg.registry_csv) as f:
        rrows = list(csv.DictReader(f))
    assert "min rowsum" in rrows[0] and float(rrows[-1]["min rowsum"]) > 0.0
