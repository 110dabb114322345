"""Method-of-manufactured-solutions convergence (SURVEY §4.1).

The reference's strongest correctness harness
(advection_FCT_PDECO_alltime_exact.py:77-128): closed-form u*, p*,
c* = clip(p*/β) with derived source g and target û. Here we verify the
forward and adjoint discretizations converge to the manufactured fields at
second order in h (measured orders ~2 for u, ~2.5 for p at dt = 5e-4).
"""

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.advection_pdeco import EPS, MMSFields
from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


def _errors(dx, T=0.1, dt=5e-4):
    wf = vortex_wind(1.0)
    g = Grid.from_spacing(0.0, 1.0, dx)
    model = AdvectionModel(g, eps=EPS, wind_fn=wf, solver_opts=SolverOpts(tol=1e-13))
    mms = MMSFields(g, T, 0.001, -1.0, 1.0)
    steps = round(T / dt)
    times = np.arange(steps + 1) * dt
    cex = jnp.asarray(np.stack([mms.cex(t) for t in times]))
    gsrc = jnp.asarray(np.stack([mms.g(t, EPS, wf) for t in times]))
    u = model.forward(cex, jnp.asarray(mms.uex(0.0)), dt, source_traj=gsrc)
    uex_T = mms.uex(T)
    u_err = np.linalg.norm(np.asarray(u[-1]) - uex_T) / np.linalg.norm(uex_T)
    uhat = jnp.asarray(np.stack([mms.uhat(t, EPS, wf) for t in times]))
    p = model.adjoint(u, uhat, dt, "alltime")
    pex0 = mms.pex(0.0)
    p_err = np.linalg.norm(np.asarray(p[0]) - pex0) / np.linalg.norm(pex0)
    return u_err, p_err


def test_mms_convergence_orders():
    u1, p1 = _errors(0.1)
    u2, p2 = _errors(0.05)
    order_u = np.log2(u1 / u2)
    order_p = np.log2(p1 / p2)
    assert u2 < 1e-3 and p2 < 5e-3
    assert order_u > 1.5, (u1, u2, order_u)
    assert order_p > 1.5, (p1, p2, order_p)


def test_mms_finaltime_exact_convergence_orders():
    """Full-PGD convergence study of the FINAL-TIME exact problem
    (advection_FCT_PDECO_finaltime_exact.py:76-151) in its "consistent"
    completion (regular reaction coefficient, the reference's commented-out
    variant at lines 104-106; see MMSFinaltimeFields). u, p, c must all
    converge at order >= 1.5 in dx (dt = dx^2)."""
    from fem_fct_pdeco_tpu.drivers.advection_pdeco import AdvectionProblem, main

    errs = {}
    for dx in ("0.1", "0.05"):
        out = main([
            "--exact", "--optim", "finaltime", "--mms-variant", "consistent",
            "--dx", dx, "--dt", str(float(dx) ** 2), "--tol", "1e-11",
            "--beta", "0.25",  # box [0,1] inactive: c = p/beta stays smooth
            "--max-iter-gd", "100", "--out", "/tmp/mms_ftex_test",
        ])
        errs[dx] = {k: float(v["max_rel"]) for k, v in out["mms_errors"].items()}
    for q in ("u", "p", "c"):
        order = np.log2(errs["0.1"][q] / errs["0.05"][q])
        assert order > 1.5, (q, errs, order)
    assert errs["0.05"]["u"] < 0.02


def test_mms_finaltime_reference_variant_state_converges():
    """The verbatim reference construction (singular-g regularization
    delta_ex=0.1): the STATE still converges under refinement; p/c cannot
    (documented inconsistency — the discrete adjoint is homogeneous with a
    zero exact terminal condition)."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.drivers.advection_pdeco import EPS, MMSFinaltimeFields
    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    T = 0.1
    errs = []
    for dx in (0.1, 0.05):
        g = Grid.from_spacing(0.0, 1.0, dx)
        mms = MMSFinaltimeFields(g, T, 0.1, 0.0, 1.0, EPS)
        model = AdvectionModel(g, eps=EPS, wind_fn=mms.wind,
                               solver_opts=SolverOpts(tol=1e-13),
                               divw_fn=mms.divw)
        dt = dx * dx
        steps = round(T / dt)
        times = np.arange(steps + 1) * dt
        cex = jnp.asarray(np.stack([mms.cex(t) for t in times]))
        fx = jnp.asarray(np.stack([mms.fex(t) for t in times]))
        gx = jnp.asarray(np.stack([mms.gex(t) for t in times]))
        u = model.forward(cex, jnp.asarray(mms.uex(0.0)), dt,
                          source_traj=fx, reaction_traj=gx)
        ex = mms.uex(T)
        errs.append(np.linalg.norm(np.asarray(u[-1]) - ex) / np.linalg.norm(ex))
    assert np.log2(errs[0] / errs[1]) > 1.2, errs
