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
