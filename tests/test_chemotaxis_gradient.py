"""Chemotaxis adjoint validation against finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_adjoint_gradient_fd(optim):
    """β c - q u / r vs finite differences (smooth-in-time perturbation).

    All-time uses the mass-consistent misfit option: the reference's raw
    nodal misfit (helpers.py:1506-1507, replicated as the default) breaks the
    adjoint identity by ~1/mass-scale; Armijo absorbs the scaling in practice.
    """
    g = Grid(0.0, 1.0, 16)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                            consistent_alltime_misfit=(optim == "alltime"))
    u0np, v0np = model.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    dt, steps, beta = 5e-4, 16, 1e-4
    c_true = jnp.full((steps + 1, g.n, g.n), 100.0)
    ut, vt = model.forward(c_true, u0, v0, dt)
    if optim == "finaltime":
        uhat, vhat = ut[-1], vt[-1]
    else:
        uhat, vhat = ut, vt

    c = jnp.full((steps + 1, g.n, g.n), 60.0)
    rng = np.random.default_rng(2)
    delta = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((g.n, g.n))), (steps + 1, g.n, g.n)
    )

    def J(ctrl):
        u, v = model.forward(ctrl, u0, v0, dt)
        return float(
            cost_functional(u, uhat, ctrl, dt, model.M, beta, optim,
                            var2_traj=v, var2_target=vhat)
        )

    u, v = model.forward(c, u0, v0, dt)
    p, q = model.adjoint(u, v, uhat, vhat, c, dt, optim)
    grad = beta * c - q * u / model.rescaling
    per = jax.vmap(lambda gr, de: jnp.sum(st.apply(model.M, gr) * de))(grad, delta)
    w = jnp.ones(steps + 1).at[0].set(0.5).at[-1].set(0.5)
    grad_dot = float(jnp.sum(w * per) * dt)

    h = 1e-3
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    assert fd == pytest.approx(grad_dot, rel=0.08), (fd, grad_dot)


def test_gradient_smoothing_adjoint_variant():
    """The reference's experimental DG0->CG1 gradient-smoothing adjoint
    (helpers.py:1520-1528): for a LINEAR p the element gradient is globally
    constant, so the L2 projection is exact and the smoothed adjoint equals
    the raw one; for a general p it differs but stays finite."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n = 17
    g = Grid(0.0, 1.0, n)
    m = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                        gradient_smoothing=True)
    X, Y = g.xy
    p_lin = jnp.asarray(0.3 * X + 0.7 * Y)
    gx, gy = m.smooth_gradient(p_lin)
    assert float(jnp.abs(gx - 0.3).max()) < 1e-9
    assert float(jnp.abs(gy - 0.7).max()) < 1e-9

    m0 = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    u0np, v0np = m0.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((4, n, n), 100.0)
    u, v = m0.forward(c, u0, v0, 5e-4)
    uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    p_raw, q_raw = m0.adjoint(u, v, uhat, vhat, c, 5e-4, "finaltime")
    p_sm, q_sm = m.adjoint(u, v, uhat, vhat, c, 5e-4, "finaltime")
    assert bool(jnp.isfinite(p_sm).all()) and bool(jnp.isfinite(q_sm).all())
    # the variants agree closely (the smoothing is a mild regularization)
    assert float(jnp.abs(q_sm - q_raw).max()) < 0.1 * float(jnp.abs(q_raw).max() + 1e-30)
