"""Discretize-then-optimize: jax.grad through the FCT time loop.

The reference only has hand-derived continuous adjoints (optimize-then-
discretize), whose discrete gradients are O(dt)-inconsistent (visible with
high-frequency control perturbations, see test_schnakenberg.py). With the
implicit-function-theorem VJP on the stencil solves, the entire forward scan
becomes reverse-differentiable and jax.grad delivers the EXACT gradient of
the discrete objective — matching finite differences even for random
perturbations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil
from fem_fct_pdeco_tpu.optimize import cost_functional


def test_solve_stencil_vjp():
    """Custom VJP vs numerical differentiation of the solve."""
    g = Grid(0.0, 1.0, 8)
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind

    model = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                           solver_opts=SolverOpts(tol=1e-13))
    S0 = model.M + 1e-3 * model.A_state
    rng = np.random.default_rng(0)
    b0 = jnp.asarray(rng.standard_normal((8, 8))) * 1e-2
    w = jnp.asarray(rng.standard_normal((8, 8)))  # cotangent

    def f(S, b):
        return jnp.sum(w * solve_stencil(S, b, opts=SolverOpts(tol=1e-13)))

    gS, gb = jax.grad(f, argnums=(0, 1))(S0, b0)
    # FD check on b
    db = jnp.asarray(rng.standard_normal((8, 8)))
    h = 1e-6
    fd = (f(S0, b0 + h * db) - f(S0, b0 - h * db)) / (2 * h)
    assert float(fd) == pytest.approx(float(jnp.sum(gb * db)), rel=1e-6)
    # FD check on S
    dS = jnp.asarray(rng.standard_normal(S0.shape))
    fdS = (f(S0 + h * dS, b0) - f(S0 - h * dS, b0)) / (2 * h)
    assert float(fdS) == pytest.approx(float(jnp.sum(gS * dS)), rel=1e-5)


def test_jax_grad_through_fct_time_loop():
    """Exact discrete gradient of J(c) via jax.grad through the scanned FCT
    forward solve, validated against FD with a RANDOM (high-frequency)
    perturbation — the case where the continuous adjoint is only O(1)
    accurate."""
    g = Grid(0.0, 1.0, 11)
    model = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    dt, steps, beta = 1e-3, 10, 1e-2
    u0 = jnp.asarray(model.ic())
    c_true = jnp.broadcast_to(jnp.asarray(model.true_control()), (steps + 1, g.n, g.n))
    (u_true,) = model.forward(c_true, u0, dt)
    uhat = u_true[-1]

    def J(ctrl):
        (u,) = model.forward(ctrl, u0, dt)
        return cost_functional(u, uhat, ctrl, dt, model.M, beta, "finaltime")

    c = jnp.full((steps + 1, g.n, g.n), 0.2)
    grad = jax.grad(J)(c)

    rng = np.random.default_rng(7)
    delta = jnp.asarray(rng.standard_normal((steps + 1, g.n, g.n)))
    h = 1e-6
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    ad = jnp.sum(grad * delta)
    assert float(fd) == pytest.approx(float(ad), rel=2e-4), (float(fd), float(ad))
