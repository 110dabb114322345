"""End-to-end PDECO: inverse-crime control recovery for the nonlinear model.

Mirrors the reference's quality-control pattern (SURVEY §4.3): generate the
target state from a KNOWN true control (sin·sin source,
nonlinear_generate_pattern_FCT.py:48-50), run projected gradient descent from
c = 0, and check that the optimizer drives the misfit down and that the
achieved cost is comparable to J(c_true) = β/2 ||c_true||² (the value logged
by the reference drivers, helpers.py:1958-2001).
"""

import functools

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import (
    PGDConfig,
    cost_functional,
    l2_norm_sq_omega,
    l2_norm_sq_q,
    projected_gradient_descent,
)


@pytest.fixture(scope="module")
def setup():
    g = Grid(0.0, 1.0, 21)
    model = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-12))
    dt, steps = 1e-3, 100
    u0 = jnp.asarray(model.ic())
    c_true = jnp.broadcast_to(jnp.asarray(model.true_control()), (steps + 1, g.n, g.n))
    (u_true,) = model.forward(c_true, u0, dt)
    return g, model, dt, steps, u0, c_true, u_true


def test_forward_reaction_term_effect(setup):
    """State solve is sensitive to the control (sanity)."""
    g, model, dt, steps, u0, c_true, u_true = setup
    (u_zero,) = model.forward(jnp.zeros_like(c_true), u0, dt)
    assert float(jnp.linalg.norm(u_true[-1] - u_zero[-1])) > 1e-3


def test_adjoint_gradient_fd(setup):
    """Directional derivative of J vs the adjoint gradient β c - p.

    Optimize-then-discretize adjoints agree with the discrete gradient only
    up to discretization error (and FCT limiter nonsmoothness), so the check
    is loose (few %), which still catches sign/transpose/scaling bugs.
    """
    g, model, dt, steps, u0, c_true, u_true = setup
    beta = 1e-1
    uhat = u_true[-1]
    rng = np.random.default_rng(0)
    c = jnp.asarray(0.3 * np.sin(np.pi * g.xy[0]) * np.cos(np.pi * g.xy[1]))
    c = jnp.broadcast_to(c, (steps + 1, g.n, g.n))
    delta = jnp.asarray(rng.standard_normal((steps + 1, g.n, g.n)) * 0.1)

    def J(ctrl):
        (u,) = model.forward(ctrl, u0, dt)
        return float(
            cost_functional(u, uhat, ctrl, dt, model.M, beta, "finaltime")
        )

    (u,) = model.forward(c, u0, dt)
    (p,) = model.adjoint(u, uhat, dt, "finaltime")
    # <grad J, delta>_{L2(Q)} with grad = beta*c - p  (mass-weighted, trapezoid)
    import jax

    from fem_fct_pdeco_tpu.ops import stencil as st

    per = jax.vmap(lambda gr, de: jnp.sum(st.apply(model.M, gr) * de))(
        beta * c - p, delta
    )
    w = jnp.ones(steps + 1).at[0].set(0.5).at[-1].set(0.5)
    grad_dot = float(jnp.sum(w * per) * dt)

    h = 1e-4
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    assert fd == pytest.approx(grad_dot, rel=0.05), (fd, grad_dot)


def test_pgd_recovers_control(setup):
    g, model, dt, steps, u0, c_true, u_true = setup
    beta = 1e-3
    uhat = u_true[-1]
    cfg = PGDConfig(beta=beta, tol=1e-4, max_iter_gd=12, max_iter_armijo=8,
                    c_lower=-1.0, c_upper=1.0)

    cost_fn = lambda state, c: cost_functional(
        state[0], uhat, c, dt, model.M, beta, "finaltime"
    )
    res = projected_gradient_descent(
        config=cfg,
        c0=jnp.zeros((steps + 1, g.n, g.n)),
        solve_state=lambda c: model.forward(c, u0, dt),
        solve_adjoint=lambda state, c: model.adjoint(state[0], uhat, dt, "finaltime"),
        descent_direction=lambda c, state, adj: model.descent_direction(beta, c, adj[0]),
        cost_fn=cost_fn,
        control_norm_sq=lambda c: l2_norm_sq_q(c, dt, model.M),
        fidelity_fn=lambda state: {
            "u": float(l2_norm_sq_omega(state[0][-1] - uhat, model.M))
        },
    )

    cost0 = res.history["cost"][0]
    misfit_final = res.history["fidelity"][-1]["u"]
    misfit_init = res.history["fidelity"][0]["u"]
    assert res.cost < 0.5 * cost0, (res.cost, cost0)
    assert misfit_final < misfit_init
    # J(c_true) sanity metric: achieved cost should be within a small factor
    j_true = beta / 2 * float(l2_norm_sq_q(c_true, dt, model.M))
    assert res.cost < 10 * max(j_true, 1e-12), (res.cost, j_true)
