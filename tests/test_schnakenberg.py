import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q


@pytest.fixture(scope="module")
def setup():
    g = Grid(0.0, 1.0, 21)
    model = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-12))
    return g, model


def test_forward_stable_and_control_sensitive(setup):
    g, model = setup
    u0, v0 = model.ic()
    dt, steps = 1e-3, 30
    c_true = jnp.full((steps + 1, g.n, g.n), model.params.c_a)
    u, v = model.forward(c_true, jnp.asarray(u0), jnp.asarray(v0), dt)
    assert np.isfinite(np.asarray(u)).all() and np.isfinite(np.asarray(v)).all()
    # u stays positive (FCT bounds + positive source)
    assert float(u.min()) > 0.0
    u2, v2 = model.forward(jnp.zeros_like(c_true), jnp.asarray(u0), jnp.asarray(v0), dt)
    assert float(jnp.linalg.norm(u[-1] - u2[-1])) > 1e-6


def test_adjoint_gradient_fd():
    """β c - (γ/r) p vs finite differences of J.

    Run at γ = 10 rather than the reference's γ = 230.82: at the stiff
    reference value finite differences of J are themselves unstable (FCT
    limiter nonsmoothness amplified by the stiff reaction), while at γ = 10
    the adjoint matches FD to ~1%, which pins the operator transposes and
    scalings (the same code path used at reference parameters).
    """
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergParams

    g = Grid(0.0, 1.0, 21)
    model = SchnakenbergModel(
        g, params=SchnakenbergParams(gamma=10.0), solver_opts=SolverOpts(tol=1e-12)
    )
    u0, v0 = model.ic()
    dt, steps = 1e-3, 20
    beta = 1e-1
    c_true = jnp.full((steps + 1, g.n, g.n), model.params.c_a)
    ut, vt = model.forward(c_true, jnp.asarray(u0), jnp.asarray(v0), dt)
    uhat, vhat = ut[-1], vt[-1]

    c = jnp.zeros((steps + 1, g.n, g.n))
    # smooth, time-constant perturbation: FD with white-noise-in-time deltas
    # probes the O(1) high-frequency mismatch between the continuous adjoint
    # (what the reference discretizes) and the exact discrete gradient, which
    # is not what this test is after.
    rng = np.random.default_rng(1)
    delta = jnp.asarray(rng.standard_normal((g.n, g.n)) * 0.05)
    delta = jnp.broadcast_to(delta, (steps + 1, g.n, g.n))

    def J(ctrl):
        u, v = model.forward(ctrl, jnp.asarray(u0), jnp.asarray(v0), dt)
        return float(
            cost_functional(u, uhat, ctrl, dt, model.M, beta, "finaltime",
                            var2_traj=v, var2_target=vhat)
        )

    u, v = model.forward(c, jnp.asarray(u0), jnp.asarray(v0), dt)
    p, q = model.adjoint(u, v, uhat, vhat, dt)

    import jax

    from fem_fct_pdeco_tpu.ops import stencil as st

    grad = beta * c - model.params.gamma / model.rescaling * p
    per = jax.vmap(lambda gr, de: jnp.sum(st.apply(model.M, gr) * de))(grad, delta)
    w = jnp.ones(steps + 1).at[0].set(0.5).at[-1].set(0.5)
    grad_dot = float(jnp.sum(w * per) * dt)

    h = 1e-5
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    assert fd == pytest.approx(grad_dot, rel=0.05), (fd, grad_dot)
