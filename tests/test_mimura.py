import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.mimura import MimuraModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional


def test_forward_pattern_growth():
    """Feathers system from near-uniform IC stays stable and the reaction
    drives m toward the m=1 logistic branch."""
    g = Grid.from_spacing(0.0, 10.0, 0.5)
    model = MimuraModel(g, solver_opts=SolverOpts(tol=1e-12))
    m0, f0 = model.ic()
    dt, steps = 1e-2, 30
    c = jnp.ones((steps + 1, g.n, g.n))
    m, f = model.forward(c, jnp.asarray(m0), jnp.asarray(f0), dt)
    assert np.isfinite(np.asarray(m)).all() and np.isfinite(np.asarray(f)).all()
    # mean m decreases toward 1 from 1.5 under m^2(1-m)
    assert float(m[-1].mean()) < float(m[0].mean())
    assert float(m[-1].mean()) > 0.9


def test_adjoint_gradient_fd():
    g = Grid.from_spacing(0.0, 10.0, 1.0)
    model = MimuraModel(g, solver_opts=SolverOpts(tol=1e-12))
    m0, f0 = model.ic()
    m0, f0 = jnp.asarray(m0), jnp.asarray(f0)
    dt, steps, beta = 1e-2, 10, 1e-2
    c_true = jnp.ones((steps + 1, g.n, g.n))
    mt, ft = model.forward(c_true, m0, f0, dt)
    mhat, fhat = mt[-1], ft[-1]

    c = jnp.full((steps + 1, g.n, g.n), 0.5)
    rng = np.random.default_rng(3)
    delta = jnp.broadcast_to(
        jnp.asarray(rng.standard_normal((g.n, g.n)) * 0.05), (steps + 1, g.n, g.n)
    )

    def J(ctrl):
        m, f = model.forward(ctrl, m0, f0, dt)
        return float(cost_functional(m, mhat, ctrl, dt, model.M, beta, "finaltime",
                                     var2_traj=f, var2_target=fhat))

    m, f = model.forward(c, m0, f0, dt)
    p, q = model.adjoint(m, f, mhat, fhat, c, dt, "finaltime")

    import jax

    from fem_fct_pdeco_tpu.ops import stencil as st

    grad = beta * c - q * m / model.rescaling
    per = jax.vmap(lambda gr, de: jnp.sum(st.apply(model.M, gr) * de))(grad, delta)
    w = jnp.ones(steps + 1).at[0].set(0.5).at[-1].set(0.5)
    grad_dot = float(jnp.sum(w * per) * dt)

    h = 1e-4
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    assert fd == pytest.approx(grad_dot, rel=0.06), (fd, grad_dot)
