"""Segmented checkpoint/recompute adjoint equals the full-trajectory adjoint."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


@pytest.mark.parametrize("optim,consistent", [
    ("finaltime", False),
    ("alltime", False),
    ("alltime", True),  # mass-weighted M(û-u) misfit variant
])
def test_checkpointed_adjoint_matches_full(optim, consistent):
    g = Grid(0.0, 1.0, 21)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                            consistent_alltime_misfit=consistent)
    u0np, v0np = model.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    dt, steps = 1e-3, 12
    c = jnp.full((steps + 1, g.n, g.n), 100.0)

    u, v = model.forward(c, u0, v0, dt)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    else:
        uhat, vhat = 1.01 * u, 1.02 * v
    p_full, q_full = model.adjoint(u, v, uhat, vhat, c, dt, optim)
    p_ck, q_ck = model.adjoint_checkpointed(c, u0, v0, uhat, vhat, dt, optim,
                                            num_segments=3)
    assert p_ck.shape == p_full.shape
    np.testing.assert_allclose(np.asarray(p_ck), np.asarray(p_full),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(q_ck), np.asarray(q_full),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_checkpointed_adjoint_nonlinear(optim):
    """The generalized timeloop.checkpointed_adjoint on the nonlinear model."""
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, 17)
    model = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    u0 = jnp.asarray(model.ic())
    dt, steps = 1e-3, 12
    c = jnp.broadcast_to(jnp.asarray(model.true_control()), (steps + 1, g.n, g.n))
    (u,) = model.forward(c, u0, dt)
    uhat = 1.01 * u[-1] if optim == "finaltime" else 1.01 * u
    (p_full,) = model.adjoint(u, uhat, dt, optim)
    (p_ck,) = model.adjoint_checkpointed(c, u0, uhat, dt, optim, num_segments=3)
    np.testing.assert_allclose(np.asarray(p_ck), np.asarray(p_full),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("optim,with_g", [
    ("finaltime", False),
    ("alltime", False),
    ("finaltime", True),  # MMS-exact configuration: source f + reaction g
])
def test_checkpointed_adjoint_advection(optim, with_g):
    """AdvectionModel.adjoint_checkpointed matches adjoint(forward(...)),
    including the source/reaction trajectories of the MMS-exact drivers."""
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind

    g = Grid(0.0, 1.0, 17)
    model = AdvectionModel(g, 1e-3, vortex_wind(1.0),
                           solver_opts=SolverOpts(tol=1e-13))
    X, Y = g.xy
    u0 = jnp.asarray(np.exp(-20.0 * ((X - 0.5) ** 2 + (Y - 0.5) ** 2)))
    dt, steps = 1e-3, 12
    rng = np.random.RandomState(3)
    c = jnp.asarray(rng.rand(steps + 1, g.n, g.n))
    kw = {}
    if with_g:
        kw = dict(source_traj=jnp.asarray(rng.rand(steps + 1, g.n, g.n)),
                  reaction_traj=jnp.asarray(0.5 * rng.rand(steps + 1, g.n, g.n)))
    u = model.forward(c, u0, dt, **kw)
    uhat = 1.01 * u[-1] if optim == "finaltime" else 1.01 * u
    p_full = model.adjoint(u, uhat, dt, optim,
                           reaction_traj=kw.get("reaction_traj"))
    p_ck = model.adjoint_checkpointed(c, u0, uhat, dt, optim, num_segments=3,
                                      **kw)
    np.testing.assert_allclose(np.asarray(p_ck), np.asarray(p_full),
                               rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_checkpointed_adjoint_schnakenberg(optim):
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, 17)
    model = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    u0np, v0np = model.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    dt, steps = 5e-4, 12
    c = jnp.full((steps + 1, g.n, g.n), 0.1)
    u, v = model.forward(c, u0, v0, dt)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    else:
        uhat, vhat = 1.01 * u, 1.02 * v
    p_full, q_full = model.adjoint(u, v, uhat, vhat, dt, optim)
    p_ck, q_ck = model.adjoint_checkpointed(c, u0, v0, uhat, vhat, dt, optim,
                                            num_segments=4)
    np.testing.assert_allclose(np.asarray(p_ck), np.asarray(p_full),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(q_ck), np.asarray(q_full),
                               rtol=1e-9, atol=1e-12)
