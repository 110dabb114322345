"""Batched multi-scenario solves via vmap (serving-style workload)."""

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


def test_batched_forward_matches_individual():
    g = Grid(0.0, 1.0, 16)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-12))
    u0np, v0np = model.ic()
    u0 = jnp.asarray(u0np)
    v0 = jnp.asarray(v0np)
    dt, steps, B = 5e-4, 5, 3
    cs = jnp.stack([jnp.full((steps + 1, g.n, g.n), val) for val in (50.0, 100.0, 150.0)])
    u0s = jnp.broadcast_to(u0, (B, g.n, g.n))
    v0s = jnp.broadcast_to(v0, (B, g.n, g.n))

    ub, vb = model.forward_batched(cs, u0s, v0s, dt)
    assert ub.shape == (B, steps + 1, g.n, g.n)
    for k in range(B):
        u1, v1 = model.forward(cs[k], u0, v0, dt)
        np.testing.assert_allclose(np.asarray(ub[k]), np.asarray(u1), rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(vb[k]), np.asarray(v1), rtol=1e-10, atol=1e-12)
