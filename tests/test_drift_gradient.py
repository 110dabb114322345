"""Drift-control adjoint/gradient validation against finite differences.

The drift-velocity control problem (advection_solidbody_FCT_PDECO_finaltime.py)
has the most intricate gradient of the five families: the control enters the
state operator bilinearly (per-step Adrift1/Adrift2 pseudo-matrices,
reference :187-191) and the descent direction is the ChebSI-projected
M-inner-product gradient (reference :228-238). This pins the hand-derived
continuous adjoint against central finite differences of the discrete
objective: the gap is the optimize-then-discretize mismatch, which must be
small and shrink under time refinement.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.advection import DriftControlModel
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional


def _setup(n=16, refine=1):
    g = Grid(-1.0, 1.0, n)
    dt = g.h**2 / refine
    steps = 16 * refine
    m = DriftControlModel(g, eps=1e-4, om=2 * np.pi, drift=(1.0, 1.0),
                          solver_opts=SolverOpts(tol=1e-13))
    X, Y = g.xy
    u0 = jnp.exp(-8 * ((X - 0.2) ** 2 + (Y + 0.1) ** 2))
    uhat = m.forward(jnp.full((steps + 1, n, n), 0.5), u0, dt)[-1]
    return g, m, u0, uhat, dt, steps


def _fd_vs_adjoint(refine):
    beta = 1e-2
    g, m, u0, uhat, dt, steps = _setup(refine=refine)
    n = g.n
    c = jnp.full((steps + 1, n, n), 0.2)
    rng = np.random.default_rng(3)
    delta = jnp.broadcast_to(jnp.asarray(rng.standard_normal((n, n))),
                             (steps + 1, n, n))
    # spatially smooth perturbation (lumped-mass smoothing) keeps the FCT
    # limiter's min/max kinks from dominating the directional derivative
    delta = jax.vmap(lambda d: st.apply(m.M, d) / m.ML_diag)(delta)

    def J(ctrl):
        u = m.forward(ctrl, u0, dt)
        return float(cost_functional(u, uhat, ctrl, dt, m.M, beta, "finaltime"))

    u = m.forward(c, u0, dt)
    p = m.adjoint(u, uhat, c, dt, "finaltime")
    d = m.descent_direction(beta, c, u, p)
    # <grad J, delta>_{L2(Q)} with grad = -d in the M-inner product
    per = jax.vmap(lambda di, de: jnp.sum(st.apply(m.M, -di) * de))(d, delta)
    w = jnp.ones(steps + 1).at[0].set(0.5).at[-1].set(0.5)
    grad_dot = float(jnp.sum(w * per) * dt)

    h = 1e-5
    fd = (J(c + h * delta) - J(c - h * delta)) / (2 * h)
    rel = abs(fd - grad_dot) / abs(fd)
    return rel, (J, c, d, dt, m)


def test_drift_adjoint_gradient_fd():
    """Adjoint-based gradient matches finite differences to the
    optimize-then-discretize consistency level, improving under dt
    refinement, and the projected direction genuinely descends."""
    rel1, (J, c, d, dt, m) = _fd_vs_adjoint(refine=1)
    assert rel1 < 0.10, rel1

    # time refinement shrinks the discretize/optimize mismatch (measured
    # 6.7e-2 -> 4.2e-2 for refine 1 -> 2)
    rel2, _ = _fd_vs_adjoint(refine=2)
    assert rel2 < 0.8 * rel1, (rel1, rel2)

    # descent: a small step along d reduces J
    j0 = J(c)
    j1 = J(c + 1e-2 * d)
    assert j1 < j0, (j0, j1)
