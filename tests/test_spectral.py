"""Spectral-DCT preconditioning of the XLA-path Krylov solves
(SolverOpts.spectral / linalg.solve_stencil prec): solutions must match the
Jacobi-preconditioned path at solver tolerance — the preconditioner may only
change the iteration count, never the solution."""

import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil, spectral_pinv


def test_solve_stencil_spectral_matches_jacobi():
    from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    n, dt, Df, delta = 33, 1e-3, 0.05, 100.0
    g = Grid(0.0, 1.0, n)
    asm = P1Assembler(g, jnp.float64)
    S = (1.0 + dt * delta) * asm.mass + dt * Df * asm.stiffness
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((n, n)))
    opts = SolverOpts(tol=1e-13, maxiter=800, symmetric=True)
    xj = solve_stencil(S, b, opts=opts)
    C = jnp.asarray(dct_matrix(n))
    ilam = jnp.asarray(dct_precond_ilam(n, g.h, dt, Df, 1.0 + dt * delta))
    xs = solve_stencil(S, b, opts=opts, prec=(C, ilam))
    assert float(jnp.abs(xs - xj).max() / jnp.abs(xj).max()) < 1e-9


def test_spectral_pinv_inverts_stiff_part():
    """P^{-1} is the exact inverse of h²m·I + dt·D·K5 on DCT modes: applying
    it to P @ r must return r (interior 5-point Laplacian grid)."""
    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    n, h, dt, D = 16, 1.0 / 15, 1e-3, 0.05
    C = jnp.asarray(dct_matrix(n))
    ilam = jnp.asarray(dct_precond_ilam(n, h, dt, D))
    rng = np.random.default_rng(0)
    r = jnp.asarray(rng.standard_normal((n, n)))
    # P r in modal space: lam ⊙ (C r C^T), back-transformed
    lam = 1.0 / ilam
    Pr = C.T @ ((C @ r @ C.T) * lam) @ C
    back = spectral_pinv(C, ilam, Pr)
    assert float(jnp.abs(back - r).max()) < 1e-10


def test_model_spectral_parity_chemotaxis():
    """ChemotaxisModel with solver_opts.spectral matches the Jacobi path
    (forward + adjoint) at solver tolerance; dctC rides the hoisted ops."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    n, steps, dt = 33, 4, 1e-3
    g = Grid(0.0, 1.0, n)
    oj = SolverOpts(tol=1e-12, maxiter=500)
    osp = SolverOpts(tol=1e-12, maxiter=500, spectral=True)
    m1 = ChemotaxisModel(g, rescaling=1.0, solver_opts=oj)
    m2 = ChemotaxisModel(g, rescaling=1.0, solver_opts=osp)
    assert m2.dctC is not None
    u0np, v0np = m1.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), 100.0)
    u1, v1 = m1.forward(c, u0, v0, dt)
    u2, v2 = m2.forward(c, u0, v0, dt)
    assert float(jnp.abs(u2 - u1).max()) < 1e-8
    assert float(jnp.abs(v2 - v1).max()) < 1e-8
    p1, q1 = m1.adjoint(u1, v1, 1.01 * u1[-1], 1.02 * v1[-1], c, dt, "finaltime")
    p2, q2 = m2.adjoint(u1, v1, 1.01 * u1[-1], 1.02 * v1[-1], c, dt, "finaltime")
    assert float(jnp.abs(p2 - p1).max() / (jnp.abs(p1).max() + 1e-30)) < 1e-8
    assert float(jnp.abs(q2 - q1).max() / (jnp.abs(q1).max() + 1e-30)) < 1e-8


def test_model_spectral_parity_schnakenberg():
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    n, steps, dt = 24, 4, 5e-4
    g = Grid(0.0, 1.0, n)
    m1 = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-12, maxiter=500))
    m2 = SchnakenbergModel(
        g, solver_opts=SolverOpts(tol=1e-12, maxiter=500, spectral=True))
    u0np, v0np = m1.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), 0.1)
    u1, v1 = m1.forward(c, u0, v0, dt)
    u2, v2 = m2.forward(c, u0, v0, dt)
    assert float(jnp.abs(u2 - u1).max() / jnp.abs(u1).max()) < 1e-8
    p1, q1 = m1.adjoint(u1, v1, 1.01 * u1[-1], 1.02 * v1[-1], dt, "finaltime")
    p2, q2 = m2.adjoint(u1, v1, 1.01 * u1[-1], 1.02 * v1[-1], dt, "finaltime")
    assert float(jnp.abs(p2 - p1).max() / (jnp.abs(p1).max() + 1e-30)) < 1e-8


def test_spectral_gradient_vjp():
    """The preconditioned solve keeps the implicit-function-theorem VJP:
    jax.grad through solve_stencil(prec=...) matches the Jacobi path."""
    from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    n, dt, Df = 17, 1e-3, 0.05
    g = Grid(0.0, 1.0, n)
    asm = P1Assembler(g, jnp.float64)
    S = asm.mass + dt * Df * asm.stiffness
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((n, n)))
    opts = SolverOpts(tol=1e-13, maxiter=500, symmetric=True)
    C = jnp.asarray(dct_matrix(n))
    ilam = jnp.asarray(dct_precond_ilam(n, g.h, dt, Df))

    gj = jax.grad(lambda bb: jnp.sum(solve_stencil(S, bb, opts=opts) ** 2))(b)
    gs = jax.grad(lambda bb: jnp.sum(
        solve_stencil(S, bb, opts=opts, prec=(C, ilam)) ** 2))(b)
    assert float(jnp.abs(gs - gj).max() / jnp.abs(gj).max()) < 1e-8
