"""Pallas kernels vs their XLA counterparts (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid, EDGE_NEIGHBOR_IDS
from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
from fem_fct_pdeco_tpu.ops import pallas_kernels as pk
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import artificial_diffusion, fct_step, low_order_matrix, zalesak_limit
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, chebsi, solve_stencil


@pytest.fixture(scope="module")
def setup():
    g = Grid(0.0, 1.0, 32)
    model = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                           solver_opts=SolverOpts(tol=1e-13))
    return g, model


def test_chebsi_pallas_matches(setup):
    g, model = setup
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((g.n, g.n)))
    got = pk.chebsi_pallas(b, model.M, model.M_diag)
    want = chebsi(b, model.M, model.M_diag)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11, atol=1e-12)


def test_bicgstab_pallas_solves(setup):
    g, model = setup
    dt = 1e-3
    A = model.A_state
    D = artificial_diffusion(A)
    Low = low_order_matrix(A, D, model.ML_diag, dt)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((g.n, g.n))) * float(model.ML_diag.mean())
    x = pk.bicgstab_pallas(Low, b, iters=30, tol=1e-13)
    r = st.apply(Low, x) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-10, rel


def test_cg_pallas_solves(setup):
    g, model = setup
    Mat = model.M + 1e-3 * model.K
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((g.n, g.n))) * float(model.M_diag.mean())
    x = pk.cg_pallas(Mat, b, iters=40, tol=1e-13)
    r = st.apply(Mat, x) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-9, rel


def test_flux_zalesak_pallas_matches(setup):
    g, model = setup
    dt = 1e-3
    rng = np.random.default_rng(3)
    A = model.A_state
    D = artificial_diffusion(A)
    u_low = jnp.asarray(rng.uniform(0, 1, (g.n, g.n)))
    du = jnp.asarray(rng.standard_normal((g.n, g.n)))
    got = pk.flux_zalesak_pallas(model.M, D, du, u_low, model.ML_diag, dt)
    fluxes = jnp.stack([
        model.M[d] * (du - st.shift(du, d)) + D[d] * (u_low - st.shift(u_low, d))
        for d in EDGE_NEIGHBOR_IDS
    ])
    fbar = zalesak_limit(fluxes, u_low, model.ML_diag, dt)
    want = u_low + dt * fbar / model.ML_diag
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11, atol=1e-12)


def test_fused_chemotaxis_step_matches_xla():
    """Whole-step fused kernels vs the XLA path (interpret mode, f64)."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 32)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    mf = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((4, g.n, g.n), 100.0)
    ux, vx = mx.forward(c, u0, v0, 1e-3)
    uf, vf = mf.forward(c, u0, v0, 1e-3)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_fused_chemotaxis_adjoint_matches_xla(optim):
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 32)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    mf = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((4, g.n, g.n), 100.0)
    u, v = mx.forward(c, u0, v0, 1e-3)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    else:
        uhat, vhat = 1.01 * u, 1.02 * v
    px, qx = mx.adjoint(u, v, uhat, vhat, c, 1e-3, optim)
    pf, qf = mf.adjoint(u, v, uhat, vhat, c, 1e-3, optim)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-10, atol=1e-13)


def test_fct_step_pallas_backend_matches(setup):
    g, model = setup
    dt = 1e-3
    rng = np.random.default_rng(4)
    u_n = jnp.asarray(rng.uniform(0, 1, (g.n, g.n)))
    rhs = jnp.asarray(rng.standard_normal((g.n, g.n)))
    a = fct_step(model.A_state, rhs, u_n, dt, model.M, model.M_diag,
                 model.ML_diag, solver=SolverOpts(tol=1e-13))
    b = fct_step(model.A_state, rhs, u_n, dt, model.M, model.M_diag,
                 model.ML_diag, backend="pallas", pallas_solver_iters=40)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_vmem_guard_falls_back_to_xla():
    """A grid exceeding the single-block VMEM budget must not construct a
    pallas-backed model: the backend falls back to XLA with a warning."""
    import pytest as _pytest

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

    n_big = 512
    assert not fits_vmem(n_big, jnp.float64)
    with _pytest.warns(UserWarning, match="VMEM"):
        model = ChemotaxisModel(Grid(0.0, 1.0, n_big), backend="pallas_fused")
    assert model.backend == "xla"
    # a fitting grid keeps the requested backend
    assert ChemotaxisModel(Grid(0.0, 1.0, 32), backend="pallas_fused").backend == "pallas_fused"


def test_fused_schnak_sweep_matches_xla():
    """Whole-sweep fused Schnakenberg forward + adjoint vs the XLA path
    (interpret mode, f64)."""
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, 24)
    mx = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    dt = 5e-4
    c = jnp.full((4, g.n, g.n), 0.1)
    ux, vx = mx.forward(c, u0, v0, dt)
    uf, vf = mf.forward(c, u0, v0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, optim)
        pf, qf = mf.adjoint(ux, vx, uhat, vhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-9, atol=1e-12)


def test_fused_nonlinear_sweep_matches_xla():
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, 24)
    mx = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    u0 = jnp.asarray(mx.ic())
    dt = 1e-3
    c = jnp.broadcast_to(jnp.asarray(mx.true_control()), (5, g.n, g.n))
    (ux,) = mx.forward(c, u0, dt)
    (uf,) = mf.forward(c, u0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-13)
    for optim in ("finaltime", "alltime"):
        uhat = 1.01 * ux[-1] if optim == "finaltime" else 1.01 * ux
        (px,) = mx.adjoint(ux, uhat, dt, optim)
        (pf,) = mf.adjoint(ux, uhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-13)


def test_fused_advection_sweep_matches_xla():
    g = Grid(0.0, 1.0, 24)
    mx = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13))
    mf = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    X, Y = g.xy
    u0 = jnp.asarray(np.sin(np.pi * X) * np.sin(np.pi * Y))
    dt = 1e-3
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((5, g.n, g.n)))
    f = jnp.asarray(rng.standard_normal((5, g.n, g.n)))
    ux = mx.forward(c, u0, dt, source_traj=f)
    uf = mf.forward(c, u0, dt, source_traj=f)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-9, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        uhat = 1.01 * ux[-1] if optim == "finaltime" else 1.01 * ux
        px = mx.adjoint(ux, uhat, dt, optim)
        pf = mf.adjoint(ux, uhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-13)


def test_fused_mimura_sweep_matches_xla():
    """Mimura's m²(1-m) reaction inside the whole-sweep kernels (previously
    a silent fallback to the piecewise path)."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid(0.0, 10.0, 21)
    mx = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    m0np, f0np = mx.ic()
    m0, f0 = jnp.asarray(m0np), jnp.asarray(f0np)
    dt = 0.05
    c = jnp.ones((4, g.n, g.n))
    ux, vx = mx.forward(c, m0, f0, dt)
    uf, vf = mf.forward(c, m0, f0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        pf, qf = mf.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-9, atol=1e-12)
