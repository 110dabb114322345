import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
from fem_fct_pdeco_tpu.ops.fct import artificial_diffusion, fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, chebsi, solve_stencil

import oracles


@pytest.fixture(scope="module")
def setup():
    g = Grid(0.0, 1.0, 9)
    asm = P1Assembler(g)
    eps = 1e-3
    wind = lambda x, y: (2 * (y - 0.5) * x * (1 - x), -2 * (x - 0.5) * y * (1 - y))
    # ref convention flux matrix: A such that du/dt + A u = rhs
    # (advection - diffusion: Mat = eps*Ad - N, cf. helpers.py:933-935 sign)
    N = asm.convection(wind)
    A = eps * asm.stiffness - N
    return g, asm, np.asarray(A)


def test_artificial_diffusion_matches_dense(setup):
    _, asm, A = setup
    D = np.asarray(artificial_diffusion(jnp.asarray(A)))
    Dd = oracles.artificial_diffusion_dense(-st.to_dense(A))
    np.testing.assert_allclose(st.to_dense(D), Dd, rtol=1e-12, atol=1e-15)
    # zero row sums, symmetric off-diagonal, nonneg off-diagonals
    np.testing.assert_allclose(st.to_dense(D).sum(axis=1), 0.0, atol=1e-14)


def test_chebsi_matches_dense(setup):
    _, asm, _ = setup
    rng = np.random.default_rng(0)
    b = rng.standard_normal((asm.n, asm.n))
    Mdense = st.to_dense(np.asarray(asm.mass))
    got = np.asarray(chebsi(jnp.asarray(b), asm.mass, asm.mass_diag))
    want = oracles.chebsi_dense(b.ravel(), Mdense, np.diag(Mdense).copy())
    np.testing.assert_allclose(got.ravel(), want, rtol=1e-10, atol=1e-12)


def test_solve_stencil_accuracy(setup):
    _, asm, A = setup
    dt = 1e-3
    Low = jnp.asarray(A) * dt
    Low = Low.at[4].add(asm.lumped_mass_diag)
    rng = np.random.default_rng(1)
    b = rng.standard_normal((asm.n, asm.n))
    x = np.asarray(solve_stencil(Low, jnp.asarray(b), opts=SolverOpts(tol=1e-13)))
    from scipy.sparse.linalg import spsolve
    import scipy.sparse as sp

    xd = spsolve(sp.csr_matrix(st.to_dense(np.asarray(Low))), b.ravel())
    np.testing.assert_allclose(x.ravel(), xd, rtol=1e-9, atol=1e-11)


def test_fct_step_matches_dense_oracle(setup):
    g, asm, A = setup
    dt = 1e-3
    rng = np.random.default_rng(2)
    u_n = np.abs(rng.standard_normal((asm.n, asm.n)))
    rhs = rng.standard_normal((asm.n, asm.n))

    u1 = np.asarray(
        fct_step(
            jnp.asarray(A),
            jnp.asarray(rhs),
            jnp.asarray(u_n),
            dt,
            asm.mass,
            asm.mass_diag,
            asm.lumped_mass_diag,
            solver=SolverOpts(tol=1e-13),
        )
    )

    nbrs = oracles.neighbors(g.n)
    u1d = oracles.fct_step_dense(
        st.to_dense(A),
        rhs.ravel(),
        u_n.ravel(),
        dt,
        st.to_dense(np.asarray(asm.mass)),
        np.asarray(asm.lumped_mass_diag).ravel(),
        nbrs,
    )
    np.testing.assert_allclose(u1.ravel(), u1d, rtol=1e-8, atol=1e-10)


def test_fct_step_with_non_flux_matches_oracle(setup):
    g, asm, A = setup
    dt = 1e-3
    rng = np.random.default_rng(3)
    u_n = np.abs(rng.standard_normal((asm.n, asm.n)))
    rhs = rng.standard_normal((asm.n, asm.n))
    # reaction-type non-flux matrix: u_h^2-weighted mass (helpers.py:953-958)
    w = rng.standard_normal((asm.n, asm.n))
    NF = asm.weighted_mass(asm.nodal_at_quad(jnp.asarray(w)) ** 2)

    u1 = np.asarray(
        fct_step(
            jnp.asarray(A),
            jnp.asarray(rhs),
            jnp.asarray(u_n),
            dt,
            asm.mass,
            asm.mass_diag,
            asm.lumped_mass_diag,
            non_flux=NF,
            solver=SolverOpts(tol=1e-13),
        )
    )
    u1d = oracles.fct_step_dense(
        st.to_dense(np.asarray(A)),
        rhs.ravel(),
        u_n.ravel(),
        dt,
        st.to_dense(np.asarray(asm.mass)),
        np.asarray(asm.lumped_mass_diag).ravel(),
        oracles.neighbors(g.n),
        non_flux=st.to_dense(np.asarray(NF)),
    )
    np.testing.assert_allclose(u1.ravel(), u1d, rtol=1e-8, atol=1e-10)


def test_fct_preserves_local_bounds(setup):
    """FCT solution stays within the local bounds of the low-order solution
    when rhs = 0 (the defining property of the limiter)."""
    g, asm, A = setup
    dt = 1e-3
    rng = np.random.default_rng(4)
    u_n = rng.uniform(0.0, 1.0, (asm.n, asm.n))
    u1 = np.asarray(
        fct_step(
            jnp.asarray(A),
            jnp.zeros((asm.n, asm.n)),
            jnp.asarray(u_n),
            dt,
            asm.mass,
            asm.mass_diag,
            asm.lumped_mass_diag,
            solver=SolverOpts(tol=1e-13),
        )
    )
    # global bounds of the low-order scheme are respected up to tiny slack
    assert u1.min() >= u_n.min() - 1e-8
    assert u1.max() <= u_n.max() + 1e-8


def test_fct_step_matches_legacy_oracle():
    """fct_step(-A_leg, rhs, ..., non_flux=S) reproduces the LEGACY FCT_alg
    (old_helpers.py:115-204, its own low-order matrix and ChebSI signs) —
    pinning the legacy->current mapping used by the solid-body and drift
    drivers."""
    import jax.numpy as jnp
    import oracles

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel, rotation_drift_wind
    from fem_fct_pdeco_tpu.ops import stencil as st
    from fem_fct_pdeco_tpu.ops.fct import fct_step
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, dt = 17, 1e-3
    g = Grid(-1.0, 1.0, n)
    model = AdvectionModel(g, eps=0.0, wind_fn=rotation_drift_wind(np.pi / 40),
                           solver_opts=SolverOpts(tol=1e-14))
    # legacy convention: A_leg = A_adv - eps*Ad = N (eps=0); ours A = -A_leg
    A_leg = st.to_dense(np.asarray(model.N))
    M = st.to_dense(np.asarray(model.M))
    ML = np.asarray(model.ML_diag).ravel()
    nbrs = oracles.neighbors(n)
    rng = np.random.default_rng(3)
    u_n = rng.uniform(0.0, 1.0, (n, n))
    rhs = rng.standard_normal((n, n))
    S = 0.3 * M  # exercise the source_mat path too

    want = oracles.fct_alg_legacy_dense(
        A_leg, rhs.ravel(), u_n.ravel(), dt, M, ML, nbrs, source_mat=S)
    Sst = 0.3 * model.M
    got = fct_step(-model.N, jnp.asarray(rhs), jnp.asarray(u_n), dt, model.M,
                   model.M_diag, model.ML_diag, non_flux=Sst,
                   solver=SolverOpts(tol=1e-14))
    np.testing.assert_allclose(np.asarray(got).ravel(), want, rtol=1e-9, atol=1e-11)
