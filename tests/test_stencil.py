import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import CENTER, OFFSETS, Grid
from fem_fct_pdeco_tpu.ops import stencil as st


def random_stencil(n, rng):
    """Random stencil respecting the out-of-domain-zero invariant."""
    S = rng.standard_normal((9, n, n))
    for d, (di, dj) in enumerate(OFFSETS):
        if di == -1:
            S[d, 0, :] = 0
        if di == 1:
            S[d, -1, :] = 0
        if dj == -1:
            S[d, :, 0] = 0
        if dj == 1:
            S[d, :, -1] = 0
    return S


def test_apply_matches_dense():
    rng = np.random.default_rng(0)
    n = 6
    S = random_stencil(n, rng)
    x = rng.standard_normal((n, n))
    A = st.to_dense(S)
    y = np.asarray(st.apply(jnp.asarray(S), jnp.asarray(x)))
    np.testing.assert_allclose(y.ravel(), A @ x.ravel(), rtol=1e-13, atol=1e-13)


def test_apply_t_and_transpose():
    rng = np.random.default_rng(1)
    n = 5
    S = random_stencil(n, rng)
    x = rng.standard_normal((n, n))
    A = st.to_dense(S)
    yt = np.asarray(st.apply_t(jnp.asarray(S), jnp.asarray(x)))
    np.testing.assert_allclose(yt.ravel(), A.T @ x.ravel(), rtol=1e-13, atol=1e-13)
    T = np.asarray(st.transpose(jnp.asarray(S)))
    np.testing.assert_allclose(st.to_dense(T), A.T, rtol=1e-13, atol=1e-13)


def test_from_dense_roundtrip():
    rng = np.random.default_rng(2)
    n = 5
    S = random_stencil(n, rng)
    A = st.to_dense(S)
    S2 = st.from_dense(A, n)
    np.testing.assert_allclose(S2, S, atol=1e-14)


def test_row_sum_and_diag():
    rng = np.random.default_rng(3)
    n = 5
    S = random_stencil(n, rng)
    A = st.to_dense(S)
    np.testing.assert_allclose(
        np.asarray(st.row_sum(jnp.asarray(S))).ravel(), A.sum(axis=1), atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(st.diag(jnp.asarray(S))).ravel(), np.diag(A), atol=1e-14
    )


def test_grid_dof_roundtrip():
    g = Grid(0.0, 1.0, 7)
    rng = np.random.default_rng(4)
    f = rng.standard_normal((7, 7))
    np.testing.assert_array_equal(g.field_from_dof(g.field_to_dof(f)), f)
    v = rng.standard_normal(49)
    np.testing.assert_array_equal(g.field_to_dof(g.field_from_dof(v)), v)


def test_dof_order_matches_reference_fixture():
    """The closed-form DoF ordering reproduces dolfin's vertex_to_dof_map,
    verified against the seeded chemotaxis IC fixture (helpers.py:1242-1247)."""
    import os

    path = "/root/reference/Chtxs_data_dx0.025_dt0.001/chtxs_m_t0.01.csv"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference fixture unavailable")
    frame0 = np.genfromtxt(path, delimiter=",")[: 41 * 41]
    np.random.seed(5)
    u_init = 1.5 + 0.1 * (0.5 - np.random.rand(41, 41))
    g = Grid(0.0, 1.0, 41)
    np.testing.assert_array_equal(g.field_to_dof(u_init), frame0)
    np.testing.assert_array_equal(g.field_from_dof(frame0), u_init)
