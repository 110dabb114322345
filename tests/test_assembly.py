import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
from fem_fct_pdeco_tpu.ops.quadrature import collapsed_rule, rule_for_degree

import oracles


@pytest.fixture(scope="module")
def asm():
    return P1Assembler(Grid(0.0, 1.0, 9))


def test_quadrature_exactness():
    """Collapsed rule with m points integrates total degree 2m-1 exactly."""
    from math import factorial

    for m in (1, 2, 3, 4):
        pts, wts = collapsed_rule(m)
        for a in range(0, 2 * m):
            for b in range(0, 2 * m - a):
                exact = factorial(a) * factorial(b) / factorial(a + b + 2)
                got = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
                np.testing.assert_allclose(got, exact, rtol=1e-13, err_msg=f"{m=} {a=} {b=}")


def test_mass_matches_dense(asm):
    M = np.asarray(asm.mass)
    Md = oracles.mass_dense(asm.n, asm.h)
    np.testing.assert_allclose(st.to_dense(M), Md, rtol=1e-13, atol=1e-16)
    # total mass = domain area
    np.testing.assert_allclose(M.sum(), 1.0, rtol=1e-12)


def test_lumped_mass(asm):
    ML = np.asarray(asm.lumped_mass_diag)
    Md = oracles.mass_dense(asm.n, asm.h)
    np.testing.assert_allclose(ML.ravel(), Md.sum(axis=1), rtol=1e-13)


def test_stiffness_matches_dense(asm):
    K = st.to_dense(np.asarray(asm.stiffness))
    Kd = oracles.stiffness_dense(asm.n, asm.h)
    np.testing.assert_allclose(K, Kd, rtol=1e-12, atol=1e-14)
    # interior row = 5-point Laplacian, diagonal-neighbor entries vanish
    n = asm.n
    i = (n // 2) * n + n // 2
    row = K[i]
    assert row[i] == pytest.approx(4.0)
    assert row[i + 1] == pytest.approx(-1.0)
    assert row[i + n + 1] == pytest.approx(0.0, abs=1e-14)
    np.testing.assert_allclose(K.sum(axis=1), 0.0, atol=1e-12)


def test_weighted_mass_constant_equals_mass(asm):
    g = jnp.ones((2, asm.rule(4)[0].shape[0], asm.nc, asm.nc))
    W = np.asarray(asm.weighted_mass(g))
    np.testing.assert_allclose(st.to_dense(W), st.to_dense(np.asarray(asm.mass)), atol=1e-15)


def test_convection_matches_dense(asm):
    wind = lambda x, y: (y * (1 - x), -x * (1 - y) * y)
    N = st.to_dense(np.asarray(asm.convection(wind)))
    pts, wts = rule_for_degree(5)
    Nd = oracles.convection_dense(asm.n, asm.h, wind, pts, wts)
    np.testing.assert_allclose(N, Nd, rtol=1e-12, atol=1e-15)


def test_convection_row_sums(asm):
    """Row sums of N = int (w . grad phi_a): equals w . int grad phi_a dx."""
    wind = lambda x, y: (np.ones_like(x), 2 * np.ones_like(x))
    N = st.to_dense(np.asarray(asm.convection(wind)))
    # For constant w, sum_b N_ab = int w.grad(phi_a) dx ; interior rows -> 0
    n = asm.n
    interior = np.zeros((n, n), dtype=bool)
    interior[1:-1, 1:-1] = True
    rows = N.sum(axis=1).reshape(n, n)
    np.testing.assert_allclose(rows[interior], 0.0, atol=1e-14)


def test_advective_with_elem_grad_is_exact(asm):
    """Chemotaxis-type matrix with g=1: int (grad v_h . grad phi_a) phi_b."""
    rng = np.random.default_rng(0)
    vfield = rng.standard_normal((asm.n, asm.n))
    G = asm.elem_grad(jnp.asarray(vfield))
    S = st.to_dense(np.asarray(asm.advective(G, degree=4)))

    pts, wts = rule_for_degree(4)
    lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)

    # oracle: dense assembly over triangles with per-triangle constant grad v_h
    coords = oracles.tri_coords(asm.n, asm.h)
    N = asm.n * asm.n
    Ad = np.zeros((N, N))
    vflat = vfield.ravel()
    for tri in oracles.triangles(asm.n):
        P = coords[list(tri)]
        Gd = oracles.p1_grads(P)
        area = oracles.tri_area(P)
        gv = sum(vflat[tri[a]] * Gd[a] for a in range(3))
        for a in range(3):
            for b in range(3):
                Ad[tri[a], tri[b]] += 2 * area * np.sum(
                    wts * (gv @ Gd[a]) * lam[:, b]
                )
    np.testing.assert_allclose(S, Ad, rtol=1e-11, atol=1e-13)


def test_linear_form_p1_equals_mass_apply(asm):
    rng = np.random.default_rng(1)
    f = rng.standard_normal((asm.n, asm.n))
    fq = asm.nodal_at_quad(jnp.asarray(f), degree=4)
    b = np.asarray(asm.linear_form(fq, degree=4))
    expect = st.to_dense(np.asarray(asm.mass)) @ f.ravel()
    np.testing.assert_allclose(b.ravel(), expect, rtol=1e-12, atol=1e-15)


def test_elem_grad_linear_field(asm):
    X, Y = asm.grid.xy
    f = 3.0 * X - 2.0 * Y
    G = np.asarray(asm.elem_grad(jnp.asarray(f)))
    np.testing.assert_allclose(G[:, 0], 3.0, rtol=1e-12)
    np.testing.assert_allclose(G[:, 1], -2.0, rtol=1e-12)
