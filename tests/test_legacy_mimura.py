"""Legacy m(4-m) Mimura variant vs an independent dense oracle.

The oracle re-states the legacy builders (old_helpers.py:87-111) with exact
barycentric integration (all integrands are polynomial once the fields are
P1) and the verbatim legacy FCT algorithm (oracles.fct_alg_legacy_dense),
composed in the loop order of chemotaxis_mimura_FCT_PGD.py:160-225.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve

import oracles
from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.legacy_mimura import LegacyM4MimuraModel, LegacyM4Params
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

N = 9
H = 0.25
DT = 0.05
STEPS = 3
P = LegacyM4Params()


def _int_lam(powers, area):
    """Exact integral of a barycentric monomial over a triangle:
    ∫ λ1^a λ2^b λ3^c dx = 2A a! b! c! / (a+b+c+2)!."""
    s = sum(powers)
    num = 1.0
    for p in powers:
        num *= math.factorial(p)
    return 2.0 * area * num / math.factorial(s + 2)


def _weighted_mass_dense(n, h, g):
    """E[a,b] = ∫ g_h φ_a φ_b dx with g a nodal field (exact)."""
    gflat = np.asarray(g).ravel()

    def elem_fn(P3, tri):
        area = oracles.tri_area(P3)
        E = np.zeros((3, 3))
        for a in range(3):
            for b in range(3):
                acc = 0.0
                for c in range(3):
                    pw = [0, 0, 0]
                    pw[a] += 1
                    pw[b] += 1
                    pw[c] += 1
                    acc += gflat[tri[c]] * _int_lam(pw, area)
                E[a, b] = acc
        return E

    return _assemble_with_tri(n, h, elem_fn)


def _assemble_with_tri(n, h, elem_fn):
    Nn = n * n
    A = np.zeros((Nn, Nn))
    coords = oracles.tri_coords(n, h)
    for tri in oracles.triangles(n):
        P3 = coords[list(tri)]
        E = elem_fn(P3, tri)
        for a in range(3):
            for b in range(3):
                A[tri[a], tri[b]] += E[a, b]
    return A


def _grad_advective_dense(n, h, f):
    """E[a,b] = ∫ (∇f_h · ∇φ_a) φ_b dx (rows = test functions)."""
    fflat = np.asarray(f).ravel()

    def elem_fn(P3, tri):
        area = oracles.tri_area(P3)
        G = oracles.p1_grads(P3)
        gf = sum(fflat[tri[c]] * G[c] for c in range(3))
        E = np.zeros((3, 3))
        for a in range(3):
            dot = gf @ G[a]
            for b in range(3):
                E[a, b] = dot * area / 3.0
        return E

    return _assemble_with_tri(n, h, elem_fn)


def _load_graddot_dense(n, h, m, p):
    """b_a = ∫ (∇m_h · ∇p_h) φ_a dx (element-constant coefficient)."""
    mf = np.asarray(m).ravel()
    pf = np.asarray(p).ravel()
    Nn = n * n
    b = np.zeros(Nn)
    coords = oracles.tri_coords(n, h)
    for tri in oracles.triangles(n):
        P3 = coords[list(tri)]
        area = oracles.tri_area(P3)
        G = oracles.p1_grads(P3)
        gm = sum(mf[tri[c]] * G[c] for c in range(3))
        gp = sum(pf[tri[c]] * G[c] for c in range(3))
        dot = gm @ gp
        for a in range(3):
            b[tri[a]] += dot * area / 3.0
    return b


def _load_product_dense(n, h, g1, g2):
    """b_a = ∫ g1_h g2_h φ_a dx (exact cubic integration)."""
    g1f = np.asarray(g1).ravel()
    g2f = np.asarray(g2).ravel()
    b = np.zeros(n * n)
    coords = oracles.tri_coords(n, h)
    for tri in oracles.triangles(n):
        P3 = coords[list(tri)]
        area = oracles.tri_area(P3)
        for a in range(3):
            acc = 0.0
            for c1 in range(3):
                for c2 in range(3):
                    pw = [0, 0, 0]
                    pw[a] += 1
                    pw[c1] += 1
                    pw[c2] += 1
                    acc += g1f[tri[c1]] * g2f[tri[c2]] * _int_lam(pw, area)
            b[tri[a]] += acc
    return b


@pytest.fixture(scope="module")
def oracle_run():
    n, h, dt = N, H, DT
    Nn = n * n
    M = oracles.mass_dense(n, h)
    K = oracles.stiffness_dense(n, h)
    ML = M.sum(axis=1)
    nbrs = oracles.neighbors(n)
    Mat_fq = M + dt * (P.Df * K + P.delta * M)

    rng = np.random.RandomState(0)
    c = 1.0 + 0.5 * rng.rand(STEPS + 1, Nn)
    np.random.seed(5)
    m0 = (1.5 + 0.1 * (0.5 - np.random.rand(n, n))).ravel()
    f0 = np.full(Nn, 1.0 / 32.0)

    ms, fs = [m0], [f0]
    for i in range(1, STEPS + 1):
        m_n, f_n = ms[-1], fs[-1]
        rhs_f = M @ f_n + dt * _load_product_dense(n, h, m_n, c[i])
        f_np1 = spsolve(sp.csr_matrix(Mat_fq), rhs_f)
        Aa = _grad_advective_dense(n, h, f_np1)
        Ar = _weighted_mass_dense(n, h, m_n)
        A_m = -P.Dm * K + P.chi * Aa + Ar
        rhs_m = 4.0 * (M @ m_n)
        m_np1 = oracles.fct_alg_legacy_dense(A_m, rhs_m, m_n, dt, M, ML, nbrs)
        ms.append(m_np1)
        fs.append(f_np1)

    mhat = ms[-1] * 1.05
    fhat = fs[-1] * 0.95
    ps = [mhat - ms[-1]]
    qs = [fhat - fs[-1]]
    for i in reversed(range(STEPS)):
        p_np1, q_np1 = ps[0], qs[0]
        m_n, f_n = ms[i], fs[i]
        rhs_q = M @ q_np1 + dt * P.chi * _load_graddot_dense(n, h, m_n, p_np1)
        q_n = spsolve(sp.csr_matrix(Mat_fq), rhs_q)
        Aa = _grad_advective_dense(n, h, f_n)
        Ar = _weighted_mass_dense(n, h, 4.0 - 2.0 * m_n)
        A_p = -P.Dm * K - P.chi * Aa + Ar
        rhs_p = _load_product_dense(n, h, c[i], q_n)
        p_n = oracles.fct_alg_legacy_dense(A_p, rhs_p, p_np1, dt, M, ML, nbrs)
        ps.insert(0, p_n)
        qs.insert(0, q_n)

    return c, np.array(ms), np.array(fs), np.array(ps), np.array(qs), mhat, fhat


@pytest.fixture(scope="module")
def model():
    g = Grid(0.0, (N - 1) * H, N)
    return LegacyM4MimuraModel(g, solver_opts=SolverOpts(tol=1e-13, maxiter=500))


def test_forward_matches_oracle(model, oracle_run):
    c, ms, fs, *_ = oracle_run
    m0, f0 = model.ic()
    ctraj = jnp.asarray(c.reshape(STEPS + 1, N, N))
    m_traj, f_traj = model.forward(ctraj, jnp.asarray(m0), jnp.asarray(f0), DT)
    assert np.allclose(np.asarray(m_traj).reshape(STEPS + 1, -1), ms, atol=1e-9)
    assert np.allclose(np.asarray(f_traj).reshape(STEPS + 1, -1), fs, atol=1e-9)


def test_adjoint_matches_oracle(model, oracle_run):
    c, ms, fs, ps, qs, mhat, fhat = oracle_run
    ctraj = jnp.asarray(c.reshape(STEPS + 1, N, N))
    m_traj = jnp.asarray(ms.reshape(STEPS + 1, N, N))
    f_traj = jnp.asarray(fs.reshape(STEPS + 1, N, N))
    p_traj, q_traj = model.adjoint(
        m_traj, f_traj, jnp.asarray(mhat.reshape(N, N)),
        jnp.asarray(fhat.reshape(N, N)), ctraj, DT,
    )
    assert np.allclose(np.asarray(p_traj).reshape(STEPS + 1, -1), ps, atol=1e-9)
    assert np.allclose(np.asarray(q_traj).reshape(STEPS + 1, -1), qs, atol=1e-9)


def test_descent_direction(model):
    c = jnp.ones((2, N, N))
    m = 2.0 * jnp.ones((2, N, N))
    q = 3.0 * jnp.ones((2, N, N))
    d = model.descent_direction(0.5, c, m, q)
    assert np.allclose(np.asarray(d), -(0.5 * 1.0 - 3.0 * 2.0))
