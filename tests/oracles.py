"""Independent dense NumPy/SciPy oracles for unit tests.

These re-state the documented algorithms (P1 FEM on a right-triangulated
square, Zalesak FCT, Chebyshev semi-iteration) in straightforward dense/sparse
form, to cross-check the vectorized stencil implementations. They are test
equipment only — never imported by the framework.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import spsolve


def triangles(n: int):
    """All triangles of the right-diagonal mesh as vertex-index triples
    (flat row-major indexing, v = i*n + j)."""
    tris = []
    for ci in range(n - 1):
        for cj in range(n - 1):
            v00 = ci * n + cj
            v01 = ci * n + cj + 1
            v10 = (ci + 1) * n + cj
            v11 = (ci + 1) * n + cj + 1
            tris.append((v00, v01, v11))
            tris.append((v00, v10, v11))
    return tris


def tri_coords(n: int, h: float, a1: float = 0.0):
    coords = np.array([(a1 + (v % n) * h, a1 + (v // n) * h) for v in range(n * n)])
    return coords


def assemble_dense(n, h, elem_fn, a1=0.0):
    """Generic dense assembly: elem_fn(P (3,2) vertex coords) -> 3x3 matrix."""
    N = n * n
    A = np.zeros((N, N))
    coords = tri_coords(n, h, a1)
    for tri in triangles(n):
        P = coords[list(tri)]
        E = elem_fn(P)
        for a in range(3):
            for b in range(3):
                A[tri[a], tri[b]] += E[a, b]
    return A


def p1_grads(P):
    """Gradients of the three P1 basis functions on triangle with rows P."""
    mat = np.array(
        [
            [1.0, P[0, 0], P[0, 1]],
            [1.0, P[1, 0], P[1, 1]],
            [1.0, P[2, 0], P[2, 1]],
        ]
    )
    inv = np.linalg.inv(mat)
    return inv[1:, :].T  # (3, 2)


def tri_area(P):
    return 0.5 * abs(
        (P[1, 0] - P[0, 0]) * (P[2, 1] - P[0, 1])
        - (P[2, 0] - P[0, 0]) * (P[1, 1] - P[0, 1])
    )


def mass_dense(n, h):
    def elem(P):
        return tri_area(P) / 12.0 * (np.ones((3, 3)) + np.eye(3))

    return assemble_dense(n, h, elem)


def stiffness_dense(n, h):
    def elem(P):
        G = p1_grads(P)
        return tri_area(P) * G @ G.T

    return assemble_dense(n, h, elem)


def convection_dense(n, h, wind_fn, pts, wts, a1=0.0):
    """N[a, b] = int (w . grad phi_a) phi_b with the given reference-triangle
    quadrature rule (pts in (xi, eta), wts summing to 1/2)."""
    lam = np.stack([1 - pts[:, 0] - pts[:, 1], pts[:, 0], pts[:, 1]], axis=1)

    def make(P):
        G = p1_grads(P)
        detJ = 2.0 * tri_area(P)
        xq = P[0] + np.outer(pts[:, 0], P[1] - P[0]) + np.outer(pts[:, 1], P[2] - P[0])
        wx, wy = wind_fn(xq[:, 0], xq[:, 1])
        E = np.zeros((3, 3))
        for a in range(3):
            for b in range(3):
                E[a, b] = detJ * np.sum(wts * (wx * G[a, 0] + wy * G[a, 1]) * lam[:, b])
        return E

    return assemble_dense(n, h, make, a1)


def neighbors(n: int):
    """Edge-connected neighbor lists incl. self (find_node_neighbours analogue)."""
    nbrs = [set([v]) for v in range(n * n)]
    for tri in triangles(n):
        for a in range(3):
            for b in range(3):
                nbrs[tri[a]].add(tri[b])
    return [sorted(s) for s in nbrs]


def chebsi_dense(vec, M, Md, cheb_iter=20, lmin=0.5, lmax=2.0):
    ymid = np.zeros_like(vec)
    yold = np.zeros_like(vec)
    omega = 0.0
    rho = (lmax - lmin) / (lmax + lmin)
    Md = (lmin + lmax) / 2 * Md
    for k in range(1, cheb_iter + 1):
        if k == 2:
            omega = 1 / (1 - rho**2 / 2)
        else:
            omega = 1 / (1 - (omega * rho**2) / 4)
        r = vec - M @ ymid
        z = r / Md
        ynew = omega * (z + ymid - yold) + yold
        yold = ymid
        ymid = ynew
    return ynew


def artificial_diffusion_dense(mat):
    """D cancelling negative off-diagonals of `mat`, symmetrized, zero row sums."""
    off = -mat.copy()
    np.fill_diagonal(off, 0.0)
    D = np.maximum(off, 0.0)
    D = np.maximum(D, D.T)
    np.fill_diagonal(D, 0.0)
    np.fill_diagonal(D, -D.sum(axis=1))
    return D


def fct_step_dense(A, rhs, u_n, dt, M, ML_diag, nbrs, non_flux=None):
    """Dense re-statement of FCT_alg_ref (helpers.py:1715-1872)."""
    N = len(u_n)
    D = artificial_diffusion_dense(-A)
    Low = np.diag(ML_diag) + dt * (A - D)
    if non_flux is not None:
        Low += dt * non_flux
    u_low = spsolve(sp.csr_matrix(Low), ML_diag * u_n + dt * rhs)

    du_dt = chebsi_dense(-A @ u_low + rhs, M, np.diag(M).copy())

    F = np.zeros((N, N))
    for i in range(N):
        for j in nbrs[i]:
            F[i, j] = M[i, j] * (du_dt[i] - du_dt[j]) + D[i, j] * (u_low[i] - u_low[j])
    np.fill_diagonal(F, 0.0)

    p_pos = np.maximum(F, 0).sum(axis=1)
    p_neg = np.minimum(F, 0).sum(axis=1)
    u_max = np.array([max(u_low[j] for j in nbrs[i]) for i in range(N)])
    u_min = np.array([min(u_low[j] for j in nbrs[i]) for i in range(N)])
    q_pos = u_max - u_low
    q_neg = u_min - u_low
    r_pos = np.ones(N)
    r_neg = np.ones(N)
    m = p_pos != 0
    r_pos[m] = np.minimum(1, ML_diag[m] * q_pos[m] / (dt * p_pos[m]))
    m = p_neg != 0
    r_neg[m] = np.minimum(1, ML_diag[m] * q_neg[m] / (dt * p_neg[m]))

    fbar = np.zeros(N)
    for i in range(N):
        for j in range(N):
            f = F[i, j]
            if f > 0:
                fbar[i] += min(r_pos[i], r_neg[j]) * f
            elif f < 0:
                fbar[i] += min(r_neg[i], r_pos[j]) * f
    return u_low + dt * fbar / ML_diag


def fct_alg_legacy_dense(A_leg, rhs, u_n, dt, M, ML_diag, nbrs, source_mat=None):
    """Dense verbatim re-statement of the LEGACY ``FCT_alg``
    (old_helpers.py:115-204): legacy sign convention M du/dt = A u + rhs,
    low-order matrix M_L - dt (A + D - S), ChebSI rhs A u_low + rhs."""
    N = len(u_n)
    D = artificial_diffusion_dense(A_leg)  # cancels negative off-diags of A_leg
    Low = np.diag(ML_diag) - dt * (A_leg + D)
    if source_mat is not None:
        Low += dt * source_mat
    u_low = spsolve(sp.csr_matrix(Low), ML_diag * u_n + dt * rhs)

    du_dt = chebsi_dense(A_leg @ u_low + rhs, M, np.diag(M).copy())

    F = np.zeros((N, N))
    for i in range(N):
        for j in nbrs[i]:
            F[i, j] = M[i, j] * (du_dt[i] - du_dt[j]) + D[i, j] * (u_low[i] - u_low[j])
    np.fill_diagonal(F, 0.0)

    p_pos = np.maximum(F, 0).sum(axis=1)
    p_neg = np.minimum(F, 0).sum(axis=1)
    u_max = np.array([max(u_low[j] for j in nbrs[i]) for i in range(N)])
    u_min = np.array([min(u_low[j] for j in nbrs[i]) for i in range(N)])
    q_pos = u_max - u_low
    q_neg = u_min - u_low
    r_pos = np.ones(N)
    r_neg = np.ones(N)
    m = p_pos != 0
    r_pos[m] = np.minimum(1, ML_diag[m] * q_pos[m] / (dt * p_pos[m]))
    m = p_neg != 0
    r_neg[m] = np.minimum(1, ML_diag[m] * q_neg[m] / (dt * p_neg[m]))

    fbar = np.zeros(N)
    for i in range(N):
        for j in range(N):
            f = F[i, j]
            if f > 0:
                fbar[i] += min(r_pos[i], r_neg[j]) * f
            elif f < 0:
                fbar[i] += min(r_neg[i], r_pos[j]) * f
    return u_low + dt * fbar / ML_diag
