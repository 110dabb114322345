"""Stencil-field linear algebra.

A *stencil* is the TPU-native representation of the sparse operators the
reference assembles as SciPy CSR/LIL matrices (helpers.py:87-121): an array
``S`` of shape ``(9, n, n)`` where ``S[d, i, j]`` is the matrix entry coupling
row-node ``(i, j)`` to column-node ``(i, j) + OFFSETS[d]``.  On the uniform
right-triangulated P1 mesh every operator in the reference (mass, stiffness,
convection, weighted mass, chemotaxis transport — helpers.py:553-591,
1305-1352) has exactly this 3x3 footprint, so general sparse storage, graph
neighbor lists (helpers.py:271-307) and COO extraction (helpers.py:187-204)
all disappear in favor of shifted-array arithmetic that XLA fuses onto the
VPU.

Invariant: planes are zero at positions whose column node would fall outside
the grid (maintained by construction in assembly and by all ops here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import CENTER, OFFSETS, opposite


def shift(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """y[i, j] = x[i + di, j + dj], zero outside the domain.

    Works on (..., n, n) arrays.
    """
    di, dj = OFFSETS[d]
    if di == 0 and dj == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad)
    n0, n1 = x.shape[-2], x.shape[-1]
    return xp[..., 1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]


def shift_fill(x: jnp.ndarray, d: int, fill: float) -> jnp.ndarray:
    """Like :func:`shift` but out-of-domain positions take ``fill``
    (used for neighborhood max/min in the Zalesak limiter)."""
    di, dj = OFFSETS[d]
    if di == 0 and dj == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, constant_values=fill)
    n0, n1 = x.shape[-2], x.shape[-1]
    return xp[..., 1 + di : 1 + di + n0, 1 + dj : 1 + dj + n1]


def apply(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Matrix-vector product y = S @ x on (n, n) fields."""
    y = S[CENTER] * x
    for d in range(9):
        if d == CENTER:
            continue
        y = y + S[d] * shift(x, d)
    return y


def apply_t(S: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """y = S^T @ x without materializing the transpose."""
    y = S[CENTER] * x
    for d in range(9):
        if d == CENTER:
            continue
        y = y + shift(S[d] * x, opposite(d))
    return y


def transpose(S: jnp.ndarray) -> jnp.ndarray:
    """Explicit transpose: T[d][p] = S[opp(d)][p + d]."""
    return jnp.stack([shift(S[opposite(d)], d) for d in range(9)])


def diag(S: jnp.ndarray) -> jnp.ndarray:
    return S[CENTER]


def row_sum(S: jnp.ndarray) -> jnp.ndarray:
    """Row sums (helpers.py:309-328 ``row_lump`` analogue: lumped matrix
    diagonal = row sums)."""
    return S.sum(axis=0)


def identity_like(S: jnp.ndarray) -> jnp.ndarray:
    I = jnp.zeros_like(S)
    return I.at[CENTER].set(1.0)


def from_diag(v: jnp.ndarray) -> jnp.ndarray:
    S = jnp.zeros((9,) + v.shape, dtype=v.dtype)
    return S.at[CENTER].set(v)


def add_diag(S: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return S.at[CENTER].add(v)


# ---------------------------------------------------------------------------
# SciPy interop (tests / CPU baselines only — never on the TPU hot path)
# ---------------------------------------------------------------------------

def to_scipy(S: np.ndarray):
    """Stencil -> scipy CSR in flat row-major vertex ordering (vectorized)."""
    import scipy.sparse as sp

    S = np.asarray(S)
    _, n0, n1 = S.shape
    rows, cols, vals = [], [], []
    ii, jj = np.meshgrid(np.arange(n0), np.arange(n1), indexing="ij")
    for d, (di, dj) in enumerate(OFFSETS):
        src = (
            slice(max(0, -di), n0 - max(0, di)),
            slice(max(0, -dj), n1 - max(0, dj)),
        )
        r = (ii[src] * n1 + jj[src]).ravel()
        c = ((ii[src] + di) * n1 + (jj[src] + dj)).ravel()
        v = S[d][src].ravel()
        rows.append(r)
        cols.append(c)
        vals.append(v)
    N = n0 * n1
    return sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(N, N),
    ).tocsr()


# ---------------------------------------------------------------------------
# Dense interop (tests / debugging only — never on the TPU hot path)
# ---------------------------------------------------------------------------

def to_dense(S: np.ndarray) -> np.ndarray:
    """Stencil -> dense (N, N) matrix in flat row-major vertex ordering."""
    S = np.asarray(S)
    _, n0, n1 = S.shape
    N = n0 * n1
    A = np.zeros((N, N), dtype=S.dtype)
    for d, (di, dj) in enumerate(OFFSETS):
        for i in range(n0):
            ii = i + di
            if ii < 0 or ii >= n0:
                continue
            for j in range(n1):
                jj = j + dj
                if jj < 0 or jj >= n1:
                    continue
                A[i * n1 + j, ii * n1 + jj] += S[d, i, j]
    return A


def from_dense(A: np.ndarray, n: int) -> np.ndarray:
    """Dense (N, N) matrix (flat row-major vertex ordering) -> stencil.

    Raises if A has entries outside the 3x3 footprint.
    """
    A = np.asarray(A)
    S = np.zeros((9, n, n), dtype=A.dtype)
    seen = np.zeros_like(A, dtype=bool)
    for d, (di, dj) in enumerate(OFFSETS):
        for i in range(n):
            ii = i + di
            if ii < 0 or ii >= n:
                continue
            for j in range(n):
                jj = j + dj
                if jj < 0 or jj >= n:
                    continue
                S[d, i, j] = A[i * n + j, ii * n + jj]
                seen[i * n + j, ii * n + jj] = True
    if np.any(~seen & (A != 0)):
        raise ValueError("matrix has entries outside the 3x3 stencil footprint")
    return S
