"""Matrix-free linear solvers on stencil operators.

Replaces the reference's SuperLU ``spsolve`` calls (helpers.py:596, 686,
1342, 1538, 1782) with Jacobi-preconditioned Krylov iterations, and ports the
Chebyshev semi-iteration mass solve (``ChebSI``, helpers.py:143-185) 1:1.

The FCT low-order matrix is a diagonally dominant M-matrix (the reference
checks this each step, helpers.py:1796-1809) and the implicit
reaction-diffusion matrices are mass + diffusion + reaction — both are
well-conditioned at the reference time steps, so BiCGStab/CG converge to
direct-solver accuracy (~1e-12 relative) in a few dozen stencil applies.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from fem_fct_pdeco_tpu.ops import stencil as st


@dataclasses.dataclass(frozen=True)
class SolverOpts:
    """Krylov solve options. ``tol`` is relative to ||b||."""

    tol: float = 1e-12
    atol: float = 0.0
    maxiter: int = 1000
    symmetric: bool = False
    # spectral-DCT preconditioning of the XLA-path Krylov solves (the
    # analogue of the fused kernels' in-kernel MXU preconditioner; see
    # solve_stencil ``prec``). Models build (C, ilam) when set.
    spectral: bool = False


def chebsi(
    b: jnp.ndarray,
    M: jnp.ndarray,
    M_diag: jnp.ndarray,
    iters: int = 20,
    lmin: float = 0.5,
    lmax: float = 2.0,
) -> jnp.ndarray:
    """Chebyshev semi-iteration for M x = b with diagonal preconditioner.

    Exact port of reference helpers.py:143-185 (same fixed iteration count,
    eigenvalue bounds for the diagonally-scaled P1 mass matrix, and omega
    recurrence), so the FCT antidiffusive fluxes match bit-for-bit in spirit.
    """
    rho = (lmax - lmin) / (lmax + lmin)
    Md = (lmin + lmax) / 2.0 * M_diag

    def body(k, carry):
        yold, ymid, omega = carry
        omega = jnp.where(
            k == 2, 1.0 / (1.0 - rho**2 / 2.0), 1.0 / (1.0 - omega * rho**2 / 4.0)
        )
        r = b - st.apply(M, ymid)
        z = r / Md
        ynew = omega * (z + ymid - yold) + yold
        return ymid, ynew, omega

    zero = jnp.zeros_like(b)
    _, y, _ = jax.lax.fori_loop(1, iters + 1, body, (zero, zero, jnp.asarray(0.0, b.dtype)))
    return y


def spectral_pinv(C, ilam, r):
    """Apply the spectral preconditioner P^{-1} r = C^T((C r C^T)⊙ilam)C.

    ``C`` is the orthonormal DCT-II matrix and ``ilam`` the inverse modal
    eigenvalues (pallas_fused.dct_precond_ilam): exact inverse of the
    stiff stationary part h²m·I + dt·D·K5 of the solve operators on this
    mesh. Default matmul precision (bf16 MXU on TPU) on purpose — the
    Krylov loop exits on the TRUE residual, so preconditioner accuracy
    affects only the iteration count (roadmap: f32-precision DCTs are a
    measured net loss)."""
    t = C @ r
    rh = t @ C.T
    rh = rh * ilam
    return C.T @ rh @ C


def _solve_stencil_raw(S, b, x0, opts: SolverOpts, C=None, ilam=None):
    matvec = partial(st.apply, S)
    if C is not None:
        precond = partial(spectral_pinv, C, ilam)
    else:
        inv_diag = 1.0 / S[4]
        precond = lambda r: r * inv_diag
    solver = (
        jax.scipy.sparse.linalg.cg if opts.symmetric else jax.scipy.sparse.linalg.bicgstab
    )
    x, _ = solver(
        matvec, b, x0=x0, tol=opts.tol, atol=opts.atol, maxiter=opts.maxiter, M=precond
    )
    return x


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _solve_stencil_vjp(S, b, x0, opts: SolverOpts):
    return _solve_stencil_raw(S, b, x0, opts)


def _solve_fwd(S, b, x0, opts):
    x = _solve_stencil_raw(S, b, x0, opts)
    return x, (S, x)


def _solve_bwd(opts, res, g):
    """Implicit-function-theorem adjoint: with S x = b,
    dL/db = S^{-T} g  and  dL/dS[d, p] = -y[p] * x[p + offset(d)].

    This makes the Krylov solves reverse-differentiable (the underlying
    while_loops are not), enabling exact discrete gradients of the whole FCT
    time loop via jax.grad — a capability the reference (hand-derived
    continuous adjoints only) does not have.
    """
    S, x = res
    y = _solve_stencil_raw(st.transpose(S), g, None, opts)
    grad_S = jnp.stack([-y * st.shift(x, d) for d in range(9)])
    return grad_S, y, jnp.zeros_like(x)


_solve_stencil_vjp.defvjp(_solve_fwd, _solve_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def _solve_stencil_prec_vjp(S, b, x0, C, ilam, opts: SolverOpts):
    return _solve_stencil_raw(S, b, x0, opts, C, ilam)


def _solve_prec_fwd(S, b, x0, C, ilam, opts):
    x = _solve_stencil_raw(S, b, x0, opts, C, ilam)
    return x, (S, x, C, ilam)


def _solve_prec_bwd(opts, res, g):
    """Same implicit-function-theorem adjoint as _solve_bwd; the transpose
    solve reuses the spectral preconditioner (P is symmetric)."""
    S, x, C, ilam = res
    y = _solve_stencil_raw(st.transpose(S), g, None, opts, C, ilam)
    grad_S = jnp.stack([-y * st.shift(x, d) for d in range(9)])
    return grad_S, y, jnp.zeros_like(x), jnp.zeros_like(C), jnp.zeros_like(ilam)


_solve_stencil_prec_vjp.defvjp(_solve_prec_fwd, _solve_prec_bwd)


def solve_stencil(
    S: jnp.ndarray,
    b: jnp.ndarray,
    x0: jnp.ndarray | None = None,
    opts: SolverOpts = SolverOpts(),
    prec: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Solve S x = b (S a (9, n, n) stencil) with preconditioned CG
    (symmetric) or BiCGStab (general). Reverse-differentiable via an
    implicit-function-theorem custom VJP.

    ``prec``: optional ``(C, ilam)`` spectral-DCT preconditioner
    (see spectral_pinv / pallas_fused.dct_precond_ilam) — the XLA-path
    analogue of the fused kernels' in-kernel MXU preconditioner; cuts
    Krylov iteration counts ~3x on the stiff solves at large grids.
    Default: Jacobi (1/diag)."""
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if prec is not None:
        return _solve_stencil_prec_vjp(S, b, x0, prec[0], prec[1], opts)
    return _solve_stencil_vjp(S, b, x0, opts)


def dot_omega(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Plain nodal dot product (full-precision accumulate)."""
    return jnp.sum(x.astype(jnp.promote_types(x.dtype, jnp.float32)) * y)
