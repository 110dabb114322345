"""Flux-corrected transport with the Zalesak limiter, fully vectorized.

Re-designs the reference FCT step (``FCT_alg_ref``, helpers.py:1715-1872;
legacy sign convention ``FCT_alg``, old_helpers.py:115-204) for TPUs: the
per-node Python loops over sparse neighbor lists (flux assembly
helpers.py:1818-1822, local extrema helpers.py:1831-1843, limiting
helpers.py:1860-1866) become shifted-array arithmetic over the fixed
7-point mesh footprint, and the SuperLU low-order solve becomes a
matrix-free BiCGStab.

Semantics (ref convention): one time step of
    [M + dt (A + non_flux)] u^{n+1} = M u^n + dt rhs
via
  1. low-order solve  [M_L + dt (A - D + non_flux)] u_L = M_L u^n + dt rhs
  2. raw antidiffusive fluxes F_ij = M_ij (du_i - du_j) + D_ij (u_i - u_j),
     du/dt from 20-step Chebyshev on  M du = -A u_L + rhs
  3. Zalesak limiter (P±, Q±, R±; pairing min(R+_i, R-_j))
  4. explicit correction u^{n+1} = u_L + dt F̄ / m_i
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, opposite
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, chebsi, solve_stencil


# Inf-free sentinel for "no violation observed" (TPU f64 emulation turns
# inf arithmetic into NaN; big finite sentinels are the repo convention).
STATS_SENTINEL = 1e30

# Trace-time collector for the always-on FCT safety telemetry: when a
# ``collect_stats`` context is active, every ``fct_step`` traced inside it
# records the MIN ROW SUM of its low-order matrix. The reference validates
# the M-matrix row-sum property unconditionally every step
# (helpers.py:1784-1810); carrying this reduction through the sweep gives
# production runs the same safety signal without debug-mode's
# checkify/XLA-only tax (``ModelBase`` surfaces it as ``last_invariants``).
_STATS: list | None = None


class collect_stats:
    """Context manager activating fct_step's min-rowsum recording during a
    trace. ``.vals`` holds the traced scalars after exit; ``.min()`` reduces
    them (STATS_SENTINEL when no FCT step was traced)."""

    def __enter__(self):
        global _STATS
        self._prev = _STATS
        _STATS = []
        return self

    def __exit__(self, *exc):
        global _STATS
        self.vals = _STATS
        _STATS = self._prev
        return False

    def min(self, dtype=None):
        if not self.vals:
            return jnp.asarray(STATS_SENTINEL, dtype or jnp.float32)
        m = self.vals[0]
        for v in self.vals[1:]:
            m = jnp.minimum(m, v)
        return m.astype(dtype) if dtype is not None else m


def artificial_diffusion(A: jnp.ndarray) -> jnp.ndarray:
    """Discrete-upwind artificial diffusion for flux matrix ``-A``
    (ref convention: ``D = artificial_diffusion_mat(-A)``,
    helpers.py:206-242, 1769): off-diagonals D_ij = max(0, A_ij, A_ji),
    diagonal = -sum of off-diagonals (row sums vanish)."""
    D = jnp.zeros_like(A)
    for d in range(9):
        if d == CENTER:
            continue
        Atr = st.shift(A[opposite(d)], d)  # A_ji seen from row i
        D = D.at[d].set(jnp.maximum(0.0, jnp.maximum(A[d], Atr)))
    offsum = D.sum(axis=0)  # center plane is zero so this is the off-diag sum
    return D.at[CENTER].set(-offsum)


def low_order_matrix(
    A: jnp.ndarray,
    D: jnp.ndarray,
    ML_diag: jnp.ndarray,
    dt: float,
    non_flux: jnp.ndarray | None = None,
) -> jnp.ndarray:
    Low = dt * (A - D)
    if non_flux is not None:
        Low = Low + dt * non_flux
    return Low.at[CENTER].add(ML_diag)


def zalesak_limit(
    fluxes: jnp.ndarray,
    u_low: jnp.ndarray,
    ML_diag: jnp.ndarray,
    dt: float,
    node_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Zalesak limiter: fluxes (6, n, n) ordered per EDGE_NEIGHBOR_IDS ->
    limited net antidiffusive flux F̄ (n, n). (helpers.py:1824-1867)

    Deliberately inf-free: out-of-domain neighbors take the center value in
    the max/min (TPU extended-precision f64 emulation turns inf arithmetic
    into NaN). ``node_mask``: optional (n, n) 0/1 validity mask for the
    padded-grid mode — nodes outside the true domain are excluded from the
    local-extrema neighbor sets, so padded results match unpadded exactly.
    """
    ones = jnp.ones_like(u_low) if node_mask is None else node_mask
    p_pos = jnp.zeros_like(u_low)
    p_neg = jnp.zeros_like(u_low)
    u_max = u_low
    u_min = u_low
    for k, d in enumerate(EDGE_NEIGHBOR_IDS):
        F = fluxes[k]
        p_pos = p_pos + jnp.maximum(F, 0.0)
        p_neg = p_neg + jnp.minimum(F, 0.0)
        valid = st.shift(ones, d)  # 1 where the neighbor exists
        nbr = st.shift(u_low, d) * valid + (1.0 - valid) * u_low
        u_max = jnp.maximum(u_max, nbr)
        u_min = jnp.minimum(u_min, nbr)

    q_pos = u_max - u_low
    q_neg = u_min - u_low
    den_pos = dt * p_pos  # branch on the PRODUCT: dt*p can underflow to 0
    r_pos = jnp.where(               # in f32 while p > 0, and 0/0 would NaN
        den_pos > 0.0,
        jnp.minimum(1.0, ML_diag * q_pos / jnp.where(den_pos > 0.0, den_pos, 1.0)),
        1.0,
    )
    den_neg = dt * p_neg
    r_neg = jnp.where(
        den_neg < 0.0,
        jnp.minimum(1.0, ML_diag * q_neg / jnp.where(den_neg < 0.0, den_neg, 1.0)),
        1.0,
    )

    fbar = jnp.zeros_like(u_low)
    for k, d in enumerate(EDGE_NEIGHBOR_IDS):
        F = fluxes[k]
        lim_pos = jnp.minimum(r_pos, st.shift_fill(r_neg, d, 1.0))
        lim_neg = jnp.minimum(r_neg, st.shift_fill(r_pos, d, 1.0))
        fbar = fbar + jnp.where(F > 0.0, lim_pos * F, jnp.where(F < 0.0, lim_neg * F, 0.0))
    return fbar


def fct_step(
    A: jnp.ndarray,
    rhs: jnp.ndarray,
    u_n: jnp.ndarray,
    dt: float,
    M: jnp.ndarray,
    M_diag: jnp.ndarray,
    ML_diag: jnp.ndarray,
    non_flux: jnp.ndarray | None = None,
    solver: SolverOpts = SolverOpts(),
    cheb_iters: int = 20,
    backend: str = "xla",
    pallas_solver_iters: int = 60,
    node_mask: jnp.ndarray | None = None,
    debug: bool = False,
    prec: tuple[jnp.ndarray, jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """One flux-corrected transport step (``FCT_alg_ref``, helpers.py:1715).

    Legacy-convention callers (``FCT_alg`` with flux matrix A_leg and
    ``source_mat`` S, old_helpers.py:115-204) map to
    ``fct_step(-A_leg, rhs, ..., non_flux=S)``.

    ``backend="pallas"`` runs the solver loops and the flux/limiter stage as
    VMEM-resident Pallas kernels (fixed ``pallas_solver_iters`` BiCGStab
    iterations instead of a tolerance-based while loop).

    ``debug=True`` validates the low-order matrix's M-matrix row-sum
    property EVERY step (the reference does this unconditionally,
    helpers.py:1784-1810) via ``checkify.check``, reporting the admissible
    dt range on violation. The caller must run the sweep under
    ``jax.experimental.checkify.checkify`` (``ModelBase`` does this when
    constructed with ``debug=True``).
    """
    D = artificial_diffusion(A)
    Low = low_order_matrix(A, D, ML_diag, dt, non_flux)
    if _STATS is not None:
        # always-on M-matrix telemetry (helpers.py:1784-1810): row sums of
        # Low must stay positive; D's row sums vanish by construction so
        # this is ML + dt * rowsum(A + non_flux)
        _STATS.append(jnp.min(Low.sum(axis=0)))
    if debug:
        from jax.experimental import checkify

        # row sums of Low = ML + dt * rowsum(A + S) (D's row sums vanish);
        # admissible dt range per helpers.py:1796-1809. Inf-free by the
        # repo's TPU f64-emulation rule: big sentinels instead of inf.
        rowsum = Low.sum(axis=0)
        rsA = A.sum(axis=0) if non_flux is None else (A + non_flux).sum(axis=0)
        big = jnp.asarray(1e30, rowsum.dtype)
        ml_over_rs = -ML_diag / jnp.where(rsA == 0, 1.0, rsA)
        dt_upper = jnp.min(jnp.where(rsA < 0, ml_over_rs, big))
        dt_lower = jnp.maximum(jnp.max(jnp.where(rsA > 0, ml_over_rs, -big)), 0.0)
        checkify.check(
            jnp.all(rowsum > 0),
            "FCT low-order matrix lost the M-matrix row-sum property "
            "(min row sum = {m}); the time step must satisfy "
            "dt_lower < dt < dt_upper with dt_lower = {lo}, dt_upper = {hi}",
            m=jnp.min(rowsum), lo=dt_lower, hi=dt_upper,
        )
    b = ML_diag * u_n + dt * rhs

    if backend == "pallas":
        from fem_fct_pdeco_tpu.ops import pallas_kernels as pk

        u_low = pk.bicgstab_pallas(Low, b, x0=u_n, iters=pallas_solver_iters,
                                   tol=solver.tol)
        rdot = -st.apply(A, u_low) + rhs
        du_dt = pk.chebsi_pallas(rdot, M, M_diag, cheb_iters, 0.5, 2.0)
        return pk.flux_zalesak_pallas(M, D, du_dt, u_low, ML_diag, dt)

    u_low = solve_stencil(Low, b, x0=u_n, opts=solver, prec=prec)

    rdot = -st.apply(A, u_low) + rhs
    du_dt = chebsi(rdot, M, M_diag, cheb_iters, 0.5, 2.0)

    fluxes = []
    for d in EDGE_NEIGHBOR_IDS:
        F = M[d] * (du_dt - st.shift(du_dt, d)) + D[d] * (u_low - st.shift(u_low, d))
        fluxes.append(F)
    fbar = zalesak_limit(jnp.stack(fluxes), u_low, ML_diag, dt, node_mask=node_mask)

    return u_low + dt * fbar / ML_diag


def check_m_matrix_rowsums(Low_np: np.ndarray, A_np: np.ndarray, ML_diag_np: np.ndarray):
    """Eager diagnostic replicating the reference's M-matrix row-sum check and
    admissible-dt bounds (helpers.py:1796-1809). Returns (ok, dt_upper, dt_lower).
    """
    rowsums = Low_np.sum(axis=0).ravel()
    ok = bool(np.all(rowsums > 0))
    if ok:
        return True, None, None
    rsA = A_np.sum(axis=0).ravel()
    ml = ML_diag_np.ravel()
    upper = [-m / r for m, r in zip(ml, rsA) if r < 0]
    lower = [-m / r for m, r in zip(ml, rsA) if r > 0]
    dt_upper = min(upper) if upper else None
    dt_lower = max(max(lower), 0.0) if lower else 0.0
    return False, dt_upper, dt_lower
