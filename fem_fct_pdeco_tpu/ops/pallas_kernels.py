"""Pallas TPU kernels for the FCT hot path.

The FCT step is bandwidth-bound: its solvers (Chebyshev semi-iteration,
fixed-iteration BiCGStab/CG) perform dozens of sequential 9-point stencil
applications on the same (n, n) field. Under plain XLA each iteration
round-trips HBM; these kernels run the *entire* iteration loop inside one
``pallas_call`` with the stencil planes and all vectors resident in VMEM
(a 256² f32 problem needs ~5 MB; 512² measured working on TPU v5e).

All kernels assume single-block operation; larger grids use the XLA path
(``fits_vmem`` is a conservative guard). The flux + Zalesak limiter stage is
also provided fused.

Layout note: fields are (n, n); shifted-neighbor access is implemented by
writing the field into an (n+2, n+2) zero-padded VMEM scratch and reading
nine statically-shifted slices — lane/sublane rotates, no gathers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, OFFSETS


def fits_vmem(n: int, dtype=jnp.float32, budget_bytes: int = 64 * 2**20) -> bool:
    """Single-block VMEM feasibility check for the RESIDENT fused kernels.

    Sized for the whole-sweep kernels (pallas_fused.py): five resident
    9-plane stencils (K, M, Mat2, A->Low scratch, D scratch) plus ~5
    field-sized buffers and the shift pad. 512^2 f32 (~52 MB) measured
    working on TPU v5e; larger grids use the synth kernels
    (fits_vmem_synth) and only then fall back to XLA.
    """
    itemsize = jnp.dtype(dtype).itemsize
    need = 50 * n * n * itemsize
    return need <= budget_bytes


def fits_vmem_synth(n: int, dtype=jnp.float32,
                    budget_bytes: int = 120 * 2**20) -> bool:
    """VMEM feasibility of the SYNTH whole-sweep kernels
    (pallas_fused.py: stationary operators synthesized in-kernel, compact
    7-plane per-step stencils). Calibrated against real-Mosaic scoped-VMEM
    requirements (round 4, v5e): the 512² f32 synth kernel needs ~70 MB
    scoped — ~25 MB of fixed scratches/windows plus ~45 MB of
    register-allocator spill slots (each loop region gets its own
    spill-slot pool; carries and stage temporaries both count, and the
    pools do not reuse each other's slots). That is ~70 effective field
    planes, which caps the single-block tier near 640² f32; the old
    fixed-footprint-only model (42 planes) overpromised 768²+ and OOM'd at
    compile time on hardware."""
    itemsize = jnp.dtype(dtype).itemsize
    need = 70 * n * n * itemsize
    return need <= budget_bytes


def fits_vmem_lean(n: int, dtype=jnp.float32,
                   budget_bytes: int = 122 * 2**20) -> bool:
    """VMEM feasibility of the LEAN whole-sweep kernels (pallas_fused.py:
    ONE resident 7-plane stencil buffer with the raw flux matrix parked in
    an HBM output ref around the Krylov solve, artificial diffusion and
    consistent mass never materialized, HBM-staged trajectory frames,
    ref-state Krylov/Chebyshev). Calibrated like fits_vmem_synth: the
    512² f32 lean kernel needs ~72 MB scoped on real Mosaic (spill-slot
    pools dominate the fixed footprint), capping the tier near 640² f32 —
    NOT the 1024² the fixed-footprint model promised. Grids past this cap
    fall back to XLA until the banded (HBM-staged) kernels land."""
    itemsize = jnp.dtype(dtype).itemsize
    need = 72 * n * n * itemsize
    return need <= budget_bytes


def fits_vmem_xl(n: int, dtype=jnp.float32,
                 budget_bytes: int = 123 * 2**20) -> bool:
    """VMEM feasibility of the banded XL whole-sweep kernels
    (pallas_fused.py: a (10, n, n) full-plane VMEM state file + the
    (7, n, n) per-step stencil + DCT operands ≈ 21 field planes FIXED, with
    every solver-loop body banded so the Mosaic spill pools are
    (n/nb, n)-sized). ~30 effective planes total; sized so 1024² f32 runs
    fused. Past this the models fall back to XLA (2048² would need the
    HBM-streamed variant of the stencil/state, not yet built)."""
    itemsize = jnp.dtype(dtype).itemsize
    need = 30 * n * n * itemsize
    return need <= budget_bytes


def fits_vmem_xl_adjoint(n: int, dtype=jnp.float32,
                         budget_bytes: int = 123 * 2**20) -> bool:
    """Hardware-measured scoped-VMEM requirement of the banded XL ADJOINT
    kernels: the 12-slot state file plus misfit/trajectory staging needs
    138.06 MB at 1024² f32 on real Mosaic (v5e, round 5 — a 44-minute
    compile that then OOM'd by 10 MB), i.e. ~34 effective field planes vs
    the 10-slot forward's ~30. The adjoint therefore does NOT fit where
    the XL forward does; grids past this cap run the XLA adjoint path
    (spectral-preconditioned) while keeping the XL forward fused."""
    itemsize = jnp.dtype(dtype).itemsize
    return 34 * n * n * itemsize <= budget_bytes


def _interp() -> bool:
    """Interpret mode off-TPU (tests run the kernels on CPU)."""
    return jax.default_backend() != "tpu"


def _shifted(pad, d: int, n: int):
    di, dj = OFFSETS[d]
    return pad[1 + di : 1 + di + n, 1 + dj : 1 + dj + n]


# The right-diagonal P1 mesh has no (-1,+1)/(+1,-1) couplings: those two
# stencil planes are structurally zero in every operator here (grid.py), so
# solver matvecs skip them.
ANTI_DIAGONAL_IDS = (2, 6)


def _make_apply(S_ref, pad_ref, n: int, prezeroed: bool = False,
                skip_planes: tuple = ()):
    """Returns apply(x) -> S @ x using a padded VMEM scratch.

    ``prezeroed=True``: the caller guarantees the pad border is zero for the
    kernel's lifetime, so each apply only writes the interior window (saves a
    full-scratch store per matvec in solver loops).
    ``skip_planes``: stencil planes known to be structurally zero.
    """

    def apply(x):
        if not prezeroed:
            pad_ref[:, :] = jnp.zeros_like(pad_ref)
        pad_ref[1 : n + 1, 1 : n + 1] = x
        acc = S_ref[CENTER] * x
        for d in range(9):
            if d == CENTER or d in skip_planes:
                continue
            acc += S_ref[d] * _shifted(pad_ref, d, n)
        return acc

    return apply


# ---------------------------------------------------------------------------
# Chebyshev semi-iteration (helpers.py:143-185 semantics), fully in VMEM
# ---------------------------------------------------------------------------

def _chebsi_kernel(b_ref, M_ref, Md_ref, out_ref, pad_ref, *, n, iters, lmin, lmax):
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply = _make_apply(M_ref, pad_ref, n, prezeroed=True)
    rho = (lmax - lmin) / (lmax + lmin)
    Mdinv = 1.0 / (((lmin + lmax) / 2.0) * Md_ref[:, :])
    b = b_ref[:, :]

    yold = jnp.zeros_like(b)
    ymid = jnp.zeros_like(b)
    omega = 1.0  # k = 1 value of the recurrence
    for k in range(1, iters + 1):
        if k == 2:
            omega = 1.0 / (1.0 - rho**2 / 2.0)
        elif k > 2:
            omega = 1.0 / (1.0 - omega * rho**2 / 4.0)
        r = b - apply(ymid)
        ynew = omega * (r * Mdinv + ymid - yold) + yold
        yold, ymid = ymid, ynew
    out_ref[:, :] = ymid


def chebsi_pallas(b, M, M_diag, iters: int = 20, lmin: float = 0.5, lmax: float = 2.0):
    n = b.shape[-1]
    kern = functools.partial(_chebsi_kernel, n=n, iters=iters, lmin=lmin, lmax=lmax)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2), b.dtype)],
        interpret=_interp(),
    )(b, M, M_diag)


# ---------------------------------------------------------------------------
# Fixed-iteration Jacobi-preconditioned BiCGStab, fully in VMEM
# ---------------------------------------------------------------------------

def _bicgstab_kernel(S_ref, b_ref, x0_ref, out_ref, pad_ref, *, n, iters, tol, eps):
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply = _make_apply(S_ref, pad_ref, n, prezeroed=True)
    Kinv = 1.0 / S_ref[CENTER]
    b = b_ref[:, :]
    x = x0_ref[:, :]

    r = b - apply(x)
    rhat = r
    rho = jnp.sum(rhat * r)
    p = r
    atol2 = tol * tol * jnp.sum(b * b)

    def safe_div(a, d):
        return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))

    def cond(carry):
        k, x, r, p, rho, rnorm2 = carry
        return (k < iters) & (rnorm2 > atol2)

    def body(carry):
        k, x, r, p, rho, _ = carry
        phat = Kinv * p
        v = apply(phat)
        alpha = safe_div(rho, jnp.sum(rhat * v))
        s = r - alpha * v
        shat = Kinv * s
        t = apply(shat)
        omega = safe_div(jnp.sum(t * s), jnp.sum(t * t))
        x = x + alpha * phat + omega * shat
        r = s - omega * t
        rho_new = jnp.sum(rhat * r)
        beta = safe_div(rho_new, rho) * safe_div(alpha, omega)
        p = r + beta * (p - omega * v)
        return k + 1, x, r, p, rho_new, jnp.sum(r * r)

    init = (jnp.asarray(0, jnp.int32), x, r, p, rho, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    out_ref[:, :] = x


def bicgstab_pallas(S, b, x0=None, iters: int = 60, tol: float = 1e-7):
    """Solve S x = b with Jacobi-preconditioned BiCGStab, one kernel launch,
    everything VMEM-resident; tolerance-based early exit via an in-kernel
    while loop (the same convergence behavior as the XLA path, without the
    per-iteration HBM round-trips)."""
    n = b.shape[-1]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    kern = functools.partial(_bicgstab_kernel, n=n, iters=iters, tol=tol, eps=1e-30)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2), b.dtype)],
        interpret=_interp(),
    )(S, b, x0)


# ---------------------------------------------------------------------------
# Fixed-iteration Jacobi-preconditioned CG (SPD solves), fully in VMEM
# ---------------------------------------------------------------------------

def _cg_kernel(S_ref, b_ref, x0_ref, out_ref, pad_ref, *, n, iters, tol, eps):
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply = _make_apply(S_ref, pad_ref, n, prezeroed=True)
    Kinv = 1.0 / S_ref[CENTER]
    b = b_ref[:, :]
    x = x0_ref[:, :]
    r = b - apply(x)
    z = Kinv * r
    p = z
    rz = jnp.sum(r * z)
    atol2 = tol * tol * jnp.sum(b * b)

    def safe_div(a, d):
        return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))

    def cond(carry):
        k, x, r, z, p, rz, rnorm2 = carry
        return (k < iters) & (rnorm2 > atol2)

    def body(carry):
        k, x, r, z, p, rz, _ = carry
        Ap = apply(p)
        alpha = safe_div(rz, jnp.sum(p * Ap))
        x = x + alpha * p
        r = r - alpha * Ap
        z = Kinv * r
        rz_new = jnp.sum(r * z)
        beta = safe_div(rz_new, rz)
        p = z + beta * p
        return k + 1, x, r, z, p, rz_new, jnp.sum(r * r)

    init = (jnp.asarray(0, jnp.int32), x, r, z, p, rz, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    out_ref[:, :] = x


def cg_pallas(S, b, x0=None, iters: int = 60, tol: float = 1e-7):
    n = b.shape[-1]
    if x0 is None:
        x0 = jnp.zeros_like(b)
    kern = functools.partial(_cg_kernel, n=n, iters=iters, tol=tol, eps=1e-30)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(b.shape, b.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2), b.dtype)],
        interpret=_interp(),
    )(S, b, x0)


# ---------------------------------------------------------------------------
# Fused antidiffusive flux + Zalesak limiter + correction
# ---------------------------------------------------------------------------

def _flux_zalesak_kernel(M_ref, D_ref, du_ref, ul_ref, ML_ref, out_ref,
                         padu_ref, paddu_ref, *, n, dt):
    """u^{n+1} = u_L + dt * F̄ / m_i with F̄ from the Zalesak limiter
    (helpers.py:1812-1872), one kernel."""
    ul = ul_ref[:, :]
    du = du_ref[:, :]
    ML = ML_ref[:, :]

    padu_ref[:, :] = jnp.zeros_like(padu_ref)
    padu_ref[1 : n + 1, 1 : n + 1] = ul
    paddu_ref[:, :] = jnp.zeros_like(paddu_ref)
    paddu_ref[1 : n + 1, 1 : n + 1] = du

    ones = jnp.ones_like(ul)
    fluxes = []
    p_pos = jnp.zeros_like(ul)
    p_neg = jnp.zeros_like(ul)
    u_max = ul
    u_min = ul
    for d in EDGE_NEIGHBOR_IDS:
        ul_d = _shifted(padu_ref, d, n)
        du_d = _shifted(paddu_ref, d, n)
        F = M_ref[d] * (du - du_d) + D_ref[d] * (ul - ul_d)
        fluxes.append(F)
        p_pos += jnp.maximum(F, 0.0)
        p_neg += jnp.minimum(F, 0.0)
        # out-of-domain neighbors take the center value (padding wrote zeros;
        # recover by masking with the shifted ones-field)
        valid = _shifted_mask(d, n, ul.dtype)
        nbr = ul_d + (1.0 - valid) * ul
        u_max = jnp.maximum(u_max, nbr)
        u_min = jnp.minimum(u_min, nbr)

    q_pos = u_max - ul
    q_neg = u_min - ul
    den_pos = dt * p_pos  # branch on the PRODUCT: dt*p can underflow to 0
    r_pos = jnp.where(               # in f32 while p > 0, and 0/0 would NaN
        den_pos > 0.0,
        jnp.minimum(1.0, ML * q_pos / jnp.where(den_pos > 0.0, den_pos, 1.0)),
        1.0,
    )
    den_neg = dt * p_neg
    r_neg = jnp.where(
        den_neg < 0.0,
        jnp.minimum(1.0, ML * q_neg / jnp.where(den_neg < 0.0, den_neg, 1.0)),
        1.0,
    )

    # reuse the padded scratches for the shifted r fields (fill = 1)
    padu_ref[:, :] = jnp.ones_like(padu_ref)
    padu_ref[1 : n + 1, 1 : n + 1] = r_pos
    paddu_ref[:, :] = jnp.ones_like(paddu_ref)
    paddu_ref[1 : n + 1, 1 : n + 1] = r_neg

    fbar = jnp.zeros_like(ul)
    for k, d in enumerate(EDGE_NEIGHBOR_IDS):
        F = fluxes[k]
        lim_pos = jnp.minimum(r_pos, _shifted(paddu_ref, d, n))
        lim_neg = jnp.minimum(r_neg, _shifted(padu_ref, d, n))
        fbar += jnp.where(F > 0.0, lim_pos * F, jnp.where(F < 0.0, lim_neg * F, 0.0))

    out_ref[:, :] = ul + dt * fbar / ML


def _shifted_mask(d: int, n: int, dtype):
    di, dj = OFFSETS[d]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ok = (row + di >= 0) & (row + di < n) & (col + dj >= 0) & (col + dj < n)
    return ok.astype(dtype)


def flux_zalesak_pallas(M, D, du_dt, u_low, ML_diag, dt):
    n = u_low.shape[-1]
    kern = functools.partial(_flux_zalesak_kernel, n=n, dt=dt)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(u_low.shape, u_low.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n + 2, n + 2), u_low.dtype),
            pltpu.VMEM((n + 2, n + 2), u_low.dtype),
        ],
        interpret=_interp(),
    )(M, D, du_dt, u_low, ML_diag)
