"""Fully-fused chemotaxis step kernels.

The flagship workload (Keller–Segel FCT step, helpers.py:1321-1356) spends
its time in ~50 small XLA fusions whose launch overhead and HBM traffic
dominate at production grid sizes. These kernels collapse each half-step
into ONE ``pallas_call``:

``fused_chemotaxis_u_step``: P1 assembly of the chemotaxis transport matrix
A = Dm*K - χ (e^{-ηu} ∇v_h · ∇φ_a, φ_b)  →  artificial diffusion D →
low-order matrix → BiCGStab solve → Chebyshev du/dt → antidiffusive fluxes →
Zalesak limiter → corrected u^{n+1}; everything VMEM-resident
(~13 MB at 256² f32).

``fused_chemotaxis_v_step``: load-vector assembly (c_h u_h / r, φ_a) →
implicit CG solve for v^{n+1}.

VMEM trick: after the low-order solve the A planes are no longer needed in
raw form — A x is reconstructed from (Low, D) via
A = (Low - diag(M_L))/dt + D, so A is transformed into Low in place and only
four stencils (K, M, A/Low, D) are ever resident.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, OFFSETS, opposite
from fem_fct_pdeco_tpu.ops.assembly import TRI_CORNERS, _basis_gradients, _offset_index
from fem_fct_pdeco_tpu.ops.pallas_kernels import _interp, _make_apply, _shifted
from fem_fct_pdeco_tpu.ops.quadrature import barycentric, rule_for_degree


# Always-on FCT safety telemetry (helpers.py:1784-1810): every whole-sweep
# kernel carries one tile-aligned VMEM output block holding the sweep-wide
# MIN row sum of the FCT low-order matrices, min-accumulated by _fct_core
# (inv_ref). The block is written whole (scalar broadcast) — no sub-tile
# stores. Sentinel value = "no FCT step recorded".
_INV_BLOCK = (8, 128)
_STATS_SENTINEL = 1e30  # keep in sync with ops.fct.STATS_SENTINEL


def _inv_spec():
    return pl.BlockSpec(_INV_BLOCK, lambda *_: (0, 0),
                        memory_space=pltpu.VMEM)


def _inv_shape(dtype):
    return jax.ShapeDtypeStruct(_INV_BLOCK, dtype)


def _inv_init(inv_ref):
    """Call under the kernel's first-grid-step pl.when."""
    inv_ref[:, :] = jnp.full(_INV_BLOCK, _STATS_SENTINEL, inv_ref.dtype)


def _quad_consts(degree, h, dtype=np.float64):
    pts, wts = rule_for_degree(degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    return wts, bary, grads


def _safe_div(a, d, eps=1e-30):
    return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))


def _as_pinv(prec):
    """Normalize a preconditioner spec: an (n, n) array means Jacobi
    (elementwise inverse-diagonal multiply); a callable is applied as
    r -> P^{-1} r."""
    if callable(prec):
        return prec
    return lambda r: prec * r


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: C[k, i] = s_k cos(pi k (2i+1) / (2n))."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    C = np.cos(np.pi * k * (2 * i + 1) / (2.0 * n)) * np.sqrt(2.0 / n)
    C[0] *= np.sqrt(0.5)
    return C


def dct_precond_ilam(n: int, h: float, dt: float, diff_coef: float,
                     mass_coef: float = 1.0) -> np.ndarray:
    """Inverse modal eigenvalues of the spectral preconditioner
    P = mass_coef*h^2*I + dt*diff_coef*K5 for the Krylov solves.

    On the right-triangulated uniform P1 mesh the stiffness matrix IS the
    5-point Laplacian in the interior (the (+1,+1)/(-1,-1) couplings cancel),
    and cosine modes diagonalize it under the natural Neumann boundary; the
    mass is approximated by its interior lumped value h^2. P^{-1} is applied
    exactly per mode via two DCTs (MXU matmuls in-kernel) — it captures the
    stiff diffusive part of the operators, leaving Krylov only the advective
    / artificial-diffusion / boundary-scaling remainder.
    """
    mu = 2.0 - 2.0 * np.cos(np.pi * np.arange(n) / n)
    lam = mass_coef * h * h + dt * diff_coef * (mu[:, None] + mu[None, :])
    return 1.0 / lam


def _make_dct_pinv(C_ref, ilam_ref, dtype, precision=None):
    """r -> C^T ((C r C^T) * invLam) C, all four contractions on the MXU.

    Default precision: bf16 MXU passes with f32 accumulation — plenty for a
    preconditioner (the Krylov loops exit on the TRUE residual, so P^{-1}
    accuracy affects only the iteration count, never the solution)."""
    hi = precision if precision is not None else jax.lax.Precision.DEFAULT

    def pinv(r):
        C = C_ref[:, :]
        t = jax.lax.dot_general(C, r, (((1,), (0,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)
        rh = jax.lax.dot_general(t, C, (((1,), (1,)), ((), ())), precision=hi,
                                 preferred_element_type=dtype)
        rh = rh * ilam_ref[:, :]
        t2 = jax.lax.dot_general(C, rh, (((0,), (0,)), ((), ())), precision=hi,
                                 preferred_element_type=dtype)
        return jax.lax.dot_general(t2, C, (((1,), (0,)), ((), ())), precision=hi,
                                   preferred_element_type=dtype)

    return pinv


def _make_dct_pinv2(C2_ref, ilam_ref, dtype, precision=None):
    """_make_dct_pinv on a stacked (2, n, n) ref holding {C, C^T}.

    The four products are all plain (1,)x(0,) row-major contractions, so
    Mosaic never materializes relayout copies of C inside the Krylov
    while_loop — the register-allocator spill fix for the large-grid
    kernels (a (1,1)/(0,0) contraction of a loop-read (n, n) operand costs
    a transposed staging copy PER APPLY, measured round 4 as the dominant
    VMEM spill source at >=512^2)."""
    hi = precision if precision is not None else jax.lax.Precision.DEFAULT

    def mm(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   precision=hi, preferred_element_type=dtype)

    def pinv(r):
        C = C2_ref[0, :, :]
        Ct = C2_ref[1, :, :]
        rh = mm(mm(C, r), Ct)
        rh = rh * ilam_ref[:, :]
        return mm(mm(Ct, rh), C)

    return pinv


def _dct_inputs2(n, h, dt, dtype, coefs):
    """(stacked {C, C^T}, ilam...) device inputs for _make_dct_pinv2."""
    C = jnp.asarray(dct_matrix(n), dtype=dtype)
    C2 = jnp.stack([C, C.T])
    ilams = [
        jnp.asarray(dct_precond_ilam(n, h, dt, dc, mc), dtype=dtype)
        for (dc, mc) in coefs
    ]
    return (C2, *ilams)


def _bicgstab(apply_A, prec, b, x0, tol, iters, st=None):
    """Preconditioned BiCGStab to relative tolerance ``tol`` (vs ‖b‖),
    fixed-shape in-kernel while loop. ``prec``: Jacobi array or P^{-1}
    callable (_as_pinv). Matches scipy semantics closely enough
    for the low-order FCT solve (M-matrix, diagonally dominant).

    ``st``: optional tuple of FOUR (n, n) VMEM ref windows (x, r, rhat, p).
    When given, the solver state lives in the refs and the while_loop
    carries only scalars — the register-spill diet of the lean (≥large
    grid) kernels: Mosaic gives every loop's (n, n) carries dedicated
    VMEM spill slots with no cross-region reuse (measured round 4:
    ~46 field planes of spill slots across the whole lean step kernel,
    270 MB at 1024² f32), so plane-valued carries are the enemy. The refs
    are scratch the caller is not using during the solve."""
    Pinv = _as_pinv(prec)
    atol2 = tol * tol * jnp.sum(b * b)
    if st is not None:
        x_ref, r_ref, rhat_ref, p_ref = st
        x_ref[...] = x0
        r = b - apply_A(x0)
        r_ref[...] = r
        rhat_ref[...] = r
        p_ref[...] = r
        rho0 = jnp.sum(r * r)

        def cond_st(c):
            k, rho, rn2 = c
            return (k < iters) & (rn2 > atol2)

        def body_st(c):
            k, rho, _ = c
            p = p_ref[...]
            phat = Pinv(p)
            v = apply_A(phat)
            alpha = _safe_div(rho, jnp.sum(rhat_ref[...] * v))
            s = r_ref[...] - alpha * v
            shat = Pinv(s)
            t2 = apply_A(shat)
            omega = _safe_div(jnp.sum(t2 * s), jnp.sum(t2 * t2))
            x_ref[...] = x_ref[...] + alpha * phat + omega * shat
            r2 = s - omega * t2
            r_ref[...] = r2
            rho2 = jnp.sum(rhat_ref[...] * r2)
            beta = _safe_div(rho2, rho) * _safe_div(alpha, omega)
            p_ref[...] = r2 + beta * (p - omega * v)
            return k + 1, rho2, jnp.sum(r2 * r2)

        jax.lax.while_loop(cond_st, body_st,
                           (jnp.asarray(0, jnp.int32), rho0, rho0))
        return x_ref[...]
    x = x0
    r = b - apply_A(x)
    rhat = r
    rho = jnp.sum(rhat * r)
    p = r

    def cond(c):
        k, x, r, p, rho, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, x, r, p, rho, _ = c
        phat = Pinv(p)
        v = apply_A(phat)
        alpha = _safe_div(rho, jnp.sum(rhat * v))
        s = r - alpha * v
        shat = Pinv(s)
        t2 = apply_A(shat)
        omega = _safe_div(jnp.sum(t2 * s), jnp.sum(t2 * t2))
        x2 = x + alpha * phat + omega * shat
        r2 = s - omega * t2
        rho2 = jnp.sum(rhat * r2)
        beta = _safe_div(rho2, rho) * _safe_div(alpha, omega)
        p2 = r2 + beta * (p - omega * v)
        return k + 1, x2, r2, p2, rho2, jnp.sum(r2 * r2)

    init = (jnp.asarray(0, jnp.int32), x, r, p, rho, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    return x


def _cg(apply_A, prec, b, x0, tol, iters, st=None):
    """Preconditioned CG to relative tolerance ``tol`` (vs ‖b‖). ``prec``:
    Jacobi array or SPD P^{-1} callable (_as_pinv). ``st``: optional tuple
    of FOUR (n, n) VMEM ref windows (x, r, z, p) for ref-state mode (see
    _bicgstab; scalar-only while_loop carries)."""
    Pinv = _as_pinv(prec)
    atol2 = tol * tol * jnp.sum(b * b)
    if st is not None:
        x_ref, r_ref, z_ref, p_ref = st
        x_ref[...] = x0
        r = b - apply_A(x0)
        r_ref[...] = r
        z = Pinv(r)
        z_ref[...] = z
        p_ref[...] = z
        rz0 = jnp.sum(r * z)
        rn0 = jnp.sum(r * r)

        def cond_st(c):
            k, rz, rn2 = c
            return (k < iters) & (rn2 > atol2)

        def body_st(c):
            k, rz, _ = c
            p = p_ref[...]
            Ap = apply_A(p)
            alpha = _safe_div(rz, jnp.sum(p * Ap))
            x_ref[...] = x_ref[...] + alpha * p
            r2 = r_ref[...] - alpha * Ap
            r_ref[...] = r2
            z2 = Pinv(r2)
            z_ref[...] = z2
            rz2 = jnp.sum(r2 * z2)
            beta = _safe_div(rz2, rz)
            p_ref[...] = z2 + beta * p
            return k + 1, rz2, jnp.sum(r2 * r2)

        jax.lax.while_loop(cond_st, body_st,
                           (jnp.asarray(0, jnp.int32), rz0, rn0))
        return x_ref[...]
    x = x0
    r = b - apply_A(x)
    z = Pinv(r)
    p = z
    rz = jnp.sum(r * z)

    def cond(c):
        k, x, r, z, p, rz, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, x, r, z, p, rz, _ = c
        Ap = apply_A(p)
        alpha = _safe_div(rz, jnp.sum(p * Ap))
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = Pinv(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = _safe_div(rz2, rz)
        p2 = z2 + beta * p
        return k + 1, x2, r2, z2, p2, rz2, jnp.sum(r2 * r2)

    init = (jnp.asarray(0, jnp.int32), x, r, z, p, rz, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    return x


def _corners(val, nc):
    """Per-cell corner values of an (n, n) field: [t][a] -> (nc, nc)."""
    return [
        [val[ai : ai + nc, aj : aj + nc] for (ai, aj) in TRI_CORNERS[t]]
        for t in range(2)
    ]


def _assemble_forward_A(u, v, K_ref, A_ref, *, nc, Dm, chi, eta, wts, bary, grads):
    """Write A = Dm*K - χ (e^{-ηu} ∇v_h·∇φ_a, φ_b) into A_ref
    (helpers.py:1350-1352). ``u``, ``v`` are (n, n) values. Streams each
    contribution into A_ref as soon as it is computed (read-modify-write
    on the plane) instead of accumulating 9 plane + 12 corner VALUES —
    the liveness fix that keeps 1024² inside the register-spill budget
    (docs/roadmap.md large-grid notes)."""
    for d in range(9):
        A_ref[d, :, :] = Dm * K_ref[d, :, :]
    for t in range(2):
        corners = TRI_CORNERS[t]
        # per-element gradient of v_h: sum_a v_a grad(lambda_a)
        gvx = sum(_corner_win(v, t, a, nc) * grads[t, a, 0] for a in range(3))
        gvy = sum(_corner_win(v, t, a, nc) * grads[t, a, 1] for a in range(3))
        # Vb[b] = sum_q w_q e^{-eta u(q)} lambda_b(q)   (detJ folded into wts)
        Vb = [None] * 3
        for q in range(len(wts)):
            uq = (bary[q, 0] * _corner_win(u, t, 0, nc)
                  + bary[q, 1] * _corner_win(u, t, 1, nc)
                  + bary[q, 2] * _corner_win(u, t, 2, nc))
            e = wts[q] * jnp.exp(-eta * uq)
            for b in range(3):
                contrib = bary[q, b] * e
                Vb[b] = contrib if Vb[b] is None else Vb[b] + contrib
        for a, (ai, aj) in enumerate(corners):
            # fold the -chi scale into the test-gradient factor once per a
            ga = (-chi * grads[t, a, 0]) * gvx + (-chi * grads[t, a, 1]) * gvy
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(ga * Vb[b], ((ai, 1 - ai), (aj, 1 - aj)))
                A_ref[d, :, :] = A_ref[d, :, :] + placed


def _rolled_corner(f, ai, aj, n):
    """Aligned full-plane read of corner (ai, aj): out[i, j] = f[i+ai, j+aj]
    (wraparound values land in rows/cols that the scatter masks out).
    pltpu.roll needs a non-negative shift: roll(-s) == roll(n-s)."""
    if ai:
        f = pltpu.roll(f, n - ai, 0)
    if aj:
        f = pltpu.roll(f, n - aj, 1)
    return f


def _assemble_forward_A_aligned(u, v, K_ref, A_ref, *, n, Dm, chi, eta,
                                wts, bary, grads):
    """Lane-aligned variant of _assemble_forward_A (same math and operation
    order; machine-level parity pinned by the interpret test):
    _assemble_forward_A reads (n-1, n-1) corner windows at offsets
    (0|1, 0|1), every one an unaligned layout for Mosaic. Here the four shifted FULL planes of u and v are materialized
    once per field with pltpu.roll (lane/sublane rotates), all quadrature
    arithmetic runs on aligned (n, n) planes, and the per-(a,b) cell-block
    scatter is a roll + iota-mask select instead of jnp.pad. Opt-in
    (fused_chemotaxis_forward_sweep(lane_aligned=True)) until the hardware
    A/B shows a win; everything is UNROLLED code, so the extra planes are
    transient values, not loop-carried state (Mosaic compile-time rules,
    docs/roadmap.md)."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    nc = n - 1
    for d in range(9):
        A_ref[d, :, :] = Dm * K_ref[d, :, :]
    up = {(ai, aj): _rolled_corner(u, ai, aj, n)
          for ai in (0, 1) for aj in (0, 1)}
    vp = {(ai, aj): _rolled_corner(v, ai, aj, n)
          for ai in (0, 1) for aj in (0, 1)}
    for t in range(2):
        corners = TRI_CORNERS[t]
        gvx = sum(vp[corners[a]] * grads[t, a, 0] for a in range(3))
        gvy = sum(vp[corners[a]] * grads[t, a, 1] for a in range(3))
        Vb = [None] * 3
        for q in range(len(wts)):
            uq = sum(bary[q, a] * up[corners[a]] for a in range(3))
            e = wts[q] * jnp.exp(-eta * uq)
            for b in range(3):
                contrib = bary[q, b] * e
                Vb[b] = contrib if Vb[b] is None else Vb[b] + contrib
        for a, (ai, aj) in enumerate(corners):
            ga = (-chi * grads[t, a, 0]) * gvx + (-chi * grads[t, a, 1]) * gvy
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                P = ga * Vb[b]
                # place the cell block at (ai, aj): out[i, j] = P[i-ai, j-aj]
                # on ai <= i < ai+nc, aj <= j < aj+nc, else unchanged
                if ai:
                    P = pltpu.roll(P, ai, 0)
                if aj:
                    P = pltpu.roll(P, aj, 1)
                mask = ((row_ids >= ai) & (row_ids < ai + nc)
                        & (col_ids >= aj) & (col_ids < aj + nc))
                A_ref[d, :, :] = A_ref[d, :, :] + jnp.where(mask, P, 0.0)


def _v_load(c, u, *, nc, h2):
    """Load vector (c_h u_h, φ_a) as an (n, n) value (helpers.py:1339-1340;
    the dt/r factor is applied by the caller). The integrand is cubic, so
    the closed-form moments equal the reference's degree-3 rule exactly."""
    return _lf_prod([c, u], nc=nc, h2=h2)


def _fused_u_kernel(
    u_ref, v_ref, K_ref, M_ref, Md_ref, ML_ref, rhs_ref, out_ref,
    A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, tol, iters, cheb_iters, wts, bary, grads,
):
    _assemble_forward_A(u_ref[:, :], v_ref[:, :], K_ref, A_ref, nc=n - 1,
                        Dm=Dm, chi=chi, eta=eta, wts=wts, bary=bary, grads=grads)
    out_ref[:, :] = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_ref[:, :], rhs_ref[:, :],
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
    )


def _fct_core(A_ref, D_ref, pad_ref, M_ref, Md_ref, ML, u_prev, rhs,
              *, n, dt, tol, iters, cheb_iters, x0=None, S=None, prec=None,
              m_swap=None, S_at=None, A_direct=None, xpads=None, park=None,
              inv_ref=None):
    """FCT step tail, given the assembled flux matrix in A_ref: artificial
    diffusion -> low-order matrix (A_ref transformed in place) -> BiCGStab ->
    Chebyshev du/dt -> fluxes -> Zalesak -> corrected solution (returned as a
    value). ``x0``: optional warm start for the low-order solve (defaults to
    ``u_prev``; sweeps pass the linear extrapolation 2 u_n - u_{n-1}).
    ``S``: optional non-flux matrix (``non_flux`` of ops/fct.py: enters the
    low-order matrix but not the artificial diffusion or the du/dt flux
    right-hand side) as a list of 9 plane VALUES with None for structurally
    zero planes.
    ``m_swap``: synth-kernel hook — the Low matrix is DEAD once the du/dt
    right-hand side is computed, so the hook materializes the (synthesized)
    consistent mass into the A_ref scratch at that point and returns the
    new M accessor; the Chebyshev loop and the flux stage then read VMEM
    instead of re-synthesizing M's planes per use.
    ``S_at``: synth-kernel alternative to ``S`` — a callable d -> plane
    value, materialized TRANSIENTLY at each use site so the non-flux
    planes never span the Krylov while_loop as live VMEM values.
    ``A_direct``: optional apply for the raw flux matrix; when given, the
    du/dt right-hand side uses it instead of reconstructing
    A = (Low - ML)/dt + D - S (synth kernels re-synthesize A cheaper than
    keeping the pieces alive).
    ``xpads``: optional tuple of THREE extra (n+2, n+2) pad scratch refs;
    when given, the flux/Zalesak stage reads every shifted operand lazily
    through pad windows instead of materializing ~40 (n, n) values — the
    register-spill fix that lets the synth kernels fit 1024² in VMEM.
    ``inv_ref``: optional small VMEM output block for the always-on FCT
    safety telemetry (helpers.py:1784-1810 semantics): after the Low
    transform, the min row sum of the low-order matrix is min-accumulated
    into it (the sweep kernel initializes it to the sentinel at its first
    grid step; a value <= 0 means the M-matrix property was lost).
    ``park``: optional tuple ``(rawA7_ref, ahbm_ref, sem, xpad4)`` enabling
    the ONE-7-plane-buffer mode of the lean (≥1024²) kernels: the raw flux
    matrix is parked in an HBM scratch while its VMEM buffer holds the
    low-order matrix for the Krylov solve, then restored for the du/dt
    right-hand side; the artificial diffusion D is never materialized as a
    stencil (transient plane pairs during the Low transform, recomputed
    per edge through ``xpad4`` in the flux stage), and the consistent mass
    is synthesized at use (``M_ref`` must be a _SynthPlanes; ``m_swap``
    must be None). Requires ``xpads``."""
    if S_at is not None:
        assert S is None
    if park is not None:
        assert m_swap is not None and A_direct is None and xpads is not None
        # optional 5th element ``park_out=False``: the HBM ref ALREADY holds
        # the canonical raw A (a stationary flux matrix passed as an HBM
        # input) — skip the park-out DMA and only restore from it
        rawA7_ref, ahbm_ref, park_sem, xpad4 = park[:4]
        park_out = park[4] if len(park) > 4 else True
    # VMEM-pressure stage probe (debug): FEMFCT_STAGE_PROBE={pre,low,cheb}
    # truncates the step after the named stage so the register-allocator
    # spill report of a deliberately under-limited compile attributes the
    # pressure to a stage (see docs/roadmap.md large-grid notes)
    probe = os.environ.get("FEMFCT_STAGE_PROBE", "")
    # compact-layout stencils (the synth kernels) declare their structurally
    # zero planes; skip the dead work for them
    zero_planes = getattr(type(A_ref), "zero_planes", ())

    def s_plane(d):
        if S is not None:
            return S[d]
        if S_at is not None:
            return S_at(d)
        return None

    if park is not None:
        # ---- 2+3 fused (lean): park raw A in HBM, then transform A -> Low
        # in place PAIRWISE with transient artificial-diffusion planes.
        # D is symmetric, so D_od = shift_od(D_d); max(0, ...) makes the
        # padded zeros shifted in at the boundary agree with the
        # masked-assembly zeros of a directly-computed plane.
        if park_out:
            cp = pltpu.make_async_copy(rawA7_ref, ahbm_ref, park_sem)
            cp.start()
            b = ML * u_prev + dt * rhs  # overlaps the park DMA
            cp.wait()
        else:
            b = ML * u_prev + dt * rhs
        offsum = None
        pad_ref[:, :] = jnp.zeros_like(pad_ref)
        xpad4[:, :] = jnp.zeros_like(xpad4)
        for d in range(9):
            od = opposite(d)
            if d >= od or d in zero_planes:
                continue
            pad_ref[1 : n + 1, 1 : n + 1] = A_ref[od]
            Dd = jnp.maximum(0.0, jnp.maximum(A_ref[d, :, :],
                                              _shifted(pad_ref, d, n)))
            xpad4[1 : n + 1, 1 : n + 1] = Dd
            Dod = _shifted(xpad4, od, n)
            pl_d = A_ref[d, :, :] - Dd
            pl_od = A_ref[od, :, :] - Dod
            sd, sod = s_plane(d), s_plane(od)
            if sd is not None:
                pl_d = pl_d + sd
            if sod is not None:
                pl_od = pl_od + sod
            A_ref[d, :, :] = dt * pl_d
            A_ref[od, :, :] = dt * pl_od
            acc = Dd + Dod
            offsum = acc if offsum is None else offsum + acc
        cd = A_ref[CENTER, :, :] + offsum  # A_c - D_c with D_c = -offsum
        sc = s_plane(CENTER)
        if sc is not None:
            cd = cd + sc
        A_ref[CENTER, :, :] = ML + dt * cd
    else:
        # ---- 2. artificial diffusion D (helpers.py:206-242 semantics) ---
        pad_ref[:, :] = jnp.zeros_like(pad_ref)
        offsum = None
        for d in range(9):
            if d == CENTER or d in zero_planes:
                continue
            pad_ref[1 : n + 1, 1 : n + 1] = A_ref[opposite(d)]
            Atr = _shifted(pad_ref, d, n)
            Dd = jnp.maximum(0.0, jnp.maximum(A_ref[d, :, :], Atr))
            D_ref[d, :, :] = Dd
            offsum = Dd if offsum is None else offsum + Dd
        D_ref[CENTER, :, :] = -offsum

        # ---- 3. transform A -> Low: Low = diag(ML) + dt (A - D + S) -----
        for d in range(9):
            if d in zero_planes:
                continue
            plane = A_ref[d, :, :] - D_ref[d, :, :]
            sd = s_plane(d)
            if sd is not None:
                plane = plane + sd
            plane = dt * plane
            if d == CENTER:
                plane = plane + ML
            A_ref[d, :, :] = plane
    if inv_ref is not None:
        # always-on M-matrix telemetry (helpers.py:1784-1810): min row sum
        # of Low, min-accumulated across the sweep's grid steps. Unrolled
        # code outside the solver loops — no loop-carried (n, n) values.
        rs = None
        for d in range(9):
            if d in zero_planes:
                continue
            rs = A_ref[d, :, :] if rs is None else rs + A_ref[d, :, :]
        inv_ref[:, :] = jnp.minimum(inv_ref[:, :], jnp.min(rs))
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_low = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_D = _make_apply(D_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    def apply_S(x):
        pad_ref[1 : n + 1, 1 : n + 1] = x
        acc = S[CENTER] * x if S[CENTER] is not None else jnp.zeros_like(x)
        for d in range(9):
            if d == CENTER or S[d] is None:
                continue
            acc = acc + S[d] * _shifted(pad_ref, d, n)
        return acc

    def apply_A(x):
        # A = (Low - diag(ML))/dt + D - S  (the flux matrix alone drives the
        # antidiffusive du/dt, helpers.py:1812-1815)
        if A_direct is not None:
            return A_direct(x)
        out = (apply_low(x) - ML * x) / dt + apply_D(x)
        if S is not None:
            out = out - apply_S(x)
        return out

    # ---- 4. low-order solve (BiCGStab, in-kernel while loop) ------------
    if park is None:
        b = ML * u_prev + dt * rhs
    if probe == "pre":
        return b
    if park is not None:
        # ref-state Krylov (scalar-only while_loop carries): the solver
        # state lives in the xpad windows, which are unused between the
        # Low transform and the limiter — the register-spill diet that
        # makes the lean kernels fit large grids (see _bicgstab's st)
        st4 = (xpads[0].at[:n, :n], xpads[1].at[:n, :n],
               xpads[2].at[:n, :n], xpad4.at[:n, :n])
    else:
        st4 = None
    u_low = _bicgstab(apply_low, 1.0 / A_ref[CENTER] if prec is None else prec,
                      b, u_prev if x0 is None else x0, tol, iters, st=st4)
    if probe == "low":
        return u_low

    # ---- 5. Chebyshev du/dt on M du = -A u_low + rhs --------------------
    if park is not None:
        # Low is dead after this apply's restore: bring the raw flux matrix
        # back from HBM and drive the du/dt right-hand side with it directly
        # (one stencil apply instead of Low + D + S reconstruction)
        cp = pltpu.make_async_copy(ahbm_ref, rawA7_ref, park_sem)
        cp.start()
        cp.wait()
        apply_Araw = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                                 skip_planes=ANTI_DIAGONAL_IDS)
        rdot = -apply_Araw(u_low) + rhs
        # the Chebyshev fori_loop must read the consistent mass from a VMEM
        # REF (a synthesized plane read inside a lax loop body sends Mosaic
        # layout analysis from seconds to tens of minutes — CLAUDE.md): the
        # m_swap hook materializes M into the A buffer (the HBM copy of
        # raw A survives; it is restored a second time for the flux stage)
        M_cheb = m_swap()
    else:
        rdot = -apply_A(u_low) + rhs
        if m_swap is not None:
            M_ref = m_swap()  # Low dead: A_ref now holds the consistent mass
        M_cheb = M_ref
    apply_M = _make_apply(M_cheb, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    lmin, lmax = 0.5, 2.0
    rho_c = (lmax - lmin) / (lmax + lmin)
    rc2 = rho_c * rho_c
    om2 = 1.0 / (1.0 - rc2 / 2.0)
    Mdinv = 1.0 / (((lmin + lmax) / 2.0) * Md_ref[:, :])
    # Iterations 3..cheb_iters run as a fori_loop, not an unrolled Python
    # loop: the unrolled Chebyshev stage dominated Mosaic compile time of
    # the whole-sweep kernels (measured 512² synth: 225 s unrolled vs ~90 s
    # with the stage collapsed). The (n, n) operands ride the CARRY (like
    # the Krylov loops' states) so no synthesized value is closed over by
    # the loop body, and iterations 1-2 are peeled so every carried value
    # enters with a concrete vector layout (Mosaic rejects a relayout of
    # splat-zero inits against the loop body's layouts) — peeling also
    # removes the om-recurrence special cases from the body.
    #   iter 1 (om=1, yold=ymid=0):  ymid_1 = rdot * Mdinv
    du = rdot * Mdinv
    if cheb_iters >= 2 and park is not None:
        # ref-state Chebyshev (same spill diet as the Krylov solves): the
        # y/rdot/Mdinv planes live in the xpad windows freed by the
        # finished BiCGStab; the fori_loop carries only the om scalar.
        # The ping-pong costs one extra VMEM copy per iteration.
        yold_ref, ymid_ref, rdot_ref = (
            xpads[0].at[:n, :n], xpads[1].at[:n, :n], xpads[2].at[:n, :n])
        mdinv_ref = xpad4.at[:n, :n]
        rdot_ref[...] = rdot
        mdinv_ref[...] = Mdinv
        yold_ref[...] = du
        rr = rdot - apply_M(du)
        ymid_ref[...] = om2 * (rr * Mdinv + du)

        def cheb_body_st(k, om):
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            ymid = ymid_ref[...]
            rr = rdot_ref[...] - apply_M(ymid)
            ynew = (om * (rr * mdinv_ref[...] + ymid - yold_ref[...])
                    + yold_ref[...])
            yold_ref[...] = ymid
            ymid_ref[...] = ynew
            return om

        jax.lax.fori_loop(2, cheb_iters, cheb_body_st,
                          jnp.asarray(om2, rdot.dtype))
        du = ymid_ref[...]
    elif cheb_iters >= 2:
        #   iter 2 (om=om2, yold_2=0): ynew_2 = om2 (rr Mdinv + ymid_1)
        rr = rdot - apply_M(du)
        du2 = om2 * (rr * Mdinv + du)

        def cheb_body(k, carry):
            yold, ymid, om, rdot_c, Mdinv_c = carry
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            rr = rdot_c - apply_M(ymid)
            ynew = om * (rr * Mdinv_c + ymid - yold) + yold
            return ymid, ynew, om, rdot_c, Mdinv_c

        _, du, _, _, _ = jax.lax.fori_loop(
            2, cheb_iters, cheb_body,
            (du, du2, jnp.asarray(om2, rdot.dtype), rdot, Mdinv))
    if park is not None:
        # second restore: the flux stage recomputes D per edge from raw A
        # (M was materialized over it for the Chebyshev loop; the flux
        # loops are UNROLLED, so their M reads synthesize at use)
        cp = pltpu.make_async_copy(ahbm_ref, rawA7_ref, park_sem)
        cp.start()
        cp.wait()
        # the limiter's D_at shifted reads expect zeroed xpad4 borders; the
        # ref-state Krylov/Chebyshev stages left residue in its [:n, :n]
        # window (p-slot / Mdinv)
        xpad4[:, :] = jnp.zeros_like(xpad4)
    if probe == "cheb":
        return du

    # ---- 6/7. fluxes + Zalesak + correction -----------------------------
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    if xpads is not None:
        # Low-liveness limiter for the large-grid (synth) kernels: with only
        # ONE pad scratch the limiter must materialize every shifted plane
        # as a VALUE (4 dicts of 8 + the flux dict ≈ 40 live (n, n) arrays),
        # which at 1024² costs ~195 MB of register-allocator SPILL SLOTS and
        # blows the 128 MB VMEM budget outright. With three extra pad
        # scratches, every shifted operand is a lazy window read fused into
        # its consumer and the fluxes are recomputed in the second loop
        # (16 extra cheap VPU multiplies), so peak liveness is a handful of
        # accumulators.
        pad_u, pad_du, pad_rp = xpads
        pad_u[:, :] = jnp.zeros_like(pad_u)
        pad_u[1 : n + 1, 1 : n + 1] = u_low
        pad_du[:, :] = jnp.zeros_like(pad_du)
        pad_du[1 : n + 1, 1 : n + 1] = du

        if park is not None:
            # D was never materialized: recompute each edge plane from the
            # restored raw A through the fourth pad (D_d = max(0, A_d,
            # shift_d(A_od)); padded zeros match masked-assembly zeros)
            def D_at(d):
                xpad4[1 : n + 1, 1 : n + 1] = A_ref[opposite(d)]
                return jnp.maximum(0.0, jnp.maximum(A_ref[d, :, :],
                                                    _shifted(xpad4, d, n)))
        else:
            def D_at(d):
                return D_ref[d]

        p_pos = jnp.zeros_like(u_low)
        p_neg = jnp.zeros_like(u_low)
        u_max = u_low
        u_min = u_low
        for d in EDGE_NEIGHBOR_IDS:
            di, dj = OFFSETS[d]
            F = (M_ref[d] * (du - _shifted(pad_du, d, n))
                 + D_at(d) * (u_low - _shifted(pad_u, d, n)))
            p_pos += jnp.maximum(F, 0.0)
            p_neg += jnp.minimum(F, 0.0)
            ok = ((row + di >= 0) & (row + di < n)
                  & (col + dj >= 0) & (col + dj < n))
            nbr = jnp.where(ok, _shifted(pad_u, d, n), u_low)
            u_max = jnp.maximum(u_max, nbr)
            u_min = jnp.minimum(u_min, nbr)

        q_pos = u_max - u_low
        q_neg = u_min - u_low
        den_pos = dt * p_pos  # branch on the PRODUCT (f32 underflow; fct.py)
        r_pos = jnp.where(
            den_pos > 0.0,
            jnp.minimum(1.0, ML * q_pos
                        / jnp.where(den_pos > 0.0, den_pos, 1.0)),
            1.0,
        )
        den_neg = dt * p_neg
        r_neg = jnp.where(
            den_neg < 0.0,
            jnp.minimum(1.0, ML * q_neg
                        / jnp.where(den_neg < 0.0, den_neg, 1.0)),
            1.0,
        )

        pad_rp[:, :] = jnp.ones_like(pad_rp)
        pad_rp[1 : n + 1, 1 : n + 1] = r_pos
        pad_ref[:, :] = jnp.ones_like(pad_ref)
        pad_ref[1 : n + 1, 1 : n + 1] = r_neg

        fbar = jnp.zeros_like(u_low)
        for d in EDGE_NEIGHBOR_IDS:
            F = (M_ref[d] * (du - _shifted(pad_du, d, n))
                 + D_at(d) * (u_low - _shifted(pad_u, d, n)))
            lim_p = jnp.minimum(r_pos, _shifted(pad_ref, d, n))
            lim_n = jnp.minimum(r_neg, _shifted(pad_rp, d, n))
            fbar += jnp.where(F > 0.0, lim_p * F,
                              jnp.where(F < 0.0, lim_n * F, 0.0))

        return u_low + dt * fbar / ML

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = u_low
    ul_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}
    # second scratch not available: recompute du shifts from a fresh pad fill
    # after materializing ul shifts as values
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = du
    du_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}

    fluxes = {}
    p_pos = jnp.zeros_like(u_low)
    p_neg = jnp.zeros_like(u_low)
    u_max = u_low
    u_min = u_low
    for d in EDGE_NEIGHBOR_IDS:
        di, dj = OFFSETS[d]
        F = M_ref[d] * (du - du_sh[d]) + D_ref[d] * (u_low - ul_sh[d])
        fluxes[d] = F
        p_pos += jnp.maximum(F, 0.0)
        p_neg += jnp.minimum(F, 0.0)
        ok = (row + di >= 0) & (row + di < n) & (col + dj >= 0) & (col + dj < n)
        nbr = jnp.where(ok, ul_sh[d], u_low)
        u_max = jnp.maximum(u_max, nbr)
        u_min = jnp.minimum(u_min, nbr)

    q_pos = u_max - u_low
    q_neg = u_min - u_low
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

    pad_ref[:, :] = jnp.ones_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = r_pos
    rp_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}
    pad_ref[:, :] = jnp.ones_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = r_neg
    rn_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}

    fbar = jnp.zeros_like(u_low)
    for d in EDGE_NEIGHBOR_IDS:
        F = fluxes[d]
        lim_p = jnp.minimum(r_pos, rn_sh[d])
        lim_n = jnp.minimum(r_neg, rp_sh[d])
        fbar += jnp.where(F > 0.0, lim_p * F, jnp.where(F < 0.0, lim_n * F, 0.0))

    return u_low + dt * fbar / ML


def fused_chemotaxis_u_step(u_n, v_np1, K, M, M_diag, ML_diag, rhs, *,
                            h, dt, Dm, chi, eta, tol=1e-6, iters=60,
                            cheb_iters=20, quad_degree=4):
    """One fused FCT transport update for the chemotaxis u equation."""
    n = u_n.shape[-1]
    wts, bary, grads = _quad_consts(quad_degree, h)
    # fold detJ = h^2 into the quadrature weights
    wts = wts * h * h
    kern = functools.partial(
        _fused_u_kernel, n=n, dt=dt, Dm=Dm, chi=chi, eta=eta, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts=wts, bary=bary, grads=grads,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(u_n.shape, u_n.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, n, n), u_n.dtype),      # A -> Low
            pltpu.VMEM((9, n, n), u_n.dtype),      # D
            pltpu.VMEM((n + 2, n + 2), u_n.dtype), # shift pad
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(u_n, v_np1, K, M, M_diag, ML_diag, rhs)


def _fused_v_kernel(c_ref, u_ref, v_ref, Mat_ref, M_ref, out_ref, pad_ref,
                    *, n, dt, inv_r, tol, iters, h2):
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_mat = _make_apply(Mat_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    # load vector: (v_n, phi) + dt * (c_h u_h / r, phi)  (helpers.py:1339-1340)
    scat = _v_load(c_ref[:, :], u_ref[:, :], nc=n - 1, h2=h2)
    b = apply_M(v_ref[:, :]) + (dt * inv_r) * scat

    # CG solve
    out_ref[:, :] = _cg(apply_mat, 1.0 / Mat_ref[CENTER], b, v_ref[:, :],
                        tol, iters)


def fused_chemotaxis_v_step(c_i, u_n, v_n, Mat_v, M, *, h, dt, rescaling,
                            tol=1e-6, iters=60, quad_degree=3):
    """Fused load-assembly + implicit CG solve for the chemotaxis v equation."""
    n = u_n.shape[-1]
    kern = functools.partial(
        _fused_v_kernel, n=n, dt=dt, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, h2=h * h,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(u_n.shape, u_n.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2), u_n.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(c_i, u_n, v_n, Mat_v, M)


# ---------------------------------------------------------------------------
# Fused adjoint half-steps (helpers.py:1498-1542)
# ---------------------------------------------------------------------------

def _assemble_adjoint_A_and_load(q_np1, u, v, c, K_ref, A_ref,
                                 *, nc, Dm, chi, eta, inv_r, wts, bary,
                                 grads, h2):
    """Write Mat_p = Dm K - χ ((1-ηu)e^{-ηu} ∇v_h·∇φ_trial, φ_test) — the
    transpose of the forward advective stencil (helpers.py:1499-1503) — into
    A_ref, and return the load (c_h q_np1_h / r, φ_a) (helpers.py:1505).
    The load is cubic -> evaluated by the exact closed-form moments; the
    exp coefficient keeps the reference's quadrature rule."""
    for d in range(9):
        A_ref[d, :, :] = Dm * K_ref[d, :, :]
    for t in range(2):
        corners = TRI_CORNERS[t]
        gvx = sum(_corner_win(v, t, a, nc) * grads[t, a, 0] for a in range(3))
        gvy = sum(_corner_win(v, t, a, nc) * grads[t, a, 1] for a in range(3))
        # Va[a] = Σ_q w_q (1-ηu(q)) e^{-ηu(q)} λ_a(q)  (detJ folded into wts)
        Va = [None] * 3
        for q in range(len(wts)):
            uq = (bary[q, 0] * _corner_win(u, t, 0, nc)
                  + bary[q, 1] * _corner_win(u, t, 1, nc)
                  + bary[q, 2] * _corner_win(u, t, 2, nc))
            e = wts[q] * (1.0 - eta * uq) * jnp.exp(-eta * uq)
            for a in range(3):
                Va[a] = bary[q, a] * e if Va[a] is None else Va[a] + bary[q, a] * e
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                # gradient on the TRIAL function b -> transposed pairing;
                # -chi folded into the trial-gradient factor (transient per
                # pair: liveness over the cached gb3 list)
                gb = ((-chi * grads[t, b, 0]) * gvx
                      + (-chi * grads[t, b, 1]) * gvy)
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(gb * Va[a], ((ai, 1 - ai), (aj, 1 - aj)))
                A_ref[d, :, :] = A_ref[d, :, :] + placed
    return _lf_prod([c, q_np1], nc=nc, h2=h2, scale=inv_r)


def _q_load(p_n, u, *, nc, chi, eta, wts, bary, grads):
    """Load (χ u_h e^{-ηu_h} ∇p_h·∇φ_a) as an (n, n) value
    (helpers.py:1531-1532)."""
    load = None
    for t in range(2):
        corners = TRI_CORNERS[t]
        gpx = sum(_corner_win(p_n, t, a, nc) * grads[t, a, 0]
                  for a in range(3))
        gpy = sum(_corner_win(p_n, t, a, nc) * grads[t, a, 1]
                  for a in range(3))
        # g(q) = χ u(q) e^{-ηu(q)}; b[a] = Σ_q w_q g(q) (∇p_h·∇λ_a)
        gsum = None
        for q in range(len(wts)):
            uq = (bary[q, 0] * _corner_win(u, t, 0, nc)
                  + bary[q, 1] * _corner_win(u, t, 1, nc)
                  + bary[q, 2] * _corner_win(u, t, 2, nc))
            g = wts[q] * chi * uq * jnp.exp(-eta * uq)
            gsum = g if gsum is None else gsum + g
        for a, (ai, aj) in enumerate(corners):
            ga = grads[t, a, 0] * gpx + grads[t, a, 1] * gpy
            placed = jnp.pad(gsum * ga, ((ai, 1 - ai), (aj, 1 - aj)))
            load = placed if load is None else load + placed
    return load


def _fused_p_kernel(
    p_ref, q_ref, u_ref, v_ref, c_ref, mis_ref, K_ref, M_ref, Md_ref, ML_ref,
    out_ref, A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters, wts, bary, grads,
    h2,
):
    """Adjoint p FCT step: transposed-stencil matrix + load + raw misfit
    (helpers.py:1499-1510), then the shared FCT core."""
    load = _assemble_adjoint_A_and_load(
        q_ref[:, :], u_ref[:, :], v_ref[:, :], c_ref[:, :], K_ref, A_ref,
        nc=n - 1, Dm=Dm, chi=chi, eta=eta, inv_r=inv_r,
        wts=wts, bary=bary, grads=grads, h2=h2,
    )
    rhs = load + mis_ref[:, :]
    out_ref[:, :] = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :],
        p_ref[:, :], rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
    )


def fused_chemotaxis_p_step(p_np1, q_np1, u_n, v_n, c_n, mis_u, K, M, M_diag,
                            ML_diag, *, h, dt, Dm, chi, eta, rescaling,
                            tol=1e-6, iters=60, cheb_iters=20):
    n = p_np1.shape[-1]
    wts, bary, grads = _quad_consts(5, h)  # FFC degree 5 -> same 9-pt rule
    wts = wts * h * h
    kern = functools.partial(
        _fused_p_kernel, n=n, dt=dt, Dm=Dm, chi=chi, eta=eta,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        wts=wts, bary=bary, grads=grads, h2=h * h,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(p_np1.shape, p_np1.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((9, n, n), p_np1.dtype),
            pltpu.VMEM((9, n, n), p_np1.dtype),
            pltpu.VMEM((n + 2, n + 2), p_np1.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(p_np1, q_np1, u_n, v_n, c_n, mis_u, K, M, M_diag, ML_diag)


def _fused_q_kernel(
    q_ref, p_ref, u_ref, mis_ref, Mat_ref, M_ref, out_ref, pad_ref,
    *, n, dt, chi, eta, tol, iters, wts, bary, grads,
):
    """Adjoint q implicit step: load (χ u_h e^{-ηu_h} ∇p_h·∇φ_a) + misfit,
    then CG on Mat_q = M + dt(Df K + δ M) (helpers.py:1531-1538)."""
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_mat = _make_apply(Mat_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    load = _q_load(p_ref[:, :], u_ref[:, :], nc=n - 1, chi=chi, eta=eta,
                   wts=wts, bary=bary, grads=grads)
    b = apply_M(q_ref[:, :]) + dt * (load + mis_ref[:, :])
    out_ref[:, :] = _cg(apply_mat, 1.0 / Mat_ref[CENTER], b, q_ref[:, :],
                        tol, iters)


def fused_chemotaxis_q_step(q_np1, p_n, u_n, mis_v, Mat_q, M, *, h, dt, chi,
                            eta, tol=1e-6, iters=60):
    n = q_np1.shape[-1]
    wts, bary, grads = _quad_consts(4, h)
    wts = wts * h * h
    kern = functools.partial(
        _fused_q_kernel, n=n, dt=dt, chi=chi, eta=eta, tol=tol, iters=iters,
        wts=wts, bary=bary, grads=grads,
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q_np1.shape, q_np1.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n + 2, n + 2), q_np1.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(q_np1, p_n, u_n, mis_v, Mat_q, M)


# ---------------------------------------------------------------------------
# Whole-sweep kernels: the ENTIRE time loop inside ONE pallas_call.
#
# Motivation (measured on TPU v5e at 256² f32): each pallas_call dispatched
# from a lax.scan costs ~55-60 us of fixed launch/streaming overhead — two
# launches per coupled step put a ~120 us floor under a ~90 us compute step.
# Running the scan as the kernel's sequential grid removes all but one
# launch: the stationary stencils (K, M, Mat2) are fetched into VMEM once
# (constant block index -> no re-copy), the state (u, v) lives in VMEM
# scratch across grid steps, the control and output trajectories stream
# per step through Pallas's pipelined block DMA, and the solvers warm-start
# from the linear extrapolation 2 x_n - x_{n-1} (the roadmap lever).
# ---------------------------------------------------------------------------


def _fwd_sweep_kernel(
    c_ref, u0_ref, v0_ref, K_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters,
    wts4, bary4, h2, grads, warm, reaction, precond, lane_aligned=False,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    if precond == "dct":
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, u_n.dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, u_n.dtype)
    else:
        prec_u = None
        prec_v = 1.0 / Mat2_ref[CENTER]

    # ---- v half-step (helpers.py:1339-1342) -----------------------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(Mat2_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    load = _v_load(c_i, u_n, nc=n - 1, h2=h2)
    b = apply_M(v_n) + (dt * inv_r) * load
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = _cg(apply_mat, prec_v, b, x0v, tol, iters)

    # ---- u half-step (helpers.py:1350-1356) -----------------------------
    if lane_aligned:
        _assemble_forward_A_aligned(u_n, v_np1, K_ref, A_ref, n=n, Dm=Dm,
                                    chi=chi, eta=eta, wts=wts4, bary=bary4,
                                    grads=grads)
    else:
        _assemble_forward_A(u_n, v_np1, K_ref, A_ref, nc=n - 1, Dm=Dm,
                            chi=chi, eta=eta, wts=wts4, bary=bary4,
                            grads=grads)
    if reaction == "mimura":
        # explicit m²(1-m) = m² - m³ source (mimura_data_helpers.py:70);
        # quartic -> the closed-form moments equal the degree-4 rule exactly
        rhs_u = (_lf_prod([u_n, u_n], nc=n - 1, h2=h2)
                 + _lf_prod([u_n, u_n, u_n], nc=n - 1, h2=h2, scale=-1.0))
    else:
        rhs_u = jnp.zeros_like(u_n)
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u,
        prec=prec_u, inv_ref=inv_ref,
    )

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1


def _dct_inputs(n, h, dt, dtype, coefs):
    """(C, ilam...) device inputs for the spectral preconditioner;
    ``coefs``: list of (diff_coef, mass_coef) per solve."""
    C = jnp.asarray(dct_matrix(n), dtype=dtype)
    ilams = [
        jnp.asarray(dct_precond_ilam(n, h, dt, dc, mc), dtype=dtype)
        for (dc, mc) in coefs
    ]
    return (C, *ilams)


def fused_chemotaxis_forward_sweep(c_traj, u0, v0, K, M, M_diag, ML_diag,
                                   Mat2, *, h, dt, Dm, chi, eta, rescaling,
                                   tol=1e-6, iters=60, cheb_iters=20,
                                   warm=True, reaction=None, precond="dct",
                                   Df=None, delta=None, quad_degree=4,
                                   lane_aligned=False, with_stats=False):
    """Full forward sweep (helpers.py:1321-1385) as ONE pallas_call.

    ``c_traj``: (num_steps+1, n, n); step i uses c_traj[i]. Returns
    (u_traj, v_traj), each (num_steps+1, n, n) including the initial state.
    ``precond``: "dct" (spectral MXU preconditioner for both Krylov solves,
    see dct_precond_ilam; needs ``Df``/``delta`` of the v equation, else the
    v solve keeps Jacobi semantics via a mass-only spectral P) or "jacobi".
    ``quad_degree``: rule for the in-kernel e^{-ηu}∇v transport assembly
    (4 = reference parity; 2 halves the exp count — opt-in fast path).
    ``lane_aligned``: opt-in experimental transport assembly on rolled
    full planes instead of (n-1)-wide corner windows
    (_assemble_forward_A_aligned); same math, Mosaic layout lever.
    ``with_stats``: also return the sweep-wide min FCT low-order row sum
    (always-on M-matrix telemetry, helpers.py:1784-1810) as a third output.
    """
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    wts4, bary4, grads = _quad_consts(quad_degree, h)
    wts4 = wts4 * h * h
    kern = functools.partial(
        _fwd_sweep_kernel, n=n, dt=dt, Dm=Dm, chi=chi, eta=eta,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        wts4=wts4, bary4=bary4, h2=h * h, grads=grads,
        warm=warm, reaction=reaction, precond=precond,
        lane_aligned=lane_aligned,
    )
    # P_u targets the low-order matrix M_L + dt(A - D) (stiff part dt*Dm*K);
    # P_v targets Mat2 = M(1+dt*delta) + dt*Df*K
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Dm, 1.0),
         (Df if Df is not None else 0.0,
          1.0 + dt * delta if delta is not None else 1.0)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    frame_in = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    frame_out = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
        ),
        in_specs=[frame_in, field, field, stencil, stencil, field, field,
                  stencil, field, field, field],
        out_specs=(frame_out, frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),      # u current
            pltpu.VMEM((n, n), u0.dtype),      # v current
            pltpu.VMEM((n, n), u0.dtype),      # u previous (warm start)
            pltpu.VMEM((n, n), u0.dtype),      # v previous
            pltpu.VMEM((9, n, n), u0.dtype),   # A -> Low
            pltpu.VMEM((9, n, n), u0.dtype),   # D
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, K, M, M_diag, ML_diag, Mat2, dct_C, ilam_u, ilam_v)
    u_traj = jnp.concatenate([u0[None], u_traj], axis=0)
    v_traj = jnp.concatenate([v0[None], v_traj], axis=0)
    if with_stats:
        return u_traj, v_traj, jnp.min(inv)
    return u_traj, v_traj


def _adj_sweep_kernel(
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    K_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters,
    wts5, bary5, wts4, bary4, h2, grads, warm, has_mis, reaction, precond,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    c_n = c_ref[0, :, :]
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, u_n.dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, u_n.dtype)
    else:
        prec_p = None
        prec_q = 1.0 / Mat2_ref[CENTER]

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    load = _assemble_adjoint_A_and_load(
        q_np1, u_n, v_n, c_n, K_ref, A_ref, nc=n - 1, Dm=Dm, chi=chi,
        eta=eta, inv_r=inv_r, wts=wts5, bary=bary5, grads=grads, h2=h2,
    )
    rhs = load + misu_ref[0, :, :] if has_mis else load
    if reaction == "mimura":
        # IMEX linearization of m²(1-m): non_flux = -M_{2m-3m²}
        # (models/mimura.py:_reaction_nonflux_adj); quartic -> closed form
        S = _add_planes(_wm_prod([u_n], nc=n - 1, h2=h2, scale=-2.0),
                        _wm_prod([u_n, u_n], nc=n - 1, h2=h2), s2=3.0)
    else:
        S = None
    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], p_np1, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0p, S=S,
        prec=prec_p, inv_ref=inv_ref,
    )

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(Mat2_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    qload = _q_load(p_n, u_n, nc=n - 1, chi=chi, eta=eta,
                    wts=wts4, bary=bary4, grads=grads)
    if has_mis:
        qload = qload + misv_ref[0, :, :]
    b = apply_M(q_np1) + dt * qload
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = _cg(apply_mat, prec_q, b, x0q, tol, iters)

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n


def fused_chemotaxis_adjoint_sweep(u_traj, v_traj, c_traj, pT, qT, K, M,
                                   M_diag, ML_diag, Mat2, mis_u=None,
                                   mis_v=None, *, h, dt, Dm, chi, eta,
                                   rescaling, tol=1e-6, iters=60,
                                   cheb_iters=20, warm=True, reaction=None,
                                   precond="dct", Df=None, delta=None,
                                   with_stats=False):
    """Full adjoint sweep (helpers.py:1387-1581) as ONE pallas_call.

    Trajectories stream per backward step via reversed block index maps.
    ``mis_u``/``mis_v``: (num_steps, n, n) all-time misfit loads, or None
    (final-time). Returns (p_traj, q_traj), (num_steps+1, n, n) including
    the terminal condition. ``precond``: see fused_chemotaxis_forward_sweep.
    """
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    wts5, bary5, grads = _quad_consts(5, h)
    wts4, bary4, _ = _quad_consts(4, h)
    wts5 = wts5 * h * h
    wts4 = wts4 * h * h
    kern = functools.partial(
        _adj_sweep_kernel, n=n, dt=dt, Dm=Dm, chi=chi, eta=eta,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        wts5=wts5, bary5=bary5, wts4=wts4, bary4=bary4, h2=h * h,
        grads=grads, warm=warm, has_mis=has_mis, reaction=reaction,
        precond=precond,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Dm, 1.0),
         (Df if Df is not None else 0.0,
          1.0 + dt * delta if delta is not None else 1.0)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    # backward step i consumes global frame steps-1-i and writes the same slot
    rev = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
        mis_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        mis_spec = rev
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
        ),
        in_specs=[rev, rev, rev, mis_spec, mis_spec, field, field,
                  stencil, stencil, field, field, stencil,
                  field, field, field],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], c_traj[:-1], mis_u, mis_v, pT, qT,
      K, M, M_diag, ML_diag, Mat2, dct_C, ilam_p, ilam_q)
    p_traj = jnp.concatenate([p_traj, pT[None]], axis=0)
    q_traj = jnp.concatenate([q_traj, qT[None]], axis=0)
    if with_stats:
        return p_traj, q_traj, jnp.min(inv)
    return p_traj, q_traj


# ---------------------------------------------------------------------------
# Generic kernel-side P1 assembly on field VALUES (the in-kernel analogues of
# P1Assembler.weighted_mass / linear_form) — building blocks for the
# per-model whole-sweep kernels below.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _moments(total: int) -> np.ndarray:
    """Exact reference-triangle moments ∫ λ_{i1}···λ_{i_total} dξdη as a
    (3,)*total numpy tensor: Π α_i! / (Σα + 2)! by the multiset of indices.

    These replace quadrature loops for PURELY POLYNOMIAL integrands (the
    weighted masses u², uv, m and the product loads c·u, u²v, ...): every
    rule in use here is exact for those degrees, so swapping the quadrature
    sum for the closed form changes floating-point rounding only — pinned by
    the fused-vs-XLA equality tests at 1e-9.
    """
    import math

    T = np.zeros((3,) * total)
    for idx in np.ndindex(*T.shape):
        counts = [0, 0, 0]
        for i in idx:
            counts[i] += 1
        num = (math.factorial(counts[0]) * math.factorial(counts[1])
               * math.factorial(counts[2]))
        T[idx] = num / math.factorial(total + 2)
    return T


def _corner_products(cs, t):
    """All Π_k f_k[corner i_k] products for triangle type ``t`` as a flat
    list of 3^k arrays in np.ndindex order (i1 outermost), built
    incrementally (3^k - 3 multiplies total)."""
    prods = [cs[0][t][i] for i in range(3)]
    for m in range(1, len(cs)):
        fm = cs[m][t]
        prods = [p * fm[j] for p in prods for j in range(3)]
    return prods


def _corner_win(f, t, i, nc):
    """Corner window i of triangle type ``t`` of an (n, n) field, sliced AT
    USE (a transient relayout) instead of cached — caching all 3^k corner
    arrays is what blew the register-allocator spill budget at 1024²
    (docs/roadmap.md large-grid notes)."""
    ai, aj = TRI_CORNERS[t][i]
    return f[ai : ai + nc, aj : aj + nc]


def _prod_at(fields, t, idx, nc):
    """Π_k f_k[corner idx_k] with the same left-to-right multiply order as
    the old cached _corner_products, computed transiently per use."""
    p = _corner_win(fields[0], t, idx[0], nc)
    for m in range(1, len(fields)):
        p = p * _corner_win(fields[m], t, idx[m], nc)
    return p


def _lf_prod(fields, *, nc, h2, scale=1.0):
    """Exact load value (n, n) of scale·∫ (Π_k f_k,h) φ_a dx for P1 fields
    (closed-form barycentric moments; see _moments). Accumulation order
    matches the historical cached-products version bitwise; only the
    corner products are now transient (liveness, not math)."""
    k = len(fields)
    T = _moments(k + 1) * h2
    out = None
    for t in range(2):
        contribs = [None, None, None]
        for idx in np.ndindex(*((3,) * k)):
            p = _prod_at(fields, t, idx, nc)
            for a in range(3):
                w = scale * float(T[idx + (a,)])
                add = w * p
                contribs[a] = add if contribs[a] is None else contribs[a] + add
        for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
            placed = jnp.pad(contribs[a], ((ai, 1 - ai), (aj, 1 - aj)))
            out = placed if out is None else out + placed
    return out


def _wm_prod(fields, *, nc, h2, scale=1.0):
    """Exact stencil planes (9-list, None where structurally zero) of
    scale·∫ (Π_k f_k,h) φ_a φ_b dx (closed-form; see _moments). Same
    transient-products restructuring as _lf_prod (identical accumulation
    order per (a, b))."""
    k = len(fields)
    T = _moments(k + 2) * h2
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                vab = None
                for idx in np.ndindex(*((3,) * k)):
                    w = scale * float(T[idx + (a, b)])
                    add = w * _prod_at(fields, t, idx, nc)
                    vab = add if vab is None else vab + add
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(vab, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _wm_quad(coef_fn, fields, *, nc, wts, bary):
    """9 stencil plane VALUES (None where structurally zero) of
    ∫ coef(f1(q), f2(q), ...) φ_a φ_b dx, with the fields P1-interpolated at
    the quadrature points (P1Assembler.weighted_mass semantics)."""
    planes = [None] * 9
    cs = [_corners(f, nc) for f in fields]
    for t in range(2):
        corners = TRI_CORNERS[t]
        vab = [[None] * 3 for _ in range(3)]
        for q in range(len(wts)):
            vals = [
                bary[q, 0] * c[t][0] + bary[q, 1] * c[t][1] + bary[q, 2] * c[t][2]
                for c in cs
            ]
            cq = wts[q] * coef_fn(*vals)
            for a in range(3):
                ca = bary[q, a] * cq
                for b in range(3):
                    add = bary[q, b] * ca
                    vab[a][b] = add if vab[a][b] is None else vab[a][b] + add
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(vab[a][b], ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _lf_quad(coef_fn, fields, *, nc, wts, bary):
    """Load vector VALUE (n, n) of ∫ coef(f1(q), ...) φ_a dx
    (P1Assembler.linear_form semantics)."""
    cs = [_corners(f, nc) for f in fields]
    out = None
    for t in range(2):
        contribs = [None, None, None]
        for q in range(len(wts)):
            vals = [
                bary[q, 0] * c[t][0] + bary[q, 1] * c[t][1] + bary[q, 2] * c[t][2]
                for c in cs
            ]
            cq = wts[q] * coef_fn(*vals)
            for a in range(3):
                add = bary[q, a] * cq
                contribs[a] = add if contribs[a] is None else contribs[a] + add
        for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
            placed = jnp.pad(contribs[a], ((ai, 1 - ai), (aj, 1 - aj)))
            out = placed if out is None else out + placed
    return out


def _copy_stencil(dst_ref, src_ref):
    for d in range(9):
        dst_ref[d, :, :] = src_ref[d, :, :]


def _scaled_planes(ref, scale):
    """Stencil ref -> list of 9 scaled plane values (for _fct_core's S)."""
    return [scale * ref[d, :, :] for d in range(9)]


def _add_planes(p1, p2, s2=1.0):
    out = []
    for d in range(9):
        a, b = p1[d], p2[d]
        if b is None:
            out.append(a)
        elif a is None:
            out.append(s2 * b)
        else:
            out.append(a + s2 * b)
    return out


# ---------------------------------------------------------------------------
# Schnakenberg whole-sweep kernels (helpers.py:511-698)
# ---------------------------------------------------------------------------


def _schnak_fwd_kernel(
    c_ref, u0_ref, v0_ref, Au_ref, M_ref, Md_ref, ML_ref, Mbv_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, gamma, c_b, inv_r, tol, iters, cheb_iters, h2, warm,
    precond,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    nc = n - 1
    if precond == "dct":
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, u_n.dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, u_n.dtype)
    else:
        prec_u = None
        prec_v = None

    # u FCT: rhs = γ(c/r + u² v), non_flux = γM (helpers.py:581-588).
    # Both terms are polynomial (deg 2 / deg 4), exactly integrated by the
    # degree-4 rule they replace: ∫cφ = Mc; ∫u²vφ via closed-form moments.
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS as _AD
    apply_M0 = _make_apply(M_ref, pad_ref, n, prezeroed=True, skip_planes=_AD)
    rhs_u = ((gamma * inv_r) * apply_M0(c_i)
             + _lf_prod([u_n, u_n, v_n], nc=nc, h2=h2, scale=gamma))
    _copy_stencil(A_ref, Au_ref)
    S = _scaled_planes(M_ref, gamma)
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u, S=S,
        prec=prec_u, inv_ref=inv_ref,
    )

    # v implicit with the NEW u: Mat_v = M + dt(B_v + γ M_{u²})
    # (helpers.py:590-596); Mbv = M + dt B_v precomputed
    Mu2 = _wm_prod([u_np1, u_np1], nc=nc, h2=h2)
    for d in range(9):
        plane = Mbv_ref[d, :, :]
        if Mu2[d] is not None:
            plane = plane + (dt * gamma) * Mu2[d]
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    # rhs = γ c_b ∫φ_a: the constant load is exactly the lumped-mass diag
    rhs_v = (gamma * c_b) * ML_ref[:, :]
    b = apply_M(v_n) + dt * rhs_v
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters)

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1


def fused_schnak_forward_sweep(c_traj, u0, v0, A_u, M, M_diag, ML_diag,
                               Mbase_v, *, h, dt, gamma, c_b, rescaling,
                               tol=1e-6, iters=60, cheb_iters=20, warm=True,
                               precond="dct", Du=None, Dv=None,
                               with_stats=False):
    """Full Schnakenberg forward sweep (helpers.py:511-597) in ONE
    pallas_call. ``A_u`` = Du K - ω₁ N; ``Mbase_v`` = M + dt (Dv K - ω₂ N).
    Stationary wind only (the td-wind variant uses the piecewise path).
    ``precond="dct"``: spectral preconditioner (dct_precond_ilam); the mass
    coefficients fold in the γM non-flux term (u solve) and the γM_{u²}
    linearization at the u ≈ a+b = 1 steady state (v solve)."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    if Du is None or Dv is None:
        precond = "jacobi"
    kern = functools.partial(
        _schnak_fwd_kernel, n=n, dt=dt, gamma=gamma, c_b=c_b,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        h2=h * h, warm=warm, precond=precond,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Du if Du is not None else 0.0, 1.0 + dt * gamma),
         (Dv if Dv is not None else 0.0, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
        ),
        in_specs=[frame, field, field, stencil, stencil, field, field,
                  stencil, field, field, field],
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((9, n, n), u0.dtype),
            pltpu.VMEM((9, n, n), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, A_u, M, M_diag, ML_diag, Mbase_v,
      dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _schnak_adj_kernel(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    Aadj_ref, M_ref, Md_ref, ML_ref, Mbq_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, gamma, tol, iters, cheb_iters, h2, warm, has_mis,
    precond,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    nc = n - 1
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, u_n.dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, u_n.dtype)
    else:
        prec_p = None
        prec_q = None

    # q implicit first (helpers.py:680-688): Mat_q = M + dt(B_v_adj + γM_u²)
    Mu2 = _wm_prod([u_n, u_n], nc=nc, h2=h2)
    for d in range(9):
        plane = Mbq_ref[d, :, :]
        if Mu2[d] is not None:
            plane = plane + (dt * gamma) * Mu2[d]
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    rhs_q = _lf_prod([p_np1, u_n, u_n], nc=nc, h2=h2, scale=gamma)
    if has_mis:
        rhs_q = rhs_q + misv_ref[0, :, :]
    b = apply_M(q_np1) + dt * rhs_q
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, x0q, tol, iters)

    # p FCT (helpers.py:690-697): rhs = -2γ u v q_n, S = γM - 2γ M_{uv}
    rhs_p = _lf_prod([u_n, v_n, q_n], nc=nc, h2=h2, scale=-2.0 * gamma)
    if has_mis:
        rhs_p = rhs_p + misu_ref[0, :, :]
    Muv = _wm_prod([u_n, v_n], nc=nc, h2=h2)
    S = _add_planes(_scaled_planes(M_ref, gamma), Muv, s2=-2.0 * gamma)
    _copy_stencil(A_ref, Aadj_ref)
    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], p_np1, rhs_p,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0p, S=S,
        prec=prec_p, inv_ref=inv_ref,
    )

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n


def fused_schnak_adjoint_sweep(u_traj, v_traj, pT, qT, A_u_adj, M, M_diag,
                               ML_diag, Mbase_q, mis_u=None, mis_v=None, *,
                               h, dt, gamma, tol=1e-6, iters=60,
                               cheb_iters=20, warm=True, precond="jacobi",
                               Du=None, Dv=None, with_stats=False):
    """Full Schnakenberg adjoint sweep (helpers.py:599-698) in ONE
    pallas_call. ``A_u_adj`` = Du K - ω₁ Nᵀ; ``Mbase_q`` = M + dt(Dv K - ω₂ Nᵀ).

    Default preconditioner is JACOBI, unlike the forward sweep: the adjoint
    systems' mass coefficients (dt·γ·u², dt·γ(1-2uv)) swing with the stored
    pattern state, so the constant-coefficient spectral P mis-preconditions
    them — measured on v5e at 256² f32: jacobi 356 µs/step vs dct 381; a
    per-step diagonally-scaled spectral variant measured WORSE still
    (433-484 µs: the adaptive ilam/Einv values carried across the Krylov
    while-loop cost more than the iterations they save)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    if Du is None or Dv is None:
        precond = "jacobi"
    kern = functools.partial(
        _schnak_adj_kernel, n=n, dt=dt, gamma=gamma, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, warm=warm, has_mis=has_mis,
        precond=precond,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Du if Du is not None else 0.0, 1.0 + dt * gamma),
         (Dv if Dv is not None else 0.0, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    rev = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
        mis_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        mis_spec = rev
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
        ),
        in_specs=[rev, rev, mis_spec, mis_spec, field, field,
                  stencil, stencil, field, field, stencil,
                  field, field, field],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT, qT,
      A_u_adj, M, M_diag, ML_diag, Mbase_q, dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


# ---------------------------------------------------------------------------
# Single-field whole-sweep kernels: nonlinear equation and linear advection
# (helpers.py:881-1038; advection_FCT_PDECO_finaltime.py). One FCT field,
# stationary flux matrix, optional per-step non-flux weighted mass and
# per-step load.
# ---------------------------------------------------------------------------


def _scalar_sweep_kernel(
    load_ref, x0_ref, Aflux_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, tol, iters, cheb_iters, h2, warm,
    nonflux_mode, load_is_mass, reverse, reaction,
):
    """One FCT field: per step, rhs = M @ load_frame (load_is_mass=True,
    forward source control) or rhs = load_frame (precomputed misfit loads),
    with the optional IMEX non-flux matrix of the nonlinear equation:
    nonflux_mode = 0: none; +1: (1/3)M_{u²} - M (state, helpers.py:953-958);
    -1: M_{u²} - M (adjoint, helpers.py:1030-1035), u taken from the
    second half of load_ref's frame pair.
    ``reaction=True``: the LAST frame channel carries the reaction
    coefficient g (the MMS finaltime-exact ``+ g u`` term, applied IMEX
    with the carried state: rhs -= ∫ g_h x_h φ dx, exactly the reference's
    Mg @ u, finaltime_exact:273-279 — the integrand is quadratic, so the
    closed-form moments equal the degree-3 rule)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]
    nc = n - 1

    if load_is_mass:
        pad_ref[:, :] = jnp.zeros_like(pad_ref)
        apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                              skip_planes=ANTI_DIAGONAL_IDS)
        rhs = apply_M(load_ref[0, :, :])
    else:
        rhs = load_ref[0, :, :]
    if reaction:
        g_i = load_ref[load_ref.shape[0] - 1, :, :]
        rhs = rhs - _lf_prod([g_i, x_n], nc=nc, h2=h2)

    if nonflux_mode == 0:
        S = None
    else:
        # u for the IMEX weighted mass: forward uses the CARRIED state u_n;
        # the adjoint linearizes around the stored state (frame 1)
        u_for_S = x_n if nonflux_mode > 0 else load_ref[1, :, :]
        Mu2 = _wm_prod([u_for_S, u_for_S], nc=nc, h2=h2)
        scale = (1.0 / 3.0) if nonflux_mode > 0 else 1.0
        S = _add_planes(_scaled_planes(M_ref, -1.0), Mu2, s2=scale)

    _copy_stencil(A_ref, Aflux_ref)
    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], x_n, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0w, S=S,
        inv_ref=inv_ref,
    )
    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1


def fused_scalar_fct_sweep(load_traj, x0, A_flux, M, M_diag, ML_diag, *,
                           h, dt, tol=1e-6, iters=60, cheb_iters=20,
                           warm=True, nonflux_mode=0, load_is_mass=True,
                           reverse=False, reaction=False, with_stats=False):
    """Whole sweep of a single FCT-transported field with a stationary flux
    matrix. Covers:
    - nonlinear state (nonflux_mode=+1, load = control frames,
      helpers.py:941-958) and adjoint (nonflux_mode=-1, load frames stacked
      (misfit, u_n), helpers.py:1023-1037)
    - linear advection state (load = control (+source) frames) and adjoint
      (load = misfit loads), advection_FCT_PDECO_finaltime.py:194-231
    - the MMS reaction coefficient g(t) of the finaltime-exact problem
      (reaction=True: last frame channel = g frames, applied IMEX with the
      carried state — advection_FCT_PDECO_finaltime_exact.py:273-279).

    ``load_traj``: (steps, F, n, n) per-step frames (F=1; 2 when
    nonflux_mode=-1 or reaction; 3 for adjoint+reaction). ``reverse=True``
    runs the sweep backward (adjoint): step i consumes frame steps-1-i and
    writes the same slot. Returns the (steps, n, n) swept frames EXCLUDING
    the initial/terminal state.

    Grids past the resident VMEM budget dispatch to the lean variant
    (ONE 7-plane buffer, HBM-resident flux matrix) automatically.
    """
    from fem_fct_pdeco_tpu.ops.pallas_kernels import (
        fits_vmem, fits_vmem_lean)

    n_ = x0.shape[-1]
    nb_ = max(2, n_ // 128)
    if (not fits_vmem_lean(n_, x0.dtype) and n_ % nb_ == 0
            and (n_ // nb_) % 8 == 0):
        return fused_scalar_fct_sweep_xl(
            load_traj, x0, A_flux, M, M_diag, ML_diag, h=h, dt=dt, tol=tol,
            iters=iters, cheb_iters=cheb_iters, warm=warm,
            nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
            reverse=reverse, reaction=reaction, with_stats=with_stats)
    if not fits_vmem(x0.shape[-1], x0.dtype):
        return fused_scalar_fct_sweep_lean(
            load_traj, x0, A_flux, M, M_diag, ML_diag, h=h, dt=dt, tol=tol,
            iters=iters, cheb_iters=cheb_iters, warm=warm,
            nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
            reverse=reverse, reaction=reaction, with_stats=with_stats)
    n = x0.shape[-1]
    steps = load_traj.shape[0]
    F = load_traj.shape[1]
    kern = functools.partial(
        _scalar_sweep_kernel, n=n, dt=dt, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, warm=warm,
        nonflux_mode=nonflux_mode, load_is_mass=load_is_mass, reverse=reverse,
        reaction=reaction,
    )
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    def kern2(load_ref, *rest):
        # collapse the leading frame axis: load_ref block is (1, F, n, n)
        return kern(load_ref[0], *rest)

    out, inv = pl.pallas_call(
        kern2,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype)),
        in_specs=[frame_in, field, stencil, stencil, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), x0.dtype),
            pltpu.VMEM((n, n), x0.dtype),
            pltpu.VMEM((9, n, n), x0.dtype),
            pltpu.VMEM((9, n, n), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(load_traj, x0, A_flux, M, M_diag, ML_diag)
    return (out, jnp.min(inv)) if with_stats else out


# ---------------------------------------------------------------------------
# Large-grid ("synth") whole-sweep kernels.
#
# The resident whole-sweep kernels above keep FIVE 9-plane stencils in VMEM
# (K, M, Mat2 inputs + A->Low and D scratch) — ~180 MB at 1024² f32, far over
# the ~120 MB VMEM budget, which is why ≥1024² previously fell back to the
# XLA path (8.5 ms/step at 1024²). The chemotaxis system's stationary
# operators are all linear combinations of the P1 mass and stiffness
# matrices, whose stencils on this uniform mesh are PIECEWISE CONSTANT:
# plane d is a sum of constant element-matrix entries, each active on a
# simple row/column window (the assembler's scatter windows,
# ops/assembly.py:_scatter). These kernels therefore synthesize every
# stationary operator in-kernel from broadcasted-iota masks (zero VMEM
# residency), store only the two per-step stencils (A->Low and D) in a
# COMPACT 7-plane layout (the anti-diagonal planes are structurally zero on
# this mesh), and keep everything else identical to the resident kernels.
# VMEM at 1024² f32: 2 x 28 MB stencils + state + streaming blocks ≈ 100 MB.
# ---------------------------------------------------------------------------

P7 = (0, 1, 3, 4, 5, 7, 8)  # the structurally nonzero stencil planes
P7IDX = {d: k for k, d in enumerate(P7)}
_ZERO_PLANES = (2, 6)


class _CompactPlanes:
    """A (7, n, n) scratch ref quacking like a (9, n, n) stencil ref.

    Reads of the structurally-zero anti-diagonal planes return a zeros
    value; writes to them are dropped. This lets `_fct_core` and the
    in-kernel assembly helpers run unchanged on the compact layout."""

    zero_planes = _ZERO_PLANES

    def __init__(self, ref, n, dtype):
        self.ref, self.n, self.dtype = ref, n, dtype

    @staticmethod
    def _split(key):
        if isinstance(key, tuple):
            return key[0], key[1:]
        return key, ()

    def __getitem__(self, key):
        d, rest = self._split(key)
        if d in _ZERO_PLANES:
            return jnp.zeros((self.n, self.n), self.dtype)
        v = self.ref[P7IDX[d]]
        return v[rest] if rest else v

    def __setitem__(self, key, val):
        d, rest = self._split(key)
        if d in _ZERO_PLANES:
            return
        if rest:
            self.ref[(P7IDX[d],) + rest] = val
        else:
            self.ref[P7IDX[d]] = val


class _FieldVal:
    """A plain value quacking like a field ref (supports [...] reads)."""

    def __init__(self, val):
        self.val = val

    def __getitem__(self, key):
        return self.val[key] if key is not Ellipsis else self.val


@functools.lru_cache(maxsize=None)
def _mk_combos():
    """Per-plane constant contributions of the closed-form P1 mass and
    stiffness element matrices, keyed by the assembler scatter window
    offset: {d: {(ai, aj): (em_unit, ek)}} with  M_d = h² Σ em·mask(ai,aj)
    and K_d = Σ ek·mask(ai,aj)  (K is h-independent in 2-D)."""
    out = {d: {} for d in range(9)}
    gu = _basis_gradients(1.0)
    Em0 = (1.0 / 24.0) * (np.ones((3, 3)) + np.eye(3))  # area/12, area=h²/2
    for t in range(2):
        corners = TRI_CORNERS[t]
        Ek = 0.5 * gu[t] @ gu[t].T
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                em, ek = out[d].get((ai, aj), (0.0, 0.0))
                out[d][(ai, aj)] = (em + Em0[a, b], ek + Ek[a, b])
    # lumped-mass row sums, aggregated over all planes
    ml = {}
    for d in range(9):
        for key, (em, _) in out[d].items():
            ml[key] = ml.get(key, 0.0) + em
    return out, ml


def _make_synth(n, dtype, h2):
    """In-kernel synthesizer for αM + βK stencils and fields.

    Every returned closure rebuilds its masks from iota at the call site, so
    calling it inside a solver loop keeps the planes out of the loop-carried
    VMEM state (they fuse into the consuming multiply-accumulate)."""
    combos, ml_combo = _mk_combos()

    def _mask(ai, aj):
        row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        rk = (row <= n - 2) if ai == 0 else (row >= 1)
        ck = (col <= n - 2) if aj == 0 else (col >= 1)
        return jnp.where(rk & ck, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))

    def plane(d, mcoef, kcoef):
        acc = None
        for (ai, aj), (em, ek) in combos[d].items():
            cst = float(mcoef) * h2 * em + float(kcoef) * ek
            if cst == 0.0:
                continue
            term = cst * _mask(ai, aj)
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((n, n), dtype)
        return acc

    def ml_diag():
        acc = None
        for (ai, aj), em in ml_combo.items():
            term = (h2 * em) * _mask(ai, aj)
            acc = term if acc is None else acc + term
        return acc

    return plane, ml_diag


class _SynthPlanes:
    """Read-only αM + βK stencil quacking like a (9, n, n) ref."""

    def __init__(self, plane_fn, mcoef, kcoef):
        self.plane_fn, self.mcoef, self.kcoef = plane_fn, mcoef, kcoef

    def __getitem__(self, key):
        d = key[0] if isinstance(key, tuple) else key
        return self.plane_fn(d, self.mcoef, self.kcoef)


def _fwd_sweep_kernel_synth(
    c_ref, u0_ref, v0_ref, dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref, A7_ref, D7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref,
    *, n, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters, cheb_iters,
    wts4, bary4, grads, warm, reaction, precond,
):
    """Chemotaxis forward step with synthesized stationary operators
    (helpers.py:1321-1385 semantics — identical math to _fwd_sweep_kernel,
    ≥1024²-capable). No stationary stencil ever occupies VMEM for longer
    than its use window: Mat2 is materialized into the A scratch before the
    v solve (assembly overwrites it), and the consistent mass is
    materialized into the same scratch once Low is dead (_fct_core m_swap)
    — every solver loop reads VMEM, never re-synthesizing planes."""
    dtype = ucur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    D_ref = _CompactPlanes(D7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    K_ref = _SynthPlanes(plane, 0.0, 1.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    if precond == "dct":
        # ilam values must be READ from refs inside the solver loops: a
        # loop-carried synthesized (n, n) value sends the Mosaic compiler
        # into hour-long layout analysis (measured: 22 s jacobi vs >10 min
        # with carried values at 256²)
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_u = None
        prec_v = None

    # ---- v half-step (helpers.py:1339-1342) -----------------------------
    # Mat2 = (1+dtδ)M + dt·Df·K materialized into the A scratch (free until
    # the u assembly), so the CG loop reads VMEM
    for k7, d in enumerate(P7):
        A7_ref[k7] = plane(d, 1.0 + dt * delta, dt * Df)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    load = _v_load(c_i, u_n, nc=n - 1, h2=h2)
    b = apply_M(v_n) + (dt * inv_r) * load
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters)

    # ---- u half-step (helpers.py:1350-1356) -----------------------------
    _assemble_forward_A(u_n, v_np1, K_ref, A_ref, nc=n - 1, Dm=Dm, chi=chi,
                        eta=eta, wts=wts4, bary=bary4, grads=grads)
    if reaction == "mimura":
        rhs_u = (_lf_prod([u_n, u_n], nc=n - 1, h2=h2)
                 + _lf_prod([u_n, u_n, u_n], nc=n - 1, h2=h2, scale=-1.0))
    else:
        rhs_u = jnp.zeros_like(u_n)
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    u_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_syn, Md_ref, ml_diag(), u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u,
        prec=prec_u, m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref), inv_ref=inv_ref,
    )

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1


def fused_chemotaxis_forward_sweep_synth(
        c_traj, u0, v0, *, h, dt, Dm, Df, delta, chi, eta, rescaling,
        tol=1e-6, iters=60, cheb_iters=20, warm=True, reaction=None,
        precond="dct", vmem_limit_mb=120, quad_degree=4, with_stats=False):
    """Large-grid chemotaxis forward sweep: ONE pallas_call, stationary
    operators synthesized in-kernel, per-step stencils in a compact 7-plane
    layout. Mathematically identical to fused_chemotaxis_forward_sweep
    (which needs all five stencils resident and tops out near 512² f32);
    this variant fits ≥1024² f32 in VMEM."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    wts4, bary4, grads = _quad_consts(quad_degree, h)
    wts4 = wts4 * h * h
    kern = functools.partial(
        _fwd_sweep_kernel_synth, n=n, h2=h * h, dt=dt, Dm=Dm, Df=Df,
        delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4,
        grads=grads, warm=warm, reaction=reaction, precond=precond,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
        ),
        in_specs=[frame, field, field, field, field, field],
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),      # u current
            pltpu.VMEM((n, n), u0.dtype),      # v current
            pltpu.VMEM((n, n), u0.dtype),      # u previous (warm start)
            pltpu.VMEM((n, n), u0.dtype),      # v previous
            pltpu.VMEM((7, n, n), u0.dtype),   # A -> Low (compact)
            pltpu.VMEM((7, n, n), u0.dtype),   # D (compact)
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # limiter xpads (liveness
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # fix — see _fct_core
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # xpads docstring)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _fwd_sweep_kernel_lean(
    c_ref, u0_ref, v0_ref, dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref, ahbm_ref,
    ucur_ref, vcur_ref, A7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref, sem_park, sem_io,
    *, n, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters, cheb_iters,
    wts4, bary4, grads, reaction, precond,
):
    """ONE-7-plane-buffer chemotaxis forward step (the ≥1024² variant of
    _fwd_sweep_kernel_synth; identical math, helpers.py:1321-1385). VMEM
    diet relative to the synth kernel: no D stencil (raw A parked in an
    HBM scratch around the low-order solve, D recomputed transiently —
    _fct_core ``park``), no warm-start scratches (x0 = previous state), no
    consistent-mass materialization (synthesized at use, incl. inside the
    Chebyshev fori_loop — loop-LOCAL iota masks are compile-safe, unlike
    loop-CARRIED planes), initial state DMA'd from HBM at step 0, and
    trajectory frames DMA'd out to HBM outputs instead of windowed."""
    dtype = ucur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    K_ref = _SynthPlanes(plane, 0.0, 1.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(u0_ref, ucur_ref, sem_io)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(v0_ref, vcur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    if precond == "dct":
        prec_u = _make_dct_pinv2(dct_ref, ilamu_ref, dtype)
        prec_v = _make_dct_pinv2(dct_ref, ilamv_ref, dtype)
    else:
        prec_u = None
        prec_v = None

    # warm starts without the uprev/vprev scratches: the previous frame is
    # already in the HBM trajectory OUTPUT — one small DMA each instead of
    # 8 MB of resident VMEM (x0 = 2 x_n - x_{n-1}; out[i] holds x_{i+1}, so
    # x_{n-1} = x_{i-1} lives in slot i-2 — slot i-1 is the CURRENT carry —
    # and at i <= 1 the staged read is discarded by the select). The staging
    # window is [:n, :n], NOT the pad interior [1:n+1, 1:n+1]: a VMEM DMA
    # destination must start tile-aligned (offset 0), and _fct_core fully
    # re-initializes the xpads before the limiter uses them anyway.
    im2 = jnp.maximum(i - 2, 0)
    cp = pltpu.make_async_copy(vout_ref.at[im2],
                               xpad2_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0v = jnp.where(i > 1, 2.0 * v_n - xpad2_ref[:n, :n], v_n)

    # kernel-level VMEM stage probes (see _fct_core's FEMFCT_STAGE_PROBE):
    # "warm" truncates after the warm-start staging, "vsolve" after the v
    # half-step, "asm" after the transport assembly
    probe = os.environ.get("FEMFCT_STAGE_PROBE", "")
    if probe == "warm":
        ucur_ref[:, :] = x0v
        vcur_ref[:, :] = x0v
        cpu = pltpu.make_async_copy(ucur_ref, uout_ref.at[i], sem_io)
        cpu.start()
        cpu.wait()
        cpv = pltpu.make_async_copy(vcur_ref, vout_ref.at[i], sem_io)
        cpv.start()
        cpv.wait()
        return

    # ---- v half-step (helpers.py:1339-1342) -----------------------------
    for k7, d in enumerate(P7):
        A7_ref[k7] = plane(d, 1.0 + dt * delta, dt * Df)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    load = _v_load(c_i, u_n, nc=n - 1, h2=h2)
    b = apply_M(v_n) + (dt * inv_r) * load
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters,
                st=(xpad1_ref.at[:n, :n], xpad2_ref.at[:n, :n],
                    xpad3_ref.at[:n, :n], xpad4_ref.at[:n, :n]))
    # retire v_np1 to its scratch immediately: a value carried across the
    # whole u half-step costs a dedicated spill slot at large n
    vcur_ref[:, :] = v_np1
    if probe == "vsolve":
        ucur_ref[:, :] = u_n
        cpu = pltpu.make_async_copy(ucur_ref, uout_ref.at[i], sem_io)
        cpu.start()
        cpu.wait()
        cpv = pltpu.make_async_copy(vcur_ref, vout_ref.at[i], sem_io)
        cpv.start()
        cpv.wait()
        return

    # ---- u half-step (helpers.py:1350-1356) -----------------------------
    _assemble_forward_A(u_n, vcur_ref[:, :], K_ref, A_ref, nc=n - 1,
                        Dm=Dm, chi=chi, eta=eta, wts=wts4, bary=bary4,
                        grads=grads)
    if probe == "asm":
        ucur_ref[:, :] = u_n + A_ref[CENTER, :, :]
        cpu = pltpu.make_async_copy(ucur_ref, uout_ref.at[i], sem_io)
        cpu.start()
        cpu.wait()
        cpv = pltpu.make_async_copy(vcur_ref, vout_ref.at[i], sem_io)
        cpv.start()
        cpv.wait()
        return
    if reaction == "mimura":
        rhs_u = (_lf_prod([u_n, u_n], nc=n - 1, h2=h2)
                 + _lf_prod([u_n, u_n, u_n], nc=n - 1, h2=h2, scale=-1.0))
    else:
        rhs_u = jnp.zeros_like(u_n)

    def m_swap():
        # Chebyshev-stage mass materialization (the raw A parked in HBM
        # survives this overwrite and is restored for the flux stage)
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    cp = pltpu.make_async_copy(uout_ref.at[im2],
                               xpad1_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0u = jnp.where(i > 1, 2.0 * u_n - xpad1_ref[:n, :n], u_n)
    u_np1 = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u,
        prec=prec_u, m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, ahbm_ref, sem_park, xpad4_ref), inv_ref=inv_ref,
    )

    ucur_ref[:, :] = u_np1
    cpu = pltpu.make_async_copy(ucur_ref, uout_ref.at[i], sem_io)
    cpu.start()
    cpu.wait()
    cpv = pltpu.make_async_copy(vcur_ref, vout_ref.at[i], sem_io)
    cpv.start()
    cpv.wait()


def fused_chemotaxis_forward_sweep_lean(
        c_traj, u0, v0, *, h, dt, Dm, Df, delta, chi, eta, rescaling,
        tol=1e-6, iters=60, cheb_iters=20, reaction=None,
        precond="dct", vmem_limit_mb=127, quad_degree=4, with_stats=False):
    """≥1024²-capable chemotaxis forward sweep: ONE pallas_call, ONE
    resident 7-plane stencil buffer (raw A parked in an HBM scratch around
    the Krylov solve), artificial diffusion and consistent mass never
    materialized. Mathematically identical to
    fused_chemotaxis_forward_sweep_synth, which needs two 7-plane buffers
    and tops out near 896² f32 (VMEM); this variant fits 1024² f32."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    wts4, bary4, grads = _quad_consts(quad_degree, h)
    wts4 = wts4 * h * h
    kern = functools.partial(
        _fwd_sweep_kernel_lean, n=n, h2=h * h, dt=dt, Dm=Dm, Df=Df,
        delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4,
        grads=grads, reaction=reaction, precond=precond,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs2(
        n, h, dt, u0.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    field2 = pl.BlockSpec((2, n, n), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    # The raw-A park lives in an HBM OUTPUT ref (discarded): real Mosaic
    # only allocates vmem/smem/semaphore scratch memrefs, so an HBM
    # "scratch" must be an ANY/HBM-space operand. Outputs persist across
    # the sequential TPU grid and the kernel writes before reading.
    u_traj, v_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
            jax.ShapeDtypeStruct((7, n, n), u0.dtype),
        ),
        in_specs=[frame, hbm, hbm, field2, field, field],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),      # u current
            pltpu.VMEM((n, n), u0.dtype),      # v current
            pltpu.VMEM((7, n, n), u0.dtype),   # Mat2 -> A -> Low -> A
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # shift pad
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _adj_sweep_kernel_synth(
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref, dct_ref,
    ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, A7_ref, D7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref,
    *, n, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters, cheb_iters,
    wts5, bary5, wts4, bary4, grads, has_mis, reaction, precond,
):
    """Chemotaxis adjoint step with synthesized stationary operators
    (helpers.py:1387-1581 semantics — the large-grid variant of
    _adj_sweep_kernel; no warm-start scratch to stay in VMEM budget).
    Scratch-swapping as in _fwd_sweep_kernel_synth: M is materialized into
    the A scratch once Low is dead, and Mat2 takes the same scratch for
    the q solve after the p step's mass reads are done."""
    dtype = pcur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    D_ref = _CompactPlanes(D7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    K_ref = _SynthPlanes(plane, 0.0, 1.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    c_n = c_ref[0, :, :]
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_p = None
        prec_q = None

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    load = _assemble_adjoint_A_and_load(
        q_np1, u_n, v_n, c_n, K_ref, A_ref, nc=n - 1, Dm=Dm, chi=chi,
        eta=eta, inv_r=inv_r, wts=wts5, bary=bary5, grads=grads, h2=h2,
    )
    rhs = load + misu_ref[0, :, :] if has_mis else load
    if reaction == "mimura":
        S = _add_planes(_wm_prod([u_n], nc=n - 1, h2=h2, scale=-2.0),
                        _wm_prod([u_n, u_n], nc=n - 1, h2=h2), s2=3.0)
    else:
        S = None

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    p_n = _fct_core(
        A_ref, D_ref, pad_ref, M_syn, Md_ref, ml_diag(), p_np1, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, S=S,
        prec=prec_p, m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref), inv_ref=inv_ref,
    )

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    # A scratch still holds M from the swap: take the mass reads first
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_Msc = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    qload = _q_load(p_n, u_n, nc=n - 1, chi=chi, eta=eta,
                    wts=wts4, bary=bary4, grads=grads)
    if has_mis:
        qload = qload + misv_ref[0, :, :]
    b = apply_Msc(q_np1) + dt * qload
    # now rededicate the scratch to Mat2 for the CG solve
    for k7, d in enumerate(P7):
        A7_ref[k7] = plane(d, 1.0 + dt * delta, dt * Df)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, q_np1, tol, iters)

    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n


def fused_chemotaxis_adjoint_sweep_synth(
        u_traj, v_traj, c_traj, pT, qT, mis_u=None, mis_v=None, *,
        h, dt, Dm, Df, delta, chi, eta, rescaling, tol=1e-6, iters=60,
        cheb_iters=20, reaction=None, precond="dct", vmem_limit_mb=120,
        with_stats=False):
    """Large-grid chemotaxis adjoint sweep: the synth analogue of
    fused_chemotaxis_adjoint_sweep (≥1024² f32 in VMEM; no warm-start
    scratch — the extra streamed trajectories take its budget)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    wts5, bary5, grads = _quad_consts(5, h)
    wts4, bary4, _ = _quad_consts(4, h)
    wts5 = wts5 * h * h
    wts4 = wts4 * h * h
    kern = functools.partial(
        _adj_sweep_kernel_synth, n=n, h2=h * h, dt=dt, Dm=Dm, Df=Df,
        delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts5=wts5, bary5=bary5,
        wts4=wts4, bary4=bary4, grads=grads, has_mis=has_mis,
        reaction=reaction, precond=precond,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rev = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
        mis_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        mis_spec = rev
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
        ),
        in_specs=[rev, rev, rev, mis_spec, mis_spec, field, field, field,
                  field, field],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((7, n, n), pT.dtype),
            pltpu.VMEM((7, n, n), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # limiter xpads (liveness
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # fix — see _fct_core
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # xpads docstring)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], c_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _adj_sweep_kernel_lean(
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref, dct_ref,
    ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref, ahbm_ref,
    pcur_ref, qcur_ref, ustg_ref, vstg_ref, cstg_ref, A7_ref,
    pad_ref, xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref, sem_park, sem_io,
    *, n, steps, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters,
    cheb_iters, wts5, bary5, wts4, bary4, grads, has_mis, reaction, precond,
):
    """ONE-7-plane-buffer chemotaxis adjoint step (the ≥1024² variant of
    _adj_sweep_kernel_synth; identical math, helpers.py:1387-1581). Same
    VMEM diet as _fwd_sweep_kernel_lean, plus: the forward-state /
    control / misfit trajectories are HBM inputs DMA'd into (n, n)
    staging scratches per step (three windowed frame inputs would cost
    24 MB of double-buffered windows at 1024²)."""
    dtype = pcur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    K_ref = _SynthPlanes(plane, 0.0, 1.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))

    i = pl.program_id(0)
    ridx = steps - 1 - i

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(pT_ref, pcur_ref, sem_io)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(qT_ref, qcur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    for src, dst in ((u_ref, ustg_ref), (v_ref, vstg_ref), (c_ref, cstg_ref)):
        cp = pltpu.make_async_copy(src.at[ridx], dst, sem_io)
        cp.start()
        cp.wait()

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = ustg_ref[:, :]
    v_n = vstg_ref[:, :]
    c_n = cstg_ref[:, :]
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_p = None
        prec_q = None

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    load = _assemble_adjoint_A_and_load(
        q_np1, u_n, v_n, c_n, K_ref, A_ref, nc=n - 1, Dm=Dm, chi=chi,
        eta=eta, inv_r=inv_r, wts=wts5, bary=bary5, grads=grads, h2=h2,
    )
    if has_mis:
        cp = pltpu.make_async_copy(
            misu_ref.at[ridx], xpad1_ref.at[:n, :n], sem_io)
        cp.start()
        cp.wait()
        rhs = load + xpad1_ref[:n, :n]
    else:
        rhs = load
    if reaction == "mimura":
        S = _add_planes(_wm_prod([u_n], nc=n - 1, h2=h2, scale=-2.0),
                        _wm_prod([u_n, u_n], nc=n - 1, h2=h2), s2=3.0)
    else:
        S = None

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    p_n = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), p_np1, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, S=S,
        prec=prec_p, m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, ahbm_ref, sem_park, xpad4_ref), inv_ref=inv_ref,
    )

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_Msc = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    qload = _q_load(p_n, u_n, nc=n - 1, chi=chi, eta=eta,
                    wts=wts4, bary=bary4, grads=grads)
    if has_mis:
        cp = pltpu.make_async_copy(
            misv_ref.at[ridx], xpad1_ref.at[:n, :n], sem_io)
        cp.start()
        cp.wait()
        qload = qload + xpad1_ref[:n, :n]
    b = apply_Msc(q_np1) + dt * qload
    for k7, d in enumerate(P7):
        A7_ref[k7] = plane(d, 1.0 + dt * delta, dt * Df)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, q_np1, tol, iters)

    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    cpp = pltpu.make_async_copy(pcur_ref, pout_ref.at[ridx], sem_io)
    cpp.start()
    cpp.wait()
    cpq = pltpu.make_async_copy(qcur_ref, qout_ref.at[ridx], sem_io)
    cpq.start()
    cpq.wait()


def fused_chemotaxis_adjoint_sweep_lean(
        u_traj, v_traj, c_traj, pT, qT, mis_u=None, mis_v=None, *,
        h, dt, Dm, Df, delta, chi, eta, rescaling, tol=1e-6, iters=60,
        cheb_iters=20, reaction=None, precond="dct", vmem_limit_mb=127,
        with_stats=False):
    """≥1024²-capable chemotaxis adjoint sweep: the lean analogue of
    fused_chemotaxis_adjoint_sweep_synth (ONE resident 7-plane buffer,
    HBM-staged trajectory frames; see _adj_sweep_kernel_lean)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    wts5, bary5, grads = _quad_consts(5, h)
    wts4, bary4, _ = _quad_consts(4, h)
    wts5 = wts5 * h * h
    wts4 = wts4 * h * h
    kern = functools.partial(
        _adj_sweep_kernel_lean, n=n, steps=steps, h2=h * h, dt=dt, Dm=Dm,
        Df=Df, delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts5=wts5, bary5=bary5,
        wts4=wts4, bary4=bary4, grads=grads, has_mis=has_mis,
        reaction=reaction, precond=precond,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
    # HBM park as a discarded output ref (real Mosaic rejects HBM scratch)
    p_traj, q_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
            jax.ShapeDtypeStruct((7, n, n), pT.dtype),
        ),
        in_specs=[hbm, hbm, hbm, hbm, hbm, hbm, hbm, field, field, field],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),      # p current
            pltpu.VMEM((n, n), pT.dtype),      # q current
            pltpu.VMEM((n, n), pT.dtype),      # u staging
            pltpu.VMEM((n, n), pT.dtype),      # v staging
            pltpu.VMEM((n, n), pT.dtype),      # c staging
            pltpu.VMEM((7, n, n), pT.dtype),   # A -> Low -> A -> Mat2
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # shift pad
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], c_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


# ---------------------------------------------------------------------------
# Schnakenberg whole-sweep kernels with a TIME-DEPENDENT wind: the
# convection stencil is assembled IN-KERNEL at the traced step time
# (the reference reassembles A(w(t)) per step, Schnak_FCT_PDECO_alltime.py's
# sin(2πt) vortex; XLA path: SchnakenbergModel._forward_step).
# ---------------------------------------------------------------------------


def _conv_planes_td(wind_fn, t, *, nc, h, a1, pts, wts, bary, grads, dtype,
                    transpose=False):
    """9-plane VALUES (None where structurally zero) of the convection
    stencil ∫ (w(x,t)·∇φ_test) φ_trial dx assembled at traced time ``t``
    (P1Assembler.convection_td semantics, quadrature points synthesized
    from iota). ``transpose=True`` puts the gradient on the TRIAL function
    (the adjoint pairing, helpers.py:681)."""
    planes = [None] * 9
    ci = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 0).astype(dtype)
    cj = jax.lax.broadcasted_iota(jnp.int32, (nc, nc), 1).astype(dtype)
    x0 = a1 + h * cj
    y0 = a1 + h * ci
    detJ = h * h
    for ttype in range(2):
        corners = TRI_CORNERS[ttype]
        acc = [[None] * 3 for _ in range(3)]  # acc[gradside][baryside]
        for q in range(len(wts)):
            xi, eta = float(pts[q, 0]), float(pts[q, 1])
            if ttype == 0:
                xq = x0 + h * (xi + eta)
                yq = y0 + h * eta
            else:
                xq = x0 + h * eta
                yq = y0 + h * (xi + eta)
            wx, wy = wind_fn(xq, yq, t)
            for gside in range(3):
                ga = (grads[ttype, gside, 0] * wx + grads[ttype, gside, 1] * wy)
                wga = (detJ * float(wts[q])) * ga
                for bside in range(3):
                    add = float(bary[q, bside]) * wga
                    acc[gside][bside] = (
                        add if acc[gside][bside] is None
                        else acc[gside][bside] + add)
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                # rows (scatter windows) are the TEST index a; the gradient
                # sits on test (forward) or trial (transpose)
                val = acc[b][a] if transpose else acc[a][b]
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(val, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _schnak_fwd_kernel_td(
    c_ref, u0_ref, v0_ref, K_ref, M_ref, Md_ref, ML_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, Du, Dv, omega1, omega2, gamma, c_b, inv_r, tol, iters,
    cheb_iters, h2, h, a1, warm, precond, wind_fn, pts, wts, bary, grads,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        _inv_init(inv_ref)

    dtype = ucur_ref.dtype
    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    nc = n - 1
    t_i = (i + 1).astype(dtype) * dt  # forward times (i+1)*dt
    if precond == "dct":
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_u = None
        prec_v = None

    def conv():
        return _conv_planes_td(wind_fn, t_i, nc=nc, h=h, a1=a1, pts=pts,
                               wts=wts, bary=bary, grads=grads, dtype=dtype)

    # u FCT with A_u(t) = Du K - ω₁ N(t) (helpers.py:581-588)
    N = conv()
    for d in range(9):
        plane = Du * K_ref[d, :, :]
        if N[d] is not None:
            plane = plane - omega1 * N[d]
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_M0 = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                           skip_planes=ANTI_DIAGONAL_IDS)
    rhs_u = ((gamma * inv_r) * apply_M0(c_i)
             + _lf_prod([u_n, u_n, v_n], nc=nc, h2=h2, scale=gamma))
    S = _scaled_planes(M_ref, gamma)
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u, S=S,
        prec=prec_u, inv_ref=inv_ref,
    )

    # v implicit: Mat_v = M + dt(Dv K - ω₂ N(t) + γ M_{u²}) with the NEW u
    N2 = conv()  # A_ref was transformed in place; rebuild the wind stencil
    Mu2 = _wm_prod([u_np1, u_np1], nc=nc, h2=h2)
    for d in range(9):
        plane = M_ref[d, :, :] + (dt * Dv) * K_ref[d, :, :]
        if N2[d] is not None:
            plane = plane - (dt * omega2) * N2[d]
        if Mu2[d] is not None:
            plane = plane + (dt * gamma) * Mu2[d]
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    rhs_v = (gamma * c_b) * ML_ref[:, :]
    b = apply_M(v_n) + dt * rhs_v
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters)

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1


def fused_schnak_forward_sweep_td(c_traj, u0, v0, K, M, M_diag, ML_diag, *,
                                  wind_fn, h, a1, dt, Du, Dv, omega1, omega2,
                                  gamma, c_b, rescaling, tol=1e-6, iters=60,
                                  cheb_iters=20, warm=True, precond="dct",
                                  conv_degree=5, with_stats=False):
    """Schnakenberg forward sweep with a TIME-DEPENDENT wind in ONE
    pallas_call: the convection stencil is assembled in-kernel each step at
    t = (i+1)dt (closes the silent XLA fallback of the stationary-wind
    kernel for --td-wind). ``wind_fn(x, y, t) -> (wx, wy)`` must be
    jnp-traceable."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    kern = functools.partial(
        _schnak_fwd_kernel_td, n=n, dt=dt, Du=Du, Dv=Dv, omega1=omega1,
        omega2=omega2, gamma=gamma, c_b=c_b, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h * h, h=h, a1=a1, warm=warm,
        precond=precond, wind_fn=wind_fn, pts=pts, wts=wts, bary=bary,
        grads=grads,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
        ),
        in_specs=[frame, field, field, stencil, stencil, field, field,
                  field, field, field],
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((9, n, n), u0.dtype),
            pltpu.VMEM((9, n, n), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, K, M, M_diag, ML_diag, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _schnak_adj_kernel_td(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    K_ref, M_ref, Md_ref, ML_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref, A_ref, D_ref, pad_ref,
    *, n, steps, dt, Du, Dv, omega1, omega2, gamma, tol, iters, cheb_iters,
    h2, h, a1, warm, has_mis, precond, wind_fn, pts, wts, bary, grads,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        _inv_init(inv_ref)

    dtype = pcur_ref.dtype
    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    nc = n - 1
    t_n = (steps - 1 - i).astype(dtype) * dt  # adjoint times n*dt
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_p = None
        prec_q = None

    Nt = _conv_planes_td(wind_fn, t_n, nc=nc, h=h, a1=a1, pts=pts, wts=wts,
                         bary=bary, grads=grads, dtype=dtype, transpose=True)

    # q implicit first (helpers.py:680-688): Mat_q = M + dt(Dv K - ω₂Nᵀ + γM_u²)
    Mu2 = _wm_prod([u_n, u_n], nc=nc, h2=h2)
    for d in range(9):
        plane = M_ref[d, :, :] + (dt * Dv) * K_ref[d, :, :]
        if Nt[d] is not None:
            plane = plane - (dt * omega2) * Nt[d]
        if Mu2[d] is not None:
            plane = plane + (dt * gamma) * Mu2[d]
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    rhs_q = _lf_prod([p_np1, u_n, u_n], nc=nc, h2=h2, scale=gamma)
    if has_mis:
        rhs_q = rhs_q + misv_ref[0, :, :]
    b = apply_M(q_np1) + dt * rhs_q
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, x0q, tol, iters)

    # p FCT with A_adj(t) = Du K - ω₁ Nᵀ(t)
    rhs_p = _lf_prod([u_n, v_n, q_n], nc=nc, h2=h2, scale=-2.0 * gamma)
    if has_mis:
        rhs_p = rhs_p + misu_ref[0, :, :]
    Muv = _wm_prod([u_n, v_n], nc=nc, h2=h2)
    S = _add_planes(_scaled_planes(M_ref, gamma), Muv, s2=-2.0 * gamma)
    for d in range(9):
        plane = Du * K_ref[d, :, :]
        if Nt[d] is not None:
            plane = plane - omega1 * Nt[d]
        A_ref[d, :, :] = plane
    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], p_np1, rhs_p,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0p, S=S,
        prec=prec_p, inv_ref=inv_ref,
    )

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n


def fused_schnak_adjoint_sweep_td(u_traj, v_traj, pT, qT, K, M, M_diag,
                                  ML_diag, mis_u=None, mis_v=None, *,
                                  wind_fn, h, a1, dt, Du, Dv, omega1, omega2,
                                  gamma, tol=1e-6, iters=60, cheb_iters=20,
                                  warm=True, precond="jacobi", conv_degree=5,
                                  with_stats=False):
    """Schnakenberg adjoint sweep with a TIME-DEPENDENT wind in ONE
    pallas_call (transposed convection assembled in-kernel at t = n·dt)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    kern = functools.partial(
        _schnak_adj_kernel_td, n=n, steps=steps, dt=dt, Du=Du, Dv=Dv,
        omega1=omega1, omega2=omega2, gamma=gamma, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, h=h, a1=a1, warm=warm,
        has_mis=has_mis, precond=precond, wind_fn=wind_fn, pts=pts, wts=wts,
        bary=bary, grads=grads,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    rev = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
        mis_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        mis_spec = rev
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
        ),
        in_specs=[rev, rev, mis_spec, mis_spec, field, field,
                  stencil, stencil, field, field,
                  field, field, field],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((9, n, n), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT, qT,
      K, M, M_diag, ML_diag, dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


# ---------------------------------------------------------------------------
# Drift-control whole-sweep kernels: the control-dependent pseudo-mass /
# pseudo-stiffness pair Adrift1/Adrift2 is assembled IN-KERNEL each step
# from the streamed control frame — exactly the pattern the reference pays
# two FEniCS assemblies per step for
# (advection_solidbody_FCT_PDECO_finaltime.py:187-191).
# ---------------------------------------------------------------------------


def _drift_planes(c, *, nc, h2, m, grads):
    """9-plane VALUES of Adrift1 + Adrift2 for control field ``c``:
    A1 = ((m·∇c_h) u, v) element-constant weighted mass, A2 = ((m·∇v) c_h, u)
    (advection_solidbody_FCT_PDECO_finaltime.py:187-188). Both integrands
    are quadratic, so the closed-form barycentric moments equal the
    reference's degree-2 rule exactly."""
    T2 = _moments(2)
    cc = _corners(c, nc)
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        gcx = sum(cc[t][a] * grads[t][a][0] for a in range(3))
        gcy = sum(cc[t][a] * grads[t][a][1] for a in range(3))
        mg = m[0] * gcx + m[1] * gcy  # (nc, nc) element-constant m·∇c_h
        # Sb[b] = ∫_ref c_h λ_b = Σ_corner c_corner T2[corner, b]
        Sb = [
            sum(cc[t][cid] * float(T2[cid, b]) for cid in range(3))
            for b in range(3)
        ]
        for a, (ai, aj) in enumerate(corners):
            gam = m[0] * grads[t][a][0] + m[1] * grads[t][a][1]
            for b, (bi, bj) in enumerate(corners):
                E = h2 * (float(T2[a, b]) * mg + gam * Sb[b])
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(E, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _drift_sweep_kernel(
    frames_ref, x0_ref, Abase_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, A_ref, D_ref, pad_ref,
    *, n, dt, sign, m, tol, iters, cheb_iters, h2, warm, has_mis, grads,
):
    """One drift-control FCT step: A = A_base + sign·Adrift(c_i) with
    A_base = εK ∓ N_rot precomputed (sign=-1 forward, +1 adjoint); rhs = 0
    (forward / finaltime adjoint) or the streamed misfit load (alltime)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]
    nc = n - 1
    c_i = frames_ref[0, :, :]
    Ad = _drift_planes(c_i, nc=nc, h2=h2, m=m, grads=grads)
    for d in range(9):
        plane = Abase_ref[d, :, :]
        if Ad[d] is not None:
            plane = plane + sign * Ad[d]
        A_ref[d, :, :] = plane
    rhs = frames_ref[1, :, :] if has_mis else jnp.zeros_like(x_n)
    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :], x_n, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0w,
        inv_ref=inv_ref,
    )
    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1


def fused_drift_fct_sweep(frames, x0, A_base, M, M_diag, ML_diag, *,
                          h, dt, sign, drift, tol=1e-6, iters=60,
                          cheb_iters=20, warm=True, reverse=False,
                          has_mis=False, with_stats=False):
    """Whole drift-control sweep in ONE pallas_call with in-kernel per-step
    Adrift1/Adrift2 assembly. ``frames``: (steps, F, n, n) — channel 0 the
    control, channel 1 (has_mis) the alltime misfit load. ``sign``: -1 for
    the state sweep (A = εK - N_rot - Adrift), +1 for the adjoint
    (A = εK + N_rot + Adrift); ``A_base`` carries the stationary part.
    ``reverse=True``: backward sweep (adjoint). Returns (steps, n, n)
    frames excluding the initial/terminal state.

    Grids past the resident VMEM budget dispatch to the lean variant,
    and past the lean tier's calibrated cap to the banded XL variant."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import (
        fits_vmem, fits_vmem_lean)

    n_ = x0.shape[-1]
    nb_ = max(2, n_ // 128)
    if (not fits_vmem_lean(n_, x0.dtype) and n_ % nb_ == 0
            and (n_ // nb_) % 8 == 0):
        return fused_drift_fct_sweep_xl(
            frames, x0, A_base, M, M_diag, ML_diag, h=h, dt=dt, sign=sign,
            drift=drift, tol=tol, iters=iters, cheb_iters=cheb_iters,
            warm=warm, reverse=reverse, has_mis=has_mis,
            with_stats=with_stats)
    if not fits_vmem(x0.shape[-1], x0.dtype):
        return fused_drift_fct_sweep_lean(
            frames, x0, A_base, M, M_diag, ML_diag, h=h, dt=dt, sign=sign,
            drift=drift, tol=tol, iters=iters, cheb_iters=cheb_iters,
            warm=warm, reverse=reverse, has_mis=has_mis,
            with_stats=with_stats)
    n = x0.shape[-1]
    steps = frames.shape[0]
    F = frames.shape[1]
    grads = _basis_gradients(h)
    kern = functools.partial(
        _drift_sweep_kernel, n=n, dt=dt, sign=float(sign),
        m=tuple(float(v) for v in drift), tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, warm=warm, has_mis=has_mis,
        grads=grads,
    )
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil = pl.BlockSpec((9, n, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)

    def kern2(frames_ref, *rest):
        return kern(frames_ref[0], *rest)

    out, inv = pl.pallas_call(
        kern2,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype)),
        in_specs=[frame_in, field, stencil, stencil, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), x0.dtype),
            pltpu.VMEM((n, n), x0.dtype),
            pltpu.VMEM((9, n, n), x0.dtype),
            pltpu.VMEM((9, n, n), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 100),
        ),
        interpret=_interp(),
    )(frames, x0, A_base, M, M_diag, ML_diag)
    return (out, jnp.min(inv)) if with_stats else out


def _drift_sweep_kernel_lean(
    frames_ref, x0_ref, Abase7_ref,
    out_ref, inv_ref, ahbm_ref,
    cur_ref, A7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref, sem_park, sem_io,
    *, n, steps, dt, sign, m, tol, iters, cheb_iters, h2, has_mis, grads,
    reverse,
):
    """ONE-7-plane-buffer drift-control FCT step (the ≥lean-budget variant
    of _drift_sweep_kernel). The stationary part εK ∓ N_rot is an HBM input
    fetched into the single buffer, the per-step Adrift(c_i) is assembled
    on top in place, and the assembled raw A runs the chemo-lean park
    machinery (HBM park around the solve, transient D, synthesized mass)."""
    dtype = cur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x0_ref, cur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]
    c_i = frames_ref[0, :, :]
    cp = pltpu.make_async_copy(Abase7_ref, A7_ref, sem_park)
    cp.start()
    cp.wait()
    Ad = _drift_planes(c_i, nc=nc, h2=h2, m=m, grads=grads)
    for d in range(9):
        if Ad[d] is not None:
            A_ref[d, :, :] = A_ref[d, :, :] + sign * Ad[d]
    rhs = frames_ref[1, :, :] if has_mis else jnp.zeros_like(x_n)

    # warm start from the HBM trajectory output (see _scalar_sweep_kernel_lean:
    # the slot adjacent to idx holds the CURRENT carry, so x_{n-1} is two away)
    idx = steps - 1 - i if reverse else i
    prev_slot = jnp.clip(idx + 2 if reverse else idx - 2, 0, steps - 1)
    cp = pltpu.make_async_copy(out_ref.at[prev_slot],
                               xpad1_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0w = jnp.where(i > 1, 2.0 * x_n - xpad1_ref[:n, :n], x_n)

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    x_np1 = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), x_n, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0w,
        m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, ahbm_ref, sem_park, xpad4_ref), inv_ref=inv_ref,
    )
    cur_ref[:, :] = x_np1
    cp = pltpu.make_async_copy(cur_ref, out_ref.at[idx], sem_io)
    cp.start()
    cp.wait()


def fused_drift_fct_sweep_lean(frames, x0, A_base, M, M_diag, ML_diag, *,
                               h, dt, sign, drift, tol=1e-6, iters=60,
                               cheb_iters=20, warm=True, reverse=False,
                               has_mis=False, with_stats=False):
    """≥lean-budget variant of fused_drift_fct_sweep (same contract;
    M/M_diag/ML_diag synthesized in-kernel, ``warm`` ignored)."""
    n = x0.shape[-1]
    steps = frames.shape[0]
    F = frames.shape[1]
    grads = _basis_gradients(h)
    A7c = A_base[jnp.asarray(P7)]
    kern = functools.partial(
        _drift_sweep_kernel_lean, n=n, steps=steps, dt=dt, sign=float(sign),
        m=tuple(float(v) for v in drift), tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, has_mis=has_mis, grads=grads,
        reverse=reverse,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

    def kern2(frames_ref, *rest):
        return kern(frames_ref[0], *rest)

    # HBM park as a discarded output ref (real Mosaic rejects HBM scratch)
    out, inv, _park = pl.pallas_call(
        kern2,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype),
                   jax.ShapeDtypeStruct((7, n, n), x0.dtype)),
        in_specs=[frame_in, hbm, hbm],
        out_specs=(hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((n, n), x0.dtype),      # carried state
            pltpu.VMEM((7, n, n), x0.dtype),   # A -> Low -> M -> A
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # shift pad
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 127),
        ),
        interpret=_interp(),
    )(frames, x0, A7c)
    return (out, jnp.min(inv)) if with_stats else out


# ---------------------------------------------------------------------------
# Schnakenberg SYNTH whole-sweep kernels (≥1024²): M and K synthesized from
# iota masks, the convection stencil assembled in-kernel from the wind at
# iota-synthesized quadrature coordinates (so no stationary stencil occupies
# VMEM), per-step stencils in compact 7-plane scratch with scratch-swapping.
# ---------------------------------------------------------------------------


def _schnak_fwd_kernel_synth(
    c_ref, u0_ref, v0_ref, dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref, A7_ref, D7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref,
    *, n, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, c_b, inv_r, tol,
    iters, cheb_iters, warm, precond, wind_fn, pts, wts, bary, grads,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = ucur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    D_ref = _CompactPlanes(D7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    if precond == "dct":
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_u = None
        prec_v = None

    t0 = jnp.asarray(0.0, dtype)  # stationary wind: t unused

    def conv(transpose=False):
        return _conv_planes_td(wind_fn, t0, nc=nc, h=h, a1=a1, pts=pts,
                               wts=wts, bary=bary, grads=grads, dtype=dtype,
                               transpose=transpose)

    # ---- u FCT (helpers.py:581-588): A_u = Du K - ω₁ N ------------------
    N = conv()
    for k7, d in enumerate(P7):
        p_ = Du * plane(d, 0.0, 1.0)
        if N[d] is not None:
            p_ = p_ - omega1 * N[d]
        A7_ref[k7] = p_
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_M0 = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                           skip_planes=ANTI_DIAGONAL_IDS)
    rhs_u = ((gamma * inv_r) * apply_M0(c_i)
             + _lf_prod([u_n, u_n, v_n], nc=nc, h2=h2, scale=gamma))

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    def A_direct(x):
        Nv = conv()
        pad_ref[1 : n + 1, 1 : n + 1] = x
        pc = Du * plane(CENTER, 0.0, 1.0)
        if Nv[CENTER] is not None:
            pc = pc - omega1 * Nv[CENTER]
        acc = pc * x
        for d in range(9):
            if d == CENTER or d in ANTI_DIAGONAL_IDS:
                continue
            pd = Du * plane(d, 0.0, 1.0)
            if Nv[d] is not None:
                pd = pd - omega1 * Nv[d]
            acc = acc + pd * _shifted(pad_ref, d, n)
        return acc

    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _fct_core(
        A_ref, D_ref, pad_ref, M_syn, Md_ref, ml_diag(), u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u,
        prec=prec_u, m_swap=m_swap,
        S_at=lambda d: gamma * plane(d, 1.0, 0.0), A_direct=A_direct,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref), inv_ref=inv_ref,
    )

    # ---- v implicit with the NEW u (helpers.py:590-596) -----------------
    # A scratch holds M (swap): read the mass apply for b first
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_Msc = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    b = apply_Msc(v_n) + dt * ((gamma * c_b) * ml_diag())
    # rededicate the scratch to Mat_v = M + dt(Dv K - ω₂N + γ M_{u²})
    N2 = conv()
    Mu2 = _wm_prod([u_np1, u_np1], nc=nc, h2=h2)
    for k7, d in enumerate(P7):
        p_ = plane(d, 1.0, dt * Dv)
        if N2[d] is not None:
            p_ = p_ - (dt * omega2) * N2[d]
        if Mu2[d] is not None:
            p_ = p_ + (dt * gamma) * Mu2[d]
        A7_ref[k7] = p_
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters)

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1


def fused_schnak_forward_sweep_synth(
        c_traj, u0, v0, *, wind_fn, h, a1, dt, Du, Dv, omega1, omega2,
        gamma, c_b, rescaling, tol=1e-6, iters=60, cheb_iters=20, warm=True,
        precond="dct", conv_degree=5, vmem_limit_mb=120, with_stats=False):
    """Large-grid Schnakenberg forward sweep: the synth analogue of
    fused_schnak_forward_sweep — M/K synthesized from iota masks, the wind
    stencil assembled in-kernel each step (``wind_fn(x, y) -> (wx, wy)``
    jnp-traceable), compact per-step scratches with scratch-swapping."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_fwd_kernel_synth, n=n, h=h, a1=a1, h2=h * h, dt=dt, Du=Du,
        Dv=Dv, omega1=omega1, omega2=omega2, gamma=gamma, c_b=c_b,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        warm=warm, precond=precond, wind_fn=wfn3, pts=pts, wts=wts,
        bary=bary, grads=grads,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
        ),
        in_specs=[frame, field, field, field, field, field],
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((7, n, n), u0.dtype),
            pltpu.VMEM((7, n, n), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # limiter xpads (liveness
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # fix — see _fct_core
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # xpads docstring)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _schnak_adj_kernel_synth(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, A7_ref, D7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref,
    *, n, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, tol, iters,
    cheb_iters, has_mis, precond, wind_fn, pts, wts, bary, grads,
):
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = pcur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    D_ref = _CompactPlanes(D7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_p = None
        prec_q = None

    t0 = jnp.asarray(0.0, dtype)

    def conv_t():
        return _conv_planes_td(wind_fn, t0, nc=nc, h=h, a1=a1, pts=pts,
                               wts=wts, bary=bary, grads=grads, dtype=dtype,
                               transpose=True)

    # ---- q implicit first (helpers.py:680-688) --------------------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_M0 = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                           skip_planes=ANTI_DIAGONAL_IDS)
    rhs_q = _lf_prod([p_np1, u_n, u_n], nc=nc, h2=h2, scale=gamma)
    if has_mis:
        rhs_q = rhs_q + misv_ref[0, :, :]
    b = apply_M0(q_np1) + dt * rhs_q
    Nt = conv_t()
    Mu2 = _wm_prod([u_n, u_n], nc=nc, h2=h2)
    for k7, d in enumerate(P7):
        p_ = plane(d, 1.0, dt * Dv)
        if Nt[d] is not None:
            p_ = p_ - (dt * omega2) * Nt[d]
        if Mu2[d] is not None:
            p_ = p_ + (dt * gamma) * Mu2[d]
        A7_ref[k7] = p_
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, q_np1, tol, iters)

    # ---- p FCT (helpers.py:690-697): A = Du K - ω₁ Nᵀ, S = γM - 2γ M_uv -
    rhs_p = _lf_prod([u_n, v_n, q_n], nc=nc, h2=h2, scale=-2.0 * gamma)
    if has_mis:
        rhs_p = rhs_p + misu_ref[0, :, :]
    Muv = _wm_prod([u_n, v_n], nc=nc, h2=h2)

    def S_at(d):
        p_ = gamma * plane(d, 1.0, 0.0)
        if Muv[d] is not None:
            p_ = p_ - (2.0 * gamma) * Muv[d]
        return p_

    Nt2 = conv_t()
    for k7, d in enumerate(P7):
        p_ = Du * plane(d, 0.0, 1.0)
        if Nt2[d] is not None:
            p_ = p_ - omega1 * Nt2[d]
        A7_ref[k7] = p_

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    def A_direct(x):
        Nv = conv_t()
        pad_ref[1 : n + 1, 1 : n + 1] = x
        pc = Du * plane(CENTER, 0.0, 1.0)
        if Nv[CENTER] is not None:
            pc = pc - omega1 * Nv[CENTER]
        acc = pc * x
        for d in range(9):
            if d == CENTER or d in ANTI_DIAGONAL_IDS:
                continue
            pd = Du * plane(d, 0.0, 1.0)
            if Nv[d] is not None:
                pd = pd - omega1 * Nv[d]
            acc = acc + pd * _shifted(pad_ref, d, n)
        return acc

    p_n = _fct_core(
        A_ref, D_ref, pad_ref, M_syn, Md_ref, ml_diag(), p_np1, rhs_p,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
        prec=prec_p, m_swap=m_swap, S_at=S_at, A_direct=A_direct,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref), inv_ref=inv_ref,
    )

    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n


def fused_schnak_adjoint_sweep_synth(
        u_traj, v_traj, pT, qT, mis_u=None, mis_v=None, *, wind_fn, h, a1,
        dt, Du, Dv, omega1, omega2, gamma, tol=1e-6, iters=60,
        cheb_iters=20, precond="jacobi", conv_degree=5, vmem_limit_mb=120,
        with_stats=False):
    """Large-grid Schnakenberg adjoint sweep (synth analogue of
    fused_schnak_adjoint_sweep; default Jacobi like the resident kernel —
    the adjoint mass coefficients swing with the stored pattern state)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_adj_kernel_synth, n=n, h=h, a1=a1, h2=h * h, dt=dt, Du=Du,
        Dv=Dv, omega1=omega1, omega2=omega2, gamma=gamma, tol=tol,
        iters=iters, cheb_iters=cheb_iters, has_mis=has_mis,
        precond=precond, wind_fn=wfn3, pts=pts, wts=wts, bary=bary,
        grads=grads,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    rev = pl.BlockSpec((1, n, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
        mis_spec = pl.BlockSpec((1, n, n), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        mis_spec = rev
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
        ),
        in_specs=[rev, rev, mis_spec, mis_spec, field, field,
                  field, field, field],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((7, n, n), pT.dtype),
            pltpu.VMEM((7, n, n), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # limiter xpads (liveness
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # fix — see _fct_core
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # xpads docstring)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _scalar_sweep_kernel_lean(
    load_ref, x0_ref, A7h_ref,
    out_ref, inv_ref,
    cur_ref, A7_ref, pad_ref, xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref,
    sem_park, sem_io,
    *, n, steps, dt, tol, iters, cheb_iters, h2,
    nonflux_mode, load_is_mass, reverse, reaction,
):
    """ONE-7-plane-buffer variant of _scalar_sweep_kernel (the ≥lean-budget
    single-field sweep: linear advection / nonlinear state and adjoint).
    The STATIONARY flux matrix stays an HBM input (compact 7-plane layout)
    and is DMA'd into the single VMEM buffer each step (re-fetched after
    the mass materialization of the Chebyshev stage via _fct_core ``park``
    with park_out=False); mass/lumped-mass are synthesized in-kernel
    (UNPADDED grids only — the padded path is XLA)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = cur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x0_ref, cur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]

    if load_is_mass:
        pad_ref[:, :] = jnp.zeros_like(pad_ref)
        apply_M = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                              skip_planes=ANTI_DIAGONAL_IDS)
        rhs = apply_M(load_ref[0, :, :])
    else:
        rhs = load_ref[0, :, :]
    if reaction:
        g_i = load_ref[load_ref.shape[0] - 1, :, :]
        rhs = rhs - _lf_prod([g_i, x_n], nc=nc, h2=h2)

    if nonflux_mode == 0:
        S = None
    else:
        u_for_S = x_n if nonflux_mode > 0 else load_ref[1, :, :]
        Mu2 = _wm_prod([u_for_S, u_for_S], nc=nc, h2=h2)
        scale = (1.0 / 3.0) if nonflux_mode > 0 else 1.0
        S = _add_planes(_scaled_planes(M_syn, -1.0), Mu2, s2=scale)

    # warm start from the HBM trajectory output (the frame from TWO grid
    # steps back — the adjacent slot holds the current carry; see
    # _fwd_sweep_kernel_lean)
    idx = steps - 1 - i if reverse else i
    prev_slot = jnp.clip(idx + 2 if reverse else idx - 2, 0, steps - 1)
    cp = pltpu.make_async_copy(out_ref.at[prev_slot],
                               xpad1_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0w = jnp.where(i > 1, 2.0 * x_n - xpad1_ref[:n, :n], x_n)

    # raw A in (compact): the canonical copy stays in HBM (park_out=False)
    cp = pltpu.make_async_copy(A7h_ref, A7_ref, sem_park)
    cp.start()
    cp.wait()

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    x_np1 = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), x_n, rhs,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0w,
        S=S, m_swap=m_swap,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, A7h_ref, sem_park, xpad4_ref, False), inv_ref=inv_ref,
    )
    cur_ref[:, :] = x_np1
    cp = pltpu.make_async_copy(cur_ref, out_ref.at[idx], sem_io)
    cp.start()
    cp.wait()


def fused_scalar_fct_sweep_lean(load_traj, x0, A_flux, M, M_diag, ML_diag, *,
                                h, dt, tol=1e-6, iters=60, cheb_iters=20,
                                warm=True, nonflux_mode=0, load_is_mass=True,
                                reverse=False, reaction=False,
                                with_stats=False):
    """≥lean-budget variant of fused_scalar_fct_sweep (same contract; the
    M/M_diag/ML_diag arguments are accepted for signature compatibility but
    synthesized in-kernel — valid on unpadded grids only, which is all the
    fused backend ever sees; ``warm`` is ignored: no warm-start scratch)."""
    n = x0.shape[-1]
    steps = load_traj.shape[0]
    F = load_traj.shape[1]
    A7c = A_flux[jnp.asarray(P7)]  # compact layout; planes 2/6 are
    # structurally zero for ANY assembled P1 operator on this mesh
    kern = functools.partial(
        _scalar_sweep_kernel_lean, n=n, steps=steps, dt=dt, tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h * h,
        nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
        reverse=reverse, reaction=reaction,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, n, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)

    def kern2(load_ref, *rest):
        return kern(load_ref[0], *rest)

    out, inv = pl.pallas_call(
        kern2,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype)),
        in_specs=[frame_in, hbm, hbm],
        out_specs=(hbm, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((n, n), x0.dtype),      # carried state
            pltpu.VMEM((7, n, n), x0.dtype),   # A -> Low -> M -> A
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # shift pad
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),
            pltpu.VMEM((n + 2, n + 2), x0.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 127),
        ),
        interpret=_interp(),
    )(load_traj, x0, A7c)
    return (out, jnp.min(inv)) if with_stats else out


def _schnak_fwd_kernel_lean(
    c_ref, u0_ref, v0_ref, dct_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref, ahbm_ref,
    ucur_ref, vcur_ref, A7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref, sem_park, sem_io,
    *, n, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, c_b, inv_r, tol,
    iters, cheb_iters, precond, wind_fn, pts, wts, bary, grads,
):
    """ONE-7-plane-buffer Schnakenberg forward step (the ≥1024² variant of
    _schnak_fwd_kernel_synth; identical math, helpers.py:562-596). Same
    VMEM diet as _fwd_sweep_kernel_lean (HBM-parked raw A, transient D,
    no warm-start scratch, HBM-DMA'd state/outputs)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = ucur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(u0_ref, ucur_ref, sem_io)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(v0_ref, vcur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]
    if precond == "dct":
        prec_u = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_v = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_u = None
        prec_v = None

    # warm starts from the HBM trajectory outputs (slot i-2: slot i-1 is the
    # current carry; see _fwd_sweep_kernel_lean)
    im2 = jnp.maximum(i - 2, 0)
    cp = pltpu.make_async_copy(uout_ref.at[im2],
                               xpad1_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0u = jnp.where(i > 1, 2.0 * u_n - xpad1_ref[:n, :n], u_n)
    cp = pltpu.make_async_copy(vout_ref.at[im2],
                               xpad2_ref.at[:n, :n], sem_io)
    cp.start()
    cp.wait()
    x0v = jnp.where(i > 1, 2.0 * v_n - xpad2_ref[:n, :n], v_n)

    t0 = jnp.asarray(0.0, dtype)  # stationary wind: t unused

    def conv(transpose=False):
        return _conv_planes_td(wind_fn, t0, nc=nc, h=h, a1=a1, pts=pts,
                               wts=wts, bary=bary, grads=grads, dtype=dtype,
                               transpose=transpose)

    # ---- u FCT (helpers.py:581-588): A_u = Du K - ω₁ N ------------------
    N = conv()
    for k7, d in enumerate(P7):
        p_ = Du * plane(d, 0.0, 1.0)
        if N[d] is not None:
            p_ = p_ - omega1 * N[d]
        A7_ref[k7] = p_
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_M0 = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                           skip_planes=ANTI_DIAGONAL_IDS)
    rhs_u = ((gamma * inv_r) * apply_M0(c_i)
             + _lf_prod([u_n, u_n, v_n], nc=nc, h2=h2, scale=gamma))

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    u_np1 = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), u_n, rhs_u,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, x0=x0u,
        prec=prec_u, m_swap=m_swap,
        S_at=lambda d: gamma * plane(d, 1.0, 0.0),
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, ahbm_ref, sem_park, xpad4_ref), inv_ref=inv_ref,
    )

    # ---- v implicit with the NEW u (helpers.py:590-596) -----------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    b = apply_M0(v_n) + dt * ((gamma * c_b) * ml_diag())
    # rededicate the scratch to Mat_v = M + dt(Dv K - ω₂N + γ M_{u²})
    N2 = conv()
    Mu2 = _wm_prod([u_np1, u_np1], nc=nc, h2=h2)
    for k7, d in enumerate(P7):
        p_ = plane(d, 1.0, dt * Dv)
        if N2[d] is not None:
            p_ = p_ - (dt * omega2) * N2[d]
        if Mu2[d] is not None:
            p_ = p_ + (dt * gamma) * Mu2[d]
        A7_ref[k7] = p_
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    v_np1 = _cg(apply_mat,
                prec_v if prec_v is not None else 1.0 / A_ref[CENTER],
                b, x0v, tol, iters)

    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    cpu_ = pltpu.make_async_copy(ucur_ref, uout_ref.at[i], sem_io)
    cpu_.start()
    cpu_.wait()
    cpv_ = pltpu.make_async_copy(vcur_ref, vout_ref.at[i], sem_io)
    cpv_.start()
    cpv_.wait()


def fused_schnak_forward_sweep_lean(
        c_traj, u0, v0, *, wind_fn, h, a1, dt, Du, Dv, omega1, omega2,
        gamma, c_b, rescaling, tol=1e-6, iters=60, cheb_iters=20,
        precond="dct", conv_degree=5, vmem_limit_mb=127, with_stats=False):
    """≥1024²-capable Schnakenberg forward sweep (lean analogue of
    fused_schnak_forward_sweep_synth; see _schnak_fwd_kernel_lean)."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_fwd_kernel_lean, n=n, h=h, a1=a1, h2=h * h, dt=dt, Du=Du,
        Dv=Dv, omega1=omega1, omega2=omega2, gamma=gamma, c_b=c_b,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        precond=precond, wind_fn=wfn3, pts=pts, wts=wts, bary=bary,
        grads=grads,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    # HBM park as a discarded output ref (real Mosaic rejects HBM scratch)
    u_traj, v_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
            jax.ShapeDtypeStruct((7, n, n), u0.dtype),
        ),
        in_specs=[frame, hbm, hbm, field, field, field],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((7, n, n), u0.dtype),   # A -> Low -> A -> Mat_v
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),
            pltpu.VMEM((n + 2, n + 2), u0.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _schnak_adj_kernel_lean(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    dct_ref, ilamu_ref, ilamv_ref,
    pout_ref, qout_ref, inv_ref, ahbm_ref,
    pcur_ref, qcur_ref, ustg_ref, vstg_ref, A7_ref, pad_ref,
    xpad1_ref, xpad2_ref, xpad3_ref, xpad4_ref, sem_park, sem_io,
    *, n, steps, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, tol, iters,
    cheb_iters, has_mis, precond, wind_fn, pts, wts, bary, grads,
):
    """ONE-7-plane-buffer Schnakenberg adjoint step (lean variant of
    _schnak_adj_kernel_synth, helpers.py:599-698; HBM-staged forward
    trajectory frames, misfits folded into the loads via a pad-staged
    read)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = pcur_ref.dtype
    plane, ml_diag = _make_synth(n, dtype, h2)
    A_ref = _CompactPlanes(A7_ref, n, dtype)
    M_syn = _SynthPlanes(plane, 1.0, 0.0)
    Md_ref = _FieldVal(plane(CENTER, 1.0, 0.0))
    nc = n - 1

    i = pl.program_id(0)
    ridx = steps - 1 - i

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(pT_ref, pcur_ref, sem_io)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(qT_ref, qcur_ref, sem_io)
        cp.start()
        cp.wait()
        _inv_init(inv_ref)

    for src, dst in ((u_ref, ustg_ref), (v_ref, vstg_ref)):
        cp = pltpu.make_async_copy(src.at[ridx], dst, sem_io)
        cp.start()
        cp.wait()

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = ustg_ref[:, :]
    v_n = vstg_ref[:, :]
    if precond == "dct":
        prec_p = _make_dct_pinv(dct_ref, ilamu_ref, dtype)
        prec_q = _make_dct_pinv(dct_ref, ilamv_ref, dtype)
    else:
        prec_p = None
        prec_q = None

    t0 = jnp.asarray(0.0, dtype)

    def conv_t():
        return _conv_planes_td(wind_fn, t0, nc=nc, h=h, a1=a1, pts=pts,
                               wts=wts, bary=bary, grads=grads, dtype=dtype,
                               transpose=True)

    def staged_mis(mref):
        cp = pltpu.make_async_copy(
            mref.at[ridx], xpad1_ref.at[:n, :n], sem_io)
        cp.start()
        cp.wait()
        return xpad1_ref[:n, :n]

    # ---- q implicit first (helpers.py:680-688) --------------------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    apply_M0 = _make_apply(M_syn, pad_ref, n, prezeroed=True,
                           skip_planes=ANTI_DIAGONAL_IDS)
    rhs_q = _lf_prod([p_np1, u_n, u_n], nc=nc, h2=h2, scale=gamma)
    if has_mis:
        rhs_q = rhs_q + staged_mis(misv_ref)
    b = apply_M0(q_np1) + dt * rhs_q
    Nt = conv_t()
    Mu2 = _wm_prod([u_n, u_n], nc=nc, h2=h2)
    for k7, d in enumerate(P7):
        p_ = plane(d, 1.0, dt * Dv)
        if Nt[d] is not None:
            p_ = p_ - (dt * omega2) * Nt[d]
        if Mu2[d] is not None:
            p_ = p_ + (dt * gamma) * Mu2[d]
        A7_ref[k7] = p_
    apply_mat = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    q_n = _cg(apply_mat,
              prec_q if prec_q is not None else 1.0 / A_ref[CENTER],
              b, q_np1, tol, iters)

    # ---- p FCT (helpers.py:690-697): A = Du K - ω₁ Nᵀ, S = γM - 2γ M_uv -
    rhs_p = _lf_prod([u_n, v_n, q_n], nc=nc, h2=h2, scale=-2.0 * gamma)
    if has_mis:
        rhs_p = rhs_p + staged_mis(misu_ref)
    Muv = _wm_prod([u_n, v_n], nc=nc, h2=h2)

    def S_at(d):
        p_ = gamma * plane(d, 1.0, 0.0)
        if Muv[d] is not None:
            p_ = p_ - (2.0 * gamma) * Muv[d]
        return p_

    Nt2 = conv_t()
    for k7, d in enumerate(P7):
        p_ = Du * plane(d, 0.0, 1.0)
        if Nt2[d] is not None:
            p_ = p_ - omega1 * Nt2[d]
        A7_ref[k7] = p_

    def m_swap():
        for k7, d in enumerate(P7):
            A7_ref[k7] = plane(d, 1.0, 0.0)
        return A_ref

    p_n = _fct_core(
        A_ref, None, pad_ref, M_syn, Md_ref, ml_diag(), p_np1, rhs_p,
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
        prec=prec_p, m_swap=m_swap, S_at=S_at,
        xpads=(xpad1_ref, xpad2_ref, xpad3_ref),
        park=(A7_ref, ahbm_ref, sem_park, xpad4_ref), inv_ref=inv_ref,
    )

    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    cpp = pltpu.make_async_copy(pcur_ref, pout_ref.at[ridx], sem_io)
    cpp.start()
    cpp.wait()
    cpq = pltpu.make_async_copy(qcur_ref, qout_ref.at[ridx], sem_io)
    cpq.start()
    cpq.wait()


def fused_schnak_adjoint_sweep_lean(
        u_traj, v_traj, pT, qT, mis_u=None, mis_v=None, *, wind_fn, h, a1,
        dt, Du, Dv, omega1, omega2, gamma, tol=1e-6, iters=60,
        cheb_iters=20, precond="jacobi", conv_degree=5, vmem_limit_mb=127,
        with_stats=False):
    """≥1024²-capable Schnakenberg adjoint sweep (lean analogue of
    fused_schnak_adjoint_sweep_synth; default Jacobi like the synth
    kernel)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_adj_kernel_lean, n=n, steps=steps, h=h, a1=a1, h2=h * h,
        dt=dt, Du=Du, Dv=Dv, omega1=omega1, omega2=omega2, gamma=gamma,
        tol=tol, iters=iters, cheb_iters=cheb_iters, has_mis=has_mis,
        precond=precond, wind_fn=wfn3, pts=pts, wts=wts, bary=bary,
        grads=grads,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    field = pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
    # HBM park as a discarded output ref (real Mosaic rejects HBM scratch)
    p_traj, q_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
            jax.ShapeDtypeStruct((7, n, n), pT.dtype),
        ),
        in_specs=[hbm, hbm, hbm, hbm, hbm, hbm, field, field, field],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((n, n), pT.dtype),      # p current
            pltpu.VMEM((n, n), pT.dtype),      # q current
            pltpu.VMEM((n, n), pT.dtype),      # u staging
            pltpu.VMEM((n, n), pT.dtype),      # v staging
            pltpu.VMEM((7, n, n), pT.dtype),   # Mat -> A -> Low -> A
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # limiter xpads
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),
            pltpu.VMEM((n + 2, n + 2), pT.dtype),  # park/flux D pad
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


# ---------------------------------------------------------------------------
# XL (banded-lean) whole-sweep kernels: the >= 1024^2 single-chip tier.
#
# Round-4 hardware calibration (docs/roadmap.md) showed the single-block
# lean kernels cannot compile past ~640^2 f32: Mosaic's register allocator
# gives each loop region its own pool of (n, n)-sized spill slots (~46
# field planes across the whole step kernel = 271 MB scoped at 1024^2 vs
# the 128 MB VMEM). The XL kernels keep the FULL-PLANE state in explicit
# VMEM scratch slots (a (10, n, n) "ST" register file + the (7, n, n)
# per-step stencil) and run every solver-loop body BANDED: each sweep
# iterates nb row bands of nr = n/nb rows, so loop-region temporaries are
# (nr, n)-sized and the spill pools shrink by ~nb. Only the spectral DCT
# preconditioner applies stay full-plane (four MXU matmuls; their
# operands/outputs fit comfortably). The raw flux matrix is parked in an
# HBM output ref around the low-order solve exactly like the lean kernels.
#
# ST slot map (chemotaxis forward):
#   0 U  u_n, then u_{n+1}          5 P  Krylov p / Cheb yold
#   1 V  v_n, then v_{n+1}          6 B  rhs/b / CG Ap / Cheb rdot
#   2 X  Krylov x / u_low           7 W  BiCGStab phat+shat / Cheb ymid (du)
#   3 R  Krylov r / s               8 RP BiCGStab v / limiter R+
#   4 Z  CG z / BiCGStab rhat /     9 RN BiCGStab t / Cheb ynew /
#        warm-start staging / Mdinv      limiter R-
# ---------------------------------------------------------------------------


def _bands_of(n, nb):
    nr = n // nb
    return [(b * nr, b == 0, b == nb - 1) for b in range(nb)], nr


def _make_synth_xl(n, dtype, h2):
    """Band-windowed _make_synth: plane(d, mc, kc, r0, nr) -> the (nr, n)
    window [r0, r0+nr) of the synthesized alpha*M + beta*K stencil plane."""
    combos, ml_combo = _mk_combos()
    one = jnp.asarray(1.0, dtype)
    zero = jnp.asarray(0.0, dtype)

    def mask(ai, aj, r0, nr):
        row = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 0) + r0
        col = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 1)
        rk = (row <= n - 2) if ai == 0 else (row >= 1)
        ck = (col <= n - 2) if aj == 0 else (col >= 1)
        return jnp.where(rk & ck, one, zero)

    def plane(d, mcoef, kcoef, r0, nr):
        acc = None
        for (ai, aj), (em, ek) in combos[d].items():
            cst = float(mcoef) * h2 * em + float(kcoef) * ek
            if cst == 0.0:
                continue
            term = cst * mask(ai, aj, r0, nr)
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros((nr, n), dtype)
        return acc

    def ml_diag(r0, nr):
        acc = None
        for (ai, aj), em in ml_combo.items():
            term = (h2 * em) * mask(ai, aj, r0, nr)
            acc = term if acc is None else acc + term
        return acc

    return plane, ml_diag


def _xl_stage(pad_ref, read_rows, r0, nr, n, top, bot, border=0.0):
    """Fill the (nr+2, n+2) band pad with global rows r0-1..r0+nr of a full
    (n, n) plane (``read_rows(lo, hi)`` -> value), ``border`` elsewhere.
    pad row k holds global row r0-1+k; out-of-domain rows/cols hold the
    border value (0 = masked-assembly semantics, 1 = the limiter's R
    convention)."""
    pad_ref[:, :] = jnp.full_like(pad_ref, border)
    lo = r0 - (0 if top else 1)
    hi = r0 + nr + (0 if bot else 1)
    d0 = 1 if top else 0
    pad_ref[d0 : d0 + (hi - lo), 1 : n + 1] = read_rows(lo, hi)


def _xl_apply(S_at, pad_ref, r0, nr, n):
    """Band stencil apply: out[i] = sum_d S[d][i] * x[i + off_d] for the
    band rows, reading x through a staged band pad."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    acc = None
    for d in range(9):
        if d in ANTI_DIAGONAL_IDS:
            continue
        w = S_at(d, r0, nr)
        if w is None:
            continue
        di, dj = OFFSETS[d]
        t = w * pad_ref[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]
        acc = t if acc is None else acc + t
    return acc


def _xl_corner(f, t, i, ncr, ncc):
    ai, aj = TRI_CORNERS[t][i]
    return f[ai : ai + ncr, aj : aj + ncc]


def _xl_lf_prod(fields, *, ncr, ncc, h2, scale=1.0):
    """Rectangular-patch _lf_prod: exact load (ncr+1, ncc+1) of
    scale * int (prod_k f_k,h) phi_a dx over the patch cells."""
    k = len(fields)
    T = _moments(k + 1) * h2
    out = None
    for t in range(2):
        contribs = [None, None, None]
        for idx in np.ndindex(*((3,) * k)):
            p = _xl_corner(fields[0], t, idx[0], ncr, ncc)
            for m in range(1, k):
                p = p * _xl_corner(fields[m], t, idx[m], ncr, ncc)
            for a in range(3):
                w = scale * float(T[idx + (a,)])
                add = w * p
                contribs[a] = add if contribs[a] is None else contribs[a] + add
        for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
            placed = jnp.pad(contribs[a], ((ai, 1 - ai), (aj, 1 - aj)))
            out = placed if out is None else out + placed
    return out


def _xl_asm_transport(u_b, v_b, *, ncr, ncc, chi, eta, wts, bary, grads):
    """Band-patch chemotaxis transport assembly: planes of
    -chi * (e^{-eta u} grad v_h . grad phi_a, phi_b) as a dict
    d -> (ncr+1, ncc+1) value (None for the structurally-zero planes);
    same math as _assemble_forward_A (helpers.py:1350-1352)."""
    out = {d: None for d in range(9)}
    for t in range(2):
        corners = TRI_CORNERS[t]
        gvx = sum(_xl_corner(v_b, t, a, ncr, ncc) * grads[t, a, 0]
                  for a in range(3))
        gvy = sum(_xl_corner(v_b, t, a, ncr, ncc) * grads[t, a, 1]
                  for a in range(3))
        Vb = [None] * 3
        for q in range(len(wts)):
            uq = (bary[q, 0] * _xl_corner(u_b, t, 0, ncr, ncc)
                  + bary[q, 1] * _xl_corner(u_b, t, 1, ncr, ncc)
                  + bary[q, 2] * _xl_corner(u_b, t, 2, ncr, ncc))
            e = wts[q] * jnp.exp(-eta * uq)
            for b in range(3):
                contrib = bary[q, b] * e
                Vb[b] = contrib if Vb[b] is None else Vb[b] + contrib
        for a, (ai, aj) in enumerate(corners):
            ga = (-chi * grads[t, a, 0]) * gvx + (-chi * grads[t, a, 1]) * gvy
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(ga * Vb[b], ((ai, 1 - ai), (aj, 1 - aj)))
                out[d] = placed if out[d] is None else out[d] + placed
    return out


def _xl_cg(ST, slots, S_at, pinv, diag_at, bsq, pad, BANDS, nr, n, tol,
           iters, dtype):
    """Banded preconditioned CG on the ST slots (x, r, z, p, Ap); the
    while_loop carries only scalars (same semantics as _cg)."""
    X, R, Z, P, AP = slots
    zero = jnp.asarray(0.0, dtype)

    rn0 = zero
    for (r0, top, bot) in BANDS:
        _xl_stage(pad, lambda lo, hi: ST[X, lo:hi, :], r0, nr, n, top, bot)
        Ax = _xl_apply(S_at, pad, r0, nr, n)
        rb = ST[AP, r0 : r0 + nr, :] - Ax   # AP holds b on entry
        ST[R, r0 : r0 + nr, :] = rb
        rn0 = rn0 + jnp.sum(rb * rb)

    def apply_pinv():
        if pinv is not None:
            # read r ONCE: saves one full-plane VMEM load, and r is
            # reused for the r·z dot product below
            r = ST[R, :, :]
            z = pinv(r)
            ST[Z, :, :] = z
            return jnp.sum(r * z)
        rz = zero
        for (r0, top, bot) in BANDS:
            rb = ST[R, r0 : r0 + nr, :]
            zb = rb / diag_at(r0, nr)
            ST[Z, r0 : r0 + nr, :] = zb
            rz = rz + jnp.sum(rb * zb)
        return rz

    rz0 = apply_pinv()
    ST[P, :, :] = ST[Z, :, :]
    atol2 = tol * tol * bsq

    def cond(c):
        k, rz, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, rz, _ = c
        pAp = zero
        for (r0, top, bot) in BANDS:
            _xl_stage(pad, lambda lo, hi: ST[P, lo:hi, :], r0, nr, n, top, bot)
            Ap = _xl_apply(S_at, pad, r0, nr, n)
            ST[AP, r0 : r0 + nr, :] = Ap
            pAp = pAp + jnp.sum(ST[P, r0 : r0 + nr, :] * Ap)
        alpha = _safe_div(rz, pAp)
        rn2 = zero
        for (r0, top, bot) in BANDS:
            ST[X, r0 : r0 + nr, :] = (ST[X, r0 : r0 + nr, :]
                                      + alpha * ST[P, r0 : r0 + nr, :])
            rb = ST[R, r0 : r0 + nr, :] - alpha * ST[AP, r0 : r0 + nr, :]
            ST[R, r0 : r0 + nr, :] = rb
            rn2 = rn2 + jnp.sum(rb * rb)
        rz2 = apply_pinv()
        beta = _safe_div(rz2, rz)
        for (r0, top, bot) in BANDS:
            ST[P, r0 : r0 + nr, :] = (ST[Z, r0 : r0 + nr, :]
                                      + beta * ST[P, r0 : r0 + nr, :])
        return k + 1, rz2, rn2

    jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), rz0, rn0))


def _xl_bicgstab(ST, slots, S_at, pinv, diag_at, bsq, pad, BANDS, nr, n,
                 tol, iters, dtype):
    """Banded preconditioned BiCGStab on the ST slots
    (x, r, rhat, p, v, t, b, phat); scalar-only while_loop carries (same
    semantics as _bicgstab)."""
    X, R, RH, P, VV, T, B, PH = slots
    zero = jnp.asarray(0.0, dtype)

    rho0 = zero
    for (r0, top, bot) in BANDS:
        _xl_stage(pad, lambda lo, hi: ST[X, lo:hi, :], r0, nr, n, top, bot)
        Ax = _xl_apply(S_at, pad, r0, nr, n)
        rb = ST[B, r0 : r0 + nr, :] - Ax
        ST[R, r0 : r0 + nr, :] = rb
        ST[RH, r0 : r0 + nr, :] = rb
        ST[P, r0 : r0 + nr, :] = rb
        rho0 = rho0 + jnp.sum(rb * rb)
    atol2 = tol * tol * bsq

    def precond(src):
        if pinv is not None:
            ST[PH, :, :] = pinv(ST[src, :, :])
        else:
            for (r0, top, bot) in BANDS:
                ST[PH, r0 : r0 + nr, :] = (ST[src, r0 : r0 + nr, :]
                                           / diag_at(r0, nr))

    def cond(c):
        k, rho, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, rho, _ = c
        precond(P)                                     # phat
        rhv = zero
        for (r0, top, bot) in BANDS:
            _xl_stage(pad, lambda lo, hi: ST[PH, lo:hi, :], r0, nr, n, top, bot)
            vb = _xl_apply(S_at, pad, r0, nr, n)
            ST[VV, r0 : r0 + nr, :] = vb
            rhv = rhv + jnp.sum(ST[RH, r0 : r0 + nr, :] * vb)
        alpha = _safe_div(rho, rhv)
        for (r0, top, bot) in BANDS:
            ST[X, r0 : r0 + nr, :] = (ST[X, r0 : r0 + nr, :]
                                      + alpha * ST[PH, r0 : r0 + nr, :])
            ST[R, r0 : r0 + nr, :] = (ST[R, r0 : r0 + nr, :]
                                      - alpha * ST[VV, r0 : r0 + nr, :])
        precond(R)                                     # shat (s lives in R)
        ts = zero
        tt = zero
        for (r0, top, bot) in BANDS:
            _xl_stage(pad, lambda lo, hi: ST[PH, lo:hi, :], r0, nr, n, top, bot)
            tb = _xl_apply(S_at, pad, r0, nr, n)
            ST[T, r0 : r0 + nr, :] = tb
            ts = ts + jnp.sum(tb * ST[R, r0 : r0 + nr, :])
            tt = tt + jnp.sum(tb * tb)
        omega = _safe_div(ts, tt)
        rho2 = zero
        rn2 = zero
        for (r0, top, bot) in BANDS:
            ST[X, r0 : r0 + nr, :] = (ST[X, r0 : r0 + nr, :]
                                      + omega * ST[PH, r0 : r0 + nr, :])
            rb = ST[R, r0 : r0 + nr, :] - omega * ST[T, r0 : r0 + nr, :]
            ST[R, r0 : r0 + nr, :] = rb
            rho2 = rho2 + jnp.sum(ST[RH, r0 : r0 + nr, :] * rb)
            rn2 = rn2 + jnp.sum(rb * rb)
        beta = _safe_div(rho2, rho) * _safe_div(alpha, omega)
        for (r0, top, bot) in BANDS:
            ST[P, r0 : r0 + nr, :] = (
                ST[R, r0 : r0 + nr, :]
                + beta * (ST[P, r0 : r0 + nr, :]
                          - omega * ST[VV, r0 : r0 + nr, :]))
        return k + 1, rho2, rn2

    jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), rho0, rho0))



def _xl_fct_tail(ST, slots, A7_ref, ahbm_ref, save_ref, pads, sems,
                 BANDS, nr, n, *, dt, tol, iters, cheb_iters, plane, ml_diag,
                 mass_at, pinv, bsq, rhs_at=None, S_at=None, inv_ref=None,
                 out_slot, dtype, park_out=True):
    """Banded FCT step tail (shared by the XL forward and adjoint kernels):
    park raw A (already assembled in A7_ref) to the HBM ref, transform
    A -> Low in place band by band (optional non-flux planes ``S_at``),
    min-rowsum telemetry, banded BiCGStab low-order solve (x0 preloaded in
    the X slot, b in the B slot with ||b||^2 = ``bsq``), raw-A restore,
    banded Chebyshev du/dt on M du = -A u_low + rhs (``rhs_at(r0, nr)``
    band values, or zero), and the banded Zalesak limiter; the corrected
    solution lands in ``out_slot``. Mirrors _fct_core's park mode
    (helpers.py:1769-1872) with the XL memory model. ``park_out=False``:
    the HBM ref ALREADY holds the canonical raw A (a stationary flux
    matrix passed as an HBM input) — skip the park-out DMA and only
    restore from it."""
    X, R, Z, P, B, W, RP, RN = slots
    pad1, pad2, pad3, pad4, pad5 = pads
    sem_io, sem_park = sems
    i = pl.program_id(0)

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    # park raw A in the HBM output ref, then transform A -> Low in place,
    # band by band: each band's Low planes are computed as values from the
    # still-raw A7 rows; the one raw row a later band needs from an
    # already-transformed earlier band (global row r0-1) is saved first.
    if park_out:
        cp = pltpu.make_async_copy(A7_ref, ahbm_ref, sem_park)
        cp.start()
        cp.wait()
    for bidx in range(1, len(BANDS)):
        r0s = bidx * nr
        for k7 in range(7):
            save_ref[k7, 8 * bidx, :] = A7_ref[k7, r0s - 1, :]
    minrs = None
    for (r0, top, bot) in BANDS:
        bandidx = r0 // nr

        def stage_raw(k7):
            pad1[:, :] = jnp.zeros_like(pad1)
            hi = r0 + nr + (0 if bot else 1)
            if top:
                pad1[1 : 1 + hi - r0, 1 : n + 1] = A7_ref[k7, r0:hi, :]
            else:
                pad1[0, 1 : n + 1] = save_ref[k7, 8 * bandidx, :]
                pad1[1 : 1 + hi - r0, 1 : n + 1] = A7_ref[k7, r0:hi, :]

        lowp = {}
        offsum = None
        for d in range(9):
            if d in _ZERO_PLANES or d == CENTER:
                continue
            od = opposite(d)
            stage_raw(P7IDX[od])
            di, dj = OFFSETS[d]
            Ad = A7_ref[P7IDX[d], r0 : r0 + nr, :]
            Dd = jnp.maximum(
                0.0, jnp.maximum(Ad, pad1[1 + di : 1 + di + nr,
                                          1 + dj : 1 + dj + n]))
            pl_d = Ad - Dd
            if S_at is not None:
                sd = S_at(d, r0, nr)
                if sd is not None:
                    pl_d = pl_d + sd
            lowp[d] = dt * pl_d
            offsum = Dd if offsum is None else offsum + Dd
        cd = A7_ref[P7IDX[CENTER], r0 : r0 + nr, :] + offsum
        if S_at is not None:
            sc = S_at(CENTER, r0, nr)
            if sc is not None:
                cd = cd + sc
        lowp[CENTER] = ml_diag(r0, nr) + dt * cd
        rs = None
        for d, v in lowp.items():
            rs = v if rs is None else rs + v
            A7_ref[P7IDX[d], r0 : r0 + nr, :] = v
        mb = jnp.min(rs)
        minrs = mb if minrs is None else jnp.minimum(minrs, mb)
    if inv_ref is not None:
        inv_ref[:, :] = jnp.minimum(inv_ref[:, :], minrs)

    def low_at(d, r0, nrw):
        if d in _ZERO_PLANES:
            return None
        return A7_ref[P7IDX[d], r0 : r0 + nrw, :]

    def low_diag(r0, nrw):
        return A7_ref[P7IDX[CENTER], r0 : r0 + nrw, :]

    _xl_bicgstab(ST, (X, R, Z, P, RP, RN, B, W), low_at, pinv, low_diag,
                 bsq, pad1, BANDS, nr, n, tol, iters, dtype)
    # u_low stays in ST[X]

    # ---- Chebyshev du/dt on M du = -A u_low + rhs (helpers.py:1812-1815)
    cp = pltpu.make_async_copy(ahbm_ref, A7_ref, sem_park)
    cp.start()
    cp.wait()
    for (r0, top, bot) in BANDS:
        _xl_stage(pad1, rows(X), r0, nr, n, top, bot)
        rdot_b = -_xl_apply(low_at, pad1, r0, nr, n)
        if rhs_at is not None:
            rdot_b = rdot_b + rhs_at(r0, nr, top, bot)
        ST[B, r0 : r0 + nr, :] = rdot_b
        ST[Z, r0 : r0 + nr, :] = 1.0 / (1.25 * plane(CENTER, 1.0, 0.0,
                                                     r0, nr))
    lmin, lmax = 0.5, 2.0
    rho_c = (lmax - lmin) / (lmax + lmin)
    rc2 = rho_c * rho_c
    om2 = 1.0 / (1.0 - rc2 / 2.0)
    # iter 1 (om=1, yold=ymid=0): ymid_1 = rdot * Mdinv  (yold slot P,
    # ymid slot W, scratch ynew slot RN; scalar-only fori carry)
    for (r0, top, bot) in BANDS:
        ST[P, r0 : r0 + nr, :] = (ST[B, r0 : r0 + nr, :]
                                  * ST[Z, r0 : r0 + nr, :])
    if cheb_iters >= 2:
        for (r0, top, bot) in BANDS:
            _xl_stage(pad1, rows(P), r0, nr, n, top, bot)
            rr = (ST[B, r0 : r0 + nr, :]
                  - _xl_apply(mass_at, pad1, r0, nr, n))
            ST[W, r0 : r0 + nr, :] = om2 * (rr * ST[Z, r0 : r0 + nr, :]
                                            + ST[P, r0 : r0 + nr, :])

        def cheb_body(k, om):
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            for (r0, top, bot) in BANDS:
                _xl_stage(pad1, rows(W), r0, nr, n, top, bot)
                rr = (ST[B, r0 : r0 + nr, :]
                      - _xl_apply(mass_at, pad1, r0, nr, n))
                ST[RN, r0 : r0 + nr, :] = (
                    om * (rr * ST[Z, r0 : r0 + nr, :]
                          + ST[W, r0 : r0 + nr, :]
                          - ST[P, r0 : r0 + nr, :])
                    + ST[P, r0 : r0 + nr, :])
            for (r0, top, bot) in BANDS:
                ST[P, r0 : r0 + nr, :] = ST[W, r0 : r0 + nr, :]
                ST[W, r0 : r0 + nr, :] = ST[RN, r0 : r0 + nr, :]
            return om

        jax.lax.fori_loop(2, cheb_iters, cheb_body,
                          jnp.asarray(om2, dtype))
    # du lives in ST[W]

    # ---- fluxes + Zalesak + correction (helpers.py:1812-1872) -----------
    for (r0, top, bot) in BANDS:
        row = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 0) + r0
        col = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 1)
        _xl_stage(pad1, rows(X), r0, nr, n, top, bot)
        _xl_stage(pad2, rows(W), r0, nr, n, top, bot)
        ul_b = ST[X, r0 : r0 + nr, :]
        du_b = ST[W, r0 : r0 + nr, :]
        p_pos = jnp.zeros((nr, n), dtype)
        p_neg = jnp.zeros((nr, n), dtype)
        u_max = ul_b
        u_min = ul_b
        for d in EDGE_NEIGHBOR_IDS:
            di, dj = OFFSETS[d]
            _xl_stage(pad3, lambda lo, hi: A7_ref[P7IDX[opposite(d)],
                                                  lo:hi, :],
                      r0, nr, n, top, bot)
            Dd = jnp.maximum(
                0.0, jnp.maximum(A7_ref[P7IDX[d], r0 : r0 + nr, :],
                                 pad3[1 + di : 1 + di + nr,
                                      1 + dj : 1 + dj + n]))
            F = (mass_at(d, r0, nr)
                 * (du_b - pad2[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n])
                 + Dd * (ul_b - pad1[1 + di : 1 + di + nr,
                                     1 + dj : 1 + dj + n]))
            p_pos = p_pos + jnp.maximum(F, 0.0)
            p_neg = p_neg + jnp.minimum(F, 0.0)
            ok = ((row + di >= 0) & (row + di < n)
                  & (col + dj >= 0) & (col + dj < n))
            nbr = jnp.where(ok, pad1[1 + di : 1 + di + nr,
                                     1 + dj : 1 + dj + n], ul_b)
            u_max = jnp.maximum(u_max, nbr)
            u_min = jnp.minimum(u_min, nbr)
        mlb = ml_diag(r0, nr)
        q_pos = u_max - ul_b
        q_neg = u_min - ul_b
        den_pos = dt * p_pos  # branch on the PRODUCT (f32 underflow; fct.py)
        r_pos = jnp.where(
            den_pos > 0.0,
            jnp.minimum(1.0, mlb * q_pos
                        / jnp.where(den_pos > 0.0, den_pos, 1.0)),
            1.0,
        )
        den_neg = dt * p_neg
        r_neg = jnp.where(
            den_neg < 0.0,
            jnp.minimum(1.0, mlb * q_neg
                        / jnp.where(den_neg < 0.0, den_neg, 1.0)),
            1.0,
        )
        ST[RP, r0 : r0 + nr, :] = r_pos
        ST[RN, r0 : r0 + nr, :] = r_neg

    for (r0, top, bot) in BANDS:
        _xl_stage(pad1, rows(X), r0, nr, n, top, bot)
        _xl_stage(pad2, rows(W), r0, nr, n, top, bot)
        _xl_stage(pad4, rows(RP), r0, nr, n, top, bot, border=1.0)
        _xl_stage(pad5, rows(RN), r0, nr, n, top, bot, border=1.0)
        ul_b = ST[X, r0 : r0 + nr, :]
        du_b = ST[W, r0 : r0 + nr, :]
        r_pos = ST[RP, r0 : r0 + nr, :]
        r_neg = ST[RN, r0 : r0 + nr, :]
        fbar = jnp.zeros((nr, n), dtype)
        for d in EDGE_NEIGHBOR_IDS:
            di, dj = OFFSETS[d]
            _xl_stage(pad3, lambda lo, hi: A7_ref[P7IDX[opposite(d)],
                                                  lo:hi, :],
                      r0, nr, n, top, bot)
            Dd = jnp.maximum(
                0.0, jnp.maximum(A7_ref[P7IDX[d], r0 : r0 + nr, :],
                                 pad3[1 + di : 1 + di + nr,
                                      1 + dj : 1 + dj + n]))
            F = (mass_at(d, r0, nr)
                 * (du_b - pad2[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n])
                 + Dd * (ul_b - pad1[1 + di : 1 + di + nr,
                                     1 + dj : 1 + dj + n]))
            lim_p = jnp.minimum(r_pos, pad5[1 + di : 1 + di + nr,
                                            1 + dj : 1 + dj + n])
            lim_n = jnp.minimum(r_neg, pad4[1 + di : 1 + di + nr,
                                            1 + dj : 1 + dj + n])
            fbar = fbar + jnp.where(F > 0.0, lim_p * F,
                                    jnp.where(F < 0.0, lim_n * F, 0.0))
        ST[out_slot, r0 : r0 + nr, :] = ul_b + dt * fbar / ml_diag(r0, nr)



def _fwd_sweep_kernel_xl(
    c_ref, u0_ref, v0_ref, dctC_in, ilamu_in, ilamv_in,
    uout_ref, vout_ref, inv_ref, ahbm_ref,
    ST, A7_ref, C_s, ilu_s, ilv_s, cstg_ref,
    pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters,
    cheb_iters, wts4, bary4, grads, reaction, precond,
):
    """Banded-lean chemotaxis forward step (the >= 1024^2 tier; identical
    math to _fwd_sweep_kernel_lean / helpers.py:1321-1385). See the XL
    section header for the memory model and the ST slot map."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = cstg_ref.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    U, V, X, R, Z, P, B, W, RP, RN = range(10)

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    @pl.when(i == 0)
    def _():
        for src, dst in ((u0_ref, ST.at[U]), (v0_ref, ST.at[V]),
                         (dctC_in, C_s), (ilamu_in, ilu_s),
                         (ilamv_in, ilv_s)):
            cp0 = pltpu.make_async_copy(src, dst, sem_io)
            cp0.start()
            cp0.wait()
        _inv_init(inv_ref)

    cp = pltpu.make_async_copy(c_ref.at[i], cstg_ref, sem_io)
    cp.start()
    cp.wait()

    if precond == "dct":
        pinv_u = _make_dct_pinv(C_s, ilu_s, dtype)
        pinv_v = _make_dct_pinv(C_s, ilv_s, dtype)
    else:
        pinv_u = pinv_v = None

    # ---- v half-step (helpers.py:1339-1342) -----------------------------
    def matv_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0 + dt * delta, dt * Df, r0, nrw)

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    zero = jnp.asarray(0.0, dtype)
    bsq = zero
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        load = _xl_lf_prod([cstg_ref[lo:hi, :], ST[U, lo:hi, :]],
                           ncr=ncr, ncc=n - 1, h2=h2)[d0 : d0 + nr]
        _xl_stage(pad1, rows(V), r0, nr, n, top, bot)
        bb = _xl_apply(mass_at, pad1, r0, nr, n) + (dt * inv_r) * load
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    # warm start x0 = 2 v_n - v_{n-1} from the HBM trajectory (out[i] is
    # x_{i+1}, so x_{n-1} lives in slot i-2; discarded by the select at
    # i <= 1 -- same contract as the lean kernels)
    im2 = jnp.maximum(i - 2, 0)
    cp = pltpu.make_async_copy(vout_ref.at[im2], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[V, :, :] - ST[Z, :, :],
                            ST[V, :, :])

    def matv_diag(r0, nrw):
        return plane(CENTER, 1.0 + dt * delta, dt * Df, r0, nrw)

    _xl_cg(ST, (X, R, Z, P, B), matv_at, pinv_v, matv_diag, bsq, pad1,
           BANDS, nr, n, tol, iters, dtype)
    ST[V, :, :] = ST[X, :, :]  # v_{n+1}

    # ---- u half-step: transport assembly (helpers.py:1350-1352) --------
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        tr = _xl_asm_transport(ST[U, lo:hi, :], ST[V, lo:hi, :], ncr=ncr,
                               ncc=n - 1, chi=chi, eta=eta, wts=wts4,
                               bary=bary4, grads=grads)
        for k7, d in enumerate(P7):
            kp = plane(d, 0.0, Dm, r0, nr)
            t = tr[d]
            A7_ref[k7, r0 : r0 + nr, :] = (kp if t is None
                                           else kp + t[d0 : d0 + nr])

    # b = ML u_n + dt rhs  (rhs = m^2(1-m) IMEX terms for the Mimura
    # reaction, helpers.py of mimura_data_helpers.py:19-109; zero for the
    # plain Keller-Segel system)
    bsq = zero
    for (r0, top, bot) in BANDS:
        ub = ST[U, r0 : r0 + nr, :]
        bb = ml_diag(r0, nr) * ub
        if reaction == "mimura":
            lo = r0 - (0 if top else 1)
            hi = r0 + nr + (0 if bot else 1)
            d0 = 0 if top else 1
            ncr = hi - lo - 1
            ubh = ST[U, lo:hi, :]
            rhs_b = (_xl_lf_prod([ubh, ubh], ncr=ncr, ncc=n - 1, h2=h2)
                     + _xl_lf_prod([ubh, ubh, ubh], ncr=ncr, ncc=n - 1,
                                   h2=h2, scale=-1.0))[d0 : d0 + nr]
            bb = bb + dt * rhs_b
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    # warm start for the low-order solve
    cp = pltpu.make_async_copy(uout_ref.at[im2], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[U, :, :] - ST[Z, :, :],
                            ST[U, :, :])

    if reaction == "mimura":
        def rhs_at(r0, nrw, top, bot):
            lo = r0 - (0 if top else 1)
            hi = r0 + nrw + (0 if bot else 1)
            d0 = 0 if top else 1
            ncr = hi - lo - 1
            ubh = ST[U, lo:hi, :]
            return (_xl_lf_prod([ubh, ubh], ncr=ncr, ncc=n - 1, h2=h2)
                    + _xl_lf_prod([ubh, ubh, ubh], ncr=ncr, ncc=n - 1,
                                  h2=h2, scale=-1.0))[d0 : d0 + nrw]
    else:
        rhs_at = None
    _xl_fct_tail(ST, (X, R, Z, P, B, W, RP, RN), A7_ref, ahbm_ref, save_ref,
                 (pad1, pad2, pad3, pad4, pad5), (sem_io, sem_park),
                 BANDS, nr, n, dt=dt, tol=tol, iters=iters,
                 cheb_iters=cheb_iters, plane=plane, ml_diag=ml_diag,
                 mass_at=mass_at, pinv=pinv_u, bsq=bsq, rhs_at=rhs_at,
                 inv_ref=inv_ref, out_slot=U, dtype=dtype)

    cpu = pltpu.make_async_copy(ST.at[U], uout_ref.at[i], sem_io)
    cpu.start()
    cpu.wait()
    cpv = pltpu.make_async_copy(ST.at[V], vout_ref.at[i], sem_io)
    cpv.start()
    cpv.wait()


def fused_chemotaxis_forward_sweep_xl(
        c_traj, u0, v0, *, h, dt, Dm, Df, delta, chi, eta, rescaling,
        tol=1e-6, iters=60, cheb_iters=20, reaction=None, precond="dct",
        nb=None, vmem_limit_mb=127, quad_degree=4, with_stats=False):
    """Banded-lean (>= 1024^2) chemotaxis forward sweep: ONE pallas_call,
    full-plane state in explicit VMEM slots, banded solver-loop bodies (see
    the XL section header). Mathematically identical to
    fused_chemotaxis_forward_sweep_lean, which tops out near 640^2 f32 on
    real Mosaic (register-allocator spill pools)."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    wts4, bary4, grads = _quad_consts(quad_degree, h)
    wts4 = wts4 * h * h
    kern = functools.partial(
        _fwd_sweep_kernel_xl, n=n, nb=nb, h2=h * h, dt=dt, Dm=Dm, Df=Df,
        delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4,
        grads=grads, reaction=reaction, precond=precond,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    u_traj, v_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
            jax.ShapeDtypeStruct((7, n, n), u0.dtype),
        ),
        in_specs=[hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((10, n, n), u0.dtype),       # ST register file
            pltpu.VMEM((7, n, n), u0.dtype),        # per-step stencil
            pltpu.VMEM((n, n), u0.dtype),           # DCT C
            pltpu.VMEM((n, n), u0.dtype),           # ilam_u
            pltpu.VMEM((n, n), u0.dtype),           # ilam_v
            pltpu.VMEM((n, n), u0.dtype),           # control frame
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),  # band pads
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((7, 8 * nb, n), u0.dtype),   # raw boundary rows
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _xl_asm_adjoint(q_b, u_b, v_b, c_b, *, ncr, ncc, chi, eta, inv_r, wts,
                    bary, grads, h2):
    """Band-patch adjoint transport assembly: the transposed-pairing planes
    -chi*((1-eta u)e^{-eta u} grad v_h . grad phi_TRIAL, phi_TEST) as a dict
    d -> (ncr+1, ncc+1) (None where structurally zero), plus the p-load
    (c_h q_h / r, phi_a) (helpers.py:1499-1505; _assemble_adjoint_A_and_load
    on a rectangular patch)."""
    out = {d: None for d in range(9)}
    for t in range(2):
        corners = TRI_CORNERS[t]
        gvx = sum(_xl_corner(v_b, t, a, ncr, ncc) * grads[t, a, 0]
                  for a in range(3))
        gvy = sum(_xl_corner(v_b, t, a, ncr, ncc) * grads[t, a, 1]
                  for a in range(3))
        Va = [None] * 3
        for q in range(len(wts)):
            uq = (bary[q, 0] * _xl_corner(u_b, t, 0, ncr, ncc)
                  + bary[q, 1] * _xl_corner(u_b, t, 1, ncr, ncc)
                  + bary[q, 2] * _xl_corner(u_b, t, 2, ncr, ncc))
            e = wts[q] * (1.0 - eta * uq) * jnp.exp(-eta * uq)
            for a in range(3):
                Va[a] = (bary[q, a] * e if Va[a] is None
                         else Va[a] + bary[q, a] * e)
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                gb = ((-chi * grads[t, b, 0]) * gvx
                      + (-chi * grads[t, b, 1]) * gvy)
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(gb * Va[a], ((ai, 1 - ai), (aj, 1 - aj)))
                out[d] = placed if out[d] is None else out[d] + placed
    load = _xl_lf_prod([c_b, q_b], ncr=ncr, ncc=ncc, h2=h2, scale=inv_r)
    return out, load


def _xl_q_load(p_b, u_b, *, ncr, ncc, chi, eta, wts, bary, grads):
    """Band-patch q-equation load (chi u_h e^{-eta u_h} grad p_h . grad
    phi_a) (helpers.py:1531-1532; _q_load on a rectangular patch)."""
    load = None
    for t in range(2):
        corners = TRI_CORNERS[t]
        gpx = sum(_xl_corner(p_b, t, a, ncr, ncc) * grads[t, a, 0]
                  for a in range(3))
        gpy = sum(_xl_corner(p_b, t, a, ncr, ncc) * grads[t, a, 1]
                  for a in range(3))
        gsum = None
        for q in range(len(wts)):
            uq = (bary[q, 0] * _xl_corner(u_b, t, 0, ncr, ncc)
                  + bary[q, 1] * _xl_corner(u_b, t, 1, ncr, ncc)
                  + bary[q, 2] * _xl_corner(u_b, t, 2, ncr, ncc))
            g = wts[q] * chi * uq * jnp.exp(-eta * uq)
            gsum = g if gsum is None else gsum + g
        for a, (ai, aj) in enumerate(corners):
            ga = grads[t, a, 0] * gpx + grads[t, a, 1] * gpy
            placed = jnp.pad(gsum * ga, ((ai, 1 - ai), (aj, 1 - aj)))
            load = placed if load is None else load + placed
    return load


def _xl_wm_prod(fields_b, *, ncr, ncc, h2, scale=1.0):
    """Band-patch _wm_prod: 9 stencil plane values (ncr+1, ncc+1) of
    scale * int (prod_k f_k,h) phi_a phi_b dx (None where zero)."""
    k = len(fields_b)
    T = _moments(k + 2) * h2
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                vab = None
                for idx in np.ndindex(*((3,) * k)):
                    w = scale * float(T[idx + (a, b)])
                    p = _xl_corner(fields_b[0], t, idx[0], ncr, ncc)
                    for m in range(1, k):
                        p = p * _xl_corner(fields_b[m], t, idx[m], ncr, ncc)
                    add = w * p
                    vab = add if vab is None else vab + add
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(vab, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = (placed if planes[d] is None
                             else planes[d] + placed)
    return planes


def _adj_sweep_kernel_xl(
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    dctC_in, ilamu_in, ilamv_in,
    pout_ref, qout_ref, inv_ref, ahbm_ref,
    ST, A7_ref, C_s, ilu_s, ilv_s,
    pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, steps, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters,
    cheb_iters, wts5, bary5, wts4, bary4, grads, has_mis, reaction, precond,
):
    """Banded XL chemotaxis adjoint step (identical math to
    _adj_sweep_kernel_lean / helpers.py:1387-1581). ST slot map:
    0 PC p carry | 1 QC q carry | 2 U u_n | 3 V v_n | 4 X | 5 R |
    6 Z (rhat/z/warm) | 7 PK | 8 B (load/b/rdot) | 9 W (phat/du/misfit) |
    10 RP | 11 RN; c_n stages through X (dead until the BiCGStab init)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = C_s.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    ridx = steps - 1 - i
    PC, QC, U, V, X, R, Z, PK, B, W, RP, RN = range(12)

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    @pl.when(i == 0)
    def _():
        for src, dst in ((pT_ref, ST.at[PC]), (qT_ref, ST.at[QC]),
                         (dctC_in, C_s), (ilamu_in, ilu_s),
                         (ilamv_in, ilv_s)):
            cp0 = pltpu.make_async_copy(src, dst, sem_io)
            cp0.start()
            cp0.wait()
        _inv_init(inv_ref)

    for src, dst in ((u_ref, ST.at[U]), (v_ref, ST.at[V]),
                     (c_ref, ST.at[X])):
        cp = pltpu.make_async_copy(src.at[ridx], dst, sem_io)
        cp.start()
        cp.wait()

    if precond == "dct":
        pinv_p = _make_dct_pinv(C_s, ilu_s, dtype)
        pinv_q = _make_dct_pinv(C_s, ilv_s, dtype)
    else:
        pinv_p = pinv_q = None

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    # pass 1: Mat_p assembly -> A7 (reads v_n; v_n is DEAD afterwards, so
    # its slot is reused for the rhs, which the tail's rdot stage re-reads)
    if has_mis:
        cp = pltpu.make_async_copy(misu_ref.at[ridx], ST.at[W], sem_io)
        cp.start()
        cp.wait()
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        tr, _ = _xl_asm_adjoint(
            ST[QC, lo:hi, :], ST[U, lo:hi, :], ST[V, lo:hi, :],
            ST[X, lo:hi, :], ncr=ncr, ncc=n - 1, chi=chi, eta=eta,
            inv_r=inv_r, wts=wts5, bary=bary5, grads=grads, h2=h2)
        for k7, d in enumerate(P7):
            kp = plane(d, 0.0, Dm, r0, nr)
            t = tr[d]
            A7_ref[k7, r0 : r0 + nr, :] = (kp if t is None
                                           else kp + t[d0 : d0 + nr])

    # pass 2: rhs = (c q_np1 / r, phi) + mis_u -> the (freed) V slot
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        rhs_b = _xl_lf_prod([ST[X, lo:hi, :], ST[QC, lo:hi, :]], ncr=ncr,
                            ncc=n - 1, h2=h2, scale=inv_r)[d0 : d0 + nr]
        if has_mis:
            rhs_b = rhs_b + ST[W, r0 : r0 + nr, :]
        ST[V, r0 : r0 + nr, :] = rhs_b

    def rhs_at(r0, nrw, top, bot):
        return ST[V, r0 : r0 + nrw, :]

    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        bb = (ml_diag(r0, nr) * ST[PC, r0 : r0 + nr, :]
              + dt * ST[V, r0 : r0 + nr, :])
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    if reaction == "mimura":
        # per-band S planes memoized at trace time (one _xl_wm_prod pair
        # per band, not per plane)
        _s_cache = {}

        def S_at(d, r0, nrw):
            if r0 not in _s_cache:
                top = r0 == 0
                bot = r0 + nrw == n
                lo = r0 - (0 if top else 1)
                hi = r0 + nrw + (0 if bot else 1)
                d0 = 0 if top else 1
                ncr = hi - lo - 1
                ub = ST[U, lo:hi, :]
                s1 = _xl_wm_prod([ub], ncr=ncr, ncc=n - 1, h2=h2,
                                 scale=-2.0)
                s2 = _xl_wm_prod([ub, ub], ncr=ncr, ncc=n - 1, h2=h2,
                                 scale=3.0)
                planes = []
                for dd in range(9):
                    if s1[dd] is None and s2[dd] is None:
                        planes.append(None)
                        continue
                    v = s1[dd] if s1[dd] is not None else 0.0
                    if s2[dd] is not None:
                        v = v + s2[dd]
                    planes.append(v[d0 : d0 + nrw])
                _s_cache[r0] = planes
            return _s_cache[r0][d]
    else:
        S_at = None

    ST[X, :, :] = ST[PC, :, :]  # x0 = p_{n+1} (c_n staged there is dead)
    _xl_fct_tail(ST, (X, R, Z, PK, B, W, RP, RN), A7_ref, ahbm_ref,
                 save_ref, (pad1, pad2, pad3, pad4, pad5),
                 (sem_io, sem_park), BANDS, nr, n, dt=dt, tol=tol,
                 iters=iters, cheb_iters=cheb_iters, plane=plane,
                 ml_diag=ml_diag, mass_at=mass_at, pinv=pinv_p, bsq=bsq,
                 rhs_at=rhs_at, S_at=S_at, inv_ref=inv_ref, out_slot=PC,
                 dtype=dtype)
    # p_n now in ST[PC]

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    if has_mis:
        cp = pltpu.make_async_copy(misv_ref.at[ridx], ST.at[W], sem_io)
        cp.start()
        cp.wait()

    def matq_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0 + dt * delta, dt * Df, r0, nrw)

    def matq_diag(r0, nrw):
        return plane(CENTER, 1.0 + dt * delta, dt * Df, r0, nrw)

    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        qload = _xl_q_load(ST[PC, lo:hi, :], ST[U, lo:hi, :], ncr=ncr,
                           ncc=n - 1, chi=chi, eta=eta, wts=wts4,
                           bary=bary4, grads=grads)[d0 : d0 + nr]
        if has_mis:
            qload = qload + ST[W, r0 : r0 + nr, :]
        _xl_stage(pad1, rows(QC), r0, nr, n, top, bot)
        bb = _xl_apply(mass_at, pad1, r0, nr, n) + dt * qload
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)
    ST[X, :, :] = ST[QC, :, :]  # x0 = q_{n+1}
    _xl_cg(ST, (X, R, Z, PK, B), matq_at, pinv_q, matq_diag, bsq, pad1,
           BANDS, nr, n, tol, iters, dtype)
    ST[QC, :, :] = ST[X, :, :]

    cpp = pltpu.make_async_copy(ST.at[PC], pout_ref.at[ridx], sem_io)
    cpp.start()
    cpp.wait()
    cpq = pltpu.make_async_copy(ST.at[QC], qout_ref.at[ridx], sem_io)
    cpq.start()
    cpq.wait()


def fused_chemotaxis_adjoint_sweep_xl(
        u_traj, v_traj, c_traj, pT, qT, mis_u=None, mis_v=None, *, h, dt,
        Dm, Df, delta, chi, eta, rescaling, tol=1e-6, iters=60,
        cheb_iters=20, reaction=None, precond="dct", nb=None,
        vmem_limit_mb=127, with_stats=False):
    """Banded XL chemotaxis adjoint sweep (the >= 1024^2 tier; same
    contract as fused_chemotaxis_adjoint_sweep_lean)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    wts5, bary5, grads = _quad_consts(5, h)
    wts5 = wts5 * h * h
    wts4, bary4, _ = _quad_consts(4, h)
    wts4 = wts4 * h * h
    has_mis = mis_u is not None
    kern = functools.partial(
        _adj_sweep_kernel_xl, n=n, nb=nb, steps=steps, h2=h * h, dt=dt,
        Dm=Dm, Df=Df, delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling,
        tol=tol, iters=iters, cheb_iters=cheb_iters, wts5=wts5, bary5=bary5,
        wts4=wts4, bary4=bary4, grads=grads, has_mis=has_mis,
        reaction=reaction, precond=precond,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype, [(Dm, 1.0), (Df, 1.0 + dt * delta)])
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
    p_traj, q_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
            jax.ShapeDtypeStruct((7, n, n), pT.dtype),
        ),
        in_specs=[hbm] * 10,
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((12, n, n), pT.dtype),       # ST register file
            pltpu.VMEM((7, n, n), pT.dtype),        # per-step stencil
            pltpu.VMEM((n, n), pT.dtype),           # DCT C
            pltpu.VMEM((n, n), pT.dtype),           # ilam_p
            pltpu.VMEM((n, n), pT.dtype),           # ilam_q
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),  # band pads
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((7, 8 * nb, n), pT.dtype),   # raw boundary rows
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], c_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _xl_conv_planes(wind_fn, t, *, ncr, ncc, row0, h, a1, pts, wts, bary,
                    grads, dtype, transpose=False):
    """Band-patch _conv_planes_td: convection stencil planes
    d -> (ncr+1, ncc+1) (None where zero) of int (w(x,t).grad phi) phi dx,
    with the quadrature-point coordinates synthesized from iota OFFSET by
    the patch's first global cell row ``row0``."""
    planes = [None] * 9
    ci = (jax.lax.broadcasted_iota(jnp.int32, (ncr, ncc), 0)
          + row0).astype(dtype)
    cj = jax.lax.broadcasted_iota(jnp.int32, (ncr, ncc), 1).astype(dtype)
    x0 = a1 + h * cj
    y0 = a1 + h * ci
    detJ = h * h
    for ttype in range(2):
        corners = TRI_CORNERS[ttype]
        acc = [[None] * 3 for _ in range(3)]
        for q in range(len(wts)):
            xi, eta = float(pts[q, 0]), float(pts[q, 1])
            if ttype == 0:
                xq = x0 + h * (xi + eta)
                yq = y0 + h * eta
            else:
                xq = x0 + h * eta
                yq = y0 + h * (xi + eta)
            wx, wy = wind_fn(xq, yq, t)
            for gside in range(3):
                ga = (grads[ttype, gside, 0] * wx
                      + grads[ttype, gside, 1] * wy)
                wga = (detJ * float(wts[q])) * ga
                for bside in range(3):
                    add = float(bary[q, bside]) * wga
                    acc[gside][bside] = (
                        add if acc[gside][bside] is None
                        else acc[gside][bside] + add)
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                val = acc[b][a] if transpose else acc[a][b]
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(val, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = (placed if planes[d] is None
                             else planes[d] + placed)
    return planes


def _schnak_fwd_kernel_xl(
    c_ref, u0_ref, v0_ref, dctC_in, ilamu_in, ilamv_in,
    uout_ref, vout_ref, inv_ref, ahbm_ref,
    ST, A7_ref, C_s, ilu_s, ilv_s, cstg_ref,
    pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, c_b, inv_r,
    tol, iters, cheb_iters, precond, wind_fn, pts, wts, bary, grads,
):
    """Banded XL Schnakenberg forward step (identical math to
    _schnak_fwd_kernel_lean / helpers.py:562-596; same memory model and
    slot map as _fwd_sweep_kernel_xl)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = cstg_ref.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    U, V, X, R, Z, P, B, W, RP, RN = range(10)
    t0 = jnp.asarray(0.0, dtype)  # stationary wind: t unused

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    @pl.when(i == 0)
    def _():
        for src, dst in ((u0_ref, ST.at[U]), (v0_ref, ST.at[V]),
                         (dctC_in, C_s), (ilamu_in, ilu_s),
                         (ilamv_in, ilv_s)):
            cp0 = pltpu.make_async_copy(src, dst, sem_io)
            cp0.start()
            cp0.wait()
        _inv_init(inv_ref)

    cp = pltpu.make_async_copy(c_ref.at[i], cstg_ref, sem_io)
    cp.start()
    cp.wait()

    if precond == "dct":
        pinv_u = _make_dct_pinv(C_s, ilu_s, dtype)
        pinv_v = _make_dct_pinv(C_s, ilv_s, dtype)
    else:
        pinv_u = pinv_v = None

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    # ---- u FCT (helpers.py:581-588): A_u = Du K - omega1 N --------------
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        N = _xl_conv_planes(wind_fn, t0, ncr=ncr, ncc=n - 1, row0=lo, h=h,
                            a1=a1, pts=pts, wts=wts, bary=bary, grads=grads,
                            dtype=dtype)
        for k7, d in enumerate(P7):
            p_ = Du * plane(d, 0.0, 1.0, r0, nr)
            if N[d] is not None:
                p_ = p_ - omega1 * N[d][d0 : d0 + nr]
            A7_ref[k7, r0 : r0 + nr, :] = p_

    def rhs_at(r0, nrw, top, bot):
        lo = r0 - (0 if top else 1)
        hi = r0 + nrw + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        _xl_stage(pad2, lambda lo2, hi2: cstg_ref[lo2:hi2, :], r0, nrw, n,
                  top, bot)
        mc = _xl_apply(mass_at, pad2, r0, nrw, n)
        return ((gamma * inv_r) * mc
                + _xl_lf_prod([ST[U, lo:hi, :], ST[U, lo:hi, :],
                               ST[V, lo:hi, :]], ncr=ncr, ncc=n - 1,
                              h2=h2, scale=gamma)[d0 : d0 + nrw])

    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        bb = (ml_diag(r0, nr) * ST[U, r0 : r0 + nr, :]
              + dt * rhs_at(r0, nr, top, bot))
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    im2 = jnp.maximum(i - 2, 0)
    cp = pltpu.make_async_copy(uout_ref.at[im2], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[U, :, :] - ST[Z, :, :],
                            ST[U, :, :])

    def S_at(d, r0, nrw):
        # non-flux gamma*M (helpers.py:587): stationary synthesized planes
        if d in ANTI_DIAGONAL_IDS:
            return None
        return gamma * plane(d, 1.0, 0.0, r0, nrw)

    _xl_fct_tail(ST, (X, R, Z, P, B, W, RP, RN), A7_ref, ahbm_ref, save_ref,
                 (pad1, pad2, pad3, pad4, pad5), (sem_io, sem_park),
                 BANDS, nr, n, dt=dt, tol=tol, iters=iters,
                 cheb_iters=cheb_iters, plane=plane, ml_diag=ml_diag,
                 mass_at=mass_at, pinv=pinv_u, bsq=bsq, rhs_at=rhs_at,
                 S_at=S_at, inv_ref=inv_ref, out_slot=U, dtype=dtype)
    # u_{n+1} now in ST[U]; v_n still in ST[V]

    # ---- v implicit with the NEW u (helpers.py:590-596) -----------------
    def matv_at_band(r0, top, bot):
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        N2 = _xl_conv_planes(wind_fn, t0, ncr=ncr, ncc=n - 1, row0=lo, h=h,
                             a1=a1, pts=pts, wts=wts, bary=bary,
                             grads=grads, dtype=dtype)
        ub = ST[U, lo:hi, :]
        Mu2 = _xl_wm_prod([ub, ub], ncr=ncr, ncc=n - 1, h2=h2)
        out = []
        for d in range(9):
            if d in _ZERO_PLANES:
                out.append(None)
                continue
            p_ = plane(d, 1.0, dt * Dv, r0, nr)
            if N2[d] is not None:
                p_ = p_ - (dt * omega2) * N2[d][d0 : d0 + nr]
            if Mu2[d] is not None:
                p_ = p_ + (dt * gamma) * Mu2[d][d0 : d0 + nr]
            out.append(p_)
        return out

    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        # Mat_v into A7 (the Low matrix is dead)
        mv = matv_at_band(r0, top, bot)
        for k7, d in enumerate(P7):
            A7_ref[k7, r0 : r0 + nr, :] = mv[d]
        _xl_stage(pad1, rows(V), r0, nr, n, top, bot)
        bb = (_xl_apply(mass_at, pad1, r0, nr, n)
              + (dt * gamma * c_b) * ml_diag(r0, nr))
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    cp = pltpu.make_async_copy(vout_ref.at[im2], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[V, :, :] - ST[Z, :, :],
                            ST[V, :, :])

    def matv_at(d, r0, nrw):
        if d in _ZERO_PLANES:
            return None
        return A7_ref[P7IDX[d], r0 : r0 + nrw, :]

    def matv_diag(r0, nrw):
        return A7_ref[P7IDX[CENTER], r0 : r0 + nrw, :]

    _xl_cg(ST, (X, R, Z, P, B), matv_at, pinv_v, matv_diag, bsq, pad1,
           BANDS, nr, n, tol, iters, dtype)
    ST[V, :, :] = ST[X, :, :]

    cpu_ = pltpu.make_async_copy(ST.at[U], uout_ref.at[i], sem_io)
    cpu_.start()
    cpu_.wait()
    cpv_ = pltpu.make_async_copy(ST.at[V], vout_ref.at[i], sem_io)
    cpv_.start()
    cpv_.wait()


def fused_schnak_forward_sweep_xl(
        c_traj, u0, v0, *, h, a1, dt, Du, Dv, omega1, omega2, gamma, c_b,
        rescaling, wind_fn, tol=1e-6, iters=60, cheb_iters=20,
        precond="dct", conv_degree=5, nb=None, vmem_limit_mb=127,
        with_stats=False):
    """Banded XL Schnakenberg forward sweep (same contract as
    fused_schnak_forward_sweep_lean)."""
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_fwd_kernel_xl, n=n, nb=nb, h=h, a1=a1, h2=h * h, dt=dt,
        Du=Du, Dv=Dv, omega1=omega1, omega2=omega2, gamma=gamma, c_b=c_b,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        precond=precond, wind_fn=wfn3, pts=pts, wts=wts, bary=bary,
        grads=grads,
    )
    dct_C, ilam_u, ilam_v = _dct_inputs(
        n, h, dt, u0.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    u_traj, v_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            jax.ShapeDtypeStruct((steps, n, n), u0.dtype),
            _inv_shape(u0.dtype),
            jax.ShapeDtypeStruct((7, n, n), u0.dtype),
        ),
        in_specs=[hbm, hbm, hbm, hbm, hbm, hbm],
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((10, n, n), u0.dtype),
            pltpu.VMEM((7, n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((n, n), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((nr + 2, n + 2), u0.dtype),
            pltpu.VMEM((7, 8 * nb, n), u0.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, dct_C, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _schnak_adj_kernel_xl(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    dctC_in, ilamu_in, ilamv_in,
    pout_ref, qout_ref, inv_ref, ahbm_ref,
    ST, A7_ref, C_s, ilu_s, ilv_s,
    pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, steps, h, a1, h2, dt, Du, Dv, omega1, omega2, gamma, tol,
    iters, cheb_iters, has_mis, precond, wind_fn, pts, wts, bary, grads,
):
    """Banded XL Schnakenberg adjoint step (identical math to
    _schnak_adj_kernel_lean / helpers.py:599-698). Slot map as
    _adj_sweep_kernel_xl; the du/dt-stage rhs is re-derived from the
    preserved b as (b - ML p_np1)/dt instead of a dedicated slot."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = C_s.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    ridx = steps - 1 - i
    PC, QC, U, V, X, R, Z, PK, B, W, RP, RN = range(12)
    t0 = jnp.asarray(0.0, dtype)

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    @pl.when(i == 0)
    def _():
        for src, dst in ((pT_ref, ST.at[PC]), (qT_ref, ST.at[QC]),
                         (dctC_in, C_s), (ilamu_in, ilu_s),
                         (ilamv_in, ilv_s)):
            cp0 = pltpu.make_async_copy(src, dst, sem_io)
            cp0.start()
            cp0.wait()
        _inv_init(inv_ref)

    for src, dst in ((u_ref, ST.at[U]), (v_ref, ST.at[V])):
        cp = pltpu.make_async_copy(src.at[ridx], dst, sem_io)
        cp.start()
        cp.wait()

    if precond == "dct":
        pinv_p = _make_dct_pinv(C_s, ilu_s, dtype)
        pinv_q = _make_dct_pinv(C_s, ilv_s, dtype)
    else:
        pinv_p = pinv_q = None

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    # ---- q implicit first (helpers.py:680-688) --------------------------
    if has_mis:
        cp = pltpu.make_async_copy(misv_ref.at[ridx], ST.at[W], sem_io)
        cp.start()
        cp.wait()
    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        rhs_q = _xl_lf_prod(
            [ST[PC, lo:hi, :], ST[U, lo:hi, :], ST[U, lo:hi, :]],
            ncr=ncr, ncc=n - 1, h2=h2, scale=gamma)[d0 : d0 + nr]
        if has_mis:
            rhs_q = rhs_q + ST[W, r0 : r0 + nr, :]
        Nt = _xl_conv_planes(wind_fn, t0, ncr=ncr, ncc=n - 1, row0=lo, h=h,
                             a1=a1, pts=pts, wts=wts, bary=bary,
                             grads=grads, dtype=dtype, transpose=True)
        ub = ST[U, lo:hi, :]
        Mu2 = _xl_wm_prod([ub, ub], ncr=ncr, ncc=n - 1, h2=h2)
        for k7, d in enumerate(P7):
            p_ = plane(d, 1.0, dt * Dv, r0, nr)
            if Nt[d] is not None:
                p_ = p_ - (dt * omega2) * Nt[d][d0 : d0 + nr]
            if Mu2[d] is not None:
                p_ = p_ + (dt * gamma) * Mu2[d][d0 : d0 + nr]
            A7_ref[k7, r0 : r0 + nr, :] = p_
        _xl_stage(pad1, rows(QC), r0, nr, n, top, bot)
        bb = _xl_apply(mass_at, pad1, r0, nr, n) + dt * rhs_q
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    def matq_at(d, r0, nrw):
        if d in _ZERO_PLANES:
            return None
        return A7_ref[P7IDX[d], r0 : r0 + nrw, :]

    def matq_diag(r0, nrw):
        return A7_ref[P7IDX[CENTER], r0 : r0 + nrw, :]

    ST[X, :, :] = ST[QC, :, :]
    _xl_cg(ST, (X, R, Z, PK, B), matq_at, pinv_q, matq_diag, bsq, pad1,
           BANDS, nr, n, tol, iters, dtype)
    ST[QC, :, :] = ST[X, :, :]  # q_n

    # ---- p FCT (helpers.py:690-697): A = Du K - omega1 N^T,
    # S = gamma M - 2 gamma M_uv -----------------------------------------
    if has_mis:
        cp = pltpu.make_async_copy(misu_ref.at[ridx], ST.at[W], sem_io)
        cp.start()
        cp.wait()
    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        rhs_p = _xl_lf_prod(
            [ST[U, lo:hi, :], ST[V, lo:hi, :], ST[QC, lo:hi, :]],
            ncr=ncr, ncc=n - 1, h2=h2, scale=-2.0 * gamma)[d0 : d0 + nr]
        if has_mis:
            rhs_p = rhs_p + ST[W, r0 : r0 + nr, :]
        Nt2 = _xl_conv_planes(wind_fn, t0, ncr=ncr, ncc=n - 1, row0=lo, h=h,
                              a1=a1, pts=pts, wts=wts, bary=bary,
                              grads=grads, dtype=dtype, transpose=True)
        for k7, d in enumerate(P7):
            p_ = Du * plane(d, 0.0, 1.0, r0, nr)
            if Nt2[d] is not None:
                p_ = p_ - omega1 * Nt2[d][d0 : d0 + nr]
            A7_ref[k7, r0 : r0 + nr, :] = p_
        bb = ml_diag(r0, nr) * ST[PC, r0 : r0 + nr, :] + dt * rhs_p
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    def rhs_at(r0, nrw, top, bot):
        # b is preserved through the BiCGStab (read-only slot): re-derive
        # rhs = (b - ML p_np1)/dt; PC still holds p_np1 (out_slot writes
        # only at the very end of the tail)
        return ((ST[B, r0 : r0 + nrw, :]
                 - ml_diag(r0, nrw) * ST[PC, r0 : r0 + nrw, :]) / dt)

    _s_cache = {}

    def S_at(d, r0, nrw):
        if r0 not in _s_cache:
            top = r0 == 0
            bot = r0 + nrw == n
            lo = r0 - (0 if top else 1)
            hi = r0 + nrw + (0 if bot else 1)
            d0 = 0 if top else 1
            ncr = hi - lo - 1
            Muv = _xl_wm_prod([ST[U, lo:hi, :], ST[V, lo:hi, :]], ncr=ncr,
                              ncc=n - 1, h2=h2)
            planes = []
            for dd in range(9):
                if dd in ANTI_DIAGONAL_IDS:
                    planes.append(None)
                    continue
                p_ = gamma * plane(dd, 1.0, 0.0, r0, nrw)
                if Muv[dd] is not None:
                    p_ = p_ - (2.0 * gamma) * Muv[dd][d0 : d0 + nrw]
                planes.append(p_)
            _s_cache[r0] = planes
        return _s_cache[r0][d]

    ST[X, :, :] = ST[PC, :, :]  # x0 = p_{n+1}
    _xl_fct_tail(ST, (X, R, Z, PK, B, W, RP, RN), A7_ref, ahbm_ref,
                 save_ref, (pad1, pad2, pad3, pad4, pad5),
                 (sem_io, sem_park), BANDS, nr, n, dt=dt, tol=tol,
                 iters=iters, cheb_iters=cheb_iters, plane=plane,
                 ml_diag=ml_diag, mass_at=mass_at, pinv=pinv_p, bsq=bsq,
                 rhs_at=rhs_at, S_at=S_at, inv_ref=inv_ref, out_slot=PC,
                 dtype=dtype)

    cpp = pltpu.make_async_copy(ST.at[PC], pout_ref.at[ridx], sem_io)
    cpp.start()
    cpp.wait()
    cpq = pltpu.make_async_copy(ST.at[QC], qout_ref.at[ridx], sem_io)
    cpq.start()
    cpq.wait()


def fused_schnak_adjoint_sweep_xl(
        u_traj, v_traj, pT, qT, mis_u=None, mis_v=None, *, h, a1, dt, Du,
        Dv, omega1, omega2, gamma, wind_fn, tol=1e-6, iters=60,
        cheb_iters=20, precond="dct", conv_degree=5, nb=None,
        vmem_limit_mb=127, with_stats=False):
    """Banded XL Schnakenberg adjoint sweep (same contract as
    fused_schnak_adjoint_sweep_lean)."""
    n = pT.shape[-1]
    steps = u_traj.shape[0] - 1
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    pts, wts = rule_for_degree(conv_degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    has_mis = mis_u is not None
    wfn3 = lambda x, y, t: wind_fn(x, y)
    kern = functools.partial(
        _schnak_adj_kernel_xl, n=n, nb=nb, steps=steps, h=h, a1=a1,
        h2=h * h, dt=dt, Du=Du, Dv=Dv, omega1=omega1, omega2=omega2,
        gamma=gamma, tol=tol, iters=iters, cheb_iters=cheb_iters,
        has_mis=has_mis, precond=precond, wind_fn=wfn3, pts=pts,
        wts=wts, bary=bary, grads=grads,
    )
    dct_C, ilam_p, ilam_q = _dct_inputs(
        n, h, dt, pT.dtype,
        [(Du, 1.0 + dt * gamma), (Dv, 1.0 + dt * gamma)])
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
    p_traj, q_traj, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            jax.ShapeDtypeStruct((steps, n, n), pT.dtype),
            _inv_shape(pT.dtype),
            jax.ShapeDtypeStruct((7, n, n), pT.dtype),
        ),
        in_specs=[hbm] * 9,
        out_specs=(hbm, hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((12, n, n), pT.dtype),
            pltpu.VMEM((7, n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((n, n), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((nr + 2, n + 2), pT.dtype),
            pltpu.VMEM((7, 8 * nb, n), pT.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT, qT,
      dct_C, ilam_p, ilam_q)
    out = (jnp.concatenate([p_traj, pT[None]], axis=0),
           jnp.concatenate([q_traj, qT[None]], axis=0))
    return out + (jnp.min(inv),) if with_stats else out


def _scalar_sweep_kernel_xl(
    load_ref, x0_ref, A7h_ref,
    out_ref, inv_ref,
    ST, A7_ref, pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, steps, dt, tol, iters, cheb_iters, h2,
    nonflux_mode, load_is_mass, reverse, reaction,
):
    """Banded XL single-field FCT step (linear advection / nonlinear state
    and adjoint; identical math to _scalar_sweep_kernel_lean). The
    stationary flux matrix stays canonical in the A7h HBM input
    (park_out=False); the du/dt-stage rhs is re-derived as
    (b - ML x_n)/dt. Slot map: 0 U x carry (then x_{n+1}) | 1 V load
    frame | 2..9 as _fwd_sweep_kernel_xl; the adjoint's u-for-S frame
    stages through RP (consumed by the banded Low transform, which runs
    before BiCGStab claims the slot)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = x0_ref.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    U, V, X, R, Z, P, B, W, RP, RN = range(10)
    F = load_ref.shape[1]

    def rows(slot):
        return lambda lo, hi: ST[slot, lo:hi, :]

    @pl.when(i == 0)
    def _():
        cp0 = pltpu.make_async_copy(x0_ref, ST.at[U], sem_io)
        cp0.start()
        cp0.wait()
        _inv_init(inv_ref)

    idx = steps - 1 - i if reverse else i
    cp = pltpu.make_async_copy(load_ref.at[idx, 0], ST.at[V], sem_io)
    cp.start()
    cp.wait()
    if reaction:
        cp = pltpu.make_async_copy(load_ref.at[idx, F - 1], ST.at[W],
                                   sem_io)
        cp.start()
        cp.wait()
    if nonflux_mode < 0:
        cp = pltpu.make_async_copy(load_ref.at[idx, 1], ST.at[RP], sem_io)
        cp.start()
        cp.wait()

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    # b = ML x_n + dt rhs  (rhs = M load | raw load, minus the reaction
    # coupling); the rdot-stage rhs is re-derived from the preserved b
    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        if load_is_mass:
            _xl_stage(pad1, rows(V), r0, nr, n, top, bot)
            rhs_b = _xl_apply(mass_at, pad1, r0, nr, n)
        else:
            rhs_b = ST[V, r0 : r0 + nr, :]
        if reaction:
            lo = r0 - (0 if top else 1)
            hi = r0 + nr + (0 if bot else 1)
            d0 = 0 if top else 1
            ncr = hi - lo - 1
            rhs_b = rhs_b - _xl_lf_prod(
                [ST[W, lo:hi, :], ST[U, lo:hi, :]], ncr=ncr, ncc=n - 1,
                h2=h2)[d0 : d0 + nr]
        bb = ml_diag(r0, nr) * ST[U, r0 : r0 + nr, :] + dt * rhs_b
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    def rhs_at(r0, nrw, top, bot):
        return ((ST[B, r0 : r0 + nrw, :]
                 - ml_diag(r0, nrw) * ST[U, r0 : r0 + nrw, :]) / dt)

    if nonflux_mode == 0:
        S_at = None
    else:
        s_slot = U if nonflux_mode > 0 else RP
        s_scale = (1.0 / 3.0) if nonflux_mode > 0 else 1.0
        _s_cache = {}

        def S_at(d, r0, nrw):
            # S = -M + scale*M_{u^2}, memoized per band at trace time
            if r0 not in _s_cache:
                top = r0 == 0
                bot = r0 + nrw == n
                lo = r0 - (0 if top else 1)
                hi = r0 + nrw + (0 if bot else 1)
                d0 = 0 if top else 1
                ncr = hi - lo - 1
                ub = ST[s_slot, lo:hi, :]
                Mu2 = _xl_wm_prod([ub, ub], ncr=ncr, ncc=n - 1, h2=h2,
                                  scale=s_scale)
                planes = []
                for dd in range(9):
                    if dd in ANTI_DIAGONAL_IDS:
                        planes.append(None)
                        continue
                    p_ = -plane(dd, 1.0, 0.0, r0, nrw)
                    if Mu2[dd] is not None:
                        p_ = p_ + Mu2[dd][d0 : d0 + nrw]
                    planes.append(p_)
                _s_cache[r0] = planes
            return _s_cache[r0][d]

    # warm start from the trajectory output two slots over (out[i] is
    # x_{i+1}; idx+2 in reverse sweeps — see the lean kernels)
    prev_slot = jnp.clip(idx + 2 if reverse else idx - 2, 0, steps - 1)
    cp = pltpu.make_async_copy(out_ref.at[prev_slot], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[U, :, :] - ST[Z, :, :],
                            ST[U, :, :])

    # raw A into the working buffer (canonical copy stays in HBM)
    cp = pltpu.make_async_copy(A7h_ref, A7_ref, sem_park)
    cp.start()
    cp.wait()

    _xl_fct_tail(ST, (X, R, Z, P, B, W, RP, RN), A7_ref, A7h_ref, save_ref,
                 (pad1, pad2, pad3, pad4, pad5), (sem_io, sem_park),
                 BANDS, nr, n, dt=dt, tol=tol, iters=iters,
                 cheb_iters=cheb_iters, plane=plane, ml_diag=ml_diag,
                 mass_at=mass_at, pinv=None, bsq=bsq, rhs_at=rhs_at,
                 S_at=S_at, inv_ref=inv_ref, out_slot=U, dtype=dtype,
                 park_out=False)

    cp = pltpu.make_async_copy(ST.at[U], out_ref.at[idx], sem_io)
    cp.start()
    cp.wait()


def fused_scalar_fct_sweep_xl(load_traj, x0, A_flux, M, M_diag, ML_diag, *,
                              h, dt, tol=1e-6, iters=60, cheb_iters=20,
                              warm=True, nonflux_mode=0, load_is_mass=True,
                              reverse=False, reaction=False, nb=None,
                              vmem_limit_mb=127, with_stats=False):
    """Banded XL variant of fused_scalar_fct_sweep (same contract as
    fused_scalar_fct_sweep_lean; the M/M_diag/ML_diag arguments are
    accepted for signature compatibility but synthesized in-kernel)."""
    n = x0.shape[-1]
    steps = load_traj.shape[0]
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    A7c = A_flux[jnp.asarray(P7)]
    kern = functools.partial(
        _scalar_sweep_kernel_xl, n=n, nb=nb, steps=steps, dt=dt, tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h * h,
        nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
        reverse=reverse, reaction=reaction,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    out, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype)),
        in_specs=[hbm, hbm, hbm],
        out_specs=(hbm, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((10, n, n), x0.dtype),
            pltpu.VMEM((7, n, n), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((7, 8 * nb, n), x0.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(load_traj, x0, A7c)
    return (out, jnp.min(inv)) if with_stats else out


def _xl_drift_planes(c_b, *, ncr, ncc, h2, m, grads):
    """Band-patch _drift_planes: Adrift1 + Adrift2 planes
    d -> (ncr+1, ncc+1) for the control patch ``c_b``
    (advection_solidbody_FCT_PDECO_finaltime.py:187-188)."""
    T2 = _moments(2)
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        cc = [_xl_corner(c_b, t, a, ncr, ncc) for a in range(3)]
        gcx = sum(cc[a] * grads[t][a][0] for a in range(3))
        gcy = sum(cc[a] * grads[t][a][1] for a in range(3))
        mg = m[0] * gcx + m[1] * gcy
        Sb = [
            sum(cc[cid] * float(T2[cid, b]) for cid in range(3))
            for b in range(3)
        ]
        for a, (ai, aj) in enumerate(corners):
            gam = m[0] * grads[t][a][0] + m[1] * grads[t][a][1]
            for b, (bi, bj) in enumerate(corners):
                E = h2 * (float(T2[a, b]) * mg + gam * Sb[b])
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(E, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = (placed if planes[d] is None
                             else planes[d] + placed)
    return planes


def _drift_sweep_kernel_xl(
    frames_ref, x0_ref, Abase7_ref,
    out_ref, inv_ref, ahbm_ref,
    ST, A7_ref, pad1, pad2, pad3, pad4, pad5, save_ref, sem_io, sem_park,
    *, n, nb, steps, dt, sign, m, tol, iters, cheb_iters, h2, has_mis,
    grads, reverse,
):
    """Banded XL drift-control FCT step (identical math to
    _drift_sweep_kernel_lean): stationary eps*K -/+ N_rot fetched from the
    HBM input, per-step Adrift(c_i) assembled on top per band, then the
    shared XL tail (the per-step raw A IS parked to the HBM output).
    Slot map as _scalar_sweep_kernel_xl (c_i stages through V, the
    misfit load through W and into b; rhs re-derived from b)."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    dtype = x0_ref.dtype
    BANDS, nr = _bands_of(n, nb)
    plane, ml_diag = _make_synth_xl(n, dtype, h2)
    i = pl.program_id(0)
    U, V, X, R, Z, P, B, W, RP, RN = range(10)
    F = frames_ref.shape[1]

    @pl.when(i == 0)
    def _():
        cp0 = pltpu.make_async_copy(x0_ref, ST.at[U], sem_io)
        cp0.start()
        cp0.wait()
        _inv_init(inv_ref)

    idx = steps - 1 - i if reverse else i
    cp = pltpu.make_async_copy(frames_ref.at[idx, 0], ST.at[V], sem_io)
    cp.start()
    cp.wait()
    if has_mis:
        cp = pltpu.make_async_copy(frames_ref.at[idx, F - 1], ST.at[W],
                                   sem_io)
        cp.start()
        cp.wait()

    cp = pltpu.make_async_copy(Abase7_ref, A7_ref, sem_park)
    cp.start()
    cp.wait()

    def mass_at(d, r0, nrw):
        if d in ANTI_DIAGONAL_IDS:
            return None
        return plane(d, 1.0, 0.0, r0, nrw)

    bsq = jnp.asarray(0.0, dtype)
    for (r0, top, bot) in BANDS:
        lo = r0 - (0 if top else 1)
        hi = r0 + nr + (0 if bot else 1)
        d0 = 0 if top else 1
        ncr = hi - lo - 1
        Adp = _xl_drift_planes(ST[V, lo:hi, :], ncr=ncr, ncc=n - 1, h2=h2,
                               m=m, grads=grads)
        for k7, d in enumerate(P7):
            if Adp[d] is not None:
                A7_ref[k7, r0 : r0 + nr, :] = (
                    A7_ref[k7, r0 : r0 + nr, :]
                    + sign * Adp[d][d0 : d0 + nr])
        rhs_b = (ST[W, r0 : r0 + nr, :] if has_mis
                 else jnp.zeros((nr, n), dtype))
        bb = ml_diag(r0, nr) * ST[U, r0 : r0 + nr, :] + dt * rhs_b
        ST[B, r0 : r0 + nr, :] = bb
        bsq = bsq + jnp.sum(bb * bb)

    def rhs_at(r0, nrw, top, bot):
        return ((ST[B, r0 : r0 + nrw, :]
                 - ml_diag(r0, nrw) * ST[U, r0 : r0 + nrw, :]) / dt)

    prev_slot = jnp.clip(idx + 2 if reverse else idx - 2, 0, steps - 1)
    cp = pltpu.make_async_copy(out_ref.at[prev_slot], ST.at[Z], sem_io)
    cp.start()
    cp.wait()
    ST[X, :, :] = jnp.where(i > 1, 2.0 * ST[U, :, :] - ST[Z, :, :],
                            ST[U, :, :])

    _xl_fct_tail(ST, (X, R, Z, P, B, W, RP, RN), A7_ref, ahbm_ref, save_ref,
                 (pad1, pad2, pad3, pad4, pad5), (sem_io, sem_park),
                 BANDS, nr, n, dt=dt, tol=tol, iters=iters,
                 cheb_iters=cheb_iters, plane=plane, ml_diag=ml_diag,
                 mass_at=mass_at, pinv=None, bsq=bsq, rhs_at=rhs_at,
                 inv_ref=inv_ref, out_slot=U, dtype=dtype)

    cp = pltpu.make_async_copy(ST.at[U], out_ref.at[idx], sem_io)
    cp.start()
    cp.wait()


def fused_drift_fct_sweep_xl(frames, x0, A_base, M, M_diag, ML_diag, *,
                             h, dt, sign, drift=(1.0, 1.0), tol=1e-6,
                             iters=60, cheb_iters=20, warm=True,
                             has_mis=False, reverse=False, nb=None,
                             vmem_limit_mb=127, with_stats=False):
    """Banded XL variant of fused_drift_fct_sweep (same contract as
    fused_drift_fct_sweep_lean)."""
    n = x0.shape[-1]
    steps = frames.shape[0]
    if nb is None:
        nb = max(2, n // 128)
    nr = n // nb
    if n % nb or nr % 8:
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    A7c = A_base[jnp.asarray(P7)]
    grads = _basis_gradients(h)
    kern = functools.partial(
        _drift_sweep_kernel_xl, n=n, nb=nb, steps=steps, dt=dt,
        sign=float(sign), m=tuple(float(v) for v in drift), tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h * h, has_mis=has_mis,
        grads=grads, reverse=reverse,
    )
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    out, inv, _park = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, n, n), x0.dtype),
                   _inv_shape(x0.dtype),
                   jax.ShapeDtypeStruct((7, n, n), x0.dtype)),
        in_specs=[hbm, hbm, hbm],
        out_specs=(hbm, _inv_spec(), hbm),
        scratch_shapes=[
            pltpu.VMEM((10, n, n), x0.dtype),
            pltpu.VMEM((7, n, n), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((nr + 2, n + 2), x0.dtype),
            pltpu.VMEM((7, 8 * nb, n), x0.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(frames, x0, A7c)
    return (out, jnp.min(inv)) if with_stats else out
