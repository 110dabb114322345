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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, OFFSETS, opposite
from fem_fct_pdeco_tpu.ops.assembly import TRI_CORNERS, _basis_gradients, _offset_index
from fem_fct_pdeco_tpu.ops.pallas_kernels import _interp, _make_apply, _shifted
from fem_fct_pdeco_tpu.ops.quadrature import barycentric, rule_for_degree


def _quad_consts(degree, h, dtype=np.float64):
    pts, wts = rule_for_degree(degree)
    bary = barycentric(pts)
    grads = _basis_gradients(h)
    return wts, bary, grads


def _fused_u_kernel(
    u_ref, v_ref, K_ref, M_ref, Md_ref, ML_ref, rhs_ref, out_ref,
    A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, tol, iters, cheb_iters, wts, bary, grads,
):
    nc = n - 1

    def corner(ref, ai, aj):
        return ref[ai : ai + nc, aj : aj + nc]

    # ---- 1. assemble A = Dm*K - chi * (e^{-ηu} ∇v_h·∇φ_a, φ_b) ----------
    # Plane contributions are accumulated as functional values (jnp.pad
    # placement) and each plane is stored once.
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc = [corner(u_ref, ai, aj) for (ai, aj) in corners]
        vc = [corner(v_ref, ai, aj) for (ai, aj) in corners]
        # per-element gradient of v_h: sum_a v_a grad(lambda_a)
        gvx = sum(vc[a] * grads[t, a, 0] for a in range(3))
        gvy = sum(vc[a] * grads[t, a, 1] for a in range(3))
        # Vb[b] = sum_q w_q e^{-eta u(q)} lambda_b(q)   (detJ folded into wts)
        Vb = [None] * 3
        for q in range(len(wts)):
            uq = bary[q, 0] * uc[0] + bary[q, 1] * uc[1] + bary[q, 2] * uc[2]
            e = wts[q] * jnp.exp(-eta * uq)
            for b in range(3):
                contrib = bary[q, b] * e
                Vb[b] = contrib if Vb[b] is None else Vb[b] + contrib
        for a, (ai, aj) in enumerate(corners):
            ga = grads[t, a, 0] * gvx + grads[t, a, 1] * gvy
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(
                    (-chi) * ga * Vb[b], ((ai, 1 - ai), (aj, 1 - aj))
                )
                planes[d] = placed if planes[d] is None else planes[d] + placed
    for d in range(9):
        base = Dm * K_ref[d, :, :]
        A_ref[d, :, :] = base if planes[d] is None else base + planes[d]

    out_ref[:, :] = _fct_core(
        A_ref, D_ref, pad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_ref[:, :], rhs_ref[:, :],
        n=n, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
    )


def _fct_core(A_ref, D_ref, pad_ref, M_ref, Md_ref, ML, u_prev, rhs,
              *, n, dt, tol, iters, cheb_iters):
    """FCT step tail, given the assembled flux matrix in A_ref: artificial
    diffusion -> low-order matrix (A_ref transformed in place) -> BiCGStab ->
    Chebyshev du/dt -> fluxes -> Zalesak -> corrected solution (returned as a
    value)."""
    # ---- 2. artificial diffusion D (helpers.py:206-242 semantics) -------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    offsum = None
    for d in range(9):
        if d == CENTER:
            continue
        pad_ref[1 : n + 1, 1 : n + 1] = A_ref[opposite(d)]
        Atr = _shifted(pad_ref, d, n)
        Dd = jnp.maximum(0.0, jnp.maximum(A_ref[d, :, :], Atr))
        D_ref[d, :, :] = Dd
        offsum = Dd if offsum is None else offsum + Dd
    D_ref[CENTER, :, :] = -offsum

    # ---- 3. transform A -> Low in place: Low = diag(ML) + dt (A - D) ----
    for d in range(9):
        plane = dt * (A_ref[d, :, :] - D_ref[d, :, :])
        if d == CENTER:
            plane = plane + ML
        A_ref[d, :, :] = plane
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_low = _make_apply(A_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_D = _make_apply(D_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    def apply_A(x):
        # A = (Low - diag(ML))/dt + D
        return (apply_low(x) - ML * x) / dt + apply_D(x)

    # ---- 4. low-order solve (BiCGStab, in-kernel while loop) ------------
    b = ML * u_prev + dt * rhs
    Kinv = 1.0 / A_ref[CENTER]
    x = u_prev
    r = b - apply_low(x)
    rhat = r
    rho = jnp.sum(rhat * r)
    p = r
    atol2 = tol * tol * jnp.sum(b * b)
    eps = 1e-30

    def safe_div(a, d):
        return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))

    def cond(c):
        k, x, r, p, rho, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, x, r, p, rho, _ = c
        phat = Kinv * p
        v = apply_low(phat)
        alpha = safe_div(rho, jnp.sum(rhat * v))
        s = r - alpha * v
        shat = Kinv * s
        t2 = apply_low(shat)
        omega = safe_div(jnp.sum(t2 * s), jnp.sum(t2 * t2))
        x2 = x + alpha * phat + omega * shat
        r2 = s - omega * t2
        rho2 = jnp.sum(rhat * r2)
        beta = safe_div(rho2, rho) * safe_div(alpha, omega)
        p2 = r2 + beta * (p - omega * v)
        return k + 1, x2, r2, p2, rho2, jnp.sum(r2 * r2)

    init = (jnp.asarray(0, jnp.int32), x, r, p, rho, jnp.sum(r * r))
    _, u_low, *_ = jax.lax.while_loop(cond, body, init)

    # ---- 5. Chebyshev du/dt on M du = -A u_low + rhs --------------------
    rdot = -apply_A(u_low) + rhs
    lmin, lmax = 0.5, 2.0
    rho_c = (lmax - lmin) / (lmax + lmin)
    Mdinv = 1.0 / (((lmin + lmax) / 2.0) * Md_ref[:, :])
    yold = jnp.zeros_like(rdot)
    ymid = jnp.zeros_like(rdot)
    om = 1.0
    for k in range(1, cheb_iters + 1):
        if k == 2:
            om = 1.0 / (1.0 - rho_c**2 / 2.0)
        elif k > 2:
            om = 1.0 / (1.0 - om * rho_c**2 / 4.0)
        rr = rdot - apply_M(ymid)
        ynew = om * (rr * Mdinv + ymid - yold) + yold
        yold, ymid = ymid, ynew
    du = ymid

    # ---- 6/7. fluxes + Zalesak + correction -----------------------------
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = u_low
    ul_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}
    # second scratch not available: recompute du shifts from a fresh pad fill
    # after materializing ul shifts as values
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    pad_ref[1 : n + 1, 1 : n + 1] = du
    du_sh = {d: _shifted(pad_ref, d, n) + 0.0 for d in EDGE_NEIGHBOR_IDS}

    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

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
    r_pos = jnp.where(
        p_pos > 0.0,
        jnp.minimum(1.0, ML * q_pos / (dt * jnp.where(p_pos > 0.0, p_pos, 1.0))),
        1.0,
    )
    r_neg = jnp.where(
        p_neg < 0.0,
        jnp.minimum(1.0, ML * q_neg / (dt * jnp.where(p_neg < 0.0, p_neg, 1.0))),
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
                    *, n, dt, inv_r, tol, iters, wts, bary):
    nc = n - 1
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_mat = _make_apply(Mat_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    # load vector: (v_n, phi) + dt * (c_h u_h / r, phi)  (helpers.py:1339-1340)
    load = jnp.zeros((n, n), dtype=out_ref.dtype)
    contribs = [[None, None, None], [None, None, None]]
    for t in range(2):
        corners = TRI_CORNERS[t]
        cc = [c_ref[ai : ai + nc, aj : aj + nc] for (ai, aj) in corners]
        uc = [u_ref[ai : ai + nc, aj : aj + nc] for (ai, aj) in corners]
        for q in range(len(wts)):
            cq = bary[q, 0] * cc[0] + bary[q, 1] * cc[1] + bary[q, 2] * cc[2]
            uq = bary[q, 0] * uc[0] + bary[q, 1] * uc[1] + bary[q, 2] * uc[2]
            f = wts[q] * cq * uq
            for a in range(3):
                add = bary[q, a] * f
                contribs[t][a] = add if contribs[t][a] is None else contribs[t][a] + add

    b = apply_M(v_ref[:, :])
    # functional scatter of the per-element loads (see the note in
    # _fused_u_kernel about overlapping ref slice accumulation)
    scat = None
    for t in range(2):
        for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
            placed = jnp.pad(contribs[t][a], ((ai, 1 - ai), (aj, 1 - aj)))
            scat = placed if scat is None else scat + placed
    b = b + (dt * inv_r) * scat

    # CG solve
    Kinv = 1.0 / Mat_ref[CENTER]
    x = v_ref[:, :]
    r = b - apply_mat(x)
    z = Kinv * r
    p = z
    rz = jnp.sum(r * z)
    atol2 = tol * tol * jnp.sum(b * b)
    eps = 1e-30

    def safe_div(a, d):
        return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))

    def cond(c):
        k, x, r, z, p, rz, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, x, r, z, p, rz, _ = c
        Ap = apply_mat(p)
        alpha = safe_div(rz, jnp.sum(p * Ap))
        x2 = x + alpha * p
        r2 = r - alpha * Ap
        z2 = Kinv * r2
        rz2 = jnp.sum(r2 * z2)
        beta = safe_div(rz2, rz)
        p2 = z2 + beta * p
        return k + 1, x2, r2, z2, p2, rz2, jnp.sum(r2 * r2)

    init = (jnp.asarray(0, jnp.int32), x, r, z, p, rz, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    out_ref[:, :] = x


def fused_chemotaxis_v_step(c_i, u_n, v_n, Mat_v, M, *, h, dt, rescaling,
                            tol=1e-6, iters=60, quad_degree=3):
    """Fused load-assembly + implicit CG solve for the chemotaxis v equation."""
    n = u_n.shape[-1]
    wts, bary, _ = _quad_consts(quad_degree, h)
    wts = wts * h * h
    kern = functools.partial(
        _fused_v_kernel, n=n, dt=dt, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, wts=wts, bary=bary,
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

def _fused_p_kernel(
    p_ref, q_ref, u_ref, v_ref, c_ref, mis_ref, K_ref, M_ref, Md_ref, ML_ref,
    out_ref, A_ref, D_ref, pad_ref,
    *, n, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters, wts, bary, grads,
):
    """Adjoint p FCT step: Mat_p = Dm K - χ ((1-ηu)e^{-ηu} ∇v_h·∇φ_trial, φ_test)
    — the transpose of the forward advective stencil (helpers.py:1499-1503) —
    with load (c_h q_np1_h / r, φ_a) + raw misfit (helpers.py:1505-1507),
    then the shared FCT core. Inputs: p_np1 (q_ref = q_np1)."""
    nc = n - 1

    def corner(ref, ai, aj):
        return ref[ai : ai + nc, aj : aj + nc]

    planes = [None] * 9
    load = None
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc = [corner(u_ref, ai, aj) for (ai, aj) in corners]
        vc = [corner(v_ref, ai, aj) for (ai, aj) in corners]
        cc = [corner(c_ref, ai, aj) for (ai, aj) in corners]
        qc = [corner(q_ref, ai, aj) for (ai, aj) in corners]
        gvx = sum(vc[a] * grads[t, a, 0] for a in range(3))
        gvy = sum(vc[a] * grads[t, a, 1] for a in range(3))
        # Va[a] = Σ_q w_q (1-ηu(q)) e^{-ηu(q)} λ_a(q)  and the load
        # La[a] = Σ_q w_q c(q) q_np1(q)/r λ_a(q)   (detJ folded into wts)
        Va = [None] * 3
        La = [None] * 3
        for q in range(len(wts)):
            uq = bary[q, 0] * uc[0] + bary[q, 1] * uc[1] + bary[q, 2] * uc[2]
            cq = bary[q, 0] * cc[0] + bary[q, 1] * cc[1] + bary[q, 2] * cc[2]
            qq = bary[q, 0] * qc[0] + bary[q, 1] * qc[1] + bary[q, 2] * qc[2]
            e = wts[q] * (1.0 - eta * uq) * jnp.exp(-eta * uq)
            f = wts[q] * inv_r * cq * qq
            for a in range(3):
                Va[a] = bary[q, a] * e if Va[a] is None else Va[a] + bary[q, a] * e
                La[a] = bary[q, a] * f if La[a] is None else La[a] + bary[q, a] * f
        for a, (ai, aj) in enumerate(corners):
            placed_l = jnp.pad(La[a], ((ai, 1 - ai), (aj, 1 - aj)))
            load = placed_l if load is None else load + placed_l
            for b, (bi, bj) in enumerate(corners):
                # gradient on the TRIAL function b -> transposed pairing
                gb = grads[t, b, 0] * gvx + grads[t, b, 1] * gvy
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad((-chi) * gb * Va[a], ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    for d in range(9):
        base = Dm * K_ref[d, :, :]
        A_ref[d, :, :] = base if planes[d] is None else base + planes[d]

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
        wts=wts, bary=bary, grads=grads,
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
    nc = n - 1
    pad_ref[:, :] = jnp.zeros_like(pad_ref)
    from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS

    apply_mat = _make_apply(Mat_ref, pad_ref, n, prezeroed=True,
                            skip_planes=ANTI_DIAGONAL_IDS)
    apply_M = _make_apply(M_ref, pad_ref, n, prezeroed=True,
                          skip_planes=ANTI_DIAGONAL_IDS)

    def corner(ref, ai, aj):
        return ref[ai : ai + nc, aj : aj + nc]

    load = None
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc = [corner(u_ref, ai, aj) for (ai, aj) in corners]
        pc = [corner(p_ref, ai, aj) for (ai, aj) in corners]
        gpx = sum(pc[a] * grads[t, a, 0] for a in range(3))
        gpy = sum(pc[a] * grads[t, a, 1] for a in range(3))
        # g(q) = χ u(q) e^{-ηu(q)}; b[a] = Σ_q w_q g(q) (∇p_h·∇λ_a)
        gsum = None
        for q in range(len(wts)):
            uq = bary[q, 0] * uc[0] + bary[q, 1] * uc[1] + bary[q, 2] * uc[2]
            g = wts[q] * chi * uq * jnp.exp(-eta * uq)
            gsum = g if gsum is None else gsum + g
        for a, (ai, aj) in enumerate(corners):
            ga = grads[t, a, 0] * gpx + grads[t, a, 1] * gpy
            placed = jnp.pad(gsum * ga, ((ai, 1 - ai), (aj, 1 - aj)))
            load = placed if load is None else load + placed

    b = apply_M(q_ref[:, :]) + dt * (load + mis_ref[:, :])

    Kinv = 1.0 / Mat_ref[CENTER]
    x = q_ref[:, :]
    r = b - apply_mat(x)
    z = Kinv * r
    pvec = z
    rz = jnp.sum(r * z)
    atol2 = tol * tol * jnp.sum(b * b)
    eps = 1e-30

    def safe_div(a, d):
        return a / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))

    def cond(c):
        k, x, r, z, pv, rz, rn2 = c
        return (k < iters) & (rn2 > atol2)

    def body(c):
        k, x, r, z, pv, rz, _ = c
        Ap = apply_mat(pv)
        alpha = safe_div(rz, jnp.sum(pv * Ap))
        x2 = x + alpha * pv
        r2 = r - alpha * Ap
        z2 = Kinv * r2
        rz2 = jnp.sum(r2 * z2)
        beta = safe_div(rz2, rz)
        pv2 = z2 + beta * pv
        return k + 1, x2, r2, z2, pv2, rz2, jnp.sum(r2 * r2)

    init = (jnp.asarray(0, jnp.int32), x, r, z, pvec, rz, jnp.sum(r * r))
    _, x, *_ = jax.lax.while_loop(cond, body, init)
    out_ref[:, :] = x


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
