"""HBM-streamed banded ("XXL") whole-sweep kernels: the >= 2048^2 tier.

The banded XL kernels (pallas_fused.py) keep the full-plane state in a
(10, n, n) VMEM slot file — a fixed footprint of ~21 field planes that stops
fitting the 128 MB VMEM past 1024^2 f32 (2048^2 would need 336 MB). This
tier moves the slot file and both stencil copies to HBM and streams row
BANDS through small VMEM staging buffers:

- ``STH`` (10, n, n): the Krylov/FCT state slots, a discarded HBM output
  ref (real Mosaic rejects ``pltpu.HBM`` *scratch* allocations; parking
  state in an unused output is the same trick the lean kernels use for the
  raw flux matrix — see pallas_fused.py's XL section header).
- ``A7H`` (7, n, n): the raw per-step transport matrix; ``LOW7`` (7, n, n):
  the FCT low-order matrix. Keeping both (the XL kernels transform in
  place and park/restore) removes the park DMA dance entirely.
- Every pass over the state runs top band / ``fori_loop`` over interior
  bands / bottom band. Edge bands are unrolled with static offsets (domain
  boundary handling, iota-free interior), so the interior loop body has
  static shapes, 8-row-aligned DMAs (band body + one 8-row halo chunk per
  side) and reads its stencil masks from a small VMEM ref instead of
  synthesizing them from iota (CLAUDE.md: full-plane iota synthesis inside
  solver loops sends Mosaic's layout analysis from seconds to hours).
- The spectral preconditioner (helpers.py:1342/1782 solve operators) is
  applied BANDED on the MXU in bf16: two full-plane f32 VMEM accumulators
  carry the left transforms (Z = C^T((C r C^T) * ilam) C uses only row
  slices of a stacked {C, C^T} ref — the (1,0)/(0,0)-contraction layout
  rule from pallas_fused._make_dct_pinv2, shrunk to (nr, n) operands).

Mathematically the step is identical to the XL kernels (and to reference
helpers.py:1321-1385): implicit v reaction-diffusion CG solve, in-kernel
P1 transport assembly, artificial diffusion / low-order transform with the
always-on min-rowsum telemetry, warm-started banded BiCGStab low-order
solve, ChebSI du/dt (helpers.py:143-185), Zalesak limiter and corrected
update. Parity is pinned against the XLA path in tests/test_pallas_xxl.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, OFFSETS, opposite
from fem_fct_pdeco_tpu.ops.pallas_kernels import _interp
from fem_fct_pdeco_tpu.ops.pallas_fused import (
    P7, P7IDX, _ZERO_PLANES, _inv_init, _inv_shape, _inv_spec, _mk_combos,
    _make_synth_xl, _quad_consts, _safe_div, _xl_asm_transport, _xl_lf_prod,
    dct_matrix, dct_precond_ilam)


def _bands_of(n, nb):
    nr = n // nb
    return [(b * nr, b == 0, b == nb - 1) for b in range(nb)], nr


def fits_hbm_xxl(n: int, dtype=jnp.float32) -> bool:
    """Feasibility of the XXL streamed kernels: the HBM slot files
    (10 + 7 + 7 = 24 planes ~ 1.5 GB at 4096^2 f32) plus trajectory frames
    must fit the 16 GB HBM; VMEM needs only the fixed ~70 MB staging set
    (C/ilam bf16 pair, two f32 accumulators, band buffers), independent of
    ``n``. Requires lane-aligned interior bands."""
    itemsize = jnp.dtype(dtype).itemsize
    return 24 * n * n * itemsize <= 4 * 2**30 and n % 128 == 0


# ---------------------------------------------------------------------------
# the forward sweep kernel
# ---------------------------------------------------------------------------


def _fwd_sweep_kernel_xxl(
    c_ref, u0_ref, v0_ref, c2_in, ilamu_in, ilamv_in,
    uout_ref, vout_ref, inv_ref, sth_ref, a7h_ref, low7_ref,
    C2_s, ILU_s, ILV_s, ACC1, ACC2, cmsk_s,
    pad1, pad2, pad3, pad4, pad5, rpad1, rpad2,
    braw1, braw2, braw3, braw4, braw1b, braw2b, braw3b, braw4b,
    a7raw, a7rawb, lowbuf, a7x, bx1, bx2,
    sem_io, sem_a, sem_b,
    *, n, nb, h2, dt, Dm, Df, delta, chi, eta, inv_r, tol, iters,
    cheb_iters, wts4, bary4, grads, precond,
):
    """One streamed-banded chemotaxis FCT step (grid step ``i``); identical
    math to pallas_fused._fwd_sweep_kernel_xl / helpers.py:1321-1385. See
    the module docstring for the memory model."""
    dtype = braw1.dtype
    BANDS, nr = _bands_of(n, nb)
    plane_xl, ml_xl = _make_synth_xl(n, dtype, h2)
    combos, ml_combo = _mk_combos()
    i = pl.program_id(0)
    U, V, X, R, Z, P, B, W, RP, RN = range(10)
    zero = jnp.asarray(0.0, dtype)

    # ---- DMA plumbing ---------------------------------------------------

    def ds8(start, size):
        """Sublane-dim dynamic slice with the 8-row alignment HINT Mosaic's
        divisibility prover needs for traced band offsets (r0 = bi*nr with
        nr % 8 == 0; the prover can't derive this through the fori arg)."""
        if isinstance(start, int):
            return pl.ds(start, size)
        return pl.ds(pl.multiple_of(start, 8), size)

    def _dma(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem_io)
        cp.start()
        return cp

    def _dma_all(*pairs):
        cps = [_dma(s, d) for (s, d) in pairs]
        for cp in cps:
            cp.wait()

    def read_band(view, r0, dst):
        """Band body rows [r0, r0+nr) of an (n, n) HBM view -> dst."""
        _dma_all((view.at[ds8(r0, nr), :], dst))

    def write_band(view, r0, src):
        _dma_all((src, view.at[ds8(r0, nr), :]))

    def stage_start(view, r0, bx, *, top, bot):
        """ONE 8-row-aligned DMA covering the band body AND both halo rows
        (over-reading one 8-row chunk per interior side): rows land in
        ``bx`` with the band's row r0 at index 0 (top band) or 8."""
        o = 0 if top else 8
        rows = nr + 8 if (top or bot) else nr + 16
        if top and bot:
            rows = nr
        return _dma(view.at[ds8(r0 - o, rows), :], bx.at[0:rows, :])

    def pad_fill(pad, bx, *, top, bot, border=0.0):
        """(nr+2, n+2) shift pad from a staged ``bx``: the data window is
        ONE VMEM store; border stores touch only the apron columns and the
        missing edge rows."""
        pad[:, 0:1] = jnp.full_like(pad[:, 0:1], border)
        pad[:, n + 1 : n + 2] = jnp.full_like(pad[:, n + 1 : n + 2], border)
        if top:
            pad[0:1, 1 : n + 1] = jnp.full_like(pad[0:1, 1 : n + 1], border)
            pad[1 : nr + 2, 1 : n + 1] = bx[0 : nr + 1, :]
        elif bot:
            pad[nr + 1 : nr + 2, 1 : n + 1] = jnp.full_like(
                pad[nr + 1 : nr + 2, 1 : n + 1], border)
            pad[0 : nr + 1, 1 : n + 1] = bx[7 : nr + 8, :]
        else:
            pad[0 : nr + 2, 1 : n + 1] = bx[7 : nr + 9, :]

    def stage_pad(view, r0, pad, bx, *, top, bot, border=0.0):
        stage_start(view, r0, bx, top=top, bot=bot).wait()
        pad_fill(pad, bx, top=top, bot=bot, border=border)

    def rpad_fill(rpad, bx, *, top, bot):
        if top:
            rpad[0:1, :] = jnp.zeros_like(rpad[0:1, :])
            rpad[1 : nr + 2, :] = bx[0 : nr + 1, :]
        elif bot:
            rpad[nr + 1 : nr + 2, :] = jnp.zeros_like(rpad[0:1, :])
            rpad[0 : nr + 1, :] = bx[7 : nr + 8, :]
        else:
            rpad[0 : nr + 2, :] = bx[7 : nr + 9, :]

    def stage_rpad(view, r0, rpad, bx, *, top, bot):
        """Row-halo-only staging at LANE OFFSET 0 (a (nr+2, n) window of
        the plane): the assembly/load-vector helpers (_xl_lf_prod,
        _xl_asm_transport) use jnp.pad internally, which real Mosaic can
        only lower when the operands carry no lane offset — the shifted
        (column-apron) pads are for stencil applies only."""
        stage_start(view, r0, bx, top=top, bot=bot).wait()
        rpad_fill(rpad, bx, top=top, bot=bot)

    def stage_a7(hbm7, r0, *, top, bot, halo):
        """Stencil band staging: solver applies (``halo=False``) read the
        exact (7, nr, n) body into ``a7raw``; the halo-needing passes read
        one (7, nr+8|16, n) window into ``a7x`` (band row r0 at index
        0 / 8 as in stage_start)."""
        if not halo:
            _dma(hbm7.at[:, ds8(r0, nr), :], a7raw).wait()
            return
        o = 0 if top else 8
        rows = nr + 8 if (top or bot) else nr + 16
        _dma(hbm7.at[:, ds8(r0 - o, rows), :], a7x.at[:, 0:rows, :]).wait()

    def a7_body(k7, *, top):
        """Body rows of plane ``k7`` of the halo-staged (a7x) band."""
        o = 0 if top else 8
        return a7x[k7, o : o + nr, :]

    def a7_pad(pad, k7, *, top, bot):
        """Shift pad of plane ``k7`` of the halo-staged (a7x) band."""
        pad[:, 0:1] = jnp.zeros_like(pad[:, 0:1])
        pad[:, n + 1 : n + 2] = jnp.zeros_like(pad[:, n + 1 : n + 2])
        if top:
            pad[0:1, 1 : n + 1] = jnp.zeros_like(pad[0:1, 1 : n + 1])
            pad[1 : nr + 2, 1 : n + 1] = a7x[k7, 0 : nr + 1, :]
        elif bot:
            pad[nr + 1 : nr + 2, 1 : n + 1] = jnp.zeros_like(
                pad[nr + 1 : nr + 2, 1 : n + 1])
            pad[0 : nr + 1, 1 : n + 1] = a7x[k7, 7 : nr + 8, :]
        else:
            pad[0 : nr + 2, 1 : n + 1] = a7x[k7, 7 : nr + 9, :]

    def for_bands(body, carry0=None):
        """Top band unrolled / fori over interior bands / bottom band
        unrolled. ``body(r0, top, bot, carry)`` must accept both python-int
        and traced ``r0``; ``top``/``bot`` are always python bools."""
        carry = zero if carry0 is None else carry0
        carry = body(0, True, nb == 1, carry)
        if nb > 2:
            carry = jax.lax.fori_loop(
                1, nb - 1, lambda bi, c: body(bi * nr, False, False, c),
                carry)
        if nb > 1:
            carry = body((nb - 1) * nr, False, True, carry)
        return carry

    # ---- software-pipelined band passes -----------------------------------
    # The serial stage-wait-compute structure above exposes the HBM->VMEM
    # DMA latency on every one of the ~140 band passes per step (the main
    # measured overhead vs the bandwidth roofline at 2048^2). The solver-
    # LOOP passes below instead issue band k+1's read DMAs into the
    # ALTERNATE buffer set before band k computes, so reads are always in
    # flight under compute. Writes still wait inline: a write's staging
    # buffer is only reused two bands later, after its wait. Safe because
    # no pipelined pass halo-reads a slot it writes (verified per pass),
    # so a prefetch never races the previous band's store.
    #
    # A pass is (reads, compute): ``reads(r0, bs)`` returns the (pure,
    # un-started) copy descriptors for the band at row r0 into buffer set
    # ``bs``; the runner starts them one band ahead and re-constructs them
    # to wait (the standard Pallas deferred-wait pattern — the wait only
    # needs the same (src, dst, sem) triple). Every staged halo window is
    # a uniform (nr+16, n) read from a clamped 8-aligned start, so the
    # band's rows sit at a STATIC in-buffer offset o in {0, 8, 16}.
    PIPE = nb >= 4 and nb % 2 == 0

    def _clip8(x):
        hi = n - nr - 16
        if isinstance(x, int):
            return max(0, min(x, hi))
        return pl.multiple_of(jnp.clip(x, 0, hi), 8)

    def _halo_cp(view, r0, bs):
        return pltpu.make_async_copy(
            view.at[pl.ds(_clip8(r0 - 8), nr + 16), :], bs[4], bs[6])

    def _body_cp(view, r0, dst, bs):
        return pltpu.make_async_copy(view.at[ds8(r0, nr), :], dst, bs[6])

    def _a7_cp(hbm7, r0, bs):
        return pltpu.make_async_copy(
            hbm7.at[:, ds8(r0, nr), :], bs[5], bs[6])

    SET0 = (braw1, braw2, braw3, braw4, bx1, a7raw, sem_a)
    SET1 = (braw1b, braw2b, braw3b, braw4b, bx2, a7rawb, sem_b)

    def pad_fill_p(pad, bs, o, *, top, bot, border=0.0):
        """(nr+2, n+2) shift pad from the set's staged halo window, whose
        band row r0 sits at in-buffer offset ``o``."""
        bxp = bs[4]
        pad[:, 0:1] = jnp.full_like(pad[:, 0:1], border)
        pad[:, n + 1 : n + 2] = jnp.full_like(pad[:, n + 1 : n + 2], border)
        if top:
            pad[0:1, 1 : n + 1] = jnp.full_like(pad[0:1, 1 : n + 1], border)
            pad[1 : nr + 2, 1 : n + 1] = bxp[0 : nr + 1, :]
        elif bot:
            pad[nr + 1 : nr + 2, 1 : n + 1] = jnp.full_like(
                pad[nr + 1 : nr + 2, 1 : n + 1], border)
            pad[0 : nr + 1, 1 : n + 1] = bxp[o - 1 : o + nr, :]
        else:
            pad[0 : nr + 2, 1 : n + 1] = bxp[o - 1 : o + nr + 1, :]

    def staged_at_of(bs):
        a7b = bs[5]

        def f(d, r0, *, top, bot):
            return a7b[P7IDX[d], :, :] if d in P7IDX else None

        return f

    def for_bands_pipe(reads, compute, carry0=None):
        """Top band unrolled / fori over interior band PAIRS / bottom band
        unrolled, with band k+1's reads in flight during band k's compute.
        ``compute(r0, top, bot, o, bs, carry)``."""
        carry = zero if carry0 is None else carry0

        def start(r0, bs):
            for cp in reads(r0, bs):
                cp.start()

        def wait(r0, bs):
            for cp in reads(r0, bs):
                cp.wait()

        def comp(r0, top, bot, o, bs, c):
            wait(r0, bs)
            return compute(r0, top, bot, o, bs, c)

        if not PIPE:
            def body(r0, top, bot, c):
                start(r0, SET0)
                o = 0 if top else (16 if bot else 8)
                return comp(r0, top, bot, o, SET0, c)
            return for_bands(body, carry)

        last = (nb - 1) * nr
        start(0, SET0)
        start(nr, SET1)
        carry = comp(0, True, False, 0, SET0, carry)
        start(2 * nr, SET0)

        def pair(j, c):
            k1 = (2 * j + 1) * nr
            c = comp(k1, False, False, 8, SET1, c)
            start(jnp.minimum(k1 + 2 * nr, last), SET1)
            c = comp(k1 + nr, False, False, 8, SET0, c)
            # the final pair's second prefetch clamps to a (drained,
            # unconsumed) duplicate of the bottom band: one band of waste
            # per pass buys a branch-free fori body
            start(jnp.minimum(k1 + 3 * nr, last), SET0)
            return c

        carry = jax.lax.fori_loop(0, (nb - 2) // 2, pair, carry)
        wait(last, SET0)  # drain the dangling duplicate prefetch
        return comp(last, False, True, 16, SET1, carry)

    # ---- synthesized stationary planes -----------------------------------
    # interior bands: the row masks are identically 1, so an alpha*M+beta*K
    # plane reduces to a column PROFILE (1, n) read from the cmsk ref
    # (row 0: col <= n-2, row 1: col >= 1); edge bands use the static-offset
    # iota synthesizer the XL kernels use.

    def plane_at(d, mc, kc, r0, *, top, bot):
        if top or bot:
            return plane_xl(d, mc, kc, r0, nr)
        acc = None
        for (ai, aj), (em, ek) in combos[d].items():
            cst = float(mc) * h2 * em + float(kc) * ek
            if cst == 0.0:
                continue
            term = cst * cmsk_s[aj : aj + 1, :]
            acc = term if acc is None else acc + term
        if acc is None:
            return jnp.zeros((1, n), dtype)
        return acc

    def ml_at(r0, *, top, bot):
        if top or bot:
            return ml_xl(r0, nr)
        acc = None
        for (ai, aj), em in ml_combo.items():
            term = (h2 * em) * cmsk_s[aj : aj + 1, :]
            acc = term if acc is None else acc + term
        return acc

    def apply_at(S_at, pad, r0, *, top, bot):
        """out = sum_d S[d] * x[. + off_d] over the band, x staged in pad."""
        acc = None
        for d in range(9):
            if d in _ZERO_PLANES:
                continue
            w = S_at(d, r0, top=top, bot=bot)
            if w is None:
                continue
            di, dj = OFFSETS[d]
            t = w * pad[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]
            acc = t if acc is None else acc + t
        return acc

    def matv_at(d, r0, *, top, bot):
        return plane_at(d, 1.0 + dt * delta, dt * Df, r0, top=top, bot=bot)

    def mass_at(d, r0, *, top, bot):
        return plane_at(d, 1.0, 0.0, r0, top=top, bot=bot)

    def staged_at(d, r0, *, top, bot):
        return a7raw[P7IDX[d], :, :] if d in P7IDX else None

    # ---- banded spectral preconditioner ----------------------------------
    # Z = C^T ((C r C^T) * ilam) C with C2_s = {C, C^T} bf16 resident and
    # two f32 full-plane VMEM accumulators; all contractions are (1,0) or
    # (0,0) on (nr, n) ROW slices (pallas_fused._make_dct_pinv2 layout rule).

    bf16 = jnp.bfloat16

    def _mm10(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=dtype)

    def _mm00(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=dtype)

    def pinv_dct(src, dst, il_s, copy_to=None):
        """STH[dst] = P^{-1} STH[src]; returns sum(src * dst). When
        ``copy_to`` is given, also writes STH[copy_to] = STH[dst]. The two
        HBM-reading passes are pipelined so the src-band DMA overlaps the
        MXU transform of the previous band."""
        ACC1[:, :] = jnp.zeros_like(ACC1)

        def p1_reads(r0, bs):
            return [_body_cp(sth_ref.at[src], r0, bs[0], bs)]

        def p1(r0, top, bot, o, bs, c):
            w1 = _mm10(bs[0][:, :].astype(bf16), C2_s[1])      # R_j @ C^T
            ACC1[:, :] = ACC1[:, :] + _mm00(
                C2_s[1, ds8(r0, nr), :], w1.astype(bf16))    # C[:,j] @ w1
            return c

        for_bands_pipe(p1_reads, p1)
        ACC2[:, :] = jnp.zeros_like(ACC2)

        def p2(r0, top, bot, c):
            m = ACC1[ds8(r0, nr), :] * il_s[ds8(r0, nr), :].astype(dtype)
            w2 = _mm10(m.astype(bf16), C2_s[0])                # M_i @ C
            ACC2[:, :] = ACC2[:, :] + _mm00(
                C2_s[0, ds8(r0, nr), :], w2.astype(bf16))    # C^T[:,i] @ w2
            return c

        for_bands(p2)  # VMEM-only: no HBM reads to hide

        def p3_reads(r0, bs):
            return [_body_cp(sth_ref.at[src], r0, bs[0], bs)]

        def p3(r0, top, bot, o, bs, c):
            zb = ACC2[ds8(r0, nr), :]
            bs[1][:, :] = zb
            cps = [_dma(bs[1], sth_ref.at[dst, ds8(r0, nr), :])]
            if copy_to is not None:
                bs[2][:, :] = zb
                cps.append(_dma(bs[2], sth_ref.at[copy_to, ds8(r0, nr), :]))
            rz = jnp.sum(bs[0][:, :] * zb)
            for cp in cps:
                cp.wait()
            return c + rz

        return for_bands_pipe(p3_reads, p3)

    def pinv_jac(src, dst, diag_at, copy_to=None, stage_cb=None):
        def p(r0, top, bot, c):
            if stage_cb is not None:
                stage_cb(r0, top, bot)
            read_band(sth_ref.at[src], r0, braw1)
            zb = braw1[:, :] / diag_at(r0, top=top, bot=bot)
            braw2[:, :] = zb
            cps = [_dma(braw2, sth_ref.at[dst, ds8(r0, nr), :])]
            if copy_to is not None:
                braw3[:, :] = zb
                cps.append(_dma(braw3, sth_ref.at[copy_to, ds8(r0, nr), :]))
            rz = jnp.sum(braw1[:, :] * zb)
            for cp in cps:
                cp.wait()
            return c + rz

        return for_bands(p)

    # ---- banded CG / BiCGStab on HBM slots --------------------------------

    def cg(slots, S_at, il_s, diag_at, bsq, stencil7=None):
        """Preconditioned CG: x in slots[0], b preloaded in slots[4]
        (consumed as the Ap slot after the first pass); while_loop carries
        scalars only (pallas_fused._cg semantics)."""
        Xs, Rs, Zs, Ps, APs = slots

        def maybe_stage7(r0, top, bot):
            if stencil7 is not None:
                stage_a7(stencil7, r0, top=top, bot=bot, halo=False)

        stage_cb = maybe_stage7 if stencil7 is not None else None

        def init(r0, top, bot, c):
            maybe_stage7(r0, top, bot)
            stage_pad(sth_ref.at[Xs], r0, pad1, bx1, top=top, bot=bot)
            ax = apply_at(S_at, pad1, r0, top=top, bot=bot)
            read_band(sth_ref.at[APs], r0, braw2)
            rb = braw2[:, :] - ax
            braw3[:, :] = rb
            write_band(sth_ref.at[Rs], r0, braw3)
            return c + jnp.sum(rb * rb)

        rn0 = for_bands(init)
        if il_s is not None:
            rz0 = pinv_dct(Rs, Zs, il_s, copy_to=Ps)
        else:
            rz0 = pinv_jac(Rs, Zs, diag_at, copy_to=Ps, stage_cb=stage_cb)
        atol2 = tol * tol * bsq

        def cond(c):
            k, rz, rn2 = c
            return (k < iters) & (rn2 > atol2)

        sat_of = ((lambda bs: staged_at_of(bs)) if stencil7 is not None
                  else (lambda bs: S_at))

        def body(c):
            k, rz, _ = c

            def pa_reads(r0, bs):
                cps = [_halo_cp(sth_ref.at[Ps], r0, bs)]
                if stencil7 is not None:
                    cps.append(_a7_cp(stencil7, r0, bs))
                return cps

            def pa(r0, top, bot, o, bs, cc):
                pad_fill_p(pad1, bs, o, top=top, bot=bot)
                ap = apply_at(sat_of(bs), pad1, r0, top=top, bot=bot)
                bs[1][:, :] = ap
                cpw = _dma(bs[1], sth_ref.at[APs, ds8(r0, nr), :])
                red = jnp.sum(pad1[1 : nr + 1, 1 : n + 1] * ap)
                cpw.wait()
                return cc + red

            pAp = for_bands_pipe(pa_reads, pa)
            alpha = _safe_div(rz, pAp)

            def pb_reads(r0, bs):
                return [_body_cp(sth_ref.at[Xs], r0, bs[0], bs),
                        _body_cp(sth_ref.at[Ps], r0, bs[1], bs),
                        _body_cp(sth_ref.at[Rs], r0, bs[2], bs),
                        _body_cp(sth_ref.at[APs], r0, bs[3], bs)]

            def pb(r0, top, bot, o, bs, cc):
                bs[0][:, :] = bs[0][:, :] + alpha * bs[1][:, :]
                rb = bs[2][:, :] - alpha * bs[3][:, :]
                bs[2][:, :] = rb
                _dma_all((bs[0], sth_ref.at[Xs, ds8(r0, nr), :]),
                         (bs[2], sth_ref.at[Rs, ds8(r0, nr), :]))
                return cc + jnp.sum(rb * rb)

            rn2 = for_bands_pipe(pb_reads, pb)
            if il_s is not None:
                rz2 = pinv_dct(Rs, Zs, il_s)
            else:
                rz2 = pinv_jac(Rs, Zs, diag_at, stage_cb=stage_cb)
            beta = _safe_div(rz2, rz)

            def pc_reads(r0, bs):
                return [_body_cp(sth_ref.at[Zs], r0, bs[0], bs),
                        _body_cp(sth_ref.at[Ps], r0, bs[1], bs)]

            def pc(r0, top, bot, o, bs, cc):
                bs[1][:, :] = bs[0][:, :] + beta * bs[1][:, :]
                cpw = _dma(bs[1], sth_ref.at[Ps, ds8(r0, nr), :])
                cpw.wait()
                return cc

            for_bands_pipe(pc_reads, pc)
            return k + 1, rz2, rn2

        jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), rz0, rn0))

    def bicgstab(slots, S_at, il_s, diag_at, bsq, stencil7):
        """Preconditioned BiCGStab, x in slots[0], b preloaded in slots[6];
        scalar-only while carries (pallas_fused._bicgstab semantics)."""
        Xs, Rs, RHs, Ps, VVs, Ts, Bs, PHs = slots

        def init(r0, top, bot, c):
            stage_a7(stencil7, r0, top=top, bot=bot, halo=False)
            stage_pad(sth_ref.at[Xs], r0, pad1, bx1, top=top, bot=bot)
            ax = apply_at(S_at, pad1, r0, top=top, bot=bot)
            read_band(sth_ref.at[Bs], r0, braw2)
            rb = braw2[:, :] - ax
            braw2[:, :] = rb
            braw3[:, :] = rb
            braw4[:, :] = rb
            _dma_all((braw2, sth_ref.at[Rs, ds8(r0, nr), :]),
                     (braw3, sth_ref.at[RHs, ds8(r0, nr), :]),
                     (braw4, sth_ref.at[Ps, ds8(r0, nr), :]))
            return c + jnp.sum(rb * rb)

        rho0 = for_bands(init)
        atol2 = tol * tol * bsq

        def precond(src):
            if il_s is not None:
                pinv_dct(src, PHs, il_s)
            else:
                pinv_jac(src, PHs, diag_at,
                         stage_cb=lambda r0, top, bot: stage_a7(
                             stencil7, r0, top=top, bot=bot, halo=False))

        def cond(c):
            k, rho, rn2 = c
            return (k < iters) & (rn2 > atol2)

        def body(c):
            k, rho, _ = c
            precond(Ps)

            def pa_reads(r0, bs):
                return [_a7_cp(stencil7, r0, bs),
                        _halo_cp(sth_ref.at[PHs], r0, bs),
                        _body_cp(sth_ref.at[RHs], r0, bs[0], bs)]

            def pa(r0, top, bot, o, bs, cc):
                pad_fill_p(pad1, bs, o, top=top, bot=bot)
                vb = apply_at(staged_at_of(bs), pad1, r0, top=top, bot=bot)
                bs[1][:, :] = vb
                cpw = _dma(bs[1], sth_ref.at[VVs, ds8(r0, nr), :])
                rhv = jnp.sum(bs[0][:, :] * vb)
                cpw.wait()
                return cc + rhv

            rhv = for_bands_pipe(pa_reads, pa)
            alpha = _safe_div(rho, rhv)

            def pb_reads(r0, bs):
                return [_body_cp(sth_ref.at[Xs], r0, bs[0], bs),
                        _body_cp(sth_ref.at[PHs], r0, bs[1], bs),
                        _body_cp(sth_ref.at[Rs], r0, bs[2], bs),
                        _body_cp(sth_ref.at[VVs], r0, bs[3], bs)]

            def pb(r0, top, bot, o, bs, cc):
                bs[0][:, :] = bs[0][:, :] + alpha * bs[1][:, :]
                bs[2][:, :] = bs[2][:, :] - alpha * bs[3][:, :]
                _dma_all((bs[0], sth_ref.at[Xs, ds8(r0, nr), :]),
                         (bs[2], sth_ref.at[Rs, ds8(r0, nr), :]))
                return cc

            for_bands_pipe(pb_reads, pb)
            precond(Rs)  # shat (s lives in R)

            def pc_reads(r0, bs):
                return [_a7_cp(stencil7, r0, bs),
                        _halo_cp(sth_ref.at[PHs], r0, bs),
                        _body_cp(sth_ref.at[Rs], r0, bs[0], bs)]

            def pc(r0, top, bot, o, bs, cc):
                ts, tt = cc
                pad_fill_p(pad1, bs, o, top=top, bot=bot)
                tb = apply_at(staged_at_of(bs), pad1, r0, top=top, bot=bot)
                bs[1][:, :] = tb
                cpw = _dma(bs[1], sth_ref.at[Ts, ds8(r0, nr), :])
                ts = ts + jnp.sum(tb * bs[0][:, :])
                tt = tt + jnp.sum(tb * tb)
                cpw.wait()
                return ts, tt

            ts, tt = for_bands_pipe(pc_reads, pc, (zero, zero))
            omega = _safe_div(ts, tt)

            def pd_reads(r0, bs):
                # fifth body read lands in the set's halo buffer (no halo
                # read in this pass, so its first nr rows are free)
                return [_body_cp(sth_ref.at[Xs], r0, bs[0], bs),
                        _body_cp(sth_ref.at[PHs], r0, bs[1], bs),
                        _body_cp(sth_ref.at[Rs], r0, bs[2], bs),
                        _body_cp(sth_ref.at[Ts], r0, bs[3], bs),
                        pltpu.make_async_copy(
                            sth_ref.at[RHs, ds8(r0, nr), :],
                            bs[4].at[0:nr, :], bs[6])]

            def pd(r0, top, bot, o, bs, cc):
                rho2, rn2 = cc
                bs[0][:, :] = bs[0][:, :] + omega * bs[1][:, :]
                rb = bs[2][:, :] - omega * bs[3][:, :]
                bs[2][:, :] = rb
                _dma_all((bs[0], sth_ref.at[Xs, ds8(r0, nr), :]),
                         (bs[2], sth_ref.at[Rs, ds8(r0, nr), :]))
                return (rho2 + jnp.sum(bs[4][0:nr, :] * rb),
                        rn2 + jnp.sum(rb * rb))

            rho2, rn2 = for_bands_pipe(pd_reads, pd, (zero, zero))
            beta = _safe_div(rho2, rho) * _safe_div(alpha, omega)

            def pe_reads(r0, bs):
                return [_body_cp(sth_ref.at[Rs], r0, bs[0], bs),
                        _body_cp(sth_ref.at[Ps], r0, bs[1], bs),
                        _body_cp(sth_ref.at[VVs], r0, bs[2], bs)]

            def pe(r0, top, bot, o, bs, cc):
                bs[1][:, :] = bs[0][:, :] + beta * (
                    bs[1][:, :] - omega * bs[2][:, :])
                cpw = _dma(bs[1], sth_ref.at[Ps, ds8(r0, nr), :])
                cpw.wait()
                return cc

            for_bands_pipe(pe_reads, pe)
            return k + 1, rho2, rn2

        jax.lax.while_loop(cond, body,
                           (jnp.asarray(0, jnp.int32), rho0, rho0))

    # ======================================================================
    # step body
    # ======================================================================

    @pl.when(i == 0)
    def _():
        _dma_all((c2_in, C2_s), (ilamu_in, ILU_s), (ilamv_in, ILV_s),
                 (u0_ref, sth_ref.at[U]), (v0_ref, sth_ref.at[V]))
        _inv_init(inv_ref)
        col = jax.lax.broadcasted_iota(jnp.int32, (8, n), 1)
        cmsk_s[:, :] = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (8, n), 0) == 0,
            jnp.where(col <= n - 2, 1.0, 0.0),
            jnp.where(col >= 1, 1.0, 0.0)).astype(dtype)

    # ---- v half-step (helpers.py:1339-1342) ------------------------------
    def vb(r0, top, bot, c):
        stage_rpad(c_ref.at[i], r0, rpad1, bx1, top=top, bot=bot)
        stage_rpad(sth_ref.at[U], r0, rpad2, bx2, top=top, bot=bot)
        stage_pad(sth_ref.at[V], r0, pad3, bx1, top=top, bot=bot)
        if top:
            load = _xl_lf_prod(
                [rpad1[1 : nr + 2, :], rpad2[1 : nr + 2, :]],
                ncr=nr, ncc=n - 1, h2=h2)[0:nr]
        elif bot:
            load = _xl_lf_prod(
                [rpad1[0 : nr + 1, :], rpad2[0 : nr + 1, :]],
                ncr=nr, ncc=n - 1, h2=h2)[1 : nr + 1]
        else:
            load = _xl_lf_prod(
                [rpad1[0 : nr + 2, :], rpad2[0 : nr + 2, :]],
                ncr=nr + 1, ncc=n - 1, h2=h2)[1 : nr + 1]
        bb = (apply_at(mass_at, pad3, r0, top=top, bot=bot)
              + (dt * inv_r) * load)
        braw2[:, :] = bb
        write_band(sth_ref.at[B], r0, braw2)
        return c + jnp.sum(bb * bb)

    bsq_v = for_bands(vb)

    # warm start x0 = 2 v_n - v_{n-1} (out[i] is x_{i+1}: slot i-2; the
    # select discards it at i <= 1 — same contract as the XL kernels)
    im2 = jnp.maximum(i - 2, 0)

    def warm(traj_ref, cur_slot):
        def w(r0, top, bot, c):
            _dma_all((traj_ref.at[im2, ds8(r0, nr), :], braw1),
                     (sth_ref.at[cur_slot, ds8(r0, nr), :], braw2))
            braw3[:, :] = jnp.where(i > 1,
                                    2.0 * braw2[:, :] - braw1[:, :],
                                    braw2[:, :])
            write_band(sth_ref.at[X], r0, braw3)
            return c

        for_bands(w)

    warm(vout_ref, V)

    def matv_diag(r0, *, top, bot):
        return plane_at(CENTER, 1.0 + dt * delta, dt * Df, r0,
                        top=top, bot=bot)

    cg((X, R, Z, P, B), matv_at, ILV_s if precond == "dct" else None,
       matv_diag, bsq_v)
    _dma_all((sth_ref.at[X], sth_ref.at[V]))  # v_{n+1}
    _dma_all((sth_ref.at[V], vout_ref.at[i]))

    # ---- u half-step: transport assembly (helpers.py:1350-1352) ----------
    def asm(r0, top, bot, c):
        stage_rpad(sth_ref.at[U], r0, rpad1, bx1, top=top, bot=bot)
        stage_rpad(sth_ref.at[V], r0, rpad2, bx2, top=top, bot=bot)
        if top:
            wu = rpad1[1 : nr + 2, :]
            wv = rpad2[1 : nr + 2, :]
            ncr, d0 = nr, 0
        elif bot:
            wu = rpad1[0 : nr + 1, :]
            wv = rpad2[0 : nr + 1, :]
            ncr, d0 = nr, 1
        else:
            wu = rpad1[0 : nr + 2, :]
            wv = rpad2[0 : nr + 2, :]
            ncr, d0 = nr + 1, 1
        tr = _xl_asm_transport(wu, wv, ncr=ncr, ncc=n - 1, chi=chi, eta=eta,
                               wts=wts4, bary=bary4, grads=grads)
        for k7, d in enumerate(P7):
            kp = plane_at(d, 0.0, Dm, r0, top=top, bot=bot)
            t = tr[d]
            a7raw[k7, :, :] = (jnp.broadcast_to(kp, (nr, n)) if t is None
                               else kp + t[d0 : d0 + nr])
        _dma_all((a7raw, a7h_ref.at[:, ds8(r0, nr), :]))
        return c

    for_bands(asm)

    # b = ML u_n
    def ub(r0, top, bot, c):
        read_band(sth_ref.at[U], r0, braw1)
        bb = ml_at(r0, top=top, bot=bot) * braw1[:, :]
        braw2[:, :] = bb
        write_band(sth_ref.at[B], r0, braw2)
        return c + jnp.sum(bb * bb)

    bsq_u = for_bands(ub)
    warm(uout_ref, U)

    # ---- A -> Low (band by band, raw A and Low in separate HBM refs) -----
    def trans(r0, top, bot, c):
        stage_a7(a7h_ref, r0, top=top, bot=bot, halo=True)
        offsum = None
        rs = None
        for d in range(9):
            if d in _ZERO_PLANES or d == CENTER:
                continue
            a7_pad(pad1, P7IDX[opposite(d)], top=top, bot=bot)
            di, dj = OFFSETS[d]
            Ad = a7_body(P7IDX[d], top=top)
            Dd = jnp.maximum(0.0, jnp.maximum(
                Ad, pad1[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]))
            pl_d = dt * (Ad - Dd)
            lowbuf[P7IDX[d], :, :] = pl_d
            offsum = Dd if offsum is None else offsum + Dd
            rs = pl_d if rs is None else rs + pl_d
        cd = (ml_at(r0, top=top, bot=bot)
              + dt * (a7_body(P7IDX[CENTER], top=top) + offsum))
        lowbuf[P7IDX[CENTER], :, :] = cd
        rs = rs + cd
        _dma_all((lowbuf, low7_ref.at[:, ds8(r0, nr), :]))
        return jnp.minimum(c, jnp.min(rs))

    minrs = for_bands(trans, jnp.asarray(np.finfo(np.float32).max, dtype))
    inv_ref[:, :] = jnp.minimum(inv_ref[:, :], minrs)

    def low_diag(r0, *, top, bot):
        return a7raw[P7IDX[CENTER], :, :]

    bicgstab((X, R, Z, P, RP, RN, B, W), staged_at,
             ILU_s if precond == "dct" else None, low_diag, bsq_u, low7_ref)
    # u_low stays in STH[X]

    # ---- ChebSI du/dt on M du = -A u_low (helpers.py:143-185/1812-1815) --
    def mdinv(r0, *, top, bot):
        return 1.0 / (1.25 * plane_at(CENTER, 1.0, 0.0, r0, top=top, bot=bot))

    def cheb_prep_reads(r0, bs):
        return [_a7_cp(a7h_ref, r0, bs),
                _halo_cp(sth_ref.at[X], r0, bs)]

    def cheb_prep(r0, top, bot, o, bs, c):
        pad_fill_p(pad1, bs, o, top=top, bot=bot)
        rdot = -apply_at(staged_at_of(bs), pad1, r0, top=top, bot=bot)
        bs[1][:, :] = rdot
        # iter 1 (om=1, yold=ymid=0): y1 = rdot * Mdinv
        bs[2][:, :] = rdot * mdinv(r0, top=top, bot=bot)
        _dma_all((bs[1], sth_ref.at[B, ds8(r0, nr), :]),
                 (bs[2], sth_ref.at[P, ds8(r0, nr), :]))
        return c

    for_bands_pipe(cheb_prep_reads, cheb_prep)

    lmin, lmax = 0.5, 2.0
    rho_c = (lmax - lmin) / (lmax + lmin)
    rc2 = rho_c * rho_c

    def cheb_step(ymid, yold, ynew, om):
        """ynew = om*(Mdinv*(b - M ymid) + ymid - yold) + yold, banded
        (pipelined: ynew is never ymid, so the next band's halo prefetch of
        ymid can't race this band's ynew store)."""

        def p_reads(r0, bs):
            return [_halo_cp(sth_ref.at[ymid], r0, bs),
                    _body_cp(sth_ref.at[B], r0, bs[1], bs),
                    _body_cp(sth_ref.at[yold], r0, bs[2], bs)]

        def p(r0, top, bot, o, bs, c):
            pad_fill_p(pad1, bs, o, top=top, bot=bot)
            rr = bs[1][:, :] - apply_at(mass_at, pad1, r0, top=top, bot=bot)
            ym = pad1[1 : nr + 1, 1 : n + 1]
            bs[3][:, :] = (om * (rr * mdinv(r0, top=top, bot=bot)
                                 + ym - bs[2][:, :]) + bs[2][:, :])
            cpw = _dma(bs[3], sth_ref.at[ynew, ds8(r0, nr), :])
            cpw.wait()
            return c

        for_bands_pipe(p_reads, p)

    # iter 2: yold = 0, ymid = y1 (slot P) -> W; thereafter pairs of steps
    # with fixed alternating roles (P, W) so no swap pass is needed; result
    # parity: after iter 2 the pair (yold, ymid) = (P, W), each pair of
    # steps restores it, and the final ymid lands in W for even cheb_iters
    # (asserted by the wrapper).
    du_slot = P
    if cheb_iters >= 2:
        om2 = 1.0 / (1.0 - rc2 / 2.0)

        def p_it2_reads(r0, bs):
            return [_halo_cp(sth_ref.at[P], r0, bs),
                    _body_cp(sth_ref.at[B], r0, bs[1], bs)]

        def p_it2(r0, top, bot, o, bs, c):
            pad_fill_p(pad1, bs, o, top=top, bot=bot)
            rr = bs[1][:, :] - apply_at(mass_at, pad1, r0, top=top, bot=bot)
            bs[3][:, :] = om2 * (rr * mdinv(r0, top=top, bot=bot)
                                 + pad1[1 : nr + 1, 1 : n + 1])
            cpw = _dma(bs[3], sth_ref.at[W, ds8(r0, nr), :])
            cpw.wait()
            return c

        for_bands_pipe(p_it2_reads, p_it2)
        du_slot = W

        npairs = (cheb_iters - 2) // 2

        def pair(_, om):
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            cheb_step(W, P, P, om)          # y_{k}: roles (yold,ymid)=(W,P)
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            cheb_step(P, W, W, om)          # y_{k+1}: roles restored
            return om

        om = jnp.asarray(om2, dtype)
        if npairs:
            om = jax.lax.fori_loop(0, npairs, pair, om)
        if (cheb_iters - 2) % 2:
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            cheb_step(W, P, P, om)
            du_slot = P
    # du lives in STH[du_slot]

    # ---- fluxes + Zalesak + correction (helpers.py:1812-1872) ------------
    def okc(dj):
        if dj == 0:
            return None
        return cmsk_s[0:1, :] if dj > 0 else cmsk_s[1:2, :]

    def flux1(r0, top, bot, c):
        stage_a7(a7h_ref, r0, top=top, bot=bot, halo=True)
        stage_pad(sth_ref.at[X], r0, pad1, bx1, top=top, bot=bot)
        stage_pad(sth_ref.at[du_slot], r0, pad2, bx1, top=top, bot=bot)
        ul_b = pad1[1 : nr + 1, 1 : n + 1]
        du_b = pad2[1 : nr + 1, 1 : n + 1]
        if top or bot:
            row = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 0) + r0
            col = jax.lax.broadcasted_iota(jnp.int32, (nr, n), 1)
        p_pos = jnp.zeros((nr, n), dtype)
        p_neg = jnp.zeros((nr, n), dtype)
        u_max = ul_b
        u_min = ul_b
        for d in EDGE_NEIGHBOR_IDS:
            di, dj = OFFSETS[d]
            a7_pad(pad3, P7IDX[opposite(d)], top=top, bot=bot)
            Dd = jnp.maximum(0.0, jnp.maximum(
                a7_body(P7IDX[d], top=top),
                pad3[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]))
            F = (mass_at(d, r0, top=top, bot=bot)
                 * (du_b - pad2[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n])
                 + Dd * (ul_b - pad1[1 + di : 1 + di + nr,
                                     1 + dj : 1 + dj + n]))
            p_pos = p_pos + jnp.maximum(F, 0.0)
            p_neg = p_neg + jnp.minimum(F, 0.0)
            if top or bot:
                ok = ((row + di >= 0) & (row + di < n)
                      & (col + dj >= 0) & (col + dj < n))
                okv = jnp.where(ok, 1.0, 0.0).astype(dtype)
            else:
                okv = okc(dj)
                okv = jnp.ones((1, n), dtype) if okv is None else okv
            nbr_v = pad1[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]
            nbr = okv * nbr_v + (1.0 - okv) * ul_b
            u_max = jnp.maximum(u_max, nbr)
            u_min = jnp.minimum(u_min, nbr)
        mlb = ml_at(r0, top=top, bot=bot)
        q_pos = u_max - ul_b
        q_neg = u_min - ul_b
        den_pos = dt * p_pos  # branch on the PRODUCT (f32 underflow; fct.py)
        r_pos = jnp.where(
            den_pos > 0.0,
            jnp.minimum(1.0, mlb * q_pos
                        / jnp.where(den_pos > 0.0, den_pos, 1.0)), 1.0)
        den_neg = dt * p_neg
        r_neg = jnp.where(
            den_neg < 0.0,
            jnp.minimum(1.0, mlb * q_neg
                        / jnp.where(den_neg < 0.0, den_neg, 1.0)), 1.0)
        braw1[:, :] = r_pos
        braw2[:, :] = r_neg
        _dma_all((braw1, sth_ref.at[RP, ds8(r0, nr), :]),
                 (braw2, sth_ref.at[RN, ds8(r0, nr), :]))
        return c

    for_bands(flux1)

    def flux2(r0, top, bot, c):
        stage_a7(a7h_ref, r0, top=top, bot=bot, halo=True)
        stage_pad(sth_ref.at[X], r0, pad1, bx1, top=top, bot=bot)
        stage_pad(sth_ref.at[du_slot], r0, pad2, bx1, top=top, bot=bot)
        stage_pad(sth_ref.at[RP], r0, pad4, bx1, top=top, bot=bot,
                  border=1.0)
        ul_b = pad1[1 : nr + 1, 1 : n + 1]
        du_b = pad2[1 : nr + 1, 1 : n + 1]
        r_pos = pad4[1 : nr + 1, 1 : n + 1]
        fbar = jnp.zeros((nr, n), dtype)
        stage_pad(sth_ref.at[RN], r0, pad5, bx1, top=top, bot=bot,
                  border=1.0)
        r_neg = pad5[1 : nr + 1, 1 : n + 1]
        for d in EDGE_NEIGHBOR_IDS:
            di, dj = OFFSETS[d]
            a7_pad(pad3, P7IDX[opposite(d)], top=top, bot=bot)
            Dd = jnp.maximum(0.0, jnp.maximum(
                a7_body(P7IDX[d], top=top),
                pad3[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n]))
            F = (mass_at(d, r0, top=top, bot=bot)
                 * (du_b - pad2[1 + di : 1 + di + nr, 1 + dj : 1 + dj + n])
                 + Dd * (ul_b - pad1[1 + di : 1 + di + nr,
                                     1 + dj : 1 + dj + n]))
            lim_p = jnp.minimum(r_pos, pad5[1 + di : 1 + di + nr,
                                            1 + dj : 1 + dj + n])
            lim_n = jnp.minimum(r_neg, pad4[1 + di : 1 + di + nr,
                                            1 + dj : 1 + dj + n])
            fbar = fbar + jnp.where(F > 0.0, lim_p * F,
                                    jnp.where(F < 0.0, lim_n * F, 0.0))
        braw2[:, :] = ul_b + dt * fbar / ml_at(r0, top=top, bot=bot)
        write_band(sth_ref.at[U], r0, braw2)
        return c

    for_bands(flux2)
    _dma_all((sth_ref.at[U], uout_ref.at[i]))


def fused_chemotaxis_forward_sweep_xxl(
        c_traj, u0, v0, *, h, dt, Dm, Df, delta, chi, eta, rescaling,
        tol=1e-6, iters=60, cheb_iters=20, reaction=None, precond="dct",
        nb=None, vmem_limit_mb=127, quad_degree=4, with_stats=False):
    """HBM-streamed banded chemotaxis forward sweep (the >= 2048^2 tier):
    ONE pallas_call, state slots and both stencil copies in HBM, small
    fixed VMEM staging set. Mathematically identical to
    fused_chemotaxis_forward_sweep_xl (helpers.py:1321-1385), whose VMEM
    slot file stops fitting past 1024^2 f32."""
    if reaction is not None:
        raise NotImplementedError(
            "XXL streamed kernels: plain Keller-Segel only (reaction hooks "
            "route to the XL tier or the XLA path)")
    n = u0.shape[-1]
    steps = c_traj.shape[0] - 1
    if nb is None:
        # nr = 64 keeps the per-region register-allocator spill pools small
        # (measured at 2048^2: nr=128 -> 68 MB of spill slots alone, VMEM
        # OOM by 31 MB; the pools scale with the band height)
        nb = max(4, n // 64)
    nr = n // nb
    if n % nb or nr % 8 or nb < 2 or (nb > 2 and nr < 8):
        raise ValueError(f"grid {n} not divisible into {nb} sublane-aligned "
                         "bands")
    wts4, bary4, grads = _quad_consts(quad_degree, h)
    wts4 = wts4 * h * h
    kern = functools.partial(
        _fwd_sweep_kernel_xxl, n=n, nb=nb, h2=h * h, dt=dt, Dm=Dm, Df=Df,
        delta=delta, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4,
        grads=grads, precond=precond,
    )
    C = dct_matrix(n)
    C2 = jnp.asarray(np.stack([C, C.T]), dtype=jnp.bfloat16)
    ilam_u = jnp.asarray(
        dct_precond_ilam(n, h, dt, Dm, 1.0), dtype=jnp.bfloat16)
    ilam_v = jnp.asarray(
        dct_precond_ilam(n, h, dt, Df, 1.0 + dt * delta), dtype=jnp.bfloat16)
    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    dtype = u0.dtype
    u_traj, v_traj, inv, _sth, _a7, _low = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, n, n), dtype),
            jax.ShapeDtypeStruct((steps, n, n), dtype),
            _inv_shape(dtype),
            jax.ShapeDtypeStruct((10, n, n), dtype),   # STH slot file
            jax.ShapeDtypeStruct((7, n, n), dtype),    # raw A
            jax.ShapeDtypeStruct((7, n, n), dtype),    # Low
        ),
        in_specs=[hbm] * 6,
        out_specs=(hbm, hbm, _inv_spec(), hbm, hbm, hbm),
        scratch_shapes=[
            pltpu.VMEM((2, n, n), jnp.bfloat16),       # {C, C^T}
            pltpu.VMEM((n, n), jnp.bfloat16),          # ilam_u
            pltpu.VMEM((n, n), jnp.bfloat16),          # ilam_v
            pltpu.VMEM((n, n), dtype),                 # ACC1
            pltpu.VMEM((n, n), dtype),                 # ACC2
            pltpu.VMEM((8, n), dtype),                 # column masks
            pltpu.VMEM((nr + 2, n + 2), dtype),        # band pads
            pltpu.VMEM((nr + 2, n + 2), dtype),
            pltpu.VMEM((nr + 2, n + 2), dtype),
            pltpu.VMEM((nr + 2, n + 2), dtype),
            pltpu.VMEM((nr + 2, n + 2), dtype),
            pltpu.VMEM((nr + 2, n), dtype),            # lane-offset-0 pads
            pltpu.VMEM((nr + 2, n), dtype),
            pltpu.VMEM((nr, n), dtype),                # band buffers (set 0)
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((nr, n), dtype),                # band buffers (set 1)
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((nr, n), dtype),
            pltpu.VMEM((7, nr, n), dtype),             # staged stencil (set 0)
            pltpu.VMEM((7, nr, n), dtype),             # staged stencil (set 1)
            pltpu.VMEM((7, nr, n), dtype),             # Low band out
            pltpu.VMEM((7, nr + 16, n), dtype),        # halo-staged stencil
            pltpu.VMEM((nr + 16, n), dtype),           # halo landings (per set)
            pltpu.VMEM((nr + 16, n), dtype),
            pltpu.SemaphoreType.DMA(()),               # serial-pass DMAs
            pltpu.SemaphoreType.DMA(()),               # pipelined reads, set 0
            pltpu.SemaphoreType.DMA(()),               # pipelined reads, set 1
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_mb) * 1024 * 1024,
        ),
        interpret=_interp(),
    )(c_traj[1:], u0, v0, C2, ilam_u, ilam_v)
    out = (jnp.concatenate([u0[None], u_traj], axis=0),
           jnp.concatenate([v0[None], v_traj], axis=0))
    return out + (jnp.min(inv),) if with_stats else out
