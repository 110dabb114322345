"""Distributed (multi-chip) fused FCT sweep: Pallas + inter-chip RDMA.

The single-chip whole-sweep kernels (ops/pallas_fused.py) keep every vector
VMEM-resident and amortize kernel-dispatch over the whole time loop — but
they are single-core: under GSPMD sharding the models fall back to the XLA
path, whose per-iteration HBM round-trips dominate at large grids
(roadmap.md "multi-chip fast path"). This module is that fast path: each
ENTIRE sweep — chemotaxis/Mimura forward and adjoint
(helpers.py:1321-1581), Schnakenberg forward and adjoint
(helpers.py:511-698), and the single-field scalar FCT sweep (nonlinear
state/adjoint, linear advection state/adjoint; helpers.py:881-1038) —
runs as ONE ``pallas_call`` per device under ``shard_map`` over a 1-D
device axis, with

- **row-block domain decomposition**: device ``k`` of ``nd`` owns rows
  ``[k*nl, (k+1)*nl)`` of every (n, n) field (nl = n // nd),
- **explicit halo exchange** over ICI via ``pltpu.make_async_remote_copy``
  (one row up/down per stencil apply; two rows for the P1 assembly, whose
  cells straddle the cut),
- **credit-based flow control**: a neighbor may overwrite my halo buffer
  only after I signal that the previous message was consumed (a REGULAR
  semaphore per direction), which makes the exchange safe inside
  data-dependent ``while_loop`` solver iterations where double-buffering
  by parity is impossible,
- **deterministic distributed reductions** for the Krylov dot products:
  each device broadcasts its partial to all peers (all-to-all of one
  (1, 128) row, scalars packed in lanes) and every device reduces the
  partials in GLOBAL device order, so the reduced value is bitwise
  identical everywhere and the tolerance-based ``while_loop`` exits in
  lockstep on all chips.

The chemotaxis-family Krylov solves run the spectral DCT preconditioner
ON the distributed path (``precond="dct"``, the default): 4 local MXU
matmuls + 2 distributed transposes per apply, where the distributed
transpose is a credit-based all-to-all of locally transposed (nl, nl)
tiles (``dtranspose`` / ``_dct_pinv_dist``). The remaining sweeps are
Jacobi-preconditioned (the low-order matrix is an M-matrix, so
Jacobi-BiCGStab converges in a handful of iterations regardless). A 2-D
(rows x cols) mesh auto-routes every entry point to ops/pallas_dist2d.py.

Correctness is pinned by tests/test_pallas_dist.py: the sweep on an
``xla_force_host_platform_device_count`` CPU mesh (TPU interpret mode
simulates the remote DMAs and semaphores) matches the single-device XLA
path to solver tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from fem_fct_pdeco_tpu.grid import CENTER, EDGE_NEIGHBOR_IDS, OFFSETS, opposite
from fem_fct_pdeco_tpu.ops.assembly import TRI_CORNERS, _offset_index
from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS
from fem_fct_pdeco_tpu.ops.pallas_fused import (
    _INV_BLOCK, _inv_init, _inv_shape, _inv_spec, _moments, _quad_consts,
    _safe_div)


# Flip on (tests) to run the interpret-mode data-race detector over the
# credit-based flow-control protocol.
_DETECT_RACES = False


def _dist_interp():
    """TPU interpret mode (simulates RDMA + semaphores) off-TPU."""
    if jax.default_backend() == "tpu":
        return False
    return pltpu.InterpretParams(detect_races=_DETECT_RACES)


def _sync_interpret(*arrays):
    """Interpret mode ONLY: materialize a dist sweep's outputs before
    returning them. Dependent eager work queued while the interpreter's
    io_callback store threads are still in flight can deadlock the host
    executor (observed deterministically on a 1-CPU host with a warm
    compile cache: four callback threads blocked in interpret store, the
    main thread blocked dispatching a dependent primitive). Serializing
    at the sweep boundary removes the hazard; no-op on real TPU. Inside
    an outer trace (the models' jitted sweeps) this is a no-op too —
    ModelBase._call_sweep syncs after the jitted call instead."""
    if _dist_interp():
        leaves = jax.tree_util.tree_leaves(arrays)
        if any(isinstance(a, jax.core.Tracer) for a in leaves):
            return
        jax.block_until_ready(arrays)


# ---------------------------------------------------------------------------
# Rectangular in-kernel P1 assembly building blocks (row-extended fields)
# ---------------------------------------------------------------------------


def _corners_rect(val, ncr, ncc):
    """Per-cell corner values of an (nr, nc) field block."""
    return [
        [val[ai : ai + ncr, aj : aj + ncc] for (ai, aj) in TRI_CORNERS[t]]
        for t in range(2)
    ]


def _corner_products_rect(cs, t):
    prods = [cs[0][t][i] for i in range(3)]
    for m in range(1, len(cs)):
        fm = cs[m][t]
        prods = [p * fm[j] for p in prods for j in range(3)]
    return prods


def _lf_prod_rect(fields, *, ncr, ncc, h2, cmask, scale=1.0):
    """Rect analogue of pallas_fused._lf_prod: the (ncr+1, ncc+1) load block
    of scale * integral of (prod_k f_k,h) phi_a over the cell block.
    ``cmask``: (ncr, 1) validity of each cell row — cells whose global row
    falls outside the domain (the edge devices' halo rows) must contribute
    NOTHING even though their inside corners hold real values."""
    k = len(fields)
    T = _moments(k + 1) * h2
    cs = [_corners_rect(f, ncr, ncc) for f in fields]
    out = None
    for t in range(2):
        prods = _corner_products_rect(cs, t)
        contribs = [None, None, None]
        for flat, idx in enumerate(np.ndindex(*((3,) * k))):
            p = prods[flat]
            for a in range(3):
                w = scale * float(T[idx + (a,)])
                add = w * p
                contribs[a] = add if contribs[a] is None else contribs[a] + add
        for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
            placed = jnp.pad(contribs[a] * cmask, ((ai, 1 - ai), (aj, 1 - aj)))
            out = placed if out is None else out + placed
    return out


def _wm_prod_rect(fields, *, ncr, ncc, h2, cmask, scale=1.0):
    """Rect/masked analogue of pallas_fused._wm_prod: the 9 stencil plane
    VALUES ((ncr+1, ncc+1) each, None where structurally zero) of
    scale * integral of (prod_k f_k,h) phi_a phi_b."""
    k = len(fields)
    T = _moments(k + 2) * h2
    cs = [_corners_rect(f, ncr, ncc) for f in fields]
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        prods = _corner_products_rect(cs, t)
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                vab = None
                for flat, idx in enumerate(np.ndindex(*((3,) * k))):
                    w = scale * float(T[idx + (a, b)])
                    add = w * prods[flat]
                    vab = add if vab is None else vab + add
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(vab * cmask, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _assemble_forward_A_rect(u, v, K_ref, A_ref, *, ncr, ncc, Dm, chi, eta,
                             wts, bary, grads, cmask):
    """Row-extended analogue of pallas_fused._assemble_forward_A: write
    A = Dm*K - chi (e^{-eta u} grad v_h . grad phi_a, phi_b) for the
    (ncr+1, ncc+1) node block covered by the given cell block. ``K_ref`` and
    ``A_ref`` are (9, ncr+1, ncc+1) (ext-node-row aligned). ``cmask``:
    (ncr, 1) global cell-row validity (see _lf_prod_rect); K's phantom rows
    are already zero, so only the advective part needs the mask."""
    planes = [None] * 9
    uc2, vc2 = _corners_rect(u, ncr, ncc), _corners_rect(v, ncr, ncc)
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc, vc = uc2[t], vc2[t]
        # python-float scalars keep weak dtypes (no f32 -> f64 promotion
        # when x64 is enabled and the fields are f32)
        gvx = sum(vc[a] * float(grads[t, a, 0]) for a in range(3))
        gvy = sum(vc[a] * float(grads[t, a, 1]) for a in range(3))
        Vb = [None] * 3
        for q in range(len(wts)):
            uq = (float(bary[q, 0]) * uc[0] + float(bary[q, 1]) * uc[1]
                  + float(bary[q, 2]) * uc[2])
            e = float(wts[q]) * jnp.exp(-eta * uq)
            for b in range(3):
                contrib = float(bary[q, b]) * e
                Vb[b] = contrib if Vb[b] is None else Vb[b] + contrib
        Vb = [vb * cmask for vb in Vb]
        for a, (ai, aj) in enumerate(corners):
            ga = ((-chi * float(grads[t, a, 0])) * gvx
                  + (-chi * float(grads[t, a, 1])) * gvy)
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(ga * Vb[b], ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    for d in range(9):
        base = Dm * K_ref[d, :, :]
        A_ref[d, :, :] = base if planes[d] is None else base + planes[d]


# ---------------------------------------------------------------------------
# Adjoint-side rectangular assembly (transposed pairing)
# ---------------------------------------------------------------------------


def _assemble_adjoint_A_rect(u, v, K_ref, A_ref, *, ncr, ncc, Dm, chi, eta,
                             wts, bary, grads, cmask):
    """Rect/masked analogue of the matrix part of
    pallas_fused._assemble_adjoint_A_and_load: Mat_p = Dm K - chi
    ((1-eta u)e^{-eta u} grad v_h . grad phi_TRIAL, phi_TEST) — the
    transposed pairing of the forward advective stencil
    (helpers.py:1499-1503)."""
    planes = [None] * 9
    uc2, vc2 = _corners_rect(u, ncr, ncc), _corners_rect(v, ncr, ncc)
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc, vc = uc2[t], vc2[t]
        gvx = sum(vc[a] * float(grads[t, a, 0]) for a in range(3))
        gvy = sum(vc[a] * float(grads[t, a, 1]) for a in range(3))
        Va = [None] * 3
        for q in range(len(wts)):
            uq = (float(bary[q, 0]) * uc[0] + float(bary[q, 1]) * uc[1]
                  + float(bary[q, 2]) * uc[2])
            e = float(wts[q]) * (1.0 - eta * uq) * jnp.exp(-eta * uq)
            for a in range(3):
                contrib = float(bary[q, a]) * e
                Va[a] = contrib if Va[a] is None else Va[a] + contrib
        Va = [va * cmask for va in Va]
        gb3 = [
            (-chi * float(grads[t, b, 0])) * gvx
            + (-chi * float(grads[t, b, 1])) * gvy
            for b in range(3)
        ]
        for a, (ai, aj) in enumerate(corners):
            for b, (bi, bj) in enumerate(corners):
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(gb3[b] * Va[a], ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    for d in range(9):
        base = Dm * K_ref[d, :, :]
        A_ref[d, :, :] = base if planes[d] is None else base + planes[d]


def _q_load_rect(p_n, u, *, ncr, ncc, chi, eta, wts, bary, grads, cmask):
    """Rect/masked analogue of pallas_fused._q_load:
    (chi u_h e^{-eta u_h} grad p_h . grad phi_a) (helpers.py:1531-1532)."""
    uc2, pc2 = _corners_rect(u, ncr, ncc), _corners_rect(p_n, ncr, ncc)
    load = None
    for t in range(2):
        corners = TRI_CORNERS[t]
        uc, pc = uc2[t], pc2[t]
        gpx = sum(pc[a] * float(grads[t, a, 0]) for a in range(3))
        gpy = sum(pc[a] * float(grads[t, a, 1]) for a in range(3))
        gsum = None
        for q in range(len(wts)):
            uq = (float(bary[q, 0]) * uc[0] + float(bary[q, 1]) * uc[1]
                  + float(bary[q, 2]) * uc[2])
            g = float(wts[q]) * chi * uq * jnp.exp(-eta * uq)
            gsum = g if gsum is None else gsum + g
        gsum = gsum * cmask
        for a, (ai, aj) in enumerate(corners):
            ga = float(grads[t, a, 0]) * gpx + float(grads[t, a, 1]) * gpy
            placed = jnp.pad(gsum * ga, ((ai, 1 - ai), (aj, 1 - aj)))
            load = placed if load is None else load + placed
    return load


# ---------------------------------------------------------------------------
# Shared per-device machinery: halo exchange, distributed reductions,
# halo-extended stencil applies, distributed Krylov, the FCT tail
# ---------------------------------------------------------------------------


def _make_ops(*, axis, n, nl, nd, tol, iters, dtype,
              hpad_ref, sbuf_up, sbuf_dn, rtop, rbot, dot_s, dot_r,
              hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
              credit_up, credit_dn, credit_dot,
              tsend=None, trecv=None, tsend_sem=None, trecv_sem=None,
              credit_tr=None):
    """Build the communication and solver closures shared by the forward
    and adjoint sweep kernels (see the module docstring for the protocol)."""
    import types

    me = jax.lax.axis_index(axis)
    has_up = me > 0
    has_dn = me < nd - 1
    LOGICAL = pltpu.DeviceIdType.LOGICAL

    def init_buffers():
        hpad_ref[:, :] = jnp.zeros_like(hpad_ref)
        rtop[:, :] = jnp.zeros_like(rtop)
        rbot[:, :] = jnp.zeros_like(rbot)

    def init_credits():
        """Grant every peer one send token (my buffers start free); call
        inside pl.when(i == 0)."""
        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(credit_dn, inc=1, device_id=me - 1,
                                   device_id_type=LOGICAL)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(credit_up, inc=1, device_id=me + 1,
                                   device_id_type=LOGICAL)

        if nd > 1:
            for o in range(1, nd):
                src = (me - o + nd) % nd
                pltpu.semaphore_signal(credit_dot.at[o - 1], inc=1,
                                       device_id=src, device_id_type=LOGICAL)
        if credit_tr is not None and nd > 1:
            for o in range(1, nd):
                src = (me - o + nd) % nd
                pltpu.semaphore_signal(credit_tr.at[o - 1], inc=1,
                                       device_id=src, device_id_type=LOGICAL)

    def drain():
        """Consume the outstanding tokens so every semaphore exits at zero;
        call inside pl.when(i == last). Also asserts the protocol
        invariant: exactly one credit per peer in flight between
        exchanges."""
        @pl.when(has_up)
        def _():
            pltpu.semaphore_wait(credit_up, 1)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_wait(credit_dn, 1)

        if nd > 1:
            for o in range(1, nd):
                pltpu.semaphore_wait(credit_dot.at[o - 1], 1)
        if credit_tr is not None and nd > 1:
            for o in range(1, nd):
                pltpu.semaphore_wait(credit_tr.at[o - 1], 1)

    def exchange_bufs(k):
        """Exchange the first ``k`` pre-written rows of sbuf_up/sbuf_dn with
        the neighbors; return (top_halo, bot_halo) values ((k, n) each,
        zeros at the global domain edge)."""
        up_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_up.at[0:k, :], dst_ref=rbot.at[0:k, :],
            send_sem=hsend_sem.at[0], recv_sem=hrecv_sem.at[0],
            device_id=me - 1, device_id_type=LOGICAL)
        dn_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_dn.at[0:k, :], dst_ref=rtop.at[0:k, :],
            send_sem=hsend_sem.at[1], recv_sem=hrecv_sem.at[1],
            device_id=me + 1, device_id_type=LOGICAL)

        @pl.when(has_up)
        def _():
            pltpu.semaphore_wait(credit_up, 1)
            up_d.start()

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_wait(credit_dn, 1)
            dn_d.start()

        # my top halo arrives from (me-1)'s down-send, which signals
        # hrecv_sem[1] here — the recv leg of MY dn descriptor; and
        # symmetrically for the bottom halo
        @pl.when(has_up)
        def _():
            dn_d.wait_recv()
            up_d.wait_send()

        @pl.when(has_dn)
        def _():
            up_d.wait_recv()
            dn_d.wait_send()

        th = rtop[0:k, :] + 0.0
        bh = rbot[0:k, :] + 0.0

        # consumed: grant the senders a new token
        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(credit_dn, inc=1, device_id=me - 1,
                                   device_id_type=LOGICAL)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(credit_up, inc=1, device_id=me + 1,
                                   device_id_type=LOGICAL)

        return th, bh

    def exchange(top_send, bot_send):
        k = top_send.shape[0]
        sbuf_up[0:k, :] = top_send
        sbuf_dn[0:k, :] = bot_send
        return exchange_bufs(k)

    def dist_sums(*scalars):
        """Global sums of up to 8 packed scalars, bitwise identical on every
        device (partials reduced in global device order)."""
        if nd == 1:
            return scalars
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), dtype=dtype)
        for t, sc in enumerate(scalars):
            row = jnp.where(lane == t, sc, row)
        dot_s[0:1, :] = row
        descs = []
        for o in range(1, nd):
            dst = (me + o) % nd
            d_ = pltpu.make_async_remote_copy(
                src_ref=dot_s.at[0:1, :], dst_ref=dot_r.at[o - 1 : o, :],
                send_sem=dsend_sem.at[o - 1], recv_sem=drecv_sem.at[o - 1],
                device_id=dst, device_id_type=LOGICAL)
            pltpu.semaphore_wait(credit_dot.at[o - 1], 1)
            d_.start()
            descs.append(d_)
        for d_ in descs:
            d_.wait_recv()
            d_.wait_send()
        total = jnp.zeros((1, 128), dtype=dtype)
        own = dot_s[0:1, :] + 0.0
        for dev in range(nd):
            o = (me - dev + nd) % nd
            slot = jnp.maximum(o - 1, 0)
            r = dot_r[pl.ds(slot, 1), :]
            total = total + jnp.where(o == 0, own, r)
        for o in range(1, nd):
            src = (me - o + nd) % nd
            pltpu.semaphore_signal(credit_dot.at[o - 1], inc=1,
                                   device_id=src, device_id_type=LOGICAL)
        return tuple(total[0, t] for t in range(len(scalars)))

    def dtranspose(x):
        """Distributed transpose of the row-block-distributed (nl, n) field
        ``x``: returns my (nl, n) row block of x^T. All-to-all of locally
        transposed (nl, nl) tiles over the ring (same credit discipline as
        dist_sums), safe inside data-dependent solver while_loops."""
        # stage every tile, transposed: tile p = x[:, p nl : (p+1) nl]^T
        for p in range(nd):
            tsend[p] = jnp.transpose(x[:, p * nl : (p + 1) * nl])
        if nd == 1:
            return tsend[0] + 0.0
        # own tile lands locally in my source slot
        trecv[pl.ds(me, 1)] = tsend[pl.ds(me, 1)]
        descs = []
        for o in range(1, nd):
            dst = (me + o) % nd
            d_ = pltpu.make_async_remote_copy(
                src_ref=tsend.at[pl.ds(dst, 1)],
                dst_ref=trecv.at[pl.ds(me, 1)],
                send_sem=tsend_sem.at[o - 1], recv_sem=trecv_sem.at[o - 1],
                device_id=dst, device_id_type=LOGICAL)
            pltpu.semaphore_wait(credit_tr.at[o - 1], 1)
            d_.start()
            descs.append(d_)
        for d_ in descs:
            d_.wait_recv()
            d_.wait_send()
        out = jnp.concatenate(
            [trecv[src] for src in range(nd)], axis=1)
        for o in range(1, nd):
            src = (me - o + nd) % nd
            pltpu.semaphore_signal(credit_tr.at[o - 1], inc=1,
                                   device_id=src, device_id_type=LOGICAL)
        return out

    def fill_hpad(x, th, bh):
        hpad_ref[1 : nl + 1, 1 : n + 1] = x
        hpad_ref[0:1, 1 : n + 1] = th
        hpad_ref[nl + 1 : nl + 2, 1 : n + 1] = bh

    def window(d):
        di, dj = OFFSETS[d]
        return hpad_ref[1 + di : 1 + di + nl, 1 + dj : 1 + dj + n]

    def plane_sum(S_at, x):
        acc = S_at(CENTER) * x
        for d in range(9):
            if d == CENTER or d in ANTI_DIAGONAL_IDS:
                continue
            acc = acc + S_at(d) * window(d)
        return acc

    def make_apply(S_ref):
        S_at = lambda d: S_ref[d, :, :]

        def apply(x):
            th, bh = exchange(x[0:1, :], x[nl - 1 : nl, :])
            fill_hpad(x, th, bh)
            return plane_sum(S_at, x)

        return apply

    def dbicgstab(apply_A, prec, b, x0):
        Pinv = prec if callable(prec) else (lambda r_: prec * r_)
        x = x0
        r = b - apply_A(x)
        rhat = r
        rho, bb, rr = dist_sums(jnp.sum(rhat * r), jnp.sum(b * b),
                                jnp.sum(r * r))
        atol2 = tol * tol * bb

        def cond(c):
            k, x, r, p_, rho, rn2 = c
            return (k < iters) & (rn2 > atol2)

        def body(c):
            k, x, r, p_, rho, _ = c
            phat = Pinv(p_)
            v = apply_A(phat)
            (rv,) = dist_sums(jnp.sum(rhat * v))
            alpha = _safe_div(rho, rv)
            s = r - alpha * v
            shat = Pinv(s)
            t2 = apply_A(shat)
            ts, tt = dist_sums(jnp.sum(t2 * s), jnp.sum(t2 * t2))
            omega = _safe_div(ts, tt)
            x2 = x + alpha * phat + omega * shat
            r2 = s - omega * t2
            rho2, rn2 = dist_sums(jnp.sum(rhat * r2), jnp.sum(r2 * r2))
            beta = _safe_div(rho2, rho) * _safe_div(alpha, omega)
            p2 = r2 + beta * (p_ - omega * v)
            return k + 1, x2, r2, p2, rho2, rn2

        init = (jnp.asarray(0, jnp.int32), x, r, r, rho, rr)
        _, x, *_ = jax.lax.while_loop(cond, body, init)
        return x

    def dcg(apply_A, prec, b, x0):
        Pinv = prec if callable(prec) else (lambda r_: prec * r_)
        x = x0
        r = b - apply_A(x)
        z = Pinv(r)
        rz, bb, rr = dist_sums(jnp.sum(r * z), jnp.sum(b * b),
                               jnp.sum(r * r))
        atol2 = tol * tol * bb

        def cond(c):
            k, x, r, z, p_, rz, rn2 = c
            return (k < iters) & (rn2 > atol2)

        def body(c):
            k, x, r, z, p_, rz, _ = c
            Ap = apply_A(p_)
            (pAp,) = dist_sums(jnp.sum(p_ * Ap))
            alpha = _safe_div(rz, pAp)
            x2 = x + alpha * p_
            r2 = r - alpha * Ap
            z2 = Pinv(r2)
            rz2, rn2 = dist_sums(jnp.sum(r2 * z2), jnp.sum(r2 * r2))
            beta = _safe_div(rz2, rz)
            p2 = z2 + beta * p_
            return k + 1, x2, r2, z2, p2, rz2, rn2

        init = (jnp.asarray(0, jnp.int32), x, r, z, z, rz, rr)
        _, x, *_ = jax.lax.while_loop(cond, body, init)
        return x

    return types.SimpleNamespace(
        me=me, has_up=has_up, has_dn=has_dn, row0=me * nl,
        init_buffers=init_buffers, init_credits=init_credits, drain=drain,
        exchange_bufs=exchange_bufs, exchange=exchange, dist_sums=dist_sums,
        fill_hpad=fill_hpad, window=window, plane_sum=plane_sum,
        make_apply=make_apply, dbicgstab=dbicgstab, dcg=dcg,
        dtranspose=dtranspose,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn)


def _dct_pinv_dist(ops, C_ref, ilam_ref, dtype):
    """Distributed spectral (DCT) preconditioner apply for row-block fields:
    r -> C^T ((C r C^T) * invLam) C via 4 LOCAL MXU matmuls + 2 distributed
    transposes (pallas_fused._make_dct_pinv semantics; ilam_ref holds MY
    nl rows of the symmetric modal-eigenvalue reciprocal)."""
    hi = jax.lax.Precision.DEFAULT

    def pinv(r):
        C = C_ref[:, :]
        # column transform: b = r C^T
        b = jax.lax.dot_general(r, C, (((1,), (1,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)
        bT = ops.dtranspose(b)
        # row transform (now local): d = (C r C^T)^T rows
        d = jax.lax.dot_general(bT, C, (((1,), (1,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)
        e = d * ilam_ref[:, :]
        # inverse column transform on the transposed layout: h = e C
        h = jax.lax.dot_general(e, C, (((1,), (0,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)
        hT = ops.dtranspose(h)
        # inverse row transform: out = h^T C (= C^T (..) C row block)
        return jax.lax.dot_general(hT, C, (((1,), (0,)), ((), ())),
                                   precision=hi, preferred_element_type=dtype)

    return pinv


def _dist_fct_tail(ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML,
                   u_prev, rhs, x0, *, n, nl, dt, cheb_iters, S=None,
                   prec=None, inv_ref=None):
    """Distributed FCT step tail, given the assembled flux matrix in the
    row-extended Aext_ref (ext row e = global row row0-2+e): artificial
    diffusion -> Low (in place, local rows) -> distributed BiCGStab ->
    Chebyshev du/dt -> halo-exchanged fluxes + Zalesak limiter. Mirrors
    pallas_fused._fct_core with the out-of-block accesses going through
    halo exchanges and the out-of-DOMAIN ones through global-row masks.
    ``S``: optional non-flux matrix as 9 LOCAL-row plane values (None
    entries structurally zero): enters Low but not the artificial
    diffusion or the antidiffusive du/dt right-hand side."""
    # artificial diffusion at local rows (needs the +-1 ext rows of A)
    offsum = None
    for d in range(9):
        if d == CENTER:
            continue
        di, dj = OFFSETS[d]
        hpad_ref[1 : nl + 1, 1 : n + 1] = Aext_ref[
            opposite(d), 2 + di : 2 + di + nl, :]
        Atr = hpad_ref[1 : nl + 1, 1 + dj : 1 + dj + n]
        Dd = jnp.maximum(0.0, jnp.maximum(Aext_ref[d, 2 : nl + 2, :], Atr))
        D_ref[d, :, :] = Dd
        offsum = Dd if offsum is None else offsum + Dd
    D_ref[CENTER, :, :] = -offsum
    # restore the hpad zero border invariant after the row writes above
    hpad_ref[1 : nl + 1, 1 : n + 1] = jnp.zeros((nl, n), dtype=u_prev.dtype)

    # transform local A rows -> Low in place: Low = diag(ML) + dt (A - D + S)
    for d in range(9):
        plane = Aext_ref[d, 2 : nl + 2, :] - D_ref[d, :, :]
        if S is not None and S[d] is not None:
            plane = plane + S[d]
        plane = dt * plane
        if d == CENTER:
            plane = plane + ML
        Aext_ref[d, 2 : nl + 2, :] = plane
    if inv_ref is not None:
        # always-on M-matrix telemetry (helpers.py:1784-1810): min LOCAL
        # row sum of Low, min-accumulated across the sweep; the host
        # reduces the per-device blocks to the global min
        rs = None
        for d in range(9):
            pl_ = Aext_ref[d, 2 : nl + 2, :]
            rs = pl_ if rs is None else rs + pl_
        inv_ref[:, :] = jnp.minimum(inv_ref[:, :], jnp.min(rs))

    low_at = lambda d: Aext_ref[d, 2 : nl + 2, :]

    def apply_low(x):
        th, bh = ops.exchange(x[0:1, :], x[nl - 1 : nl, :])
        ops.fill_hpad(x, th, bh)
        return ops.plane_sum(low_at, x)

    b = ML * u_prev + dt * rhs
    u_low = ops.dbicgstab(
        apply_low,
        prec if prec is not None else 1.0 / Aext_ref[CENTER, 2 : nl + 2, :],
        b, x0)

    # Chebyshev du/dt on M du = -A u_low + rhs (A = (Low-ML)/dt + D - S:
    # the flux matrix alone drives the antidiffusive du/dt)
    thl, bhl = ops.exchange(u_low[0:1, :], u_low[nl - 1 : nl, :])
    ops.fill_hpad(u_low, thl, bhl)
    low_x = ops.plane_sum(low_at, u_low)
    D_x = ops.plane_sum(lambda d: D_ref[d, :, :], u_low)
    A_x = (low_x - ML * u_low) / dt + D_x
    if S is not None:
        S_x = ops.plane_sum(
            lambda d: S[d] if S[d] is not None else jnp.zeros_like(u_low),
            u_low)
        A_x = A_x - S_x
    rdot = -A_x + rhs

    apply_M = ops.make_apply(M_ref)
    lmin, lmax = 0.5, 2.0
    rho_c = (lmax - lmin) / (lmax + lmin)
    rc2 = rho_c * rho_c
    om2 = 1.0 / (1.0 - rc2 / 2.0)
    Mdinv = 1.0 / (((lmin + lmax) / 2.0) * Md_ref[:, :])
    # iterations 1-2 peeled, 3.. as a fori_loop (same rationale and same
    # peeled form as pallas_fused._fct_core: collapses the dominant Mosaic
    # compile cost; concrete-layout carries)
    du = rdot * Mdinv
    if cheb_iters >= 2:
        rr_ = rdot - apply_M(du)
        du2 = om2 * (rr_ * Mdinv + du)

        def cheb_body(k, carry):
            yold, ymid, om, rdot_c, Mdinv_c = carry
            om = 1.0 / (1.0 - om * rc2 / 4.0)
            rr_ = rdot_c - apply_M(ymid)
            ynew = om * (rr_ * Mdinv_c + ymid - yold) + yold
            return ymid, ynew, om, rdot_c, Mdinv_c

        _, du, _, _, _ = jax.lax.fori_loop(
            2, cheb_iters, cheb_body,
            (du, du2, jnp.asarray(om2, rdot.dtype), rdot, Mdinv))

    # fluxes + Zalesak limiter (global-row-masked)
    ops.sbuf_up[0:1, :] = u_low[0:1, :]
    ops.sbuf_up[1:2, :] = du[0:1, :]
    ops.sbuf_dn[0:1, :] = u_low[nl - 1 : nl, :]
    ops.sbuf_dn[1:2, :] = du[nl - 1 : nl, :]
    th2, bh2 = ops.exchange_bufs(2)
    ops.fill_hpad(u_low, th2[0:1, :], bh2[0:1, :])
    ul_sh = {d: ops.window(d) + 0.0 for d in EDGE_NEIGHBOR_IDS}
    ops.fill_hpad(du, th2[1:2, :], bh2[1:2, :])
    du_sh = {d: ops.window(d) + 0.0 for d in EDGE_NEIGHBOR_IDS}

    grow = ops.row0 + jax.lax.broadcasted_iota(jnp.int32, (nl, n), 0)
    gcol = jax.lax.broadcasted_iota(jnp.int32, (nl, n), 1)

    fluxes = {}
    p_pos = jnp.zeros_like(u_low)
    p_neg = jnp.zeros_like(u_low)
    u_max = u_low
    u_min = u_low
    oks = {}
    for d in EDGE_NEIGHBOR_IDS:
        di, dj = OFFSETS[d]
        F = M_ref[d, :, :] * (du - du_sh[d]) + D_ref[d, :, :] * (
            u_low - ul_sh[d])
        fluxes[d] = F
        p_pos += jnp.maximum(F, 0.0)
        p_neg += jnp.minimum(F, 0.0)
        ok = ((grow + di >= 0) & (grow + di < n)
              & (gcol + dj >= 0) & (gcol + dj < n))
        oks[d] = ok
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

    ops.sbuf_up[0:1, :] = r_pos[0:1, :]
    ops.sbuf_up[1:2, :] = r_neg[0:1, :]
    ops.sbuf_dn[0:1, :] = r_pos[nl - 1 : nl, :]
    ops.sbuf_dn[1:2, :] = r_neg[nl - 1 : nl, :]
    th3, bh3 = ops.exchange_bufs(2)
    ops.fill_hpad(r_pos, th3[0:1, :], bh3[0:1, :])
    rp_sh = {d: jnp.where(oks[d], ops.window(d), 1.0)
             for d in EDGE_NEIGHBOR_IDS}
    ops.fill_hpad(r_neg, th3[1:2, :], bh3[1:2, :])
    rn_sh = {d: jnp.where(oks[d], ops.window(d), 1.0)
             for d in EDGE_NEIGHBOR_IDS}

    fbar = jnp.zeros_like(u_low)
    for d in EDGE_NEIGHBOR_IDS:
        F = fluxes[d]
        lim_p = jnp.minimum(r_pos, rn_sh[d])
        lim_n = jnp.minimum(r_neg, rp_sh[d])
        fbar += jnp.where(F > 0.0, lim_p * F,
                          jnp.where(F < 0.0, lim_n * F, 0.0))

    return u_low + dt * fbar / ML


# ---------------------------------------------------------------------------
# The distributed sweep kernels
# ---------------------------------------------------------------------------


def _dist_fwd_kernel(
    # inputs (per-device blocks)
    c_ref, u0_ref, v0_ref, Kx_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    C_ref, ilamu_ref, ilamv_ref,
    # outputs
    uout_ref, vout_ref, inv_ref,
    # scratch
    ucur_ref, vcur_ref, uprev_ref, vprev_ref,
    Aext_ref, D_ref, hpad_ref,
    uext_ref, vext_ref, cext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    tsend, trecv, tsend_sem, trecv_sem, credit_tr,
    *, axis, n, nl, nd, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters,
    wts4, bary4, h2, grads, warm, reaction, precond,
):
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=ucur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot,
        **({"tsend": tsend, "trecv": trecv, "tsend_sem": tsend_sem,
            "trecv_sem": trecv_sem, "credit_tr": credit_tr}
           if precond == "dct" else {}))
    row0 = ops.row0
    if precond == "dct":
        prec_u = _dct_pinv_dist(ops, C_ref, ilamu_ref, ucur_ref.dtype)
        prec_v = _dct_pinv_dist(ops, C_ref, ilamv_ref, ucur_ref.dtype)
    else:
        prec_u = None
        prec_v = None

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        uext_ref[:, :] = jnp.zeros_like(uext_ref)
        vext_ref[:, :] = jnp.zeros_like(vext_ref)
        cext_ref[:, :] = jnp.zeros_like(cext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]

    # ---- v half-step: Mat2 v^{n+1} = M v^n + dt/r (c u, phi) ------------
    # pack the 2-row u halo and the 1-row c halo into one k=3 exchange
    sbuf_up[0:2, :] = u_n[0:2, :]
    sbuf_up[2:3, :] = c_i[0:1, :]
    sbuf_dn[0:2, :] = u_n[nl - 2 : nl, :]
    sbuf_dn[2:3, :] = c_i[nl - 1 : nl, :]
    th, bh = ops.exchange_bufs(3)
    uext_ref[0:2, :] = th[0:2, :]
    uext_ref[2 : nl + 2, :] = u_n
    uext_ref[nl + 2 : nl + 4, :] = bh[0:2, :]
    cext_ref[0:1, :] = th[2:3, :]
    cext_ref[1 : nl + 1, :] = c_i
    cext_ref[nl + 1 : nl + 2, :] = bh[2:3, :]

    uext1 = uext_ref[1 : nl + 3, :]  # 1-row-halo window
    cext1 = cext_ref[:, :]
    # global cell-row validity for the 1-row-halo block (rows row0-1 ..)
    cr1 = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)
    cmask1 = ((cr1 >= 0) & (cr1 <= n - 2)).astype(u_n.dtype)
    load_ext = _lf_prod_rect([cext1, uext1], ncr=nl + 1, ncc=n - 1, h2=h2,
                             cmask=cmask1)
    load = load_ext[1 : nl + 1, :]

    apply_M = ops.make_apply(M_ref)
    b_v = apply_M(v_n) + (dt * inv_r) * load
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = ops.dcg(
        ops.make_apply(Mat2_ref),
        prec_v if prec_v is not None else 1.0 / Mat2_ref[CENTER, :, :],
        b_v, x0v)

    # ---- u half-step: assemble A on the row-extended block --------------
    th, bh = ops.exchange(v_np1[0:2, :], v_np1[nl - 2 : nl, :])
    vext_ref[0:2, :] = th
    vext_ref[2 : nl + 2, :] = v_np1
    vext_ref[nl + 2 : nl + 4, :] = bh

    cr2 = row0 - 2 + jax.lax.broadcasted_iota(jnp.int32, (nl + 3, 1), 0)
    cmask2 = ((cr2 >= 0) & (cr2 <= n - 2)).astype(u_n.dtype)
    _assemble_forward_A_rect(
        uext_ref[:, :], vext_ref[:, :], Kx_ref, Aext_ref,
        ncr=nl + 3, ncc=n - 1, Dm=Dm, chi=chi, eta=eta,
        wts=wts4, bary=bary4, grads=grads, cmask=cmask2)

    if reaction == "mimura":
        # explicit m²(1-m) = m² - m³ source (mimura_data_helpers.py:70)
        uext1 = uext_ref[1 : nl + 3, :]
        r2 = _lf_prod_rect([uext1, uext1], ncr=nl + 1, ncc=n - 1, h2=h2,
                           cmask=cmask1)
        r3 = _lf_prod_rect([uext1, uext1, uext1], ncr=nl + 1, ncc=n - 1,
                           h2=h2, cmask=cmask1, scale=-1.0)
        rhs_u = (r2 + r3)[1 : nl + 1, :]
    else:
        rhs_u = jnp.zeros_like(u_n)

    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_n, rhs_u, x0u, n=n, nl=nl, dt=dt,
        cheb_iters=cheb_iters, prec=prec_u, inv_ref=inv_ref)

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _dist_adj_kernel(
    # inputs (per-device blocks, streamed in reverse)
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    Kx_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    C_ref, ilamu_ref, ilamv_ref,
    # outputs
    pout_ref, qout_ref, inv_ref,
    # scratch
    pcur_ref, qcur_ref, pprev_ref, qprev_ref,
    Aext_ref, D_ref, hpad_ref,
    uext_ref, vext_ref, cext_ref, qext_ref, pext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    tsend, trecv, tsend_sem, trecv_sem, credit_tr,
    *, axis, n, nl, nd, dt, Dm, chi, eta, inv_r, tol, iters, cheb_iters,
    wts5, bary5, wts4, bary4, h2, grads, warm, reaction, precond,
):
    """Distributed chemotaxis adjoint sweep step (helpers.py:1387-1581
    semantics, identical to pallas_fused._adj_sweep_kernel): p FCT with the
    transposed-stencil matrix, then the implicit q solve."""
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=pcur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot,
        **({"tsend": tsend, "trecv": trecv, "tsend_sem": tsend_sem,
            "trecv_sem": trecv_sem, "credit_tr": credit_tr}
           if precond == "dct" else {}))
    row0 = ops.row0
    if precond == "dct":
        prec_p = _dct_pinv_dist(ops, C_ref, ilamu_ref, pcur_ref.dtype)
        prec_q = _dct_pinv_dist(ops, C_ref, ilamv_ref, pcur_ref.dtype)
    else:
        prec_p = None
        prec_q = None

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        uext_ref[:, :] = jnp.zeros_like(uext_ref)
        vext_ref[:, :] = jnp.zeros_like(vext_ref)
        cext_ref[:, :] = jnp.zeros_like(cext_ref)
        qext_ref[:, :] = jnp.zeros_like(qext_ref)
        pext_ref[:, :] = jnp.zeros_like(pext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    c_n = c_ref[0, :, :]

    # one k=6 exchange: u (2 rows, assembly), v (2 rows, assembly),
    # c (1 row, p load), q (1 row, p load)
    sbuf_up[0:2, :] = u_n[0:2, :]
    sbuf_up[2:4, :] = v_n[0:2, :]
    sbuf_up[4:5, :] = c_n[0:1, :]
    sbuf_up[5:6, :] = q_np1[0:1, :]
    sbuf_dn[0:2, :] = u_n[nl - 2 : nl, :]
    sbuf_dn[2:4, :] = v_n[nl - 2 : nl, :]
    sbuf_dn[4:5, :] = c_n[nl - 1 : nl, :]
    sbuf_dn[5:6, :] = q_np1[nl - 1 : nl, :]
    th, bh = ops.exchange_bufs(6)
    uext_ref[0:2, :] = th[0:2, :]
    uext_ref[2 : nl + 2, :] = u_n
    uext_ref[nl + 2 : nl + 4, :] = bh[0:2, :]
    vext_ref[0:2, :] = th[2:4, :]
    vext_ref[2 : nl + 2, :] = v_n
    vext_ref[nl + 2 : nl + 4, :] = bh[2:4, :]
    cext_ref[0:1, :] = th[4:5, :]
    cext_ref[1 : nl + 1, :] = c_n
    cext_ref[nl + 1 : nl + 2, :] = bh[4:5, :]
    qext_ref[0:1, :] = th[5:6, :]
    qext_ref[1 : nl + 1, :] = q_np1
    qext_ref[nl + 1 : nl + 2, :] = bh[5:6, :]

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    cr2 = row0 - 2 + jax.lax.broadcasted_iota(jnp.int32, (nl + 3, 1), 0)
    cmask2 = ((cr2 >= 0) & (cr2 <= n - 2)).astype(u_n.dtype)
    _assemble_adjoint_A_rect(
        uext_ref[:, :], vext_ref[:, :], Kx_ref, Aext_ref,
        ncr=nl + 3, ncc=n - 1, Dm=Dm, chi=chi, eta=eta,
        wts=wts5, bary=bary5, grads=grads, cmask=cmask2)

    cr1 = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)
    cmask1 = ((cr1 >= 0) & (cr1 <= n - 2)).astype(u_n.dtype)
    load_ext = _lf_prod_rect([cext_ref[:, :], qext_ref[:, :]],
                             ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1,
                             scale=inv_r)
    rhs = load_ext[1 : nl + 1, :] + misu_ref[0, :, :]

    if reaction == "mimura":
        # IMEX linearization of m²(1-m): non_flux = -M_{2m-3m²}
        # (models/mimura.py:_reaction_nonflux_adj)
        uext1 = uext_ref[1 : nl + 3, :]
        W1 = _wm_prod_rect([uext1], ncr=nl + 1, ncc=n - 1, h2=h2,
                           cmask=cmask1, scale=-2.0)
        W2 = _wm_prod_rect([uext1, uext1], ncr=nl + 1, ncc=n - 1, h2=h2,
                           cmask=cmask1, scale=3.0)
        S = [
            (W1[d][1 : nl + 1, :] if W1[d] is not None else 0.0)
            + (W2[d][1 : nl + 1, :] if W2[d] is not None else 0.0)
            if (W1[d] is not None or W2[d] is not None) else None
            for d in range(9)
        ]
    else:
        S = None

    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        p_np1, rhs, x0p, n=n, nl=nl, dt=dt, cheb_iters=cheb_iters, S=S,
        prec=prec_p, inv_ref=inv_ref)

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    thp, bhp = ops.exchange(p_n[0:1, :], p_n[nl - 1 : nl, :])
    pext_ref[0:1, :] = thp
    pext_ref[1 : nl + 1, :] = p_n
    pext_ref[nl + 1 : nl + 2, :] = bhp
    qload_ext = _q_load_rect(
        pext_ref[:, :], uext_ref[1 : nl + 3, :], ncr=nl + 1, ncc=n - 1,
        chi=chi, eta=eta, wts=wts4, bary=bary4, grads=grads, cmask=cmask1)
    qload = qload_ext[1 : nl + 1, :] + misv_ref[0, :, :]

    apply_M = ops.make_apply(M_ref)
    b = apply_M(q_np1) + dt * qload
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = ops.dcg(
        ops.make_apply(Mat2_ref),
        prec_q if prec_q is not None else 1.0 / Mat2_ref[CENTER, :, :],
        b, x0q)

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


# ---------------------------------------------------------------------------
# shard_map wrappers
# ---------------------------------------------------------------------------


def _comm_scratch(nd, n, dtype, sbuf_rows, nl=None, transpose=False):
    """The communication scratch block shared by the sweep kernels;
    ``transpose=True`` appends the distributed-transpose tile buffers +
    semaphores (ops.dtranspose, for the spectral DCT preconditioner);
    ``transpose="dummy"`` appends minimal placeholders so a kernel whose
    signature declares the transpose refs can run precond="jacobi" without
    the 2*nd*nl^2 dead VMEM (the kernel passes them as None to _make_ops,
    so they are never read or signalled)."""
    out = [
        pltpu.VMEM((sbuf_rows, n), dtype),          # halo send up
        pltpu.VMEM((sbuf_rows, n), dtype),          # halo send down
        pltpu.VMEM((sbuf_rows, n), dtype),          # halo recv top
        pltpu.VMEM((sbuf_rows, n), dtype),          # halo recv bottom
        pltpu.VMEM((1, 128), dtype),                # dot partial (mine)
        pltpu.VMEM((max(nd - 1, 1), 128), dtype),   # dot partials (peers)
        pltpu.SemaphoreType.DMA((2,)),              # halo send sems
        pltpu.SemaphoreType.DMA((2,)),              # halo recv sems
        pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # dot send sems
        pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # dot recv sems
        pltpu.SemaphoreType.REGULAR,                # credit: may send up
        pltpu.SemaphoreType.REGULAR,                # credit: may send down
        pltpu.SemaphoreType.REGULAR((max(nd - 1, 1),)),  # dot credits
    ]
    if transpose == "dummy":
        out += [
            pltpu.VMEM((1, 128), dtype),            # placeholders (unread)
            pltpu.VMEM((1, 128), dtype),
            pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),
            pltpu.SemaphoreType.REGULAR((max(nd - 1, 1),)),
        ]
    elif transpose:
        out += [
            pltpu.VMEM((nd, nl, nl), dtype),        # transpose send tiles
            pltpu.VMEM((nd, nl, nl), dtype),        # transpose recv tiles
            pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # transpose send
            pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # transpose recv
            pltpu.SemaphoreType.REGULAR((max(nd - 1, 1),)),  # tr credits
        ]
    return out


def _dct_specs(n, use_dct, field_spec):
    """in_specs for (C, ilam_u, ilam_v): the real (n, n) + per-device row
    blocks under precond="dct", tiny placeholder blocks otherwise."""
    if use_dct:
        return [pl.BlockSpec((n, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                field_spec, field_spec]
    dmy = pl.BlockSpec((1, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return [dmy, dmy, dmy]


def _slice_device_rows(K_rep, M_rep, Md_rep, ML_rep, Mat2_rep, row0, nl):
    """This device's operator rows; K gets a 2-row halo each side
    (ext-node rows row0-2 .. row0+nl+1) to align with the kernels'
    row-extended assembly block."""
    def rows(x, lo, k):
        return jax.lax.dynamic_slice_in_dim(x, lo, k, axis=1)

    K_pad = jnp.pad(K_rep, ((0, 0), (2, 2), (0, 0)))
    Kx = rows(K_pad, row0, nl + 4)
    M_loc = rows(M_rep, row0, nl)
    Md_loc = jax.lax.dynamic_slice_in_dim(Md_rep, row0, nl, axis=0)
    ML_loc = jax.lax.dynamic_slice_in_dim(ML_rep, row0, nl, axis=0)
    Mat2_loc = rows(Mat2_rep, row0, nl)
    return Kx, M_loc, Md_loc, ML_loc, Mat2_loc


def _compiler_params():
    # no collective_id: the kernels use scratch DMA/REGULAR semaphores, not
    # get_barrier_semaphore, and real-TPU lowering rejects a collective_id
    # without a custom barrier
    return pltpu.CompilerParams(
        vmem_limit_bytes=int(1024 * 1024 * 110),
        has_side_effects=True,
    )


def _device_sweep(c_loc, u0_loc, v0_loc, K_rep, M_rep, Md_rep, ML_rep,
                  Mat2_rep, C_rep, ilamu_rep, ilamv_rep, *, axis, n, nl, nd,
                  steps, dt, Dm, chi, eta,
                  inv_r, tol, iters, cheb_iters, wts4, bary4, h2, grads,
                  warm, reaction, precond):
    """Per-device body run under shard_map: slice this device's operator
    rows, then run the whole sweep in one pallas_call."""
    me = jax.lax.axis_index(axis)
    use_dct = precond == "dct"
    Kx, M_loc, Md_loc, ML_loc, Mat2_loc = _slice_device_rows(
        K_rep, M_rep, Md_rep, ML_rep, Mat2_rep, me * nl, nl)
    dtype = u0_loc.dtype
    if use_dct:
        C_in = C_rep
        ilamu_loc = jax.lax.dynamic_slice_in_dim(ilamu_rep, me * nl, nl,
                                                 axis=0)
        ilamv_loc = jax.lax.dynamic_slice_in_dim(ilamv_rep, me * nl, nl,
                                                 axis=0)
    else:
        # jacobi: the DCT operands are never read — pass tiny placeholders
        # instead of the (n, n) plane + (nl, n) ilams (dead VMEM otherwise)
        C_in = jnp.zeros((1, 128), dtype)
        ilamu_loc = ilamv_loc = C_in

    kern = functools.partial(
        _dist_fwd_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt, Dm=Dm,
        chi=chi, eta=eta, inv_r=inv_r, tol=tol, iters=iters,
        cheb_iters=cheb_iters, wts4=wts4, bary4=bary4, h2=h2, grads=grads,
        warm=warm, reaction=reaction, precond=precond,
    )
    field = pl.BlockSpec((nl, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nl, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nl + 4, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, nl, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[frame, field, field, stencil_ext, stencil_loc, field,
                  field, stencil_loc] + _dct_specs(n, use_dct, field),
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nl, n), dtype),          # u current
            pltpu.VMEM((nl, n), dtype),          # v current
            pltpu.VMEM((nl, n), dtype),          # u prev (warm start)
            pltpu.VMEM((nl, n), dtype),          # v prev
            pltpu.VMEM((9, nl + 4, n), dtype),   # A ext (-> Low, local rows)
            pltpu.VMEM((9, nl, n), dtype),       # D
            pltpu.VMEM((nl + 2, n + 2), dtype),  # halo/shift pad
            pltpu.VMEM((nl + 4, n), dtype),      # u ext (2-row halo)
            pltpu.VMEM((nl + 4, n), dtype),      # v ext
            pltpu.VMEM((nl + 2, n), dtype),      # c ext (1-row halo)
        ] + _comm_scratch(nd, n, dtype, 3, nl=nl,
                          transpose=True if use_dct else "dummy"),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(c_loc[1:], u0_loc, v0_loc, Kx, M_loc, Md_loc, ML_loc, Mat2_loc,
      C_in, ilamu_loc, ilamv_loc)
    u_traj = jnp.concatenate([u0_loc[None], u_traj], axis=0)
    v_traj = jnp.concatenate([v0_loc[None], v_traj], axis=0)
    return u_traj, v_traj, inv


def _device_adj_sweep(u_loc, v_loc, c_loc, misu_loc, misv_loc, pT_loc,
                      qT_loc, K_rep, M_rep, Md_rep, ML_rep, Mat2_rep,
                      C_rep, ilamu_rep, ilamv_rep, *,
                      axis, n, nl, nd, steps, dt, Dm, chi, eta, inv_r, tol,
                      iters, cheb_iters, wts5, bary5, wts4, bary4, h2,
                      grads, warm, has_mis, reaction, precond):
    me = jax.lax.axis_index(axis)
    use_dct = precond == "dct"
    Kx, M_loc, Md_loc, ML_loc, Mat2_loc = _slice_device_rows(
        K_rep, M_rep, Md_rep, ML_rep, Mat2_rep, me * nl, nl)
    dtype = pT_loc.dtype
    if use_dct:
        C_in = C_rep
        ilamu_loc = jax.lax.dynamic_slice_in_dim(ilamu_rep, me * nl, nl,
                                                 axis=0)
        ilamv_loc = jax.lax.dynamic_slice_in_dim(ilamv_rep, me * nl, nl,
                                                 axis=0)
    else:
        C_in = jnp.zeros((1, 128), dtype)
        ilamu_loc = ilamv_loc = C_in

    kern = functools.partial(
        _dist_adj_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt, Dm=Dm,
        chi=chi, eta=eta, inv_r=inv_r, tol=tol, iters=iters,
        cheb_iters=cheb_iters, wts5=wts5, bary5=bary5, wts4=wts4,
        bary4=bary4, h2=h2, grads=grads, warm=warm, reaction=reaction,
        precond=precond,
    )
    field = pl.BlockSpec((nl, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nl, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nl + 4, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    # backward step i consumes global frame steps-1-i, writes the same slot
    rev = pl.BlockSpec((1, nl, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    mis_spec = rev if has_mis else pl.BlockSpec(
        (1, nl, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[rev, rev, rev, mis_spec, mis_spec, field, field,
                  stencil_ext, stencil_loc, field, field, stencil_loc]
                 + _dct_specs(n, use_dct, field),
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nl, n), dtype),          # p current
            pltpu.VMEM((nl, n), dtype),          # q current
            pltpu.VMEM((nl, n), dtype),          # p prev (warm start)
            pltpu.VMEM((nl, n), dtype),          # q prev
            pltpu.VMEM((9, nl + 4, n), dtype),   # A ext (-> Low, local rows)
            pltpu.VMEM((9, nl, n), dtype),       # D
            pltpu.VMEM((nl + 2, n + 2), dtype),  # halo/shift pad
            pltpu.VMEM((nl + 4, n), dtype),      # u ext (2-row halo)
            pltpu.VMEM((nl + 4, n), dtype),      # v ext
            pltpu.VMEM((nl + 2, n), dtype),      # c ext (1-row halo)
            pltpu.VMEM((nl + 2, n), dtype),      # q ext
            pltpu.VMEM((nl + 2, n), dtype),      # p ext
        ] + _comm_scratch(nd, n, dtype, 6, nl=nl,
                          transpose=True if use_dct else "dummy"),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(u_loc, v_loc, c_loc, misu_loc, misv_loc, pT_loc, qT_loc,
      Kx, M_loc, Md_loc, ML_loc, Mat2_loc, C_in, ilamu_loc, ilamv_loc)
    p_traj = jnp.concatenate([p_traj, pT_loc[None]], axis=0)
    q_traj = jnp.concatenate([q_traj, qT_loc[None]], axis=0)
    return p_traj, q_traj, inv


def _resolve_mesh(mesh, axis, n):
    if axis is None:
        axis = mesh.axis_names[0]
    nd = mesh.shape[axis]
    if n % nd:
        raise ValueError(f"n={n} not divisible by mesh axis {axis}={nd}")
    return axis, nd


def dist_chemotaxis_forward_sweep(c_traj, u0, v0, K, M, M_diag, ML_diag,
                                  Mat2, mesh, *, h, dt, Dm, chi, eta,
                                  rescaling, tol=1e-6, iters=60,
                                  cheb_iters=20, warm=True, reaction=None,
                                  axis=None, precond="dct", Df=None,
                                  delta=None, with_stats=False):
    """Multi-chip fused chemotaxis forward sweep over a 1-D device axis.

    Semantics identical to pallas_fused.fused_chemotaxis_forward_sweep
    (helpers.py:1321-1385), distributed by row blocks. ``mesh``: a
    ``jax.sharding.Mesh``; ``axis`` defaults to its first axis name. The
    row count n must be divisible by the axis size (use
    parallel/padding.mesh_padded_n + a padded model for reference sizes).
    """
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2
    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_chemotaxis_forward_sweep(
            c_traj, u0, v0, K, M, M_diag, ML_diag, Mat2, mesh, h=h, dt=dt,
            Dm=Dm, chi=chi, eta=eta, rescaling=rescaling, tol=tol,
            iters=iters, cheb_iters=cheb_iters, warm=warm, reaction=reaction,
            precond=precond, Df=Df, delta=delta, with_stats=with_stats)

    n = u0.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = c_traj.shape[0] - 1
    wts4, bary4, grads = _quad_consts(4, h)
    wts4 = wts4 * h * h
    dtype = u0.dtype
    C = jnp.asarray(dct_matrix(n), dtype)
    ilam_u = jnp.asarray(dct_precond_ilam(n, h, dt, Dm, 1.0), dtype)
    ilam_v = jnp.asarray(
        dct_precond_ilam(n, h, dt, Df if Df is not None else 0.0,
                         1.0 + dt * delta if delta is not None else 1.0),
        dtype)
    if (Df is None or delta is None) and precond == "dct":
        precond = "jacobi"

    body = functools.partial(
        _device_sweep, axis=axis, n=n, nl=nl, nd=nd, steps=steps, dt=dt,
        Dm=Dm, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4,
        h2=h * h, grads=grads, warm=warm, reaction=reaction, precond=precond,
    )
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_f, spec_f, rep3, rep3, rep2, rep2, rep3,
                  rep2, rep2, rep2),
        out_specs=(spec_t, spec_t, P(axis, None)),
        check_vma=False,
    )
    u_traj, v_traj, inv = fn(c_traj, u0, v0, K, M, M_diag, ML_diag, Mat2,
                             C, ilam_u, ilam_v)
    _sync_interpret(u_traj, v_traj, inv)
    if with_stats:
        return u_traj, v_traj, jnp.min(inv)
    return u_traj, v_traj


def dist_chemotaxis_adjoint_sweep(u_traj, v_traj, c_traj, pT, qT, K, M,
                                  M_diag, ML_diag, Mat2, mesh, mis_u=None,
                                  mis_v=None, *, h, dt, Dm, chi, eta,
                                  rescaling, tol=1e-6, iters=60,
                                  cheb_iters=20, warm=True, reaction=None,
                                  axis=None, precond="dct", Df=None,
                                  delta=None, with_stats=False):
    """Multi-chip fused chemotaxis adjoint sweep (reverse-streamed frames).

    Semantics identical to pallas_fused.fused_chemotaxis_adjoint_sweep
    (helpers.py:1387-1581): p FCT with the transposed advective stencil,
    then the implicit q solve; ``mis_u``/``mis_v`` are the optional
    (num_steps, n, n) all-time misfit loads (final-time mode when None).
    Together with the forward sweep this gives the full PDECO gradient on
    the multi-chip RDMA fast path."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_chemotaxis_adjoint_sweep(
            u_traj, v_traj, c_traj, pT, qT, K, M, M_diag, ML_diag, Mat2,
            mesh, mis_u, mis_v, h=h, dt=dt, Dm=Dm, chi=chi, eta=eta,
            rescaling=rescaling, tol=tol, iters=iters,
            cheb_iters=cheb_iters, warm=warm, reaction=reaction,
            precond=precond, Df=Df, delta=delta, with_stats=with_stats)

    n = pT.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = u_traj.shape[0] - 1
    wts5, bary5, grads = _quad_consts(5, h)
    wts4, bary4, _ = _quad_consts(4, h)
    wts5 = wts5 * h * h
    wts4 = wts4 * h * h
    has_mis = mis_u is not None
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u

    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    dtype = pT.dtype
    C = jnp.asarray(dct_matrix(n), dtype)
    ilam_p = jnp.asarray(dct_precond_ilam(n, h, dt, Dm, 1.0), dtype)
    ilam_q = jnp.asarray(
        dct_precond_ilam(n, h, dt, Df if Df is not None else 0.0,
                         1.0 + dt * delta if delta is not None else 1.0),
        dtype)
    if (Df is None or delta is None) and precond == "dct":
        precond = "jacobi"

    body = functools.partial(
        _device_adj_sweep, axis=axis, n=n, nl=nl, nd=nd, steps=steps,
        dt=dt, Dm=Dm, chi=chi, eta=eta, inv_r=1.0 / rescaling, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts5=wts5, bary5=bary5,
        wts4=wts4, bary4=bary4, h2=h * h, grads=grads, warm=warm,
        has_mis=has_mis, reaction=reaction, precond=precond,
    )
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_t, spec_t, spec_f, spec_f,
                  rep3, rep3, rep2, rep2, rep3, rep2, rep2, rep2),
        out_specs=(spec_t, spec_t, P(axis, None)),
        check_vma=False,
    )
    p_traj, q_traj, inv = fn(u_traj[:-1], v_traj[:-1], c_traj[:-1], mis_u,
                             mis_v, pT, qT, K, M, M_diag, ML_diag, Mat2,
                             C, ilam_p, ilam_q)
    _sync_interpret(p_traj, q_traj, inv)
    if with_stats:
        return p_traj, q_traj, jnp.min(inv)
    return p_traj, q_traj


# ---------------------------------------------------------------------------
# Distributed single-field FCT sweep (nonlinear equation, linear advection)
# ---------------------------------------------------------------------------


def _dist_scalar_kernel(
    load_ref, x0_ref, Aflux_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, Aext_ref, D_ref, hpad_ref, xS_ext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    *, axis, n, nl, nd, dt, tol, iters, cheb_iters, h2, warm,
    nonflux_mode, load_is_mass,
):
    """Distributed analogue of pallas_fused._scalar_sweep_kernel: one FCT
    field with a stationary flux matrix, optional per-step IMEX non-flux
    weighted mass (nonlinear state +1 / adjoint -1), per-step load frames
    (helpers.py:941-958, 1023-1037)."""
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=cur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot)
    row0 = ops.row0

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        xS_ext_ref[:, :] = jnp.zeros_like(xS_ext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]

    if load_is_mass:
        apply_M = ops.make_apply(M_ref)
        rhs = apply_M(load_ref[0, 0, :, :])
    else:
        rhs = load_ref[0, 0, :, :]

    if nonflux_mode == 0:
        S = None
    else:
        # u for the IMEX weighted mass: forward uses the CARRIED state x_n;
        # the adjoint linearizes around the stored state (frame 1)
        u_for_S = x_n if nonflux_mode > 0 else load_ref[0, 1, :, :]
        th, bh = ops.exchange(u_for_S[0:1, :], u_for_S[nl - 1 : nl, :])
        xS_ext_ref[0:1, :] = th
        xS_ext_ref[1 : nl + 1, :] = u_for_S
        xS_ext_ref[nl + 1 : nl + 2, :] = bh
        cr1 = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)
        cmask1 = ((cr1 >= 0) & (cr1 <= n - 2)).astype(x_n.dtype)
        u_ext = xS_ext_ref[:, :]
        Mu2 = _wm_prod_rect([u_ext, u_ext], ncr=nl + 1, ncc=n - 1, h2=h2,
                            cmask=cmask1)
        scale = (1.0 / 3.0) if nonflux_mode > 0 else 1.0
        S = [
            (scale * Mu2[d][1 : nl + 1, :] if Mu2[d] is not None else 0.0)
            - M_ref[d, :, :]
            for d in range(9)
        ]

    for d in range(9):
        Aext_ref[d, :, :] = Aflux_ref[d, :, :]

    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        x_n, rhs, x0w, n=n, nl=nl, dt=dt, cheb_iters=cheb_iters, S=S,
        inv_ref=inv_ref)

    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _device_scalar_sweep(load_loc, x0_loc, A_rep, M_rep, Md_rep, ML_rep, *,
                         axis, n, nl, nd, steps, F, dt, tol, iters,
                         cheb_iters, h2, warm, nonflux_mode, load_is_mass,
                         reverse):
    me = jax.lax.axis_index(axis)
    row0 = me * nl
    A_pad = jnp.pad(A_rep, ((0, 0), (2, 2), (0, 0)))
    Ax = jax.lax.dynamic_slice_in_dim(A_pad, row0, nl + 4, axis=1)
    M_loc = jax.lax.dynamic_slice_in_dim(M_rep, row0, nl, axis=1)
    Md_loc = jax.lax.dynamic_slice_in_dim(Md_rep, row0, nl, axis=0)
    ML_loc = jax.lax.dynamic_slice_in_dim(ML_rep, row0, nl, axis=0)

    dtype = x0_loc.dtype
    kern = functools.partial(
        _dist_scalar_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt, tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h2, warm=warm,
        nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
    )
    field = pl.BlockSpec((nl, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nl, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nl + 4, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, nl, n),
                                lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nl, n), lambda i: (steps - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, nl, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nl, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, nl, n), dtype),
                   _inv_shape(dtype)),
        in_specs=[frame_in, field, stencil_ext, stencil_loc, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nl, n), dtype),          # x current
            pltpu.VMEM((nl, n), dtype),          # x prev (warm start)
            pltpu.VMEM((9, nl + 4, n), dtype),   # A ext (-> Low, local rows)
            pltpu.VMEM((9, nl, n), dtype),       # D
            pltpu.VMEM((nl + 2, n + 2), dtype),  # halo/shift pad
            pltpu.VMEM((nl + 2, n), dtype),      # u-for-S ext (1-row halo)
        ] + _comm_scratch(nd, n, dtype, 2),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(load_loc, x0_loc, Ax, M_loc, Md_loc, ML_loc)
    return out, inv


def dist_scalar_fct_sweep(load_traj, x0, A_flux, M, M_diag, ML_diag, mesh,
                          *, h, dt, tol=1e-6, iters=60, cheb_iters=20,
                          warm=True, nonflux_mode=0, load_is_mass=True,
                          reverse=False, axis=None, with_stats=False):
    """Multi-chip single-field FCT sweep over a 1-D device axis.

    Semantics identical to pallas_fused.fused_scalar_fct_sweep (nonlinear
    state/adjoint, linear advection state/adjoint — helpers.py:881-1038,
    advection_FCT_PDECO_finaltime.py:194-231), distributed by row blocks
    with the same RDMA halo / credit / deterministic-reduction protocol as
    the chemotaxis sweeps."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_scalar_fct_sweep(
            load_traj, x0, A_flux, M, M_diag, ML_diag, mesh, h=h, dt=dt,
            tol=tol, iters=iters, cheb_iters=cheb_iters, warm=warm,
            nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
            reverse=reverse, with_stats=with_stats)

    n = x0.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = load_traj.shape[0]
    F = load_traj.shape[1]

    body = functools.partial(
        _device_scalar_sweep, axis=axis, n=n, nl=nl, nd=nd, steps=steps,
        F=F, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h * h,
        warm=warm, nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
        reverse=reverse,
    )
    spec_l = P(None, None, axis, None)
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_l, spec_f, rep3, rep3, rep2, rep2),
        out_specs=(spec_t, P(axis, None)),
        check_vma=False,
    )
    out, inv = fn(load_traj, x0, A_flux, M, M_diag, ML_diag)
    _sync_interpret(out, inv)
    return (out, jnp.min(inv)) if with_stats else out


# ---------------------------------------------------------------------------
# Distributed Schnakenberg sweeps (helpers.py:511-698)
# ---------------------------------------------------------------------------


def _dist_schnak_fwd_kernel(
    c_ref, u0_ref, v0_ref, Au_ref, M_ref, Md_ref, ML_ref, Mbv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref,
    Aext_ref, D_ref, hpad_ref, uext_ref, vext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    *, axis, n, nl, nd, dt, gamma, c_b, inv_r, tol, iters, cheb_iters,
    h2, warm,
):
    """Distributed analogue of pallas_fused._schnak_fwd_kernel: u FCT with
    rhs = γ(c/r + u²v) and non_flux = γM, then the v implicit solve with
    the u²-weighted mass assembled from the NEW u (helpers.py:581-596)."""
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=ucur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot)
    row0 = ops.row0

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        uext_ref[:, :] = jnp.zeros_like(uext_ref)
        vext_ref[:, :] = jnp.zeros_like(vext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]

    cr1 = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)
    cmask1 = ((cr1 >= 0) & (cr1 <= n - 2)).astype(u_n.dtype)

    # u FCT: rhs = γ(c/r + u²v), non_flux = γM. One k=3 exchange provides
    # the c halo (for M·c) and the u/v 1-row halos (for the cubic load).
    sbuf_up[0:1, :] = u_n[0:1, :]
    sbuf_up[1:2, :] = v_n[0:1, :]
    sbuf_up[2:3, :] = c_i[0:1, :]
    sbuf_dn[0:1, :] = u_n[nl - 1 : nl, :]
    sbuf_dn[1:2, :] = v_n[nl - 1 : nl, :]
    sbuf_dn[2:3, :] = c_i[nl - 1 : nl, :]
    th, bh = ops.exchange_bufs(3)
    uext_ref[0:1, :] = th[0:1, :]
    uext_ref[1 : nl + 1, :] = u_n
    uext_ref[nl + 1 : nl + 2, :] = bh[0:1, :]
    vext_ref[0:1, :] = th[1:2, :]
    vext_ref[1 : nl + 1, :] = v_n
    vext_ref[nl + 1 : nl + 2, :] = bh[1:2, :]

    ops.fill_hpad(c_i, th[2:3, :], bh[2:3, :])
    Mc = ops.plane_sum(lambda d: M_ref[d, :, :], c_i)
    load_ext = _lf_prod_rect(
        [uext_ref[:, :], uext_ref[:, :], vext_ref[:, :]],
        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1, scale=gamma)
    rhs_u = (gamma * inv_r) * Mc + load_ext[1 : nl + 1, :]

    S = [gamma * M_ref[d, :, :] for d in range(9)]
    for d in range(9):
        Aext_ref[d, :, :] = Au_ref[d, :, :]
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_n, rhs_u, x0u, n=n, nl=nl, dt=dt, cheb_iters=cheb_iters, S=S,
        inv_ref=inv_ref)

    # v implicit with the NEW u: Mat_v = Mbv + dt γ M_{u²}
    th, bh = ops.exchange(u_np1[0:1, :], u_np1[nl - 1 : nl, :])
    uext_ref[0:1, :] = th
    uext_ref[1 : nl + 1, :] = u_np1
    uext_ref[nl + 1 : nl + 2, :] = bh
    Mu2 = _wm_prod_rect([uext_ref[:, :], uext_ref[:, :]],
                        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1)
    MatV = [
        Mbv_ref[d, :, :]
        + ((dt * gamma) * Mu2[d][1 : nl + 1, :] if Mu2[d] is not None
           else 0.0)
        for d in range(9)
    ]

    def apply_matv(x):
        th2, bh2 = ops.exchange(x[0:1, :], x[nl - 1 : nl, :])
        ops.fill_hpad(x, th2, bh2)
        return ops.plane_sum(lambda d: MatV[d], x)

    apply_M = ops.make_apply(M_ref)
    b = apply_M(v_n) + (dt * gamma * c_b) * ML_ref[:, :]
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = ops.dcg(apply_matv, 1.0 / MatV[CENTER], b, x0v)

    uprev_ref[:, :] = u_n
    vprev_ref[:, :] = v_n
    ucur_ref[:, :] = u_np1
    vcur_ref[:, :] = v_np1
    uout_ref[0, :, :] = u_np1
    vout_ref[0, :, :] = v_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _dist_schnak_adj_kernel(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    Aadj_ref, M_ref, Md_ref, ML_ref, Mbq_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref,
    Aext_ref, D_ref, hpad_ref, uext_ref, vext_ref, pext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    *, axis, n, nl, nd, dt, gamma, tol, iters, cheb_iters, h2, warm,
):
    """Distributed analogue of pallas_fused._schnak_adj_kernel: the q
    implicit solve (Mat_q = Mbq + dt γ M_{u²}, rhs = γ p u²), then the p
    FCT with non_flux = γM - 2γM_{uv} and rhs = -2γ u v q
    (helpers.py:680-697)."""
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=pcur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot)
    row0 = ops.row0

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        uext_ref[:, :] = jnp.zeros_like(uext_ref)
        vext_ref[:, :] = jnp.zeros_like(vext_ref)
        pext_ref[:, :] = jnp.zeros_like(pext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]

    cr1 = row0 - 1 + jax.lax.broadcasted_iota(jnp.int32, (nl + 1, 1), 0)
    cmask1 = ((cr1 >= 0) & (cr1 <= n - 2)).astype(u_n.dtype)

    # one k=3 exchange: u, v (weighted masses + loads), p_np1 (q load)
    sbuf_up[0:1, :] = u_n[0:1, :]
    sbuf_up[1:2, :] = v_n[0:1, :]
    sbuf_up[2:3, :] = p_np1[0:1, :]
    sbuf_dn[0:1, :] = u_n[nl - 1 : nl, :]
    sbuf_dn[1:2, :] = v_n[nl - 1 : nl, :]
    sbuf_dn[2:3, :] = p_np1[nl - 1 : nl, :]
    th, bh = ops.exchange_bufs(3)
    uext_ref[0:1, :] = th[0:1, :]
    uext_ref[1 : nl + 1, :] = u_n
    uext_ref[nl + 1 : nl + 2, :] = bh[0:1, :]
    vext_ref[0:1, :] = th[1:2, :]
    vext_ref[1 : nl + 1, :] = v_n
    vext_ref[nl + 1 : nl + 2, :] = bh[1:2, :]
    pext_ref[0:1, :] = th[2:3, :]
    pext_ref[1 : nl + 1, :] = p_np1
    pext_ref[nl + 1 : nl + 2, :] = bh[2:3, :]

    # q implicit first: Mat_q = Mbq + dt γ M_{u²}
    Mu2 = _wm_prod_rect([uext_ref[:, :], uext_ref[:, :]],
                        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1)
    MatQ = [
        Mbq_ref[d, :, :]
        + ((dt * gamma) * Mu2[d][1 : nl + 1, :] if Mu2[d] is not None
           else 0.0)
        for d in range(9)
    ]

    def apply_matq(x):
        th2, bh2 = ops.exchange(x[0:1, :], x[nl - 1 : nl, :])
        ops.fill_hpad(x, th2, bh2)
        return ops.plane_sum(lambda d: MatQ[d], x)

    rhs_q_ext = _lf_prod_rect(
        [pext_ref[:, :], uext_ref[:, :], uext_ref[:, :]],
        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1, scale=gamma)
    rhs_q = rhs_q_ext[1 : nl + 1, :] + misv_ref[0, :, :]
    apply_M = ops.make_apply(M_ref)
    b = apply_M(q_np1) + dt * rhs_q
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = ops.dcg(apply_matq, 1.0 / MatQ[CENTER], b, x0q)

    # p FCT: rhs = -2γ u v q_n, S = γM - 2γ M_{uv}
    th, bh = ops.exchange(q_n[0:1, :], q_n[nl - 1 : nl, :])
    pext_ref[0:1, :] = th  # reuse as q ext
    pext_ref[1 : nl + 1, :] = q_n
    pext_ref[nl + 1 : nl + 2, :] = bh
    rhs_p_ext = _lf_prod_rect(
        [uext_ref[:, :], vext_ref[:, :], pext_ref[:, :]],
        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1, scale=-2.0 * gamma)
    rhs_p = rhs_p_ext[1 : nl + 1, :] + misu_ref[0, :, :]

    Muv = _wm_prod_rect([uext_ref[:, :], vext_ref[:, :]],
                        ncr=nl + 1, ncc=n - 1, h2=h2, cmask=cmask1)
    S = [
        gamma * M_ref[d, :, :]
        - ((2.0 * gamma) * Muv[d][1 : nl + 1, :] if Muv[d] is not None
           else 0.0)
        for d in range(9)
    ]
    for d in range(9):
        Aext_ref[d, :, :] = Aadj_ref[d, :, :]
    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        p_np1, rhs_p, x0p, n=n, nl=nl, dt=dt, cheb_iters=cheb_iters, S=S,
        inv_ref=inv_ref)

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _device_schnak_sweep(adjoint, *arrays, axis, n, nl, nd, steps, dt,
                         gamma, c_b, inv_r, tol, iters, cheb_iters, h2,
                         warm, has_mis):
    me = jax.lax.axis_index(axis)
    row0 = me * nl

    def ext(x):
        return jax.lax.dynamic_slice_in_dim(
            jnp.pad(x, ((0, 0), (2, 2), (0, 0))), row0, nl + 4, axis=1)

    def loc(x):
        return jax.lax.dynamic_slice_in_dim(x, row0, nl, axis=x.ndim - 2)

    field = pl.BlockSpec((nl, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nl, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nl + 4, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    if not adjoint:
        c_loc, u0_loc, v0_loc, A_u, M, Md, ML, Mbv = arrays
        dtype = u0_loc.dtype
        kern = functools.partial(
            _dist_schnak_fwd_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt,
            gamma=gamma, c_b=c_b, inv_r=inv_r, tol=tol, iters=iters,
            cheb_iters=cheb_iters, h2=h2, warm=warm)
        frame = pl.BlockSpec((1, nl, n), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        u_traj, v_traj, inv = pl.pallas_call(
            kern,
            grid=(steps,),
            out_shape=(
                jax.ShapeDtypeStruct((steps, nl, n), dtype),
                jax.ShapeDtypeStruct((steps, nl, n), dtype),
                _inv_shape(dtype),
            ),
            in_specs=[frame, field, field, stencil_ext, stencil_loc, field,
                      field, stencil_loc],
            out_specs=(frame, frame, _inv_spec()),
            scratch_shapes=[
                pltpu.VMEM((nl, n), dtype),
                pltpu.VMEM((nl, n), dtype),
                pltpu.VMEM((nl, n), dtype),
                pltpu.VMEM((nl, n), dtype),
                pltpu.VMEM((9, nl + 4, n), dtype),
                pltpu.VMEM((9, nl, n), dtype),
                pltpu.VMEM((nl + 2, n + 2), dtype),
                pltpu.VMEM((nl + 2, n), dtype),   # u ext (1-row halo)
                pltpu.VMEM((nl + 2, n), dtype),   # v ext
            ] + _comm_scratch(nd, n, dtype, 3),
            compiler_params=_compiler_params(),
            interpret=_dist_interp(),
        )(c_loc[1:], u0_loc, v0_loc, ext(A_u), loc(M), loc(Md), loc(ML),
          loc(Mbv))
        u_traj = jnp.concatenate([u0_loc[None], u_traj], axis=0)
        v_traj = jnp.concatenate([v0_loc[None], v_traj], axis=0)
        return u_traj, v_traj, inv

    u_loc, v_loc, misu, misv, pT_loc, qT_loc, A_adj, M, Md, ML, Mbq = arrays
    dtype = pT_loc.dtype
    kern = functools.partial(
        _dist_schnak_adj_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt,
        gamma=gamma, tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h2,
        warm=warm)
    rev = pl.BlockSpec((1, nl, n), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    mis_spec = rev if has_mis else pl.BlockSpec(
        (1, nl, n), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            jax.ShapeDtypeStruct((steps, nl, n), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[rev, rev, mis_spec, mis_spec, field, field,
                  stencil_ext, stencil_loc, field, field, stencil_loc],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nl, n), dtype),
            pltpu.VMEM((nl, n), dtype),
            pltpu.VMEM((nl, n), dtype),
            pltpu.VMEM((nl, n), dtype),
            pltpu.VMEM((9, nl + 4, n), dtype),
            pltpu.VMEM((9, nl, n), dtype),
            pltpu.VMEM((nl + 2, n + 2), dtype),
            pltpu.VMEM((nl + 2, n), dtype),   # u ext
            pltpu.VMEM((nl + 2, n), dtype),   # v ext
            pltpu.VMEM((nl + 2, n), dtype),   # p/q ext
        ] + _comm_scratch(nd, n, dtype, 3),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(u_loc, v_loc, misu, misv, pT_loc, qT_loc, ext(A_adj), loc(M),
      loc(Md), loc(ML), loc(Mbq))
    p_traj = jnp.concatenate([p_traj, pT_loc[None]], axis=0)
    q_traj = jnp.concatenate([q_traj, qT_loc[None]], axis=0)
    return p_traj, q_traj, inv


def dist_schnak_forward_sweep(c_traj, u0, v0, A_u, M, M_diag, ML_diag,
                              Mbase_v, mesh, *, h, dt, gamma, c_b,
                              rescaling, tol=1e-6, iters=60, cheb_iters=20,
                              warm=True, axis=None, with_stats=False):
    """Multi-chip Schnakenberg forward sweep (stationary wind only),
    semantics identical to pallas_fused.fused_schnak_forward_sweep
    (helpers.py:511-597)."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_schnak_forward_sweep(
            c_traj, u0, v0, A_u, M, M_diag, ML_diag, Mbase_v, mesh, h=h,
            dt=dt, gamma=gamma, c_b=c_b, rescaling=rescaling, tol=tol,
            iters=iters, cheb_iters=cheb_iters, warm=warm,
            with_stats=with_stats)

    n = u0.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = c_traj.shape[0] - 1

    body = functools.partial(
        _device_schnak_sweep, False, axis=axis, n=n, nl=nl, nd=nd,
        steps=steps, dt=dt, gamma=gamma, c_b=c_b, inv_r=1.0 / rescaling,
        tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h * h, warm=warm,
        has_mis=False)
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_f, spec_f, rep3, rep3, rep2, rep2, rep3),
        out_specs=(spec_t, spec_t, P(axis, None)),
        check_vma=False,
    )
    u_traj, v_traj, inv = fn(c_traj, u0, v0, A_u, M, M_diag, ML_diag,
                             Mbase_v)
    _sync_interpret(u_traj, v_traj, inv)
    if with_stats:
        return u_traj, v_traj, jnp.min(inv)
    return u_traj, v_traj


def dist_schnak_adjoint_sweep(u_traj, v_traj, pT, qT, A_u_adj, M, M_diag,
                              ML_diag, Mbase_q, mesh, mis_u=None,
                              mis_v=None, *, h, dt, gamma, tol=1e-6,
                              iters=60, cheb_iters=20, warm=True,
                              axis=None, with_stats=False):
    """Multi-chip Schnakenberg adjoint sweep, semantics identical to
    pallas_fused.fused_schnak_adjoint_sweep (helpers.py:599-698)."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_schnak_adjoint_sweep(
            u_traj, v_traj, pT, qT, A_u_adj, M, M_diag, ML_diag, Mbase_q,
            mesh, mis_u, mis_v, h=h, dt=dt, gamma=gamma, tol=tol,
            iters=iters, cheb_iters=cheb_iters, warm=warm,
            with_stats=with_stats)

    n = pT.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u

    body = functools.partial(
        _device_schnak_sweep, True, axis=axis, n=n, nl=nl, nd=nd,
        steps=steps, dt=dt, gamma=gamma, c_b=0.0, inv_r=1.0, tol=tol,
        iters=iters, cheb_iters=cheb_iters, h2=h * h, warm=warm,
        has_mis=has_mis)
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_t, spec_f, spec_f,
                  rep3, rep3, rep2, rep2, rep3),
        out_specs=(spec_t, spec_t, P(axis, None)),
        check_vma=False,
    )
    p_traj, q_traj, inv = fn(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT,
                             qT, A_u_adj, M, M_diag, ML_diag, Mbase_q)
    _sync_interpret(p_traj, q_traj, inv)
    if with_stats:
        return p_traj, q_traj, jnp.min(inv)
    return p_traj, q_traj


# ---------------------------------------------------------------------------
# Distributed drift-control sweep (advection_solidbody_FCT_PDECO_*):
# per-step Adrift1/Adrift2 assembled in-kernel on the halo-extended block.
# ---------------------------------------------------------------------------


def _drift_planes_rect(c, *, ncr, ncc, h2, m, grads, cmask):
    """Rect/masked analogue of pallas_fused._drift_planes: 9 plane VALUES
    ((ncr+1, ncc+1) each) of Adrift1 + Adrift2 for the halo-extended control
    block (advection_solidbody_FCT_PDECO_finaltime.py:187-188; exact
    closed-form quadratic moments = the reference's degree-2 rule)."""
    T2 = _moments(2)
    cc = _corners_rect(c, ncr, ncc)
    planes = [None] * 9
    for t in range(2):
        corners = TRI_CORNERS[t]
        gcx = sum(cc[t][a] * float(grads[t][a][0]) for a in range(3))
        gcy = sum(cc[t][a] * float(grads[t][a][1]) for a in range(3))
        mg = float(m[0]) * gcx + float(m[1]) * gcy
        Sb = [
            sum(cc[t][cid] * float(T2[cid, b]) for cid in range(3))
            for b in range(3)
        ]
        for a, (ai, aj) in enumerate(corners):
            gam = (float(m[0]) * float(grads[t][a][0])
                   + float(m[1]) * float(grads[t][a][1]))
            for b, (bi, bj) in enumerate(corners):
                E = h2 * (float(T2[a, b]) * mg + gam * Sb[b])
                d = _offset_index(bi - ai, bj - aj)
                placed = jnp.pad(E * cmask, ((ai, 1 - ai), (aj, 1 - aj)))
                planes[d] = placed if planes[d] is None else planes[d] + placed
    return planes


def _dist_drift_kernel(
    frames_ref, x0_ref, Abase_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, Aext_ref, D_ref, hpad_ref, cext_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_dot,
    *, axis, n, nl, nd, dt, sign, m, tol, iters, cheb_iters, h2, warm,
    has_mis, grads,
):
    """Distributed analogue of pallas_fused._drift_sweep_kernel: the
    control-dependent Adrift pair is assembled each step on the
    halo-extended rows (2-row c halo exchange), added onto the stationary
    halo-extended base εK ∓ N_rot."""
    i = pl.program_id(0)
    ops = _make_ops(
        axis=axis, n=n, nl=nl, nd=nd, tol=tol, iters=iters,
        dtype=cur_ref.dtype, hpad_ref=hpad_ref, sbuf_up=sbuf_up,
        sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot, dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, dsend_sem=dsend_sem,
        drecv_sem=drecv_sem, credit_up=credit_up, credit_dn=credit_dn,
        credit_dot=credit_dot)
    row0 = ops.row0

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        cext_ref[:, :] = jnp.zeros_like(cext_ref)
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    x_n = cur_ref[:, :]
    c_i = frames_ref[0, 0, :, :]

    # 2-row c halo for the straddling assembly cells
    sbuf_up[0:2, :] = c_i[0:2, :]
    sbuf_dn[0:2, :] = c_i[nl - 2 : nl, :]
    th, bh = ops.exchange_bufs(2)
    cext_ref[0:2, :] = th[0:2, :]
    cext_ref[2 : nl + 2, :] = c_i
    cext_ref[nl + 2 : nl + 4, :] = bh[0:2, :]

    cr2 = row0 - 2 + jax.lax.broadcasted_iota(jnp.int32, (nl + 3, 1), 0)
    cmask2 = ((cr2 >= 0) & (cr2 <= n - 2)).astype(x_n.dtype)
    Ad = _drift_planes_rect(cext_ref[:, :], ncr=nl + 3, ncc=n - 1, h2=h2,
                            m=m, grads=grads, cmask=cmask2)
    for d in range(9):
        plane = Abase_ref[d, :, :]
        if Ad[d] is not None:
            plane = plane + sign * Ad[d]
        Aext_ref[d, :, :] = plane

    rhs = frames_ref[0, 1, :, :] if has_mis else jnp.zeros_like(x_n)
    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _dist_fct_tail(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        x_n, rhs, x0w, n=n, nl=nl, dt=dt, cheb_iters=cheb_iters, S=None,
        inv_ref=inv_ref)

    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _device_drift_sweep(frames_loc, x0_loc, Abase_rep, M_rep, Md_rep, ML_rep,
                        *, axis, n, nl, nd, steps, F, dt, sign, m, tol,
                        iters, cheb_iters, h2, warm, has_mis, reverse, grads):
    me = jax.lax.axis_index(axis)
    row0 = me * nl
    A_pad = jnp.pad(Abase_rep, ((0, 0), (2, 2), (0, 0)))
    Ax = jax.lax.dynamic_slice_in_dim(A_pad, row0, nl + 4, axis=1)
    M_loc = jax.lax.dynamic_slice_in_dim(M_rep, row0, nl, axis=1)
    Md_loc = jax.lax.dynamic_slice_in_dim(Md_rep, row0, nl, axis=0)
    ML_loc = jax.lax.dynamic_slice_in_dim(ML_rep, row0, nl, axis=0)

    dtype = x0_loc.dtype
    kern = functools.partial(
        _dist_drift_kernel, axis=axis, n=n, nl=nl, nd=nd, dt=dt, sign=sign,
        m=m, tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h2, warm=warm,
        has_mis=has_mis, grads=grads,
    )
    field = pl.BlockSpec((nl, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nl, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nl + 4, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    if reverse:
        frame_in = pl.BlockSpec((1, F, nl, n),
                                lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nl, n), lambda i: (steps - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, nl, n), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nl, n), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, nl, n), dtype),
                   _inv_shape(dtype)),
        in_specs=[frame_in, field, stencil_ext, stencil_loc, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nl, n), dtype),          # x current
            pltpu.VMEM((nl, n), dtype),          # x prev (warm start)
            pltpu.VMEM((9, nl + 4, n), dtype),   # A ext (-> Low, local rows)
            pltpu.VMEM((9, nl, n), dtype),       # D
            pltpu.VMEM((nl + 2, n + 2), dtype),  # halo/shift pad
            pltpu.VMEM((nl + 4, n), dtype),      # c ext (2-row halo)
        ] + _comm_scratch(nd, n, dtype, 2),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(frames_loc, x0_loc, Ax, M_loc, Md_loc, ML_loc)
    return out, inv


def dist_drift_fct_sweep(frames, x0, A_base, M, M_diag, ML_diag, mesh, *,
                         h, dt, sign, drift, tol=1e-6, iters=60,
                         cheb_iters=20, warm=True, reverse=False,
                         has_mis=False, axis=None, with_stats=False):
    """Multi-chip drift-control FCT sweep over a 1-D device axis: semantics
    identical to pallas_fused.fused_drift_fct_sweep (per-step in-kernel
    Adrift assembly; sign=-1 state / +1 adjoint), distributed with the same
    RDMA halo / credit / deterministic-reduction protocol as the other
    sweeps."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops import pallas_dist2d as d2
    from fem_fct_pdeco_tpu.ops.assembly import _basis_gradients

    if axis is None and d2.mesh_is_2d(mesh):
        return d2.dist2d_drift_fct_sweep(
            frames, x0, A_base, M, M_diag, ML_diag, mesh, h=h, dt=dt,
            sign=sign, drift=drift, tol=tol, iters=iters,
            cheb_iters=cheb_iters, warm=warm, reverse=reverse,
            has_mis=has_mis, with_stats=with_stats)

    n = x0.shape[-1]
    axis, nd = _resolve_mesh(mesh, axis, n)
    nl = n // nd
    steps = frames.shape[0]
    F = frames.shape[1]
    grads = _basis_gradients(h)

    body = functools.partial(
        _device_drift_sweep, axis=axis, n=n, nl=nl, nd=nd, steps=steps,
        F=F, dt=dt, sign=float(sign), m=tuple(float(v) for v in drift),
        tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h * h, warm=warm,
        has_mis=has_mis, reverse=reverse, grads=grads,
    )
    spec_l = P(None, None, axis, None)
    spec_t = P(None, axis, None)
    spec_f = P(axis, None)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_l, spec_f, rep3, rep3, rep2, rep2),
        out_specs=(spec_t, P(axis, None)),
        check_vma=False,
    )
    out, inv = fn(frames, x0, A_base, M, M_diag, ML_diag)
    _sync_interpret(out, inv)
    return (out, jnp.min(inv)) if with_stats else out
