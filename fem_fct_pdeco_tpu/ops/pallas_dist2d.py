"""2-D (row x col) distributed fused FCT sweep: Pallas + inter-chip RDMA.

Extends the 1-D row-block RDMA fast path (ops/pallas_dist.py) to a full 2-D
device mesh ("x" rows x "y" cols): device (r, c) owns the
(nlr, nlc) = (n/nr, n/nc) block of every field. The protocol is the 1-D
module's, applied twice per halo exchange:

- **row phase**: exchange the top/bottom halo rows with the (r∓1, c)
  neighbors (same credit-based RDMA as the 1-D path, device ids now mesh
  coordinate tuples);
- **column phase**: exchange the left/right halo columns OF THE
  ROW-EXTENDED block with the (r, c∓1) neighbors — the corner values ride
  along with the column halos, so all 8 neighbors are covered in two
  phases.

Krylov dot products reduce over ALL nr*nc devices with the same
deterministic global-order all-to-all as the 1-D path (ring over the
row-major flattening of the mesh coordinates).

The in-kernel P1 assembly reuses the rectangular masked builders of
pallas_dist (they are dimension-generic: the cell-validity mask is simply
the OUTER PRODUCT of the global row and column cell masks here).

The chemotaxis-family Krylov solves run the spectral DCT preconditioner
on this path too (``precond="dct"``, the default): the separable form of
pallas_dist._dct_pinv_dist — each of the four axis transforms is a LOCAL
MXU matmul against this device's slice of the DCT matrix, preceded by a
credit-based block all-gather along the one mesh axis it contracts over
(``allgather_x``/``allgather_y``), so flops scale 1/(nr*nc) and no full
(n, n) C matrix is ever VMEM-resident. The remaining sweeps are
Jacobi-preconditioned, matching the 1-D path's coverage.

Correctness is pinned by tests/test_pallas_dist2d.py on a (2, 4) virtual
CPU mesh (TPU interpret mode simulates the remote DMAs and semaphores)
against the single-device XLA path.
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
from fem_fct_pdeco_tpu.ops.pallas_kernels import ANTI_DIAGONAL_IDS
from fem_fct_pdeco_tpu.ops.pallas_fused import (_INV_BLOCK, _inv_init,
                                                _inv_shape, _inv_spec,
                                                _quad_consts, _safe_div)
from fem_fct_pdeco_tpu.ops.pallas_dist import (
    _assemble_adjoint_A_rect, _assemble_forward_A_rect,
    _compiler_params, _dist_interp, _drift_planes_rect, _lf_prod_rect,
    _q_load_rect, _sync_interpret, _wm_prod_rect)


def mesh_is_2d(mesh, axes=None):
    """True when the (first two axes of the) mesh spreads devices over BOTH
    dimensions — i.e. the 2-D two-phase halo protocol is required. A mesh
    with a single >1 axis runs the cheaper 1-D row-block path."""
    names = mesh.axis_names[:2] if axes is None else axes
    return len(names) >= 2 and all(mesh.shape[a] > 1 for a in names)


def _make_ops2d(*, ax_r, ax_c, n, nlr, nlc, nr, nc, tol, iters, dtype,
                hpad_ref,
                sbuf_up, sbuf_dn, rtop, rbot,
                sbuf_lf, sbuf_rt, rlef, rrig,
                dot_s, dot_r,
                hsend_sem, hrecv_sem, csend_sem, crecv_sem,
                dsend_sem, drecv_sem,
                credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
                agx_s=None, agx_r=None, agy_s=None, agy_r=None,
                agx_send_sem=None, agx_recv_sem=None,
                agy_send_sem=None, agy_recv_sem=None,
                credit_agx=None, credit_agy=None):
    """2-D analogue of pallas_dist._make_ops. Row buffers are
    (rows_k, nlc+4) (column-extended so corner values can ride in the
    column phase is NOT needed — see exchange2d: rows first, then
    row-extended columns), column buffers are (nlr+4, cols_k). The
    optional ``ag*`` scratch enables the per-mesh-axis block all-gathers
    of the 2-D spectral DCT preconditioner (``allgather_x``/``_y``)."""
    import types

    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    nd = nr * nc
    gid = me_r * nc + me_c
    has_up = me_r > 0
    has_dn = me_r < nr - 1
    has_lf = me_c > 0
    has_rt = me_c < nc - 1
    LOGICAL = pltpu.DeviceIdType.LOGICAL

    def gid_of(r, c):
        # logical device id = row-major index into the mesh's device array
        # (Mesh(devices.reshape(nr, nc), ...) construction order)
        return r * nc + c

    def init_buffers():
        hpad_ref[:, :] = jnp.zeros_like(hpad_ref)
        rtop[:, :] = jnp.zeros_like(rtop)
        rbot[:, :] = jnp.zeros_like(rbot)
        rlef[:, :] = jnp.zeros_like(rlef)
        rrig[:, :] = jnp.zeros_like(rrig)
        if agx_s is not None:
            agx_s[:, :, :] = jnp.zeros_like(agx_s)
            agx_r[:, :, :] = jnp.zeros_like(agx_r)
            agy_s[:, :, :] = jnp.zeros_like(agy_s)
            agy_r[:, :, :] = jnp.zeros_like(agy_r)

    def init_credits():
        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(credit_dn, inc=1,
                                   device_id=gid_of(me_r - 1, me_c),
                                   device_id_type=LOGICAL)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(credit_up, inc=1,
                                   device_id=gid_of(me_r + 1, me_c),
                                   device_id_type=LOGICAL)

        @pl.when(has_lf)
        def _():
            pltpu.semaphore_signal(credit_rt, inc=1,
                                   device_id=gid_of(me_r, me_c - 1),
                                   device_id_type=LOGICAL)

        @pl.when(has_rt)
        def _():
            pltpu.semaphore_signal(credit_lf, inc=1,
                                   device_id=gid_of(me_r, me_c + 1),
                                   device_id_type=LOGICAL)

        if nd > 1:
            for o in range(1, nd):
                sg = (gid - o + nd) % nd
                pltpu.semaphore_signal(credit_dot.at[o - 1], inc=1,
                                       device_id=sg,
                                       device_id_type=LOGICAL)

        if credit_agx is not None:
            for o in range(1, nr):
                sr = (me_r - o + nr) % nr
                pltpu.semaphore_signal(credit_agx.at[o - 1], inc=1,
                                       device_id=gid_of(sr, me_c),
                                       device_id_type=LOGICAL)
            for o in range(1, nc):
                sc = (me_c - o + nc) % nc
                pltpu.semaphore_signal(credit_agy.at[o - 1], inc=1,
                                       device_id=gid_of(me_r, sc),
                                       device_id_type=LOGICAL)

    def drain():
        @pl.when(has_up)
        def _():
            pltpu.semaphore_wait(credit_up, 1)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_wait(credit_dn, 1)

        @pl.when(has_lf)
        def _():
            pltpu.semaphore_wait(credit_lf, 1)

        @pl.when(has_rt)
        def _():
            pltpu.semaphore_wait(credit_rt, 1)

        if nd > 1:
            for o in range(1, nd):
                pltpu.semaphore_wait(credit_dot.at[o - 1], 1)

        if credit_agx is not None:
            for o in range(1, nr):
                pltpu.semaphore_wait(credit_agx.at[o - 1], 1)
            for o in range(1, nc):
                pltpu.semaphore_wait(credit_agy.at[o - 1], 1)

    def exchange_rows(k):
        """Exchange the first k pre-written rows of sbuf_up/sbuf_dn with the
        row neighbors; returns (top, bot) (k, nlc) values (zeros at the
        global edge)."""
        up_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_up.at[0:k, :], dst_ref=rbot.at[0:k, :],
            send_sem=hsend_sem.at[0], recv_sem=hrecv_sem.at[0],
            device_id=gid_of(me_r - 1, me_c), device_id_type=LOGICAL)
        dn_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_dn.at[0:k, :], dst_ref=rtop.at[0:k, :],
            send_sem=hsend_sem.at[1], recv_sem=hrecv_sem.at[1],
            device_id=gid_of(me_r + 1, me_c), device_id_type=LOGICAL)

        @pl.when(has_up)
        def _():
            pltpu.semaphore_wait(credit_up, 1)
            up_d.start()

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_wait(credit_dn, 1)
            dn_d.start()

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

        @pl.when(has_up)
        def _():
            pltpu.semaphore_signal(credit_dn, inc=1,
                                   device_id=gid_of(me_r - 1, me_c),
                                   device_id_type=LOGICAL)

        @pl.when(has_dn)
        def _():
            pltpu.semaphore_signal(credit_up, inc=1,
                                   device_id=gid_of(me_r + 1, me_c),
                                   device_id_type=LOGICAL)

        return th, bh

    def exchange_cols(k, rows):
        """Exchange the first k pre-written columns (rows high) of
        sbuf_lf/sbuf_rt with the column neighbors; returns (left, right)
        (rows, k) values."""
        lf_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_lf.at[0:rows, 0:k], dst_ref=rrig.at[0:rows, 0:k],
            send_sem=csend_sem.at[0], recv_sem=crecv_sem.at[0],
            device_id=gid_of(me_r, me_c - 1), device_id_type=LOGICAL)
        rt_d = pltpu.make_async_remote_copy(
            src_ref=sbuf_rt.at[0:rows, 0:k], dst_ref=rlef.at[0:rows, 0:k],
            send_sem=csend_sem.at[1], recv_sem=crecv_sem.at[1],
            device_id=gid_of(me_r, me_c + 1), device_id_type=LOGICAL)

        @pl.when(has_lf)
        def _():
            pltpu.semaphore_wait(credit_lf, 1)
            lf_d.start()

        @pl.when(has_rt)
        def _():
            pltpu.semaphore_wait(credit_rt, 1)
            rt_d.start()

        @pl.when(has_lf)
        def _():
            rt_d.wait_recv()
            lf_d.wait_send()

        @pl.when(has_rt)
        def _():
            lf_d.wait_recv()
            rt_d.wait_send()

        lh = rlef[0:rows, 0:k] + 0.0
        rh = rrig[0:rows, 0:k] + 0.0

        @pl.when(has_lf)
        def _():
            pltpu.semaphore_signal(credit_rt, inc=1,
                                   device_id=gid_of(me_r, me_c - 1),
                                   device_id_type=LOGICAL)

        @pl.when(has_rt)
        def _():
            pltpu.semaphore_signal(credit_lf, inc=1,
                                   device_id=gid_of(me_r, me_c + 1),
                                   device_id_type=LOGICAL)

        return lh, rh

    def exchange2d(x, k):
        """Full 2-D halo exchange of depth k for the (nlr, nlc) field x:
        returns the (nlr+2k, nlc+2k) extended VALUE (zeros outside the
        global domain). Rows first; the column phase ships the
        row-extended columns, so the corners arrive with them."""
        sbuf_up[0:k, :] = x[0:k, :]
        sbuf_dn[0:k, :] = x[nlr - k : nlr, :]
        th, bh = exchange_rows(k)
        xr = jnp.concatenate([th, x, bh], axis=0)  # (nlr+2k, nlc)
        rows = nlr + 2 * k
        sbuf_lf[0:rows, 0:k] = xr[:, 0:k]
        sbuf_rt[0:rows, 0:k] = xr[:, nlc - k : nlc]
        lh, rh = exchange_cols(k, rows)
        return jnp.concatenate([lh, xr, rh], axis=1)

    def dist_sums(*scalars):
        """Global sums over all nr*nc devices, bitwise identical everywhere
        (partials reduced in global row-major device order)."""
        if nd == 1:
            return scalars
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), dtype=dtype)
        for t, sc in enumerate(scalars):
            row = jnp.where(lane == t, sc, row)
        dot_s[0:1, :] = row
        descs = []
        for o in range(1, nd):
            dg = (gid + o) % nd
            d_ = pltpu.make_async_remote_copy(
                src_ref=dot_s.at[0:1, :], dst_ref=dot_r.at[o - 1 : o, :],
                send_sem=dsend_sem.at[o - 1], recv_sem=drecv_sem.at[o - 1],
                device_id=dg, device_id_type=LOGICAL)
            pltpu.semaphore_wait(credit_dot.at[o - 1], 1)
            d_.start()
            descs.append(d_)
        for d_ in descs:
            d_.wait_recv()
            d_.wait_send()
        total = jnp.zeros((1, 128), dtype=dtype)
        own = dot_s[0:1, :] + 0.0
        for dev in range(nd):
            o = (gid - dev + nd) % nd
            slot = jnp.maximum(o - 1, 0)
            r = dot_r[pl.ds(slot, 1), :]
            total = total + jnp.where(o == 0, own, r)
        for o in range(1, nd):
            sg = (gid - o + nd) % nd
            pltpu.semaphore_signal(credit_dot.at[o - 1], inc=1,
                                   device_id=sg,
                                   device_id_type=LOGICAL)
        return tuple(total[0, t] for t in range(len(scalars)))

    def _allgather(x, send, recv, send_sem, recv_sem, credit, na, peer_gid,
                   me_a):
        """Credit-based block all-gather along ONE mesh axis: my (nlr, nlc)
        block lands in slot ``me_a`` of every axis peer's recv buffer
        (slot-addressed remote copies, same discipline as dist_sums), and
        the slots concatenate in axis order to the gathered slab."""
        if na == 1:
            return x
        send[0, :, :] = x
        recv[pl.ds(me_a, 1)] = send[pl.ds(0, 1)]
        descs = []
        for o in range(1, na):
            dst = (me_a + o) % na
            d_ = pltpu.make_async_remote_copy(
                src_ref=send.at[pl.ds(0, 1)],
                dst_ref=recv.at[pl.ds(me_a, 1)],
                send_sem=send_sem.at[o - 1], recv_sem=recv_sem.at[o - 1],
                device_id=peer_gid(dst), device_id_type=LOGICAL)
            pltpu.semaphore_wait(credit.at[o - 1], 1)
            d_.start()
            descs.append(d_)
        for d_ in descs:
            d_.wait_recv()
            d_.wait_send()
        out = jnp.concatenate([recv[s] for s in range(na)], axis=0)
        for o in range(1, na):
            src = (me_a - o + na) % na
            pltpu.semaphore_signal(credit.at[o - 1], inc=1,
                                   device_id=peer_gid(src),
                                   device_id_type=LOGICAL)
        return out

    def allgather_x(x):
        """(nlr, nlc) block -> the (n, nlc) column slab: gather the row
        blocks of my mesh COLUMN (over the "x" axis)."""
        return _allgather(x, agx_s, agx_r, agx_send_sem, agx_recv_sem,
                          credit_agx, nr, lambda a: gid_of(a, me_c), me_r)

    def allgather_y(x):
        """(nlr, nlc) block -> the (nlr, n) row slab (gathered along the
        last axis): gather the column blocks of my mesh ROW (over the "y"
        axis). Blocks concatenate on axis 0 of the recv slots, so the
        result is assembled by horizontal concatenation."""
        if nc == 1:
            return x
        slab = _allgather(x, agy_s, agy_r, agy_send_sem, agy_recv_sem,
                          credit_agy, nc, lambda a: gid_of(me_r, a), me_c)
        # slab is (nc*nlr, nlc) with source-major blocks; re-lay to
        # (nlr, nc*nlc)
        return jnp.concatenate(
            [slab[s * nlr : (s + 1) * nlr, :] for s in range(nc)], axis=1)

    def fill_hpad(ext1):
        """Write a depth-1 extended value into the hpad scratch."""
        hpad_ref[:, :] = ext1

    def window(d):
        di, dj = OFFSETS[d]
        return hpad_ref[1 + di : 1 + di + nlr, 1 + dj : 1 + dj + nlc]

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
            fill_hpad(exchange2d(x, 1))
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

        def cond(c_):
            k, x, r, p_, rho, rn2 = c_
            return (k < iters) & (rn2 > atol2)

        def body(c_):
            k, x, r, p_, rho, _ = c_
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

        def cond(c_):
            k, x, r, z, p_, rz, rn2 = c_
            return (k < iters) & (rn2 > atol2)

        def body(c_):
            k, x, r, z, p_, rz, _ = c_
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
        me_r=me_r, me_c=me_c, row0=me_r * nlr, col0=me_c * nlc,
        init_buffers=init_buffers, init_credits=init_credits, drain=drain,
        exchange2d=exchange2d, dist_sums=dist_sums,
        allgather_x=allgather_x, allgather_y=allgather_y,
        fill_hpad=fill_hpad, window=window, plane_sum=plane_sum,
        make_apply=make_apply, dbicgstab=dbicgstab, dcg=dcg)


def _dct_pinv_dist2d(ops, Cr_ref, Cc_ref, CTr_ref, CTc_ref, ilam_ref, dtype):
    """2-D-distributed spectral (DCT) preconditioner apply for (nlr, nlc)
    block fields: r -> C^T ((C r C^T) * invLam) C via 4 LOCAL MXU matmuls
    + 4 per-mesh-axis block all-gathers (the separable form of
    pallas_dist._dct_pinv_dist — each spectral axis transform gathers only
    along the mesh axis it contracts over, so flops scale 1/(nr*nc)).

    The C inputs are this device's slices of the (n, n) DCT-II matrix:
    ``Cr = C[rows I, :]``, ``Cc = C[rows J, :]``, ``CTr = (C^T)[I, :]``,
    ``CTc = (C^T)[J, :]`` where I/J are my global row/column ranges;
    ``ilam_ref`` is my (nlr, nlc) block of the inverse modal eigenvalues."""
    hi = jax.lax.Precision.DEFAULT

    def pinv(r):
        # row transform z1 = C r (contract global rows -> gather along x)
        rg = ops.allgather_x(r)                                # (n, nlc)
        z1 = jax.lax.dot_general(Cr_ref[:, :], rg,
                                 (((1,), (0,)), ((), ())), precision=hi,
                                 preferred_element_type=dtype)  # (nlr, nlc)
        # column transform z = z1 C^T (contract global cols -> gather y)
        z1g = ops.allgather_y(z1)                              # (nlr, n)
        z = jax.lax.dot_general(z1g, Cc_ref[:, :],
                                (((1,), (1,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)   # (nlr, nlc)
        e = z * ilam_ref[:, :]
        # inverse row transform f = C^T e
        eg = ops.allgather_x(e)                                # (n, nlc)
        f = jax.lax.dot_general(CTr_ref[:, :], eg,
                                (((1,), (0,)), ((), ())), precision=hi,
                                preferred_element_type=dtype)   # (nlr, nlc)
        # inverse column transform out = f C = f (C^T)^T
        fg = ops.allgather_y(f)                                # (nlr, n)
        return jax.lax.dot_general(fg, CTc_ref[:, :],
                                   (((1,), (1,)), ((), ())), precision=hi,
                                   preferred_element_type=dtype)

    return pinv


def _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k, col_k, gather=False):
    """Scratch for the 2-D protocol: row halo buffers (row_k, nlc), column
    halo buffers (nlr + 2*row_k, col_k) (column phase ships row-extended
    columns), the dot all-to-all block, and the credit semaphores.
    ``gather=True`` appends the per-axis block all-gather buffers of the
    2-D DCT preconditioner (allgather_x / allgather_y);
    ``gather="dummy"`` appends minimal placeholders so the chemotaxis
    kernels can run precond="jacobi" without the dead all-gather VMEM
    (the kernel passes the refs as None to _make_ops2d)."""
    nd = nr * nc
    out = [
        pltpu.VMEM((row_k, nlc), dtype),            # row send up
        pltpu.VMEM((row_k, nlc), dtype),            # row send down
        pltpu.VMEM((row_k, nlc), dtype),            # row recv top
        pltpu.VMEM((row_k, nlc), dtype),            # row recv bottom
        pltpu.VMEM((nlr + 2 * row_k, col_k), dtype),  # col send left
        pltpu.VMEM((nlr + 2 * row_k, col_k), dtype),  # col send right
        pltpu.VMEM((nlr + 2 * row_k, col_k), dtype),  # col recv left
        pltpu.VMEM((nlr + 2 * row_k, col_k), dtype),  # col recv right
        pltpu.VMEM((1, 128), dtype),                # dot partial (mine)
        pltpu.VMEM((max(nd - 1, 1), 128), dtype),   # dot partials (peers)
        pltpu.SemaphoreType.DMA((2,)),              # row send sems
        pltpu.SemaphoreType.DMA((2,)),              # row recv sems
        pltpu.SemaphoreType.DMA((2,)),              # col send sems
        pltpu.SemaphoreType.DMA((2,)),              # col recv sems
        pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # dot send sems
        pltpu.SemaphoreType.DMA((max(nd - 1, 1),)),  # dot recv sems
        pltpu.SemaphoreType.REGULAR,                # credit up
        pltpu.SemaphoreType.REGULAR,                # credit down
        pltpu.SemaphoreType.REGULAR,                # credit left
        pltpu.SemaphoreType.REGULAR,                # credit right
        pltpu.SemaphoreType.REGULAR((max(nd - 1, 1),)),  # dot credits
    ]
    if gather == "dummy":
        out += [
            pltpu.VMEM((1, 1, 128), dtype),         # placeholders (unread)
            pltpu.VMEM((1, 1, 128), dtype),
            pltpu.VMEM((1, 1, 128), dtype),
            pltpu.VMEM((1, 1, 128), dtype),
            pltpu.SemaphoreType.DMA((max(nr - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(nr - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(nc - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(nc - 1, 1),)),
            pltpu.SemaphoreType.REGULAR((max(nr - 1, 1),)),
            pltpu.SemaphoreType.REGULAR((max(nc - 1, 1),)),
        ]
    elif gather:
        out += [
            pltpu.VMEM((1, nlr, nlc), dtype),       # allgather-x send stage
            pltpu.VMEM((nr, nlr, nlc), dtype),      # allgather-x recv slots
            pltpu.VMEM((1, nlr, nlc), dtype),       # allgather-y send stage
            pltpu.VMEM((nc, nlr, nlc), dtype),      # allgather-y recv slots
            pltpu.SemaphoreType.DMA((max(nr - 1, 1),)),  # agx send sems
            pltpu.SemaphoreType.DMA((max(nr - 1, 1),)),  # agx recv sems
            pltpu.SemaphoreType.DMA((max(nc - 1, 1),)),  # agy send sems
            pltpu.SemaphoreType.DMA((max(nc - 1, 1),)),  # agy recv sems
            pltpu.SemaphoreType.REGULAR((max(nr - 1, 1),)),  # agx credits
            pltpu.SemaphoreType.REGULAR((max(nc - 1, 1),)),  # agy credits
        ]
    return out


def _dist_fct_tail_2d(ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML,
                      u_prev, rhs, x0, *, n, nlr, nlc, dt, cheb_iters,
                      S=None, prec=None, inv_ref=None):
    """2-D analogue of pallas_dist._dist_fct_tail: the assembled flux matrix
    sits in Aext_ref with 2-deep halos in BOTH dimensions (ext index e =
    global - block0 + 2)."""
    # artificial diffusion at local cells (needs the +-1 ext ring of A)
    offsum = None
    for d in range(9):
        if d == CENTER:
            continue
        di, dj = OFFSETS[d]
        Atr = Aext_ref[opposite(d), 2 + di : 2 + di + nlr,
                       2 + dj : 2 + dj + nlc]
        Dd = jnp.maximum(0.0, jnp.maximum(
            Aext_ref[d, 2 : nlr + 2, 2 : nlc + 2], Atr))
        D_ref[d, :, :] = Dd
        offsum = Dd if offsum is None else offsum + Dd
    D_ref[CENTER, :, :] = -offsum

    # transform local A block -> Low in place
    for d in range(9):
        plane = Aext_ref[d, 2 : nlr + 2, 2 : nlc + 2] - D_ref[d, :, :]
        if S is not None and S[d] is not None:
            plane = plane + S[d]
        plane = dt * plane
        if d == CENTER:
            plane = plane + ML
        Aext_ref[d, 2 : nlr + 2, 2 : nlc + 2] = plane
    if inv_ref is not None:
        # always-on M-matrix telemetry (helpers.py:1784-1810): min LOCAL
        # row sum of Low; the host reduces per-device blocks to the
        # global min
        rs = None
        for d in range(9):
            pl_ = Aext_ref[d, 2 : nlr + 2, 2 : nlc + 2]
            rs = pl_ if rs is None else rs + pl_
        inv_ref[:, :] = jnp.minimum(inv_ref[:, :], jnp.min(rs))

    low_at = lambda d: Aext_ref[d, 2 : nlr + 2, 2 : nlc + 2]

    def apply_low(x):
        ops.fill_hpad(ops.exchange2d(x, 1))
        return ops.plane_sum(low_at, x)

    b = ML * u_prev + dt * rhs
    u_low = ops.dbicgstab(
        apply_low,
        prec if prec is not None
        else 1.0 / Aext_ref[CENTER, 2 : nlr + 2, 2 : nlc + 2],
        b, x0)

    # Chebyshev du/dt on M du = -A u_low + rhs
    ops.fill_hpad(ops.exchange2d(u_low, 1))
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

    # fluxes + Zalesak limiter (global-index masked)
    ul_ext = ops.exchange2d(u_low, 1)
    du_ext = ops.exchange2d(du, 1)
    ul_sh = {d: ul_ext[1 + OFFSETS[d][0] : 1 + OFFSETS[d][0] + nlr,
                       1 + OFFSETS[d][1] : 1 + OFFSETS[d][1] + nlc]
             for d in EDGE_NEIGHBOR_IDS}
    du_sh = {d: du_ext[1 + OFFSETS[d][0] : 1 + OFFSETS[d][0] + nlr,
                       1 + OFFSETS[d][1] : 1 + OFFSETS[d][1] + nlc]
             for d in EDGE_NEIGHBOR_IDS}

    grow = ops.row0 + jax.lax.broadcasted_iota(jnp.int32, (nlr, nlc), 0)
    gcol = ops.col0 + jax.lax.broadcasted_iota(jnp.int32, (nlr, nlc), 1)

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
    den_pos = dt * p_pos  # branch on the PRODUCT (f32 underflow; fct.py)
    r_pos = jnp.where(
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

    rp_ext = ops.exchange2d(r_pos, 1)
    rn_ext = ops.exchange2d(r_neg, 1)
    rp_sh = {d: jnp.where(oks[d],
                          rp_ext[1 + OFFSETS[d][0] : 1 + OFFSETS[d][0] + nlr,
                                 1 + OFFSETS[d][1] : 1 + OFFSETS[d][1] + nlc],
                          1.0)
             for d in EDGE_NEIGHBOR_IDS}
    rn_sh = {d: jnp.where(oks[d],
                          rn_ext[1 + OFFSETS[d][0] : 1 + OFFSETS[d][0] + nlr,
                                 1 + OFFSETS[d][1] : 1 + OFFSETS[d][1] + nlc],
                          1.0)
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
# 2-D distributed chemotaxis sweep kernels (helpers.py:1321-1581)
# ---------------------------------------------------------------------------


def _cell_mask2d(row0, col0, ncr, ncc, n, dtype):
    """Global cell-validity mask for an extended cell block whose (0, 0)
    cell is global cell (row0, col0): the outer product of the row and
    column validity used by the 1-D path."""
    gr = row0 + jax.lax.broadcasted_iota(jnp.int32, (ncr, ncc), 0)
    gc = col0 + jax.lax.broadcasted_iota(jnp.int32, (ncr, ncc), 1)
    ok = (gr >= 0) & (gr <= n - 2) & (gc >= 0) & (gc <= n - 2)
    return jnp.where(ok, jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype))


def _dist2d_fwd_kernel(
    c_ref, u0_ref, v0_ref, Kx_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    Cr_ref, Cc_ref, CTr_ref, CTc_ref, ilamu_ref, ilamv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref,
    Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    agx_s, agx_r, agy_s, agy_r,
    agx_send_sem, agx_recv_sem, agy_send_sem, agy_recv_sem,
    credit_agx, credit_agy,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, Dm, chi, eta, inv_r, tol,
    iters, cheb_iters, wts4, bary4, h2, grads, warm, reaction, precond,
):
    """2-D analogue of pallas_dist._dist_fwd_kernel."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=ucur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot,
        **({"agx_s": agx_s, "agx_r": agx_r, "agy_s": agy_s,
            "agy_r": agy_r, "agx_send_sem": agx_send_sem,
            "agx_recv_sem": agx_recv_sem, "agy_send_sem": agy_send_sem,
            "agy_recv_sem": agy_recv_sem, "credit_agx": credit_agx,
            "credit_agy": credit_agy} if precond == "dct" else {}))
    if precond == "dct":
        prec_u = _dct_pinv_dist2d(ops, Cr_ref, Cc_ref, CTr_ref, CTc_ref,
                                  ilamu_ref, ucur_ref.dtype)
        prec_v = _dct_pinv_dist2d(ops, Cr_ref, Cc_ref, CTr_ref, CTc_ref,
                                  ilamv_ref, ucur_ref.dtype)
    else:
        prec_u = None
        prec_v = None

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = ucur_ref.dtype
    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]

    # ---- v half-step: Mat2 v^{n+1} = M v^n + dt/r (c u, phi) ------------
    uext1 = ops.exchange2d(u_n, 1)
    cext1 = ops.exchange2d(c_i, 1)
    cmask1 = _cell_mask2d(ops.row0 - 1, ops.col0 - 1, nlr + 1, nlc + 1,
                          n, dtype)
    load_ext = _lf_prod_rect([cext1, uext1], ncr=nlr + 1, ncc=nlc + 1,
                             h2=h2, cmask=cmask1)
    load = load_ext[1 : nlr + 1, 1 : nlc + 1]

    apply_M = ops.make_apply(M_ref)
    b_v = apply_M(v_n) + (dt * inv_r) * load
    x0v = 2.0 * v_n - vprev_ref[:, :] if warm else v_n
    v_np1 = ops.dcg(
        ops.make_apply(Mat2_ref),
        prec_v if prec_v is not None else 1.0 / Mat2_ref[CENTER, :, :],
        b_v, x0v)

    # ---- u half-step: assemble A on the 2-deep-extended block -----------
    uext2 = ops.exchange2d(u_n, 2)
    vext2 = ops.exchange2d(v_np1, 2)
    cmask2 = _cell_mask2d(ops.row0 - 2, ops.col0 - 2, nlr + 3, nlc + 3,
                          n, dtype)
    _assemble_forward_A_rect(
        uext2, vext2, Kx_ref, Aext_ref,
        ncr=nlr + 3, ncc=nlc + 3, Dm=Dm, chi=chi, eta=eta,
        wts=wts4, bary=bary4, grads=grads, cmask=cmask2)

    if reaction == "mimura":
        ue1 = uext2[1 : nlr + 3, 1 : nlc + 3]
        r2 = _lf_prod_rect([ue1, ue1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                           cmask=cmask1)
        r3 = _lf_prod_rect([ue1, ue1, ue1], ncr=nlr + 1, ncc=nlc + 1,
                           h2=h2, cmask=cmask1, scale=-1.0)
        rhs_u = (r2 + r3)[1 : nlr + 1, 1 : nlc + 1]
    else:
        rhs_u = jnp.zeros_like(u_n)

    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_n, rhs_u, x0u, n=n, nlr=nlr, nlc=nlc, dt=dt,
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


def _slice_block(x, r0, c0, kr, kc, pad=0):
    """x padded by ``pad`` on the last two dims, then the (kr, kc) block
    whose (0,0) sits at global (r0-pad, c0-pad)."""
    r0 = jnp.asarray(r0, jnp.int32)
    c0 = jnp.asarray(c0, jnp.int32)
    if x.ndim == 3:
        xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
        out = jax.lax.dynamic_slice(
            xp, (jnp.asarray(0, jnp.int32), r0, c0), (x.shape[0], kr, kc))
    else:
        xp = jnp.pad(x, ((pad, pad), (pad, pad)))
        out = jax.lax.dynamic_slice(xp, (r0, c0), (kr, kc))
    return out


def _slice_dct2d(C_rep, ilamu_rep, ilamv_rep, r0, c0, nlr, nlc):
    """This device's DCT-preconditioner slices (see _dct_pinv_dist2d):
    row/column slices of C and C^T plus the local ilam blocks."""
    CT_rep = jnp.transpose(C_rep)
    rows = lambda x, lo, k: jax.lax.dynamic_slice_in_dim(x, lo, k, axis=0)
    Cr = rows(C_rep, r0, nlr)
    Cc = rows(C_rep, c0, nlc)
    CTr = rows(CT_rep, r0, nlr)
    CTc = rows(CT_rep, c0, nlc)
    ilamu_loc = _slice_block(ilamu_rep, r0, c0, nlr, nlc)
    ilamv_loc = _slice_block(ilamv_rep, r0, c0, nlr, nlc)
    return Cr, Cc, CTr, CTc, ilamu_loc, ilamv_loc


def _dct2d_specs(nlr, nlc, n, use_dct=True):
    """in_specs for the six DCT-preconditioner kernel inputs (tiny
    placeholders under precond="jacobi", where they are never read)."""
    if not use_dct:
        dmy = pl.BlockSpec((1, 128), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
        return [dmy] * 6
    row_slice = pl.BlockSpec((nlr, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    col_slice = pl.BlockSpec((nlc, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    block = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    return [row_slice, col_slice, row_slice, col_slice, block, block]


def _device2d_fwd(c_loc, u0_loc, v0_loc, K_rep, M_rep, Md_rep, ML_rep,
                  Mat2_rep, C_rep, ilamu_rep, ilamv_rep, *, ax_r, ax_c, n,
                  nlr, nlc, nr, nc, steps, dt,
                  Dm, chi, eta, inv_r, tol, iters, cheb_iters, wts4, bary4,
                  h2, grads, warm, reaction, precond):
    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    r0 = me_r * nlr
    c0 = me_c * nlc
    Kx = _slice_block(K_rep, r0, c0, nlr + 4, nlc + 4, pad=2)
    M_loc = _slice_block(M_rep, r0, c0, nlr, nlc)
    Mat2_loc = _slice_block(Mat2_rep, r0, c0, nlr, nlc)
    Md_loc = _slice_block(Md_rep, r0, c0, nlr, nlc)
    ML_loc = _slice_block(ML_rep, r0, c0, nlr, nlc)
    dtype = u0_loc.dtype
    use_dct = precond == "dct"
    if use_dct:
        Cr, Cc, CTr, CTc, ilamu_loc, ilamv_loc = _slice_dct2d(
            C_rep, ilamu_rep, ilamv_rep, r0, c0, nlr, nlc)
    else:
        # jacobi: the DCT operands are never read — tiny placeholders
        Cr = jnp.zeros((1, 128), dtype)
        Cc = CTr = CTc = ilamu_loc = ilamv_loc = Cr

    kern = functools.partial(
        _dist2d_fwd_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, dt=dt, Dm=Dm, chi=chi, eta=eta, inv_r=inv_r, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts4=wts4, bary4=bary4, h2=h2,
        grads=grads, warm=warm, reaction=reaction, precond=precond,
    )
    field = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nlr, nlc), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nlr + 4, nlc + 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    frame = pl.BlockSpec((1, nlr, nlc), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    u_traj, v_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[frame, field, field, stencil_ext, stencil_loc, field,
                  field, stencil_loc] + _dct2d_specs(nlr, nlc, n, use_dct),
        out_specs=(frame, frame, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nlr, nlc), dtype),            # u current
            pltpu.VMEM((nlr, nlc), dtype),            # v current
            pltpu.VMEM((nlr, nlc), dtype),            # u prev
            pltpu.VMEM((nlr, nlc), dtype),            # v prev
            pltpu.VMEM((9, nlr + 4, nlc + 4), dtype),  # A ext -> Low
            pltpu.VMEM((9, nlr, nlc), dtype),         # D
            pltpu.VMEM((nlr + 2, nlc + 2), dtype),    # hpad
        ] + _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k=2, col_k=2,
                            gather=True if use_dct else "dummy"),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(c_loc[1:], u0_loc, v0_loc, Kx, M_loc, Md_loc, ML_loc, Mat2_loc,
      Cr, Cc, CTr, CTc, ilamu_loc, ilamv_loc)
    u_traj = jnp.concatenate([u0_loc[None], u_traj], axis=0)
    v_traj = jnp.concatenate([v0_loc[None], v_traj], axis=0)
    return u_traj, v_traj, inv


def dist2d_chemotaxis_forward_sweep(c_traj, u0, v0, K, M, M_diag, ML_diag,
                                    Mat2, mesh, *, h, dt, Dm, chi, eta,
                                    rescaling, tol=1e-6, iters=60,
                                    cheb_iters=20, warm=True, reaction=None,
                                    axes=None, precond="dct", Df=None,
                                    delta=None, with_stats=False):
    """Multi-chip chemotaxis forward sweep over a 2-D (rows x cols) device
    mesh: each device owns an (n/nr, n/nc) block; halos move over ICI in a
    row phase + a column phase (corners ride the column phase). Semantics
    identical to the 1-D dist sweep / the single-chip fused sweep.
    ``precond="dct"`` (default, needs Df+delta) runs the 2-D-distributed
    spectral preconditioner (_dct_pinv_dist2d); otherwise Jacobi."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    n = u0.shape[-1]
    if axes is None:
        axes = mesh.axis_names[:2]
    ax_r, ax_c = axes
    nr = mesh.shape[ax_r]
    nc = mesh.shape[ax_c]
    if n % nr or n % nc:
        raise ValueError(f"n={n} not divisible by mesh {nr}x{nc}")
    nlr, nlc = n // nr, n // nc
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
        _device2d_fwd, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr,
        nc=nc, steps=steps, dt=dt, Dm=Dm, chi=chi, eta=eta,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        wts4=wts4, bary4=bary4, h2=h * h, grads=grads, warm=warm,
        reaction=reaction, precond=precond,
    )
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_f, spec_f, rep3, rep3, rep2, rep2, rep3,
                  rep2, rep2, rep2),
        out_specs=(spec_t, spec_t, P(ax_r, ax_c)),
        check_vma=False,
    )
    u_traj, v_traj, inv = fn(c_traj, u0, v0, K, M, M_diag, ML_diag, Mat2,
                             C, ilam_u, ilam_v)
    _sync_interpret(u_traj, v_traj, inv)
    if with_stats:
        return u_traj, v_traj, jnp.min(inv)
    return u_traj, v_traj


def _dist2d_adj_kernel(
    u_ref, v_ref, c_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    Kx_ref, M_ref, Md_ref, ML_ref, Mat2_ref,
    Cr_ref, Cc_ref, CTr_ref, CTc_ref, ilamp_ref, ilamq_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref,
    Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    agx_s, agx_r, agy_s, agy_r,
    agx_send_sem, agx_recv_sem, agy_send_sem, agy_recv_sem,
    credit_agx, credit_agy,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, Dm, chi, eta, inv_r, tol,
    iters, cheb_iters, wts5, bary5, wts4, bary4, h2, grads, warm, reaction,
    precond,
):
    """2-D analogue of pallas_dist._dist_adj_kernel: p FCT with the
    transposed-stencil matrix, then the implicit q solve
    (helpers.py:1387-1581)."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=pcur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot,
        **({"agx_s": agx_s, "agx_r": agx_r, "agy_s": agy_s,
            "agy_r": agy_r, "agx_send_sem": agx_send_sem,
            "agx_recv_sem": agx_recv_sem, "agy_send_sem": agy_send_sem,
            "agy_recv_sem": agy_recv_sem, "credit_agx": credit_agx,
            "credit_agy": credit_agy} if precond == "dct" else {}))
    if precond == "dct":
        prec_p = _dct_pinv_dist2d(ops, Cr_ref, Cc_ref, CTr_ref, CTc_ref,
                                  ilamp_ref, pcur_ref.dtype)
        prec_q = _dct_pinv_dist2d(ops, Cr_ref, Cc_ref, CTr_ref, CTc_ref,
                                  ilamq_ref, pcur_ref.dtype)
    else:
        prec_p = None
        prec_q = None

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = pcur_ref.dtype
    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]
    c_n = c_ref[0, :, :]

    # ---- p FCT half-step (helpers.py:1498-1510) -------------------------
    uext2 = ops.exchange2d(u_n, 2)
    vext2 = ops.exchange2d(v_n, 2)
    cmask2 = _cell_mask2d(ops.row0 - 2, ops.col0 - 2, nlr + 3, nlc + 3,
                          n, dtype)
    _assemble_adjoint_A_rect(
        uext2, vext2, Kx_ref, Aext_ref,
        ncr=nlr + 3, ncc=nlc + 3, Dm=Dm, chi=chi, eta=eta,
        wts=wts5, bary=bary5, grads=grads, cmask=cmask2)

    cext1 = ops.exchange2d(c_n, 1)
    qext1 = ops.exchange2d(q_np1, 1)
    cmask1 = _cell_mask2d(ops.row0 - 1, ops.col0 - 1, nlr + 1, nlc + 1,
                          n, dtype)
    load_ext = _lf_prod_rect([cext1, qext1], ncr=nlr + 1, ncc=nlc + 1,
                             h2=h2, cmask=cmask1, scale=inv_r)
    rhs = load_ext[1 : nlr + 1, 1 : nlc + 1] + misu_ref[0, :, :]

    if reaction == "mimura":
        ue1 = uext2[1 : nlr + 3, 1 : nlc + 3]
        W1 = _wm_prod_rect([ue1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                           cmask=cmask1, scale=-2.0)
        W2 = _wm_prod_rect([ue1, ue1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                           cmask=cmask1, scale=3.0)
        S = [
            (W1[d][1 : nlr + 1, 1 : nlc + 1] if W1[d] is not None else 0.0)
            + (W2[d][1 : nlr + 1, 1 : nlc + 1] if W2[d] is not None else 0.0)
            if (W1[d] is not None or W2[d] is not None) else None
            for d in range(9)
        ]
    else:
        S = None

    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        p_np1, rhs, x0p, n=n, nlr=nlr, nlc=nlc, dt=dt,
        cheb_iters=cheb_iters, S=S, prec=prec_p, inv_ref=inv_ref)

    # ---- q implicit half-step (helpers.py:1531-1538) --------------------
    pext1 = ops.exchange2d(p_n, 1)
    uext1 = uext2[1 : nlr + 3, 1 : nlc + 3]
    qload_ext = _q_load_rect(
        pext1, uext1, ncr=nlr + 1, ncc=nlc + 1,
        chi=chi, eta=eta, wts=wts4, bary=bary4, grads=grads, cmask=cmask1)
    qload = qload_ext[1 : nlr + 1, 1 : nlc + 1] + misv_ref[0, :, :]

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


def _device2d_adj(u_loc, v_loc, c_loc, misu_loc, misv_loc, pT_loc, qT_loc,
                  K_rep, M_rep, Md_rep, ML_rep, Mat2_rep, C_rep, ilamp_rep,
                  ilamq_rep, *, ax_r, ax_c, n,
                  nlr, nlc, nr, nc, steps, dt, Dm, chi, eta, inv_r, tol,
                  iters, cheb_iters, wts5, bary5, wts4, bary4, h2, grads,
                  warm, has_mis, reaction, precond):
    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    r0 = me_r * nlr
    c0 = me_c * nlc
    Kx = _slice_block(K_rep, r0, c0, nlr + 4, nlc + 4, pad=2)
    M_loc = _slice_block(M_rep, r0, c0, nlr, nlc)
    Mat2_loc = _slice_block(Mat2_rep, r0, c0, nlr, nlc)
    Md_loc = _slice_block(Md_rep, r0, c0, nlr, nlc)
    ML_loc = _slice_block(ML_rep, r0, c0, nlr, nlc)
    dtype = pT_loc.dtype
    use_dct = precond == "dct"
    if use_dct:
        Cr, Cc, CTr, CTc, ilamp_loc, ilamq_loc = _slice_dct2d(
            C_rep, ilamp_rep, ilamq_rep, r0, c0, nlr, nlc)
    else:
        Cr = jnp.zeros((1, 128), dtype)
        Cc = CTr = CTc = ilamp_loc = ilamq_loc = Cr
    kern = functools.partial(
        _dist2d_adj_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, dt=dt, Dm=Dm, chi=chi, eta=eta, inv_r=inv_r, tol=tol,
        iters=iters, cheb_iters=cheb_iters, wts5=wts5, bary5=bary5,
        wts4=wts4, bary4=bary4, h2=h2, grads=grads, warm=warm,
        reaction=reaction, precond=precond,
    )
    field = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nlr, nlc), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nlr + 4, nlc + 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    rev = pl.BlockSpec((1, nlr, nlc), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    mis_spec = rev if has_mis else pl.BlockSpec(
        (1, nlr, nlc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[rev, rev, rev, mis_spec, mis_spec, field, field,
                  stencil_ext, stencil_loc, field, field, stencil_loc]
        + _dct2d_specs(nlr, nlc, n, use_dct),
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nlr, nlc), dtype),            # p current
            pltpu.VMEM((nlr, nlc), dtype),            # q current
            pltpu.VMEM((nlr, nlc), dtype),            # p prev
            pltpu.VMEM((nlr, nlc), dtype),            # q prev
            pltpu.VMEM((9, nlr + 4, nlc + 4), dtype),  # A ext -> Low
            pltpu.VMEM((9, nlr, nlc), dtype),         # D
            pltpu.VMEM((nlr + 2, nlc + 2), dtype),    # hpad
        ] + _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k=2, col_k=2,
                            gather=True if use_dct else "dummy"),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(u_loc, v_loc, c_loc, misu_loc, misv_loc, pT_loc, qT_loc,
      Kx, M_loc, Md_loc, ML_loc, Mat2_loc, Cr, Cc, CTr, CTc,
      ilamp_loc, ilamq_loc)
    p_traj = jnp.concatenate([p_traj, pT_loc[None]], axis=0)
    q_traj = jnp.concatenate([q_traj, qT_loc[None]], axis=0)
    return p_traj, q_traj, inv


def dist2d_chemotaxis_adjoint_sweep(u_traj, v_traj, c_traj, pT, qT, K, M,
                                    M_diag, ML_diag, Mat2, mesh, mis_u=None,
                                    mis_v=None, *, h, dt, Dm, chi, eta,
                                    rescaling, tol=1e-6, iters=60,
                                    cheb_iters=20, warm=True, reaction=None,
                                    axes=None, precond="dct", Df=None,
                                    delta=None, with_stats=False):
    """Multi-chip chemotaxis adjoint sweep over a 2-D device mesh (the
    reverse-streamed analogue of dist2d_chemotaxis_forward_sweep)."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops.pallas_fused import dct_matrix, dct_precond_ilam

    n = pT.shape[-1]
    if axes is None:
        axes = mesh.axis_names[:2]
    ax_r, ax_c = axes
    nr = mesh.shape[ax_r]
    nc = mesh.shape[ax_c]
    if n % nr or n % nc:
        raise ValueError(f"n={n} not divisible by mesh {nr}x{nc}")
    nlr, nlc = n // nr, n // nc
    steps = u_traj.shape[0] - 1
    wts5, bary5, grads = _quad_consts(5, h)
    wts4, bary4, _ = _quad_consts(4, h)
    wts5 = wts5 * h * h
    wts4 = wts4 * h * h
    has_mis = mis_u is not None
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u
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
        _device2d_adj, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr,
        nc=nc, steps=steps, dt=dt, Dm=Dm, chi=chi, eta=eta,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        wts5=wts5, bary5=bary5, wts4=wts4, bary4=bary4, h2=h * h,
        grads=grads, warm=warm, has_mis=has_mis, reaction=reaction,
        precond=precond,
    )
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_t, spec_t, spec_f, spec_f,
                  rep3, rep3, rep2, rep2, rep3, rep2, rep2, rep2),
        out_specs=(spec_t, spec_t, P(ax_r, ax_c)),
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
# 2-D distributed single-field FCT sweep (nonlinear equation, linear
# advection state/adjoint — helpers.py:881-1038,
# advection_FCT_PDECO_finaltime.py:194-231)
# ---------------------------------------------------------------------------


def _dist2d_scalar_kernel(
    load_ref, x0_ref, Aflux_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, tol, iters, cheb_iters, h2,
    warm, nonflux_mode, load_is_mass,
):
    """2-D analogue of pallas_dist._dist_scalar_kernel: one FCT field with a
    stationary flux matrix, optional per-step IMEX non-flux weighted mass
    (nonlinear state +1 / adjoint -1), per-step load frames."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=cur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot)

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = cur_ref.dtype
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
        uext1 = ops.exchange2d(u_for_S, 1)
        cmask1 = _cell_mask2d(ops.row0 - 1, ops.col0 - 1, nlr + 1, nlc + 1,
                              n, dtype)
        Mu2 = _wm_prod_rect([uext1, uext1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                            cmask=cmask1)
        scale = (1.0 / 3.0) if nonflux_mode > 0 else 1.0
        S = [
            (scale * Mu2[d][1 : nlr + 1, 1 : nlc + 1]
             if Mu2[d] is not None else 0.0)
            - M_ref[d, :, :]
            for d in range(9)
        ]

    for d in range(9):
        Aext_ref[d, :, :] = Aflux_ref[d, :, :]

    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        x_n, rhs, x0w, n=n, nlr=nlr, nlc=nlc, dt=dt,
        cheb_iters=cheb_iters, S=S, inv_ref=inv_ref)

    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _frame_specs2d(steps, F, nlr, nlc, reverse):
    if reverse:
        frame_in = pl.BlockSpec((1, F, nlr, nlc),
                                lambda i: (steps - 1 - i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nlr, nlc),
                                 lambda i: (steps - 1 - i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        frame_in = pl.BlockSpec((1, F, nlr, nlc), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        frame_out = pl.BlockSpec((1, nlr, nlc), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return frame_in, frame_out


def _device2d_scalar(load_loc, x0_loc, A_rep, M_rep, Md_rep, ML_rep, *,
                     ax_r, ax_c, n, nlr, nlc, nr, nc, steps, F, dt, tol,
                     iters, cheb_iters, h2, warm, nonflux_mode,
                     load_is_mass, reverse):
    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    r0 = me_r * nlr
    c0 = me_c * nlc
    Ax = _slice_block(A_rep, r0, c0, nlr + 4, nlc + 4, pad=2)
    M_loc = _slice_block(M_rep, r0, c0, nlr, nlc)
    Md_loc = _slice_block(Md_rep, r0, c0, nlr, nlc)
    ML_loc = _slice_block(ML_rep, r0, c0, nlr, nlc)

    dtype = x0_loc.dtype
    kern = functools.partial(
        _dist2d_scalar_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, dt=dt, tol=tol, iters=iters, cheb_iters=cheb_iters,
        h2=h2, warm=warm, nonflux_mode=nonflux_mode,
        load_is_mass=load_is_mass,
    )
    field = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nlr, nlc), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nlr + 4, nlc + 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    frame_in, frame_out = _frame_specs2d(steps, F, nlr, nlc, reverse)
    out, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
                   _inv_shape(dtype)),
        in_specs=[frame_in, field, stencil_ext, stencil_loc, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nlr, nlc), dtype),             # x current
            pltpu.VMEM((nlr, nlc), dtype),             # x prev (warm start)
            pltpu.VMEM((9, nlr + 4, nlc + 4), dtype),  # A ext -> Low
            pltpu.VMEM((9, nlr, nlc), dtype),          # D
            pltpu.VMEM((nlr + 2, nlc + 2), dtype),     # hpad
        ] + _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k=2, col_k=2),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(load_loc, x0_loc, Ax, M_loc, Md_loc, ML_loc)
    return out, inv


def dist2d_scalar_fct_sweep(load_traj, x0, A_flux, M, M_diag, ML_diag, mesh,
                            *, h, dt, tol=1e-6, iters=60, cheb_iters=20,
                            warm=True, nonflux_mode=0, load_is_mass=True,
                            reverse=False, axes=None, with_stats=False):
    """Multi-chip single-field FCT sweep over a 2-D (rows x cols) device
    mesh — semantics identical to pallas_dist.dist_scalar_fct_sweep, halos
    via the two-phase 2-D RDMA protocol."""
    from jax import shard_map

    n = x0.shape[-1]
    if axes is None:
        axes = mesh.axis_names[:2]
    ax_r, ax_c = axes
    nr = mesh.shape[ax_r]
    nc = mesh.shape[ax_c]
    if n % nr or n % nc:
        raise ValueError(f"n={n} not divisible by mesh {nr}x{nc}")
    nlr, nlc = n // nr, n // nc
    steps = load_traj.shape[0]
    F = load_traj.shape[1]

    body = functools.partial(
        _device2d_scalar, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, steps=steps, F=F, dt=dt, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, warm=warm,
        nonflux_mode=nonflux_mode, load_is_mass=load_is_mass,
        reverse=reverse,
    )
    spec_l = P(None, None, ax_r, ax_c)
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_l, spec_f, rep3, rep3, rep2, rep2),
        out_specs=(spec_t, P(ax_r, ax_c)),
        check_vma=False,
    )
    out, inv = fn(load_traj, x0, A_flux, M, M_diag, ML_diag)
    _sync_interpret(out, inv)
    return (out, jnp.min(inv)) if with_stats else out

# ---------------------------------------------------------------------------
# 2-D distributed Schnakenberg sweeps (helpers.py:511-698)
# ---------------------------------------------------------------------------


def _dist2d_schnak_fwd_kernel(
    c_ref, u0_ref, v0_ref, Au_ref, M_ref, Md_ref, ML_ref, Mbv_ref,
    uout_ref, vout_ref, inv_ref,
    ucur_ref, vcur_ref, uprev_ref, vprev_ref,
    Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, gamma, c_b, inv_r, tol, iters,
    cheb_iters, h2, warm,
):
    """2-D analogue of pallas_dist._dist_schnak_fwd_kernel: u FCT with
    rhs = γ(c/r + u²v) and non_flux = γM, then the v implicit solve with
    the u²-weighted mass assembled from the NEW u (helpers.py:581-596)."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=ucur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot)

    @pl.when(i == 0)
    def _():
        ucur_ref[:, :] = u0_ref[:, :]
        vcur_ref[:, :] = v0_ref[:, :]
        uprev_ref[:, :] = u0_ref[:, :]
        vprev_ref[:, :] = v0_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = ucur_ref.dtype
    u_n = ucur_ref[:, :]
    v_n = vcur_ref[:, :]
    c_i = c_ref[0, :, :]

    cmask1 = _cell_mask2d(ops.row0 - 1, ops.col0 - 1, nlr + 1, nlc + 1,
                          n, dtype)

    # u FCT: rhs = γ(c/r + u²v), non_flux = γM
    apply_M = ops.make_apply(M_ref)
    Mc = apply_M(c_i)
    uext1 = ops.exchange2d(u_n, 1)
    vext1 = ops.exchange2d(v_n, 1)
    load_ext = _lf_prod_rect([uext1, uext1, vext1], ncr=nlr + 1,
                             ncc=nlc + 1, h2=h2, cmask=cmask1, scale=gamma)
    rhs_u = (gamma * inv_r) * Mc + load_ext[1 : nlr + 1, 1 : nlc + 1]

    S = [gamma * M_ref[d, :, :] for d in range(9)]
    for d in range(9):
        Aext_ref[d, :, :] = Au_ref[d, :, :]
    x0u = 2.0 * u_n - uprev_ref[:, :] if warm else u_n
    u_np1 = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        u_n, rhs_u, x0u, n=n, nlr=nlr, nlc=nlc, dt=dt,
        cheb_iters=cheb_iters, S=S, inv_ref=inv_ref)

    # v implicit with the NEW u: Mat_v = Mbv + dt γ M_{u²}
    uext1n = ops.exchange2d(u_np1, 1)
    Mu2 = _wm_prod_rect([uext1n, uext1n], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                        cmask=cmask1)
    MatV = [
        Mbv_ref[d, :, :]
        + ((dt * gamma) * Mu2[d][1 : nlr + 1, 1 : nlc + 1]
           if Mu2[d] is not None else 0.0)
        for d in range(9)
    ]

    def apply_matv(x):
        ops.fill_hpad(ops.exchange2d(x, 1))
        return ops.plane_sum(lambda d: MatV[d], x)

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


def _dist2d_schnak_adj_kernel(
    u_ref, v_ref, misu_ref, misv_ref, pT_ref, qT_ref,
    Aadj_ref, M_ref, Md_ref, ML_ref, Mbq_ref,
    pout_ref, qout_ref, inv_ref,
    pcur_ref, qcur_ref, pprev_ref, qprev_ref,
    Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, gamma, tol, iters, cheb_iters,
    h2, warm,
):
    """2-D analogue of pallas_dist._dist_schnak_adj_kernel: the q implicit
    solve (Mat_q = Mbq + dt γ M_{u²}, rhs = γ p u²), then the p FCT with
    non_flux = γM - 2γM_{uv} and rhs = -2γ u v q (helpers.py:680-697)."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=pcur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot)

    @pl.when(i == 0)
    def _():
        pcur_ref[:, :] = pT_ref[:, :]
        qcur_ref[:, :] = qT_ref[:, :]
        pprev_ref[:, :] = pT_ref[:, :]
        qprev_ref[:, :] = qT_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = pcur_ref.dtype
    p_np1 = pcur_ref[:, :]
    q_np1 = qcur_ref[:, :]
    u_n = u_ref[0, :, :]
    v_n = v_ref[0, :, :]

    cmask1 = _cell_mask2d(ops.row0 - 1, ops.col0 - 1, nlr + 1, nlc + 1,
                          n, dtype)
    uext1 = ops.exchange2d(u_n, 1)
    vext1 = ops.exchange2d(v_n, 1)
    pext1 = ops.exchange2d(p_np1, 1)

    # q implicit first: Mat_q = Mbq + dt γ M_{u²}
    Mu2 = _wm_prod_rect([uext1, uext1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                        cmask=cmask1)
    MatQ = [
        Mbq_ref[d, :, :]
        + ((dt * gamma) * Mu2[d][1 : nlr + 1, 1 : nlc + 1]
           if Mu2[d] is not None else 0.0)
        for d in range(9)
    ]

    def apply_matq(x):
        ops.fill_hpad(ops.exchange2d(x, 1))
        return ops.plane_sum(lambda d: MatQ[d], x)

    rhs_q_ext = _lf_prod_rect([pext1, uext1, uext1], ncr=nlr + 1,
                              ncc=nlc + 1, h2=h2, cmask=cmask1, scale=gamma)
    rhs_q = rhs_q_ext[1 : nlr + 1, 1 : nlc + 1] + misv_ref[0, :, :]
    apply_M = ops.make_apply(M_ref)
    b = apply_M(q_np1) + dt * rhs_q
    x0q = 2.0 * q_np1 - qprev_ref[:, :] if warm else q_np1
    q_n = ops.dcg(apply_matq, 1.0 / MatQ[CENTER], b, x0q)

    # p FCT: rhs = -2γ u v q_n, S = γM - 2γ M_{uv}
    qext1 = ops.exchange2d(q_n, 1)
    rhs_p_ext = _lf_prod_rect([uext1, vext1, qext1], ncr=nlr + 1,
                              ncc=nlc + 1, h2=h2, cmask=cmask1,
                              scale=-2.0 * gamma)
    rhs_p = rhs_p_ext[1 : nlr + 1, 1 : nlc + 1] + misu_ref[0, :, :]

    Muv = _wm_prod_rect([uext1, vext1], ncr=nlr + 1, ncc=nlc + 1, h2=h2,
                        cmask=cmask1)
    S = [
        gamma * M_ref[d, :, :]
        - ((2.0 * gamma) * Muv[d][1 : nlr + 1, 1 : nlc + 1]
           if Muv[d] is not None else 0.0)
        for d in range(9)
    ]
    for d in range(9):
        Aext_ref[d, :, :] = Aadj_ref[d, :, :]
    x0p = 2.0 * p_np1 - pprev_ref[:, :] if warm else p_np1
    p_n = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        p_np1, rhs_p, x0p, n=n, nlr=nlr, nlc=nlc, dt=dt,
        cheb_iters=cheb_iters, S=S, inv_ref=inv_ref)

    pprev_ref[:, :] = p_np1
    qprev_ref[:, :] = q_np1
    pcur_ref[:, :] = p_n
    qcur_ref[:, :] = q_n
    pout_ref[0, :, :] = p_n
    qout_ref[0, :, :] = q_n

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _device2d_schnak(adjoint, *arrays, ax_r, ax_c, n, nlr, nlc, nr, nc,
                     steps, dt, gamma, c_b, inv_r, tol, iters, cheb_iters,
                     h2, warm, has_mis):
    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    r0 = me_r * nlr
    c0 = me_c * nlc

    def ext(x):
        return _slice_block(x, r0, c0, nlr + 4, nlc + 4, pad=2)

    def loc(x):
        return _slice_block(x, r0, c0, nlr, nlc)

    field = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nlr, nlc), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nlr + 4, nlc + 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    base_scratch = lambda dtype: [
        pltpu.VMEM((nlr, nlc), dtype),
        pltpu.VMEM((nlr, nlc), dtype),
        pltpu.VMEM((nlr, nlc), dtype),
        pltpu.VMEM((nlr, nlc), dtype),
        pltpu.VMEM((9, nlr + 4, nlc + 4), dtype),  # A ext -> Low
        pltpu.VMEM((9, nlr, nlc), dtype),          # D
        pltpu.VMEM((nlr + 2, nlc + 2), dtype),     # hpad
    ] + _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k=2, col_k=2)

    if not adjoint:
        c_loc, u0_loc, v0_loc, A_u, M, Md, ML, Mbv = arrays
        dtype = u0_loc.dtype
        kern = functools.partial(
            _dist2d_schnak_fwd_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr,
            nlc=nlc, nr=nr, nc=nc, dt=dt, gamma=gamma, c_b=c_b,
            inv_r=inv_r, tol=tol, iters=iters, cheb_iters=cheb_iters,
            h2=h2, warm=warm)
        frame = pl.BlockSpec((1, nlr, nlc), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        u_traj, v_traj, inv = pl.pallas_call(
            kern,
            grid=(steps,),
            out_shape=(
                jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
                jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
                _inv_shape(dtype),
            ),
            in_specs=[frame, field, field, stencil_ext, stencil_loc, field,
                      field, stencil_loc],
            out_specs=(frame, frame, _inv_spec()),
            scratch_shapes=base_scratch(dtype),
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
        _dist2d_schnak_adj_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr,
        nlc=nlc, nr=nr, nc=nc, dt=dt, gamma=gamma, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h2, warm=warm)
    rev = pl.BlockSpec((1, nlr, nlc), lambda i: (steps - 1 - i, 0, 0),
                       memory_space=pltpu.VMEM)
    mis_spec = rev if has_mis else pl.BlockSpec(
        (1, nlr, nlc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    p_traj, q_traj, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
            _inv_shape(dtype),
        ),
        in_specs=[rev, rev, mis_spec, mis_spec, field, field,
                  stencil_ext, stencil_loc, field, field, stencil_loc],
        out_specs=(rev, rev, _inv_spec()),
        scratch_shapes=base_scratch(dtype),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(u_loc, v_loc, misu, misv, pT_loc, qT_loc, ext(A_adj), loc(M),
      loc(Md), loc(ML), loc(Mbq))
    p_traj = jnp.concatenate([p_traj, pT_loc[None]], axis=0)
    q_traj = jnp.concatenate([q_traj, qT_loc[None]], axis=0)
    return p_traj, q_traj, inv


def _resolve_mesh2d(mesh, axes, n):
    if axes is None:
        axes = mesh.axis_names[:2]
    ax_r, ax_c = axes
    nr = mesh.shape[ax_r]
    nc = mesh.shape[ax_c]
    if n % nr or n % nc:
        raise ValueError(f"n={n} not divisible by mesh {nr}x{nc}")
    return ax_r, ax_c, nr, nc


def dist2d_schnak_forward_sweep(c_traj, u0, v0, A_u, M, M_diag, ML_diag,
                                Mbase_v, mesh, *, h, dt, gamma, c_b,
                                rescaling, tol=1e-6, iters=60,
                                cheb_iters=20, warm=True, axes=None,
                                with_stats=False):
    """Multi-chip Schnakenberg forward sweep over a 2-D device mesh —
    semantics identical to pallas_dist.dist_schnak_forward_sweep
    (helpers.py:511-597)."""
    from jax import shard_map

    n = u0.shape[-1]
    ax_r, ax_c, nr, nc = _resolve_mesh2d(mesh, axes, n)
    nlr, nlc = n // nr, n // nc
    steps = c_traj.shape[0] - 1

    body = functools.partial(
        _device2d_schnak, False, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr,
        nlc=nlc, nr=nr, nc=nc, steps=steps, dt=dt, gamma=gamma, c_b=c_b,
        inv_r=1.0 / rescaling, tol=tol, iters=iters, cheb_iters=cheb_iters,
        h2=h * h, warm=warm, has_mis=False)
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_f, spec_f, rep3, rep3, rep2, rep2, rep3),
        out_specs=(spec_t, spec_t, P(ax_r, ax_c)),
        check_vma=False,
    )
    u_traj, v_traj, inv = fn(c_traj, u0, v0, A_u, M, M_diag, ML_diag,
                             Mbase_v)
    _sync_interpret(u_traj, v_traj, inv)
    if with_stats:
        return u_traj, v_traj, jnp.min(inv)
    return u_traj, v_traj


def dist2d_schnak_adjoint_sweep(u_traj, v_traj, pT, qT, A_u_adj, M, M_diag,
                                ML_diag, Mbase_q, mesh, mis_u=None,
                                mis_v=None, *, h, dt, gamma, tol=1e-6,
                                iters=60, cheb_iters=20, warm=True,
                                axes=None, with_stats=False):
    """Multi-chip Schnakenberg adjoint sweep over a 2-D device mesh —
    semantics identical to pallas_dist.dist_schnak_adjoint_sweep
    (helpers.py:599-698)."""
    from jax import shard_map

    n = pT.shape[-1]
    ax_r, ax_c, nr, nc = _resolve_mesh2d(mesh, axes, n)
    nlr, nlc = n // nr, n // nc
    steps = u_traj.shape[0] - 1
    has_mis = mis_u is not None
    if not has_mis:
        mis_u = jnp.zeros((1, n, n), dtype=pT.dtype)
        mis_v = mis_u

    body = functools.partial(
        _device2d_schnak, True, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr,
        nlc=nlc, nr=nr, nc=nc, steps=steps, dt=dt, gamma=gamma, c_b=0.0,
        inv_r=1.0, tol=tol, iters=iters, cheb_iters=cheb_iters, h2=h * h,
        warm=warm, has_mis=has_mis)
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_t, spec_t, spec_t, spec_t, spec_f, spec_f,
                  rep3, rep3, rep2, rep2, rep3),
        out_specs=(spec_t, spec_t, P(ax_r, ax_c)),
        check_vma=False,
    )
    p_traj, q_traj, inv = fn(u_traj[:-1], v_traj[:-1], mis_u, mis_v, pT,
                             qT, A_u_adj, M, M_diag, ML_diag, Mbase_q)
    _sync_interpret(p_traj, q_traj, inv)
    if with_stats:
        return p_traj, q_traj, jnp.min(inv)
    return p_traj, q_traj


# ---------------------------------------------------------------------------
# 2-D distributed drift-control sweep (advection_solidbody_FCT_PDECO_*):
# per-step Adrift1/Adrift2 assembled in-kernel on the halo-extended block.
# ---------------------------------------------------------------------------


def _dist2d_drift_kernel(
    frames_ref, x0_ref, Abase_ref, M_ref, Md_ref, ML_ref,
    out_ref, inv_ref,
    cur_ref, prev_ref, Aext_ref, D_ref, hpad_ref,
    sbuf_up, sbuf_dn, rtop, rbot,
    sbuf_lf, sbuf_rt, rlef, rrig,
    dot_s, dot_r,
    hsend_sem, hrecv_sem, csend_sem, crecv_sem, dsend_sem, drecv_sem,
    credit_up, credit_dn, credit_lf, credit_rt, credit_dot,
    *, ax_r, ax_c, n, nlr, nlc, nr, nc, dt, sign, m, tol, iters,
    cheb_iters, h2, warm, has_mis, grads,
):
    """2-D analogue of pallas_dist._dist_drift_kernel: the control-dependent
    Adrift pair is assembled each step on the 2-deep halo-extended block,
    added onto the stationary halo-extended base εK ∓ N_rot."""
    i = pl.program_id(0)
    ops = _make_ops2d(
        ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc, nr=nr, nc=nc, tol=tol,
        iters=iters, dtype=cur_ref.dtype, hpad_ref=hpad_ref,
        sbuf_up=sbuf_up, sbuf_dn=sbuf_dn, rtop=rtop, rbot=rbot,
        sbuf_lf=sbuf_lf, sbuf_rt=sbuf_rt, rlef=rlef, rrig=rrig,
        dot_s=dot_s, dot_r=dot_r,
        hsend_sem=hsend_sem, hrecv_sem=hrecv_sem, csend_sem=csend_sem,
        crecv_sem=crecv_sem, dsend_sem=dsend_sem, drecv_sem=drecv_sem,
        credit_up=credit_up, credit_dn=credit_dn, credit_lf=credit_lf,
        credit_rt=credit_rt, credit_dot=credit_dot)

    @pl.when(i == 0)
    def _():
        cur_ref[:, :] = x0_ref[:, :]
        prev_ref[:, :] = x0_ref[:, :]
        ops.init_buffers()
        ops.init_credits()
        _inv_init(inv_ref)

    dtype = cur_ref.dtype
    x_n = cur_ref[:, :]
    c_i = frames_ref[0, 0, :, :]

    cext2 = ops.exchange2d(c_i, 2)
    cmask2 = _cell_mask2d(ops.row0 - 2, ops.col0 - 2, nlr + 3, nlc + 3,
                          n, dtype)
    Ad = _drift_planes_rect(cext2, ncr=nlr + 3, ncc=nlc + 3, h2=h2, m=m,
                            grads=grads, cmask=cmask2)
    for d in range(9):
        plane = Abase_ref[d, :, :]
        if Ad[d] is not None:
            plane = plane + sign * Ad[d]
        Aext_ref[d, :, :] = plane

    rhs = frames_ref[0, 1, :, :] if has_mis else jnp.zeros_like(x_n)
    x0w = 2.0 * x_n - prev_ref[:, :] if warm else x_n
    x_np1 = _dist_fct_tail_2d(
        ops, Aext_ref, D_ref, hpad_ref, M_ref, Md_ref, ML_ref[:, :],
        x_n, rhs, x0w, n=n, nlr=nlr, nlc=nlc, dt=dt,
        cheb_iters=cheb_iters, S=None, inv_ref=inv_ref)

    prev_ref[:, :] = x_n
    cur_ref[:, :] = x_np1
    out_ref[0, :, :] = x_np1

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ops.drain()


def _device2d_drift(frames_loc, x0_loc, Abase_rep, M_rep, Md_rep, ML_rep, *,
                    ax_r, ax_c, n, nlr, nlc, nr, nc, steps, F, dt, sign, m,
                    tol, iters, cheb_iters, h2, warm, has_mis, reverse,
                    grads):
    me_r = jax.lax.axis_index(ax_r)
    me_c = jax.lax.axis_index(ax_c)
    r0 = me_r * nlr
    c0 = me_c * nlc
    Ax = _slice_block(Abase_rep, r0, c0, nlr + 4, nlc + 4, pad=2)
    M_loc = _slice_block(M_rep, r0, c0, nlr, nlc)
    Md_loc = _slice_block(Md_rep, r0, c0, nlr, nlc)
    ML_loc = _slice_block(ML_rep, r0, c0, nlr, nlc)

    dtype = x0_loc.dtype
    kern = functools.partial(
        _dist2d_drift_kernel, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, dt=dt, sign=sign, m=m, tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h2, warm=warm, has_mis=has_mis,
        grads=grads,
    )
    field = pl.BlockSpec((nlr, nlc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    stencil_loc = pl.BlockSpec((9, nlr, nlc), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    stencil_ext = pl.BlockSpec((9, nlr + 4, nlc + 4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    frame_in, frame_out = _frame_specs2d(steps, F, nlr, nlc, reverse)
    out, inv = pl.pallas_call(
        kern,
        grid=(steps,),
        out_shape=(jax.ShapeDtypeStruct((steps, nlr, nlc), dtype),
                   _inv_shape(dtype)),
        in_specs=[frame_in, field, stencil_ext, stencil_loc, field, field],
        out_specs=(frame_out, _inv_spec()),
        scratch_shapes=[
            pltpu.VMEM((nlr, nlc), dtype),             # x current
            pltpu.VMEM((nlr, nlc), dtype),             # x prev (warm start)
            pltpu.VMEM((9, nlr + 4, nlc + 4), dtype),  # A ext -> Low
            pltpu.VMEM((9, nlr, nlc), dtype),          # D
            pltpu.VMEM((nlr + 2, nlc + 2), dtype),     # hpad
        ] + _comm_scratch2d(nr, nc, nlr, nlc, dtype, row_k=2, col_k=2),
        compiler_params=_compiler_params(),
        interpret=_dist_interp(),
    )(frames_loc, x0_loc, Ax, M_loc, Md_loc, ML_loc)
    return out, inv


def dist2d_drift_fct_sweep(frames, x0, A_base, M, M_diag, ML_diag, mesh, *,
                           h, dt, sign, drift, tol=1e-6, iters=60,
                           cheb_iters=20, warm=True, reverse=False,
                           has_mis=False, axes=None, with_stats=False):
    """Multi-chip drift-control FCT sweep over a 2-D device mesh —
    semantics identical to pallas_dist.dist_drift_fct_sweep (per-step
    in-kernel Adrift assembly; sign=-1 state / +1 adjoint)."""
    from jax import shard_map

    from fem_fct_pdeco_tpu.ops.assembly import _basis_gradients

    n = x0.shape[-1]
    ax_r, ax_c, nr, nc = _resolve_mesh2d(mesh, axes, n)
    nlr, nlc = n // nr, n // nc
    steps = frames.shape[0]
    F = frames.shape[1]
    grads = _basis_gradients(h)

    body = functools.partial(
        _device2d_drift, ax_r=ax_r, ax_c=ax_c, n=n, nlr=nlr, nlc=nlc,
        nr=nr, nc=nc, steps=steps, F=F, dt=dt, sign=float(sign),
        m=tuple(float(v) for v in drift), tol=tol, iters=iters,
        cheb_iters=cheb_iters, h2=h * h, warm=warm, has_mis=has_mis,
        reverse=reverse, grads=grads,
    )
    spec_l = P(None, None, ax_r, ax_c)
    spec_t = P(None, ax_r, ax_c)
    spec_f = P(ax_r, ax_c)
    rep3 = P(None, None, None)
    rep2 = P(None, None)
    fn = shard_map(
        body, mesh=mesh,
        in_specs=(spec_l, spec_f, rep3, rep3, rep2, rep2),
        out_specs=(spec_t, P(ax_r, ax_c)),
        check_vma=False,
    )
    out, inv = fn(frames, x0, A_base, M, M_diag, ML_diag)
    _sync_interpret(out, inv)
    return (out, jnp.min(inv)) if with_stats else out
