"""Keller–Segel chemotaxis system (simplified-feathers form).

State system (reference helpers.py:1250-1385):
    du/dt + ∇·(-Dm ∇u + χ u e^{-ηu} ∇v) = 0          (FCT)
    dv/dt + ∇·(-Df ∇v) + δ v = c u / r               (implicit solve)
Adjoint system (helpers.py:1387-1581), σ = 1 for final-time, 0 for all-time:
    -dp/dt + ∇·(-Dm ∇p) - χ(1-ηu)e^{-ηu} ∇p·∇v = c q / r + (1-σ)(û-u)
    -dq/dt + ∇·(-Df ∇q + χ u e^{-ηu} ∇p) + δ q = (1-σ)(v̂-v)
Gradient equation: β c - q u / r = 0
(chemotaxis_FCT_PDECO_refactored.py:187).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.base import ModelBase
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil
from fem_fct_pdeco_tpu.timeloop import (adjoint_sweep_stats,
                                        forward_sweep_stats)


@dataclasses.dataclass(frozen=True)
class ChemotaxisParams:
    """Parameters from reference helpers.py:1197-1211."""

    delta: float = 100.0  # decay of v
    Dm: float = 0.05      # diffusion of u
    Df: float = 0.05      # diffusion of v
    chi: float = 0.25     # chemotaxis strength
    gamma: float = 100.0  # true control value
    eta: float = 0.5      # chemotactic saturation


class ChemotaxisModel(ModelBase):
    def __init__(self, grid, params: ChemotaxisParams = ChemotaxisParams(),
                 rescaling: float = 1.0 / 10.0, dtype=jnp.float64,
                 solver_opts: SolverOpts | None = None, backend: str = "xla",
                 consistent_alltime_misfit: bool = False,
                 pad_to: int | None = None, mesh=None, debug: bool = False,
                 gradient_smoothing: bool = False, quad_degree: int = 4):
        """``consistent_alltime_misfit``: the reference adds the RAW nodal
        misfit û-u to the assembled adjoint loads in all-time mode
        (helpers.py:1506-1507, dimensionally inconsistent — the gradient is
        off by ~1/mass-scale, which projected Armijo absorbs). Set True for
        the mass-weighted M(û-u) variant that satisfies the adjoint identity.

        ``quad_degree``: quadrature degree for the e^{-ηu}∇v transport
        assembly on the FORWARD path (reference FFC heuristic: 4). The
        integrand is non-polynomial, so lower degrees change the operator
        values slightly; ``quad_degree=2`` (4-point rule vs the 9-point
        degree-4 rule) more than halves the exp count per step — an opt-in
        fast path for the fused forward kernels (resident, synth and lean)
        and the XLA sweep (dist kernels and the adjoint keep the parity
        rule).

        ``gradient_smoothing``: the reference's commented-out experimental
        adjoint variant (helpers.py:1520-1528): before assembling the q
        load χ u e^{-ηu} ∇p·∇w, project the raw per-element ∇p (DG0) into
        CG1 by an L2 mass solve and use the smoothed nodal gradient field.
        XLA adjoint path only (forces backend="xla").
        """
        if gradient_smoothing and backend != "xla":
            from fem_fct_pdeco_tpu.models.base import _warn_backend_fallback

            _warn_backend_fallback(backend, "gradient_smoothing adjoint")
            backend = "xla"
        super().__init__(grid, dtype, solver_opts, backend, pad_to, mesh,
                         debug=debug)
        self.params = params
        self.rescaling = rescaling
        self.consistent_alltime_misfit = consistent_alltime_misfit
        self.gradient_smoothing = gradient_smoothing
        self.quad_degree = quad_degree

    def smooth_gradient(self, p_field):
        """DG0 -> CG1 smoothed gradient (helpers.py:1520-1525): the
        per-element constant gradient of the P1 field, L2-projected onto
        nodal CG1 components via mass solves. Returns (gx, gy) nodal."""
        asm = self.asm
        rd_opts = dataclasses.replace(self.solver_opts, symmetric=True)
        gp = asm.elem_grad(p_field)  # (2, 2comp, nc, nc), element-constant
        nq = asm.rule(2)[1].shape[0]
        out = []
        for comp in range(2):
            f = jnp.broadcast_to(gp[:, comp][:, None],
                                 (2, nq) + gp.shape[-2:])
            b = asm.linear_form(f, 2)
            out.append(solve_stencil(self.M, b, opts=rd_opts))
        return out[0], out[1]

    # ------------------------------------------------------------------

    def ic(self) -> tuple[np.ndarray, np.ndarray]:
        """Seeded-random IC with u0 = v0 (helpers.py:1213-1248)."""
        n = self.grid.n
        np.random.seed(5)
        u0 = 1.5 + 0.1 * (0.5 - np.random.rand(n, n))
        return u0, u0.copy()

    # ------------------------------------------------------------------

    def _rd_matrix(self, dt):
        """M + dt (Df K + δ M) — the implicit v/q matrix (helpers.py:1308)."""
        p = self.params
        return self.M * (1.0 + dt * p.delta) + (dt * p.Df) * self.K

    # Reaction hooks for the Mimura/feathers variant (models/mimura.py);
    # the base Keller-Segel system has no reaction in the u equation.
    def _reaction_rhs(self, u_q):
        """Explicit (IMEX) reaction source for the u equation, at quadrature
        points; None for the base model."""
        return None

    def _reaction_nonflux_adj(self, u_q):
        """Reaction linearization entering the adjoint p equation's non-flux
        matrix; None for the base model."""
        return None

    def _forward_step(self, dt):
        if (
            self.backend == "pallas_fused"
            and type(self)._reaction_rhs is ChemotaxisModel._reaction_rhs
        ):
            return self._forward_step_fused(dt)
        p = self.params
        asm = self.asm
        rd_opts = dataclasses.replace(self.solver_opts, symmetric=True)

        def step(carry, c_i):
            u_n, v_n = carry
            Mat2 = self._rd_matrix(dt)
            # v-solve (helpers.py:1339-1342)
            cu_q = asm.nodal_at_quad(c_i, 3) * asm.nodal_at_quad(u_n, 3)
            rhs2 = st.apply(self.M, v_n) + dt * asm.linear_form(
                cu_q / self.rescaling, 3
            )
            if self.backend == "pallas":
                from fem_fct_pdeco_tpu.ops import pallas_kernels as pk

                v_np1 = pk.cg_pallas(Mat2, rhs2, x0=v_n, tol=self.solver_opts.tol)
            else:
                v_np1 = solve_stencil(
                    Mat2, rhs2, x0=v_n, opts=rd_opts,
                    prec=self._spectral_prec(dt, p.Df, 1.0 + dt * p.delta))
            # u-solve via FCT (helpers.py:1350-1356); the transport assembly
            # honors quad_degree (fast path), the reaction keeps degree 4
            # (polynomial — the parity rule integrates it exactly)
            qd = self.quad_degree
            Aa = asm.advective(asm.elem_grad(v_np1),
                               jnp.exp(-p.eta * asm.nodal_at_quad(u_n, qd)),
                               degree=qd)
            A_u = p.Dm * self.K - p.chi * Aa
            u_q = asm.nodal_at_quad(u_n, 4)
            reaction = self._reaction_rhs(u_q)
            rhs_u = (
                jnp.zeros_like(u_n) if reaction is None
                else asm.linear_form(reaction, 4)
            )
            u_np1 = fct_step(
                A_u, rhs_u, u_n, dt, self.M, self.M_diag,
                self.ML_diag, solver=self.solver_opts, debug=self.debug, backend=self.backend,
                node_mask=self.node_mask,
                prec=self._spectral_prec(dt, p.Dm),
            )
            return (u_np1, v_np1)

        return step

    def _forward_step_fused(self, dt):
        """Whole-step Pallas path: each half-step is ONE VMEM-resident kernel
        (ops/pallas_fused.py)."""
        from fem_fct_pdeco_tpu.ops.pallas_fused import (
            fused_chemotaxis_u_step, fused_chemotaxis_v_step)

        p = self.params
        h = self.grid.h
        tol = self.solver_opts.tol

        def step(carry, c_i):
            u_n, v_n = carry
            Mat2 = self._rd_matrix(dt)
            v_np1 = fused_chemotaxis_v_step(
                c_i, u_n, v_n, Mat2, self.M, h=h, dt=dt,
                rescaling=self.rescaling, tol=tol,
            )
            u_np1 = fused_chemotaxis_u_step(
                u_n, v_np1, self.K, self.M, self.M_diag, self.ML_diag,
                jnp.zeros_like(u_n), h=h, dt=dt, Dm=p.Dm, chi=p.chi,
                eta=p.eta, tol=tol,
            )
            return (u_np1, v_np1)

        return step

    def forward(self, control_traj, u0, v0, dt):
        """Forward sweep. control_traj: (num_steps+1, n, n); step i uses
        control_traj[i] (helpers.py:1327-1333). Returns (u_traj, v_traj)."""
        fn = self._jitted(("fwd", float(dt)), lambda: self._make_forward(dt))
        return self._call_sweep(fn, control_traj, u0, v0)

    # Reaction variant implemented inside the whole-sweep kernels; subclasses
    # with custom reactions set this (MimuraModel: "mimura") — a subclass
    # overriding _reaction_rhs WITHOUT a fused implementation keeps the
    # piecewise path.
    _fused_reaction: str | None = None

    def _uses_fused_sweep(self):
        if self.backend != "pallas_fused":
            return False
        base = (
            type(self)._reaction_rhs is ChemotaxisModel._reaction_rhs
            and type(self)._reaction_nonflux_adj is ChemotaxisModel._reaction_nonflux_adj
        )
        return base or self._fused_reaction is not None

    # Chemotaxis stationary operators are pure M/K combinations, so the
    # large-grid synth kernels (in-kernel synthesized stationary stencils,
    # pallas_fused.py) cover this family.
    _synth_capable = True

    # chemotaxis-family lean kernels exist (ONE 7-plane buffer + HBM-parked
    # raw A, pallas_fused.py) for grids past the synth budget; routing and
    # the force_synth/force_lean test hooks live on ModelBase
    _lean_capable = True

    # ... and the banded XL forward kernel for grids past the lean tier's
    # calibrated VMEM cap (>= 1024^2 f32; adjoint falls back to XLA there)
    _xl_capable = True

    # ... and the HBM-streamed XXL forward kernel for grids past the XL
    # slot file's VMEM cap (>= 2048^2 f32, plain Keller-Segel only;
    # ops/pallas_xxl.py). Adjoint sweeps fall back to XLA at this scale.
    _xxl_capable = True

    def _xxl_blocked(self):
        # the streamed kernels don't carry the IMEX reaction hooks
        return self._fused_reaction is not None

    # experimental Mosaic-layout lever: resident fused forward assembly on
    # rolled full planes (pallas_fused._assemble_forward_A_aligned). Set
    # BEFORE the first forward() — the jitted sweep is cached per dt.
    lane_aligned = False

    # Krylov preconditioner for the DIST (RDMA) sweeps: "dct" (default,
    # distributed spectral inverse) or "jacobi" (no replicated DCT plane /
    # transpose buffers — smaller per-device VMEM, more iterations). Set
    # BEFORE the first dist sweep (cached per dt).
    dist_precond = "dct"

    def _uses_dist_sweep(self):
        if self.backend != "pallas_dist":
            return False
        base = (
            type(self)._reaction_rhs is ChemotaxisModel._reaction_rhs
            and type(self)._reaction_nonflux_adj
            is ChemotaxisModel._reaction_nonflux_adj
        )
        return base or self._fused_reaction is not None

    def _make_forward(self, dt):
        if self._uses_dist_sweep():
            from fem_fct_pdeco_tpu.ops.pallas_dist import (
                dist_chemotaxis_forward_sweep)

            p = self.params

            def run_dist(control_traj, u0, v0):
                Mat2 = self._rd_matrix(dt)
                *res, stats = dist_chemotaxis_forward_sweep(
                    control_traj, u0, v0, self.K, self.M, self.M_diag,
                    self.ML_diag, Mat2, self.mesh, h=self.grid.h, dt=dt,
                    Dm=p.Dm, chi=p.chi, eta=p.eta, rescaling=self.rescaling,
                    tol=self.solver_opts.tol,
                    iters=self.solver_opts.maxiter,
                    reaction=self._fused_reaction, Df=p.Df, delta=p.delta,
                    precond=self.dist_precond, with_stats=True)
                return tuple(res), stats

            return run_dist
        if self._uses_fused_sweep():
            p = self.params
            if self._use_synth_sweep():
                if self._use_xxl_sweep():
                    from fem_fct_pdeco_tpu.ops.pallas_xxl import (
                        fused_chemotaxis_forward_sweep_xxl)
                    sweep_fn = fused_chemotaxis_forward_sweep_xxl
                elif self._use_xl_sweep():
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_forward_sweep_xl)
                    sweep_fn = fused_chemotaxis_forward_sweep_xl
                elif self._use_lean_sweep():
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_forward_sweep_lean)
                    sweep_fn = fused_chemotaxis_forward_sweep_lean
                else:
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_forward_sweep_synth)
                    sweep_fn = fused_chemotaxis_forward_sweep_synth

                def run_synth(control_traj, u0, v0):
                    *res, stats = sweep_fn(
                        control_traj, u0, v0, h=self.grid.h, dt=dt, Dm=p.Dm,
                        Df=p.Df, delta=p.delta, chi=p.chi, eta=p.eta,
                        rescaling=self.rescaling, tol=self.solver_opts.tol,
                        reaction=self._fused_reaction,
                        quad_degree=self.quad_degree, with_stats=True,
                    )
                    return tuple(res), stats

                return run_synth
            from fem_fct_pdeco_tpu.ops.pallas_fused import (
                fused_chemotaxis_forward_sweep)

            def run_fused(control_traj, u0, v0):
                Mat2 = self._rd_matrix(dt)
                *res, stats = fused_chemotaxis_forward_sweep(
                    control_traj, u0, v0, self.K, self.M, self.M_diag,
                    self.ML_diag, Mat2, h=self.grid.h, dt=dt, Dm=p.Dm,
                    chi=p.chi, eta=p.eta, rescaling=self.rescaling,
                    tol=self.solver_opts.tol, reaction=self._fused_reaction,
                    Df=p.Df, delta=p.delta, quad_degree=self.quad_degree,
                    lane_aligned=self.lane_aligned, with_stats=True,
                )
                return tuple(res), stats

            return run_fused
        step = self._forward_step(dt)

        def run(control_traj, u0, v0):
            return forward_sweep_stats(step, (u0, v0), control_traj[1:])

        return run

    def forward_batched(self, control_trajs, u0s, v0s, dt):
        """vmapped forward over a leading batch of independent problems —
        production serving of many simultaneous PDECO instances on one chip
        (new capability; the reference runs one scenario per process)."""
        fn = self._jitted(
            ("fwd_batched", float(dt)), lambda: jax.vmap(self._make_forward(dt))
        )
        return self._call_sweep(fn, control_trajs, u0s, v0s)

    # ------------------------------------------------------------------

    def _adjoint_step(self, dt, optim: str):
        from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

        if (
            self.backend == "pallas_fused"
            and type(self)._reaction_nonflux_adj is ChemotaxisModel._reaction_nonflux_adj
            # the per-step fused kernels are the RESIDENT tier: grids past
            # fits_vmem (and in particular the XL/XXL-sized ones, whose
            # whole-sweep adjoints don't fit either) run the XLA step path
            and fits_vmem(self.grid.n, self.dtype)
        ):
            return self._adjoint_step_fused(dt, optim)
        p = self.params
        asm = self.asm
        rd_opts = dataclasses.replace(self.solver_opts, symmetric=True)

        def step(carry, x):
            p_np1, q_np1 = carry
            Mat_q = self._rd_matrix(dt)
            u_n, v_n, c_n, mis_u, mis_v = x
            u_q = asm.nodal_at_quad(u_n, 4)
            expu = jnp.exp(-p.eta * u_q)
            # p-solve via FCT (helpers.py:1499-1510); the form differentiates
            # the trial function, hence the transpose of the advective stencil
            Aa = st.transpose(asm.advective(asm.elem_grad(v_n), (1.0 - p.eta * u_q) * expu, degree=5))
            Mat_p = p.Dm * self.K - p.chi * Aa
            rhs_p = asm.linear_form(
                asm.nodal_at_quad(c_n, 3) * asm.nodal_at_quad(q_np1, 3) / self.rescaling, 3
            )
            if optim == "alltime":
                # raw nodal misfit added to the assembled load, exactly as the
                # reference does (helpers.py:1506-1507)
                rhs_p = rhs_p + mis_u
            nf = self._reaction_nonflux_adj(u_q)
            p_n = fct_step(
                Mat_p, rhs_p, p_np1, dt, self.M, self.M_diag, self.ML_diag,
                non_flux=nf, solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                prec=self._spectral_prec(dt, p.Dm),
            )
            # q-solve (helpers.py:1531-1538); gradient_smoothing swaps the
            # raw per-element grad(p) for its CG1 L2 projection
            # (helpers.py:1520-1528)
            if self.gradient_smoothing:
                gx, gy = self.smooth_gradient(p_n)
                Gq = jnp.stack(
                    [asm.nodal_at_quad(gx, 4), asm.nodal_at_quad(gy, 4)],
                    axis=2)
                rhs_q = asm.advective_form(
                    Gq, p.chi * asm.nodal_at_quad(u_n, 4) * expu, degree=4
                )
            else:
                rhs_q = asm.advective_form(
                    asm.elem_grad(p_n), p.chi * asm.nodal_at_quad(u_n, 4) * expu, degree=4
                )
            if optim == "alltime":
                rhs_q = rhs_q + mis_v
            q_n = solve_stencil(
                Mat_q, st.apply(self.M, q_np1) + dt * rhs_q, x0=q_np1, opts=rd_opts,
                prec=self._spectral_prec(dt, p.Df, 1.0 + dt * p.delta),
            )
            return (p_n, q_n)

        return step

    def _adjoint_step_fused(self, dt, optim: str):
        """Whole-step Pallas adjoint (ops/pallas_fused.py): p FCT with the
        transposed chemotaxis matrix, then q implicit CG."""
        from fem_fct_pdeco_tpu.ops.pallas_fused import (
            fused_chemotaxis_p_step, fused_chemotaxis_q_step)

        p = self.params
        h = self.grid.h
        tol = self.solver_opts.tol

        def step(carry, x):
            p_np1, q_np1 = carry
            u_n, v_n, c_n, mis_u, mis_v = x
            Mat_q = self._rd_matrix(dt)
            p_n = fused_chemotaxis_p_step(
                p_np1, q_np1, u_n, v_n, c_n, mis_u, self.K, self.M,
                self.M_diag, self.ML_diag, h=h, dt=dt, Dm=p.Dm, chi=p.chi,
                eta=p.eta, rescaling=self.rescaling, tol=tol,
            )
            q_n = fused_chemotaxis_q_step(
                q_np1, p_n, u_n, mis_v, Mat_q, self.M, h=h, dt=dt,
                chi=p.chi, eta=p.eta, tol=tol,
            )
            return (p_n, q_n)

        return step

    def adjoint(self, u_traj, v_traj, uhat, vhat, control_traj, dt, optim="finaltime"):
        """Adjoint sweep (helpers.py:1387-1581).

        finaltime: uhat/vhat are (n, n) final-time targets; terminal
        conditions p(T) = û_T - u(T), q(T) = v̂_T - v(T).
        alltime: uhat/vhat are (num_steps+1, n, n); p(T) = q(T) = 0 and the
        misfits enter the right-hand sides.
        Returns (p_traj, q_traj).
        """
        fn = self._jitted(("adj", float(dt), optim), lambda: self._make_adjoint(dt, optim))
        return self._call_sweep(fn, u_traj, v_traj, uhat, vhat, control_traj)

    def _make_adjoint(self, dt, optim):
        if self._uses_dist_sweep():
            from fem_fct_pdeco_tpu.ops.pallas_dist import (
                dist_chemotaxis_adjoint_sweep)

            p = self.params

            def run_dist(u_traj, v_traj, uhat, vhat, control_traj):
                Mat2 = self._rd_matrix(dt)
                if optim == "finaltime":
                    pT = uhat - u_traj[-1]
                    qT = vhat - v_traj[-1]
                    mis_u = mis_v = None
                else:
                    pT = jnp.zeros_like(u_traj[-1])
                    qT = jnp.zeros_like(pT)
                    mis_u = uhat[:-1] - u_traj[:-1]
                    mis_v = vhat[:-1] - v_traj[:-1]
                    if self.consistent_alltime_misfit:
                        mis_u = jax.vmap(lambda m: st.apply(self.M, m))(mis_u)
                        mis_v = jax.vmap(lambda m: st.apply(self.M, m))(mis_v)
                *res, stats = dist_chemotaxis_adjoint_sweep(
                    u_traj, v_traj, control_traj, pT, qT, self.K, self.M,
                    self.M_diag, self.ML_diag, Mat2, self.mesh, mis_u,
                    mis_v, h=self.grid.h, dt=dt, Dm=p.Dm, chi=p.chi,
                    eta=p.eta, rescaling=self.rescaling,
                    tol=self.solver_opts.tol,
                    iters=self.solver_opts.maxiter,
                    reaction=self._fused_reaction, Df=p.Df, delta=p.delta,
                    precond=self.dist_precond, with_stats=True)
                return tuple(res), stats

            return run_dist
        # the streamed (XXL) tier is forward-only: its adjoint runs the
        # XLA step path below (the fused adjoint tiers all exceed VMEM at
        # XXL grid sizes). The XL ADJOINT's own hardware-measured VMEM
        # requirement (fits_vmem_xl_adjoint: 138 MB at 1024² f32, OOM on
        # v5e) is ~4 planes past the forward's, so XL-sized grids keep the
        # fused forward but run the XLA adjoint too.
        use_fused_adj = self._uses_fused_sweep() and not self._use_xxl_sweep()
        if use_fused_adj and self._use_xl_sweep() and not self.force_xl:
            from fem_fct_pdeco_tpu.ops.pallas_kernels import (
                fits_vmem_xl_adjoint)

            if not fits_vmem_xl_adjoint(self.grid.n, self.dtype):
                use_fused_adj = False
        if use_fused_adj:
            p = self.params

            def _terminal(u_traj, v_traj, uhat, vhat):
                if optim == "finaltime":
                    return uhat - u_traj[-1], vhat - v_traj[-1], None, None
                pT = jnp.zeros_like(u_traj[-1])
                mis_u = uhat[:-1] - u_traj[:-1]
                mis_v = vhat[:-1] - v_traj[:-1]
                if self.consistent_alltime_misfit:
                    mis_u = jax.vmap(lambda m: st.apply(self.M, m))(mis_u)
                    mis_v = jax.vmap(lambda m: st.apply(self.M, m))(mis_v)
                return pT, jnp.zeros_like(pT), mis_u, mis_v

            if self._use_synth_sweep():
                if self._use_xl_sweep():
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_adjoint_sweep_xl)
                    sweep_fn = fused_chemotaxis_adjoint_sweep_xl
                elif self._use_lean_sweep():
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_adjoint_sweep_lean)
                    sweep_fn = fused_chemotaxis_adjoint_sweep_lean
                else:
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_chemotaxis_adjoint_sweep_synth)
                    sweep_fn = fused_chemotaxis_adjoint_sweep_synth

                def run_synth(u_traj, v_traj, uhat, vhat, control_traj):
                    pT, qT, mis_u, mis_v = _terminal(u_traj, v_traj, uhat, vhat)
                    *res, stats = sweep_fn(
                        u_traj, v_traj, control_traj, pT, qT, mis_u, mis_v,
                        h=self.grid.h, dt=dt, Dm=p.Dm, Df=p.Df, delta=p.delta,
                        chi=p.chi, eta=p.eta, rescaling=self.rescaling,
                        tol=self.solver_opts.tol, reaction=self._fused_reaction,
                        with_stats=True,
                    )
                    return tuple(res), stats

                return run_synth
            from fem_fct_pdeco_tpu.ops.pallas_fused import (
                fused_chemotaxis_adjoint_sweep)

            def run_fused(u_traj, v_traj, uhat, vhat, control_traj):
                Mat2 = self._rd_matrix(dt)
                pT, qT, mis_u, mis_v = _terminal(u_traj, v_traj, uhat, vhat)
                *res, stats = fused_chemotaxis_adjoint_sweep(
                    u_traj, v_traj, control_traj, pT, qT, self.K, self.M,
                    self.M_diag, self.ML_diag, Mat2, mis_u, mis_v,
                    h=self.grid.h, dt=dt, Dm=p.Dm, chi=p.chi, eta=p.eta,
                    rescaling=self.rescaling, tol=self.solver_opts.tol,
                    reaction=self._fused_reaction, Df=p.Df, delta=p.delta,
                    with_stats=True,
                )
                return tuple(res), stats

            return run_fused
        step = self._adjoint_step(dt, optim)

        def run(u_traj, v_traj, uhat, vhat, control_traj):
            if optim == "finaltime":
                pT = uhat - u_traj[-1]
                qT = vhat - v_traj[-1]
                ns = u_traj.shape[0] - 1
                zero = jnp.zeros_like(u_traj[:-1])
                xs = (u_traj[:-1], v_traj[:-1], control_traj[:-1], zero, zero)
            else:
                pT = jnp.zeros_like(u_traj[-1])
                qT = jnp.zeros_like(pT)
                mis_u = uhat[:-1] - u_traj[:-1]
                mis_v = vhat[:-1] - v_traj[:-1]
                if self.consistent_alltime_misfit:
                    mis_u = jax.vmap(lambda m: st.apply(self.M, m))(mis_u)
                    mis_v = jax.vmap(lambda m: st.apply(self.M, m))(mis_v)
                xs = (u_traj[:-1], v_traj[:-1], control_traj[:-1], mis_u, mis_v)
            return adjoint_sweep_stats(step, (pT, qT), xs)

        return run

    # ------------------------------------------------------------------
    # Segmented checkpoint/recompute adjoint — the long-trajectory mechanism
    # (SURVEY §5): when (num_steps+1)·n² trajectories exceed HBM, store only
    # segment-boundary states during the forward pass and recompute each
    # segment's states on the fly during the backward sweep. Memory scales
    # with num_steps/num_segments instead of num_steps.
    # ------------------------------------------------------------------

    def adjoint_checkpointed(self, control_traj, u0, v0, uhat, vhat, dt,
                             optim="finaltime", num_segments: int = 8):
        """Adjoint sweep without a stored forward trajectory.

        Returns (p_traj, q_traj) identical (to solver tolerance) to
        ``adjoint(forward(...))``. ``num_steps`` must be divisible by
        ``num_segments``.
        """
        key = ("adjck", float(dt), optim, num_segments)

        def build():
            from fem_fct_pdeco_tpu.timeloop import checkpointed_adjoint

            fwd_step = self._forward_step(dt)
            adj_step = self._adjoint_step(dt, optim)

            def run(control_traj, u0, v0, uhat, vhat):
                def terminal(final):
                    uT, vT = final
                    if optim == "finaltime":
                        return uhat - uT, vhat - vT
                    return jnp.zeros_like(uT), jnp.zeros_like(vT)

                def adj_xs(seg_traj, s, seg):
                    u_seg, v_seg = seg_traj
                    cseg = jax.lax.dynamic_slice_in_dim(
                        control_traj, s * seg, seg, axis=0)
                    if optim == "finaltime":
                        zero = jnp.zeros_like(u_seg[:-1])
                        return (u_seg[:-1], v_seg[:-1], cseg, zero, zero)
                    uh = jax.lax.dynamic_slice_in_dim(uhat, s * seg, seg, axis=0)
                    vh = jax.lax.dynamic_slice_in_dim(vhat, s * seg, seg, axis=0)
                    mis_u = uh - u_seg[:-1]
                    mis_v = vh - v_seg[:-1]
                    if self.consistent_alltime_misfit:
                        mis_u = jax.vmap(lambda m: st.apply(self.M, m))(mis_u)
                        mis_v = jax.vmap(lambda m: st.apply(self.M, m))(mis_v)
                    return (u_seg[:-1], v_seg[:-1], cseg, mis_u, mis_v)

                return checkpointed_adjoint(
                    fwd_step, adj_step, (u0, v0), control_traj[1:],
                    terminal, adj_xs, num_segments,
                )

            return run

        return self._call_sweep(self._jitted(key, build),
                                control_traj, u0, v0, uhat, vhat)

    def descent_direction(self, beta, c_traj, u_traj, q_traj):
        """dk = -(β c - q u / r) (chemotaxis_FCT_PDECO_refactored.py:187)."""
        return -(beta * c_traj - q_traj * u_traj / self.rescaling)
