"""Advective Schnakenberg (pattern-formation) system with source control.

State system (reference helpers.py:485-597):
    du/dt + ∇·(-Du ∇u + ω₁ w u) + γ(u - u²v) = γ c / r      (FCT)
    dv/dt + ∇·(-Dv ∇v + ω₂ w u) + γ(u²v - b) = 0            (implicit)
Adjoint (helpers.py:599-698), final-time conditions p(T)=û_T-u(T),
q(T)=v̂_T-v(T):
    -dp/dt + ∇·(-Du ∇p - ω₁ w p) + γp + 2γuv(q-p) = 0        (FCT)
    -dq/dt + ∇·(-Dv ∇q - ω₂ w q) + γu²(q-p) = 0              (implicit)
Gradient equation: β c - (γ/r) p = 0
(Schnak_FCT_PDECO_refactored.py:166-167).

The reference re-assembles the (stationary) vortex wind matrix every time
step (helpers.py:581); here it is assembled once.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.base import ModelBase, _warn_backend_fallback
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil
from fem_fct_pdeco_tpu.timeloop import (adjoint_sweep_stats,
                                        forward_sweep_stats)


@dataclasses.dataclass(frozen=True)
class SchnakenbergParams:
    """Garzon-Alvarado et al (2011) constants (helpers.py:485-509)."""

    Du: float = 1.0 / 100.0
    Dv: float = 8.6676
    c_a: float = 0.1      # constant "a" — the true control
    c_b: float = 0.9
    gamma: float = 230.82
    omega1: float = 100.0
    omega2: float = 0.6


def schnak_wind(x, y):
    """Stationary vortex wind (helpers.py:506-508)."""
    return ((y - 0.5) * x * (1.0 - x), -(x - 0.5) * y * (1.0 - y))


class SchnakenbergModel(ModelBase):
    _HOISTED_OPS = ModelBase._HOISTED_OPS + (
        "N", "A_u", "B_v", "A_u_adj", "B_v_adj")

    # stationary-wind Schnakenberg has large-grid synth kernels (M/K from
    # iota masks + in-kernel wind assembly, pallas_fused.py) and, past the
    # synth VMEM budget, the lean kernels (HBM-parked raw A)
    _synth_capable = True
    # the td-wind variant has no synth/lean kernels (_synth_blocked below),
    # but that case is handled by the dedicated resident-only fallback in
    # __init__ (which runs after the base guard); routing and the
    # force_synth/force_lean test hooks live on ModelBase
    _lean_capable = True

    # banded XL kernels cover the family past the lean tier's calibrated
    # VMEM cap (stationary-wind only, like the synth/lean tiers)
    _xl_capable = True

    def _synth_blocked(self):
        # td kernels carry their own in-kernel assembly
        return self.td_wind_fn is not None

    def __init__(self, grid, params: SchnakenbergParams = SchnakenbergParams(),
                 rescaling: float = 1.0, dtype=jnp.float64,
                 solver_opts: SolverOpts | None = None, td_wind_fn=None, *,
                 backend: str = "xla", pad_to: int | None = None,
                 mesh=None, debug: bool = False):
        """``td_wind_fn(x, y, t) -> (wx, wy)``: optional time-dependent wind
        (Schnak_FCT_PDECO_alltime.py's sin(2πt) vortex); convection is then
        re-assembled each step — inside the scan on the XLA path, or inside
        the whole-sweep fused kernels (fused_schnak_*_sweep_td: in-kernel
        assembly at the traced step time). The fn must be jnp-traceable.
        The pallas_dist backend has no td kernel and warns + falls back."""
        super().__init__(grid, dtype, solver_opts, backend, pad_to, mesh,
                         debug=debug)
        self.params = params
        self.rescaling = rescaling
        self.td_wind_fn = td_wind_fn
        if td_wind_fn is not None and self.backend == "pallas_fused":
            # the td-wind fused kernels are RESIDENT-only (no synth
            # variant), so the base guard's synth allowance does not apply
            from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

            if not fits_vmem(grid.n, self.dtype):
                import warnings

                warnings.warn(
                    f"grid {grid.n}x{grid.n} ({self.dtype}) exceeds the "
                    "single-block VMEM budget of the td-wind fused kernels "
                    "(no synth variant); falling back to backend='xla'",
                    stacklevel=2,
                )
                self.backend = "xla"
        self.N = self.asm.convection(schnak_wind)  # (w·∇v, u)
        # u flux matrix: Du*Ad - ω₁*A (helpers.py:582-583)
        self.A_u = params.Du * self.K - params.omega1 * self.N
        # v implicit base: Dv*Ad - ω₂*A enters M + dt(...) (helpers.py:595)
        self.B_v = params.Dv * self.K - params.omega2 * self.N
        # The adjoint assembles convection with the gradient on the TRIAL
        # function (helpers.py:681: dot(wind, grad(u)) * w * dx) — the
        # transpose of the forward convection matrix.
        Nt = st.transpose(self.N)
        self.A_u_adj = params.Du * self.K - params.omega1 * Nt
        self.B_v_adj = params.Dv * self.K - params.omega2 * Nt

    def ic(self) -> tuple[np.ndarray, np.ndarray]:
        """Cosine-perturbed steady state (helpers.py:443-483)."""
        X, Y = self.grid.xy
        p = self.params
        con = 0.1
        pert = con * np.cos(2 * np.pi * (X + Y)) + 0.01 * sum(
            np.cos(2 * np.pi * X * i) for i in range(1, 9)
        )
        u0 = p.c_a + p.c_b + pert
        v0 = p.c_b / (p.c_a + p.c_b) ** 2 + pert
        return u0, v0

    def _wm(self, g_quad):
        return self.asm.weighted_mass(g_quad, degree=4)

    def _forward_step(self, dt):
        p = self.params

        def step(carry, x):
            c_i, t_i = x
            u_n, v_n = carry
            gM = p.gamma * self.M
            if self.td_wind_fn is None:
                A_u, B_v = self.A_u, self.B_v
            else:
                N = self.asm.convection_td(self.td_wind_fn, t_i)
                A_u = p.Du * self.K - p.omega1 * N
                B_v = p.Dv * self.K - p.omega2 * N
            # u via FCT: rhs = γ(c/r + u_n² v_n), non_flux = γM
            uq = self.asm.nodal_at_quad(u_n, 4)
            vq = self.asm.nodal_at_quad(v_n, 4)
            cq = self.asm.nodal_at_quad(c_i, 4)
            rhs_u = self.asm.linear_form(
                p.gamma / self.rescaling * cq + p.gamma * uq**2 * vq, 4
            )
            u_np1 = fct_step(
                A_u, rhs_u, u_n, dt, self.M, self.M_diag,
                self.ML_diag, non_flux=gM, solver=self.solver_opts, debug=self.debug,
                node_mask=self.node_mask,
                prec=self._spectral_prec(dt, p.Du, 1.0 + dt * p.gamma),
            )
            # v implicit with the *new* u (helpers.py:590-596)
            Mu2 = self._wm(self.asm.nodal_at_quad(u_np1, 4) ** 2)
            Mat_v = self.M + dt * (B_v + p.gamma * Mu2)
            rhs_v = self.asm.linear_form(
                jnp.full_like(self.asm.nodal_at_quad(v_n, 4), p.gamma * p.c_b), 4
            )
            v_np1 = solve_stencil(
                Mat_v, st.apply(self.M, v_n) + dt * rhs_v, x0=v_n,
                opts=self.solver_opts,
                prec=self._spectral_prec(dt, p.Dv, 1.0 + dt * p.gamma),
            )
            return (u_np1, v_np1)

        return step

    def _adjoint_step(self, dt):
        p = self.params

        def step(carry, x):
            p_np1, q_np1 = carry
            gM = p.gamma * self.M
            u_n, v_n, t_n, mis_u, mis_v = x
            if self.td_wind_fn is None:
                A_u_adj, B_v_adj = self.A_u_adj, self.B_v_adj
            else:
                N = self.asm.convection_td(self.td_wind_fn, t_n)
                Nt = st.transpose(N)
                A_u_adj = p.Du * self.K - p.omega1 * Nt
                B_v_adj = p.Dv * self.K - p.omega2 * Nt
            uq = self.asm.nodal_at_quad(u_n, 4)
            vq = self.asm.nodal_at_quad(v_n, 4)
            pq = self.asm.nodal_at_quad(p_np1, 4)
            # q: [M + dt(Dv K - ω₂N + γ M_u²)] q = M q_np1 + dt γ (p_np1 u²)
            Mu2 = self._wm(uq**2)
            rhs_q = self.asm.linear_form(p.gamma * pq * uq**2, 4) + mis_v
            Mat_q = self.M + dt * (B_v_adj + p.gamma * Mu2)
            q_n = solve_stencil(
                Mat_q, st.apply(self.M, q_np1) + dt * rhs_q, x0=q_np1,
                opts=self.solver_opts,
                prec=self._spectral_prec(dt, p.Dv, 1.0 + dt * p.gamma),
            )
            # p via FCT: rhs = -2γ u v q_n, non_flux = γM - 2γ M_uv
            qq = self.asm.nodal_at_quad(q_n, 4)
            rhs_p = self.asm.linear_form(-2.0 * p.gamma * uq * vq * qq, 4) + mis_u
            Muv = self._wm(uq * vq)
            p_n = fct_step(
                A_u_adj, rhs_p, p_np1, dt, self.M, self.M_diag,
                self.ML_diag, non_flux=gM - 2.0 * p.gamma * Muv,
                solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                prec=self._spectral_prec(dt, p.Du, 1.0 + dt * p.gamma),
            )
            return (p_n, q_n)

        return step

    def forward(self, control_traj, u0, v0, dt):
        """Forward sweep (helpers.py:511-597). Step i uses control_traj[i]."""

        def build():
            p = self.params
            if self.backend == "pallas_dist" and self.td_wind_fn is not None:
                _warn_backend_fallback("pallas_dist", "time-dependent wind")
            if self.backend == "pallas_dist" and self.td_wind_fn is None:
                from fem_fct_pdeco_tpu.ops.pallas_dist import (
                    dist_schnak_forward_sweep)

                def run_dist(c, u0, v0):
                    Mbase_v = self.M + dt * self.B_v
                    *res, stats = dist_schnak_forward_sweep(
                        c, u0, v0, self.A_u, self.M, self.M_diag,
                        self.ML_diag, Mbase_v, self.mesh, h=self.grid.h,
                        dt=dt, gamma=p.gamma, c_b=p.c_b,
                        rescaling=self.rescaling, tol=self.solver_opts.tol,
                        iters=self.solver_opts.maxiter, with_stats=True)
                    return tuple(res), stats

                return run_dist
            if self.backend == "pallas_fused":
                if self._use_synth_sweep():
                    from fem_fct_pdeco_tpu.models.schnakenberg import (
                        schnak_wind as _w)
                    if self._use_xl_sweep():
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_forward_sweep_xl)
                        sweep_fn = fused_schnak_forward_sweep_xl
                    elif self._use_lean_sweep():
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_forward_sweep_lean)
                        sweep_fn = fused_schnak_forward_sweep_lean
                    else:
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_forward_sweep_synth)
                        sweep_fn = fused_schnak_forward_sweep_synth

                    def run_synth(c, u0, v0):
                        *res, stats = sweep_fn(
                            c, u0, v0, wind_fn=_w, h=self.grid.h,
                            a1=self.grid.a1, dt=dt, Du=p.Du, Dv=p.Dv,
                            omega1=p.omega1, omega2=p.omega2,
                            gamma=p.gamma, c_b=p.c_b,
                            rescaling=self.rescaling,
                            tol=self.solver_opts.tol, with_stats=True,
                        )
                        return tuple(res), stats

                    return run_synth
                if self.td_wind_fn is not None:
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_schnak_forward_sweep_td)

                    def run_fused_td(c, u0, v0):
                        *res, stats = fused_schnak_forward_sweep_td(
                            c, u0, v0, self.K, self.M, self.M_diag,
                            self.ML_diag, wind_fn=self.td_wind_fn,
                            h=self.grid.h, a1=self.grid.a1, dt=dt, Du=p.Du,
                            Dv=p.Dv, omega1=p.omega1, omega2=p.omega2,
                            gamma=p.gamma, c_b=p.c_b,
                            rescaling=self.rescaling,
                            tol=self.solver_opts.tol, with_stats=True,
                        )
                        return tuple(res), stats

                    return run_fused_td
                from fem_fct_pdeco_tpu.ops.pallas_fused import (
                    fused_schnak_forward_sweep)

                def run_fused(c, u0, v0):
                    Mbase_v = self.M + dt * self.B_v
                    *res, stats = fused_schnak_forward_sweep(
                        c, u0, v0, self.A_u, self.M, self.M_diag,
                        self.ML_diag, Mbase_v, h=self.grid.h, dt=dt,
                        gamma=p.gamma, c_b=p.c_b, rescaling=self.rescaling,
                        tol=self.solver_opts.tol, Du=p.Du, Dv=p.Dv,
                        with_stats=True,
                    )
                    return tuple(res), stats

                return run_fused
            step = self._forward_step(dt)

            def run(c, u0, v0):
                steps = c.shape[0] - 1
                times = (jnp.arange(1, steps + 1, dtype=c.dtype)) * dt
                return forward_sweep_stats(step, (u0, v0), (c[1:], times))

            return run

        return self._call_sweep(self._jitted(("fwd", float(dt)), build),
                                control_traj, u0, v0)

    def adjoint(self, u_traj, v_traj, uhat, vhat, dt, optim="finaltime"):
        """Backward sweep (helpers.py:599-698): q implicit first, then p FCT
        with non_flux = γM - 2γM_{uv}.

        finaltime: uhat/vhat are final-time fields, p(T) = û_T - u(T).
        alltime (Schnak_FCT_PDECO_alltime.py:216-257): uhat/vhat are
        trajectories; p(T) = q(T) = 0 and mass-weighted misfits M(û-u),
        M(v̂-v) are added to the right-hand sides.
        """

        def build():
            p = self.params
            if self.backend == "pallas_dist" and self.td_wind_fn is not None:
                _warn_backend_fallback("pallas_dist", "time-dependent wind")
            if self.backend == "pallas_dist" and self.td_wind_fn is None:
                from fem_fct_pdeco_tpu.ops.pallas_dist import (
                    dist_schnak_adjoint_sweep)

                def run_dist(u_traj, v_traj, uhat, vhat):
                    Mbase_q = self.M + dt * self.B_v_adj
                    if optim == "finaltime":
                        pT = uhat - u_traj[-1]
                        qT = vhat - v_traj[-1]
                        mis_u = mis_v = None
                    else:
                        pT = jnp.zeros_like(u_traj[-1])
                        qT = jnp.zeros_like(pT)
                        mis_u = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                            uhat[:-1], u_traj[:-1])
                        mis_v = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                            vhat[:-1], v_traj[:-1])
                    *res, stats = dist_schnak_adjoint_sweep(
                        u_traj, v_traj, pT, qT, self.A_u_adj, self.M,
                        self.M_diag, self.ML_diag, Mbase_q, self.mesh,
                        mis_u, mis_v, h=self.grid.h, dt=dt, gamma=p.gamma,
                        tol=self.solver_opts.tol,
                        iters=self.solver_opts.maxiter, with_stats=True)
                    return tuple(res), stats

                return run_dist
            use_fused_adj = self.backend == "pallas_fused"
            if use_fused_adj and self._use_xl_sweep() and not self.force_xl:
                # the 12-slot XL ADJOINT file exceeds VMEM where the
                # forward fits (hardware-calibrated on the chemotaxis
                # twin, fits_vmem_xl_adjoint) — run the XLA adjoint there
                from fem_fct_pdeco_tpu.ops.pallas_kernels import (
                    fits_vmem_xl_adjoint)

                if not fits_vmem_xl_adjoint(self.grid.n, self.dtype):
                    use_fused_adj = False
            if use_fused_adj:
                def _terminal(u_traj, v_traj, uhat, vhat):
                    if optim == "finaltime":
                        return (uhat - u_traj[-1], vhat - v_traj[-1],
                                None, None)
                    pT = jnp.zeros_like(u_traj[-1])
                    mis_u = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        uhat[:-1], u_traj[:-1])
                    mis_v = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        vhat[:-1], v_traj[:-1])
                    return pT, jnp.zeros_like(pT), mis_u, mis_v

                if self._use_synth_sweep():
                    from fem_fct_pdeco_tpu.models.schnakenberg import (
                        schnak_wind as _w)
                    if self._use_xl_sweep():
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_adjoint_sweep_xl)
                        sweep_fn = fused_schnak_adjoint_sweep_xl
                    elif self._use_lean_sweep():
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_adjoint_sweep_lean)
                        sweep_fn = fused_schnak_adjoint_sweep_lean
                    else:
                        from fem_fct_pdeco_tpu.ops.pallas_fused import (
                            fused_schnak_adjoint_sweep_synth)
                        sweep_fn = fused_schnak_adjoint_sweep_synth

                    def run_synth(u_traj, v_traj, uhat, vhat):
                        pT, qT, mis_u, mis_v = _terminal(
                            u_traj, v_traj, uhat, vhat)
                        *res, stats = sweep_fn(
                            u_traj, v_traj, pT, qT, mis_u, mis_v,
                            wind_fn=_w, h=self.grid.h, a1=self.grid.a1,
                            dt=dt, Du=p.Du, Dv=p.Dv, omega1=p.omega1,
                            omega2=p.omega2, gamma=p.gamma,
                            tol=self.solver_opts.tol, with_stats=True,
                        )
                        return tuple(res), stats

                    return run_synth
                if self.td_wind_fn is not None:
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_schnak_adjoint_sweep_td)

                    def run_fused_td(u_traj, v_traj, uhat, vhat):
                        pT, qT, mis_u, mis_v = _terminal(
                            u_traj, v_traj, uhat, vhat)
                        *res, stats = fused_schnak_adjoint_sweep_td(
                            u_traj, v_traj, pT, qT, self.K, self.M,
                            self.M_diag, self.ML_diag, mis_u, mis_v,
                            wind_fn=self.td_wind_fn, h=self.grid.h,
                            a1=self.grid.a1, dt=dt, Du=p.Du, Dv=p.Dv,
                            omega1=p.omega1, omega2=p.omega2, gamma=p.gamma,
                            tol=self.solver_opts.tol, with_stats=True,
                        )
                        return tuple(res), stats

                    return run_fused_td
                from fem_fct_pdeco_tpu.ops.pallas_fused import (
                    fused_schnak_adjoint_sweep)

                def run_fused(u_traj, v_traj, uhat, vhat):
                    Mbase_q = self.M + dt * self.B_v_adj
                    pT, qT, mis_u, mis_v = _terminal(u_traj, v_traj, uhat, vhat)
                    *res, stats = fused_schnak_adjoint_sweep(
                        u_traj, v_traj, pT, qT, self.A_u_adj, self.M,
                        self.M_diag, self.ML_diag, Mbase_q, mis_u, mis_v,
                        h=self.grid.h, dt=dt, gamma=p.gamma,
                        tol=self.solver_opts.tol, Du=p.Du, Dv=p.Dv,
                        with_stats=True,
                    )
                    return tuple(res), stats

                return run_fused
            step = self._adjoint_step(dt)

            def run(u_traj, v_traj, uhat, vhat):
                steps = u_traj.shape[0] - 1
                times = jnp.arange(steps, dtype=u_traj.dtype) * dt
                if optim == "finaltime":
                    pT = uhat - u_traj[-1]
                    qT = vhat - v_traj[-1]
                    zero = jnp.zeros_like(u_traj[:-1])
                    xs = (u_traj[:-1], v_traj[:-1], times, zero, zero)
                else:
                    import jax

                    pT = jnp.zeros_like(u_traj[-1])
                    qT = jnp.zeros_like(pT)
                    mis_u = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        uhat[:-1], u_traj[:-1]
                    )
                    mis_v = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        vhat[:-1], v_traj[:-1]
                    )
                    xs = (u_traj[:-1], v_traj[:-1], times, mis_u, mis_v)
                return adjoint_sweep_stats(step, (pT, qT), xs)

            return run

        return self._call_sweep(
            self._jitted(("adj", float(dt), optim), build),
            u_traj, v_traj, uhat, vhat)

    def adjoint_checkpointed(self, control_traj, u0, v0, uhat, vhat, dt,
                             optim="finaltime", num_segments: int = 8):
        """Segmented checkpoint/recompute adjoint without a stored forward
        trajectory (timeloop.checkpointed_adjoint; SURVEY §5 long-trajectory
        mechanism). Returns (p_traj, q_traj) matching adjoint(forward(...))."""
        key = ("adjck", float(dt), optim, num_segments)

        def build():
            from fem_fct_pdeco_tpu.timeloop import checkpointed_adjoint

            fwd_step = self._forward_step(dt)
            adj_step = self._adjoint_step(dt)

            def run(control_traj, u0, v0, uhat, vhat):
                steps = control_traj.shape[0] - 1
                times_fwd = jnp.arange(1, steps + 1, dtype=control_traj.dtype) * dt

                def terminal(final):
                    uT, vT = final
                    if optim == "finaltime":
                        return uhat - uT, vhat - vT
                    return jnp.zeros_like(uT), jnp.zeros_like(vT)

                def adj_xs(seg_traj, s, seg):
                    u_seg, v_seg = seg_traj
                    times = (jnp.arange(seg, dtype=control_traj.dtype) + s * seg) * dt
                    if optim == "finaltime":
                        zero = jnp.zeros_like(u_seg[:-1])
                        return (u_seg[:-1], v_seg[:-1], times, zero, zero)
                    uh = jax.lax.dynamic_slice_in_dim(uhat, s * seg, seg, 0)
                    vh = jax.lax.dynamic_slice_in_dim(vhat, s * seg, seg, 0)
                    mis_u = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        uh, u_seg[:-1])
                    mis_v = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        vh, v_seg[:-1])
                    return (u_seg[:-1], v_seg[:-1], times, mis_u, mis_v)

                return checkpointed_adjoint(
                    fwd_step, adj_step, (u0, v0),
                    (control_traj[1:], times_fwd), terminal, adj_xs,
                    num_segments,
                )

            return run

        return self._call_sweep(self._jitted(key, build),
                                control_traj, u0, v0, uhat, vhat)

    def descent_direction(self, beta, c_traj, p_traj):
        """dk = -(β c - (γ/r) p) (Schnak_FCT_PDECO_refactored.py:166-167)."""
        return -(beta * c_traj - self.params.gamma / self.rescaling * p_traj)
