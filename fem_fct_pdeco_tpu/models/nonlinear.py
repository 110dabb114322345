"""Nonlinear reaction-advection-diffusion equation with source control.

State (reference helpers.py:881-966):
    du/dt + ∇·(-ε ∇u + w u) - u + (1/3) u³ = c
    IMEX linearization: per step non-flux matrix -M + (1/3) M_{u_n²}
Adjoint (helpers.py:968-1038):
    dp/dt + ∇·(-ε ∇p + w p) + u² p - p = 0, p(T) = û_T - u(T)
    per step non-flux matrix M_{u_n²} - M; note the reference uses the SAME
    (untransposed) convection matrix with flipped sign.
Gradient equation: β c - p = 0 (nonlinear_FCT_PDECO_refactored.py:148).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.base import ModelBase
from fem_fct_pdeco_tpu.models.advection import vortex_wind
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.timeloop import (adjoint_sweep_stats,
                                        forward_sweep_stats)


class NonlinearModel(ModelBase):
    """Parameters from helpers.py:867-879: eps = 1e-4, vortex wind, speed 1."""

    _HOISTED_OPS = ModelBase._HOISTED_OPS + ("N", "A_state", "A_adjoint")

    # scalar fused sweep auto-dispatches to its lean variant past the
    # resident VMEM budget (see AdvectionModel)
    _synth_capable = True
    _lean_capable = True
    # the scalar sweep also auto-dispatches to its banded XL variant past
    # the lean tier's calibrated VMEM cap (>= ~672^2 f32)
    _xl_capable = True

    def __init__(self, grid, eps: float = 1e-4, speed: float = 1.0,
                 dtype=jnp.float64, solver_opts: SolverOpts | None = None,
                 backend: str = "xla", pad_to: int | None = None,
                 mesh=None, debug: bool = False):
        super().__init__(grid, dtype, solver_opts, backend, pad_to, mesh,
                         debug=debug)
        self.eps = eps
        self.N = self.asm.convection(vortex_wind(speed))
        # ref-convention flux matrices:
        # state: FCT_alg_ref(-(A_adv - eps Ad)) -> A = eps K - N (helpers.py:957)
        # adjoint: FCT_alg_ref(-(-A_adv - eps Ad)) -> A = eps K + N (helpers.py:1036)
        self.A_state = eps * self.K - self.N
        self.A_adjoint = eps * self.K + self.N

    def ic(self) -> np.ndarray:
        """u0 = 5 Y (Y-1) X (X-1) sin(4 π X) (helpers.py:835-865)."""
        X, Y = self.grid.xy
        return 5.0 * Y * (Y - 1.0) * X * (X - 1.0) * np.sin(4.0 * X * np.pi)

    def true_control(self, k1: int = 2, k2: int = 2) -> np.ndarray:
        """sin(k1 π x) sin(k2 π y) nodal interpolant (helpers.py:1988-1995)."""
        X, Y = self.grid.xy
        return np.sin(k1 * np.pi * X) * np.sin(k2 * np.pi * Y)

    def _nonflux(self, u_n, sign: float):
        """sign=+1: state  -M + (1/3) M_{u²};  sign=-1: adjoint M_{u²} - M."""
        Mu2 = self.asm.weighted_mass(self.asm.nodal_at_quad(u_n, 4) ** 2, degree=4)
        if sign > 0:
            return (1.0 / 3.0) * Mu2 - self.M
        return Mu2 - self.M

    def _forward_step(self, dt):
        def step(u_n, c_i):
            rhs = st.apply(self.M, c_i)
            return fct_step(
                self.A_state, rhs, u_n, dt, self.M, self.M_diag,
                self.ML_diag, non_flux=self._nonflux(u_n, +1.0),
                solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                prec=self._spectral_prec(dt, self.eps),
            )

        return step

    def _adjoint_step(self, dt):
        def step(p_np1, x):
            u_n, mis = x
            return fct_step(
                self.A_adjoint, mis, p_np1, dt, self.M, self.M_diag,
                self.ML_diag, non_flux=self._nonflux(u_n, -1.0),
                solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                prec=self._spectral_prec(dt, self.eps),
            )

        return step

    def forward(self, control_traj, u0, dt):
        """State sweep; step i uses control_traj[i] (helpers.py:941-958).
        Returns (u_traj,)."""

        def build():
            if self.backend == "pallas_dist":
                from fem_fct_pdeco_tpu.ops.pallas_dist import (
                    dist_scalar_fct_sweep)

                def run_dist(c, u0):
                    frames, stats = dist_scalar_fct_sweep(
                        c[1:, None], u0, self.A_state, self.M, self.M_diag,
                        self.ML_diag, self.mesh, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, nonflux_mode=+1,
                        load_is_mass=True, iters=self.solver_opts.maxiter,
                        with_stats=True,
                    )
                    return ((jnp.concatenate([u0[None], frames], axis=0),),
                            stats)

                return run_dist
            if self.backend == "pallas_fused":
                from fem_fct_pdeco_tpu.ops.pallas_fused import fused_scalar_fct_sweep

                def run_fused(c, u0):
                    frames, stats = fused_scalar_fct_sweep(
                        c[1:, None], u0, self.A_state, self.M, self.M_diag,
                        self.ML_diag, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, nonflux_mode=+1,
                        load_is_mass=True, iters=self.solver_opts.maxiter,
                        with_stats=True,
                    )
                    return ((jnp.concatenate([u0[None], frames], axis=0),),
                            stats)

                return run_fused

            step = self._forward_step(dt)

            def run(c, u0):
                traj, stats = forward_sweep_stats(step, u0, c[1:])
                return (traj,), stats

            return run

        return self._call_sweep(self._jitted(("fwd", float(dt)), build),
                                control_traj, u0)

    def adjoint(self, u_traj, uhat, dt, optim="finaltime"):
        """Adjoint sweep (helpers.py:1023-1037); alltime variant adds the
        misfit load M(û - u) (nonlinear_FCT_PDECO_alltime.py pattern)."""

        def build():
            def terminal(u_traj, uhat):
                if optim == "finaltime":
                    pT = uhat - u_traj[-1]
                    mis = jnp.zeros_like(u_traj[:-1])
                else:
                    pT = jnp.zeros_like(u_traj[-1])
                    import jax

                    mis = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                        uhat[:-1], u_traj[:-1]
                    )
                return pT, mis

            if self.backend == "pallas_dist":
                from fem_fct_pdeco_tpu.ops.pallas_dist import (
                    dist_scalar_fct_sweep)

                def run_dist(u_traj, uhat):
                    pT, mis = terminal(u_traj, uhat)
                    loads = jnp.stack([mis, u_traj[:-1]], axis=1)
                    frames, stats = dist_scalar_fct_sweep(
                        loads, pT, self.A_adjoint, self.M, self.M_diag,
                        self.ML_diag, self.mesh, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, nonflux_mode=-1,
                        load_is_mass=False, reverse=True,
                        iters=self.solver_opts.maxiter, with_stats=True,
                    )
                    return ((jnp.concatenate([frames, pT[None]], axis=0),),
                            stats)

                return run_dist
            if self.backend == "pallas_fused":
                from fem_fct_pdeco_tpu.ops.pallas_fused import fused_scalar_fct_sweep

                def run_fused(u_traj, uhat):
                    pT, mis = terminal(u_traj, uhat)
                    loads = jnp.stack([mis, u_traj[:-1]], axis=1)
                    frames, stats = fused_scalar_fct_sweep(
                        loads, pT, self.A_adjoint, self.M, self.M_diag,
                        self.ML_diag, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, nonflux_mode=-1,
                        load_is_mass=False, reverse=True,
                        iters=self.solver_opts.maxiter, with_stats=True,
                    )
                    return ((jnp.concatenate([frames, pT[None]], axis=0),),
                            stats)

                return run_fused

            step = self._adjoint_step(dt)

            def run(u_traj, uhat):
                pT, mis = terminal(u_traj, uhat)
                traj, stats = adjoint_sweep_stats(step, pT, (u_traj[:-1], mis))
                return (traj,), stats

            return run

        return self._call_sweep(
            self._jitted(("adj", float(dt), optim), build), u_traj, uhat)

    def adjoint_checkpointed(self, control_traj, u0, uhat, dt,
                             optim="finaltime", num_segments: int = 8):
        """Segmented checkpoint/recompute adjoint without a stored forward
        trajectory (timeloop.checkpointed_adjoint; SURVEY §5 long-trajectory
        mechanism). Returns (p_traj,) matching adjoint(forward(...))."""
        key = ("adjck", float(dt), optim, num_segments)

        def build():
            import jax

            from fem_fct_pdeco_tpu.timeloop import checkpointed_adjoint

            fwd_step = self._forward_step(dt)
            adj_step = self._adjoint_step(dt)

            def run(control_traj, u0, uhat):
                def terminal(uT):
                    if optim == "finaltime":
                        return uhat - uT
                    return jnp.zeros_like(uT)

                def adj_xs(u_seg, s, seg):
                    if optim == "finaltime":
                        mis = jnp.zeros_like(u_seg[:-1])
                    else:
                        uh = jax.lax.dynamic_slice_in_dim(uhat, s * seg, seg, 0)
                        mis = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                            uh, u_seg[:-1])
                    return (u_seg[:-1], mis)

                traj, stats = checkpointed_adjoint(
                    fwd_step, adj_step, u0, control_traj[1:], terminal,
                    adj_xs, num_segments,
                )
                return (traj,), stats

            return run

        return self._call_sweep(self._jitted(key, build),
                                control_traj, u0, uhat)

    def descent_direction(self, beta, c_traj, p_traj):
        """dk = -(β c - p) (nonlinear_FCT_PDECO_refactored.py:148)."""
        return -(beta * c_traj - p_traj)
