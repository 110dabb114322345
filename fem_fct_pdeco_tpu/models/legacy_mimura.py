"""Legacy m(4-m) Mimura chemotaxis variant (old_helpers.py:87-111).

The reference's OLDER Mimura–Tsujikawa formulation, used only by the stale
``chemotaxis_mimura_FCT_PGD.py`` driver generation (SURVEY §2.4 row:
"Legacy chemotaxis builders (Mimura m(4-m) variant)"). The builders live in
``old_helpers.py:87-111`` and compose with the legacy-sign FCT algorithm
(``old_helpers.FCT_alg``, convention ``M du/dt = A u + rhs``):

    state    M dm/dt = A_m m + 4 M m_n,
             A_m  = -Dm K + chi Aa(grad f^{n+1}) + M_{m_n}
                                                  (mat_chtx_m, oh:100-104)
             [M + dt (Df K + delta M)] f^{n+1} = M f_n + dt (m_n c, phi)
                                                  (rhs_chtx_f, oh:90-91)
    adjoint  [M + dt (Df K + delta M)] q_n = M q_{n+1}
                 + dt (div(chi m grad p^{n+1}), phi)   (rhs_chtx_q, oh:95-97)
             M dp/dt = A_p p + (c q_n, phi),
             A_p  = -Dm K - chi Aa(grad f_n) - chi Adf + M_{4-2m_n}
                                                  (mat_chtx_p, oh:106-111)

Notes on verbatim semantics:
- The driver header documents the reaction as m(4-m), but the code's IMEX
  split (+M_{m_n} in A_m with A on the RHS, +4 M m_n source) implements
  4 m_n + m_n m^{n+1}; it is ported as-coded, not as-documented.
- ``Adf = assemble(div(grad(f)) u v dx)`` is STRUCTURALLY ZERO for CG1 f
  (per-element second derivatives of P1 vanish), so it is omitted.
- ``div(chi m grad p)`` for P1 m, p reduces per element to
  chi (grad m . grad p) (the m Δp term vanishes); the integrand is linear
  per element, so a degree-2 rule is exact.
- Legacy ``FCT_alg(A, rhs, ...)`` maps onto the current core as
  ``fct_step(-A, rhs, ...)`` (ops/fct.py:126-130; pinned by
  tests/test_fct.py::test_fct_step_matches_legacy_oracle).

Gradient equation: dk = -(beta c - q m)  (chemotaxis_mimura_FCT_PGD.py:232).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.base import ModelBase
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil
from fem_fct_pdeco_tpu.timeloop import (adjoint_sweep_stats,
                                        forward_sweep_stats)


@dataclasses.dataclass(frozen=True)
class LegacyM4Params:
    """Constants from chemotaxis_mimura_FCT_PGD.py:48-51."""

    delta: float = 32.0
    Dm: float = 0.0625
    Df: float = 1.0
    chi: float = 8.5


class LegacyM4MimuraModel(ModelBase):
    """The m(4-m)-form Mimura system on the current API (XLA path only —
    this is a parity/coverage variant, not a production hot path)."""

    def __init__(self, grid, params: LegacyM4Params = LegacyM4Params(),
                 dtype=jnp.float64, solver_opts: SolverOpts | None = None):
        super().__init__(grid, dtype, solver_opts, backend="xla")
        self.params = params

    def ic(self) -> tuple[np.ndarray, np.ndarray]:
        """m0 = 1.5 + 0.1(0.5 - rand) seeded (mimura_data_helpers.py:55-61);
        f0 = 1/32 (chemotaxis_mimura_FCT_PGD.py:100)."""
        n = self.grid.n
        np.random.seed(5)
        m0 = 1.5 + 0.1 * (0.5 - np.random.rand(n, n))
        return m0, np.full((n, n), 1.0 / 32.0)

    def _fq_matrix(self, dt):
        """Mat_fq = M + dt (Df K + delta M) (chemotaxis_mimura_FCT_PGD.py:92)."""
        p = self.params
        return self.M * (1.0 + dt * p.delta) + (dt * p.Df) * self.K

    # ------------------------------------------------------------------

    def _forward_step(self, dt):
        p = self.params
        asm = self.asm
        rd_opts = dataclasses.replace(self.solver_opts, symmetric=True)

        def step(carry, c_i):
            # derived inside the traced closure so it is built from the
            # hoisted M/K arguments (_HOISTED_OPS), not baked as a constant
            Mat_fq = self._fq_matrix(dt)
            m_n, f_n = carry
            # f implicit solve: rhs = M f_n + dt (m_n c, phi)
            # (rhs_chtx_f, old_helpers.py:90-91; driver :175-177)
            mc_q = asm.nodal_at_quad(m_n, 3) * asm.nodal_at_quad(c_i, 3)
            rhs_f = st.apply(self.M, f_n) + dt * asm.linear_form(mc_q, 3)
            f_np1 = solve_stencil(Mat_fq, rhs_f, x0=f_n, opts=rd_opts)
            # m FCT step: A_m = -Dm K + chi Aa(grad f^{n+1}) + M_{m_n}
            # (mat_chtx_m, old_helpers.py:100-104), rhs = 4 M m_n
            # (rhs_chtx_m, old_helpers.py:87-88); legacy FCT -> fct_step(-A)
            Aa = asm.advective(asm.elem_grad(f_np1), degree=2)
            Ar = asm.weighted_mass(asm.nodal_at_quad(m_n, 3), degree=3)
            A_m = -p.Dm * self.K + p.chi * Aa + Ar
            rhs_m = 4.0 * st.apply(self.M, m_n)
            m_np1 = fct_step(
                -A_m, rhs_m, m_n, dt, self.M, self.M_diag, self.ML_diag,
                solver=self.solver_opts, debug=self.debug,
            )
            return (m_np1, f_np1)

        return step

    def forward(self, control_traj, m0, f0, dt):
        """Forward sweep (chemotaxis_mimura_FCT_PGD.py:160-186); step i uses
        control frame i. Returns (m_traj, f_traj)."""
        fn = self._jitted(("fwd", float(dt)), lambda: self._make_forward(dt))
        return self._call_sweep(fn, control_traj, m0, f0)

    def _make_forward(self, dt):
        step = self._forward_step(dt)

        def run(control_traj, m0, f0):
            return forward_sweep_stats(step, (m0, f0), control_traj[1:])

        return run

    # ------------------------------------------------------------------

    def _adjoint_step(self, dt):
        p = self.params
        asm = self.asm
        rd_opts = dataclasses.replace(self.solver_opts, symmetric=True)

        def step(carry, x):
            Mat_fq = self._fq_matrix(dt)
            p_np1, q_np1 = carry
            m_n, f_n, c_n = x
            # q implicit: rhs = M q^{n+1} + dt (div(chi m grad p^{n+1}), phi)
            # = M q^{n+1} + dt chi (grad m . grad p^{n+1}, phi) for P1 fields
            # (rhs_chtx_q, old_helpers.py:95-97; driver :216-218)
            gm = asm.elem_grad(m_n)
            gp = asm.elem_grad(p_np1)
            dot = (gm * gp).sum(axis=1)  # (2, nc, nc) element-constant
            _, wts, _ = asm.rule(2)
            dot_q = jnp.broadcast_to(
                dot[:, None], (2, len(wts)) + dot.shape[-2:]
            )
            rhs_q = st.apply(self.M, q_np1) + (dt * p.chi) * asm.linear_form(dot_q, 2)
            q_n = solve_stencil(Mat_fq, rhs_q, x0=q_np1, opts=rd_opts)
            # p FCT: A_p = -Dm K - chi Aa(grad f_n) + M_{4-2m_n}
            # (mat_chtx_p, old_helpers.py:106-111; Adf = 0 for P1 f),
            # rhs = (c_n q_n, phi) (rhs_chtx_p, old_helpers.py:93)
            Aa = asm.advective(asm.elem_grad(f_n), degree=2)
            Ar = asm.weighted_mass(4.0 - 2.0 * asm.nodal_at_quad(m_n, 3), degree=3)
            A_p = -p.Dm * self.K - p.chi * Aa + Ar
            rhs_p = asm.linear_form(
                asm.nodal_at_quad(c_n, 3) * asm.nodal_at_quad(q_n, 3), 3
            )
            p_n = fct_step(
                -A_p, rhs_p, p_np1, dt, self.M, self.M_diag, self.ML_diag,
                solver=self.solver_opts, debug=self.debug,
            )
            return (p_n, q_n)

        return step

    def adjoint(self, m_traj, f_traj, mhat_T, fhat_T, control_traj, dt,
                optim="finaltime"):
        """Backward sweep (chemotaxis_mimura_FCT_PGD.py:190-225): terminal
        conditions p(T) = mhat_T - m(T), q(T) = fhat_T - f(T); final-time
        only (the legacy script has no all-time mode)."""
        assert optim == "finaltime", "legacy m(4-m) variant is final-time only"
        fn = self._jitted(("adj", float(dt)), lambda: self._make_adjoint(dt))
        return self._call_sweep(fn, m_traj, f_traj, mhat_T, fhat_T,
                                control_traj)

    def _make_adjoint(self, dt):
        step = self._adjoint_step(dt)

        def run(m_traj, f_traj, mhat_T, fhat_T, control_traj):
            pT = mhat_T - m_traj[-1]
            qT = fhat_T - f_traj[-1]
            xs = (m_traj[:-1], f_traj[:-1], control_traj[:-1])
            return adjoint_sweep_stats(step, (pT, qT), xs)

        return run

    def descent_direction(self, beta, c_traj, m_traj, q_traj):
        """dk = -(beta c - q m) (chemotaxis_mimura_FCT_PGD.py:232)."""
        return -(beta * c_traj - q_traj * m_traj)
