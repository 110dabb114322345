"""Linear advection(-diffusion) models: source control and drift control.

Source control (reference advection_FCT_PDECO_finaltime.py:15-29, 137-140):
    du/dt - ε ∇²u + ∇·(w u) = c (+ g)
    legacy matrices A_SE = (w·∇v, u), A_u = -ε Ad + A_SE; adjoint uses the
    transposed convection A_AE = (w·∇u, v), A_p = -ε Ad + A_AE; legacy FCT
    convention maps to ours via A -> -A (old_helpers.py:115-204).

Drift-velocity control (advection_solidbody_FCT_PDECO_finaltime.py:11-35):
    du/dt - ε ∇²u + ∇·( u (ω w_rot + c m) ) = 0
    with per-step control-dependent matrices
      Adrift1 = ((m·∇c_h) u, v)   pseudo-mass     (line 187)
      Adrift2 = ((m·∇v) c_h, u)   pseudo-stiffness (line 188)
    gradient equation: β c - u (m·∇p) = 0, solved with mass ChebSI (228-238).

The solid-body rotation benchmark (advection_solidbody_FCT.py) is the
forward-only case of either model with c = 0.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.base import ModelBase, _warn_backend_fallback
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import fct_step
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, chebsi
from fem_fct_pdeco_tpu.timeloop import (adjoint_sweep_stats,
                                        forward_sweep_stats)


def vortex_wind(speed: float = 1.0):
    """The [0,1]^2 vortex wind (helpers.py:876-878):
    w = speed * 2 * ((y-1/2) x (1-x), -(x-1/2) y (1-y))."""
    return lambda x, y: (
        speed * 2.0 * (y - 0.5) * x * (1.0 - x),
        -speed * 2.0 * (x - 0.5) * y * (1.0 - y),
    )


def rotation_wind(om: float):
    """Solid-body rotation w = (1/om) (-y, x) (advection_solidbody_FCT.py:78)."""
    return lambda x, y: (-y / om, x / om)


def rotation_drift_wind(om: float, drift=(2.0, 2.0)):
    """Rotation plus constant drift (advection_solidbody_FCT.py:77-80)."""
    return lambda x, y: (-y / om + drift[0], x / om + drift[1])


def slotted_cylinder_ic(grid, slit_width: float = 0.1) -> np.ndarray:
    """Slotted-cylinder initial condition (advection_solidbody_FCT.py:62-75)."""
    X, Y = grid.xy
    R = np.sqrt(X**2 + (Y - 1.0 / 3.0) ** 2)
    return np.where((R < 1.0 / 3.0) & ((np.abs(X) > slit_width) | (Y > 0.5)), 1.0, 0.0)


class AdvectionModel(ModelBase):
    """Source-controlled linear advection-diffusion with a stationary wind.

    ``divw_fn``: analytic divergence of the wind. When given, the model uses
    the finaltime-exact MMS conventions
    (advection_FCT_PDECO_finaltime_exact.py:179-188): the adjoint flux matrix
    becomes ``-A_p = εAd + Aa1 + Aa2`` with ``Aa2 = ∫ div(w) u v dx``
    (the wind is non-solenoidal there), instead of the transposed-convection
    adjoint of the solenoidal drivers (advection_FCT_PDECO_finaltime.py:138-140).
    A time-dependent reaction coefficient g(t) (the ``+ g u`` term of the
    state PDE, finaltime_exact:16, handled IMEX at finaltime_exact:273-279)
    is passed per sweep via ``reaction_traj``.
    """

    _HOISTED_OPS = ModelBase._HOISTED_OPS + ("N", "A_state", "A_adjoint")

    # the scalar fused sweep auto-dispatches to its lean variant (one
    # 7-plane buffer, HBM-resident stationary flux matrix) past the
    # resident VMEM budget, so the fused backend holds up to the lean
    # budget (there is no separate synth kernel for this family)
    _synth_capable = True
    _lean_capable = True
    # the scalar sweep also auto-dispatches to its banded XL variant past
    # the lean tier's calibrated VMEM cap (>= ~672^2 f32)
    _xl_capable = True

    def __init__(self, grid, eps: float, wind_fn, dtype=jnp.float64,
                 solver_opts: SolverOpts | None = None, divw_fn=None,
                 backend: str = "xla", pad_to: int | None = None,
                 mesh=None, debug: bool = False):
        super().__init__(grid, dtype, solver_opts, backend, pad_to, mesh,
                         debug=debug)
        self.eps = eps
        self.N = self.asm.convection(wind_fn)  # (w·∇v, u)
        # ref-convention flux matrices (du/dt + A u = rhs):
        self.A_state = eps * self.K - self.N
        if divw_fn is None:
            self.A_adjoint = eps * self.K - st.transpose(self.N)
        else:
            A_div = self.asm.weighted_mass(
                jnp.asarray(self.asm.analytic_at_quad(divw_fn, 4), dtype=self.dtype),
                degree=4,
            )
            # A_p = -Aa1 - Aa2 - εAd; ours is -A_p (finaltime_exact:188)
            self.A_adjoint = eps * self.K + self.N + A_div

    def _reaction_load(self, g_i, u_i):
        """∫ g_h u_h φ dx — the IMEX reaction term M_g @ u of the reference
        (finaltime_exact:275-277, Mg = assemble(g u v dx))."""
        asm = self.asm
        return asm.linear_form(
            asm.nodal_at_quad(g_i, 3) * asm.nodal_at_quad(u_i, 3), 3
        )

    def _fct(self, A, rhs, u_n, dt):
        return fct_step(A, rhs, u_n, dt, self.M, self.M_diag, self.ML_diag,
                        solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                        prec=self._spectral_prec(dt, self.eps))

    def forward(self, control_traj, u0, dt, source_traj=None, reaction_traj=None):
        """State sweep; step i uses control_traj[i]
        (advection_FCT_PDECO_finaltime.py:194-205). ``source_traj`` is the
        optional known source f of the MMS drivers; ``reaction_traj`` the
        optional reaction coefficient g(t), applied explicitly with the
        previous step's value (IMEX, finaltime_exact:273-279)."""
        has_src = source_traj is not None
        has_g = reaction_traj is not None
        key = ("fwd", float(dt), has_src, has_g)

        def build():
            if self.backend == "pallas_dist":
                if has_g:
                    _warn_backend_fallback(
                        "pallas_dist", "per-step reaction coefficient g")
                else:
                    from fem_fct_pdeco_tpu.ops.pallas_dist import (
                        dist_scalar_fct_sweep)

                    def run_dist(control_traj, u0, *rest):
                        load = control_traj[1:]
                        if has_src:
                            load = load + rest[0][1:]  # rhs = M(c + f)
                        frames, stats = dist_scalar_fct_sweep(
                            load[:, None], u0, self.A_state, self.M,
                            self.M_diag, self.ML_diag, self.mesh,
                            h=self.grid.h, dt=dt, tol=self.solver_opts.tol,
                            load_is_mass=True, iters=self.solver_opts.maxiter,
                            with_stats=True,
                        )
                        return (jnp.concatenate([u0[None], frames], axis=0),
                                stats)

                    return run_dist
            if self.backend == "pallas_fused":
                from fem_fct_pdeco_tpu.ops.pallas_fused import fused_scalar_fct_sweep

                def run_fused(control_traj, u0, *rest):
                    load = control_traj[1:]
                    i = 0
                    if has_src:
                        load = load + rest[i][1:]  # rhs = M(c + f)
                        i += 1
                    frames_in = load[:, None]
                    if has_g:
                        # reaction channel: g(t_n), previous-step IMEX
                        frames_in = jnp.concatenate(
                            [frames_in, rest[i][:-1][:, None]], axis=1)
                    frames, stats = fused_scalar_fct_sweep(
                        frames_in, u0, self.A_state, self.M, self.M_diag,
                        self.ML_diag, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, load_is_mass=True,
                        iters=self.solver_opts.maxiter, reaction=has_g,
                        with_stats=True,
                    )
                    return jnp.concatenate([u0[None], frames], axis=0), stats

                return run_fused

            def step(carry, x):
                rhs = st.apply(self.M, x[0])
                k = 1
                if has_src:
                    rhs = rhs + st.apply(self.M, x[k])
                    k += 1
                if has_g:
                    rhs = rhs - self._reaction_load(x[k], carry)
                return self._fct(self.A_state, rhs, carry, dt)

            def run(control_traj, u0, *rest):
                xs = [control_traj[1:]]
                i = 0
                if has_src:
                    xs.append(rest[i][1:])  # f(t_{n+1})
                    i += 1
                if has_g:
                    xs.append(rest[i][:-1])  # g(t_n): previous-step IMEX
                return forward_sweep_stats(step, u0, tuple(xs))

            return run

        fn = self._jitted(key, build)
        args = [control_traj, u0]
        if has_src:
            args.append(source_traj)
        if has_g:
            args.append(reaction_traj)
        return self._call_sweep(fn, *args)

    def adjoint(self, u_traj, uhat, dt, optim="finaltime", reaction_traj=None):
        """Adjoint sweep: -dp/dt - ε∇²p - w·∇p (+ g p) = (alltime: û - u),
        with p(T) = û_T - u(T) (finaltime) or 0 (alltime)
        (advection_FCT_PDECO_finaltime.py:212-231,
        advection_FCT_PDECO_alltime_exact.py:253-268). The reaction term g p
        is applied explicitly with the later step's p (IMEX,
        finaltime_exact:317-322)."""
        has_g = reaction_traj is not None
        key = ("adj", float(dt), optim, has_g)

        def build():
            if self.backend == "pallas_dist":
                if has_g:
                    _warn_backend_fallback(
                        "pallas_dist", "per-step reaction coefficient g")
                else:
                    from fem_fct_pdeco_tpu.ops.pallas_dist import (
                        dist_scalar_fct_sweep)

                    def run_dist(u_traj, uhat, *rest):
                        if optim == "finaltime":
                            pT = uhat - u_traj[-1]
                            loads = jnp.zeros_like(u_traj[:-1])
                        else:
                            pT = jnp.zeros_like(u_traj[-1])
                            import jax

                            loads = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                                uhat[:-1], u_traj[:-1])
                        frames, stats = dist_scalar_fct_sweep(
                            loads[:, None], pT, self.A_adjoint, self.M,
                            self.M_diag, self.ML_diag, self.mesh, h=self.grid.h,
                            dt=dt, tol=self.solver_opts.tol, load_is_mass=False,
                            reverse=True, iters=self.solver_opts.maxiter,
                            with_stats=True,
                        )
                        return (jnp.concatenate([frames, pT[None]], axis=0),
                                stats)

                    return run_dist
            if self.backend == "pallas_fused":
                from fem_fct_pdeco_tpu.ops.pallas_fused import fused_scalar_fct_sweep

                def run_fused(u_traj, uhat, *rest):
                    if optim == "finaltime":
                        pT = uhat - u_traj[-1]
                        loads = jnp.zeros_like(u_traj[:-1])
                    else:
                        pT = jnp.zeros_like(u_traj[-1])
                        import jax

                        loads = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                            uhat[:-1], u_traj[:-1])
                    frames_in = loads[:, None]
                    if has_g:
                        frames_in = jnp.concatenate(
                            [frames_in, rest[0][:-1][:, None]], axis=1)
                    frames, stats = fused_scalar_fct_sweep(
                        frames_in, pT, self.A_adjoint, self.M,
                        self.M_diag, self.ML_diag, h=self.grid.h, dt=dt,
                        tol=self.solver_opts.tol, load_is_mass=False,
                        reverse=True, reaction=has_g, with_stats=True,
                    )
                    return jnp.concatenate([frames, pT[None]], axis=0), stats

                return run_fused

            def step(carry, x):
                u_n, uhat_n, g_n = x
                if optim == "finaltime":
                    rhs = jnp.zeros_like(carry)
                else:
                    rhs = st.apply(self.M, uhat_n - u_n)
                if has_g:
                    rhs = rhs - self._reaction_load(g_n, carry)
                return self._fct(self.A_adjoint, rhs, carry, dt)

            def run(u_traj, uhat, *rest):
                if optim == "finaltime":
                    pT = uhat - u_traj[-1]
                    uh = jnp.zeros_like(u_traj[:-1])
                else:
                    pT = jnp.zeros_like(u_traj[-1])
                    uh = uhat[:-1]
                g = rest[0][:-1] if has_g else jnp.zeros_like(u_traj[:-1])
                return adjoint_sweep_stats(step, pT, (u_traj[:-1], uh, g))

            return run

        fn = self._jitted(key, build)
        args = [u_traj, uhat]
        if has_g:
            args.append(reaction_traj)
        return self._call_sweep(fn, *args)

    def adjoint_checkpointed(self, control_traj, u0, uhat, dt,
                             optim="finaltime", num_segments: int = 8,
                             source_traj=None, reaction_traj=None):
        """Segmented checkpoint/recompute adjoint without a stored forward
        trajectory (timeloop.checkpointed_adjoint; SURVEY §5 long-trajectory
        mechanism). Returns p_traj matching ``adjoint(forward(...))`` for the
        same optional source/reaction trajectories."""
        has_src = source_traj is not None
        has_g = reaction_traj is not None
        key = ("adjck", float(dt), optim, num_segments, has_src, has_g)

        def build():
            from fem_fct_pdeco_tpu.timeloop import checkpointed_adjoint

            def fwd_step(carry, x):
                rhs = st.apply(self.M, x[0])
                k = 1
                if has_src:
                    rhs = rhs + st.apply(self.M, x[k])
                    k += 1
                if has_g:
                    rhs = rhs - self._reaction_load(x[k], carry)
                return self._fct(self.A_state, rhs, carry, dt)

            def adj_step(carry, x):
                u_n, uhat_n, g_n = x
                if optim == "finaltime":
                    rhs = jnp.zeros_like(carry)
                else:
                    rhs = st.apply(self.M, uhat_n - u_n)
                if has_g:
                    rhs = rhs - self._reaction_load(g_n, carry)
                return self._fct(self.A_adjoint, rhs, carry, dt)

            def run(control_traj, u0, uhat, *rest):
                fwd_xs = [control_traj[1:]]
                i = 0
                if has_src:
                    fwd_xs.append(rest[i][1:])  # f(t_{n+1})
                    i += 1
                if has_g:
                    g_traj = rest[i]
                    fwd_xs.append(g_traj[:-1])  # g(t_n): previous-step IMEX

                def terminal(final):
                    if optim == "finaltime":
                        return uhat - final
                    return jnp.zeros_like(final)

                def adj_xs(seg_traj, s, seg):
                    if optim == "finaltime":
                        uh = jnp.zeros_like(seg_traj[:-1])
                    else:
                        uh = jax.lax.dynamic_slice_in_dim(
                            uhat, s * seg, seg, axis=0)
                    if has_g:
                        g = jax.lax.dynamic_slice_in_dim(
                            g_traj, s * seg, seg, axis=0)
                    else:
                        g = jnp.zeros_like(seg_traj[:-1])
                    return (seg_traj[:-1], uh, g)

                return checkpointed_adjoint(
                    fwd_step, adj_step, u0, tuple(fwd_xs),
                    terminal, adj_xs, num_segments,
                )

            return run

        fn = self._jitted(key, build)
        args = [control_traj, u0, uhat]
        if has_src:
            args.append(source_traj)
        if has_g:
            args.append(reaction_traj)
        return self._call_sweep(fn, *args)

    def descent_direction(self, beta, c_traj, p_traj):
        """dk = -(β c - p) (advection_FCT_PDECO_finaltime.py:237)."""
        return -(beta * c_traj - p_traj)


class DriftControlModel(ModelBase):
    """Drift-velocity control over a rotating base flow (solid body).

    Full backend treatment: ``backend="pallas_fused"`` runs the whole sweep
    as one Pallas kernel with IN-KERNEL per-step Adrift1/Adrift2 assembly
    (the reference reassembles both with FEniCS every step,
    advection_solidbody_FCT_PDECO_finaltime.py:187-191);
    ``backend="pallas_dist"`` runs the multi-chip RDMA drift sweep
    (ops/pallas_dist.py); ``pad_to`` enables mesh-divisible padded sharding
    on the XLA path, as for the other model families.
    """

    _HOISTED_OPS = ModelBase._HOISTED_OPS + ("Nrot",)

    # fused_drift_fct_sweep auto-dispatches to its lean variant past the
    # resident VMEM budget, and to its banded XL variant past the lean
    # tier's calibrated cap (see AdvectionModel)
    _synth_capable = True
    _lean_capable = True
    _xl_capable = True

    def __init__(self, grid, eps: float, om: float, drift=(1.0, 1.0),
                 dtype=jnp.float64, solver_opts: SolverOpts | None = None,
                 backend: str = "xla", pad_to: int | None = None,
                 mesh=None, debug: bool = False):
        super().__init__(grid, dtype, solver_opts, backend, pad_to, mesh,
                         debug=debug)
        self.eps = eps
        self.om = om
        self.drift = drift
        self.Nrot = self.asm.convection(rotation_wind(om))

    def _drift_matrices(self, c_i):
        """Adrift1 + Adrift2 for a control field
        (advection_solidbody_FCT_PDECO_finaltime.py:187-188)."""
        asm = self.asm
        m = jnp.asarray(self.drift, dtype=self.dtype)
        gc = asm.elem_grad(c_i)  # (2, 2, nc, nc)
        mdotgc = m[0] * gc[:, 0] + m[1] * gc[:, 1]  # (2, nc, nc) per element
        nq = asm.rule(2)[1].shape[0]
        A1 = asm.weighted_mass(jnp.broadcast_to(mdotgc[:, None], (2, nq, asm.nc, asm.nc)), degree=2)
        G = jnp.broadcast_to(
            m[None, :, None, None], (2, 2, asm.nc, asm.nc)
        )
        A2 = asm.advective(G, asm.nodal_at_quad(c_i, 2), degree=2)
        return A1 + A2

    def _fct(self, A, rhs, u_n, dt):
        return fct_step(A, rhs, u_n, dt, self.M, self.M_diag, self.ML_diag,
                        solver=self.solver_opts, debug=self.debug, node_mask=self.node_mask,
                        prec=self._spectral_prec(dt, self.eps))

    def _forward_step(self, dt):
        def step(carry, c_i):
            A = self.eps * self.K - self.Nrot - self._drift_matrices(c_i)
            return self._fct(A, jnp.zeros_like(carry), carry, dt)

        return step

    def _adjoint_step(self, dt, optim):
        def step(carry, x):
            c_n, u_n, uhat_n = x
            A = self.eps * self.K + self.Nrot + self._drift_matrices(c_n)
            if optim == "finaltime":
                rhs = jnp.zeros_like(carry)
            else:
                rhs = st.apply(self.M, uhat_n - u_n)
            return self._fct(A, rhs, carry, dt)

        return step

    def forward(self, control_traj, u0, dt):
        """State sweep: legacy A_u = -ε Ad + Arot + Adrift1 + Adrift2 with
        FCT_alg — ours: fct A = ε K - Arot - Adrift (sign flip)."""

        def build():
            if self.backend == "pallas_dist":
                from fem_fct_pdeco_tpu.ops.pallas_dist import dist_drift_fct_sweep

                def run_dist(c, u0):
                    frames, stats = dist_drift_fct_sweep(
                        c[1:][:, None], u0,
                        self.eps * self.K - self.Nrot, self.M, self.M_diag,
                        self.ML_diag, self.mesh, h=self.grid.h, dt=dt,
                        sign=-1.0, drift=self.drift,
                        tol=self.solver_opts.tol,
                        iters=self.solver_opts.maxiter, with_stats=True,
                    )
                    return (jnp.concatenate([u0[None], frames], axis=0),
                            stats)

                return run_dist
            if self.backend == "pallas_fused":
                from fem_fct_pdeco_tpu.ops.pallas_fused import fused_drift_fct_sweep

                def run_fused(c, u0):
                    frames, stats = fused_drift_fct_sweep(
                        c[1:][:, None], u0,
                        self.eps * self.K - self.Nrot, self.M, self.M_diag,
                        self.ML_diag, h=self.grid.h, dt=dt, sign=-1.0,
                        drift=self.drift, tol=self.solver_opts.tol,
                        iters=self.solver_opts.maxiter, with_stats=True,
                    )
                    return jnp.concatenate([u0[None], frames], axis=0), stats

                return run_fused
            step = self._forward_step(dt)
            return lambda c, u0: forward_sweep_stats(step, u0, c[1:])

        return self._call_sweep(self._jitted(("fwd", float(dt)), build),
                                control_traj, u0)

    def adjoint(self, u_traj, uhat, control_traj, dt, optim="finaltime"):
        """Adjoint sweep: legacy A_p = -ε Ad - Arot - Adrift; FCT with -A_p
        (advection_solidbody_FCT_PDECO_finaltime.py:206-227). For all-time the
        misfit M(û-u) enters the rhs (advection_solidbody_FCT_PDECO_alltime.py).
        """

        def build():
            if self.backend in ("pallas_fused", "pallas_dist"):
                if self.backend == "pallas_dist":
                    from fem_fct_pdeco_tpu.ops.pallas_dist import (
                        dist_drift_fct_sweep as sweep_fn)
                    extra = {"mesh": True}
                else:
                    from fem_fct_pdeco_tpu.ops.pallas_fused import (
                        fused_drift_fct_sweep as sweep_fn)
                    extra = {}

                def run_kern(u_traj, uhat, control_traj):
                    if optim == "finaltime":
                        pT = uhat - u_traj[-1]
                        frames = control_traj[:-1][:, None]
                        has_mis = False
                    else:
                        pT = jnp.zeros_like(u_traj[-1])
                        mis = jax.vmap(lambda a, b: st.apply(self.M, a - b))(
                            uhat[:-1], u_traj[:-1])
                        frames = jnp.stack(
                            [control_traj[:-1], mis], axis=1)
                        has_mis = True
                    kw = dict(h=self.grid.h, dt=dt, sign=1.0,
                              drift=self.drift, tol=self.solver_opts.tol,
                              iters=self.solver_opts.maxiter,
                              reverse=True, has_mis=has_mis)
                    args = [frames, pT,
                            self.eps * self.K + self.Nrot, self.M,
                            self.M_diag, self.ML_diag]
                    if extra:
                        args.append(self.mesh)
                    p, stats = sweep_fn(*args, with_stats=True, **kw)
                    return jnp.concatenate([p, pT[None]], axis=0), stats

                return run_kern
            step = self._adjoint_step(dt, optim)

            def run(u_traj, uhat, control_traj):
                if optim == "finaltime":
                    pT = uhat - u_traj[-1]
                    uh = jnp.zeros_like(u_traj[:-1])
                else:
                    pT = jnp.zeros_like(u_traj[-1])
                    uh = uhat[:-1]
                return adjoint_sweep_stats(
                    step, pT, (control_traj[:-1], u_traj[:-1], uh))

            return run

        return self._call_sweep(
            self._jitted(("adj", float(dt), optim), build),
            u_traj, uhat, control_traj)

    def adjoint_checkpointed(self, control_traj, u0, uhat, dt,
                             optim="finaltime", num_segments: int = 8):
        """Segmented checkpoint/recompute adjoint without a stored forward
        trajectory (timeloop.checkpointed_adjoint; SURVEY §5 long-trajectory
        mechanism). Returns p_traj matching adjoint(forward(...))."""
        key = ("adjck", float(dt), optim, num_segments)

        def build():
            from fem_fct_pdeco_tpu.timeloop import checkpointed_adjoint

            fwd_step = self._forward_step(dt)
            adj_step = self._adjoint_step(dt, optim)

            def run(control_traj, u0, uhat):
                import jax as _jax

                def terminal(final):
                    if optim == "finaltime":
                        return uhat - final
                    return jnp.zeros_like(final)

                def adj_xs(seg_traj, s, seg):
                    cseg = _jax.lax.dynamic_slice_in_dim(
                        control_traj, s * seg, seg, axis=0)
                    if optim == "finaltime":
                        uh = jnp.zeros_like(seg_traj[:-1])
                    else:
                        uh = _jax.lax.dynamic_slice_in_dim(
                            uhat, s * seg, seg, axis=0)
                    return (cseg, seg_traj[:-1], uh)

                return checkpointed_adjoint(
                    fwd_step, adj_step, u0, control_traj[1:],
                    terminal, adj_xs, num_segments,
                )

            return run

        return self._call_sweep(self._jitted(key, build),
                                control_traj, u0, uhat)

    def descent_direction(self, beta, c_traj, u_traj, p_traj):
        """dk = M^{-1}[-(β M c + (p_h (m·∇u_h), v))] via ChebSI
        (advection_solidbody_FCT_PDECO_finaltime.py:228-238)."""

        def build():
            asm = self.asm
            m = jnp.asarray(self.drift, dtype=self.dtype)

            def one(c_i, u_i, p_i):
                gu = asm.elem_grad(u_i)
                mdotgu = m[0] * gu[:, 0] + m[1] * gu[:, 1]  # (2, nc, nc)
                nq = asm.rule(2)[1].shape[0]
                f = asm.nodal_at_quad(p_i, 2) * mdotgu[:, None]
                b = asm.linear_form(f, degree=2)
                rhs = -(beta * st.apply(self.M, c_i) + b)
                return chebsi(rhs, self.M, self.M_diag, 20, 0.5, 2.0)

            import jax

            return lambda c, u, p: jax.vmap(one)(c, u, p)

        return self._jitted(("desc", float(beta)), build)(c_traj, u_traj, p_traj)
