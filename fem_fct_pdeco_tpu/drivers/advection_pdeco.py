"""Source-controlled linear advection PDECO driver.

Reference scripts covered:
- advection_FCT_PDECO_finaltime.py (stripes target, linear-increment Armijo
  via the auxiliary w-equation at lines 242-266)
- advection_FCT_PDECO_alltime_exact.py / advection_FCT_PDECO_finaltime_exact.py
  (method of manufactured solutions; --exact). The MMS fields (uex, pex,
  cex = clip(pex/β), source g, target û) follow the construction at
  advection_FCT_PDECO_alltime_exact.py:77-128, and the driver reports max
  relative and Δx-weighted L2 errors for u, c, p per the reference's error
  tables (lines 333-440).

CLI:  python -m fem_fct_pdeco_tpu.drivers.advection_pdeco [--optim alltime --exact]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q

DEFAULTS = dict(
    a1=0.0, a2=1.0, dx=0.0125, dt=1e-3, T=0.2, T_data=0.5,
    beta=1e-3, c_lower=-1.0, c_upper=1.0, tol=1e-4,
    max_iter_armijo=10, max_iter_gd=50,
)
EPS = 1e-4


def wind2(x, y):
    """'wind 2' of the advection drivers — the dolfin Expression at
    advection_FCT_PDECO_finaltime.py:96-97 (positive second component)."""
    return (2 * (y - 0.5) * x * (1 - x), 2 * (x - 0.5) * y * (1 - y))


class MMSFields:
    """Manufactured solution (advection_FCT_PDECO_alltime_exact.py:77-128)."""

    def __init__(self, grid, T, beta, c_lower, c_upper, e1=0.2, e2=0.3, k1=1, k2=1):
        self.grid, self.T, self.beta = grid, T, beta
        self.c_lower, self.c_upper = c_lower, c_upper
        self.e1, self.e2, self.k1, self.k2 = e1, e2, k1, k2
        self.X, self.Y = grid.xy

    def uex(self, t):
        s = np.sin(self.k1 * np.pi * self.X) * np.sin(self.k1 * np.pi * self.Y)
        return np.exp(self.e1 * t) * s**2

    def pex(self, t):
        s = np.sin(self.k2 * np.pi * self.X) * np.sin(self.k2 * np.pi * self.Y)
        return (np.exp(self.e2 * self.T) - np.exp(self.e2 * t)) * s**2

    def cex(self, t):
        return np.clip(self.pex(t) / self.beta, self.c_lower, self.c_upper)

    def _derivs(self, t, e, k, amp):
        X, Y, pi = self.X, self.Y, np.pi
        s2y = np.sin(k * pi * Y) ** 2
        s2x = np.sin(k * pi * X) ** 2
        dx_ = 2 * k * pi * amp * np.sin(k * pi * X) * np.cos(k * pi * X) * s2y
        dy_ = 2 * k * pi * amp * s2x * np.sin(k * pi * Y) * np.cos(k * pi * Y)
        dxx = 2 * (pi * k) ** 2 * amp * np.cos(2 * k * pi * X) * s2y
        dyy = 2 * (pi * k) ** 2 * amp * s2x * np.cos(2 * k * pi * Y)
        return dx_, dy_, dxx, dyy

    def g(self, t, eps, wind_fn):
        wx, wy = wind_fn(self.X, self.Y)
        amp = np.exp(self.e1 * t)
        dx_, dy_, dxx, dyy = self._derivs(t, self.e1, self.k1, amp)
        return self.e1 * self.uex(t) - eps * (dxx + dyy) + wx * dx_ + wy * dy_ - self.cex(t)

    def uhat(self, t, eps, wind_fn):
        wx, wy = wind_fn(self.X, self.Y)
        amp = np.exp(self.e2 * self.T) - np.exp(self.e2 * t)
        dx_, dy_, dxx, dyy = self._derivs(t, self.e2, self.k2, amp)
        dpdt = -self.e2 * np.exp(self.e2 * t) * (
            np.sin(self.k2 * np.pi * self.X) * np.sin(self.k2 * np.pi * self.Y)
        ) ** 2
        return -dpdt - eps * (dxx + dyy) - wx * dx_ - wy * dy_ + self.uex(t)


class MMSFinaltimeFields:
    """Manufactured solution of the FINAL-TIME exact driver
    (advection_FCT_PDECO_finaltime_exact.py:76-151):
        uex = e^{e1 t} (cos k1πx cos k2πy + 1)
        pex = (e^{e2 T} - e^{e2 t}) cos k3πx cos k4πy
        cex = clip(pex/β, c_lower, c_upper)
    with the NON-SOLENOIDAL wind w = γ(sin k3πx cos k3πx, sin k4πy cos k4πy)
    (lines 140-151), a time-dependent reaction coefficient g (lines 98-108;
    ``delta_ex`` regularizes the t→T singularity) and the source f assembled
    from terms 1-7 (lines 110-130).

    ``variant="reference"`` reproduces the reference construction verbatim.
    It is *inconsistent as a convergence harness for p and c*: the final-time
    adjoint is homogeneous with p(T) = û_T - u(T) = pex(T) = 0, so the
    discrete adjoint is identically zero while pex ≠ 0 — pex only solves the
    continuous equation through the δ→0 singularity of g, which no discrete
    backward recursion reproduces. The reference's own commented-out g
    (lines 104-106, denominator e^{e2 T} - e^{e2 t} + δ) is the regular form;
    ``variant="consistent"`` completes it into an exact optimality system:
        pex = (e^{e2 T} - e^{e2 t} + δ) cos k3πx cos k4πy   (pex(T) = δ·C ≠ 0)
        û_T = uex(T) + pex(T)
    which satisfies state + adjoint + gradient equation exactly with bounded
    coefficients, so u, p, c all converge under refinement."""

    def __init__(self, grid, T, beta, c_lower, c_upper, eps, e1=1.0, e2=1.0,
                 k1=1, k2=1, k3=1, k4=1, gamma=0.1, delta_ex=0.1,
                 variant: str = "reference"):
        assert variant in ("reference", "consistent")
        self.variant = variant
        self.grid, self.T, self.beta = grid, T, beta
        self.c_lower, self.c_upper = c_lower, c_upper
        self.eps = eps
        self.e1, self.e2 = e1, e2
        self.k1, self.k2, self.k3, self.k4 = k1, k2, k3, k4
        self.gamma, self.delta_ex = gamma, delta_ex
        self.X, self.Y = grid.xy

    # -- wind and its analytic divergence (finaltime_exact:140-151) -------
    def wind(self, x, y):
        g, k3, k4, pi = self.gamma, self.k3, self.k4, np.pi
        return (g * np.sin(k3 * pi * x) * np.cos(k3 * pi * x),
                g * np.sin(k4 * pi * y) * np.cos(k4 * pi * y))

    def divw(self, x, y):
        g, k3, k4, pi = self.gamma, self.k3, self.k4, np.pi
        return g * pi * (k3 * np.cos(2 * k3 * pi * x) + k4 * np.cos(2 * k4 * pi * y))

    # -- manufactured fields ----------------------------------------------
    def uex(self, t):
        pi = np.pi
        return np.exp(self.e1 * t) * (
            np.cos(self.k1 * pi * self.X) * np.cos(self.k2 * pi * self.Y) + 1.0
        )

    def pex(self, t):
        pi = np.pi
        amp = np.exp(self.e2 * self.T) - np.exp(self.e2 * t)
        if self.variant == "consistent":
            amp = amp + self.delta_ex
        return amp * np.cos(self.k3 * pi * self.X) * np.cos(self.k4 * pi * self.Y)

    def cex(self, t):
        return np.clip(self.pex(t) / self.beta, self.c_lower, self.c_upper)

    def gex(self, t):
        """Reaction coefficient (finaltime_exact:98-108; the "consistent"
        denominator is the commented variant at lines 104-106)."""
        e2, k3, k4, pi = self.e2, self.k3, self.k4, np.pi
        X, Y = self.X, self.Y
        if self.variant == "consistent":
            denom = np.exp(e2 * self.T) - np.exp(e2 * t) + self.delta_ex
        else:
            denom = np.exp(e2 * self.T) - np.exp(e2 * t * (1.0 - self.delta_ex))
        return (
            -e2 * np.exp(e2 * t) / denom
            - self.eps * (k3**2 + k4**2) * pi**2
            - self.gamma * pi * (k3 * np.sin(k3 * pi * X) ** 2
                                 + k4 * np.sin(k4 * pi * Y) ** 2)
        ) * np.ones_like(X)

    def fex(self, t):
        """Source so uex solves the state PDE with c = cex
        (finaltime_exact:110-130, terms 1-7)."""
        e1, k1, k2, k3, k4, pi = self.e1, self.k1, self.k2, self.k3, self.k4, np.pi
        X, Y = self.X, self.Y
        u_ex = self.uex(t)
        wx, wy = self.wind(X, Y)
        term1 = e1 * u_ex
        term2 = self.eps * (k1**2 + k2**2) * pi**2 * (u_ex - np.exp(e1 * t))
        term3 = self.gamma * pi * (
            k3 * np.cos(2 * k3 * pi * X) + k4 * np.cos(2 * k4 * pi * Y)
        ) * u_ex
        term4 = -np.exp(e1 * t) * pi * k1 * wx * np.sin(k1 * pi * X) * np.cos(k2 * pi * Y)
        term5 = -np.exp(e1 * t) * pi * k2 * wy * np.cos(k1 * pi * X) * np.sin(k2 * pi * Y)
        term6 = self.gex(t) * u_ex
        term7 = -self.cex(t)
        return term1 + term2 + term3 + term4 + term5 + term6 + term7

    def uhat(self, t):
        """Target: exact state at T (finaltime_exact:132-138); the consistent
        variant adds pex(T) so the adjoint terminal condition
        p(T) = û_T - u(T) equals pex(T)."""
        if self.variant == "consistent":
            return self.uex(t) + self.pex(self.T)
        return self.uex(t)


class AdvectionProblem(PDECOProblem):
    name = "Adv"
    num_vars = 1
    use_linear_increments = False  # set True for w-equation Armijo trials

    def __init__(self, cfg: ExperimentConfig, exact: bool = False,
                 linear_armijo: bool = False, delta_ex: float = 0.1,
                 mms_variant: str = "reference", backend: str = "xla",
                 dtype=None):
        super().__init__(cfg)
        from fem_fct_pdeco_tpu.drivers.common import resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)
        self.exact = exact
        self.use_linear_increments = linear_armijo
        self._reaction = None
        steps = cfg.num_steps
        times = np.arange(steps + 1) * cfg.dt
        if exact and cfg.optim == "finaltime":
            # the finaltime-exact construction: its own wind, reaction g and
            # source f (advection_FCT_PDECO_finaltime_exact.py:76-151)
            self.mms = MMSFinaltimeFields(
                self.grid, cfg.T, cfg.beta, cfg.c_lower, cfg.c_upper, EPS,
                delta_ex=delta_ex, variant=mms_variant,
            )
            self.wind_fn = self.mms.wind
            self.model = AdvectionModel(
                self.grid, eps=EPS, wind_fn=self.mms.wind, dtype=dtype,
                solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral), divw_fn=self.mms.divw,
            )
            md = self.model.dtype
            self._u0 = jnp.asarray(self.mms.uex(0.0), dtype=md)
            self._g = jnp.asarray(np.stack([self.mms.fex(t) for t in times]),
                                  dtype=md)
            self._reaction = jnp.asarray(
                np.stack([self.mms.gex(t) for t in times]), dtype=md)
            self._target = jnp.asarray(self.mms.uhat(cfg.T), dtype=md)
            return
        from fem_fct_pdeco_tpu.drivers.common import dist_mesh

        wf = vortex_wind(1.0) if exact else wind2
        self.wind_fn = wf
        self.model = AdvectionModel(self.grid, eps=EPS, wind_fn=wf,
                                    dtype=dtype,
                                    solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral),
                                    backend=backend,
                                    mesh=dist_mesh(backend))
        md = self.model.dtype
        if exact:
            self.mms = MMSFields(self.grid, cfg.T, cfg.beta, cfg.c_lower, cfg.c_upper)
            self._u0 = jnp.asarray(self.mms.uex(0.0), dtype=md)
            self._g = jnp.asarray(np.stack([self.mms.g(t, EPS, wf) for t in times]),
                                  dtype=md)
            if cfg.optim == "alltime":
                self._target = jnp.asarray(
                    np.stack([self.mms.uhat(t, EPS, wf) for t in times]), dtype=md
                )
            else:
                self._target = jnp.asarray(self.mms.uhat(cfg.T, EPS, wf), dtype=md)
        else:
            self.mms = None
            X, Y = self.grid.xy
            self._u0 = jnp.asarray(
                5 * Y * (Y - 1) * X * (X - 1) * np.sin(4 * X * np.pi), dtype=md)
            self._g = None
            from fem_fct_pdeco_tpu.drivers.common import target_dir

            tdir = target_dir(cfg, self.grid, cfg.dt)
            path = os.path.join(tdir, "advection_u.csv")
            if not os.path.exists(path):
                from fem_fct_pdeco_tpu.drivers.generate_targets import advection_stripes

                advection_stripes(tdir, T=cfg.T_data, dt=cfg.dt, dx=cfg.dx)
            if cfg.optim == "finaltime":
                self._target = jnp.asarray(
                    import_data_final(path, self.grid, num_steps=cfg.num_steps_data),
                    dtype=md,
                )
            else:
                self._target = jnp.asarray(
                    import_data_final(path, self.grid, num_steps=steps, time_dep=True),
                    dtype=md,
                )

    def mass(self):
        return self.objective_mass(self.model)

    def targets(self):
        return (self._target,)

    def solve_state(self, c):
        return (self.model.forward(c, self._u0, self.cfg.dt, source_traj=self._g,
                                   reaction_traj=self._reaction),)

    def solve_adjoint(self, state, c):
        return (self.model.adjoint(state[0], self._target, self.cfg.dt,
                                   self.cfg.optim, reaction_traj=self._reaction),)

    def descent_direction(self, c, state, adjoint):
        return self.model.descent_direction(self.cfg.beta, c, adjoint[0])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._target, c, self.cfg.dt, self.mass(),
            self.cfg.beta, self.cfg.optim, accum_dtype=self.accum_dtype,
        )

    def linear_increments(self, dk):
        """Auxiliary w-equation for linear-increment Armijo
        (advection_FCT_PDECO_finaltime.py:242-266): solve the state equation
        with rhs d and zero IC; then u(c + s d) = u(c) + s w."""
        w0 = jnp.zeros_like(self._u0)
        w = self.model.forward(dk, w0, self.cfg.dt, reaction_traj=self._reaction)
        return (w,)

    def mms_errors(self, state, adjoint, c):
        """Per-run max relative / Δx-weighted errors for u, c, p
        (advection_FCT_PDECO_alltime_exact.py:333-440)."""
        assert self.mms is not None
        cfg = self.cfg
        out = {}
        times = np.arange(cfg.num_steps + 1) * cfg.dt
        for nameq, traj, exact_fn in (
            ("u", np.asarray(state[0]), self.mms.uex),
            ("p", np.asarray(adjoint[0]), self.mms.pex),
            ("c", np.asarray(c), self.mms.cex),
        ):
            rels, weights = [], []
            for k, t in enumerate(times):
                ex = exact_fn(t)
                E = np.linalg.norm(traj[k] - ex)
                nrm = np.linalg.norm(ex)
                if nrm > 1e-12:
                    rels.append(E / nrm)
                weights.append(self.grid.h * E)
            out[nameq] = {"max_rel": max(rels), "max_weighted": max(weights)}
        return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--exact", action="store_true", help="manufactured-solution mode")
    ap.add_argument("--mms-variant", choices=["reference", "consistent"],
                    default="reference",
                    help="finaltime MMS construction (see MMSFinaltimeFields)")
    ap.add_argument("--linear-armijo", action="store_true",
                    help="w-equation linear-increment Armijo trials")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--dx", type=float, default=DEFAULTS["dx"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--backend",
                    choices=["xla", "pallas", "pallas_fused", "pallas_dist"],
                    default="xla",
                    help="sweep backend for the non-MMS problem (the "
                         "finaltime-exact MMS keeps XLA: its reaction term "
                         "needs the piecewise path)")
    ap.add_argument("--mixed-precision", action="store_true",
                    help="f32 sweeps + f64 objectives/norms (enables x64)")
    ap.add_argument("--spectral", action="store_true",
                    help="spectral-DCT preconditioning of the XLA-path Krylov solves")
    ap.add_argument("--armijo-batch", type=int, default=None,
                    help="evaluate N Armijo candidate steps per vmapped "
                         "sweep (same accepted-step sequence; default 4, a "
                         "measured 32%% PDECO wall-clock win on TPU; "
                         "linear-increment Armijo runs default to 1)")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    if args.armijo_batch is None:
        # batched trials are a measured 32% PDECO wall-clock win on TPU but
        # pure extra work on CPU (trials usually accept at the first step);
        # linear-increment Armijo keeps the sequential path (optimize/armijo)
        import jax

        args.armijo_batch = (4 if jax.default_backend() != "cpu"
                             and not getattr(args, "linear_armijo", False)
                             else 1)
    d = {**DEFAULTS, "optim": args.optim, "T": args.T, "dt": args.dt,
         "dx": args.dx, "beta": args.beta, "tol": args.tol,
         "max_iter_gd": args.max_iter_gd, "produce_plots": args.plots,
         "mixed_precision": args.mixed_precision,
         "spectral": args.spectral,
         "armijo_batch": args.armijo_batch}
    if args.optim == "alltime" or args.exact:
        d["T_data"] = args.T
    if args.exact and args.optim == "finaltime":
        # reference constants (advection_FCT_PDECO_finaltime_exact.py:34-58):
        # dx=0.05, dt=dx², T=0.1, β=0.1, c ∈ [0,1]; flags still override
        d["c_lower"], d["c_upper"] = 0.0, 1.0
        if args.beta == DEFAULTS["beta"]:
            d["beta"] = 0.1
        if args.dx == DEFAULTS["dx"]:
            d["dx"] = 0.05
        if args.T == DEFAULTS["T"]:
            d["T"] = 0.1
            d["T_data"] = d["T"]
        if args.dt == DEFAULTS["dt"]:
            d["dt"] = d["dx"] ** 2
    cfg = ExperimentConfig(**d)
    tagexact = "_exact" if args.exact else ""
    cfg.out_folder = args.out or f"Adv_{cfg.optim}{tagexact}_T{cfg.T}_beta{cfg.beta}"
    cfg.registry_csv = f"Adv_{cfg.optim}{tagexact}_simulation_results.csv"
    problem = AdvectionProblem(cfg, exact=args.exact, linear_armijo=args.linear_armijo,
                               mms_variant=args.mms_variant,
                               backend=args.backend)
    out = run_pdeco(problem, cfg)
    if args.exact:
        res = out["result"]
        errs = problem.mms_errors(res.state, res.adjoint, res.control)
        print("MMS error table:", errs)
        out["mms_errors"] = errs
    return out


if __name__ == "__main__":
    main()
