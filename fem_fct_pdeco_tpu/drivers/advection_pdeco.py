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


class AdvectionProblem(PDECOProblem):
    name = "Adv"
    num_vars = 1
    use_linear_increments = False  # set True for w-equation Armijo trials

    def __init__(self, cfg: ExperimentConfig, exact: bool = False,
                 linear_armijo: bool = False):
        super().__init__(cfg)
        self.exact = exact
        self.use_linear_increments = linear_armijo
        wf = vortex_wind(1.0) if exact else wind2
        self.wind_fn = wf
        self.model = AdvectionModel(self.grid, eps=EPS, wind_fn=wf,
                                    solver_opts=SolverOpts(tol=1e-12))
        steps = cfg.num_steps
        times = np.arange(steps + 1) * cfg.dt
        if exact:
            self.mms = MMSFields(self.grid, cfg.T, cfg.beta, cfg.c_lower, cfg.c_upper)
            self._u0 = jnp.asarray(self.mms.uex(0.0))
            self._g = jnp.asarray(np.stack([self.mms.g(t, EPS, wf) for t in times]))
            if cfg.optim == "alltime":
                self._target = jnp.asarray(
                    np.stack([self.mms.uhat(t, EPS, wf) for t in times])
                )
            else:
                self._target = jnp.asarray(self.mms.uhat(cfg.T, EPS, wf))
        else:
            self.mms = None
            from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

            X, Y = self.grid.xy
            self._u0 = jnp.asarray(5 * Y * (Y - 1) * X * (X - 1) * np.sin(4 * X * np.pi))
            self._g = None
            from fem_fct_pdeco_tpu.drivers.common import target_dir

            tdir = target_dir(cfg, self.grid, cfg.dt)
            path = os.path.join(tdir, "advection_u.csv")
            if not os.path.exists(path):
                from fem_fct_pdeco_tpu.drivers.generate_targets import advection_stripes

                advection_stripes(tdir, T=cfg.T_data, dt=cfg.dt, dx=cfg.dx)
            if cfg.optim == "finaltime":
                self._target = jnp.asarray(
                    import_data_final(path, self.grid, num_steps=cfg.num_steps_data)
                )
            else:
                self._target = jnp.asarray(
                    import_data_final(path, self.grid, num_steps=steps, time_dep=True)
                )

    def mass(self):
        return self.model.M

    def targets(self):
        return (self._target,)

    def solve_state(self, c):
        return (self.model.forward(c, self._u0, self.cfg.dt, source_traj=self._g),)

    def solve_adjoint(self, state, c):
        return (self.model.adjoint(state[0], self._target, self.cfg.dt, self.cfg.optim),)

    def descent_direction(self, c, state, adjoint):
        return self.model.descent_direction(self.cfg.beta, c, adjoint[0])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._target, c, self.cfg.dt, self.model.M,
            self.cfg.beta, self.cfg.optim,
        )

    def linear_increments(self, dk):
        """Auxiliary w-equation for linear-increment Armijo
        (advection_FCT_PDECO_finaltime.py:242-266): solve the state equation
        with rhs d and zero IC; then u(c + s d) = u(c) + s w."""
        w0 = jnp.zeros_like(self._u0)
        w = self.model.forward(dk, w0, self.cfg.dt)
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
    ap.add_argument("--linear-armijo", action="store_true",
                    help="w-equation linear-increment Armijo trials")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--dx", type=float, default=DEFAULTS["dx"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)
    d = {**DEFAULTS, "optim": args.optim, "T": args.T, "dt": args.dt,
         "dx": args.dx, "beta": args.beta, "tol": args.tol,
         "max_iter_gd": args.max_iter_gd, "produce_plots": args.plots}
    if args.optim == "alltime" or args.exact:
        d["T_data"] = args.T
    cfg = ExperimentConfig(**d)
    tagexact = "_exact" if args.exact else ""
    cfg.out_folder = args.out or f"Adv_{cfg.optim}{tagexact}_T{cfg.T}_beta{cfg.beta}"
    cfg.registry_csv = f"Adv_{cfg.optim}{tagexact}_simulation_results.csv"
    problem = AdvectionProblem(cfg, exact=args.exact, linear_armijo=args.linear_armijo)
    out = run_pdeco(problem, cfg)
    if args.exact:
        res = out["result"]
        errs = problem.mms_errors(res.state, res.adjoint, res.control)
        print("MMS error table:", errs)
        out["mms_errors"] = errs
    return out


if __name__ == "__main__":
    main()
