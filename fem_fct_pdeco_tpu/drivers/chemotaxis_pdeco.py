"""Chemotaxis (Keller–Segel) PDECO driver.

Reference: chemotaxis_FCT_PDECO_refactored.py (final-time; constants at its
header: dx=0.025, dt=5e-4, T=0.1, beta=1e-4, c in [0,20], rescaling 1/10)
and chemotaxis_FCT_PDECO_AT_refactored.py (all-time).

CLI:  python -m fem_fct_pdeco_tpu.drivers.chemotaxis_pdeco [--optim finaltime]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.io.plots import plot_two_var_solution
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q

DEFAULTS = dict(
    a1=0.0, a2=1.0, dx=0.025, dt=5e-4, T=0.1, T_data=0.5,
    beta=1e-4, c_lower=0.0, c_upper=20.0, tol=1e-3,
    max_iter_armijo=10, max_iter_gd=50,
)
RESCALING = 1.0 / 10.0  # chemotaxis_FCT_PDECO_refactored.py rescaling r


class ChemotaxisProblem(PDECOProblem):
    name = "Chtxs"
    num_vars = 2
    use_linear_increments = False  # set by --linear-armijo

    def __init__(self, cfg: ExperimentConfig, rescaling: float = RESCALING,
                 backend: str = "xla", dtype=None, linear_armijo: bool = False,
                 quad_degree: int = 4):
        self.use_linear_increments = linear_armijo
        super().__init__(cfg)
        from fem_fct_pdeco_tpu.drivers.common import dist_mesh, resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)

        self.model = ChemotaxisModel(
            self.grid, rescaling=rescaling, dtype=dtype,
            solver_opts=SolverOpts(tol=tol, maxiter=300, spectral=cfg.spectral), backend=backend,
            mesh=dist_mesh(backend), quad_degree=quad_degree,
        )
        # everything the sweeps touch lives in the MODEL dtype (under
        # mixed precision x64 is on, so bare asarray would produce f64)
        md = self.model.dtype
        self._targets = tuple(t.astype(md) for t in self._load_targets())
        u0, v0 = self.model.ic()
        self._u0 = jnp.asarray(u0, dtype=md)
        self._v0 = jnp.asarray(v0, dtype=md)

    def _load_targets(self):
        from fem_fct_pdeco_tpu.drivers.common import target_dir

        cfg = self.cfg
        tdir = target_dir(cfg, self.grid, cfg.dt)
        pm = os.path.join(tdir, f"chtxs_m_t{cfg.T_data:g}.csv")
        pf = os.path.join(tdir, f"chtxs_f_t{cfg.T_data:g}.csv")
        if not (os.path.exists(pm) and os.path.exists(pf)):
            from fem_fct_pdeco_tpu.drivers.generate_targets import chemotaxis

            chemotaxis(tdir, T=cfg.T_data, dt=cfg.dt, dx=cfg.dx)
        if cfg.optim == "finaltime":
            k = cfg.num_steps_data
            return (
                jnp.asarray(import_data_final(pm, self.grid, num_steps=k)),
                jnp.asarray(import_data_final(pf, self.grid, num_steps=k)),
            )
        k = cfg.num_steps
        return (
            jnp.asarray(import_data_final(pm, self.grid, num_steps=k, time_dep=True)),
            jnp.asarray(import_data_final(pf, self.grid, num_steps=k, time_dep=True)),
        )

    def mass(self):
        return self.objective_mass(self.model)

    def targets(self):
        return self._targets

    def solve_state(self, c):
        return self.model.forward(c, self._u0, self._v0, self.cfg.dt)

    def solve_adjoint(self, state, c):
        return self.model.adjoint(
            state[0], state[1], self._targets[0], self._targets[1], c,
            self.cfg.dt, self.cfg.optim,
        )

    def descent_direction(self, c, state, adjoint):
        return self.model.descent_direction(self.cfg.beta, c, state[0], adjoint[1])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._targets[0], c, self.cfg.dt, self.mass(),
            self.cfg.beta, self.cfg.optim,
            var2_traj=state[1], var2_target=self._targets[1],
            accum_dtype=self.accum_dtype,
        )

    def linear_increments(self, dk):
        """Legacy coupled-system linear-increment Armijo
        (chemotaxis_FCT_PDECO.py:240-276): the auxiliary (w_m, w_f) sweep is
        the state system itself driven by the descent direction d from the
        state initial conditions (w_mk = np.copy(mk), line 129; the w_f/w_m
        update equations at 260-269 are the v/u state updates with c -> d);
        Armijo then evaluates the trial states u + s w_u, v + s w_v. The
        PGD driver re-solves the state at the accepted control before the
        adjoint (the FCT limiter is nonlinear, so the increment state is an
        Armijo-trial approximation only)."""
        return self.model.forward(dk, self._u0, self._v0, self.cfg.dt)

    def true_control_norm_sq(self):
        steps = self.cfg.num_steps
        ct = jnp.full((steps + 1, self.grid.n, self.grid.n), self.model.params.gamma)
        return float(l2_norm_sq_q(ct, self.cfg.dt, self.model.M))

    def plot(self, it, state, adjoint, c):
        t0 = self._targets[0] if self.cfg.optim == "finaltime" else self._targets[0][-1]
        t1 = self._targets[1] if self.cfg.optim == "finaltime" else self._targets[1][-1]
        plot_two_var_solution(
            np.asarray(state[0]), np.asarray(state[1]),
            np.asarray(adjoint[0]), np.asarray(adjoint[1]), np.asarray(c),
            np.asarray(t0), np.asarray(t1), self.cfg.T_data, it, self.cfg.dt,
            self.cfg.out_folder, optim="finaltime",
        )


def build_config(**overrides) -> ExperimentConfig:
    d = {**DEFAULTS, **overrides}
    cfg = ExperimentConfig(**d)
    if not overrides.get("out_folder"):
        cfg.out_folder = (
            f"Chtxs_{cfg.optim}_T{cfg.T}_Tdata{cfg.T_data}_beta{cfg.beta}"
            f"_Ca{cfg.c_lower}_Cb{cfg.c_upper}_tol{cfg.tol}"
        )
    if cfg.registry_csv is None:
        cfg.registry_csv = ("Chtx_FT" if cfg.optim == "finaltime" else "Chtx_AT") + \
            "_simulation_results.csv"
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--T-data", type=float, default=None)
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--dx", type=float, default=DEFAULTS["dx"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--backend",
                    choices=["xla", "pallas", "pallas_fused", "pallas_dist"],
                    default="xla")
    ap.add_argument("--linear-armijo", action="store_true",
                    help="legacy coupled-system (w_m, w_f) linear-increment "
                         "Armijo trials (chemotaxis_FCT_PDECO.py:240-276)")
    ap.add_argument("--mixed-precision", action="store_true",
                    help="f32 sweeps + f64 objectives/norms (enables x64; "
                         "parity-grade Armijo decisions at f32 sweep speed)")
    ap.add_argument("--spectral", action="store_true",
                    help="spectral-DCT preconditioning of the XLA-path Krylov solves")
    ap.add_argument("--checkpoint", default=None,
                    help="path for PGD save/resume state")
    ap.add_argument("--armijo-batch", type=int, default=None,
                    help="evaluate N Armijo candidate steps per vmapped "
                         "sweep (same accepted-step sequence; default 4, a "
                         "measured 32%% PDECO wall-clock win on TPU; "
                         "linear-increment Armijo runs default to 1)")
    ap.add_argument("--quad-degree", type=int, default=4,
                    help="quadrature degree for the forward transport "
                         "assembly (4 = reference parity; 2 = fast path, "
                         "fewer in-kernel exp evaluations)")
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
    T_data = args.T_data
    if T_data is None:
        # all-time tracks the trajectory over [0, T]; final-time tracks a
        # stored pattern at T_data (reference default 0.5)
        T_data = args.T if args.optim == "alltime" else DEFAULTS["T_data"]
    cfg = build_config(
        optim=args.optim, T=args.T, T_data=T_data, dt=args.dt, dx=args.dx,
        beta=args.beta, tol=args.tol, max_iter_gd=args.max_iter_gd,
        produce_plots=args.plots, out_folder=args.out,
        checkpoint_path=args.checkpoint,
        mixed_precision=args.mixed_precision,
        spectral=args.spectral,
        armijo_batch=args.armijo_batch,
    )
    problem = ChemotaxisProblem(cfg, backend=args.backend,
                                linear_armijo=args.linear_armijo,
                                quad_degree=args.quad_degree)
    return run_pdeco(problem, cfg)


if __name__ == "__main__":
    main()
