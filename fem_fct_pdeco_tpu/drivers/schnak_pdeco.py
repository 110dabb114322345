"""Advective Schnakenberg PDECO driver.

Reference: Schnak_FCT_PDECO_refactored.py (final-time; constants at lines
43-88: dx=0.025, dt=1e-3, T=0.5, T_data=1, beta=1e-1, c in [0,10]) and
Schnak_FCT_PDECO_alltime.py (all-time with target subsampling).

CLI:  python -m fem_fct_pdeco_tpu.drivers.schnak_pdeco [--optim finaltime]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.io.plots import plot_two_var_solution
from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q

DEFAULTS = dict(
    a1=0.0, a2=1.0, dx=0.025, dt=1e-3, T=0.5, T_data=1.0,
    beta=1e-1, c_lower=0.0, c_upper=10.0, tol=1e-3,
    max_iter_armijo=10, max_iter_gd=50,
)


class SchnakProblem(PDECOProblem):
    name = "AdvSchnak"
    num_vars = 2

    def __init__(self, cfg: ExperimentConfig, rescaling: float = 1.0,
                 dt_data: float | None = None, td_wind: bool = False,
                 backend: str = "xla", dtype=None):
        super().__init__(cfg)
        # time-dependent vortex of Schnak_FCT_PDECO_alltime.py:56
        td_fn = None
        if td_wind:
            td_fn = lambda x, y, t: (
                -(y - 0.5) * jnp.sin(2 * jnp.pi * t),
                (x - 0.5) * jnp.sin(2 * jnp.pi * t),
            )
        from fem_fct_pdeco_tpu.drivers.common import dist_mesh, resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)
        self.model = SchnakenbergModel(
            self.grid, rescaling=rescaling, dtype=dtype,
            solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral),
            td_wind_fn=td_fn, backend=backend, mesh=dist_mesh(backend),
        )
        # target stored at dt_data resolution; subsample by skip = dt/dt_data
        # (Schnak_FCT_PDECO_alltime.py:45-48, 116-119)
        self.dt_data = dt_data or cfg.dt
        self.skip = round(cfg.dt / self.dt_data)
        md = self.model.dtype
        self._targets = tuple(t.astype(md) for t in self._load_targets())
        u0, v0 = self.model.ic()
        self._u0 = jnp.asarray(u0, dtype=md)
        self._v0 = jnp.asarray(v0, dtype=md)

    def _load_targets(self):
        from fem_fct_pdeco_tpu.drivers.common import target_dir

        cfg = self.cfg
        tdir = target_dir(cfg, self.grid, self.dt_data)
        pu = os.path.join(tdir, "schnak_u.csv")
        pv = os.path.join(tdir, "schnak_v.csv")
        if not (os.path.exists(pu) and os.path.exists(pv)):
            from fem_fct_pdeco_tpu.drivers.generate_targets import schnakenberg

            schnakenberg(tdir, T=max(cfg.T_data, cfg.T), dt=self.dt_data,
                         dx=cfg.dx)
        if cfg.optim == "finaltime":
            k = round(cfg.T_data / self.dt_data)
            return (
                jnp.asarray(import_data_final(pu, self.grid, num_steps=k)),
                jnp.asarray(import_data_final(pv, self.grid, num_steps=k)),
            )
        k = round(cfg.T / self.dt_data)
        u = import_data_final(pu, self.grid, num_steps=k, time_dep=True)[:: self.skip]
        v = import_data_final(pv, self.grid, num_steps=k, time_dep=True)[:: self.skip]
        return jnp.asarray(u), jnp.asarray(v)

    def mass(self):
        return self.objective_mass(self.model)

    def targets(self):
        return self._targets

    def solve_state(self, c):
        return self.model.forward(c, self._u0, self._v0, self.cfg.dt)

    def solve_adjoint(self, state, c):
        if self.cfg.optim == "alltime":
            return self.model.adjoint(
                state[0], state[1], self._targets[0], self._targets[1],
                self.cfg.dt, "alltime",
            )
        return self.model.adjoint(
            state[0], state[1], self._final_target(0), self._final_target(1), self.cfg.dt
        )

    def _final_target(self, k):
        t = self._targets[k]
        return t if t.ndim == 2 else t[-1]

    def descent_direction(self, c, state, adjoint):
        return self.model.descent_direction(self.cfg.beta, c, adjoint[0])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._targets[0], c, self.cfg.dt, self.mass(),
            self.cfg.beta, self.cfg.optim,
            var2_traj=state[1], var2_target=self._targets[1],
            accum_dtype=self.accum_dtype,
        )

    def true_control_norm_sq(self):
        steps = self.cfg.num_steps
        ct = jnp.full((steps + 1, self.grid.n, self.grid.n), self.model.params.c_a)
        return float(l2_norm_sq_q(ct, self.cfg.dt, self.model.M))

    def plot(self, it, state, adjoint, c):
        plot_two_var_solution(
            np.asarray(state[0]), np.asarray(state[1]),
            np.asarray(adjoint[0]), np.asarray(adjoint[1]), np.asarray(c),
            np.asarray(self._final_target(0)), np.asarray(self._final_target(1)),
            self.cfg.T_data, it, self.cfg.dt, self.cfg.out_folder,
        )


def build_config(**overrides) -> ExperimentConfig:
    d = {**DEFAULTS, **overrides}
    cfg = ExperimentConfig(**d)
    if not overrides.get("out_folder"):
        cfg.out_folder = (
            f"Sch_{cfg.optim}_T{cfg.T}_Tdata{cfg.T_data}_beta{cfg.beta}"
            f"_Ca{cfg.c_lower}_Cb{cfg.c_upper}_tol{cfg.tol}"
        )
    if cfg.registry_csv is None:
        cfg.registry_csv = "AdvSchnak_FT_simulation_results.csv" \
            if cfg.optim == "finaltime" else "AdvSchnak_AT_simulation_results.csv"
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--td-wind", action="store_true",
                    help="time-dependent sin(2πt) vortex wind")
    ap.add_argument("--dt-data", type=float, default=None,
                    help="target data resolution; subsample by dt/dt_data")
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
    ap.add_argument("--mixed-precision", action="store_true",
                    help="f32 sweeps + f64 objectives/norms (enables x64)")
    ap.add_argument("--spectral", action="store_true",
                    help="spectral-DCT preconditioning of the XLA-path Krylov solves")
    ap.add_argument("--checkpoint", default=None,
                    help="path for PGD save/resume state")
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
    T_data = args.T_data
    if T_data is None:
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
    return run_pdeco(SchnakProblem(cfg, dt_data=args.dt_data,
                                   td_wind=args.td_wind, backend=args.backend), cfg)


if __name__ == "__main__":
    main()
