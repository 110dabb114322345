"""Nonlinear reaction-advection PDECO driver.

Reference: nonlinear_FCT_PDECO_refactored.py (final-time; defaults below are
its constants at lines 38-65) and nonlinear_FCT_PDECO_alltime.py (all-time
via --optim alltime).

CLI:  python -m fem_fct_pdeco_tpu.drivers.nonlinear_pdeco [--optim finaltime]
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.io.plots import plot_nonlinear_solution
from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q


DEFAULTS = dict(
    a1=0.0, a2=1.0, dx=0.025, dt=1e-3, T=1.0, T_data=1.0,
    beta=1e-1, c_lower=-1.0, c_upper=1.0, tol=1e-4,
    max_iter_armijo=5, max_iter_gd=50,
)


class NonlinearProblem(PDECOProblem):
    name = "NL"
    num_vars = 1

    def __init__(self, cfg: ExperimentConfig, backend: str = "xla", dtype=None):
        super().__init__(cfg)
        from fem_fct_pdeco_tpu.drivers.common import dist_mesh, resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)
        self.model = NonlinearModel(self.grid, dtype=dtype,
                                    solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral),
                                    backend=backend, mesh=dist_mesh(backend))
        md = self.model.dtype
        self._target = self._load_target().astype(md)
        self._u0 = jnp.asarray(self.model.ic(), dtype=md)

    def _load_target(self):
        from fem_fct_pdeco_tpu.drivers.common import target_dir

        cfg = self.cfg
        tdir = target_dir(cfg, self.grid, cfg.dt)
        path = os.path.join(tdir, "advection.csv")
        if not os.path.exists(path):
            from fem_fct_pdeco_tpu.drivers.generate_targets import nonlinear

            nonlinear(tdir, T=max(cfg.T_data, cfg.T), dt=cfg.dt, dx=cfg.dx)
        if cfg.optim == "finaltime":
            return jnp.asarray(
                import_data_final(path, self.grid, num_steps=cfg.num_steps_data)
            )
        return jnp.asarray(
            import_data_final(path, self.grid, num_steps=cfg.num_steps, time_dep=True)
        )

    def mass(self):
        return self.objective_mass(self.model)

    def targets(self):
        return (self._target,)

    def solve_state(self, c):
        return self.model.forward(c, self._u0, self.cfg.dt)

    def solve_adjoint(self, state, c):
        return self.model.adjoint(state[0], self._target, self.cfg.dt, self.cfg.optim)

    use_discrete_gradient = False

    def descent_direction(self, c, state, adjoint):
        if self.use_discrete_gradient:
            # discretize-then-optimize: exact gradient of the discrete J via
            # jax.grad through the FCT scan (new capability; the reference
            # only has the continuous adjoint)
            import jax

            if not hasattr(self, "_grad_J"):
                u0 = jnp.asarray(self.model.ic())

                def J(ctrl):
                    from fem_fct_pdeco_tpu.optimize import cost_functional

                    (u,) = self.model.forward(ctrl, u0, self.cfg.dt)
                    return cost_functional(
                        u, self._target, ctrl, self.cfg.dt, self.model.M,
                        self.cfg.beta, self.cfg.optim,
                    )

                # hoist the model operators to jit arguments (see
                # ModelBase.hoist_wrap) — captured constants scale O(n²)
                wrapper, opvals = self.model.hoist_wrap(jax.grad(J))
                self._grad_J = (jax.jit(wrapper), opvals)
            jfn, opvals = self._grad_J
            return -jfn(opvals(), (c,))
        return self.model.descent_direction(self.cfg.beta, c, adjoint[0])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._target, c, self.cfg.dt, self.mass(), self.cfg.beta,
            self.cfg.optim, accum_dtype=self.accum_dtype,
        )

    def true_control_norm_sq(self):
        steps = self.cfg.num_steps
        ct = jnp.broadcast_to(
            jnp.asarray(self.model.true_control()), (steps + 1, self.grid.n, self.grid.n)
        )
        return float(l2_norm_sq_q(ct, self.cfg.dt, self.model.M))

    def plot(self, it, state, adjoint, c):
        plot_nonlinear_solution(
            np.asarray(state[0]), np.asarray(adjoint[0]), np.asarray(c),
            np.asarray(self._target if self.cfg.optim == "finaltime" else self._target[-1]),
            self.cfg.T_data, it, self.cfg.dt, self.cfg.out_folder,
        )


def build_config(**overrides) -> ExperimentConfig:
    d = {**DEFAULTS, **overrides}
    cfg = ExperimentConfig(**d)
    if not overrides.get("out_folder"):
        cfg.out_folder = (
            f"NL_{cfg.optim}_T{cfg.T}_Tdata{cfg.T_data}_beta{cfg.beta}"
            f"_Ca{cfg.c_lower}_Cb{cfg.c_upper}_tol{cfg.tol}"
        )
    if cfg.registry_csv is None:
        cfg.registry_csv = "NL_FT_simulation_results.csv" if cfg.optim == "finaltime" \
            else "NL_AT_simulation_results.csv"
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--dx", type=float, default=DEFAULTS["dx"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--backend",
                    choices=["xla", "pallas", "pallas_fused", "pallas_dist"],
                    default="xla")
    ap.add_argument("--discrete-gradient", action="store_true",
                    help="use the exact discrete gradient (jax.grad through "
                         "the FCT scan) instead of the continuous adjoint")
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
    cfg = build_config(
        optim=args.optim, T=args.T, T_data=args.T, dt=args.dt, dx=args.dx,
        beta=args.beta, tol=args.tol, max_iter_gd=args.max_iter_gd,
        produce_plots=args.plots, out_folder=args.out,
        checkpoint_path=args.checkpoint,
        mixed_precision=args.mixed_precision,
        spectral=args.spectral,
        armijo_batch=args.armijo_batch,
    )
    problem = NonlinearProblem(cfg, backend=args.backend)
    problem.use_discrete_gradient = args.discrete_gradient
    return run_pdeco(problem, cfg)


if __name__ == "__main__":
    main()
