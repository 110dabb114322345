"""Drift-velocity control PDECO driver (solid-body rotation).

Reference: advection_solidbody_FCT_PDECO_finaltime.py (final-time; drift
m=(1,1), rotation ω=π/40, target = stored solid-body frame at T) and
advection_solidbody_FCT_PDECO_alltime.py (all-time over a Gaussian-drift
trajectory). The --garvie flag uses the Garvie ordering of the sweeps
(adjoint with previous control first, then provisional update, then state —
advection_solidbody_FCT_PDECO_finaltime_Garvie.py:172-296).

CLI:  python -m fem_fct_pdeco_tpu.drivers.solidbody_pdeco [--optim finaltime]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.models.advection import DriftControlModel, slotted_cylinder_ic
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q
from fem_fct_pdeco_tpu.optimize.cost import rel_err

DEFAULTS = dict(
    a1=-1.0, a2=1.0, dx=0.025, dt=1e-3, T=0.25, T_data=0.25,
    beta=1.0, c_lower=0.0, c_upper=5.0, tol=1e-4,
    max_iter_armijo=5, max_iter_gd=50,
)
OM = np.pi / 40


class SolidBodyProblem(PDECOProblem):
    name = "SolidBody"
    num_vars = 1

    def __init__(self, cfg: ExperimentConfig, gaussian: bool = False,
                 dtype=None, backend: str = "xla"):
        super().__init__(cfg)
        from fem_fct_pdeco_tpu.drivers.common import dist_mesh, resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)
        self.gaussian = gaussian
        self.model = DriftControlModel(
            self.grid, eps=0.0, om=OM, drift=(1.0, 1.0), dtype=dtype,
            solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral), backend=backend,
            mesh=dist_mesh(backend),
        )
        md = self.model.dtype
        if gaussian:
            X, Y = self.grid.xy
            self._u0 = jnp.asarray(
                np.exp(-20.0 * ((X + 2 / 3) ** 2 + 5.0 * (Y + 5 / 6) ** 2)),
                dtype=md,
            )
        else:
            self._u0 = jnp.asarray(slotted_cylinder_ic(self.grid, 0.05),
                                   dtype=md)
        self._target = self._load_target().astype(md)

    def _load_target(self):
        cfg = self.cfg
        from fem_fct_pdeco_tpu.drivers.common import target_dir

        tdir = target_dir(cfg, self.grid, cfg.dt)
        if self.gaussian:
            path = os.path.join(tdir, f"gaussian_u_T{cfg.T_data:g}.csv")
            if not os.path.exists(path):
                from fem_fct_pdeco_tpu.drivers.generate_targets import gaussian_drift

                gaussian_drift(tdir, T=cfg.T_data, dt=cfg.dt, dx=cfg.dx)
            if cfg.optim == "alltime":
                return jnp.asarray(import_data_final(
                    path, self.grid, num_steps=cfg.num_steps, time_dep=True))
            return jnp.asarray(import_data_final(
                path, self.grid, num_steps=cfg.num_steps_data))
        # slotted cylinder: prefer the stored reference frame
        for base in ("/root/reference/data", tdir):
            path = os.path.join(base, f"solidbody_t{cfg.T_data:g}_u.csv")
            if os.path.exists(path):
                return jnp.asarray(import_data_final(path, self.grid, num_steps=0))
        from fem_fct_pdeco_tpu.drivers.generate_targets import solidbody

        solidbody(tdir, T=cfg.T_data, dt=cfg.dt, dx=cfg.dx)
        path = os.path.join(tdir, f"solidbody_t{cfg.T_data:g}_u.csv")
        return jnp.asarray(import_data_final(path, self.grid, num_steps=0))

    def mass(self):
        return self.objective_mass(self.model)

    def targets(self):
        return (self._target,)

    def solve_state(self, c):
        return (self.model.forward(c, self._u0, self.cfg.dt),)

    def solve_adjoint(self, state, c):
        return (self.model.adjoint(
            state[0], self._target, c, self.cfg.dt, self.cfg.optim),)

    def descent_direction(self, c, state, adjoint):
        return self.model.descent_direction(self.cfg.beta, c, state[0], adjoint[0])

    def cost(self, state, c):
        return cost_functional(
            state[0], self._target, c, self.cfg.dt, self.mass(),
            self.cfg.beta, self.cfg.optim, accum_dtype=self.accum_dtype,
        )


def run_garvie(problem: SolidBodyProblem, cfg: ExperimentConfig) -> dict:
    """Garvie-ordered PGD: adjoint (with previous control) -> descent
    direction -> provisional control update with s0 -> state solve -> inline
    Armijo halving (advection_solidbody_FCT_PDECO_finaltime_Garvie.py:172-296).
    """
    import time as _time

    t0 = _time.time()
    ck = problem.initial_control()
    state = problem.solve_state(ck)
    cost_old = float(problem.cost(state, ck))
    history = {"cost": [cost_old], "armijo_iters": [], "fidelity": [],
               "control_norm_sq": []}
    it, status = 0, "max_iterations"
    while it < cfg.max_iter_gd:
        adj = problem.solve_adjoint(state, ck)
        dk = problem.descent_direction(ck, state, adj)
        s = cfg.s0
        accepted = False
        for k in range(cfg.max_iter_armijo):
            c_new = jnp.clip(ck + s * dk, cfg.c_lower, cfg.c_upper)
            state_new = problem.solve_state(c_new)
            cost_new = float(problem.cost(state_new, c_new))
            cdiff = float(l2_norm_sq_q(c_new - ck, cfg.dt, problem.mass()))
            if cost_new - cost_old <= -cfg.gam / s * cdiff:
                accepted = True
                break
            s /= 2.0
        history["armijo_iters"].append(k + 1)
        if not accepted:
            status = "armijo_fail"
            break
        stop = rel_err(cost_new, cost_old)
        ck, state, cost_old = c_new, state_new, cost_new
        history["cost"].append(cost_new)
        it += 1
        if stop < cfg.tol:
            status = "converged"
            break
    adj = problem.solve_adjoint(state, ck)
    from fem_fct_pdeco_tpu.optimize.pgd import PGDResult

    res = PGDResult(control=ck, state=state, adjoint=adj, cost=cost_old,
                    iterations=it, status=status, history=history,
                    duration=_time.time() - t0)
    print(f"Garvie PGD: status={res.status} its={it} cost={cost_old:.6e}")
    return {"result": res, "registry_row": {}}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--gaussian", action="store_true",
                    help="Gaussian-drift target (alltime reference setup)")
    ap.add_argument("--garvie", action="store_true", help="Garvie sweep ordering")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--mixed-precision", action="store_true",
                    help="f32 sweeps + f64 objectives/norms (enables x64)")
    ap.add_argument("--spectral", action="store_true",
                    help="spectral-DCT preconditioning of the XLA-path Krylov solves")
    ap.add_argument("--backend",
                    choices=["xla", "pallas", "pallas_fused", "pallas_dist"],
                    default="xla")
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
    d = {**DEFAULTS, "optim": args.optim, "T": args.T, "T_data": args.T,
         "dt": args.dt, "beta": args.beta, "tol": args.tol,
         "max_iter_gd": args.max_iter_gd,
         "mixed_precision": args.mixed_precision,
         "spectral": args.spectral,
         "armijo_batch": args.armijo_batch}
    cfg = ExperimentConfig(**d)
    tag = "_garvie" if args.garvie else ""
    cfg.out_folder = args.out or f"SolidBody_{cfg.optim}{tag}_T{cfg.T}_beta{cfg.beta}"
    cfg.registry_csv = f"SolidBody_{cfg.optim}_simulation_results.csv"
    problem = SolidBodyProblem(cfg, gaussian=args.gaussian,
                               backend=args.backend)
    if args.garvie:
        return run_garvie(problem, cfg)
    return run_pdeco(problem, cfg)


if __name__ == "__main__":
    main()
