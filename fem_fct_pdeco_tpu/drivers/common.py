"""Shared experiment harness for the PDECO drivers.

Replaces the reference's per-script boilerplate (the anatomy of e.g.
Schnak_FCT_PDECO_refactored.py: config constants, mesh setup, target import,
initial state/adjoint solves, the PGD loop, fail/restart bookkeeping, CSV
saves, results-registry row, progress plots) with one configurable runner.
Each driver module supplies a ``Problem`` adapter and its reference-default
config.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Callable

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.io import append_results_row, save_trajectory_csv
from fem_fct_pdeco_tpu.io.plots import plot_progress
from fem_fct_pdeco_tpu.optimize import (
    PGDConfig,
    l2_norm_sq_omega,
    l2_norm_sq_q,
    projected_gradient_descent,
)
from fem_fct_pdeco_tpu.utils.profiling import Timer


@dataclasses.dataclass
class ExperimentConfig:
    """Configuration fields shared by all PDECO drivers; defaults are each
    driver's responsibility (taken verbatim from the reference scripts)."""

    a1: float
    a2: float
    dx: float
    dt: float
    T: float
    T_data: float
    beta: float
    c_lower: float
    c_upper: float
    optim: str = "finaltime"
    tol: float = 1e-4
    max_iter_armijo: int = 10
    max_iter_gd: int = 50
    gam: float = 1e-4
    s0: float = 1.0
    out_folder: str = "out"
    data_dir: str = "data_generated"
    produce_plots: bool = False
    memory_telemetry: bool = False
    registry_csv: str | None = None
    checkpoint_path: str | None = None  # enable PGD save/resume
    # Armijo trial batching: evaluate this many candidate step sizes per
    # vmapped sweep (identical accepted-step sequence; optimize/armijo.py)
    armijo_batch: int = 1
    tag: str = ""
    # f32 sweeps + f64 objectives/norms (requires jax_enable_x64; see
    # optimize/cost.py). Drivers set this from --mixed-precision.
    mixed_precision: bool = False
    # spectral-DCT preconditioning of the XLA-path Krylov solves
    # (SolverOpts.spectral; the fused kernels carry their own in-kernel
    # variant). Drivers set this from --spectral.
    spectral: bool = False

    @property
    def num_steps(self) -> int:
        return round(self.T / self.dt)

    @property
    def num_steps_data(self) -> int:
        return round(self.T_data / self.dt)

    def grid(self) -> Grid:
        return Grid.from_spacing(self.a1, self.a2, self.dx)


def target_dir(cfg: "ExperimentConfig", grid, dt: float) -> str:
    """Per-configuration target-data directory: generated target files are
    only valid for one (grid, dt) pair, so cache them per config."""
    return os.path.join(cfg.data_dir, f"n{grid.n}_dt{dt:g}")


def resolve_dtype(dtype=None, mixed_precision: bool = False):
    """Model dtype + Krylov tolerance for the drivers.

    ``mixed_precision=True`` (the --mixed-precision flag): enable x64 and
    keep the sweeps f32; objectives/norms upcast to f64 through the
    problems' ``accum_dtype`` (optimize/cost.py) so Armijo decisions are
    parity-grade at f32 sweep speed."""
    import jax

    if mixed_precision:
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float32
    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tol = 1e-12 if dtype == jnp.float64 else 1e-6
    return dtype, tol


class PDECOProblem:
    """Adapter interface each driver implements around a model."""

    name = "problem"
    num_vars = 1

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        self.grid = cfg.grid()
        self.accum_dtype = jnp.float64 if cfg.mixed_precision else None

    # -- required hooks -------------------------------------------------
    def initial_control(self):
        n = self.grid.n
        dtype = getattr(getattr(self, "model", None), "dtype", None)
        return jnp.zeros((self.cfg.num_steps + 1, n, n), dtype=dtype)

    def solve_state(self, c):  # -> tuple of trajectories
        raise NotImplementedError

    def solve_state_batched(self, cs):
        """Batched state solves over a leading batch of controls (Armijo
        trial batching, optimize/armijo.py): one jit-cached vmap of
        ``solve_state`` with the model operators hoisted to arguments
        (ModelBase.hoist_wrap — closed-over stencils would otherwise be
        inlined as O(n²) constants)."""
        if getattr(self, "_batched_state_fn", None) is None:
            import jax

            def one(c):
                state = self.solve_state(c)
                return state if isinstance(state, tuple) else (state,)

            wrapper, opvals = self.model.hoist_wrap(jax.vmap(one))
            self._batched_state_fn = (jax.jit(wrapper), opvals)
        jfn, opvals = self._batched_state_fn
        return jfn(opvals(), (cs,))

    def solve_adjoint(self, state, c):  # -> tuple of adjoint trajectories
        raise NotImplementedError

    def descent_direction(self, c, state, adjoint):
        raise NotImplementedError

    def cost(self, state, c) -> float:
        raise NotImplementedError

    def targets(self) -> tuple:  # target fields used for misfit reporting
        raise NotImplementedError

    def mass(self):
        raise NotImplementedError

    def objective_mass(self, model):
        """Mass stencil for objectives/norms. Under mixed precision this is
        an f64-assembled mass (the f32 model stencil carries ~1e-8 rounding
        that would cap the objective accuracy); otherwise the model's own."""
        if self.accum_dtype is not None:
            if not hasattr(self, "_M_obj"):
                from fem_fct_pdeco_tpu.ops.assembly import P1Assembler

                self._M_obj = P1Assembler(self.grid, dtype=self.accum_dtype).mass
            return self._M_obj
        return model.M

    def true_control_norm_sq(self) -> float | None:
        return None

    def plot(self, it, state, adjoint, c):
        pass


def run_pdeco(problem: PDECOProblem, cfg: ExperimentConfig) -> dict:
    timer = Timer()
    Path(cfg.out_folder).mkdir(parents=True, exist_ok=True)

    M = problem.mass()
    dt = cfg.dt
    pgd_cfg = PGDConfig(
        beta=cfg.beta, tol=cfg.tol, max_iter_gd=cfg.max_iter_gd,
        max_iter_armijo=cfg.max_iter_armijo, c_lower=cfg.c_lower,
        c_upper=cfg.c_upper, gam=cfg.gam, s0=cfg.s0,
        checkpoint_path=cfg.checkpoint_path,
        armijo_batch=cfg.armijo_batch,
    )

    targets = problem.targets()
    ad = getattr(problem, "accum_dtype", None)

    def fidelity(state):
        out = {}
        for k, (traj, target) in enumerate(zip(state, targets)):
            if target is None:
                continue
            if cfg.optim == "finaltime":
                out[f"var{k+1}"] = float(
                    l2_norm_sq_omega(traj[-1] - target, M, accum_dtype=ad))
            else:
                out[f"var{k+1}"] = float(
                    l2_norm_sq_q(traj - target, dt, M, accum_dtype=ad))
        return out

    t_run0 = __import__("time").time()
    progress_path = os.path.join(cfg.out_folder, "progress.csv")

    def callback(it, info):
        print(
            f"it={it} cost={info['cost']:.6e} stop_crit={info['stop_crit']:.3e} "
            f"armijo_its={info['armijo_iters']}"
        )
        if cfg.memory_telemetry:
            # psutil RSS + device memory, the reference's telemetry surface
            # (advection_solidbody_FCT_PDECO_alltime.py:398-404) extended to
            # device stats
            from fem_fct_pdeco_tpu.utils.profiling import (
                device_memory_stats, host_memory_mb)

            print(f"  host RSS: {host_memory_mb():.1f} MB  "
                  f"device: {device_memory_stats()}")
        # per-iteration registry flush: one appended row per GD iteration so
        # a long run is observable (and post-mortem-able) while it executes
        hist = info["history"]
        fid = hist["fidelity"][-1] if hist["fidelity"] else {}
        mrs = hist.get("min_rowsum") or [float("nan")]
        append_results_row(progress_path, {
            "it": it,
            "cost": info["cost"],
            "stop_crit": info["stop_crit"],
            "armijo_its": info["armijo_iters"],
            "control_norm_sq": hist["control_norm_sq"][-1],
            **{f"misfit_{k}": v for k, v in fid.items()},
            "min_rowsum": mrs[-1],
            "elapsed_s": round(__import__("time").time() - t_run0, 2),
        })
        if cfg.produce_plots:
            # per-iteration solution panels AND progress plots — the
            # reference renders both every iteration
            # (Schnak_FCT_PDECO_refactored.py:232-239)
            problem.plot(it, info["state"], info["adjoint"], info["control"])
            if len(hist["cost"]) > 1:
                fe = [f.get("var1", float("nan")) for f in hist["fidelity"]]
                fe2 = (
                    [f.get("var2", float("nan")) for f in hist["fidelity"]]
                    if problem.num_vars == 2 else None
                )
                plot_progress(hist["cost"], fe, hist["control_norm_sq"],
                              it + 1, cfg.out_folder, fidelity_vals2=fe2)

    # linear problems provide state increments u(c + s d) = u(c) + s w via an
    # auxiliary sweep (advection_FCT_PDECO_finaltime.py:242-266), avoiding a
    # re-solve per Armijo trial
    lin = getattr(problem, "linear_increments", None)

    # always-on FCT safety telemetry (helpers.py:1784-1810 surfaced once per
    # GD iteration): min low-order row sum over every sweep the iteration
    # ran, warned on violation and recorded in progress.csv + the registry
    model = getattr(problem, "model", None)
    inv_fn = model.pop_invariants if model is not None else None

    with timer.phase("pgd"):
        res = projected_gradient_descent(
            config=pgd_cfg,
            c0=problem.initial_control(),
            solve_state=problem.solve_state,
            solve_adjoint=problem.solve_adjoint,
            descent_direction=problem.descent_direction,
            cost_fn=problem.cost,
            control_norm_sq=lambda c: l2_norm_sq_q(c, dt, M, accum_dtype=ad),
            fidelity_fn=fidelity,
            callback=callback,
            linear_increments=lin if getattr(problem, "use_linear_increments", False) else None,
            batched_solver=(problem.solve_state_batched
                            if cfg.armijo_batch > 1 else None),
            invariant_fn=inv_fn,
        )

    # ---- post-run artifacts (reference driver tail) --------------------
    area = (cfg.a2 - cfg.a1) ** 2
    eval_sim = float(l2_norm_sq_q(res.control, dt, M)) / (cfg.T * area)
    fid = fidelity(res.state)

    names = ["u", "v"][: problem.num_vars]
    for name, traj in zip(names, res.state):
        save_trajectory_csv(
            os.path.join(cfg.out_folder, f"{problem.name}_{name}.csv"), traj, problem.grid
        )
    for name, traj in zip(["p", "q"], res.adjoint):
        save_trajectory_csv(
            os.path.join(cfg.out_folder, f"{problem.name}_{name}.csv"), traj, problem.grid
        )
    save_trajectory_csv(
        os.path.join(cfg.out_folder, f"{problem.name}_c.csv"), res.control, problem.grid
    )

    if res.history["cost"]:
        fe = [f.get("var1", float("nan")) for f in res.history["fidelity"]]
        fe2 = (
            [f.get("var2", float("nan")) for f in res.history["fidelity"]]
            if problem.num_vars == 2 else None
        )
        plot_progress(res.history["cost"], fe, res.history["control_norm_sq"],
                      res.iterations, cfg.out_folder, fidelity_vals2=fe2)

    jtrue = problem.true_control_norm_sq()
    row = {
        "Sim. duration": round(res.duration, 2),
        "T": cfg.T, "T_data": cfg.T_data, "beta": cfg.beta, "tol": cfg.tol,
        "GD its": res.iterations,
        "Armijo its": res.history["armijo_iters"],
        "C_ad": f"[{cfg.c_lower}, {cfg.c_upper}]",
        "Mean c. in L^2(Q)^2": eval_sim,
        **{f"Misfit norm {k}": v for k, v in fid.items()},
        "J(c_true)": (cfg.beta / 2 * jtrue) if jtrue is not None else "",
        "min rowsum": (min(res.history.get("min_rowsum") or [float("nan")])),
        "status": res.status,
        "out_folder_name": cfg.out_folder,
    }
    if cfg.registry_csv:
        # A bare filename lands under out_folder so driver/test runs never
        # dirty the working tree; an explicit path (any directory
        # component, e.g. "./Chtx_FT_simulation_results.csv" for the
        # reference's repo-root registry layout) is honored verbatim.
        path = cfg.registry_csv
        if not os.path.dirname(path):
            path = os.path.join(cfg.out_folder, path)
        append_results_row(path, row)

    print("\nExit:")
    print(f"  status={res.status} iterations={res.iterations} cost={res.cost:.6e}")
    for k, v in fid.items():
        print(f"  misfit {k}: {v:.6e}")
    print(f"  average control in L^2(Q)^2: {eval_sim:.6e}")
    if jtrue is not None:
        print(f"  J(c_true) = {cfg.beta / 2 * jtrue:.6e}")
    print(f"  duration: {res.duration:.1f}s  phases: {timer.summary()}")
    return {"result": res, "registry_row": row}


def dist_mesh(backend: str):
    """1-D device mesh for the multi-chip RDMA backend (ops/pallas_dist.py
    runs per-device sweep kernels over the FIRST mesh axis); None for the
    single-device backends. Models fall back to XLA with a warning when the
    grid is not divisible by the device count."""
    if backend != "pallas_dist":
        return None
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), ("x",))
