"""Mimura–Tsujikawa / feathers chemotaxis PDECO driver.

Reference: chemotaxis_mimura_FCT_PGD.py (final-time, target = stored t=14
pattern) and chemotaxis_mimura_FCT_PGD_alltime.py (all-time, target = the
first num_steps+1 frames of the stored trajectory with frame 0 replaced by
the IC, lines 108-117; dt=0.1, T=3dt, beta=1, c in [0, 1.5], lines 38-57).
The reference scripts are stale (deleted legacy helpers — SURVEY §0); this
driver re-expresses the problems on the current API with the MimuraModel
adjoint, keeping the inverse-crime setup self-consistent (targets generated
by the same model with the true control c=1).

``--legacy-m4`` runs the OLDER m(4-m)-form system verbatim
(old_helpers.py:87-111 builders + legacy-sign FCT, via
models/legacy_mimura.py) with the legacy script's constants
(chemotaxis_mimura_FCT_PGD.py:44-57: beta=1, c in [0, 1.5], dt=0.1, T=1,
delta=32, Dm=0.0625, Df=1, chi=8.5).

CLI:  python -m fem_fct_pdeco_tpu.drivers.mimura_pdeco [--optim alltime]
      [--legacy-m4]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.drivers.common import ExperimentConfig, PDECOProblem, run_pdeco
from fem_fct_pdeco_tpu.io import import_data_final
from fem_fct_pdeco_tpu.io.plots import plot_two_var_solution
from fem_fct_pdeco_tpu.models.mimura import MimuraModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.optimize import cost_functional, l2_norm_sq_q

# chemotaxis_mimura_FCT_PGD.py header: [0,16]^2, dx=1/8, dt=0.1, T=14 target
DEFAULTS = dict(
    a1=0.0, a2=16.0, dx=0.125, dt=0.1, T=2.0, T_data=14.0,
    beta=1e-2, c_lower=0.0, c_upper=5.0, tol=1e-3,
    max_iter_armijo=10, max_iter_gd=50,
)


class MimuraProblem(PDECOProblem):
    name = "Mimura"
    num_vars = 2

    def __init__(self, cfg: ExperimentConfig, backend: str = "xla",
                 legacy_m4: bool = False, dtype=None):
        super().__init__(cfg)
        from fem_fct_pdeco_tpu.drivers.common import resolve_dtype

        dtype, tol = resolve_dtype(dtype, cfg.mixed_precision)
        if legacy_m4:
            from fem_fct_pdeco_tpu.models.legacy_mimura import LegacyM4MimuraModel

            self.model = LegacyM4MimuraModel(
                self.grid, dtype=dtype, solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral))
        else:
            from fem_fct_pdeco_tpu.drivers.common import dist_mesh

            self.model = MimuraModel(self.grid, dtype=dtype,
                                     solver_opts=SolverOpts(tol=tol, spectral=cfg.spectral),
                                     backend=backend,
                                     mesh=dist_mesh(backend))
        md = self.model.dtype
        self._targets = tuple(t.astype(md) for t in self._load_targets())
        m0, f0 = self.model.ic()
        self._u0 = jnp.asarray(m0, dtype=md)
        self._v0 = jnp.asarray(f0, dtype=md)

    def _load_targets(self):
        cfg = self.cfg
        if cfg.optim == "alltime":
            return self._load_alltime_targets()
        # Prefer the stored reference fixtures when present (data/), else
        # generate with the current model.
        for base in (cfg.data_dir, "/root/reference/data"):
            pm = os.path.join(base, f"mimura_tsujikawa_t{cfg.T_data:g}_m.csv")
            pf = os.path.join(base, f"mimura_tsujikawa_t{cfg.T_data:g}_f.csv")
            if os.path.exists(pm) and os.path.exists(pf):
                break
        else:
            from fem_fct_pdeco_tpu.drivers.common import target_dir
            from fem_fct_pdeco_tpu.drivers.generate_targets import mimura

            tdir = target_dir(cfg, self.grid, min(cfg.dt, 1e-2))
            mimura(tdir, T=cfg.T_data, dt=min(cfg.dt, 1e-2),
                   a2=cfg.a2, dx=cfg.dx)
            pm = os.path.join(tdir, f"mimura_tsujikawa_t{cfg.T_data:g}_m.csv")
            pf = os.path.join(tdir, f"mimura_tsujikawa_t{cfg.T_data:g}_f.csv")
        return (
            jnp.asarray(import_data_final(pm, self.grid, num_steps=0)),
            jnp.asarray(import_data_final(pf, self.grid, num_steps=0)),
        )

    def _load_alltime_targets(self):
        """Target = full trajectory, frame 0 replaced by the IC
        (chemotaxis_mimura_FCT_PGD_alltime.py:108-117)."""
        cfg = self.cfg
        from fem_fct_pdeco_tpu.drivers.common import target_dir
        from fem_fct_pdeco_tpu.drivers.generate_targets import mimura_trajectory

        tdir = target_dir(cfg, self.grid, cfg.dt)
        pm = os.path.join(tdir, f"mimura_traj_m_T{cfg.T_data:g}.csv")
        pf = os.path.join(tdir, f"mimura_traj_f_T{cfg.T_data:g}.csv")
        if not (os.path.exists(pm) and os.path.exists(pf)):
            mimura_trajectory(tdir, T=cfg.T_data, dt=cfg.dt, a2=cfg.a2, dx=cfg.dx)
        steps = cfg.num_steps
        mhat = np.asarray(import_data_final(pm, self.grid, num_steps=steps, time_dep=True))
        fhat = np.asarray(import_data_final(pf, self.grid, num_steps=steps, time_dep=True))
        m0, f0 = self.model.ic()
        mhat[0], fhat[0] = m0, f0
        return jnp.asarray(mhat), jnp.asarray(fhat)

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

    def true_control_norm_sq(self):
        steps = self.cfg.num_steps
        ct = jnp.ones((steps + 1, self.grid.n, self.grid.n))
        return float(l2_norm_sq_q(ct, self.cfg.dt, self.model.M))

    def plot(self, it, state, adjoint, c):
        t0 = np.asarray(self._targets[0])
        t1 = np.asarray(self._targets[1])
        if self.cfg.optim == "alltime":  # plot the final target frame
            t0, t1 = t0[-1], t1[-1]
        plot_two_var_solution(
            np.asarray(state[0]), np.asarray(state[1]),
            np.asarray(adjoint[0]), np.asarray(adjoint[1]), np.asarray(c),
            t0, t1,
            self.cfg.T_data, it, self.cfg.dt, self.cfg.out_folder,
        )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--optim", choices=["finaltime", "alltime"], default="finaltime")
    ap.add_argument("--T", type=float, default=DEFAULTS["T"])
    ap.add_argument("--T-data", type=float, default=DEFAULTS["T_data"])
    ap.add_argument("--dt", type=float, default=DEFAULTS["dt"])
    ap.add_argument("--dx", type=float, default=DEFAULTS["dx"])
    ap.add_argument("--a2", type=float, default=DEFAULTS["a2"])
    ap.add_argument("--beta", type=float, default=DEFAULTS["beta"])
    ap.add_argument("--tol", type=float, default=DEFAULTS["tol"])
    ap.add_argument("--max-iter-gd", type=int, default=DEFAULTS["max_iter_gd"])
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--backend",
                    choices=["xla", "pallas", "pallas_fused", "pallas_dist"],
                    default="xla")
    ap.add_argument("--legacy-m4", action="store_true",
                    help="legacy m(4-m) system (old_helpers.py:87-111)")
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
    d = {**DEFAULTS, "optim": args.optim, "T": args.T, "T_data": args.T_data,
         "dt": args.dt, "dx": args.dx, "a2": args.a2, "beta": args.beta,
         "tol": args.tol, "max_iter_gd": args.max_iter_gd,
         "produce_plots": args.plots,
         "mixed_precision": args.mixed_precision,
         "spectral": args.spectral,
         "armijo_batch": args.armijo_batch}
    if args.legacy_m4:
        # legacy script config (chemotaxis_mimura_FCT_PGD.py:44-57)
        assert args.optim == "finaltime", "--legacy-m4 is final-time only"
        d["c_lower"], d["c_upper"] = 0.0, 1.5
        if args.beta == DEFAULTS["beta"]:
            d["beta"] = 1.0
        if args.T == DEFAULTS["T"]:
            d["T"] = 1.0
        if args.tol == DEFAULTS["tol"]:
            d["tol"] = 1e-2
    if args.optim == "alltime":
        # reference alltime config (chemotaxis_mimura_FCT_PGD_alltime.py:43-57):
        # beta=1, c in [0, 1.5], dt=0.1, T=3dt, tol=1e-2; target = own
        # trajectory over [0, T]
        d["c_lower"], d["c_upper"] = 0.0, 1.5
        if args.beta == DEFAULTS["beta"]:
            d["beta"] = 1.0
        if args.T == DEFAULTS["T"]:
            d["T"] = 3 * d["dt"]
        if args.tol == DEFAULTS["tol"]:
            d["tol"] = 1e-2
        d["T_data"] = d["T"]
    cfg = ExperimentConfig(**d)
    tag = "FT" if cfg.optim == "finaltime" else "AT"
    if args.legacy_m4:
        tag = "legacyM4_" + tag
    cfg.out_folder = args.out or f"Mimura_{tag}_T{cfg.T}_beta{cfg.beta}_tol{cfg.tol}"
    cfg.registry_csv = f"Mimura_{tag}_simulation_results.csv"
    return run_pdeco(
        MimuraProblem(cfg, backend=args.backend, legacy_m4=args.legacy_m4), cfg)


if __name__ == "__main__":
    main()
