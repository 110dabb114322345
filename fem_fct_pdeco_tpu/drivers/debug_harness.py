"""Standalone solver debug harnesses.

Equivalents of the reference's debug scripts:
- ``adjoint``: run the chemotaxis adjoint solver alone on synthetic states
  (chemotaxis_adjoint_equations.py:94-107 uses û = 1, v̂ = 2, u = 0.8·û).
- ``schnak``: run the Schnakenberg forward+adjoint weak forms side by side
  and print invariants (schnak_debug.py's role).
- ``fct-vs-direct``: FCT vs unstabilized direct solve on the advection
  benchmark (advection_generate_pattern_FCT.py:156-163's comparison).

CLI:  python -m fem_fct_pdeco_tpu.drivers.debug_harness <which>
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, solve_stencil


def adjoint_harness(n=41, steps=20, dt=5e-4):
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, n)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-12))
    uhat = jnp.ones((steps + 1, n, n))
    vhat = 2.0 * jnp.ones((steps + 1, n, n))
    u = 0.8 * uhat
    v = 0.8 * vhat
    c = jnp.full((steps + 1, n, n), model.params.gamma)
    p, q = model.adjoint(u, v, uhat[-1], vhat[-1], c, dt, "finaltime")
    print("adjoint harness: p range", float(p.min()), float(p.max()),
          "q range", float(q.min()), float(q.max()),
          "finite:", bool(jnp.isfinite(p).all() and jnp.isfinite(q).all()))
    return p, q


def schnak_harness(n=21, steps=10, dt=1e-3):
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, n)
    model = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-12))
    u0, v0 = model.ic()
    c = jnp.full((steps + 1, n, n), model.params.c_a)
    u, v = model.forward(c, jnp.asarray(u0), jnp.asarray(v0), dt)
    p, q = model.adjoint(u, v, u[-1] * 1.01, v[-1] * 1.01, dt)
    ML = model.ML_diag
    print("schnak harness: mass(u) drift",
          float(jnp.abs((ML * u[-1]).sum() - (ML * u[0]).sum())),
          "| u in", (float(u.min()), float(u.max())),
          "| p finite:", bool(jnp.isfinite(p).all()))
    return u, v, p, q


def fct_vs_direct(n=81, steps=100, dt=1e-3):
    """FCT vs unstabilized direct solve: the direct solution oscillates
    (goes out of [0, 1]); FCT preserves bounds."""
    from fem_fct_pdeco_tpu.models.advection import (
        AdvectionModel, rotation_drift_wind, slotted_cylinder_ic)
    from fem_fct_pdeco_tpu.ops import stencil as st

    g = Grid(-1.0, 1.0, n)
    model = AdvectionModel(g, eps=0.0, wind_fn=rotation_drift_wind(np.pi / 40),
                           solver_opts=SolverOpts(tol=1e-12))
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05))
    c = jnp.zeros((steps + 1, n, n))
    u_fct = model.forward(c, u0, dt)[-1]

    # unstabilized: [M + dt A] u^{n+1} = M u^n
    A = model.A_state
    Mat = model.M + dt * A
    u = u0
    for _ in range(steps):
        u = solve_stencil(Mat, st.apply(model.M, u), x0=u, opts=model.solver_opts)
    print(f"fct:    min={float(u_fct.min()):+.4f} max={float(u_fct.max()):.4f}")
    print(f"direct: min={float(u.min()):+.4f} max={float(u.max()):.4f}")
    return u_fct, u


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("which", choices=["adjoint", "schnak", "fct-vs-direct"])
    args = ap.parse_args(argv)
    {"adjoint": adjoint_harness, "schnak": schnak_harness,
     "fct-vs-direct": fct_vs_direct}[args.which]()


if __name__ == "__main__":
    main()
