"""Parity vs the stored reference trajectory fixture.

The fixture Chtxs_data_dx0.025_dt0.001/chtxs_{m,f}_t0.01.csv is the full
11-frame trajectory of the chemotaxis system on a 41^2 mesh (dt = 1e-3,
control = 100, rescaling = 1), produced by the reference's dolfin/SciPy stack
(chemotaxis_generate_pattern_FCT.py + helpers.solve_chtxs_system).

This exercises the whole stack end-to-end: P1 assembly (incl. the
exp(-eta u) chemotaxis quadrature), the implicit v-solve, FCT with the
Zalesak limiter, and DoF-ordering interop. Measured parity is ~5e-13
relative over 10 steps — the collapsed Gauss rules reproduce FFC's
quadrature to machine precision even on the exp terms.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

FIXTURE_DIR = "/root/reference/Chtxs_data_dx0.025_dt0.001"


@pytest.mark.skipif(not os.path.isdir(FIXTURE_DIR), reason="fixture unavailable")
def test_chemotaxis_trajectory_parity():
    n, steps, dt = 41, 10, 1e-3
    g = Grid(0.0, 1.0, n)
    ref_m = np.genfromtxt(os.path.join(FIXTURE_DIR, "chtxs_m_t0.01.csv"), delimiter=",")
    ref_f = np.genfromtxt(os.path.join(FIXTURE_DIR, "chtxs_f_t0.01.csv"), delimiter=",")
    ref_m = g.field_from_dof(ref_m.reshape(steps + 1, n * n))
    ref_f = g.field_from_dof(ref_f.reshape(steps + 1, n * n))

    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    u0, v0 = model.ic()
    np.testing.assert_array_equal(u0, ref_m[0])

    control = jnp.full((steps + 1, n, n), model.params.gamma, dtype=jnp.float64)
    u_traj, v_traj = model.forward(control, jnp.asarray(u0), jnp.asarray(v0), dt)
    u_traj, v_traj = np.asarray(u_traj), np.asarray(v_traj)

    for k in range(1, steps + 1):
        for got, want, name in ((u_traj, ref_m, "m"), (v_traj, ref_f, "f")):
            denom = np.linalg.norm(want[k])
            rel = np.linalg.norm(got[k] - want[k]) / denom
            assert rel < 1e-10, f"frame {k} var {name}: rel err {rel:.3e}"
