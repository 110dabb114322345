"""FCT structural invariant diagnostics (reference helpers.py:1784-1810)."""

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
from fem_fct_pdeco_tpu.ops.fct import (
    artificial_diffusion,
    check_m_matrix_rowsums,
    low_order_matrix,
)


def test_m_matrix_check_passes_at_reference_dt():
    g = Grid(0.0, 1.0, 21)
    model = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0))
    A = model.A_state
    D = artificial_diffusion(A)
    Low = low_order_matrix(A, D, model.ML_diag, 1e-3)
    ok, up, lo = check_m_matrix_rowsums(
        np.asarray(Low), np.asarray(A), np.asarray(model.ML_diag)
    )
    assert ok


def test_m_matrix_check_reports_dt_bounds_on_violation():
    """A negative-row-sum matrix triggers the diagnostic with dt bounds
    (the reference prints admissible dt, helpers.py:1798-1809)."""
    g = Grid(0.0, 1.0, 11)
    model = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0))
    # reaction-dominated A with negative row sums at large dt
    A = model.A_state - 5.0 * model.M  # rowsums(A) ~ -5*rowsum(M) < 0
    D = artificial_diffusion(A)
    dt_big = 1e3
    Low = low_order_matrix(A, D, model.ML_diag, dt_big)
    ok, dt_upper, dt_lower = check_m_matrix_rowsums(
        np.asarray(Low), np.asarray(A), np.asarray(model.ML_diag)
    )
    assert not ok
    assert dt_upper is not None and dt_upper > 0
