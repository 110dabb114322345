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


def test_debug_mode_in_sweep_check_passes_at_reference_dt():
    """debug=True sweeps run the EVERY-STEP in-sweep row-sum check
    (helpers.py:1784-1810 equivalent) and pass at an admissible dt."""
    g = Grid(0.0, 1.0, 11)
    model = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0), debug=True)
    c = jnp.zeros((4, 11, 11))
    u0 = jnp.ones((11, 11))
    u = model.forward(c, u0, 1e-3)
    assert bool(jnp.isfinite(u).all())


def test_debug_mode_in_sweep_check_raises_with_dt_bounds():
    """An inadmissible dt raises from inside the jitted sweep with the
    admissible dt range in the message (reference prints it per step)."""
    import pytest

    from fem_fct_pdeco_tpu.ops.fct import check_m_matrix_rowsums

    g = Grid(0.0, 1.0, 11)
    model = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0), debug=True)
    # a reaction-dominated flux matrix with negative row sums: admissible dt
    # is bounded above; run far past the bound
    model.A_state = model.A_state - 5.0 * model.M
    dt_big = 10.0
    c = jnp.zeros((3, 11, 11))
    u0 = jnp.ones((11, 11))
    with pytest.raises(Exception, match="M-matrix row-sum"):
        model.forward(c, u0, dt_big)

    # the reported upper bound matches the eager host-side diagnostic
    from fem_fct_pdeco_tpu.ops.fct import artificial_diffusion, low_order_matrix

    A = model.A_state
    Low = low_order_matrix(A, artificial_diffusion(A), model.ML_diag, dt_big)
    ok, dt_upper, _ = check_m_matrix_rowsums(
        np.asarray(Low), np.asarray(A), np.asarray(model.ML_diag))
    assert not ok
    try:
        model.forward(jnp.zeros((3, 11, 11)), u0, dt_big)
    except Exception as e:
        msg = str(e)
    assert "dt_upper" in msg
    # the numeric bound appears in the formatted message
    import re

    nums = [float(x) for x in re.findall(r"dt_upper = ([-+0-9.eE]+)", msg)]
    assert nums and abs(nums[0] - dt_upper) / dt_upper < 1e-6
