"""Parity vs the reference Mimura–Tsujikawa snapshot fixture.

The reference ships data/mimura_tsujikawa_t{14,30}_{m,f}.csv — flat
DoF-ordered 129² snapshots produced by an earlier configuration of
chemotaxis_mimura_FCT.py (a2=16, dx=1/8; the script's active config has
since drifted to the 51² painter-ptashnyk-headon one, see BASELINE.md).
Trajectory parity at t=14 is unpinnable in principle: ~1400 FCT steps of
chaotic pattern formation amplify solver-tolerance differences to O(1)
(the chemotaxis fixture is pinned at 10 steps for exactly this reason).

What IS checkable, and what the reference itself uses these CSVs for
(chemotaxis_mimura_FCT_PGD.py loads them as the PDECO targets û):

1. the closed-form vertex↔DoF permutation (Grid.field_from_dof,
   lexsort((i, j−i))) is correct at a THIRD grid size (129², after 41²
   chemotaxis and 81² solid-body) — a wrong permutation scrambles a
   smooth pattern field into node-scale noise, detected here via total
   variation;
2. the full driver target-loading path consumes the real reference CSVs
   (tests/test_drivers.py::test_mimura_driver_reference_fixture_targets).
"""

import os

import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid

FIXTURE_DIR = "/root/reference/data"


def _corr1(a):
    """Lag-1 spatial autocorrelation along rows."""
    return np.corrcoef(a[:-1, :].ravel(), a[1:, :].ravel())[0, 1]


@pytest.mark.skipif(
    not os.path.exists(os.path.join(FIXTURE_DIR, "mimura_tsujikawa_t14_m.csv")),
    reason="fixture unavailable")
@pytest.mark.parametrize("t", [14, 30])
@pytest.mark.parametrize("var", ["m", "f"])
def test_mimura_fixture_dof_order_129(t, var):
    n = 129
    g = Grid(0.0, 16.0, n)
    raw = np.genfromtxt(
        os.path.join(FIXTURE_DIR, f"mimura_tsujikawa_t{t}_{var}.csv"),
        delimiter=",")
    assert raw.shape == (n * n,)
    assert np.isfinite(raw).all()

    field = np.asarray(g.field_from_dof(raw))
    assert field.shape == (n, n)
    # biological densities: nonnegative up to limiter-scale undershoot
    assert field.min() > -1e-8 * max(1.0, field.max())

    # The correct permutation reconstructs a spatially coherent pattern
    # field: measured lag-1 autocorrelation is 0.68-0.96 across the four
    # snapshots, vs <= 0.24 for the naive DoF-order reshape and ~0 for a
    # random shuffle. (Total variation is NOT a sharp discriminator here:
    # the t=30 m spots are near node-scale.)
    c_good = _corr1(field)
    c_raw = _corr1(raw.reshape(n, n))
    assert c_good > 0.5, c_good
    assert c_good > 2.0 * abs(c_raw), (c_good, c_raw)

    # and the PNG the reference rendered next to the CSV shows a pattern
    # with O(1) dynamic range — sanity that we read the right data
    assert field.max() - field.min() > 1e-3
