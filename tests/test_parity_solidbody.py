"""Solid-body rotation benchmark parity (advection_solidbody_FCT.py).

MACHINE-LEVEL parity with the stored frames data/solidbody_t{0.25,0.5,1}_u.csv.
Provenance of the fixtures (established empirically, round 2):
- slit width 0.05 (the current script's commented-out value; 0.1 gives ~30%
  L2 difference),
- dt = deltax^2 = 6.25e-4 (the current script's commented-out value at line
  42, ``dt = 0.001 #deltax**2``; dt=1e-3 leaves a ~5% gap),
- the IC rasterized on ``np.arange(a1, a2+dx, dx)`` coordinates
  (advection_solidbody_FCT.py:56-58): float accumulation makes |X| > 0.05
  flip at 4 slit-boundary nodes relative to exact/linspace coordinates.
With those three inputs our FCT reproduces all three stored frames to
~1e-11 relative — the fixtures are EXACTLY this algorithm; the historical
"predates the current algorithm" hypothesis is dead (the legacy FCT_alg of
old_helpers.py:115-204 is algebraically identical under A -> -A, pinned by
test_fct.py::test_fct_step_matches_legacy_oracle).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.advection import (
    AdvectionModel,
    rotation_drift_wind,
    slotted_cylinder_ic,
)
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

DATA = "/root/reference/data"
DT_FIXTURE = 0.025**2  # deltax^2


def fixture_ic(grid, slit=0.05):
    """The IC exactly as the reference rasterized it: np.arange coordinates
    (float accumulation flips |X| > slit at 4 boundary nodes vs linspace)."""
    c = np.arange(grid.a1, grid.a2 + grid.h, grid.h)[: grid.n]
    X, Y = np.meshgrid(c, c)
    R = np.sqrt(X**2 + (Y - 1 / 3) ** 2)
    return np.where((R < 1 / 3) & ((np.abs(X) > slit) | (Y > 0.5)), 1.0, 0.0)


@pytest.fixture(scope="module")
def model():
    g = Grid(-1.0, 1.0, 81)
    return AdvectionModel(
        g, eps=0.0, wind_fn=rotation_drift_wind(np.pi / 40),
        solver_opts=SolverOpts(tol=1e-13),
    )


def _load(g, t):
    return g.field_from_dof(
        np.genfromtxt(f"{DATA}/solidbody_t{t:g}_u.csv", delimiter=","))


@pytest.mark.skipif(not os.path.isdir(DATA), reason="fixture unavailable")
def test_solidbody_restart_parity(model):
    """Stored t=0.25 frame advanced to t=0.5 matches the stored t=0.5 frame
    at machine level."""
    g = model.grid
    u25 = _load(g, 0.25)
    u50 = _load(g, 0.5)
    steps = round(0.25 / DT_FIXTURE)
    traj = model.forward(jnp.zeros((steps + 1, 81, 81)), jnp.asarray(u25), DT_FIXTURE)
    uT = np.asarray(traj[-1])
    rel = np.linalg.norm(uT - u50) / np.linalg.norm(u50)
    assert rel < 1e-10, f"L2 vs stored frame: {rel:.3e}"

    # FCT guarantees: bounds preservation + mass conservation
    assert uT.min() > -1e-10 and uT.max() < 1.0 + 1e-10
    ML = np.asarray(model.ML_diag)
    np.testing.assert_allclose((ML * uT).sum(), (ML * u25).sum(), rtol=1e-9)


@pytest.mark.skipif(not os.path.isdir(DATA), reason="fixture unavailable")
def test_solidbody_from_ic(model):
    """Full run from the slotted-cylinder IC reproduces the stored t=0.25
    frame at machine level."""
    g = model.grid
    ref = _load(g, 0.25)
    u0 = fixture_ic(g)
    steps = round(0.25 / DT_FIXTURE)
    traj = model.forward(jnp.zeros((steps + 1, 81, 81)), jnp.asarray(u0), DT_FIXTURE)
    uT = np.asarray(traj[-1])
    rel = np.linalg.norm(uT - ref) / np.linalg.norm(ref)
    assert rel < 1e-10, f"L2 vs stored t0.25 frame: {rel:.3e}"
    assert uT.min() > -1e-10 and uT.max() < 1.0 + 1e-10


@pytest.mark.skipif(not os.path.isdir(DATA), reason="fixture unavailable")
def test_slotted_cylinder_ic_matches_reference_rasterization(model):
    """Our linspace-based IC differs from the arange-based fixture IC only
    at the 4 known slit-boundary nodes (documented rasterization artifact)."""
    g = model.grid
    ours = slotted_cylinder_ic(g, 0.05)
    ref = fixture_ic(g, 0.05)
    assert int((ours != ref).sum()) == 4
