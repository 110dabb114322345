"""Parity and routing tests for the HBM-streamed XXL forward kernels
(ops/pallas_xxl.py) — the >= 2048^2 single-chip tier, exercised here in
interpret mode at a small grid with ``force_xxl``."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


def _pair(n=64, dtype=jnp.float64, tol=1e-10):
    g = Grid(0.0, 1.0, n)
    mx = ChemotaxisModel(
        g, rescaling=1.0, dtype=dtype,
        solver_opts=SolverOpts(tol=tol, maxiter=400, spectral=True),
        backend="xla")
    mf = ChemotaxisModel(
        g, rescaling=1.0, dtype=dtype,
        solver_opts=SolverOpts(tol=tol, maxiter=400),
        backend="pallas_fused")
    mf.force_xxl = True
    assert mf._use_xxl_sweep()
    return g, mx, mf


def test_xxl_forward_parity_vs_xla():
    """The streamed banded kernel reproduces the XLA FCT sweep (same math
    as helpers.py:1321-1385) to solver tolerance, including the always-on
    min-rowsum telemetry."""
    n, steps, dt = 64, 4, 1e-3
    g, mx, mf = _pair(n)
    u0np, v0np = mx.ic()
    u0 = jnp.asarray(u0np, jnp.float64)
    v0 = jnp.asarray(v0np, jnp.float64)
    c = jnp.full((steps + 1, n, n), mx.params.gamma, jnp.float64)
    ux, vx = mx.forward(c, u0, v0, dt)
    sx = mx.last_invariants
    uf, vf = mf.forward(c, u0, v0, dt)
    sf = mf.last_invariants
    assert np.isfinite(np.asarray(uf)).all()
    rel_u = float(jnp.abs(uf - ux).max() / jnp.abs(ux).max())
    rel_v = float(jnp.abs(vf - vx).max() / jnp.abs(vx).max())
    assert rel_u < 1e-7, rel_u
    assert rel_v < 1e-7, rel_v
    # telemetry: both backends report the same min low-order row sum
    assert sx is not None and sf is not None
    assert abs(sf["min_rowsum"] - sx["min_rowsum"]) < 1e-9 + 1e-5 * abs(
        sx["min_rowsum"])


def test_xxl_adjoint_routes_to_xla_step():
    """The XXL tier is forward-only: the adjoint maker must come back to
    the XLA step path (every fused adjoint tier exceeds VMEM at XXL grid
    sizes) and still produce a finite, XLA-parity sweep."""
    n, steps, dt = 64, 3, 1e-3
    g, mx, mf = _pair(n)
    u0np, v0np = mx.ic()
    u0 = jnp.asarray(u0np, jnp.float64)
    v0 = jnp.asarray(v0np, jnp.float64)
    c = jnp.full((steps + 1, n, n), mx.params.gamma, jnp.float64)
    u, v = mx.forward(c, u0, v0, dt)
    uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    px, qx = mx.adjoint(u, v, uhat, vhat, c, dt, "finaltime")
    pf, qf = mf.adjoint(u, v, uhat, vhat, c, dt, "finaltime")
    rel = float(jnp.abs(pf - px).max() / (jnp.abs(px).max() + 1e-300))
    assert rel < 1e-7, rel


def test_xxl_routing_thresholds():
    """2048^2 f32 exceeds the XL VMEM slot file and lands in the XXL
    feasibility window; the reaction-hook families stay off the tier."""
    from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem_xl
    from fem_fct_pdeco_tpu.ops.pallas_xxl import fits_hbm_xxl

    assert not fits_vmem_xl(2048, jnp.float32)
    assert fits_hbm_xxl(2048, jnp.float32)
    assert fits_hbm_xxl(4096, jnp.float32)
    assert not fits_hbm_xxl(2049, jnp.float32)  # lane-misaligned

    g, mx, mf = _pair(64)
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    mm = MimuraModel(Grid(0.0, 1.0, 64), rescaling=1.0, dtype=jnp.float64,
                     solver_opts=SolverOpts(tol=1e-8, maxiter=200),
                     backend="pallas_fused")
    mm.force_xxl = True
    assert not mm._use_xxl_sweep()  # IMEX reaction blocks the streamed tier
