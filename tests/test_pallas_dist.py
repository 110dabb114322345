"""Distributed (RDMA) fused sweep vs the single-device reference path.

Runs the ops/pallas_dist.py multi-chip chemotaxis sweep on the virtual CPU
mesh — TPU interpret mode simulates the inter-chip remote DMAs, semaphores
and credit-based flow control — and checks it against the XLA path to
solver tolerance. This is the correctness pin for the roadmap's "multi-chip
fast path" (explicit halo exchange + deterministic distributed Krylov
reductions); reference semantics: helpers.py:1321-1385.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.ops.pallas_dist import dist_chemotaxis_forward_sweep

N = 32
DT = 1e-3
STEPS = 4


def _setup():
    g = Grid(0.0, 1.0, N)
    m = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float64,
                        solver_opts=SolverOpts(tol=1e-12, maxiter=200),
                        backend="xla")
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np, jnp.float64)
    v0 = jnp.asarray(v0np, jnp.float64)
    c = jnp.full((STEPS + 1, N, N), m.params.gamma, jnp.float64)
    return g, m, c, u0, v0


def _run_dist(m, g, c, u0, v0, nd):
    mesh = Mesh(np.array(jax.devices()[:nd]), ("x",))
    p = m.params
    Mat2 = m.M * (1.0 + DT * p.delta) + (DT * p.Df) * m.K
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    c_s = jax.device_put(c, sh_t)
    u0_s = jax.device_put(u0, sh_f)
    v0_s = jax.device_put(v0, sh_f)
    return dist_chemotaxis_forward_sweep(
        c_s, u0_s, v0_s, m.K, m.M, m.M_diag, m.ML_diag, Mat2, mesh,
        h=g.h, dt=DT, Dm=p.Dm, chi=p.chi, eta=p.eta, rescaling=m.rescaling,
        tol=1e-12, iters=200)


@pytest.mark.parametrize("nd", [4, 8])
def test_dist_sweep_matches_single_device(nd):
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    u_d, v_d = _run_dist(m, g, c, u0, v0, nd)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


def test_dist_sweep_single_device_degenerate():
    """nd=1 must run the same kernel without any communication."""
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    u_d, v_d = _run_dist(m, g, c, u0, v0, 1)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_dist_adjoint_matches_single_device(optim):
    """Forward + adjoint on the RDMA path = full PDECO gradient sharded."""
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    else:
        uhat, vhat = 1.01 * u_ref, 1.02 * v_ref
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, c, DT, optim)

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float64,
                         solver_opts=SolverOpts(tol=1e-12, maxiter=200),
                         backend="pallas_dist", mesh=mesh)
    sh_t = NamedSharding(mesh, P(None, "x", None))
    u_s = jax.device_put(u_ref, sh_t)
    v_s = jax.device_put(v_ref, sh_t)
    c_s = jax.device_put(c, sh_t)
    p_d, q_d = md.adjoint(u_s, v_s, uhat, vhat, c_s, DT, optim)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


def test_model_backend_pallas_dist():
    """backend='pallas_dist' + mesh routes ChemotaxisModel.forward through
    the RDMA sweep and matches the XLA path."""
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = ChemotaxisModel(g, rescaling=1.0, dtype=jnp.float64,
                         solver_opts=SolverOpts(tol=1e-12, maxiter=200),
                         backend="pallas_dist", mesh=mesh)
    c_s = jax.device_put(c, NamedSharding(mesh, P(None, "x", None)))
    u0_s = jax.device_put(u0, NamedSharding(mesh, P("x", None)))
    v0_s = jax.device_put(v0, NamedSharding(mesh, P("x", None)))
    u_d, v_d = md.forward(c_s, u0_s, v0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


def test_model_backend_pallas_dist_guards():
    """Missing mesh or an indivisible grid falls back to the XLA path with
    a warning instead of failing at run time."""
    import warnings

    g = Grid(0.0, 1.0, N)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = ChemotaxisModel(g, backend="pallas_dist")
    assert m.backend == "xla" and any("mesh" in str(x.message) for x in w)
    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    g41 = Grid(0.0, 1.0, 41)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        m = ChemotaxisModel(g41, backend="pallas_dist", mesh=mesh)
    assert m.backend == "xla" and any("divisible" in str(x.message) for x in w)


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_dist_scalar_nonlinear(optim):
    """Nonlinear state+adjoint on the distributed scalar sweep (IMEX
    non-flux weighted mass from the carried/stored state)."""
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, N)
    m = NonlinearModel(g, dtype=jnp.float64,
                       solver_opts=SolverOpts(tol=1e-12, maxiter=200),
                       backend="xla")
    u0 = jnp.asarray(m.ic(), jnp.float64)
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    (u_ref,) = m.forward(c, u0, DT)
    uhat = (1.01 * u_ref) if optim == "alltime" else (1.01 * u_ref[-1])
    (p_ref,) = m.adjoint(u_ref, uhat, DT, optim)

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = NonlinearModel(g, dtype=jnp.float64,
                        solver_opts=SolverOpts(tol=1e-12, maxiter=200),
                        backend="pallas_dist", mesh=mesh)
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    (u_d,) = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    (p_d,) = md.adjoint(jax.device_put(u_ref, sh_t),
                        jax.device_put(uhat, sh_t if optim == "alltime"
                                       else sh_f), DT, optim)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9


def test_dist_scalar_advection():
    """Linear advection state+adjoint on the distributed scalar sweep."""
    from fem_fct_pdeco_tpu.models.advection import (
        AdvectionModel, vortex_wind)

    g = Grid(0.0, 1.0, N)
    kw = dict(dtype=jnp.float64,
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    m = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="xla", **kw)
    u0 = jnp.asarray(np.exp(-20.0 * ((g.xy[0] - 0.5) ** 2
                                     + (g.xy[1] - 0.5) ** 2)))
    c = jnp.full((STEPS + 1, N, N), 0.5, jnp.float64)
    u_ref = m.forward(c, u0, DT)
    p_ref = m.adjoint(u_ref, 1.01 * u_ref[-1], DT, "finaltime")

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="pallas_dist",
                        mesh=mesh, **kw)
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    u_d = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    p_d = md.adjoint(jax.device_put(u_ref, sh_t),
                     jax.device_put(1.01 * u_ref[-1], sh_f), DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_dist_schnakenberg(optim):
    """Schnakenberg forward+adjoint on the RDMA path (per-step u²-weighted
    mass assembled in-kernel on the halo-extended block)."""
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, N)
    kw = dict(dtype=jnp.float64,
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    m = SchnakenbergModel(g, backend="xla", **kw)
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np); v0 = jnp.asarray(v0np)
    c = jnp.full((STEPS + 1, N, N), m.params.c_a, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    else:
        uhat, vhat = 1.01 * u_ref, 1.02 * v_ref
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, DT, optim)

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = SchnakenbergModel(g, backend="pallas_dist", mesh=mesh, **kw)
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    u_d, v_d = md.forward(jax.device_put(c, sh_t),
                          jax.device_put(u0, sh_f),
                          jax.device_put(v0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9
    p_d, q_d = md.adjoint(jax.device_put(u_ref, sh_t),
                          jax.device_put(v_ref, sh_t), uhat, vhat, DT, optim)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


def test_dist_mimura():
    """Mimura (chemotaxis + m²(1-m) reaction) forward+adjoint on the RDMA
    path: explicit reaction load and the IMEX non-flux linearization."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid(0.0, 1.0, N)
    kw = dict(dtype=jnp.float64,
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    m = MimuraModel(g, backend="xla", **kw)
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np); v0 = jnp.asarray(v0np)
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, c, DT, "finaltime")

    mesh = Mesh(np.array(jax.devices()[:4]), ("x",))
    md = MimuraModel(g, backend="pallas_dist", mesh=mesh, **kw)
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    u_d, v_d = md.forward(jax.device_put(c, sh_t),
                          jax.device_put(u0, sh_f),
                          jax.device_put(v0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9
    p_d, q_d = md.adjoint(jax.device_put(u_ref, sh_t),
                          jax.device_put(v_ref, sh_t), uhat, vhat,
                          jax.device_put(c, sh_t), DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


def test_pdeco_driver_backend_pallas_dist(tmp_path):
    """End-to-end: the chemotaxis PDECO driver with --backend pallas_dist
    runs the full PGD loop (forward + adjoint sweeps on the RDMA kernels,
    descent/cost under GSPMD) on the 8-device mesh."""
    from fem_fct_pdeco_tpu.drivers import chemotaxis_pdeco as drv

    cfg = drv.build_config(T=0.002, T_data=0.002, dt=1e-3, dx=1.0 / 31.0,
                           max_iter_gd=2, out_folder=str(tmp_path),
                           produce_plots=False)
    cfg.registry_csv = None
    problem = drv.ChemotaxisProblem(cfg, backend="pallas_dist")
    assert problem.model.backend == "pallas_dist"  # n=32 divisible by 8
    from fem_fct_pdeco_tpu.drivers.common import run_pdeco

    out = run_pdeco(problem, cfg)
    assert np.isfinite(out["result"].cost)


def test_dist_sweep_race_detector():
    """Run the interpreter's vector-clock race detector over the credit
    protocol (a halo buffer overwritten before its consumer read it would
    be reported as a race and fail here)."""
    from fem_fct_pdeco_tpu.ops import pallas_dist

    g, m, c, u0, v0 = _setup()
    u_ref, _ = m.forward(c, u0, v0, DT)
    pallas_dist._DETECT_RACES = True
    try:
        u_d, _ = _run_dist(m, g, c, u0, v0, 4)
    finally:
        pallas_dist._DETECT_RACES = False
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


def test_dist_drift_sweep_matches_single_device():
    """Distributed drift-control sweep (per-step in-kernel Adrift assembly
    on the halo-extended block) matches the XLA path — forward + both
    adjoints, via the model's pallas_dist backend."""
    from fem_fct_pdeco_tpu.models.advection import (
        DriftControlModel, slotted_cylinder_ic)

    g = Grid(-1.0, 1.0, N)
    mesh = Mesh(np.array(jax.devices()), ("x",))
    kw = dict(eps=0.0, om=np.pi / 40, drift=(1.0, 1.0),
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    mx = DriftControlModel(g, **kw)
    md = DriftControlModel(g, backend="pallas_dist", mesh=mesh, **kw)
    rng = np.random.RandomState(7)
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05), jnp.float64)
    c = jnp.asarray(0.5 * rng.rand(STEPS + 1, N, N))

    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    u_ref = mx.forward(c, u0, DT)
    u_d = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9

    uhat = 1.1 * u_ref[-1]
    p_ref = mx.adjoint(u_ref, uhat, c, DT, "finaltime")
    p_d = md.adjoint(jax.device_put(u_ref, sh_t), jax.device_put(uhat, sh_f),
                     jax.device_put(c, sh_t), DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9

    uhat_t = 1.1 * u_ref
    p_ref = mx.adjoint(u_ref, uhat_t, c, DT, "alltime")
    p_d = md.adjoint(jax.device_put(u_ref, sh_t),
                     jax.device_put(uhat_t, sh_t),
                     jax.device_put(c, sh_t), DT, "alltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
