"""2-D (row x col) distributed RDMA sweep vs the single-device XLA path.

Runs ops/pallas_dist2d.py on a (2, 4) virtual CPU mesh — TPU interpret mode
simulates the inter-chip DMAs, semaphores and the two-phase (rows, then
row-extended columns) halo protocol — and pins the result against the
single-device path at solver tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
from fem_fct_pdeco_tpu.ops.pallas_dist2d import (
    dist2d_chemotaxis_forward_sweep, dist2d_chemotaxis_adjoint_sweep)

N = 32
DT = 1e-3
STEPS = 3


def _mesh2d(nr=2, nc=4):
    devs = np.array(jax.devices()[: nr * nc]).reshape(nr, nc)
    return Mesh(devs, ("x", "y"))


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


def _put(mesh, c, u0, v0):
    sh_t = NamedSharding(mesh, P(None, "x", "y"))
    sh_f = NamedSharding(mesh, P("x", "y"))
    return (jax.device_put(c, sh_t), jax.device_put(u0, sh_f),
            jax.device_put(v0, sh_f))


@pytest.mark.parametrize("shape,precond", [
    ((2, 4), "jacobi"),
    ((2, 2), "jacobi"),
    ((2, 4), "dct"),  # 2-D-distributed spectral preconditioner
])
def test_dist2d_forward_matches_single_device(shape, precond):
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    mesh = _mesh2d(*shape)
    p = m.params
    Mat2 = m.M * (1.0 + DT * p.delta) + (DT * p.Df) * m.K
    c_s, u0_s, v0_s = _put(mesh, c, u0, v0)
    kw = dict(Df=p.Df, delta=p.delta) if precond == "dct" else {}
    u_d, v_d = dist2d_chemotaxis_forward_sweep(
        c_s, u0_s, v0_s, m.K, m.M, m.M_diag, m.ML_diag, Mat2, mesh,
        h=g.h, dt=DT, Dm=p.Dm, chi=p.chi, eta=p.eta, rescaling=m.rescaling,
        tol=1e-12, iters=200, precond=precond, **kw)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


@pytest.mark.parametrize("optim,precond", [
    ("finaltime", "jacobi"),
    ("alltime", "jacobi"),
    ("finaltime", "dct"),
])
def test_dist2d_adjoint_matches_single_device(optim, precond):
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    else:
        uhat, vhat = 1.01 * u_ref, 1.02 * v_ref
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, c, DT, optim)

    mesh = _mesh2d()
    pp = m.params
    Mat2 = m.M * (1.0 + DT * pp.delta) + (DT * pp.Df) * m.K
    sh_t = NamedSharding(mesh, P(None, "x", "y"))
    sh_f = NamedSharding(mesh, P("x", "y"))
    if optim == "finaltime":
        pT = uhat - u_ref[-1]
        qT = vhat - v_ref[-1]
        mis_u = mis_v = None
    else:
        pT = jnp.zeros_like(u_ref[-1])
        qT = jnp.zeros_like(pT)
        mis_u = jax.device_put(uhat[:-1] - u_ref[:-1], sh_t)
        mis_v = jax.device_put(vhat[:-1] - v_ref[:-1], sh_t)
    kw = dict(Df=pp.Df, delta=pp.delta) if precond == "dct" else {}
    p_d, q_d = dist2d_chemotaxis_adjoint_sweep(
        jax.device_put(u_ref, sh_t), jax.device_put(v_ref, sh_t),
        jax.device_put(c, sh_t), jax.device_put(pT, sh_f),
        jax.device_put(qT, sh_f), m.K, m.M, m.M_diag, m.ML_diag, Mat2,
        mesh, mis_u, mis_v, h=g.h, dt=DT, Dm=pp.Dm, chi=pp.chi, eta=pp.eta,
        rescaling=m.rescaling, tol=1e-12, iters=200, precond=precond, **kw)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


# ---------------------------------------------------------------------------
# The remaining families run through the MODEL backend: a 2-D mesh passed
# as backend="pallas_dist" auto-routes to the dist2d kernels
# (pallas_dist.mesh_is_2d delegation).
# ---------------------------------------------------------------------------

_SOLVE = dict(dtype=jnp.float64,
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))


def _shards(mesh):
    return (NamedSharding(mesh, P(None, "x", "y")),
            NamedSharding(mesh, P("x", "y")))


def test_dist2d_model_backend_routes():
    """ChemotaxisModel with a 2-D mesh runs the dist2d kernels end-to-end
    through backend='pallas_dist'."""
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    mesh = _mesh2d(2, 2)
    md = ChemotaxisModel(g, rescaling=1.0, backend="pallas_dist",
                         mesh=mesh, **_SOLVE)
    sh_t, sh_f = _shards(mesh)
    u_d, v_d = md.forward(jax.device_put(c, sh_t),
                          jax.device_put(u0, sh_f),
                          jax.device_put(v0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


def test_dist2d_scalar_nonlinear():
    """Nonlinear state+adjoint on the 2-D distributed scalar sweep (IMEX
    non-flux weighted mass from the carried/stored state)."""
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, N)
    m = NonlinearModel(g, backend="xla", **_SOLVE)
    u0 = jnp.asarray(m.ic(), jnp.float64)
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    (u_ref,) = m.forward(c, u0, DT)
    uhat = 1.01 * u_ref[-1]
    (p_ref,) = m.adjoint(u_ref, uhat, DT, "finaltime")

    mesh = _mesh2d(2, 2)
    md = NonlinearModel(g, backend="pallas_dist", mesh=mesh, **_SOLVE)
    sh_t, sh_f = _shards(mesh)
    (u_d,) = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f),
                        DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    (p_d,) = md.adjoint(jax.device_put(u_ref, sh_t),
                        jax.device_put(uhat, sh_f), DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_dist2d_schnakenberg(optim):
    """Schnakenberg forward+adjoint on the 2-D RDMA path (per-step
    u²-weighted masses assembled in-kernel on the 2-D halo-extended
    block)."""
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, N)
    m = SchnakenbergModel(g, backend="xla", **_SOLVE)
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np); v0 = jnp.asarray(v0np)
    c = jnp.full((STEPS + 1, N, N), m.params.c_a, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    else:
        uhat, vhat = 1.01 * u_ref, 1.02 * v_ref
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, DT, optim)

    mesh = _mesh2d(2, 2)
    md = SchnakenbergModel(g, backend="pallas_dist", mesh=mesh, **_SOLVE)
    sh_t, sh_f = _shards(mesh)
    u_d, v_d = md.forward(jax.device_put(c, sh_t),
                          jax.device_put(u0, sh_f),
                          jax.device_put(v0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9
    p_d, q_d = md.adjoint(jax.device_put(u_ref, sh_t),
                          jax.device_put(v_ref, sh_t), uhat, vhat, DT,
                          optim)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


def test_dist2d_mimura():
    """Mimura (chemotaxis + m²(1-m) reaction) forward on the 2-D path:
    explicit reaction load and the IMEX non-flux linearization ride the
    dist2d chemotaxis kernels."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid(0.0, 1.0, N)
    m = MimuraModel(g, backend="xla", **_SOLVE)
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np); v0 = jnp.asarray(v0np)
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    uhat, vhat = 1.01 * u_ref[-1], 1.02 * v_ref[-1]
    p_ref, q_ref = m.adjoint(u_ref, v_ref, uhat, vhat, c, DT, "finaltime")

    mesh = _mesh2d(2, 2)
    md = MimuraModel(g, backend="pallas_dist", mesh=mesh, **_SOLVE)
    sh_t, sh_f = _shards(mesh)
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


def test_dist2d_drift():
    """Drift-control sweep on the 2-D path: per-step Adrift pair assembled
    in-kernel on the 2-D halo-extended block."""
    from fem_fct_pdeco_tpu.models.advection import (
        DriftControlModel, slotted_cylinder_ic)

    g = Grid(-1.0, 1.0, N)
    kw = dict(eps=0.0, om=np.pi / 40, drift=(1.0, 1.0),
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    mx = DriftControlModel(g, **kw)
    mesh = _mesh2d(2, 2)
    md = DriftControlModel(g, backend="pallas_dist", mesh=mesh, **kw)
    rng = np.random.RandomState(7)
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05), jnp.float64)
    c = jnp.asarray(0.5 * rng.rand(STEPS + 1, N, N))

    sh_t, sh_f = _shards(mesh)
    u_ref = mx.forward(c, u0, DT)
    u_d = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9

    uhat = 1.1 * u_ref[-1]
    p_ref = mx.adjoint(u_ref, uhat, c, DT, "finaltime")
    p_d = md.adjoint(jax.device_put(u_ref, sh_t),
                     jax.device_put(uhat, sh_f),
                     jax.device_put(c, sh_t), DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9


def test_dist2d_advection():
    """Linear advection state on the 2-D distributed scalar sweep."""
    from fem_fct_pdeco_tpu.models.advection import (
        AdvectionModel, vortex_wind)

    g = Grid(0.0, 1.0, N)
    m = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="xla", **_SOLVE)
    u0 = jnp.asarray(np.exp(-20.0 * ((g.xy[0] - 0.5) ** 2
                                     + (g.xy[1] - 0.5) ** 2)))
    c = jnp.full((STEPS + 1, N, N), 0.5, jnp.float64)
    u_ref = m.forward(c, u0, DT)

    mesh = _mesh2d(2, 2)
    md = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="pallas_dist",
                        mesh=mesh, **_SOLVE)
    sh_t, sh_f = _shards(mesh)
    u_d = md.forward(jax.device_put(c, sh_t), jax.device_put(u0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


def test_dist2d_full_pgd_iteration_cost_parity():
    """One FULL PGD iteration on the 2-D RDMA path — dist forward, dist
    adjoint, gradient equation, projected update, cost — matches the
    single-device XLA iteration at solver tolerance (the multi-chip
    equivalent of the reference loop, chemotaxis_FCT_PDECO_refactored.py:
    183-287; VERDICT r3 item 6)."""
    from fem_fct_pdeco_tpu.optimize.cost import cost_functional

    # smaller than the module default: the iteration runs BOTH dist sweeps
    # (fwd + adj) plus the XLA reference pair — N=32 takes ~an hour in
    # interpret mode with the 2-D DCT preconditioner
    n_, steps_ = 16, 2
    g = Grid(0.0, 1.0, n_)
    m = ChemotaxisModel(g, rescaling=1.0, backend="xla", **_SOLVE)
    u0np, v0np = m.ic()
    u0 = jnp.asarray(u0np, jnp.float64)
    v0 = jnp.asarray(v0np, jnp.float64)
    c = jnp.full((steps_ + 1, n_, n_), m.params.gamma, jnp.float64)
    beta, s = 1e-3, 1e-2
    uhat = jnp.ones((n_, n_), jnp.float64)
    vhat = jnp.ones((n_, n_), jnp.float64)

    def pgd_iter(model, c_t, u0_t, v0_t, uh, vh):
        u_t, v_t = model.forward(c_t, u0_t, v0_t, DT)
        p_t, q_t = model.adjoint(u_t, v_t, uh, vh, c_t, DT, "finaltime")
        dk = model.descent_direction(beta, c_t, u_t, q_t)
        c_new = jnp.clip(c_t + s * dk, 0.0, 200.0)
        J = cost_functional(u_t, uh, c_new, DT, model.M, beta, "finaltime",
                            var2_traj=v_t, var2_target=vh)
        return c_new, J

    c_ref, J_ref = pgd_iter(m, c, u0, v0, uhat, vhat)

    mesh = _mesh2d(2, 2)
    md = ChemotaxisModel(g, rescaling=1.0, backend="pallas_dist", mesh=mesh,
                         **_SOLVE)
    # jacobi keeps the interpret-mode runtime tractable; the DCT path is
    # pinned by the dedicated forward/adjoint dct parametrizations above
    md.dist_precond = "jacobi"
    assert md.backend == "pallas_dist"
    sh_t, sh_f = _shards(mesh)
    c_d, J_d = pgd_iter(
        md, jax.device_put(c, sh_t), jax.device_put(u0, sh_f),
        jax.device_put(v0, sh_f), jax.device_put(uhat, sh_f),
        jax.device_put(vhat, sh_f))
    assert abs(float(J_d) - float(J_ref)) / abs(float(J_ref)) < 1e-9
    assert np.abs(np.asarray(c_d) - np.asarray(c_ref)).max() < 1e-9
