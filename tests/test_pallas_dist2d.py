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


@pytest.mark.parametrize("shape", [(2, 4), (2, 2)])
def test_dist2d_forward_matches_single_device(shape):
    g, m, c, u0, v0 = _setup()
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    mesh = _mesh2d(*shape)
    p = m.params
    Mat2 = m.M * (1.0 + DT * p.delta) + (DT * p.Df) * m.K
    c_s, u0_s, v0_s = _put(mesh, c, u0, v0)
    u_d, v_d = dist2d_chemotaxis_forward_sweep(
        c_s, u0_s, v0_s, m.K, m.M, m.M_diag, m.ML_diag, Mat2, mesh,
        h=g.h, dt=DT, Dm=p.Dm, chi=p.chi, eta=p.eta, rescaling=m.rescaling,
        tol=1e-12, iters=200)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_dist2d_adjoint_matches_single_device(optim):
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
    p_d, q_d = dist2d_chemotaxis_adjoint_sweep(
        jax.device_put(u_ref, sh_t), jax.device_put(v_ref, sh_t),
        jax.device_put(c, sh_t), jax.device_put(pT, sh_f),
        jax.device_put(qT, sh_f), m.K, m.M, m.M_diag, m.ML_diag, Mat2,
        mesh, mis_u, mis_v, h=g.h, dt=DT, Dm=pp.Dm, chi=pp.chi, eta=pp.eta,
        rescaling=m.rescaling, tol=1e-12, iters=200)
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9
