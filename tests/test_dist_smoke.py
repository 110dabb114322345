"""Minimal per-family RDMA smoke tests (run with ``-m dist_smoke``).

The full interpret-mode dist matrix (test_pallas_dist.py +
test_pallas_dist2d.py) takes ~100 min; this module covers every model
family's distributed kernel — chemotaxis (coupled system), scalar
advection, nonlinear, Schnakenberg, Mimura, drift control — in one tiny
2-device 2-step configuration each, plus one 2-D (2×2) mesh case, so a
contributor can check the RDMA path in minutes before touching
ops/pallas_dist*.py. Reference semantics being pinned: the per-family
FCT sweeps of helpers.py:1321-1385 / 1769-1872, sharded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

pytestmark = pytest.mark.dist_smoke

N = 16
DT = 1e-3
STEPS = 2
_OPTS = dict(dtype=jnp.float64,
             solver_opts=SolverOpts(tol=1e-12, maxiter=200))


def _mesh1d():
    return Mesh(np.array(jax.devices()[:2]), ("x",))


def _put(mesh, traj=None, field=None):
    sh_t = NamedSharding(mesh, P(None, "x", None))
    sh_f = NamedSharding(mesh, P("x", None))
    out = []
    if traj is not None:
        out += [jax.device_put(t, sh_t) for t in traj]
    if field is not None:
        out += [jax.device_put(f, sh_f) for f in field]
    return out


def test_smoke_chemotaxis_fwd_adj():
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, N)
    m = ChemotaxisModel(g, rescaling=1.0, backend="xla", **_OPTS)
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in m.ic())
    c = jnp.full((STEPS + 1, N, N), m.params.gamma, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)
    ref_inv = m.invariant_report()  # BEFORE the adjoint overwrites it
    p_ref, q_ref = m.adjoint(u_ref, v_ref, 1.01 * u_ref[-1], 1.02 * v_ref[-1],
                             c, DT, "finaltime")

    mesh = _mesh1d()
    md = ChemotaxisModel(g, rescaling=1.0, backend="pallas_dist", mesh=mesh,
                         **_OPTS)
    c_s, u0_s, v0_s = _put(mesh, traj=[c], field=[u0, v0])
    u_d, v_d = md.forward(c_s, u0_s, v0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9
    # the RDMA path reports the always-on min-rowsum telemetry too, and it
    # matches the single-device value (global min over device blocks)
    got_inv = md.invariant_report()
    assert got_inv is not None and got_inv["reported"]
    assert abs(got_inv["min_rowsum"] - ref_inv["min_rowsum"]) < 1e-9
    u_s, v_s = _put(mesh, traj=[u_ref, v_ref])
    p_d, q_d = md.adjoint(u_s, v_s, 1.01 * u_ref[-1], 1.02 * v_ref[-1],
                          c_s, DT, "finaltime")
    assert np.abs(np.asarray(p_d) - np.asarray(p_ref)).max() < 1e-9
    assert np.abs(np.asarray(q_d) - np.asarray(q_ref)).max() < 1e-9


def test_smoke_scalar_advection():
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind

    g = Grid(0.0, 1.0, N)
    m = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="xla", **_OPTS)
    u0 = jnp.asarray(np.exp(-20.0 * ((g.xy[0] - 0.5) ** 2
                                     + (g.xy[1] - 0.5) ** 2)))
    c = jnp.full((STEPS + 1, N, N), 0.5, jnp.float64)
    u_ref = m.forward(c, u0, DT)

    mesh = _mesh1d()
    md = AdvectionModel(g, 1e-3, vortex_wind(1.0), backend="pallas_dist",
                        mesh=mesh, **_OPTS)
    c_s, u0_s = _put(mesh, traj=[c], field=[u0])
    u_d = md.forward(c_s, u0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


def test_smoke_nonlinear():
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, N)
    m = NonlinearModel(g, backend="xla", **_OPTS)
    u0 = jnp.asarray(m.ic(), jnp.float64)
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    (u_ref,) = m.forward(c, u0, DT)

    mesh = _mesh1d()
    md = NonlinearModel(g, backend="pallas_dist", mesh=mesh, **_OPTS)
    c_s, u0_s = _put(mesh, traj=[c], field=[u0])
    (u_d,) = md.forward(c_s, u0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


def test_smoke_schnakenberg():
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, N)
    m = SchnakenbergModel(g, backend="xla", **_OPTS)
    u0, v0 = (jnp.asarray(a) for a in m.ic())
    c = jnp.full((STEPS + 1, N, N), m.params.c_a, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)

    mesh = _mesh1d()
    md = SchnakenbergModel(g, backend="pallas_dist", mesh=mesh, **_OPTS)
    c_s, u0_s, v0_s = _put(mesh, traj=[c], field=[u0, v0])
    u_d, v_d = md.forward(c_s, u0_s, v0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


def test_smoke_mimura():
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid(0.0, 1.0, N)
    m = MimuraModel(g, backend="xla", **_OPTS)
    u0, v0 = (jnp.asarray(a) for a in m.ic())
    c = jnp.full((STEPS + 1, N, N), 1.0, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)

    mesh = _mesh1d()
    md = MimuraModel(g, backend="pallas_dist", mesh=mesh, **_OPTS)
    c_s, u0_s, v0_s = _put(mesh, traj=[c], field=[u0, v0])
    u_d, v_d = md.forward(c_s, u0_s, v0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9


def test_smoke_drift():
    from fem_fct_pdeco_tpu.models.advection import (
        DriftControlModel, slotted_cylinder_ic)

    g = Grid(-1.0, 1.0, N)
    mesh = _mesh1d()
    kw = dict(eps=0.0, om=np.pi / 40, drift=(1.0, 1.0),
              solver_opts=SolverOpts(tol=1e-12, maxiter=200))
    mx = DriftControlModel(g, **kw)
    md = DriftControlModel(g, backend="pallas_dist", mesh=mesh, **kw)
    rng = np.random.RandomState(7)
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05), jnp.float64)
    c = jnp.asarray(0.5 * rng.rand(STEPS + 1, N, N))
    u_ref = mx.forward(c, u0, DT)
    c_s, u0_s = _put(mesh, traj=[c], field=[u0])
    u_d = md.forward(c_s, u0_s, DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9


def test_smoke_2d_chemotaxis():
    """One 2-D (2×2) mesh case so the two-phase halo protocol is covered."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, N)
    m = ChemotaxisModel(g, rescaling=1.0, backend="xla", **_OPTS)
    u0, v0 = (jnp.asarray(a, jnp.float64) for a in m.ic())
    c = jnp.full((STEPS + 1, N, N), m.params.gamma, jnp.float64)
    u_ref, v_ref = m.forward(c, u0, v0, DT)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("x", "y"))
    md = ChemotaxisModel(g, rescaling=1.0, backend="pallas_dist", mesh=mesh,
                         **_OPTS)
    sh_t = NamedSharding(mesh, P(None, "x", "y"))
    sh_f = NamedSharding(mesh, P("x", "y"))
    u_d, v_d = md.forward(jax.device_put(c, sh_t),
                          jax.device_put(u0, sh_f),
                          jax.device_put(v0, sh_f), DT)
    assert np.abs(np.asarray(u_d) - np.asarray(u_ref)).max() < 1e-9
    assert np.abs(np.asarray(v_d) - np.asarray(v_ref)).max() < 1e-9
    ref_inv = m.invariant_report()
    got_inv = md.invariant_report()
    assert got_inv is not None and got_inv["reported"]
    assert abs(got_inv["min_rowsum"] - ref_inv["min_rowsum"]) < 1e-9
