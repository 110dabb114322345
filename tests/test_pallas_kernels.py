"""Pallas kernels vs their XLA counterparts (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid, EDGE_NEIGHBOR_IDS
from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
from fem_fct_pdeco_tpu.ops import pallas_kernels as pk
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.fct import artificial_diffusion, fct_step, low_order_matrix, zalesak_limit
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts, chebsi, solve_stencil


@pytest.fixture(scope="module")
def setup():
    g = Grid(0.0, 1.0, 32)
    model = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                           solver_opts=SolverOpts(tol=1e-13))
    return g, model


def test_chebsi_pallas_matches(setup):
    g, model = setup
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((g.n, g.n)))
    got = pk.chebsi_pallas(b, model.M, model.M_diag)
    want = chebsi(b, model.M, model.M_diag)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11, atol=1e-12)


def test_bicgstab_pallas_solves(setup):
    g, model = setup
    dt = 1e-3
    A = model.A_state
    D = artificial_diffusion(A)
    Low = low_order_matrix(A, D, model.ML_diag, dt)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal((g.n, g.n))) * float(model.ML_diag.mean())
    x = pk.bicgstab_pallas(Low, b, iters=30, tol=1e-13)
    r = st.apply(Low, x) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-10, rel


def test_cg_pallas_solves(setup):
    g, model = setup
    Mat = model.M + 1e-3 * model.K
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal((g.n, g.n))) * float(model.M_diag.mean())
    x = pk.cg_pallas(Mat, b, iters=40, tol=1e-13)
    r = st.apply(Mat, x) - b
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert rel < 1e-9, rel


def test_flux_zalesak_pallas_matches(setup):
    g, model = setup
    dt = 1e-3
    rng = np.random.default_rng(3)
    A = model.A_state
    D = artificial_diffusion(A)
    u_low = jnp.asarray(rng.uniform(0, 1, (g.n, g.n)))
    du = jnp.asarray(rng.standard_normal((g.n, g.n)))
    got = pk.flux_zalesak_pallas(model.M, D, du, u_low, model.ML_diag, dt)
    fluxes = jnp.stack([
        model.M[d] * (du - st.shift(du, d)) + D[d] * (u_low - st.shift(u_low, d))
        for d in EDGE_NEIGHBOR_IDS
    ])
    fbar = zalesak_limit(fluxes, u_low, model.ML_diag, dt)
    want = u_low + dt * fbar / model.ML_diag
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-11, atol=1e-12)


def test_fused_chemotaxis_step_matches_xla():
    """Whole-step fused kernels vs the XLA path (interpret mode, f64)."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 32)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    mf = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((4, g.n, g.n), 100.0)
    ux, vx = mx.forward(c, u0, v0, 1e-3)
    uf, vf = mf.forward(c, u0, v0, 1e-3)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("optim", ["finaltime", "alltime"])
def test_fused_chemotaxis_adjoint_matches_xla(optim):
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 32)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    mf = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((4, g.n, g.n), 100.0)
    u, v = mx.forward(c, u0, v0, 1e-3)
    if optim == "finaltime":
        uhat, vhat = 1.01 * u[-1], 1.02 * v[-1]
    else:
        uhat, vhat = 1.01 * u, 1.02 * v
    px, qx = mx.adjoint(u, v, uhat, vhat, c, 1e-3, optim)
    pf, qf = mf.adjoint(u, v, uhat, vhat, c, 1e-3, optim)
    np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-10, atol=1e-13)
    np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-10, atol=1e-13)


def test_fct_step_pallas_backend_matches(setup):
    g, model = setup
    dt = 1e-3
    rng = np.random.default_rng(4)
    u_n = jnp.asarray(rng.uniform(0, 1, (g.n, g.n)))
    rhs = jnp.asarray(rng.standard_normal((g.n, g.n)))
    a = fct_step(model.A_state, rhs, u_n, dt, model.M, model.M_diag,
                 model.ML_diag, solver=SolverOpts(tol=1e-13))
    b = fct_step(model.A_state, rhs, u_n, dt, model.M, model.M_diag,
                 model.ML_diag, backend="pallas", pallas_solver_iters=40)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-10)


def test_vmem_guard_falls_back_to_xla():
    """A grid exceeding the single-block VMEM budget must not construct a
    pallas-backed model: the backend falls back to XLA with a warning."""
    import pytest as _pytest

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem_synth

    # Schnakenberg (stationary wind) IS synth-capable: 448² f64 exceeds the
    # resident budget but keeps the fused backend on the synth kernels
    # (caps calibrated against real-Mosaic scoped-VMEM requirements,
    # round 4: ~70 effective planes for the synth tier)
    n_big = 448
    assert not fits_vmem(n_big, jnp.float64)
    assert fits_vmem_synth(n_big, jnp.float64)
    model = SchnakenbergModel(Grid(0.0, 1.0, n_big), backend="pallas_fused")
    assert model.backend == "pallas_fused" and model._use_synth_sweep()

    # ... but the td-wind fused kernels are resident-only, so the same grid
    # with a time-dependent wind must warn and fall back
    with _pytest.warns(UserWarning, match="VMEM"):
        model = SchnakenbergModel(
            Grid(0.0, 1.0, n_big), backend="pallas_fused",
            td_wind_fn=lambda x, y, t: (y, -x))
    assert model.backend == "xla"

    # 512² f64 is past even the lean tier's calibrated requirement
    # (~144 MB); chemotaxis AND (since the round-4 XL coverage) stationary
    # -wind Schnakenberg keep the fused backend through the banded XL tier
    assert not fits_vmem_synth(512, jnp.float64)
    model = ChemotaxisModel(Grid(0.0, 1.0, 512), backend="pallas_fused")
    assert model.backend == "pallas_fused"
    assert model._use_xl_sweep()
    model = SchnakenbergModel(Grid(0.0, 1.0, 512), backend="pallas_fused")
    assert model.backend == "pallas_fused"
    assert model._use_xl_sweep()
    # ... while the td-wind variant (resident-only kernels, no synth/lean/
    # XL tier) is a genuine fall-back at the same size
    with _pytest.warns(UserWarning, match="VMEM"):
        model = SchnakenbergModel(
            Grid(0.0, 1.0, 512), backend="pallas_fused",
            td_wind_fn=lambda x, y, t: (y, -x))
    assert model.backend == "xla"

    # beyond every tier's budget even chemotaxis falls back
    n_huge = 1600
    assert not fits_vmem_synth(n_huge, jnp.float64)
    with _pytest.warns(UserWarning, match="VMEM"):
        model = ChemotaxisModel(Grid(0.0, 1.0, n_huge), backend="pallas_fused")
    assert model.backend == "xla"

    # a fitting grid keeps the requested backend on the resident kernels
    small = ChemotaxisModel(Grid(0.0, 1.0, 32), backend="pallas_fused")
    assert small.backend == "pallas_fused" and not small._use_synth_sweep()


def test_fused_schnak_sweep_matches_xla():
    """Whole-sweep fused Schnakenberg forward + adjoint vs the XLA path
    (interpret mode, f64)."""
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid(0.0, 1.0, 24)
    mx = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    dt = 5e-4
    c = jnp.full((4, g.n, g.n), 0.1)
    ux, vx = mx.forward(c, u0, v0, dt)
    uf, vf = mf.forward(c, u0, v0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, optim)
        pf, qf = mf.adjoint(ux, vx, uhat, vhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-9, atol=1e-12)


def test_fused_nonlinear_sweep_matches_xla():
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid(0.0, 1.0, 24)
    mx = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    u0 = jnp.asarray(mx.ic())
    dt = 1e-3
    c = jnp.broadcast_to(jnp.asarray(mx.true_control()), (5, g.n, g.n))
    (ux,) = mx.forward(c, u0, dt)
    (uf,) = mf.forward(c, u0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-13)
    for optim in ("finaltime", "alltime"):
        uhat = 1.01 * ux[-1] if optim == "finaltime" else 1.01 * ux
        (px,) = mx.adjoint(ux, uhat, dt, optim)
        (pf,) = mf.adjoint(ux, uhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-13)


def test_fused_advection_sweep_matches_xla():
    g = Grid(0.0, 1.0, 24)
    mx = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13))
    mf = AdvectionModel(g, eps=1e-3, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    X, Y = g.xy
    u0 = jnp.asarray(np.sin(np.pi * X) * np.sin(np.pi * Y))
    dt = 1e-3
    rng = np.random.default_rng(7)
    c = jnp.asarray(rng.standard_normal((5, g.n, g.n)))
    f = jnp.asarray(rng.standard_normal((5, g.n, g.n)))
    ux = mx.forward(c, u0, dt, source_traj=f)
    uf = mf.forward(c, u0, dt, source_traj=f)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-9, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        uhat = 1.01 * ux[-1] if optim == "finaltime" else 1.01 * ux
        px = mx.adjoint(ux, uhat, dt, optim)
        pf = mf.adjoint(ux, uhat, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-13)


def test_fused_mimura_sweep_matches_xla():
    """Mimura's m²(1-m) reaction inside the whole-sweep kernels (previously
    a silent fallback to the piecewise path)."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid(0.0, 10.0, 21)
    mx = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13))
    mf = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13), backend="pallas_fused")
    m0np, f0np = mx.ic()
    m0, f0 = jnp.asarray(m0np), jnp.asarray(f0np)
    dt = 0.05
    c = jnp.ones((4, g.n, g.n))
    ux, vx = mx.forward(c, m0, f0, dt)
    uf, vf = mf.forward(c, m0, f0, dt)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ux), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(vx), rtol=1e-10, atol=1e-12)
    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        pf, qf = mf.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(qf), np.asarray(qx), rtol=1e-9, atol=1e-12)


def test_synth_sweeps_match_xla_chemotaxis():
    """Large-grid SYNTH whole-sweep kernels (in-kernel synthesized
    stationary operators, compact 7-plane scratch) match the XLA path at
    solver tolerance — forward and adjoint, finaltime and alltime."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 33, 6, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    ms = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    ms.force_synth = True
    assert ms._use_synth_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.gamma)

    ux, vx = mx.forward(c, u0, v0, dt)
    us, vs = ms.forward(c, u0, v0, dt)
    assert float(jnp.abs(us - ux).max()) < 1e-9
    assert float(jnp.abs(vs - vx).max()) < 1e-9

    uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
    px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, "finaltime")
    ps, qs = ms.adjoint(ux, vx, uhat, vhat, c, dt, "finaltime")
    assert float(jnp.abs(ps - px).max()) < 1e-9
    assert float(jnp.abs(qs - qx).max()) < 1e-9

    uhat_t = 1.01 * ux
    vhat_t = 1.02 * vx
    px, qx = mx.adjoint(ux, vx, uhat_t, vhat_t, c, dt, "alltime")
    ps, qs = ms.adjoint(ux, vx, uhat_t, vhat_t, c, dt, "alltime")
    assert float(jnp.abs(ps - px).max()) < 1e-9
    assert float(jnp.abs(qs - qx).max()) < 1e-9


def test_synth_sweeps_match_xla_mimura():
    """Synth kernels with the Mimura m²(1-m) reaction."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 17, 4, 1e-2
    g = Grid(0.0, 2.0, n)
    mx = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13))
    ms = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13),
                     backend="pallas_fused")
    ms.force_synth = True
    m0np, f0np = mx.ic()
    m0, f0 = jnp.asarray(m0np), jnp.asarray(f0np)
    c = jnp.ones((steps + 1, n, n))

    ux, vx = mx.forward(c, m0, f0, dt)
    us, vs = ms.forward(c, m0, f0, dt)
    assert float(jnp.abs(us - ux).max()) < 1e-9
    assert float(jnp.abs(vs - vx).max()) < 1e-9

    mhat, fhat = 1.01 * ux[-1], 1.02 * vx[-1]
    px, qx = mx.adjoint(ux, vx, mhat, fhat, c, dt, "finaltime")
    ps, qs = ms.adjoint(ux, vx, mhat, fhat, c, dt, "finaltime")
    assert float(jnp.abs(ps - px).max()) < 1e-9
    assert float(jnp.abs(qs - qx).max()) < 1e-9


def test_fused_schnak_td_wind_matches_xla():
    """Time-dependent-wind fused Schnakenberg sweeps (in-kernel convection
    assembly at the traced step time) match the XLA path — closes the
    silent fallback of --backend pallas_fused --td-wind."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    td = lambda x, y, t: (
        -(y - 0.5) * jnp.sin(2 * jnp.pi * t),
        (x - 0.5) * jnp.sin(2 * jnp.pi * t),
    )
    n, steps, dt = 17, 5, 1e-3
    g = Grid(0.0, 1.0, n)
    mx = SchnakenbergModel(g, td_wind_fn=td, solver_opts=SolverOpts(tol=1e-13))
    mf = SchnakenbergModel(g, td_wind_fn=td, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.c_a)

    ux, vx = mx.forward(c, u0, v0, dt)
    uf, vf = mf.forward(c, u0, v0, dt)
    assert float(jnp.abs(uf - ux).max()) < 1e-9
    assert float(jnp.abs(vf - vx).max()) < 1e-9

    uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
    px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, "finaltime")
    pf, qf = mf.adjoint(ux, vx, uhat, vhat, dt, "finaltime")
    assert float(jnp.abs(pf - px).max()) < 1e-9
    assert float(jnp.abs(qf - qx).max()) < 1e-9

    # alltime: mass-weighted misfits in both half-step RHSs
    px, qx = mx.adjoint(ux, vx, 1.01 * ux, 1.02 * vx, dt, "alltime")
    pf, qf = mf.adjoint(ux, vx, 1.01 * ux, 1.02 * vx, dt, "alltime")
    assert float(jnp.abs(pf - px).max()) < 1e-9
    assert float(jnp.abs(qf - qx).max()) < 1e-9


def test_fused_scalar_reaction_matches_xla():
    """fused_scalar_fct_sweep with the per-step reaction coefficient g
    (the MMS finaltime-exact '+ g u' term) matches the XLA path — closes
    the silent fallback of the MMS-exact configuration."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel, vortex_wind
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 17, 5, 1e-3
    g = Grid(0.0, 1.0, n)
    rng = np.random.RandomState(3)
    mx = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13))
    mf = AdvectionModel(g, eps=1e-4, wind_fn=vortex_wind(1.0),
                        solver_opts=SolverOpts(tol=1e-13),
                        backend="pallas_fused")
    u0 = jnp.asarray(rng.rand(n, n))
    c = jnp.asarray(rng.rand(steps + 1, n, n))
    f = jnp.asarray(rng.rand(steps + 1, n, n))
    gr = jnp.asarray(0.5 * rng.rand(steps + 1, n, n))

    ux = mx.forward(c, u0, dt, source_traj=f, reaction_traj=gr)
    uf = mf.forward(c, u0, dt, source_traj=f, reaction_traj=gr)
    assert float(jnp.abs(uf - ux).max()) < 1e-9

    uhat = 1.1 * ux[-1]
    px = mx.adjoint(ux, uhat, dt, "finaltime", reaction_traj=gr)
    pf = mf.adjoint(ux, uhat, dt, "finaltime", reaction_traj=gr)
    assert float(jnp.abs(pf - px).max()) < 1e-9

    px = mx.adjoint(ux, 1.1 * ux, dt, "alltime", reaction_traj=gr)
    pf = mf.adjoint(ux, 1.1 * ux, dt, "alltime", reaction_traj=gr)
    assert float(jnp.abs(pf - px).max()) < 1e-9


def test_fused_drift_sweep_matches_xla():
    """DriftControlModel pallas_fused backend (in-kernel per-step
    Adrift1/Adrift2 assembly) matches the XLA path — forward, finaltime and
    alltime adjoint (VERDICT item: drift-control gets the full backend
    treatment)."""
    import numpy as np

    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import (
        DriftControlModel, slotted_cylinder_ic)
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 17, 5, 1e-3
    g = Grid(-1.0, 1.0, n)
    kw = dict(eps=0.0, om=np.pi / 40, drift=(1.0, 1.0),
              solver_opts=SolverOpts(tol=1e-13))
    mx = DriftControlModel(g, **kw)
    mf = DriftControlModel(g, backend="pallas_fused", **kw)
    rng = np.random.RandomState(1)
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05))
    c = jnp.asarray(0.5 * rng.rand(steps + 1, n, n))

    ux = mx.forward(c, u0, dt)
    uf = mf.forward(c, u0, dt)
    assert float(jnp.abs(uf - ux).max()) < 1e-9

    uhat = 1.1 * ux[-1]
    px = mx.adjoint(ux, uhat, c, dt, "finaltime")
    pf = mf.adjoint(ux, uhat, c, dt, "finaltime")
    assert float(jnp.abs(pf - px).max()) < 1e-9

    px = mx.adjoint(ux, 1.1 * ux, c, dt, "alltime")
    pf = mf.adjoint(ux, 1.1 * ux, c, dt, "alltime")
    assert float(jnp.abs(pf - px).max()) < 1e-9


def test_drift_checkpointed_adjoint_matches():
    """DriftControlModel.adjoint_checkpointed (segmented recompute) matches
    the stored-trajectory adjoint."""
    import numpy as np

    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import (
        DriftControlModel, slotted_cylinder_ic)
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 17, 8, 1e-3
    g = Grid(-1.0, 1.0, n)
    m = DriftControlModel(g, eps=0.0, om=np.pi / 40,
                          solver_opts=SolverOpts(tol=1e-13))
    rng = np.random.RandomState(2)
    u0 = jnp.asarray(slotted_cylinder_ic(g, 0.05))
    c = jnp.asarray(0.5 * rng.rand(steps + 1, n, n))
    u = m.forward(c, u0, dt)
    for optim, uhat in (("finaltime", 1.1 * u[-1]), ("alltime", 1.1 * u)):
        p_ref = m.adjoint(u, uhat, c, dt, optim)
        p_ck = m.adjoint_checkpointed(c, u0, uhat, dt, optim, num_segments=4)
        assert float(jnp.abs(p_ck - p_ref).max()) < 1e-9, optim


def test_synth_sweeps_match_xla_schnakenberg():
    """Schnakenberg SYNTH whole-sweep kernels (M/K from iota masks +
    in-kernel wind assembly) match the XLA path at solver tolerance."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 24, 4, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    ms = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    ms.force_synth = True
    assert ms._use_synth_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), 0.1)

    ux, vx = mx.forward(c, u0, v0, dt)
    us, vs = ms.forward(c, u0, v0, dt)
    assert float(jnp.abs(us - ux).max()) < 1e-9
    assert float(jnp.abs(vs - vx).max()) < 1e-9

    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, optim)
        ps, qs = ms.adjoint(ux, vx, uhat, vhat, dt, optim)
        assert float(jnp.abs(ps - px).max()) < 1e-9, optim
        assert float(jnp.abs(qs - qx).max()) < 1e-9, optim


def test_lean_sweeps_match_xla_chemotaxis():
    """LEAN whole-sweep kernels (ONE resident 7-plane buffer, raw A parked
    in an HBM scratch around the Krylov solve, HBM-staged adjoint frames —
    the ≥1024² variant) match the XLA path at solver tolerance: forward
    and adjoint, finaltime and alltime."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 33, 6, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    ml = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    ml.force_lean = True
    assert ml._use_synth_sweep() and ml._use_lean_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.gamma)

    ux, vx = mx.forward(c, u0, v0, dt)
    ul, vl = ml.forward(c, u0, v0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9

    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        pl_, ql = ml.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        assert float(jnp.abs(pl_ - px).max()) < 1e-9, optim
        assert float(jnp.abs(ql - qx).max()) < 1e-9, optim


def test_lean_sweeps_match_xla_mimura():
    """Lean kernels with the Mimura m²(1-m) reaction (S enters the pairwise
    transient Low transform)."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 17, 4, 1e-2
    g = Grid(0.0, 2.0, n)
    mx = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13))
    ml = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13),
                     backend="pallas_fused")
    ml.force_lean = True
    m0np, f0np = mx.ic()
    m0, f0 = jnp.asarray(m0np), jnp.asarray(f0np)
    c = jnp.ones((steps + 1, n, n))

    ux, vx = mx.forward(c, m0, f0, dt)
    ul, vl = ml.forward(c, m0, f0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9

    uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
    px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, "finaltime")
    pl_, ql = ml.adjoint(ux, vx, uhat, vhat, c, dt, "finaltime")
    assert float(jnp.abs(pl_ - px).max()) < 1e-9
    assert float(jnp.abs(ql - qx).max()) < 1e-9


def test_lean_routing_and_vmem_budgets():
    """Tier routing against the hardware-calibrated VMEM caps (round 4):
    the single-block synth/lean tiers cap near 640² f32; 1024² routes to
    the banded XL kernels for every XL-capable family."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.pallas_kernels import (
        fits_vmem_lean, fits_vmem_synth, fits_vmem_xl)

    assert fits_vmem_synth(512, jnp.float32)
    assert not fits_vmem_synth(768, jnp.float32)
    assert fits_vmem_lean(640, jnp.float32)
    assert not fits_vmem_lean(1024, jnp.float32)
    assert fits_vmem_xl(1024, jnp.float32)
    assert not fits_vmem_xl(2048, jnp.float32)

    model = ChemotaxisModel(Grid(0.0, 1.0, 1024), backend="pallas_fused",
                            dtype=jnp.float32)
    assert model.backend == "pallas_fused"
    assert model._use_synth_sweep() and model._use_xl_sweep()

    # scalar families keep the fused backend through the XL tier too (the
    # scalar sweep auto-dispatches internally)
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    m = NonlinearModel(Grid(0.0, 1.0, 1024), backend="pallas_fused",
                       dtype=jnp.float32)
    assert m.backend == "pallas_fused"


def test_lean_sweeps_match_xla_schnakenberg():
    """Schnakenberg LEAN whole-sweep kernels (one 7-plane buffer +
    HBM-parked raw A) match the XLA path at solver tolerance."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 24, 4, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    ml = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    ml.force_lean = True
    assert ml._use_synth_sweep() and ml._use_lean_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), 0.1)

    ux, vx = mx.forward(c, u0, v0, dt)
    ul, vl = ml.forward(c, u0, v0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9

    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, optim)
        pl_, ql = ml.adjoint(ux, vx, uhat, vhat, dt, optim)
        assert float(jnp.abs(pl_ - px).max()) < 1e-9, optim
        assert float(jnp.abs(ql - qx).max()) < 1e-9, optim


def test_lean_scalar_sweep_matches_resident():
    """fused_scalar_fct_sweep_lean (one 7-plane buffer, HBM-resident
    stationary flux matrix, synthesized mass) matches the resident scalar
    sweep on every mode combination it dispatches for."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.ops.pallas_fused import (
        fused_scalar_fct_sweep, fused_scalar_fct_sweep_lean)

    n, steps, dt = 33, 4, 1e-3
    g = Grid(0.0, 1.0, n)
    m = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(m.ic())
    kw = dict(h=g.h, dt=dt, tol=1e-13, iters=300)

    # state-mode (nonflux +1, mass load)
    load = jnp.asarray(rng.standard_normal((steps, 1, n, n)))
    a = fused_scalar_fct_sweep(load, x0, m.A_state, m.M, m.M_diag,
                               m.ML_diag, nonflux_mode=+1, **kw)
    b = fused_scalar_fct_sweep_lean(load, x0, m.A_state, m.M, m.M_diag,
                                    m.ML_diag, nonflux_mode=+1, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    # adjoint-mode (reverse, nonflux -1, precomputed loads + stored state)
    load2 = jnp.asarray(rng.standard_normal((steps, 2, n, n)))
    a = fused_scalar_fct_sweep(load2, x0, m.A_adjoint, m.M, m.M_diag,
                               m.ML_diag, nonflux_mode=-1, load_is_mass=False,
                               reverse=True, **kw)
    b = fused_scalar_fct_sweep_lean(load2, x0, m.A_adjoint, m.M, m.M_diag,
                                    m.ML_diag, nonflux_mode=-1,
                                    load_is_mass=False, reverse=True, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    # reaction channel (MMS finaltime-exact g(t) IMEX term)
    load3 = jnp.asarray(rng.standard_normal((steps, 2, n, n)))
    a = fused_scalar_fct_sweep(load3, x0, m.A_state, m.M, m.M_diag,
                               m.ML_diag, reaction=True, **kw)
    b = fused_scalar_fct_sweep_lean(load3, x0, m.A_state, m.M, m.M_diag,
                                    m.ML_diag, reaction=True, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9


def test_lean_drift_sweep_matches_resident():
    """fused_drift_fct_sweep_lean matches the resident drift sweep (forward
    and reverse/misfit modes; in-kernel per-step Adrift assembly on the
    single-buffer park path)."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import DriftControlModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.ops.pallas_fused import (
        fused_drift_fct_sweep, fused_drift_fct_sweep_lean)

    n, steps, dt = 33, 4, 1e-3
    g = Grid(-1.0, 1.0, n)
    m = DriftControlModel(g, 1e-4, 2.0, solver_opts=SolverOpts(tol=1e-13))
    rng = np.random.default_rng(11)
    x0 = jnp.asarray(np.exp(-4 * (g.xy[0] ** 2 + g.xy[1] ** 2)))
    A_base = m.eps * m.K - m.Nrot
    kw = dict(h=g.h, dt=dt, drift=m.drift, tol=1e-13, iters=300)

    frames = jnp.asarray(rng.uniform(0.0, 1.0, (steps, 1, n, n)))
    a = fused_drift_fct_sweep(frames, x0, A_base, m.M, m.M_diag, m.ML_diag,
                              sign=-1, **kw)
    b = fused_drift_fct_sweep_lean(frames, x0, A_base, m.M, m.M_diag,
                                   m.ML_diag, sign=-1, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    frames2 = jnp.asarray(rng.uniform(0.0, 1.0, (steps, 2, n, n)))
    A_adj = m.eps * m.K + m.Nrot
    a = fused_drift_fct_sweep(frames2, x0, A_adj, m.M, m.M_diag, m.ML_diag,
                              sign=+1, reverse=True, has_mis=True, **kw)
    b = fused_drift_fct_sweep_lean(frames2, x0, A_adj, m.M, m.M_diag,
                                   m.ML_diag, sign=+1, reverse=True,
                                   has_mis=True, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9


def test_quad_degree_fast_path_chemotaxis():
    """Opt-in reduced quadrature (quad_degree=2) for the e^{-ηu}∇v transport
    assembly: the fused resident sweep matches the XLA sweep at the SAME
    degree to machine level, and the degree-2 operator stays close to the
    reference degree-4 one (non-polynomial integrand: small, nonzero gap)."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 24)
    dt, steps = 5e-4, 6

    def run(backend, qd):
        m = ChemotaxisModel(g, rescaling=1.0,
                            solver_opts=SolverOpts(tol=1e-13),
                            backend=backend, quad_degree=qd)
        u0np, v0np = m.ic()
        c = jnp.full((steps + 1, g.n, g.n), 100.0)
        return m.forward(c, jnp.asarray(u0np), jnp.asarray(v0np), dt)

    u4, v4 = run("xla", 4)
    u2, v2 = run("xla", 2)
    # degree change perturbs the transport operator only slightly
    rel = float(jnp.abs(u2 - u4).max() / jnp.abs(u4).max())
    assert 0.0 < rel < 5e-3, rel

    uf2, vf2 = run("pallas_fused", 2)
    assert float(jnp.abs(uf2 - u2).max()) < 1e-9
    assert float(jnp.abs(vf2 - v2).max()) < 1e-9

    # the synth and lean kernel tiers honor the fast quadrature too
    def run_tier(tier, qd):
        m = ChemotaxisModel(g, rescaling=1.0,
                            solver_opts=SolverOpts(tol=1e-13),
                            backend="pallas_fused", quad_degree=qd)
        setattr(m, tier, True)
        u0np, v0np = m.ic()
        c = jnp.full((steps + 1, g.n, g.n), 100.0)
        return m.forward(c, jnp.asarray(u0np), jnp.asarray(v0np), dt)

    us2, _ = run_tier("force_synth", 2)
    assert float(jnp.abs(us2 - u2).max()) < 1e-9
    ul2, _ = run_tier("force_lean", 2)
    assert float(jnp.abs(ul2 - u2).max()) < 1e-9


def test_lane_aligned_assembly_matches_window():
    """Opt-in lane-aligned transport assembly (rolled full planes +
    iota-mask scatter, pallas_fused._assemble_forward_A_aligned) matches
    the (n-1)-window assembly to machine level through the full resident
    fused forward sweep."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid(0.0, 1.0, 24)
    dt, steps = 5e-4, 6

    def run(aligned):
        m = ChemotaxisModel(g, rescaling=1.0,
                            solver_opts=SolverOpts(tol=1e-13),
                            backend="pallas_fused")
        m.lane_aligned = aligned
        u0np, v0np = m.ic()
        c = jnp.full((steps + 1, g.n, g.n), 100.0)
        return m.forward(c, jnp.asarray(u0np), jnp.asarray(v0np), dt)

    uw, vw = run(False)
    ua, va = run(True)
    assert float(jnp.abs(ua - uw).max()) < 1e-11
    assert float(jnp.abs(va - vw).max()) < 1e-11


def test_xl_sweep_matches_xla_chemotaxis():
    """Banded XL forward kernel (full-plane VMEM state slots + banded
    solver-loop bodies, the >= 1024^2 tier) against the XLA path; the
    adjoint at XL sizes routes to the XLA fallback, which must keep the
    (result, stats) contract intact."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 32, 6, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    ml = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13),
                         backend="pallas_fused")
    ml.force_xl = True
    assert ml._use_synth_sweep() and ml._use_xl_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.gamma)

    ux, vx = mx.forward(c, u0, v0, dt)
    ul, vl = ml.forward(c, u0, v0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9
    rep = ml.invariant_report()
    assert rep is not None and rep["ok"]

    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        pl_, ql = ml.adjoint(ux, vx, uhat, vhat, c, dt, optim)
        assert float(jnp.abs(pl_ - px).max()) < 1e-9, optim
        assert float(jnp.abs(ql - qx).max()) < 1e-9, optim


def test_xl_sweep_matches_xla_mimura():
    """XL forward kernel with the Mimura m²(1-m) reaction terms (the banded
    rhs/rdot quadrature path)."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 32, 4, 1e-2
    g = Grid(0.0, 2.0, n)
    mx = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13))
    ml = MimuraModel(g, solver_opts=SolverOpts(tol=1e-13),
                     backend="pallas_fused")
    ml.force_xl = True
    m0np, f0np = mx.ic()
    m0, f0 = jnp.asarray(m0np), jnp.asarray(f0np)
    c = jnp.ones((steps + 1, n, n))

    ux, vx = mx.forward(c, m0, f0, dt)
    ul, vl = ml.forward(c, m0, f0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9

    # adjoint with the mimura non-flux S planes in the banded Low transform
    mhat, fhat = 1.01 * ux[-1], 1.02 * vx[-1]
    px, qx = mx.adjoint(ux, vx, mhat, fhat, c, dt, "finaltime")
    pl_, ql = ml.adjoint(ux, vx, mhat, fhat, c, dt, "finaltime")
    assert float(jnp.abs(pl_ - px).max()) < 1e-9
    assert float(jnp.abs(ql - qx).max()) < 1e-9


def test_xl_sweep_jacobi_and_odd_bands():
    """XL kernel with the Jacobi preconditioner and a non-default band
    count (nb=4 at n=32 -> nr=8, the minimum sublane-aligned band)."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.ops.pallas_fused import (
        fused_chemotaxis_forward_sweep_xl)

    n, steps, dt = 32, 4, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = ChemotaxisModel(g, rescaling=1.0, solver_opts=SolverOpts(tol=1e-13))
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.gamma)
    ux, vx = mx.forward(c, u0, v0, dt)
    p = mx.params
    for precond in ("jacobi", "dct"):
        uxl, vxl = fused_chemotaxis_forward_sweep_xl(
            c, u0, v0, h=g.h, dt=dt, Dm=p.Dm, Df=p.Df, delta=p.delta,
            chi=p.chi, eta=p.eta, rescaling=1.0, tol=1e-13, iters=400,
            nb=4, precond=precond)
        assert float(jnp.abs(uxl - ux).max()) < 1e-9, precond
        assert float(jnp.abs(vxl - vx).max()) < 1e-9, precond


def test_xl_sweeps_match_xla_schnak():
    """Banded XL Schnakenberg forward + adjoint vs the XLA path (the wind
    convection assembled per band with global-row-offset quadrature
    coordinates; non-flux gamma*M - 2*gamma*M_uv planes in the banded Low
    transform)."""
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts

    n, steps, dt = 32, 5, 5e-4
    g = Grid(0.0, 1.0, n)
    mx = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13))
    ml = SchnakenbergModel(g, solver_opts=SolverOpts(tol=1e-13),
                           backend="pallas_fused")
    ml.force_xl = True
    assert ml._use_synth_sweep() and ml._use_xl_sweep()
    u0np, v0np = mx.ic()
    u0, v0 = jnp.asarray(u0np), jnp.asarray(v0np)
    c = jnp.full((steps + 1, n, n), mx.params.c_a)

    ux, vx = mx.forward(c, u0, v0, dt)
    ul, vl = ml.forward(c, u0, v0, dt)
    assert float(jnp.abs(ul - ux).max()) < 1e-9
    assert float(jnp.abs(vl - vx).max()) < 1e-9

    for optim in ("finaltime", "alltime"):
        if optim == "finaltime":
            uhat, vhat = 1.01 * ux[-1], 1.02 * vx[-1]
        else:
            uhat, vhat = 1.01 * ux, 1.02 * vx
        px, qx = mx.adjoint(ux, vx, uhat, vhat, dt, optim)
        pl_, ql = ml.adjoint(ux, vx, uhat, vhat, dt, optim)
        assert float(jnp.abs(pl_ - px).max()) < 1e-9, optim
        assert float(jnp.abs(ql - qx).max()) < 1e-9, optim


def test_xl_scalar_sweep_matches_resident():
    """fused_scalar_fct_sweep_xl (banded XL single-field sweep, canonical
    stationary flux matrix in HBM, rhs re-derived from the preserved b)
    matches the resident scalar sweep on every mode combination."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.ops.pallas_fused import (
        fused_scalar_fct_sweep, fused_scalar_fct_sweep_xl)

    n, steps, dt = 32, 4, 1e-3
    g = Grid(0.0, 1.0, n)
    m = NonlinearModel(g, solver_opts=SolverOpts(tol=1e-13))
    rng = np.random.default_rng(7)
    x0 = jnp.asarray(m.ic())
    kw = dict(h=g.h, dt=dt, tol=1e-13, iters=300, nb=4)
    kwr = dict(h=g.h, dt=dt, tol=1e-13, iters=300)

    # state-mode (nonflux +1, mass load)
    load = jnp.asarray(rng.standard_normal((steps, 1, n, n)))
    a = fused_scalar_fct_sweep(load, x0, m.A_state, m.M, m.M_diag,
                               m.ML_diag, nonflux_mode=+1, **kwr)
    b = fused_scalar_fct_sweep_xl(load, x0, m.A_state, m.M, m.M_diag,
                                  m.ML_diag, nonflux_mode=+1, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    # adjoint-mode (reverse, nonflux -1, precomputed loads + stored state)
    load2 = jnp.asarray(rng.standard_normal((steps, 2, n, n)))
    a = fused_scalar_fct_sweep(load2, x0, m.A_adjoint, m.M, m.M_diag,
                               m.ML_diag, nonflux_mode=-1, load_is_mass=False,
                               reverse=True, **kwr)
    b = fused_scalar_fct_sweep_xl(load2, x0, m.A_adjoint, m.M, m.M_diag,
                                  m.ML_diag, nonflux_mode=-1,
                                  load_is_mass=False, reverse=True, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    # reaction channel (MMS finaltime-exact g(t) IMEX term)
    load3 = jnp.asarray(rng.standard_normal((steps, 2, n, n)))
    a = fused_scalar_fct_sweep(load3, x0, m.A_state, m.M, m.M_diag,
                               m.ML_diag, reaction=True, **kwr)
    b = fused_scalar_fct_sweep_xl(load3, x0, m.A_state, m.M, m.M_diag,
                                  m.ML_diag, reaction=True, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9


def test_xl_drift_sweep_matches_resident():
    """fused_drift_fct_sweep_xl (banded per-step Adrift assembly + the
    shared XL tail) matches the resident drift sweep, forward and
    reverse/misfit modes."""
    import jax.numpy as jnp
    import numpy as np

    from fem_fct_pdeco_tpu.grid import Grid
    from fem_fct_pdeco_tpu.models.advection import DriftControlModel
    from fem_fct_pdeco_tpu.ops.linalg import SolverOpts
    from fem_fct_pdeco_tpu.ops.pallas_fused import (
        fused_drift_fct_sweep, fused_drift_fct_sweep_xl)

    n, steps, dt = 32, 4, 1e-3
    g = Grid(0.0, 1.0, n)
    m = DriftControlModel(g, eps=1e-4, om=2 * np.pi, drift=(1.0, 1.0),
                          solver_opts=SolverOpts(tol=1e-13))
    rng = np.random.default_rng(3)
    X, Y = g.xy
    x0 = jnp.asarray(np.exp(-50.0 * ((X - 0.5) ** 2 + (Y - 0.5) ** 2)))
    A_base = m.eps * m.K - m.Nrot
    kw = dict(h=g.h, dt=dt, tol=1e-13, iters=300, drift=m.drift)

    frames = jnp.asarray(rng.standard_normal((steps, 1, n, n)))
    a = fused_drift_fct_sweep(frames, x0, A_base, m.M, m.M_diag, m.ML_diag,
                              sign=-1.0, **kw)
    b = fused_drift_fct_sweep_xl(frames, x0, A_base, m.M, m.M_diag,
                                 m.ML_diag, sign=-1.0, nb=4, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9

    A_adj = m.eps * m.K + m.Nrot
    frames2 = jnp.asarray(rng.standard_normal((steps, 2, n, n)))
    a = fused_drift_fct_sweep(frames2, x0, A_adj, m.M, m.M_diag, m.ML_diag,
                              sign=+1.0, reverse=True, has_mis=True, **kw)
    b = fused_drift_fct_sweep_xl(frames2, x0, A_adj, m.M, m.M_diag,
                                 m.ML_diag, sign=+1.0, reverse=True,
                                 has_mis=True, nb=4, **kw)
    assert float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-30)) < 1e-9
