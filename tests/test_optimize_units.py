"""Unit tests for the optimization layer against simple oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
from fem_fct_pdeco_tpu.optimize import l2_norm_sq_omega, l2_norm_sq_q
from fem_fct_pdeco_tpu.optimize.armijo import armijo_line_search


def test_l2_norms_vs_dense():
    g = Grid(0.0, 1.0, 9)
    asm = P1Assembler(g)
    Md = st.to_dense(np.asarray(asm.mass))
    rng = np.random.default_rng(0)
    phi = rng.standard_normal((5, 9, 9))
    dt = 0.1
    got = float(l2_norm_sq_q(jnp.asarray(phi), dt, asm.mass))
    # trapezoid oracle (helpers.py:330-360)
    w = np.ones(5)
    w[0] = w[-1] = 0.5
    want = sum(w[i] * phi[i].ravel() @ Md @ phi[i].ravel() for i in range(5)) * dt
    assert got == pytest.approx(want, rel=1e-12)
    got1 = float(l2_norm_sq_omega(jnp.asarray(phi[0]), asm.mass))
    assert got1 == pytest.approx(phi[0].ravel() @ Md @ phi[0].ravel(), rel=1e-12)


def test_armijo_halves_step_and_accepts():
    """Quadratic objective: J(c) = ||c - 1||^2; from c=0 with d=4 (overshoot),
    Armijo must halve until the decrease condition holds."""
    g = Grid(0.0, 1.0, 5)
    asm = P1Assembler(g)
    target = jnp.ones((2, 5, 5))

    def cost_fn(state, c):
        return float(jnp.sum((c - target) ** 2))

    def solver(c):
        return ("dummy",)

    c0 = jnp.zeros((2, 5, 5))
    d = 4.0 * jnp.ones_like(c0)  # step s=1 overshoots to c=4
    res = armijo_line_search(
        c0, d, ("dummy",), cost_fn(("dummy",), c0),
        cost_fn=cost_fn,
        control_norm_sq=lambda c: l2_norm_sq_q(c, 0.1, asm.mass),
        c_lower=-10.0, c_upper=10.0, solver=solver, gam=1e-4, max_iter=10,
    )
    assert res.converged
    assert res.step_size < 1.0  # halved at least once
    assert cost_fn(None, res.control) < cost_fn(None, c0)


def test_armijo_reports_failure():
    """An objective that always increases: Armijo exhausts max_iter and
    reports non-convergence (the reference returns k+1 == max_iter,
    triggering the drivers' fail machinery)."""
    g = Grid(0.0, 1.0, 5)
    asm = P1Assembler(g)

    def cost_fn(state, c):
        return float(jnp.sum(c**2)) + 1.0  # any move from c=0 increases

    c0 = jnp.zeros((2, 5, 5))
    d = jnp.ones_like(c0)
    res = armijo_line_search(
        c0, d, (None,), 0.5,  # cost_init below anything reachable
        cost_fn=cost_fn,
        control_norm_sq=lambda c: l2_norm_sq_q(c, 0.1, asm.mass),
        c_lower=-10.0, c_upper=10.0, solver=lambda c: (None,),
        gam=1e-4, max_iter=4,
    )
    assert not res.converged
    assert res.iterations == 4


def test_pgd_backup_restores_initial_control_on_first_iter_failure():
    """Armijo failure from iteration 0 onward: the restored backup must be
    the pre-failure (initial) control, not a failed trial
    (Schnak_FCT_PDECO_refactored.py:180-215, 253-259)."""
    from fem_fct_pdeco_tpu.optimize.pgd import PGDConfig, projected_gradient_descent

    g = Grid(0.0, 1.0, 5)
    asm = P1Assembler(g)
    c0 = jnp.zeros((2, 5, 5))

    def cost_fn(state, c):
        # minimum at c = 0: every move away from c0 increases the cost, so
        # Armijo can never accept a trial
        return float(jnp.sum(c**2))

    res = projected_gradient_descent(
        config=PGDConfig(beta=1.0, tol=1e-12, max_iter_gd=20,
                         max_iter_armijo=3, c_lower=-10.0, c_upper=10.0,
                         fail_limit=3),
        c0=c0,
        solve_state=lambda c: (c,),
        solve_adjoint=lambda state, c: (jnp.zeros_like(c),),
        descent_direction=lambda c, state, adj: jnp.ones_like(c),
        cost_fn=cost_fn,
        control_norm_sq=lambda c: l2_norm_sq_q(c, 0.1, asm.mass),
    )
    assert res.status.endswith("_restored_backup")
    np.testing.assert_array_equal(np.asarray(res.control), np.asarray(c0))
    assert res.cost == pytest.approx(0.0)


def test_mixed_precision_norms_match_f64_oracle():
    """accum_dtype=f64 norms of f32 data must equal an independent NumPy f64
    oracle of the SAME f32 values to ~1e-13 (given an f64-assembled mass,
    as the drivers use), and be at least as close to it as the plain f32
    evaluation (optimize/cost.py mixed-precision mode)."""
    import oracles

    n, h, dt = 17, 1.0 / 16.0, 1e-3
    g = Grid(0.0, 1.0, n)
    M32 = P1Assembler(g, dtype=jnp.float32).mass
    M64 = P1Assembler(g, dtype=jnp.float64).mass
    rng = np.random.RandomState(3)
    traj32 = jnp.asarray(rng.rand(7, n, n), dtype=jnp.float32)

    Md = oracles.mass_dense(n, h)
    flat = np.asarray(traj32, dtype=np.float64).reshape(7, -1)
    per = np.einsum("ti,ij,tj->t", flat, Md, flat)
    w = np.ones(7); w[0] = w[-1] = 0.5
    oracle = float(np.sum(w * per) * dt)

    mixed = float(l2_norm_sq_q(traj32, dt, M64, accum_dtype=jnp.float64))
    plain = float(l2_norm_sq_q(traj32, dt, M32))
    assert abs(mixed - oracle) / oracle < 1e-12
    assert abs(mixed - oracle) <= abs(plain - oracle) + 1e-15 * oracle

    om_mixed = float(l2_norm_sq_omega(traj32[0], M64, accum_dtype=jnp.float64))
    om_oracle = float(flat[0] @ Md @ flat[0])
    assert abs(om_mixed - om_oracle) / om_oracle < 1e-12


def test_batched_armijo_matches_sequential():
    """Batched Armijo trials (evaluate K candidate steps per vmapped solve,
    accept the largest passing s) produce the IDENTICAL accepted step,
    state, and trial count as the sequential halving loop, for acceptance
    at every position including failure."""
    import jax
    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.optimize.armijo import armijo_line_search

    # synthetic 1-var problem: J(c) = ||c - target||^2 summed; solver is the
    # identity "state"; acceptance position is steered via the target
    target = jnp.asarray([[2.0]])
    control = jnp.asarray([[0.0]])

    def cost_fn(state, c):
        return float(jnp.sum((c - target) ** 2))

    def norm_sq(dc):
        return float(jnp.sum(dc**2))

    def solver(c):
        return (c,)

    def batched_solver(cs):
        return (cs,)

    for direction_scale in (2.0, 1.0, 0.5, 0.125, 1e-9):
        direction = jnp.full((1, 1), direction_scale)
        kw = dict(cost_fn=cost_fn, control_norm_sq=norm_sq,
                  c_lower=-10.0, c_upper=10.0, gam=1e-4, max_iter=5, s0=1.0)
        seq = armijo_line_search(control, direction, (control,), cost_fn((control,), control),
                                 solver=solver, **kw)
        for batch in (2, 3, 5):
            bat = armijo_line_search(control, direction, (control,),
                                     cost_fn((control,), control),
                                     solver=solver, batched_solver=batched_solver,
                                     batch=batch, **kw)
            assert bat.converged == seq.converged, direction_scale
            assert bat.iterations == seq.iterations, direction_scale
            assert bat.step_size == seq.step_size, direction_scale
            assert float(jnp.abs(bat.control - seq.control).max()) == 0.0

    # genuine all-fail: ascent direction (away from the target) means no
    # trial can decrease J — the batched failure branch must report the
    # same final step (s0 / 2^max_iter) and state as the sequential loop
    direction = jnp.full((1, 1), -1.0)
    kw = dict(cost_fn=cost_fn, control_norm_sq=norm_sq,
              c_lower=-10.0, c_upper=10.0, gam=1e-4, max_iter=5, s0=1.0)
    seq = armijo_line_search(control, direction, (control,),
                             cost_fn((control,), control), solver=solver, **kw)
    assert not seq.converged and seq.step_size == 1.0 / 2.0**5
    for batch in (2, 3, 5):
        bat = armijo_line_search(control, direction, (control,),
                                 cost_fn((control,), control), solver=solver,
                                 batched_solver=batched_solver, batch=batch,
                                 **kw)
        assert not bat.converged
        assert bat.iterations == seq.iterations
        assert bat.step_size == seq.step_size
        assert float(jnp.abs(bat.control - seq.control).max()) == 0.0


def test_batched_armijo_warns_on_linear_increments():
    """armijo batch > 1 + precomputed linear increments (helpers.py:1684-1694)
    cannot batch (trials are solver-free); the fallback to the sequential
    loop must be LOUD, mirroring _warn_backend_fallback semantics."""
    import warnings

    import jax.numpy as jnp

    from fem_fct_pdeco_tpu.optimize.armijo import armijo_line_search

    target = jnp.asarray([[2.0]])
    control = jnp.asarray([[0.0]])
    direction = jnp.full((1, 1), 1.0)

    def cost_fn(state, c):
        return float(jnp.sum((c - target) ** 2))

    def norm_sq(dc):
        return float(jnp.sum(dc**2))

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = armijo_line_search(
            control, direction, (control,), cost_fn((control,), control),
            cost_fn=cost_fn, control_norm_sq=norm_sq,
            c_lower=-10.0, c_upper=10.0,
            increments=(direction,),
            batched_solver=lambda cs: (cs,), batch=4,
            gam=1e-4, max_iter=5, s0=1.0)
    assert res.converged
    assert any("linear increments" in str(w.message) for w in rec)
