"""Projected gradient descent driver with Armijo fail/restart recovery.

Replicates the outer PDECO loop shared by the reference's refactored drivers
(Schnak_FCT_PDECO_refactored.py:162-259,
chemotaxis_FCT_PDECO_refactored.py:183-287,
nonlinear_FCT_PDECO_refactored.py:144-230):

- descent direction from the model's gradient equation
- projected Armijo line search (re-solving the state per trial)
- adjoint re-solve
- failure state machine: ``fail_count`` counts consecutive Armijo
  non-convergences (cap ``fail_limit``), ``fail_restart_count`` counts
  recoveries (cap ``restart_limit``), ``fail_pass`` keeps the loop alive
  past the tolerance, and a backup of the best solution is restored on
  failure exit.
- stopping criterion |J_new - J_old| / |J_old| < tol.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable

import jax.numpy as jnp

from fem_fct_pdeco_tpu.optimize.armijo import armijo_line_search
from fem_fct_pdeco_tpu.optimize.cost import rel_err


@dataclasses.dataclass(frozen=True)
class PGDConfig:
    beta: float
    tol: float = 1e-4
    max_iter_gd: int = 50
    max_iter_armijo: int = 10
    c_lower: float = 0.0
    c_upper: float = 1.0
    gam: float = 1e-4
    s0: float = 1.0
    fail_limit: int = 3
    restart_limit: int = 5
    checkpoint_path: str | None = None  # enable save/resume when set
    checkpoint_every: int = 1
    # Armijo trial batching: >1 evaluates that many candidate steps per
    # vmapped sweep (armijo_line_search); needs a batched_solver
    armijo_batch: int = 1


@dataclasses.dataclass
class PGDResult:
    control: jnp.ndarray
    state: tuple
    adjoint: tuple
    cost: float
    iterations: int
    status: str
    history: dict
    duration: float


def projected_gradient_descent(
    *,
    config: PGDConfig,
    c0: jnp.ndarray,
    solve_state: Callable,       # (control) -> state tuple
    solve_adjoint: Callable,     # (state, control) -> adjoint tuple
    descent_direction: Callable, # (control, state, adjoint) -> direction
    cost_fn: Callable,           # (state, control) -> float
    control_norm_sq: Callable,   # (control traj) -> float
    fidelity_fn: Callable | None = None,  # (state) -> dict of misfit norms
    callback: Callable | None = None,     # (it, locals dict) -> None
    linear_increments: Callable | None = None,  # (direction) -> increments
    batched_solver: Callable | None = None,  # (stacked controls) -> states
    invariant_fn: Callable | None = None,  # () -> dict | None (FCT telemetry)
) -> PGDResult:
    cfg = config
    t_start = time.time()

    resumed = None
    if cfg.checkpoint_path:
        from fem_fct_pdeco_tpu.utils.checkpoint import load_pgd_checkpoint

        resumed = load_pgd_checkpoint(cfg.checkpoint_path)

    if resumed is not None:
        ck = jnp.asarray(resumed["control"])
        state = solve_state(ck)
        adj = solve_adjoint(state, ck)
        cost_old = resumed["cost_old"]
        history = resumed["history"]
        it = resumed["it"]
        fail_count = resumed["fail_count"]
        fail_restart_count = resumed["fail_restart_count"]
        fail_pass = resumed["fail_pass"]
        if "backup_control" in resumed:
            bc = jnp.asarray(resumed["backup_control"])
            bstate = solve_state(bc)
            backup = (bstate, solve_adjoint(bstate, bc), bc, resumed["backup_it"])
        else:
            backup = (state, adj, ck, it)
    else:
        ck = c0
        state = solve_state(ck)
        adj = solve_adjoint(state, ck)
        cost_old = float(cost_fn(state, ck))
        history = {
            "cost": [cost_old],
            "fidelity": [],
            "control_norm_sq": [],
            "armijo_iters": [],
            "min_rowsum": [],
        }
        it = 0
        fail_count = 0
        fail_restart_count = 0
        fail_pass = False
        # the backup always holds the last ACCEPTED solution (initially c0):
        # on an Armijo failure at iteration 0 the reference restores the
        # pre-failure state, not the failed trial
        # (Schnak_FCT_PDECO_refactored.py:180-215, 253-259)
        backup = (state, adj, ck, it)

    status = "converged"
    stop_crit = (2.0 + cfg.tol)  # mirrors the reference's warm start value

    while (stop_crit >= cfg.tol or fail_pass) and it < cfg.max_iter_gd:
        dk = descent_direction(ck, state, adj)

        res = armijo_line_search(
            ck, dk, state, cost_old,
            cost_fn=cost_fn,
            control_norm_sq=control_norm_sq,
            c_lower=cfg.c_lower, c_upper=cfg.c_upper,
            solver=solve_state if linear_increments is None else None,
            increments=None if linear_increments is None else linear_increments(dk),
            gam=cfg.gam, max_iter=cfg.max_iter_armijo, s0=cfg.s0,
            batched_solver=batched_solver, batch=cfg.armijo_batch,
        )
        state, ck = res.state, res.control
        if linear_increments is not None:
            # the increment state u + s w is exact only for truly linear
            # solves; FCT's limiter is nonlinear, so refresh the state at the
            # accepted control before the adjoint solve
            state = solve_state(ck)
        adj = solve_adjoint(state, ck)

        if not res.converged:
            fail_count += 1
            fail_pass = True
            if fail_count == cfg.fail_limit:
                status = "armijo_fail_limit"
                it += 1
                break
        else:
            if fail_count > 0:
                fail_count = 0
                fail_restart_count += 1
                fail_pass = False
            if fail_restart_count < cfg.restart_limit:
                backup = (state, adj, ck, it)
            elif fail_restart_count == cfg.restart_limit:
                status = "restart_limit"
                it += 1
                break

        cost_new = float(cost_fn(state, ck))
        stop_crit = rel_err(cost_new, cost_old)

        history["cost"].append(cost_new)
        history["armijo_iters"].append(res.iterations)
        if fidelity_fn is not None:
            history["fidelity"].append(fidelity_fn(state))
        history["control_norm_sq"].append(float(control_norm_sq(ck)))
        if invariant_fn is not None:
            # always-on FCT safety telemetry (reference: unconditional
            # per-step M-matrix check, helpers.py:1784-1810): min low-order
            # row sum over ALL sweeps this iteration ran
            inv = invariant_fn()
            history.setdefault("min_rowsum", []).append(
                inv["min_rowsum"] if inv else float("nan"))

        if callback is not None:
            callback(it, dict(cost=cost_new, stop_crit=stop_crit,
                              armijo_iters=res.iterations, control=ck,
                              state=state, adjoint=adj, history=history))
        it += 1
        cost_old = cost_new

        if cfg.checkpoint_path and it % cfg.checkpoint_every == 0:
            from fem_fct_pdeco_tpu.utils.checkpoint import save_pgd_checkpoint

            save_pgd_checkpoint(
                cfg.checkpoint_path, control=ck, it=it, cost_old=cost_old,
                history=history, fail_count=fail_count,
                fail_restart_count=fail_restart_count, fail_pass=fail_pass,
                backup_control=backup[2] if backup else None,
                backup_it=backup[3] if backup else None,
            )

    if it >= cfg.max_iter_gd and status == "converged" and stop_crit >= cfg.tol:
        status = "max_iterations"

    # restore backup on failure exit (Schnak_FCT_PDECO_refactored.py:253-259)
    restore = (
        fail_count == cfg.fail_limit
        or fail_restart_count == cfg.restart_limit
        or (it == cfg.max_iter_gd and fail_count > 0)
    )
    if restore and backup is not None:
        state, adj, ck, _ = backup
        status += "_restored_backup"

    return PGDResult(
        control=ck, state=state, adjoint=adj,
        cost=float(cost_fn(state, ck)), iterations=it, status=status,
        history=history, duration=time.time() - t_start,
    )
