"""Projected Armijo line search (reference ``armijo_line_search_ref``,
helpers.py:1583-1713).

The trial loop stays host-side (the trial count varies run to run) and calls
jit-compiled state sweeps and cost evaluations; every trial re-solves the
(nonlinear) state system, or uses precomputed linear increments
``var + s * w`` for linear problems (helpers.py:1684-1694).

Acceptance: J(c_inc) - J(c) <= -(gam / s) ||c_inc - c||^2_{L^2(Q)}
— the stationarity measure of Hinze p.107 (helpers.py:1696-1708).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class ArmijoResult:
    state: tuple
    control: jnp.ndarray
    iterations: int
    step_size: float
    converged: bool
    cost: float


def armijo_line_search(
    control: jnp.ndarray,
    direction: jnp.ndarray,
    state: tuple,
    cost_init: float,
    *,
    cost_fn: Callable,          # (state_tuple, control) -> float
    control_norm_sq: Callable,  # (control_diff_traj) -> float  (L2(Q)^2)
    c_lower: float,
    c_upper: float,
    solver: Callable | None = None,     # (control) -> state_tuple
    increments: tuple | None = None,    # linear increments (w1[, w2])
    gam: float = 1e-4,
    max_iter: int = 10,
    s0: float = 1.0,
    batched_solver: Callable | None = None,  # (stacked controls) -> batched state
    batch: int = 1,
) -> ArmijoResult:
    """``batched_solver`` + ``batch`` > 1: evaluate ``batch`` candidate step
    sizes (s0, s0/2, ...) per round in ONE vmapped state sweep and accept
    the LARGEST passing s — the accepted-step sequence is identical to the
    sequential halving loop (the reference's semantics,
    helpers.py:1683-1708), but each round costs one batched sweep instead
    of up to ``batch`` sequential sweep+sync round trips.

    Batching only applies to solver-based trials; linear-increment problems
    (``increments`` given, helpers.py:1684-1694) re-use precomputed
    ``var + s * w`` states, so each trial is already solver-free and cheap —
    those runs fall back to the sequential loop with a loud notice."""
    if batched_solver is not None and batch > 1 and increments is not None:
        import warnings

        warnings.warn(
            "armijo batch > 1 has no effect with linear increments "
            "(helpers.py:1684-1694): trials are solver-free; running the "
            "sequential halving loop",
            stacklevel=2,
        )
    if batched_solver is not None and increments is None and batch > 1:
        k = 0
        new_state, c_inc, cost2, s = state, control, cost_init, s0
        while k < max_iter:
            nb = min(batch, max_iter - k)
            svals = [s0 / 2.0 ** j for j in range(k, k + nb)]
            c_incs = jnp.stack([
                jnp.clip(control + sv * direction, c_lower, c_upper)
                for sv in svals
            ])
            states = batched_solver(c_incs)
            for j, sv in enumerate(svals):
                new_state = tuple(t[j] for t in states)
                c_inc, s = c_incs[j], sv
                cost2 = float(cost_fn(new_state, c_inc))
                cdiff = float(control_norm_sq(c_inc - control))
                if cost2 - cost_init <= -gam / sv * cdiff:
                    return ArmijoResult(new_state, c_inc, k + j + 1, sv,
                                        True, cost2)
            k += nb
        # Match the sequential loop's failure contract: it halves s after
        # the last (failed) trial, so the reported step is s0 / 2^max_iter.
        return ArmijoResult(new_state, c_inc, max_iter, s / 2.0, False, cost2)

    s = s0
    armijo = float("inf")
    cdiff = 1.0
    new_state, c_inc, cost2 = state, control, cost_init

    for k in range(max_iter):
        c_inc = jnp.clip(control + s * direction, c_lower, c_upper)
        if increments is None:
            new_state = solver(c_inc)
        else:
            new_state = tuple(
                v if w is None else v + s * w for v, w in zip(state, increments)
            )
        cost2 = float(cost_fn(new_state, c_inc))
        armijo = cost2 - cost_init
        cdiff = float(control_norm_sq(c_inc - control))
        if armijo <= -gam / s * cdiff:
            return ArmijoResult(new_state, c_inc, k + 1, s, True, cost2)
        s /= 2.0

    return ArmijoResult(new_state, c_inc, max_iter, s, False, cost2)
