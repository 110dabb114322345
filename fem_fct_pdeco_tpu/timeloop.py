"""Forward / adjoint time sweeps as ``lax.scan``.

The reference's sequential Python time loops (``for i in range(1,
num_steps+1)`` / ``reversed(range(num_steps))``, e.g. helpers.py:562, 664,
1321, 1480) become single compiled scans carrying the current state and
stacking the trajectory in HBM.  The "sequence axis" of this workload is
time; for grids where ``(num_steps+1) * n^2`` trajectories exceed HBM, wrap
the step function in ``jax.checkpoint`` segments (see docs/design.md).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def forward_sweep(
    step_fn: Callable,
    init_state,
    xs,
    unroll: int = 1,
):
    """Run ``state_{i} = step_fn(state_{i-1}, xs_i)`` for i = 1..num_steps.

    ``xs`` are per-step inputs already sliced to steps 1..num_steps (leading
    axis ``num_steps``). Returns the stacked trajectory *including* the
    initial state: each leaf has leading axis ``num_steps + 1``.
    """

    def body(carry, x):
        new = step_fn(carry, x)
        return new, new

    _, traj = jax.lax.scan(body, init_state, xs, unroll=unroll)
    return jax.tree.map(
        lambda i, t: jnp.concatenate([i[None], t], axis=0), init_state, traj
    )


def adjoint_sweep(
    step_fn: Callable,
    final_state,
    xs,
    unroll: int = 1,
):
    """Run a backward sweep: ``state_i = step_fn(state_{i+1}, xs_i)`` for
    i = num_steps-1 .. 0 (reference pattern helpers.py:664, 1480).

    ``xs`` has leading axis ``num_steps`` ordered i = 0..num_steps-1.
    Returns stacked trajectory including the final state (leading axis
    ``num_steps + 1``).
    """

    def body(carry, x):
        new = step_fn(carry, x)
        return new, new

    _, traj = jax.lax.scan(body, final_state, xs, reverse=True, unroll=unroll)
    return jax.tree.map(
        lambda f, t: jnp.concatenate([t, f[None]], axis=0), final_state, traj
    )
