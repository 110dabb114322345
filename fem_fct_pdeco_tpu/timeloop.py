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


def _stats_body(step_fn):
    """Scan body wrapping ``step_fn`` in the fct.collect_stats context: the
    carry gains a running MIN of every FCT low-order min-rowsum recorded
    during the step (the always-on safety telemetry, helpers.py:1784-1810)."""
    from fem_fct_pdeco_tpu.ops import fct

    def body(carry, x):
        state, m = carry
        with fct.collect_stats() as c:
            new = step_fn(state, x)
        return (new, jnp.minimum(m, c.min(m.dtype))), new

    return body


def _stats_init(init_state):
    from fem_fct_pdeco_tpu.ops import fct

    dt0 = jax.tree.leaves(init_state)[0].dtype
    return jnp.asarray(fct.STATS_SENTINEL, dt0)


def forward_sweep_stats(step_fn, init_state, xs, unroll: int = 1):
    """``forward_sweep`` that ALSO returns the sweep-wide minimum FCT
    low-order row sum (STATS_SENTINEL if no FCT step ran). One extra scalar
    in the scan carry — free next to the per-step Krylov solves."""
    (final, m), traj = jax.lax.scan(
        _stats_body(step_fn), (init_state, _stats_init(init_state)), xs,
        unroll=unroll)
    traj = jax.tree.map(
        lambda i, t: jnp.concatenate([i[None], t], axis=0), init_state, traj
    )
    return traj, m


def adjoint_sweep_stats(step_fn, final_state, xs, unroll: int = 1):
    """``adjoint_sweep`` with the same min-rowsum telemetry as
    ``forward_sweep_stats``."""
    (_, m), traj = jax.lax.scan(
        _stats_body(step_fn), (final_state, _stats_init(final_state)), xs,
        reverse=True, unroll=unroll)
    traj = jax.tree.map(
        lambda f, t: jnp.concatenate([t, f[None]], axis=0), final_state, traj
    )
    return traj, m


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


def checkpointed_adjoint(
    fwd_step: Callable,
    adj_step: Callable,
    init_state,
    fwd_xs,
    terminal_fn: Callable,
    adj_xs_fn: Callable,
    num_segments: int,
):
    """Segmented checkpoint/recompute adjoint — the long-trajectory mechanism
    (SURVEY §5): when the stored forward trajectory exceeds HBM, keep only
    segment-boundary states during the forward pass and recompute each
    segment's states on the fly during the backward sweep. Memory scales with
    num_steps/num_segments instead of num_steps. Generic over models: works
    for any pytree state carried by ``fwd_step``/``adj_step``.

    - ``fwd_xs``: per-step forward inputs (pytree with leading axis
      num_steps, already sliced to steps 1..num_steps).
    - ``terminal_fn(final_state) -> adjoint terminal carry``.
    - ``adj_xs_fn(seg_traj, s, seg) -> adjoint per-step inputs`` for segment
      ``s`` covering global steps [s*seg, (s+1)*seg); ``seg_traj`` is the
      recomputed forward trajectory of the segment INCLUDING its initial
      state (leading axis seg+1).

    Returns ``(adj_traj, min_rowsum)``: the full adjoint trajectory (leading
    axis num_steps+1, terminal state last), identical (to solver tolerance)
    to ``adjoint_sweep(adj_step, terminal_fn(...), ...)`` on the stored
    trajectory, plus the min FCT low-order row sum over EVERY step executed
    (initial forward, recomputed forward segments, adjoint sweeps — the
    always-on telemetry of forward_sweep_stats).
    """
    steps = jax.tree.leaves(fwd_xs)[0].shape[0]
    assert steps % num_segments == 0, (steps, num_segments)
    seg = steps // num_segments

    # 1. forward, keeping only segment-boundary states
    stats_body = _stats_body(fwd_step)

    def seg_fwd(carry, xs_seg):
        def body(c2, x):
            return stats_body(c2, x)[0], None

        out, _ = jax.lax.scan(body, carry, xs_seg)
        return out, carry[0]

    xs_seg = jax.tree.map(
        lambda a: a.reshape(num_segments, seg, *a.shape[1:]), fwd_xs
    )
    (final_state, m), bounds = jax.lax.scan(
        seg_fwd, (init_state, _stats_init(init_state)), xs_seg)
    adj_carry = terminal_fn(final_state)

    # 2. backward over segments (static Python loop): recompute the
    # segment's forward states, then adjoint-sweep it
    chunks = []
    for s in reversed(range(num_segments)):
        b0 = jax.tree.map(lambda b: b[s], bounds)
        sxs = jax.tree.map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, s * seg, seg, axis=0),
            fwd_xs,
        )
        seg_traj, mf = forward_sweep_stats(fwd_step, b0, sxs)
        adj_traj, ma = adjoint_sweep_stats(
            adj_step, adj_carry, adj_xs_fn(seg_traj, s, seg))
        m = jnp.minimum(m, jnp.minimum(mf, ma))
        # segment s covers global indices s*seg..(s+1)*seg; its first entry
        # duplicates segment s-1's last — keep the full chunk only for s = 0
        chunks.append(
            jax.tree.map(lambda t: t[1:] if s > 0 else t, adj_traj)
        )
        adj_carry = jax.tree.map(lambda t: t[0], adj_traj)
    chunks.reverse()
    return jax.tree.map(lambda *ts: jnp.concatenate(ts, axis=0), *chunks), m
