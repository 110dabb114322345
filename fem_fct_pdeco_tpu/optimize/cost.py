"""Cost functionals and discrete norms (reference helpers.py:330-441).

Trajectories are ``(num_steps+1, n, n)`` fields; norms use the consistent
mass stencil in space and the trapezoidal rule in time.

Mixed precision: every norm accepts ``accum_dtype`` — when set (typically
``jnp.float64`` with x64 enabled), the quadratic forms are evaluated in that
dtype while the sweeps stay in the field dtype. This gives parity-grade
objectives on f32 TPU sweeps: the norm is exact (to f64) for the f32
trajectory it is given, so Armijo decisions and stopping criteria are not
polluted by f32 reduction noise. (The reference is all-f64; this is the
TPU-native speed/accuracy split — see docs/roadmap.md.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fem_fct_pdeco_tpu.ops import stencil as st


def _cast(x, accum_dtype):
    return x if accum_dtype is None else x.astype(accum_dtype)


def l2_norm_sq_omega(phi: jnp.ndarray, M: jnp.ndarray,
                     accum_dtype=None) -> jnp.ndarray:
    """||phi||^2_{L^2(Omega)} = phi^T M phi (helpers.py:362-381)."""
    phi = _cast(phi, accum_dtype)
    M = _cast(M, accum_dtype)
    return jnp.sum(phi * st.apply(M, phi))


def l2_norm_sq_q(phi_traj: jnp.ndarray, dt, M: jnp.ndarray,
                 accum_dtype=None) -> jnp.ndarray:
    """||phi||^2_{L^2(Q)}: trapezoid in time, mass matrix in space
    (helpers.py:330-360)."""
    phi_traj = _cast(phi_traj, accum_dtype)
    M = _cast(M, accum_dtype)
    per_step = jax.vmap(lambda p: l2_norm_sq_omega(p, M))(phi_traj)
    w = jnp.ones(phi_traj.shape[0], dtype=phi_traj.dtype)
    w = w.at[0].set(0.5).at[-1].set(0.5)
    return jnp.sum(w * per_step) * dt


def cost_functional(
    var1_traj: jnp.ndarray,
    var1_target: jnp.ndarray,
    control_traj: jnp.ndarray,
    dt,
    M: jnp.ndarray,
    beta: float,
    optim: str,
    var2_traj: jnp.ndarray | None = None,
    var2_target: jnp.ndarray | None = None,
    accum_dtype=None,
) -> jnp.ndarray:
    """J = misfit(s) + beta/2 ||c||^2_{L^2(Q)} (helpers.py:383-441).

    finaltime: targets are (n, n) final-time fields; misfit over Omega at T.
    alltime: targets are (num_steps+1, n, n); misfit over Q.
    """
    if optim not in ("alltime", "finaltime"):
        raise ValueError(f"invalid optim {optim!r}")
    ad = accum_dtype
    if optim == "alltime":
        func = 0.5 * l2_norm_sq_q(
            _cast(var1_traj, ad) - _cast(var1_target, ad), dt, M, ad)
        if var2_traj is not None and var2_target is not None:
            func = func + 0.5 * l2_norm_sq_q(
                _cast(var2_traj, ad) - _cast(var2_target, ad), dt, M, ad)
    else:
        func = 0.5 * l2_norm_sq_omega(
            _cast(var1_traj[-1], ad) - _cast(var1_target, ad), M, ad)
        if var2_traj is not None and var2_target is not None:
            func = func + 0.5 * l2_norm_sq_omega(
                _cast(var2_traj[-1], ad) - _cast(var2_target, ad), M, ad)
    return func + beta / 2.0 * l2_norm_sq_q(control_traj, dt, M, ad)


def rel_err(new, old) -> float:
    """|new - old| / |old| stopping metric (helpers.py:69-85). A zero
    ``old`` (e.g. the initial all-zero control) yields inf — "not
    converged" — without tripping numpy's divide-by-zero warning."""
    import numpy as np

    den = float(np.linalg.norm(old))
    if den == 0.0:
        return float("inf")
    return float(np.linalg.norm(new - old) / den)
