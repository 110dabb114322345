"""Cost functionals and discrete norms (reference helpers.py:330-441).

Trajectories are ``(num_steps+1, n, n)`` fields; norms use the consistent
mass stencil in space and the trapezoidal rule in time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fem_fct_pdeco_tpu.ops import stencil as st


def l2_norm_sq_omega(phi: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    """||phi||^2_{L^2(Omega)} = phi^T M phi (helpers.py:362-381)."""
    return jnp.sum(phi * st.apply(M, phi))


def l2_norm_sq_q(phi_traj: jnp.ndarray, dt, M: jnp.ndarray) -> jnp.ndarray:
    """||phi||^2_{L^2(Q)}: trapezoid in time, mass matrix in space
    (helpers.py:330-360)."""
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
) -> jnp.ndarray:
    """J = misfit(s) + beta/2 ||c||^2_{L^2(Q)} (helpers.py:383-441).

    finaltime: targets are (n, n) final-time fields; misfit over Omega at T.
    alltime: targets are (num_steps+1, n, n); misfit over Q.
    """
    if optim not in ("alltime", "finaltime"):
        raise ValueError(f"invalid optim {optim!r}")
    if optim == "alltime":
        func = 0.5 * l2_norm_sq_q(var1_traj - var1_target, dt, M)
        if var2_traj is not None and var2_target is not None:
            func = func + 0.5 * l2_norm_sq_q(var2_traj - var2_target, dt, M)
    else:
        func = 0.5 * l2_norm_sq_omega(var1_traj[-1] - var1_target, M)
        if var2_traj is not None and var2_target is not None:
            func = func + 0.5 * l2_norm_sq_omega(var2_traj[-1] - var2_target, M)
    return func + beta / 2.0 * l2_norm_sq_q(control_traj, dt, M)


def rel_err(new, old) -> float:
    """|new - old| / |old| stopping metric (helpers.py:69-85)."""
    import numpy as np

    return float(np.linalg.norm(new - old) / np.linalg.norm(old))
