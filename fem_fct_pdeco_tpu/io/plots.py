"""Progress and solution plotting (matplotlib, Agg backend).

Covers the reference's visualization surface: per-iteration solution panels
(``plot_two_var_solution`` helpers.py:700-833, ``plot_nonlinear_solution``
helpers.py:1040-1131) and optimization-progress plots (``plot_progress``
helpers.py:1133-1195). Fields are already (n, n) vertex-ordered so they are
imshow-ready without DoF reordering.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def plot_solution_panels(
    out_folder: str,
    it: int,
    panels: dict,
    step: int,
    t: float,
    ncols: int = 4,
):
    """Generic per-timestep panel plot. ``panels`` maps title -> (n, n) field."""
    os.makedirs(out_folder, exist_ok=True)
    k = len(panels)
    nrows = (k + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 5 * nrows))
    axes = np.atleast_1d(axes).ravel()
    for ax, (title, field) in zip(axes, panels.items()):
        im = ax.imshow(np.asarray(field))
        fig.colorbar(im, ax=ax)
        ax.set_title(title)
    for ax in axes[k:]:
        ax.axis("off")
    fig.tight_layout(pad=3.0)
    fig.savefig(os.path.join(out_folder, f"it_{it}_plot_{step:03}.png"))
    plt.close(fig)


def plot_two_var_solution(
    u_traj, v_traj, p_traj, q_traj, c_traj, uhat, vhat, T_data, it,
    dt, out_folder, optim="finaltime", step_freq=20,
):
    """Reference plot_two_var_solution (helpers.py:700-833): desired vs
    computed states, adjoints and control at a subset of time steps."""
    num_steps = len(u_traj) - 1
    for i in range(num_steps):
        if not (i % step_freq == 0 or i == num_steps - 1):
            continue
        tU, tP = (i + 1) * dt, i * dt
        uh = uhat[i + 1] if optim == "alltime" else uhat
        vh = vhat[i + 1] if optim == "alltime" else vhat
        panels = {
            f"it={it}, desired u (t={T_data if optim=='finaltime' else round(tU,5)})": uh,
            f"computed u at t={round(tU, 5)}": u_traj[i + 1],
            f"adjoint p at t={round(tP, 5)}": p_traj[i],
            f"control c at t={round(tP, 5)}": c_traj[i],
            f"desired v": vh,
            f"computed v at t={round(tU, 5)}": v_traj[i + 1],
            f"adjoint q at t={round(tP, 5)}": q_traj[i],
        }
        plot_solution_panels(out_folder, it, panels, i, tU)


def plot_nonlinear_solution(
    u_traj, p_traj, c_traj, uhat_T, T_data, it, dt, out_folder, step_freq=20
):
    """Reference plot_nonlinear_solution (helpers.py:1040-1131)."""
    num_steps = len(u_traj) - 1
    for i in range(num_steps):
        if not (i % step_freq == 0 or i == num_steps - 1):
            continue
        tU, tP = (i + 1) * dt, i * dt
        panels = {
            f"it={it}, desired u (t={T_data})": uhat_T,
            f"computed u at t={round(tU, 5)}": u_traj[i + 1],
            f"adjoint p at t={round(tP, 5)}": p_traj[i],
            f"control c at t={round(tP, 5)}": c_traj[i],
        }
        plot_solution_panels(out_folder, it, panels, i, tU)


def plot_progress(
    cost_vals, fidelity_vals, reg_vals, it, out_folder,
    fidelity_vals2=None, v1_name="u", v2_name="v",
):
    """Reference plot_progress (helpers.py:1133-1195): cost, fidelity and
    regularization norms per iteration."""
    os.makedirs(out_folder, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(15, 5))
    axes[0].plot(np.arange(len(cost_vals)), cost_vals)
    axes[0].set_yscale("log")
    axes[0].set_title(f"it={it} Cost functional")
    axes[1].plot(np.arange(1, len(fidelity_vals) + 1), fidelity_vals, label=v1_name)
    if fidelity_vals2 is not None:
        axes[1].plot(np.arange(1, len(fidelity_vals2) + 1), fidelity_vals2, label=v2_name)
        axes[1].legend()
    axes[1].set_title("Data fidelity norms in L2(Omega)^2")
    axes[2].plot(np.arange(1, len(reg_vals) + 1), reg_vals)
    axes[2].set_title("Regularisation norm in L2(Q)^2")
    fig.tight_layout(pad=3.0)
    fig.savefig(os.path.join(out_folder, "progress_plot.png"))
    plt.close(fig)
