"""Target-state generation for every PDECO problem family.

Covers the reference's forward-only generator scripts
(advection_solidbody_FCT.py, advection_solidbodyGaussian_FCT.py,
advection_generate_pattern_FCT.py, nonlinear_generate_pattern_FCT.py,
chemotaxis_generate_pattern_FCT.py, advection_Schnak_generate_pattern_FCT.py,
chemotaxis_mimura_FCT.py). Each function runs the forward model with the
known true control and writes the trajectory CSV in the reference's layout;
PDECO drivers call these on demand when target files are missing
(inverse-crime setup, SURVEY §4.3).

CLI:  python -m fem_fct_pdeco_tpu.drivers.generate_targets <name> [--out DIR]
"""

from __future__ import annotations

import argparse
import os

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.io import save_trajectory_csv
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


def _opts():
    return SolverOpts(tol=1e-12)


def _stream_forward(run_chunk, c_full, state, chunk_steps, out_paths, grid):
    """Chunked forward sweep with incremental CSV appends — the analogue of
    the reference's ``generation_mode`` streaming (helpers.py:1286-1318,
    1360-1367): only one chunk of frames is ever materialized on host or
    device, so arbitrarily long/large generations run in bounded memory.

    ``run_chunk(c_chunk, state) -> tuple of (cs+1, n, n) trajectories``
    (frame 0 repeats the chunk's initial state). Writes each field's frames
    to ``out_paths`` as they are produced; a chunked file matches an
    unchunked :func:`save_trajectory_csv` file to machine precision (XLA
    compiles differently-sized scans to slightly different but equivalent
    programs).
    """
    from fem_fct_pdeco_tpu.io import append_trajectory_csv

    steps = c_full.shape[0] - 1
    first = True
    k = 0
    while k < steps:
        cs = min(chunk_steps, steps - k)
        trajs = run_chunk(c_full[k : k + cs + 1], state)
        if not isinstance(trajs, tuple):
            trajs = (trajs,)
        for path, tr in zip(out_paths, trajs):
            frames = np.asarray(tr) if first else np.asarray(tr[1:])
            append_trajectory_csv(path, frames, grid, first=first)
        state = tuple(tr[-1] for tr in trajs)
        first = False
        k += cs


def solidbody(out_dir: str, slit: float = 0.05, T: float = 1.0, dt: float = 1e-3,
              dx: float = 0.025):
    """Slotted-cylinder rotation+drift frames (advection_solidbody_FCT.py)."""
    from fem_fct_pdeco_tpu.models.advection import (
        AdvectionModel, rotation_drift_wind, slotted_cylinder_ic)

    g = Grid.from_spacing(-1.0, 1.0, dx)
    model = AdvectionModel(g, eps=0.0, wind_fn=rotation_drift_wind(np.pi / 40),
                           solver_opts=_opts())
    steps = round(T / dt)
    u0 = jnp.asarray(slotted_cylinder_ic(g, slit))
    traj = model.forward(jnp.zeros((steps + 1, g.n, g.n)), u0, dt)
    os.makedirs(out_dir, exist_ok=True)
    for t_out in {0.25, 0.5, 1.0, T}:
        k = round(t_out / dt)
        if k <= steps:
            save_trajectory_csv(
                os.path.join(out_dir, f"solidbody_t{t_out:g}_u.csv"),
                np.asarray(traj[k])[None], g)
    save_trajectory_csv(os.path.join(out_dir, "solidbody_u.csv"), traj, g)
    return g, traj


def gaussian_drift(out_dir: str, T: float = 1.0, dt: float = 1e-3, c: float = 2.0,
                   dx: float = 0.025):
    """Gaussian blob under constant drift (advection_solidbodyGaussian_FCT.py:
    IC exp(-20((x+2/3)² + 5(y+5/6)²)), wind (c, c)). The trajectory file is
    keyed by T so different T_data configs don't collide in the cache."""
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel

    g = Grid.from_spacing(-1.0, 1.0, dx)
    model = AdvectionModel(g, eps=0.0,
                           wind_fn=lambda x, y: (c * np.ones_like(x), c * np.ones_like(y)),
                           solver_opts=_opts())
    X, Y = g.xy
    u0 = jnp.asarray(np.exp(-20.0 * ((X + 2.0 / 3.0) ** 2 + 5.0 * (Y + 5.0 / 6.0) ** 2)))
    steps = round(T / dt)
    traj = model.forward(jnp.zeros((steps + 1, g.n, g.n)), u0, dt)
    os.makedirs(out_dir, exist_ok=True)
    save_trajectory_csv(os.path.join(out_dir, f"gaussian_u_T{T:g}.csv"), traj, g)
    return g, traj


def advection_stripes(out_dir: str, T: float = 0.5, dt: float = 1e-3,
                      dx: float = 0.0125):
    """Stripes target for source-control advection
    (advection_generate_pattern_FCT.py: eps=1e-4, wind2, sin·sin source,
    nonlinear-equation IC)."""
    from fem_fct_pdeco_tpu.models.advection import AdvectionModel

    g = Grid.from_spacing(0.0, 1.0, dx)
    wind2 = lambda x, y: (2 * (y - 0.5) * x * (1 - x), 2 * (x - 0.5) * y * (1 - y))
    model = AdvectionModel(g, eps=1e-4, wind_fn=wind2, solver_opts=_opts())
    X, Y = g.xy
    u0 = jnp.asarray(5 * Y * (Y - 1) * X * (X - 1) * np.sin(4 * X * np.pi))
    source = jnp.asarray(np.sin(2 * np.pi * X) * np.sin(2 * np.pi * Y))
    steps = round(T / dt)
    c = jnp.broadcast_to(source, (steps + 1, g.n, g.n))
    traj = model.forward(c, u0, dt)
    os.makedirs(out_dir, exist_ok=True)
    save_trajectory_csv(os.path.join(out_dir, "advection_u.csv"), traj, g)
    return g, traj


def nonlinear(out_dir: str, T: float = 2.0, dt: float = 1e-3, dx: float = 0.025):
    """Nonlinear-equation target via the sin·sin true control
    (nonlinear_generate_pattern_FCT.py:48-50)."""
    from fem_fct_pdeco_tpu.models.nonlinear import NonlinearModel

    g = Grid.from_spacing(0.0, 1.0, dx)
    model = NonlinearModel(g, solver_opts=_opts())
    steps = round(T / dt)
    c = jnp.broadcast_to(jnp.asarray(model.true_control()), (steps + 1, g.n, g.n))
    (traj,) = model.forward(c, jnp.asarray(model.ic()), dt)
    os.makedirs(out_dir, exist_ok=True)
    save_trajectory_csv(os.path.join(out_dir, "advection.csv"), traj, g)
    return g, traj


def chemotaxis(out_dir: str, T: float = 0.5, dt: float = 5e-4, dx: float = 0.025,
               chunk_steps: int | None = None, backend: str = "xla",
               dtype=None):
    """Chemotaxis target with c = γ = 100
    (chemotaxis_generate_pattern_FCT.py).

    ``chunk_steps``: stream the generation in chunks of that many steps with
    incremental CSV appends (the reference's ``generation_mode``,
    helpers.py:1286-1318) — host/device memory stays bounded by one chunk,
    which is what makes 1024²+ long-horizon generations feasible. Output
    matches the unchunked path to machine precision."""
    from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel

    g = Grid.from_spacing(0.0, 1.0, dx)
    model = ChemotaxisModel(g, rescaling=1.0, solver_opts=_opts(),
                            backend=backend,
                            **({} if dtype is None else {"dtype": dtype}))
    steps = round(T / dt)
    c = jnp.full((steps + 1, g.n, g.n), model.params.gamma, model.dtype)
    u0, v0 = model.ic()
    os.makedirs(out_dir, exist_ok=True)
    pm = os.path.join(out_dir, f"chtxs_m_t{T:g}.csv")
    pf = os.path.join(out_dir, f"chtxs_f_t{T:g}.csv")
    if chunk_steps:
        _stream_forward(
            lambda cc, st: model.forward(cc, st[0], st[1], dt),
            c, (jnp.asarray(u0, model.dtype), jnp.asarray(v0, model.dtype)),
            chunk_steps, (pm, pf), g,
        )
        return g, None
    m, f = model.forward(c, jnp.asarray(u0, model.dtype),
                         jnp.asarray(v0, model.dtype), dt)
    save_trajectory_csv(pm, m, g)
    save_trajectory_csv(pf, f, g)
    return g, (m, f)


def schnakenberg(out_dir: str, T: float = 2.0, dt: float = 1e-3, dx: float = 0.025):
    """Schnakenberg target with c = a = 0.1
    (advection_Schnak_generate_pattern_FCT.py)."""
    from fem_fct_pdeco_tpu.models.schnakenberg import SchnakenbergModel

    g = Grid.from_spacing(0.0, 1.0, dx)
    model = SchnakenbergModel(g, solver_opts=_opts())
    steps = round(T / dt)
    c = jnp.full((steps + 1, g.n, g.n), model.params.c_a)
    u0, v0 = model.ic()
    u, v = model.forward(c, jnp.asarray(u0), jnp.asarray(v0), dt)
    os.makedirs(out_dir, exist_ok=True)
    save_trajectory_csv(os.path.join(out_dir, "schnak_u.csv"), u, g)
    save_trajectory_csv(os.path.join(out_dir, "schnak_v.csv"), v, g)
    return g, (u, v)


def mimura(out_dir: str, T: float = 30.0, dt: float = 1e-2,
           a2: float = 16.0, dx: float = 0.125):
    """Mimura/feathers pattern snapshots (chemotaxis_mimura_FCT.py:167-189)."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid.from_spacing(0.0, a2, dx)
    model = MimuraModel(g, solver_opts=_opts())
    steps = round(T / dt)
    c = jnp.ones((steps + 1, g.n, g.n))
    m0, f0 = model.ic()
    m, f = model.forward(c, jnp.asarray(m0), jnp.asarray(f0), dt)
    os.makedirs(out_dir, exist_ok=True)
    for t_out in {14.0, 30.0, T}:
        k = round(t_out / dt)
        if k <= steps:
            save_trajectory_csv(
                os.path.join(out_dir, f"mimura_tsujikawa_t{t_out:g}_m.csv"),
                np.asarray(m[k])[None], g)
            save_trajectory_csv(
                os.path.join(out_dir, f"mimura_tsujikawa_t{t_out:g}_f.csv"),
                np.asarray(f[k])[None], g)
    return g, (m, f)


def mimura_trajectory(out_dir: str, T: float = 0.3, dt: float = 0.1,
                      a2: float = 16.0, dx: float = 0.125):
    """Full Mimura trajectory for the ALL-TIME PDECO target
    (chemotaxis_mimura_FCT_PGD_alltime.py:108-117 reads the first
    num_steps+1 frames of the stored trajectory CSVs)."""
    from fem_fct_pdeco_tpu.models.mimura import MimuraModel

    g = Grid.from_spacing(0.0, a2, dx)
    model = MimuraModel(g, solver_opts=_opts())
    steps = round(T / dt)
    c = jnp.ones((steps + 1, g.n, g.n))
    m0, f0 = model.ic()
    m, f = model.forward(c, jnp.asarray(m0), jnp.asarray(f0), dt)
    os.makedirs(out_dir, exist_ok=True)
    save_trajectory_csv(os.path.join(out_dir, f"mimura_traj_m_T{T:g}.csv"), m, g)
    save_trajectory_csv(os.path.join(out_dir, f"mimura_traj_f_T{T:g}.csv"), f, g)
    return g, (m, f)


GENERATORS = {
    "solidbody": solidbody,
    "mimura_trajectory": mimura_trajectory,
    "gaussian": gaussian_drift,
    "advection_stripes": advection_stripes,
    "nonlinear": nonlinear,
    "chemotaxis": chemotaxis,
    "schnakenberg": schnakenberg,
    "mimura": mimura,
}


def main():
    import inspect

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", choices=sorted(GENERATORS))
    ap.add_argument("--out", default="data_generated")
    ap.add_argument("--T", type=float, default=None)
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--dx", type=float, default=None)
    ap.add_argument("--chunk-steps", type=int, default=None,
                    help="stream the generation in chunks of this many "
                         "steps with incremental CSV appends (bounded "
                         "memory; generators that support it)")
    args = ap.parse_args()
    fn = GENERATORS[args.name]
    params = inspect.signature(fn).parameters
    kwargs = {
        k: v for k, v in
        dict(T=args.T, dt=args.dt, dx=args.dx, chunk_steps=args.chunk_steps).items()
        if v is not None and k in params
    }
    fn(args.out, **kwargs)
    print(f"wrote {args.name} targets to {args.out}")


if __name__ == "__main__":
    main()
