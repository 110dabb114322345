"""Spatial domain decomposition over a TPU device mesh.

The reference is strictly serial (SURVEY §2.7); this module is the
framework's scale-out layer, new capability by design. Fields are (n, n)
grids, so the natural parallelism is 2-D spatial domain decomposition: shard
both grid axes over a ('y', 'x') device mesh and let GSPMD partition the
stencil arithmetic — every shifted-array access in
:mod:`fem_fct_pdeco_tpu.ops.stencil` compiles to a one-cell halo exchange
(collective-permute over ICI), and the dot products inside the Krylov
solvers become psums. No communication code is written by hand; shardings
are declared, XLA inserts the collectives.

Time-stepping stays sequential (it is a data dependence); trajectories are
sharded in space and replicated in time.
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(k: int) -> tuple[int, int]:
    """Near-square factorization of the device count."""
    a = int(math.isqrt(k))
    while k % a:
        a -= 1
    return a, k // a


def make_mesh(devices=None, axis_names=("y", "x")) -> Mesh:
    if devices is None:
        devices = jax.devices()
    ny, nx = _factor2(len(devices))
    import numpy as np

    return Mesh(np.asarray(devices).reshape(ny, nx), axis_names)


def field_sharding(mesh: Mesh) -> NamedSharding:
    """(n, n) field sharded over both spatial axes."""
    return NamedSharding(mesh, P(*mesh.axis_names))


def traj_sharding(mesh: Mesh) -> NamedSharding:
    """(num_steps+1, n, n) trajectory: time replicated, space sharded."""
    return NamedSharding(mesh, P(None, *mesh.axis_names))


def shard_field(x, mesh: Mesh):
    ns = field_sharding(mesh) if x.ndim == 2 else traj_sharding(mesh)
    return jax.device_put(x, ns)
