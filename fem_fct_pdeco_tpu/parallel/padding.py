"""Mesh-divisible padding: run reference-sized grids sharded.

The reference problem sizes (41, 81, 129 nodes per side — SURVEY §6) are not
divisible by typical device-mesh shapes, and ``jax.device_put`` with a
``NamedSharding`` requires divisible global dimensions. This module pads:
models built with ``pad_to=mesh_padded_n(grid.n, mesh)`` assemble on an
enlarged grid whose extra CELLS are masked out of every form and whose extra
NODES get identity rows (ops/assembly.py ``cell_mask``, models/base.py),
plus a node mask excluding pad nodes from the FCT limiter's local-extrema
sets (ops/fct.py). Restricted to the true window, every sweep matches the
unpadded model to solver tolerance, while all arrays shard cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


def mesh_padded_n(n: int, mesh: Mesh) -> int:
    """Smallest node count >= n divisible by both mesh axis sizes."""
    ny, nx = (mesh.shape[name] for name in mesh.axis_names)
    m = _lcm(ny, nx)
    return -(-n // m) * m


def pad_field(x, pad_to: int):
    """Zero-pad the trailing two (spatial) axes of a field or trajectory."""
    n = x.shape[-1]
    if n == pad_to:
        return x
    widths = [(0, 0)] * (x.ndim - 2) + [(0, pad_to - n), (0, pad_to - n)]
    return jnp.pad(x, widths)


def unpad_field(x, n: int):
    """Restrict to the true n x n window."""
    return x[..., :n, :n]
