"""Boundary post-processing utilities.

Equivalents of the reference's experimental adjoint-artifact treatments
(helpers.py:2003-2052 ``smooth_corners_on_boundary``, helpers.py:2054-2121
``rescale_boundary_nodes``) and the boundary-node indexing helper
(helpers.py:244-269 ``generate_boundary_nodes``), re-expressed on (n, n)
vertex-ordered fields — no DoF permutation needed.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid


def boundary_masks(grid: Grid):
    """Boolean masks (bottom, top, left, right) rows/cols of the grid."""
    n = grid.n
    m = np.zeros((4, n, n), dtype=bool)
    m[0, 0, :] = True
    m[1, -1, :] = True
    m[2, :, 0] = True
    m[3, :, -1] = True
    return m


def smooth_corners(field: jnp.ndarray) -> jnp.ndarray:
    """Replace each corner value with the mean of its two boundary neighbors
    (helpers.py:2003-2052)."""
    f = field
    f = f.at[0, 0].set(0.5 * (field[0, 1] + field[1, 0]))
    f = f.at[0, -1].set(0.5 * (field[0, -2] + field[1, -1]))
    f = f.at[-1, 0].set(0.5 * (field[-2, 0] + field[-1, 1]))
    f = f.at[-1, -1].set(0.5 * (field[-1, -2] + field[-2, -1]))
    return f


def rescale_boundary(field: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Linearly rescale each boundary row/column into the value range of the
    adjacent interior row/column (helpers.py:2054-2121)."""
    gmin = field.min()
    gmax = field.max()
    denom = jnp.maximum(gmax - gmin, eps)

    def rescale(vals, adj):
        lo, hi = adj.min(), adj.max()
        t = (vals - gmin) / denom
        return lo + t * (hi - lo)

    f = field
    f = f.at[0, :].set(rescale(field[0, :], field[1, :]))
    f = f.at[-1, :].set(rescale(field[-1, :], field[-2, :]))
    f = f.at[:, 0].set(rescale(field[:, 0], field[:, 1]))
    f = f.at[:, -1].set(rescale(field[:, -1], field[:, -2]))
    return f
