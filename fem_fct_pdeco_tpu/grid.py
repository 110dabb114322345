"""Structured uniform square grid with a right-triangulated P1 mesh.

Every problem in the reference lives on ``RectangleMesh(Point(a1,a1),
Point(a2,a2), n, n)`` with CG1 elements (e.g. reference
Schnak_FCT_PDECO_refactored.py:92-93).  On such a mesh the whole generic-FEM
substrate (dolfin mesh connectivity, ``vertex_to_dof_map``,
``find_node_neighbours`` — reference helpers.py:244-307) collapses to index
arithmetic, which this module provides.

Fields are ``(n, n)`` arrays in row-major *vertex* ordering: entry ``[i, j]``
is the nodal value at ``(x, y) = (a1 + j*h, a1 + i*h)`` — i.e. the same
layout produced by ``np.meshgrid`` in the reference drivers
(advection_solidbody_FCT.py:56-58), so ``imshow`` renders identically.

The triangulation follows dolfin's default ``diagonal="right"``: each cell is
split by the edge running from its lower-left to its upper-right corner, so
the node-connectivity footprint is the 7-point stencil
{C, E, W, N, S, NE, SW}.
"""

from __future__ import annotations

import dataclasses
from functools import cached_property

import numpy as np

# The 9 offsets of the full 3x3 stencil footprint, row-major over (di, dj).
# di indexes the y-direction (rows), dj the x-direction (columns).
OFFSETS: tuple[tuple[int, int], ...] = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 0), (0, 1),
    (1, -1), (1, 0), (1, 1),
)
CENTER = 4


def opposite(d: int) -> int:
    """Index of the opposite offset: OFFSETS[opposite(d)] == -OFFSETS[d]."""
    return 8 - d


# Offsets that are actual mesh edges for diagonal="right" (plus center):
# E, W, N, S and the NE/SW diagonal. The (-1,+1)/(+1,-1) ("anti-diagonal")
# entries of any assembled stencil are identically zero on this mesh.
EDGE_NEIGHBOR_IDS: tuple[int, ...] = (1, 3, 5, 7, 0, 8)  # NW-ish order: see OFFSETS
NEIGHBOR_AND_SELF_IDS: tuple[int, ...] = (1, 3, 4, 5, 7, 0, 8)


@dataclasses.dataclass(frozen=True)
class Grid:
    """Uniform square grid on [a1, a2]^2 with ``n`` nodes per side.

    ``n = intervals + 1`` where ``intervals = round((a2-a1)/h)`` matches the
    reference's ``intervals_line`` idiom (advection_solidbody_FCT.py:27-28).
    """

    a1: float
    a2: float
    n: int  # nodes per side

    @property
    def h(self) -> float:
        return (self.a2 - self.a1) / (self.n - 1)

    @property
    def intervals(self) -> int:
        return self.n - 1

    @property
    def num_nodes(self) -> int:
        return self.n * self.n

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n, self.n)

    @classmethod
    def from_spacing(cls, a1: float, a2: float, dx: float) -> "Grid":
        return cls(a1, a2, round((a2 - a1) / dx) + 1)

    @cached_property
    def xy(self) -> tuple[np.ndarray, np.ndarray]:
        """Meshgrid coordinates (X, Y), each (n, n): X[i,j]=a1+j*h, Y[i,j]=a1+i*h."""
        c = np.linspace(self.a1, self.a2, self.n)
        X, Y = np.meshgrid(c, c)
        return X, Y

    @cached_property
    def boundary_mask(self) -> np.ndarray:
        """Boolean (n, n) mask of boundary nodes (helpers.py:244-269 analogue)."""
        m = np.zeros((self.n, self.n), dtype=bool)
        m[0, :] = m[-1, :] = m[:, 0] = m[:, -1] = True
        return m

    # ---------------- FEniCS DoF-ordering interop ----------------
    #
    # Stored reference fixtures (data/*.csv) are flat vectors in dolfin's
    # serial CG1 DoF ordering. That ordering was recovered exactly from the
    # seeded-random chemotaxis IC fixture (chtxs_sys_IC, helpers.py:1242-1247,
    # vs Chtxs_data_dx0.025_dt0.001/chtxs_m_t0.01.csv frame 0) and has the
    # closed form: sort nodes by diagonal (j - i) ascending, then by i
    # ascending. These maps exist purely for fixture/CSV interop.

    @cached_property
    def vertex_to_dof(self) -> np.ndarray:
        """vertex_to_dof[v] = dof index of flat row-major vertex v."""
        n = self.n
        i, j = np.divmod(np.arange(n * n), n)
        order = np.lexsort((i, j - i))  # vertices sorted by (j-i, i)
        v2d = np.empty(n * n, dtype=np.int64)
        v2d[order] = np.arange(n * n)
        return v2d

    @cached_property
    def dof_to_vertex(self) -> np.ndarray:
        d2v = np.empty(self.num_nodes, dtype=np.int64)
        d2v[self.vertex_to_dof] = np.arange(self.num_nodes)
        return d2v

    def field_from_dof(self, vec_dof: np.ndarray) -> np.ndarray:
        """Flat DoF-ordered vector(s) -> (..., n, n) vertex-ordered field."""
        vec_dof = np.asarray(vec_dof)
        out = vec_dof[..., self.vertex_to_dof]
        return out.reshape(*vec_dof.shape[:-1], self.n, self.n)

    def field_to_dof(self, field: np.ndarray) -> np.ndarray:
        """(..., n, n) vertex-ordered field -> flat DoF-ordered vector(s)."""
        field = np.asarray(field)
        flat = field.reshape(*field.shape[:-2], self.num_nodes)
        return flat[..., self.dof_to_vertex]
