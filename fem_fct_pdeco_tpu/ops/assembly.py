"""P1 finite-element assembly on the structured grid, as stencil fields.

Replaces dolfin/FFC form assembly (reference ``assemble_sparse``,
helpers.py:87-121, and the per-step assemblies at helpers.py:581, 591,
1339-1352, 1499-1532).  Each bilinear form becomes a sum over the two
triangle types of per-cell 3x3 element matrices, scattered into a
``(9, n, n)`` stencil via 18 static slice-adds — fully vectorized,
jit/scan-traceable, and differentiable.

Element integrals use the quadrature rules in
:mod:`fem_fct_pdeco_tpu.ops.quadrature`; coefficients enter either as
analytic callables ``f(x, y)`` (evaluated host-side on the fixed quadrature
points — the analogue of dolfin ``Expression``, helpers.py:506-508) or as
nodal ``(n, n)`` fields interpolated at quadrature points (the analogue of
``vec_to_function``, helpers.py:123-141).

Triangulation: dolfin ``diagonal="right"`` — cell (ci, cj) splits into
  T0: corners (ci,cj), (ci,cj+1), (ci+1,cj+1)   ("lower")
  T1: corners (ci,cj), (ci+1,cj), (ci+1,cj+1)   ("upper")
"""

from __future__ import annotations

from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops.quadrature import barycentric, rule_for_degree

# Local corner offsets (di, dj) for the two triangle types.
TRI_CORNERS = (
    ((0, 0), (0, 1), (1, 1)),
    ((0, 0), (1, 0), (1, 1)),
)

# Default FFC-style quadrature degrees for the nonpolynomial / coefficient
# forms (see quadrature.py docstring). Polynomial forms are exact at these.
DEG_CONVECTION = 5  # dot(wind_deg4, grad(v)) * u * dx
DEG_COEFF = 4       # u_h^2 * u * v * dx ;  exp(-eta u_h) grad·grad u dx


def _basis_gradients(h: float) -> np.ndarray:
    """(2 types, 3 corners, 2 components (gx, gy)) physical P1 gradients."""
    g = np.array(
        [
            [[-1.0, 0.0], [1.0, -1.0], [0.0, 1.0]],
            [[0.0, -1.0], [-1.0, 1.0], [1.0, 0.0]],
        ]
    )
    return g / h


def _offset_index(di: int, dj: int) -> int:
    return (di + 1) * 3 + (dj + 1)


class P1Assembler:
    """Precomputed per-grid assembly constants + assembly primitives.

    All ``*_stencil`` methods return ``(9, n, n)`` stencils; ``linear_form``
    returns an ``(n, n)`` nodal vector. Methods taking traced jnp inputs are
    safe inside jit/scan.
    """

    def __init__(self, grid: Grid, dtype=jnp.float64, cell_mask=None):
        """``cell_mask``: optional (nc, nc) 0/1 array; cells with mask 0
        contribute nothing to any assembled form. Used by the padded-grid
        mode (parallel/padding.py): the grid is enlarged to a mesh-divisible
        node count and the extra cells are masked out, so assembled operators
        restricted to the true domain are EXACTLY those of the unpadded grid.
        """
        self.grid = grid
        self.dtype = dtype
        self.n = grid.n
        self.nc = grid.n - 1  # cells per side
        self.h = grid.h
        self.area = grid.h * grid.h / 2.0
        self.grads = _basis_gradients(grid.h)  # (2, 3, 2)
        self.cell_mask = (
            None if cell_mask is None
            else jnp.asarray(cell_mask, dtype=dtype)
        )

    # ------------------------------------------------------------------
    # quadrature helpers
    # ------------------------------------------------------------------

    def rule(self, degree: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(points (nq,2), weights (nq,), bary (nq,3)) for a degree."""
        pts, wts = rule_for_degree(degree)
        return pts, wts, barycentric(pts)

    def quad_xy(self, degree: int) -> tuple[np.ndarray, np.ndarray]:
        """Physical quadrature coordinates: two (2, nq, nc, nc) arrays (X, Y).

        Index order: (triangle type, quad point, cell-row ci, cell-col cj).
        """
        pts, _, _ = self.rule(degree)
        xi, eta = pts[:, 0], pts[:, 1]
        h = self.h
        # T0: x = x0 + h(xi+eta), y = y0 + h*eta
        # T1: x = x0 + h*eta,     y = y0 + h(xi+eta)
        xoff = np.stack([h * (xi + eta), h * eta])          # (2, nq)
        yoff = np.stack([h * eta, h * (xi + eta)])          # (2, nq)
        c = np.linspace(self.grid.a1, self.grid.a2, self.n)[: self.nc]
        x0 = c[None, :].repeat(self.nc, 0)  # (nc, nc): x of cell corner
        y0 = c[:, None].repeat(self.nc, 1)
        X = xoff[:, :, None, None] + x0[None, None]
        Y = yoff[:, :, None, None] + y0[None, None]
        return X, Y

    def corner_values(self, nodal: jnp.ndarray) -> jnp.ndarray:
        """Nodal (n, n) field -> per-cell corner values (2, 3, nc, nc)."""
        nc = self.nc
        vals = []
        for t in range(2):
            tv = [nodal[ai : ai + nc, aj : aj + nc] for (ai, aj) in TRI_CORNERS[t]]
            vals.append(jnp.stack(tv))
        return jnp.stack(vals)

    def nodal_at_quad(self, nodal: jnp.ndarray, degree: int = DEG_COEFF) -> jnp.ndarray:
        """P1 interpolant of a nodal field at quadrature points:
        (2, nq, nc, nc)."""
        _, _, bary = self.rule(degree)
        cv = self.corner_values(nodal)  # (2, 3, nc, nc)
        b = jnp.asarray(bary, dtype=self.dtype)  # (nq, 3)
        return jnp.einsum("qa,taij->tqij", b, cv, precision=jax.lax.Precision.HIGHEST)

    def elem_grad(self, nodal: jnp.ndarray) -> jnp.ndarray:
        """Per-element (constant) gradient of the P1 interpolant:
        (2, 2 components (gx, gy), nc, nc)."""
        cv = self.corner_values(nodal)  # (2, 3, nc, nc)
        g = jnp.asarray(self.grads, dtype=self.dtype)  # (2, 3, 2)
        return jnp.einsum("tac,taij->tcij", g, cv, precision=jax.lax.Precision.HIGHEST)

    def analytic_at_quad(self, fn, degree: int) -> np.ndarray:
        """Evaluate f(x, y) (numpy-vectorized) at quad points: (2, nq, nc, nc).

        Host-side (numpy) — for stationary analytic coefficients.
        """
        X, Y = self.quad_xy(degree)
        return np.asarray(fn(X, Y))

    # ------------------------------------------------------------------
    # scatter
    # ------------------------------------------------------------------

    def _scatter(self, elem_mats) -> jnp.ndarray:
        """elem_mats[t] : (3, 3, nc, nc) per-cell element matrices
        -> (9, n, n) stencil."""
        n, nc = self.n, self.nc
        S = jnp.zeros((9, n, n), dtype=self.dtype)
        for t in range(2):
            corners = TRI_CORNERS[t]
            E = elem_mats[t]
            if self.cell_mask is not None:
                E = E * self.cell_mask
            for a, (ai, aj) in enumerate(corners):
                for b, (bi, bj) in enumerate(corners):
                    d = _offset_index(bi - ai, bj - aj)
                    S = S.at[d, ai : ai + nc, aj : aj + nc].add(E[a, b])
        return S

    def _scatter_vector(self, elem_vecs) -> jnp.ndarray:
        """elem_vecs[t] : (3, nc, nc) -> (n, n) nodal vector."""
        n, nc = self.n, self.nc
        v = jnp.zeros((n, n), dtype=self.dtype)
        for t in range(2):
            ev = elem_vecs[t]
            if self.cell_mask is not None:
                ev = [e * self.cell_mask for e in ev]
            for a, (ai, aj) in enumerate(TRI_CORNERS[t]):
                v = v.at[ai : ai + nc, aj : aj + nc].add(ev[a])
        return v

    # ------------------------------------------------------------------
    # bilinear forms
    # ------------------------------------------------------------------

    @cached_property
    def mass(self) -> jnp.ndarray:
        """Consistent mass matrix  M_ab = ∫ φ_a φ_b dx  (exact closed form)."""
        E0 = self.area / 12.0 * (np.ones((3, 3)) + np.eye(3))
        ones = jnp.ones((self.nc, self.nc), dtype=self.dtype)
        elem = [jnp.asarray(E0, dtype=self.dtype)[:, :, None, None] * ones for _ in range(2)]
        return self._scatter(elem)

    @cached_property
    def mass_diag(self) -> jnp.ndarray:
        return self.mass[4]

    @cached_property
    def lumped_mass_diag(self) -> jnp.ndarray:
        """Row-lumped mass diagonal (helpers.py:309-328)."""
        return self.mass.sum(axis=0)

    @cached_property
    def stiffness(self) -> jnp.ndarray:
        """Stiffness  K_ab = ∫ ∇φ_a · ∇φ_b dx  (exact closed form)."""
        elem = []
        for t in range(2):
            E = self.area * self.grads[t] @ self.grads[t].T  # (3,3)
            ones = jnp.ones((self.nc, self.nc), dtype=self.dtype)
            elem.append(jnp.asarray(E, dtype=self.dtype)[:, :, None, None] * ones)
        return self._scatter(elem)

    def weighted_mass(self, g_quad: jnp.ndarray, degree: int = DEG_COEFF) -> jnp.ndarray:
        """∫ g φ_a φ_b dx with g given at quadrature points (2, nq, nc, nc).

        Covers the reference's coefficient mass matrices: ``u_n^2 u v dx``
        (helpers.py:591, 683), ``u v u w dx`` (helpers.py:692),
        ``(m·∇c) w v dx`` (advection_solidbody_FCT_PDECO_finaltime.py:187).
        """
        _, wts, bary = self.rule(degree)
        wl = jnp.asarray(wts[:, None] * bary, dtype=self.dtype)  # (nq, 3)
        b = jnp.asarray(bary, dtype=self.dtype)
        detJ = self.h * self.h
        # E[a,b] = detJ * sum_q w_q g_q λa(q) λb(q)
        E = detJ * jnp.einsum("qa,tqij,qb->tabij", wl, g_quad, b, precision=jax.lax.Precision.HIGHEST)
        return self._scatter([E[0], E[1]])

    def advective(
        self,
        G_quad: jnp.ndarray,
        g_quad: jnp.ndarray | None = None,
        degree: int = DEG_CONVECTION,
    ) -> jnp.ndarray:
        """∫ g (G · ∇φ_a) φ_b dx  — rows = test functions (a).

        ``G_quad``: vector field at quad points, (2, nq, 2comp, nc, nc) or a
        per-element constant (2, 2comp, nc, nc).
        ``g_quad``: optional scalar at quad points (2, nq, nc, nc).

        This single primitive covers every transport matrix in the reference:
        - convection ``dot(wind, grad(v)) u dx`` (helpers.py:581, 933):
          G = wind(x_q), g = 1
        - chemotaxis ``exp(-ηu) dot(grad(v_h), grad(w)) u dx``
          (helpers.py:1350): G = ∇v_h (per element), g = exp(-ηu_h(q))
        - adjoint chemotaxis (helpers.py:1499): G = ∇v_h, g = (1-ηu)e^{-ηu}
        - drift pseudo-stiffness ``dot(m, grad(v)) c_h w dx``
          (advection_solidbody_FCT_PDECO_finaltime.py:188): G = m(x_q), g = c_h
        """
        _, wts, bary = self.rule(degree)
        w = jnp.asarray(wts, dtype=self.dtype)
        b = jnp.asarray(bary, dtype=self.dtype)
        g = jnp.asarray(self.grads, dtype=self.dtype)  # (2, 3, 2)
        detJ = self.h * self.h
        if G_quad.ndim == 4:
            # fast path: per-element constant vector (2, 2, nc, nc) — the
            # (G·∇λa) factor leaves the quadrature sum entirely
            ga = jnp.einsum("tac,tcij->taij", g, G_quad, precision=jax.lax.Precision.HIGHEST)  # (2, 3, nc, nc)
            if g_quad is None:
                Vb = jnp.einsum("q,qb->b", w, b, precision=jax.lax.Precision.HIGHEST)[None, :, None, None]
                Vb = jnp.broadcast_to(Vb, (2, 3) + G_quad.shape[-2:])
            else:
                Vb = jnp.einsum("q,tqij,qb->tbij", w, g_quad, b, precision=jax.lax.Precision.HIGHEST)
            E = detJ * ga[:, :, None] * Vb[:, None, :]
            return self._scatter([E[0], E[1]])
        if g_quad is None:
            # E[a,b] = detJ * (∇λa · sum_q w_q G_q λb(q))
            V = jnp.einsum("q,tqcij,qb->tcbij", w, G_quad, b, precision=jax.lax.Precision.HIGHEST)
        else:
            V = jnp.einsum("q,tqcij,tqij,qb->tcbij", w, G_quad, g_quad, b, precision=jax.lax.Precision.HIGHEST)
        E = detJ * jnp.einsum("tac,tcbij->tabij", g, V, precision=jax.lax.Precision.HIGHEST)
        return self._scatter([E[0], E[1]])

    def convection_td(self, wind_fn, t, degree: int = DEG_CONVECTION) -> jnp.ndarray:
        """∫ (w(x, t) · ∇φ_a) φ_b dx for a time-dependent analytic wind
        ``wind_fn(x, y, t) -> (wx, wy)`` with traced ``t`` — assembled inside
        jit/scan (the reference re-assembles per step, e.g.
        Schnak_FCT_PDECO_alltime.py wind with sin(2πt))."""
        X, Y = self.quad_xy(degree)
        Xj = jnp.asarray(X, dtype=self.dtype)
        Yj = jnp.asarray(Y, dtype=self.dtype)
        wx, wy = wind_fn(Xj, Yj, t)
        wx = jnp.broadcast_to(wx, Xj.shape)
        wy = jnp.broadcast_to(wy, Xj.shape)
        G = jnp.stack([wx, wy], axis=2)
        return self.advective(G, degree=degree)

    def convection(self, wind_fn, degree: int = DEG_CONVECTION) -> jnp.ndarray:
        """∫ (w · ∇φ_a) φ_b dx for an analytic wind ``wind_fn(x, y) -> (wx, wy)``.

        The reference assembles this per time step even for stationary winds
        (helpers.py:581); here it is assembled once.
        """
        X, Y = self.quad_xy(degree)
        wx, wy = wind_fn(X, Y)
        wx = np.broadcast_to(np.asarray(wx, dtype=np.float64), X.shape)
        wy = np.broadcast_to(np.asarray(wy, dtype=np.float64), X.shape)
        G = jnp.asarray(np.stack([wx, wy], axis=2), dtype=self.dtype)
        return self.advective(G, degree=degree)

    # ------------------------------------------------------------------
    # linear forms
    # ------------------------------------------------------------------

    def linear_form(self, f_quad: jnp.ndarray, degree: int = DEG_COEFF) -> jnp.ndarray:
        """b_a = ∫ f φ_a dx with f at quadrature points (2, nq, nc, nc).

        Covers the reference's RHS assemblies (helpers.py:584-585, 956,
        1339-1340, 1505, 1531-1532).
        """
        _, wts, bary = self.rule(degree)
        wl = jnp.asarray(wts[:, None] * bary, dtype=self.dtype)  # (nq, 3)
        detJ = self.h * self.h
        ev = detJ * jnp.einsum("qa,tqij->taij", wl, f_quad, precision=jax.lax.Precision.HIGHEST)
        return self._scatter_vector([ev[0], ev[1]])

    def advective_form(
        self,
        G_quad: jnp.ndarray,
        g_quad: jnp.ndarray | None = None,
        degree: int = DEG_COEFF,
    ) -> jnp.ndarray:
        """b_a = ∫ g (G · ∇φ_a) dx — linear form with the gradient on the
        test function.

        Covers the adjoint chemotaxis source ``χ u e^{-ηu} ∇p_h · ∇w dx``
        (helpers.py:1531-1532) with G = ∇p_h (per element), g = χ u e^{-ηu}.
        """
        _, wts, _ = self.rule(degree)
        w = jnp.asarray(wts, dtype=self.dtype)
        g = jnp.asarray(self.grads, dtype=self.dtype)  # (2, 3, 2)
        detJ = self.h * self.h
        if G_quad.ndim == 4:  # per-element constant vector (2, 2, nc, nc)
            G_quad = G_quad[:, None, :, :, :]
        if g_quad is None:
            V = jnp.einsum("q,tqcij->tcij", w, G_quad, precision=jax.lax.Precision.HIGHEST)
        else:
            V = jnp.einsum("q,tqcij,tqij->tcij", w, G_quad, g_quad, precision=jax.lax.Precision.HIGHEST)
        ev = detJ * jnp.einsum("tac,tcij->taij", g, V, precision=jax.lax.Precision.HIGHEST)
        return self._scatter_vector([ev[0], ev[1]])

    def load_nodal(self, nodal: jnp.ndarray, degree: int = 2) -> jnp.ndarray:
        """∫ f_h φ_a dx for a P1 nodal field — equals mass @ nodal (exact)."""
        return self.weighted_mass_apply(nodal)

    def weighted_mass_apply(self, nodal: jnp.ndarray) -> jnp.ndarray:
        from fem_fct_pdeco_tpu.ops import stencil as st

        return st.apply(self.mass, nodal)
