"""Mimura–Tsujikawa / simplified-feathers chemotaxis variant.

The reference's second chemotaxis family (chemotaxis_mimura_FCT.py,
mimura_data_helpers.py:19-109; PDECO drivers chemotaxis_mimura_FCT_PGD*.py):

    dm/dt + ∇·(-Dm ∇m + χ m e^{-ηm} ∇f) = m²(1-m)    (FCT, IMEX reaction)
    df/dt + ∇·(-Df ∇f) + δ f = c m                    (implicit)

Differences from the base Keller–Segel model: the logistic-type reaction
m²(1-m) on the m equation (mimura_data_helpers.py:65-70, treated explicitly
on the RHS) and different constants/domain (chemotaxis_mimura_FCT.py:25-43).

The reference's PDECO drivers for this family are stale (they call deleted
legacy helpers — SURVEY §0); the adjoint here re-expresses the variant on
the current API: linearizing the reaction adds -(2m - 3m²) p to the adjoint
p equation, i.e. non_flux += -M_{2m-3m²}.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from fem_fct_pdeco_tpu.models.chemotaxis import ChemotaxisModel, ChemotaxisParams
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


@dataclasses.dataclass(frozen=True)
class MimuraParams(ChemotaxisParams):
    """Simplified-feathers constants (chemotaxis_mimura_FCT.py:37-41)."""

    delta: float = 2.0
    Dm: float = 0.05
    Df: float = 0.05
    chi: float = 0.125
    gamma: float = 1.0   # control value used to generate data (c = 1)
    eta: float = 0.5


class MimuraModel(ChemotaxisModel):
    # the m²(1-m) reaction is implemented inside the whole-sweep kernels
    _fused_reaction = "mimura"

    def __init__(self, grid, params: MimuraParams = MimuraParams(),
                 rescaling: float = 1.0, dtype=jnp.float64,
                 solver_opts: SolverOpts | None = None, backend: str = "xla",
                 pad_to: int | None = None, mesh=None, debug: bool = False):
        super().__init__(grid, params=params, rescaling=rescaling,
                         dtype=dtype, solver_opts=solver_opts, backend=backend,
                         pad_to=pad_to, mesh=mesh, debug=debug)

    def ic(self) -> tuple[np.ndarray, np.ndarray]:
        """m0 = 1.5 + 0.1(0.5 - rand) with np.random.seed(5)
        (mimura_data_helpers.py:55-61); f0 = m0 / δ
        (chemotaxis_mimura_FCT.py:85-86)."""
        n = self.grid.n
        np.random.seed(5)
        m0 = 1.5 + 0.1 * (0.5 - np.random.rand(n, n))
        return m0, m0 / self.params.delta

    def _reaction_rhs(self, u_q):
        """m²(1-m) explicit source (mimura_data_helpers.py:70)."""
        return u_q**2 * (1.0 - u_q)

    def _reaction_nonflux_adj(self, u_q):
        """-(2m - 3m²)-weighted mass for the adjoint p equation."""
        return self.asm.weighted_mass(-(2.0 * u_q - 3.0 * u_q**2), degree=4)
