"""Shared model-layer infrastructure.

A *model* owns the PDE-specific pieces the reference keeps in per-model
solver functions (helpers.py:511-698, 881-1038, 1250-1581): parameters,
initial conditions, the forward state sweep, the adjoint sweep, and the
gradient equation. Sweeps are jit-compiled ``lax.scan`` loops over
:mod:`fem_fct_pdeco_tpu.timeloop`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fem_fct_pdeco_tpu.grid import Grid
from fem_fct_pdeco_tpu.ops import stencil as st
from fem_fct_pdeco_tpu.ops.assembly import P1Assembler
from fem_fct_pdeco_tpu.ops.linalg import SolverOpts


class ModelBase:
    """Holds the grid, assembler and stationary operators every model needs."""

    def __init__(
        self,
        grid: Grid,
        dtype=jnp.float64,
        solver_opts: SolverOpts | None = None,
        backend: str = "xla",
    ):
        self.grid = grid
        if dtype == jnp.float64 and not jax.config.jax_enable_x64:
            dtype = jnp.float32  # avoid per-op truncation warnings
        self.dtype = dtype
        if backend in ("pallas", "pallas_fused"):
            from fem_fct_pdeco_tpu.ops.pallas_kernels import fits_vmem

            if not fits_vmem(grid.n, dtype):
                import warnings

                warnings.warn(
                    f"grid {grid.n}x{grid.n} ({dtype}) exceeds the "
                    f"single-block VMEM budget of the {backend!r} kernels; "
                    "falling back to backend='xla'",
                    stacklevel=3,
                )
                backend = "xla"
        self.backend = backend
        self.asm = P1Assembler(grid, dtype)
        self.M = self.asm.mass
        self.M_diag = self.asm.mass_diag
        self.ML_diag = self.asm.lumped_mass_diag
        self.K = self.asm.stiffness
        self.solver_opts = solver_opts or SolverOpts()
        self._jit_cache: dict = {}

    def _jitted(self, key, build):
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(build())
            self._jit_cache[key] = fn
        return fn

    def mass_apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return st.apply(self.M, x)
