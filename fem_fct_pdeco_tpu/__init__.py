"""TPU-native FEM-FCT framework for PDE-constrained optimization.

A ground-up re-design of the capabilities of KarolinaBenkova/FEM-FCT-PDECO
(FEniCS + SciPy sparse, serial CPU) for TPU hardware:

- Structured-grid P1 finite elements represented as 9-point *stencil fields*
  on ``(n, n)`` arrays instead of general sparse matrices
  (reference: helpers.py:87-121 assembled PETSc CSR matrices).
- Flux-corrected transport (Zalesak limiter) as fully vectorized shifted-array
  arithmetic (reference: helpers.py:1715-1872 Python loops over sparse rows).
- Matrix-free Chebyshev/Krylov solvers instead of SuperLU spsolve.
- Time loops as ``jax.lax.scan``; PDECO outer loops host-side.
- Multi-device scaling via ``shard_map`` spatial domain decomposition
  (new capability; the reference is strictly serial).
"""

from fem_fct_pdeco_tpu.grid import Grid

__all__ = ["Grid"]
__version__ = "0.1.0"
