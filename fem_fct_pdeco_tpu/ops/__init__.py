from fem_fct_pdeco_tpu.ops import assembly, fct, linalg, quadrature, stencil

__all__ = ["assembly", "fct", "linalg", "quadrature", "stencil"]
