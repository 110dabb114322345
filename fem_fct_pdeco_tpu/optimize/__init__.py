from fem_fct_pdeco_tpu.optimize.cost import (
    cost_functional,
    l2_norm_sq_omega,
    l2_norm_sq_q,
    rel_err,
)
from fem_fct_pdeco_tpu.optimize.armijo import armijo_line_search
from fem_fct_pdeco_tpu.optimize.pgd import PGDConfig, PGDResult, projected_gradient_descent

__all__ = [
    "cost_functional",
    "l2_norm_sq_omega",
    "l2_norm_sq_q",
    "rel_err",
    "armijo_line_search",
    "PGDConfig",
    "PGDResult",
    "projected_gradient_descent",
]
