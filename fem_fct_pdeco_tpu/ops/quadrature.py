"""Quadrature on the reference triangle and P1 basis evaluation.

Replaces FEniCS/FFC's quadrature-backed form assembly (reference
helpers.py:87-121 ``assemble_sparse``).  We use collapsed Gauss rules
(Gauss-Legendre x Gauss-Jacobi(1,0) under the Duffy map), the same family
FIAT constructs, with the FFC point-count heuristic ``m = (degree + 2) // 2``
points per direction; such a rule integrates total-degree ``degree``
polynomials exactly, so every polynomial form in the reference (mass,
stiffness, convection with polynomial wind, u^2-weighted mass, ...) is
reproduced exactly.  Non-polynomial integrands (the chemotaxis
``exp(-eta*u)`` terms, helpers.py:1350-1352) are rule-dependent in both
frameworks; ours is documented here and validated against the stored
reference trajectories.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
from scipy.special import roots_jacobi, roots_legendre


@lru_cache(maxsize=None)
def collapsed_rule(m: int) -> tuple[np.ndarray, np.ndarray]:
    """m^2-point rule on the reference triangle {xi, eta >= 0, xi+eta <= 1}.

    Returns (points (nq, 2), weights (nq,)); weights sum to 1/2 (the area).
    Exact for total degree <= 2m - 1.
    """
    # Gauss-Legendre on [0,1] for the collapsed coordinate s
    xs, ws = roots_legendre(m)
    xs = 0.5 * (xs + 1.0)
    ws = 0.5 * ws
    # Gauss-Jacobi with weight (1-eta) on [0,1] for eta
    xj, wj = roots_jacobi(m, 1.0, 0.0)  # weight (1-x)^1 on [-1,1]
    eta = 0.5 * (xj + 1.0)
    # transform weight: int_0^1 (1-eta) f deta = sum wj' f(eta_j)
    weta = wj / 4.0  # (1/2 for interval scaling) * (1/2 for weight scaling)
    pts = []
    wts = []
    for e, we in zip(eta, weta):
        for s, w in zip(xs, ws):
            pts.append(((1.0 - e) * s, e))
            wts.append(we * w)
    return np.asarray(pts), np.asarray(wts)


def rule_for_degree(degree: int) -> tuple[np.ndarray, np.ndarray]:
    """Rule matching FFC's choice for an estimated polynomial degree."""
    m = max(1, (degree + 2) // 2)
    return collapsed_rule(m)


def barycentric(points: np.ndarray) -> np.ndarray:
    """P1 basis values (lambda0, lambda1, lambda2) at reference points (nq, 2)
    -> (nq, 3)."""
    xi, eta = points[:, 0], points[:, 1]
    return np.stack([1.0 - xi - eta, xi, eta], axis=1)
