from .dp import discrepancy_principle
from .gcv import generalized_crossvalidation
from .lcurve import curvature, l_curve

__all__ = [
    "discrepancy_principle",
    "generalized_crossvalidation",
    "curvature",
    "l_curve",
]
