"""Solver suite — API parity with trips/solvers/* of the reference."""
from .cgls import CGLS
from .fused import fused_gks, fused_hybrid_lsqr, fused_mmgks
from .direct import Tikhonov, tGSVD_sol, tSVD_sol
from .gks import GKS
from .hybrid import Hybrid_GMRES, Hybrid_LSQR
from .mmgks import MMGKS
from .projection import GMRES, Arnoldi_Tikhonov, Golub_Kahan_Tikhonov

__all__ = [
    "CGLS",
    "fused_gks",
    "fused_hybrid_lsqr",
    "fused_mmgks",
    "GKS",
    "GMRES",
    "Arnoldi_Tikhonov",
    "Golub_Kahan_Tikhonov",
    "Hybrid_GMRES",
    "Hybrid_LSQR",
    "MMGKS",
    "Tikhonov",
    "tGSVD_sol",
    "tSVD_sol",
]
