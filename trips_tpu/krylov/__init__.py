from .arnoldi import arnoldi, arnoldi_extend, arnoldi_init
from .cgls import cgls, cgls_fixed, cgls_history
from .golub_kahan import gk_init, golub_kahan, golub_kahan_extend
from .lsqr import lsqr

__all__ = ["arnoldi", "arnoldi_extend", "arnoldi_init", "cgls", "cgls_fixed", "cgls_history", "gk_init",
           "golub_kahan", "golub_kahan_extend", "lsqr"]
