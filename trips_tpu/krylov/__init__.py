from .arnoldi import arnoldi
from .cgls import cgls, cgls_fixed, cgls_history
from .golub_kahan import golub_kahan
from .lsqr import lsqr

__all__ = ["arnoldi", "cgls", "cgls_fixed", "cgls_history", "golub_kahan", "lsqr"]
