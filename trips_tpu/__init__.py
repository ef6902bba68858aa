"""trips-tpu: TPU-native regularization of linear ill-posed inverse problems.

Capability surface of TRIPs-Py (deblurring, CT, dynamic CT; direct, hybrid
Krylov and majorization-minimization solvers; GCV/DP/L-curve parameter
selection), redesigned for JAX/XLA/Pallas on TPU. See README.md and
PARITY.md.
"""

__version__ = "0.1.0"

from . import core, krylov, operators, parallel, problems, regparam, solvers, sparse, utils  # noqa: F401,E501
from .core import LinearOperator, aslinearoperator  # noqa: F401
