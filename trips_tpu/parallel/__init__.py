from .batched import batched_frame_solve, stack_ell_tables
from .multihost import init_multihost, pod_mesh
from .sharding import (
    ShardedDynamicOperator,
    ShardedEllOperator,
    make_mesh,
)

__all__ = [
    "ShardedDynamicOperator",
    "ShardedEllOperator",
    "batched_frame_solve",
    "init_multihost",
    "make_mesh",
    "pod_mesh",
    "stack_ell_tables",
]

from .sharded_bsr import ShardedBsrOperator, ShardedDynamicBsrOperator  # noqa: E402

__all__ += ["ShardedBsrOperator", "ShardedDynamicBsrOperator"]

from .sharded_banded import (  # noqa: E402
    ShardedBandedProjector,
    ShardedBucketedBandedProjector,
)
from .sharded_dynamic_banded import (  # noqa: E402
    ShardedBucketedDynamicBandedOperator,
    ShardedDynamicBandedOperator,
)

__all__ += [
    "ShardedBandedProjector",
    "ShardedBucketedBandedProjector",
    "ShardedBucketedDynamicBandedOperator",
    "ShardedDynamicBandedOperator",
]

from .streamed import (  # noqa: E402
    StreamedDynamicBandedOperator,
    cgls_normal_streamed,
)

__all__ += ["StreamedDynamicBandedOperator", "cgls_normal_streamed"]
