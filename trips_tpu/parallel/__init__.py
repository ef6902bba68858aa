from .sharding import (
    ShardedDynamicOperator,
    ShardedEllOperator,
    make_mesh,
)

__all__ = ["ShardedDynamicOperator", "ShardedEllOperator", "make_mesh"]
