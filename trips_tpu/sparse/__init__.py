from .banded import BandedProjector
from .banded_buckets import BucketedBandedProjector
from .bsr import BsrOperator
from .dynamic_banded import (BucketedDynamicBandedOperator,
                             DynamicBandedOperator)
from .ell import EllOperator

__all__ = ["EllOperator", "BsrOperator", "BandedProjector",
           "BucketedBandedProjector",
           "DynamicBandedOperator", "BucketedDynamicBandedOperator"]
