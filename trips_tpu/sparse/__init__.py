from .banded import BandedProjector
from .bsr import BsrOperator
from .dynamic_banded import DynamicBandedOperator
from .ell import EllOperator

__all__ = ["EllOperator", "BsrOperator", "BandedProjector",
           "DynamicBandedOperator"]
