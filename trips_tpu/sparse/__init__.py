from .ell import EllOperator
from .bsr import BsrOperator
from .banded import BandedProjector

__all__ = ["EllOperator", "BsrOperator", "BandedProjector"]
