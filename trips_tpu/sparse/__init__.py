from .ell import EllOperator
from .bsr import BsrOperator

__all__ = ["EllOperator", "BsrOperator"]
