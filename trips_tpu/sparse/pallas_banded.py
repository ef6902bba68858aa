"""Dispatch for the banded projector apply (Pallas kernel on TPU)."""
from __future__ import annotations

import jax


def _use_pallas():
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def banded_apply(op, v, transpose: bool):
    if _use_pallas() and getattr(op, "prefer_pallas", True):
        from .pallas_banded_kernel import banded_apply_pallas, pallas_supported

        if pallas_supported(op):
            return banded_apply_pallas(
                op, v, transpose,
                batched=getattr(op, "batched_groups", False) or None)
    return op.rmatvec_xla(v) if transpose else op.matvec_xla(v)


def banded_normal_apply(op, v):
    """x -> A^T A x; fused single-stream kernel on TPU, composed applies
    elsewhere."""
    if _use_pallas() and getattr(op, "prefer_pallas", True):
        from .pallas_banded_kernel import (banded_normal_apply_pallas,
                                           pallas_supported)

        if pallas_supported(op):
            return banded_normal_apply_pallas(
                op, v,
                batched=getattr(op, "batched_groups", False) or None)
    return op.rmatvec_xla(op.matvec_xla(v))
