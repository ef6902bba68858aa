"""Global configuration for trips-tpu.

The reference library (TRIPs-Py) runs float64 NumPy on CPU. On TPU the native
dtype is float32 (with bfloat16 for MXU-heavy paths); tests run on a CPU
backend with x64 enabled to match the reference oracles tightly.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp


def default_dtype():
    """float64 when jax x64 is enabled (CPU oracle tests), else float32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def is_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# Padding granularity for device arrays: last dim should be a multiple of the
# TPU lane width, second-to-last of the sublane width.
LANE = 128
SUBLANE = 8


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
