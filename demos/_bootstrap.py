"""Demo bootstrap: make trips_tpu importable when running from the repo and
default to the CPU backend (set TRIPS_TPU_DEMO_TPU=1 to run on TPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("TRIPS_TPU_DEMO_TPU") != "1":
    os.environ.setdefault("JAX_PLATFORMS_FORCE", "cpu")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
