"""Make the repo root importable when running CLI scripts directly,
and honor the PRGPT_PLATFORM env var (the axon TPU plugin overrides the
standard JAX_PLATFORMS env var, so tests/headless runs set
PRGPT_PLATFORM=cpu to force the CPU backend)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_platform = os.environ.get("PRGPT_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)
