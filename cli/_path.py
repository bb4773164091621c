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

# persistent XLA compilation cache: dim-64 U-Net programs take minutes to
# compile on this host; cache hits make CLI restarts near-instant.
if os.environ.get("PRGPT_COMP_CACHE", "1") != "0":
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pointreggpt_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
