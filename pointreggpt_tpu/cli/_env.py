"""Process-level environment setup shared by every CLI entry point.

Must be imported BEFORE any JAX device use (the config updates below bind
at backend initialization):

- ``PRGPT_PLATFORM``: force a JAX platform (e.g. ``cpu``). Needed because
  some accelerator plugins (the axon TPU tunnel) override the standard
  ``JAX_PLATFORMS`` env var; ``jax.config.update`` wins.
- persistent XLA compilation cache (``PRGPT_COMP_CACHE=0`` disables):
  dim-64 U-Net programs take minutes to compile on small hosts; cache hits
  make CLI restarts near-instant.
"""

import os

_platform = os.environ.get("PRGPT_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)

if os.environ.get("PRGPT_COMP_CACHE", "1") != "0":
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pointreggpt_xla"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
