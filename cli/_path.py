"""Make the repo root importable when running cli/*.py directly, then run
the shared CLI environment setup (platform override + XLA compile cache —
see pointreggpt_tpu/cli/_env.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pointreggpt_tpu.cli import _env  # noqa: E402,F401
