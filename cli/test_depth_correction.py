"""Repo-layout wrapper (the reference's top-level script shape); the
implementation lives in pointreggpt_tpu.cli.test_depth_correction and is also installed
as a prgpt-* console script."""

import _path  # noqa: F401

from pointreggpt_tpu.cli.test_depth_correction import *  # noqa: F401,F403
from pointreggpt_tpu.cli.test_depth_correction import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
