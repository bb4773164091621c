"""Repo-layout wrapper (the reference's top-level script shape); the
implementation lives in pointreggpt_tpu.cli.train_successive_ddnm_diffusion and is also installed
as a prgpt-* console script."""

import _path  # noqa: F401

from pointreggpt_tpu.cli.train_successive_ddnm_diffusion import *  # noqa: F401,F403
from pointreggpt_tpu.cli.train_successive_ddnm_diffusion import build_parser, main  # noqa: F401

if __name__ == "__main__":
    main()
