"""The installed-package surface must match the repo surface (ADVICE r8
item 7): tools/check_packaging.py builds the package with the same
setuptools config that drives bdist_wheel and imports every repo module
from the built tree only, from a non-repo cwd."""

import pathlib
import subprocess
import sys


def test_packaging_surface_matches_repo():
    repo = pathlib.Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "check_packaging.py")],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "packaging OK" in r.stdout
