"""Packaging smoke check: prove the BUILT package surface matches the
repo surface.

This container has no ``wheel``/``build`` modules and installs are
forbidden, so a literal wheel cannot be produced here. ``setup.py
build`` exercises the SAME configuration that determines wheel content
(``[tool.setuptools.packages.find]`` drives both build_py and
bdist_wheel), so importing from ``build/lib`` catches the classic wheel
failure modes: missing subpackages, missing package data, and modules
that implicitly import the repo root. The check runs from a NON-repo
cwd with ONLY the build tree (plus the interpreter's site-packages for
third-party deps) on the path.

Run: ``python tools/check_packaging.py`` (exit 0 = surface matches).
"""

from __future__ import annotations

import os
import pathlib
import shutil
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parent.parent


def repo_modules() -> list[str]:
    mods = []
    pkg = REPO / "tsflex_spark"
    for p in sorted(pkg.rglob("*.py")):
        rel = p.relative_to(REPO).with_suffix("")
        parts = list(rel.parts)
        if parts[-1] == "__init__":
            parts = parts[:-1]
        mods.append(".".join(parts))
    return mods


def main() -> int:
    scratch = tempfile.mkdtemp(prefix="tsflex_pkgcheck_")
    try:
        subprocess.run(
            [sys.executable, "setup.py", "-q", "build", "--build-base", scratch],
            check=True,
            cwd=str(REPO),
        )
        lib = os.path.join(scratch, "lib")
        assert os.path.isdir(os.path.join(lib, "tsflex_spark")), (
            "build_py produced no tsflex_spark dir — packages.find broken"
        )
        mods = repo_modules()
        # import every repo module from the BUILT tree only; cwd outside
        # the repo so a relative-path dependency can't hide. sys.path[0]
        # is the build lib, so it shadows any other copy.
        prog = (
            "import importlib, sys\n"
            f"sys.path.insert(0, {lib!r})\n"
            f"mods = {mods!r}\n"
            "bad = []\n"
            "for m in mods:\n"
            "    try:\n"
            "        mod = importlib.import_module(m)\n"
            f"        if not getattr(mod, '__file__', '').startswith({lib!r}):\n"
            "            bad.append((m, 'imported from ' + str(mod.__file__)))\n"
            "    except Exception as e:\n"
            "        bad.append((m, repr(e)))\n"
            "import tsflex_spark\n"
            "print('version:', tsflex_spark.__version__)\n"
            "print('imported:', len(mods) - len(bad), 'of', len(mods))\n"
            "for m, e in bad:\n"
            "    print('FAIL', m, e)\n"
            "sys.exit(1 if bad else 0)\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", prog], cwd=tempfile.gettempdir()
        )
        if r.returncode != 0:
            return r.returncode
        n_built = sum(
            1 for _ in pathlib.Path(lib, "tsflex_spark").rglob("*.py")
        )
        n_repo = sum(1 for _ in (REPO / "tsflex_spark").rglob("*.py"))
        if n_built != n_repo:
            print(f"FAIL file count: built {n_built} != repo {n_repo}")
            return 1
        print(f"packaging OK: {n_built} modules, build tree == repo tree")
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
