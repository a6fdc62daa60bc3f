"""Packaging smoke check: prove the BUILT package surface matches the
repo surface — through a REAL wheel when one can be produced.

Wheel strategy (r10): ``pip wheel`` cannot run here — recorded
mechanically below: ``--no-build-isolation`` dies on setuptools'
``invalid command 'bdist_wheel'`` (no ``wheel`` module) and isolated
builds die resolving ``setuptools>=61`` (no network). A wheel is just a
PEP-427 zip, though, so this tool builds one with stdlib ``zipfile``
from the ``setup.py build`` tree (the same ``packages.find`` config
that would drive ``bdist_wheel``), writes a spec-shaped ``.dist-info``
(METADATA / WHEEL / RECORD with real sha256 digests), and imports every
repo module FROM INSIDE THE WHEEL (zipimport — the wheel goes on
``sys.path`` directly, so a module that can't live in a zip, reads
files relative to ``__file__``, or escapes to the repo tree fails
loudly). cwd is outside the repo so a relative-path dependency can't
hide.

Run: ``python tools/check_packaging.py`` (exit 0 = surface matches).
Output records the pip attempt result so "environment cannot build
wheels via pip" is machine-checkable from the tool's own output.
"""

from __future__ import annotations

import base64
import hashlib
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import zipfile

REPO = pathlib.Path(__file__).resolve().parent.parent
VERSION = "0.1.0"


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


def try_pip_wheel(outdir: str) -> str | None:
    """Attempt the canonical pip wheel build; return the wheel path or
    None (the failure mode is printed so the artifact records it)."""
    r = subprocess.run(
        [
            sys.executable, "-m", "pip", "wheel", str(REPO),
            "--no-deps", "--no-build-isolation", "-w", outdir,
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    whls = list(pathlib.Path(outdir).glob("*.whl"))
    if r.returncode == 0 and whls:
        print("pip wheel: OK")
        return str(whls[0])
    lines = [
        t.strip()
        for t in ((r.stderr or "") + "\n" + (r.stdout or "")).splitlines()
        if "error" in t.lower() and "[notice]" not in t
    ]
    print("pip wheel: UNAVAILABLE —", " | ".join(lines[-3:]) or "no error text")
    return None


def build_wheel_stdlib(lib: str, outdir: str) -> str:
    """PEP-427 wheel from the build tree with stdlib zipfile only."""
    name = f"tsflex_spark-{VERSION}-py3-none-any.whl"
    dist = f"tsflex_spark-{VERSION}.dist-info"
    path = os.path.join(outdir, name)
    records: list[tuple[str, str, int]] = []

    def _digest(data: bytes) -> str:
        h = base64.urlsafe_b64encode(hashlib.sha256(data).digest())
        return "sha256=" + h.decode().rstrip("=")

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted(pathlib.Path(lib, "tsflex_spark").rglob("*")):
            if p.is_dir():
                continue
            arc = str(p.relative_to(lib))
            data = p.read_bytes()
            z.writestr(arc, data)
            records.append((arc, _digest(data), len(data)))
        meta = (
            "Metadata-Version: 2.1\n"
            "Name: tsflex-spark\n"
            f"Version: {VERSION}\n"
        ).encode()
        wheel = (
            "Wheel-Version: 1.0\n"
            "Generator: tools/check_packaging.py (stdlib zipfile)\n"
            "Root-Is-Purelib: true\n"
            "Tag: py3-none-any\n"
        ).encode()
        for arc, data in ((f"{dist}/METADATA", meta), (f"{dist}/WHEEL", wheel)):
            z.writestr(arc, data)
            records.append((arc, _digest(data), len(data)))
        rec = "".join(f"{a},{d},{n}\n" for a, d, n in records)
        rec += f"{dist}/RECORD,,\n"
        z.writestr(f"{dist}/RECORD", rec)
    return path


def main() -> int:
    scratch = tempfile.mkdtemp(prefix="tsflex_pkgcheck_")
    try:
        wheel = try_pip_wheel(scratch)
        if wheel is None:
            subprocess.run(
                [sys.executable, "setup.py", "-q", "build", "--build-base", scratch],
                check=True,
                cwd=str(REPO),
            )
            lib = os.path.join(scratch, "lib")
            assert os.path.isdir(os.path.join(lib, "tsflex_spark")), (
                "build_py produced no tsflex_spark dir — packages.find broken"
            )
            wheel = build_wheel_stdlib(lib, scratch)
            print("stdlib wheel:", os.path.basename(wheel))
        mods = repo_modules()
        # import every repo module from INSIDE the wheel (zipimport);
        # cwd outside the repo so a relative-path dependency can't hide.
        prog = (
            "import importlib, sys\n"
            f"sys.path.insert(0, {wheel!r})\n"
            f"mods = {mods!r}\n"
            "bad = []\n"
            "for m in mods:\n"
            "    try:\n"
            "        mod = importlib.import_module(m)\n"
            f"        if not getattr(mod, '__file__', '').startswith({wheel!r}):\n"
            "            bad.append((m, 'imported from ' + str(mod.__file__)))\n"
            "    except Exception as e:\n"
            "        bad.append((m, repr(e)))\n"
            "import tsflex_spark\n"
            "print('version:', tsflex_spark.__version__)\n"
            "print('imported from wheel:', len(mods) - len(bad), 'of', len(mods))\n"
            "for m, e in bad:\n"
            "    print('FAIL', m, e)\n"
            "sys.exit(1 if bad else 0)\n"
        )
        r = subprocess.run(
            [sys.executable, "-c", prog], cwd=tempfile.gettempdir()
        )
        if r.returncode != 0:
            return r.returncode
        with zipfile.ZipFile(wheel) as z:
            n_built = sum(
                1
                for n in z.namelist()
                if n.startswith("tsflex_spark/") and n.endswith(".py")
            )
        n_repo = sum(1 for _ in (REPO / "tsflex_spark").rglob("*.py"))
        if n_built != n_repo:
            print(f"FAIL file count: wheel {n_built} != repo {n_repo}")
            return 1
        print(f"packaging OK: {n_built} modules imported from the wheel")
        return 0
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
