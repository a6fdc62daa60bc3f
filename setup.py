"""Shim so `python setup.py develop` works in offline environments that
lack the `wheel` package (PEP 660 editable installs via `pip install -e .`
need setuptools' bdist_wheel, which older setuptools only provides when
`wheel` is installed). All metadata lives in pyproject.toml."""

from setuptools import setup

setup()
