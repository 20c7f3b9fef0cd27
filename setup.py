"""Shim for legacy editable installs (`pip install -e .` on toolchains
without the `wheel` package, where PEP 660 metadata generation fails
with `invalid command 'bdist_wheel'`). All metadata lives in
pyproject.toml."""

from setuptools import setup

setup()
