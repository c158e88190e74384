"""Minimal setup.py shim.

pyproject.toml is the single source of packaging truth (PEP 621).
This shim exists ONLY for environments without the `wheel` package,
where pip's PEP 517 editable build (`build_editable` → bdist_wheel)
cannot run: `pip install -e . --no-use-pep517 --no-build-isolation`
falls back to setuptools' legacy develop install, which needs no
wheel. With `wheel` present, plain `pip install -e .` works and this
file is inert."""

from setuptools import setup

setup()
