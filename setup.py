"""Thin setup.py shim.

All metadata lives in pyproject.toml. This file exists so legacy installs
(``pip install -e . --no-use-pep517``) work on toolchains without the
``wheel`` package, mirroring the reference's deliverable shape
(/root/reference/setup.py)."""

from setuptools import setup

setup()
