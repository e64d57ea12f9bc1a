"""setup.py shim: all metadata lives in pyproject.toml.

Exists for environments whose setuptools lacks the `wheel` package
(modern `pip install -e .` builds a wheel; `python setup.py develop
--user` does not) — this sandbox is one of them.
"""

from setuptools import setup

setup()
