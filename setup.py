"""Setup shim: the build container carries setuptools 65 without `wheel`,
so PEP 660 editable installs (which must build a wheel) fail with
`invalid command 'bdist_wheel'`. Keeping a setup.py lets pip fall back to
the legacy `setup.py develop` path for `pip install -e .`; all metadata
lives in pyproject.toml.
"""

from setuptools import setup

setup()
