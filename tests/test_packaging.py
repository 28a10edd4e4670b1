"""Packaging sanity: pyproject.toml parses, names the real package, and
every console-script target resolves to a callable.

Keeps the pip surface honest without requiring an install: a broken
entry-point path would otherwise only surface for end users."""
from __future__ import annotations

import importlib
import os

import pytest

# stdlib only from 3.11; pyproject declares >=3.10, so skip (not error)
# at collection on the older interpreter
tomllib = pytest.importorskip("tomllib")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PYPROJECT = os.path.join(ROOT, "pyproject.toml")


@pytest.fixture(scope="module")
def project():
    with open(PYPROJECT, "rb") as f:
        return tomllib.load(f)["project"]


def test_metadata(project):
    import ratio_guided_multimodal_fm_tpu as pkg

    assert project["name"] == "ratio-guided-multimodal-fm-tpu"
    assert project["version"] == pkg.__version__


def test_console_scripts_resolve(project):
    scripts = project["scripts"]
    assert len(scripts) >= 14          # all CLIs + interop both ways
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func_name)), (name, target)
