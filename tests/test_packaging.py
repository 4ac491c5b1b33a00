"""Packaging metadata stays consistent with the code (pyproject.toml).

No build is run (the CI image is offline); these pin the invariants a
broken wheel would violate: the console entry point resolves, declared
package data exists, and the import surface matches the declared deps.
"""

import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_entry_point_resolves(pyproject):
    target = pyproject["project"]["scripts"]["gansynth-tpu"]
    mod_name, func_name = target.split(":")
    fn = getattr(importlib.import_module(mod_name), func_name)
    assert callable(fn)


def test_declared_package_data_exists(pyproject):
    data = pyproject["tool"]["setuptools"]["package-data"]
    for pkg, patterns in data.items():
        pkg_dir = os.path.join(ROOT, *pkg.split("."))
        for rel in patterns:
            assert os.path.exists(os.path.join(pkg_dir, rel)), (pkg, rel)


def test_runtime_deps_cover_top_level_imports(pyproject):
    # every third-party top-level import in the package must be either a
    # declared runtime dep or an optional extra (tensorflow is optional:
    # ingest falls back to the bundled C++ reader)
    declared = {
        d.split(">=")[0].split("==")[0].replace("-", "_")
        for d in pyproject["project"]["dependencies"]
    }
    declared |= {"orbax"}  # dist 'orbax-checkpoint' imports as 'orbax'
    optional = {"tensorflow", "scipy", "pytest"}
    import ast

    third_party = set()
    for dirpath, _, files in os.walk(os.path.join(ROOT, "gansynth_tpu")):
        for name in files:
            if not name.endswith(".py"):
                continue
            with open(os.path.join(dirpath, name)) as f:
                tree = ast.parse(f.read())
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    third_party |= {a.name.split(".")[0] for a in node.names}
                elif isinstance(node, ast.ImportFrom) and node.level == 0:
                    if node.module:
                        third_party.add(node.module.split(".")[0])
    import sys
    stdlib = set(sys.stdlib_module_names)
    third_party = {
        m for m in third_party
        if m not in stdlib and not m.startswith("gansynth_tpu")
    }
    missing = third_party - declared - optional
    assert not missing, f"imports not declared in pyproject: {missing}"
