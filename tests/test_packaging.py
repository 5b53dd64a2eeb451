"""Packaging smoke tests: the wheel metadata stays truthful without a
network round-trip (zero-egress CI can't pip-resolve; the editable install
itself is exercised by `pip install -e . --no-build-isolation`).

Checks that every console entry point in pyproject.toml targets an importable
callable, the pinned dependencies match what the environment actually
validates against, and the package-data assets the tokenizer needs are
inside the package tree. Match: the reference's deployable surface is
cog.yaml:1; here it is the wheel + entry points."""

import importlib
import os
import tomllib

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_entry_points_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 9
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_pinned_versions_match_environment(pyproject):
    import jax, flax, optax  # noqa: E401

    deps = {d.split("==")[0]: d for d in pyproject["project"]["dependencies"]}
    assert deps["jax"] == f"jax=={jax.__version__}"
    assert deps["flax"] == f"flax=={flax.__version__}"
    assert deps["optax"] == f"optax=={optax.__version__}"


def test_package_data_assets_present(pyproject):
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]["t2v_turbo_tpu"]
    assert "assets/*.gz" in pkg_data
    vocab = os.path.join(
        ROOT, "t2v_turbo_tpu", "assets", "bpe_simple_vocab_16e6.txt.gz"
    )
    assert os.path.exists(vocab), "CLIP BPE vocab must ship inside the wheel"


def test_tpu_marker_registered(pyproject):
    markers = pyproject["tool"]["pytest"]["ini_options"]["markers"]
    assert any(m.startswith("tpu:") for m in markers)
