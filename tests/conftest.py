"""Test configuration: force an 8-device CPU JAX backend.

Tests never touch the real TPU (first compiles through the axon tunnel take
minutes, SURVEY.md §7); multi-device logic runs on 8 virtual CPU devices —
the standard JAX trick (SURVEY.md §4.2).

This environment's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax
and force-initializes the axon TPU backend in EVERY python process before
test code runs, so plain env vars are too late.  Instead the backend is
reset in-process: point jax_platforms at cpu, request 8 host devices, and
clear the initialized backends so the next use re-resolves to CPU.
Set FINDKMER_TESTS_ON_TPU=1 to run the suite on the real device instead.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

if os.environ.get("FINDKMER_TESTS_ON_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax
    from jax._src import xla_bridge as _xb

    jax.config.update("jax_platforms", "cpu")
    if _xb.backends_are_initialized():  # axon sitecustomize got here first
        _xb._clear_backends()

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Two test tiers: `heavy` is set explicitly on slow tests
    (subprocess CLI, mesh-wide, GB-scale); everything else gets `quick`
    so both `-m quick` and `-m heavy` select a tier directly."""
    for item in items:
        if "heavy" not in item.keywords:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def random_dna(rng, n, *, n_prob=0.0, lower_prob=0.0, iupac_prob=0.0):
    """Random test sequence with optional Ns / lowercase / IUPAC noise."""
    bases = np.array(list("ACGT"))
    seq = bases[rng.integers(0, 4, n)]
    if lower_prob:
        low = rng.random(n) < lower_prob
        seq = np.where(low, np.char.lower(seq), seq)
    if n_prob:
        seq = np.where(rng.random(n) < n_prob, "N", seq)
    if iupac_prob:
        iupac = np.array(list("RYSWKMBDHV"))
        hits = rng.random(n) < iupac_prob
        seq = np.where(hits, iupac[rng.integers(0, len(iupac), n)], seq)
    return "".join(seq)


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
