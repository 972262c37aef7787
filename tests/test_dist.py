"""Distributed counting on the 8-virtual-CPU-device mesh
(SURVEY.md §4.2: multi-device logic without a cluster)."""

import io

import numpy as np
import jax
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu.io.fasta import FastaReader
from findkmer_tpu import pipeline
from findkmer_tpu.parallel import DistributedCounter, make_mesh
from test_vs_oracle import oracle_dict, spectrum_to_dict


def _count_dist(text, cfg, n_dev):
    mesh = make_mesh(n_dev)
    dc = DistributedCounter(cfg, mesh)
    state = dc.init_state()
    reader = FastaReader(io.BytesIO(text.encode()))
    for rows in pipeline.batches_from_codes(
        pipeline.code_stream(reader), cfg
    ):
        state = dc.step(state, rows)
    return dc.finalize(state)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_dev", [1, 2, 8])
@pytest.mark.parametrize("merge", ["psum", "all_to_all"])
def test_dense_dist_matches_oracle(rng, n_dev, merge):
    seq = random_dna(rng, 4000, n_prob=0.03)
    text = ">r\n" + seq + "\n"
    cfg = Config(k=8, chunk_len=64, batch_rows=8, merge=merge)
    spectrum = _count_dist(text, cfg, n_dev)
    assert spectrum_to_dict(np.asarray(spectrum), 8) == oracle_dict(text, 8)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sparse_dist_matches_oracle(rng, n_dev):
    seq = random_dna(rng, 3000, n_prob=0.02)
    text = ">r\n" + seq + "\n"
    cfg = Config(
        k=21, chunk_len=64, batch_rows=8, sparse_capacity=8192,
    )
    spectrum = _count_dist(text, cfg, n_dev)
    assert spectrum_to_dict(spectrum, 21) == oracle_dict(text, 21)


def test_all_to_all_canonical(rng):
    seq = random_dna(rng, 2000)
    text = ">r\n" + seq + "\n"
    cfg = Config(
        k=8, canonical=True, chunk_len=64, batch_rows=8, merge="all_to_all"
    )
    spectrum = _count_dist(text, cfg, 4)
    assert spectrum_to_dict(np.asarray(spectrum), 8) == oracle_dict(
        text, 8, canonical=True
    )


def test_route_overflow_detected(rng):
    # extreme skew: poly-A stream routes everything to shard 0
    text = ">r\n" + "A" * 4000 + "\n"
    cfg = Config(
        k=8, chunk_len=64, batch_rows=8, merge="all_to_all",
        route_capacity_factor=0.01,
    )
    with pytest.raises(RuntimeError, match="overflow"):
        _count_dist(text, cfg, 8)


def test_dist_matches_single_device_engine(rng):
    seq = random_dna(rng, 5000, n_prob=0.05)
    text = ">r\n" + seq + "\n"
    cfg = Config(k=6, chunk_len=128, batch_rows=8)
    from test_vs_oracle import count_text

    single, _ = count_text(text, cfg)
    multi = _count_dist(text, cfg.replace(merge="psum"), 8)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(multi))
