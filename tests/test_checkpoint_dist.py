"""Checkpoint/resume on multi-device meshes (round-4 verdict item 1).

The flagship distributed counter is checkpointable: every merge
strategy's state reduces to one portable table (dist.table_state), a
crashed stream resumes bit-identically, and checkpoints are ELASTIC —
a checkpoint written at one --devices/--merge resumes at another,
because counting is associative and restore_state redistributes.

All tests run in-process on the 8-virtual-CPU mesh (conftest.py);
subprocess SIGKILL variants live in test_fault_injection.py and the
coordinator-group kill in test_stream_multihost_cli.py.
"""

import os

import numpy as np
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu import pipeline, streaming


@pytest.fixture
def fasta_file(tmp_path, rng):
    recs = [random_dna(rng, n, n_prob=0.02) for n in (9000, 4500, 7000)]
    p = tmp_path / "in.fa"
    p.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(recs)))
    return str(p)


def _spectra_equal(a, b):
    if isinstance(a, tuple):
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _crash_then_resume(fasta_file, cfg, ckpt, crash_at):
    """Step a fresh counter through `crash_at` batches with per-batch
    checkpoints (the streaming._save path: table_state + npz + spill
    manifest), abandon it, then resume via stream_count."""
    from findkmer_tpu.models.counter import make_counter

    counter = make_counter(cfg)
    state = counter.init_state()
    for i, rows in enumerate(pipeline.batches_from_file(fasta_file, cfg)):
        if i >= crash_at:
            break
        state = counter.step(state, rows)
        state = streaming._save(counter, ckpt, cfg, i + 1, state, None)
    return streaming.stream_count([fasta_file], cfg, checkpoint_dir=ckpt)


MERGES = [
    ("psum", dict(k=6, devices=4)),
    ("psum_scatter", dict(k=6, devices=4)),
    ("all_to_all", dict(k=6, devices=4, table_mode="direct")),
    ("dp_sparse", dict(k=17, devices=4, sparse_compact_entries=16384)),
]


@pytest.mark.parametrize("merge,kw", MERGES, ids=[m for m, _ in MERGES])
def test_mesh_crash_resume_bit_identical(fasta_file, tmp_path, merge, kw):
    kw = dict(kw)
    if merge != "dp_sparse":
        kw["merge"] = merge
    cfg = Config(chunk_len=1024, batch_rows=4, **kw)
    want = pipeline.count_file(fasta_file, cfg)
    got = _crash_then_resume(
        fasta_file, cfg, str(tmp_path / "ck"), crash_at=3
    )
    _spectra_equal(got, want)


def test_dp_sparse_crash_points_across_compaction(fasta_file, tmp_path):
    """dp_sparse resume at crash points before AND after the first
    device-side compaction (per-device cap 4096 codes, 1024/batch:
    compactions land at batch 4, 8, ...)."""
    cfg = Config(
        k=17, devices=4, chunk_len=1024, batch_rows=4,
        sparse_compact_entries=16384,
    )
    want = pipeline.count_file(fasta_file, cfg)
    for crash_at in (2, 5, 9):
        got = _crash_then_resume(
            fasta_file, cfg, str(tmp_path / f"ck{crash_at}"), crash_at
        )
        _spectra_equal(got, want)


def test_mesh_resume_every_crash_point(fasta_file, tmp_path):
    """Exhaustive crash-point sweep ON THE MESH (the dist analog of
    test_checkpoint.test_resume_every_crash_point): for EVERY batch
    index i, a 4-device psum run checkpointed through batch i and
    abandoned must resume to the bit-identical spectrum."""
    cfg = Config(k=6, devices=4, chunk_len=1024, batch_rows=4)
    want = np.asarray(pipeline.count_file(fasta_file, cfg))
    n_batches = sum(1 for _ in pipeline.batches_from_file(fasta_file, cfg))
    assert n_batches >= 3
    for crash_at in range(1, n_batches + 1):
        got = _crash_then_resume(
            fasta_file, cfg, str(tmp_path / f"ck{crash_at}"), crash_at
        )
        np.testing.assert_array_equal(np.asarray(got), want)


def test_elastic_resume_dense_across_devices_and_merge(
    fasta_file, tmp_path
):
    """A dense checkpoint restores onto any mesh: single-device
    checkpoints resume at --devices 4 (both psum and all_to_all), and a
    4-device psum checkpoint resumes single-device — all bit-identical
    to the uninterrupted count."""
    base = dict(k=6, chunk_len=1024, batch_rows=4)
    want = pipeline.count_file(fasta_file, Config(**base))

    # 1 -> 4 (psum) and 1 -> 4 (all_to_all)
    ck = str(tmp_path / "ck14")
    cfg1 = Config(devices=1, **base)
    _seed_checkpoint(fasta_file, cfg1, ck, crash_at=3)
    for merge in ("psum", "all_to_all"):
        got = streaming.stream_count(
            [fasta_file],
            Config(devices=4, merge=merge, table_mode="direct", **base),
            checkpoint_dir=_copy_ck(ck, tmp_path / f"ck14{merge}"),
        )
        _spectra_equal(got, want)

    # 4 (psum) -> 1
    ck = str(tmp_path / "ck41")
    cfg4 = Config(devices=4, merge="psum", **base)
    _seed_checkpoint(fasta_file, cfg4, ck, crash_at=3)
    got = streaming.stream_count(
        [fasta_file], Config(devices=1, **base), checkpoint_dir=ck
    )
    _spectra_equal(got, want)


def test_elastic_resume_sparse_across_devices(fasta_file, tmp_path):
    """Sparse (k=17) checkpoints are elastic too: 1 -> 4 devices and
    4 -> 1 both resume bit-identically (the row store re-deals into
    the target geometry on restore)."""
    base = dict(k=17, chunk_len=1024, batch_rows=4,
                sparse_compact_entries=16384)
    want = pipeline.count_file(fasta_file, Config(**base))

    ck = str(tmp_path / "ck14")
    _seed_checkpoint(fasta_file, Config(devices=1, **base), ck, crash_at=5)
    got = streaming.stream_count(
        [fasta_file], Config(devices=4, **base), checkpoint_dir=ck
    )
    _spectra_equal(got, want)

    ck = str(tmp_path / "ck41")
    _seed_checkpoint(fasta_file, Config(devices=4, **base), ck, crash_at=5)
    got = streaming.stream_count(
        [fasta_file], Config(devices=1, **base), checkpoint_dir=ck
    )
    _spectra_equal(got, want)


def test_mesh_checkpoint_composes_with_spill(fasta_file, tmp_path):
    """dp_sparse + --spill + --checkpoint on the 4-device mesh: a
    crashed run whose checkpoint predates some spill runs resumes
    bit-identically (post-checkpoint runs are discarded, their batches
    replayed) — the mesh analog of the single-chip composition test."""
    spd = str(tmp_path / "sp")
    cfg = Config(
        k=17, devices=4, chunk_len=1024, batch_rows=4,
        sparse_compact_entries=16384, sparse_capacity=512,
        spill_dir=spd,
    )
    plain = Config(
        k=17, devices=4, chunk_len=1024, batch_rows=4,
        sparse_compact_entries=16384,
    )
    want = pipeline.count_file(fasta_file, plain)

    from findkmer_tpu.models.counter import make_counter

    counter = make_counter(cfg)
    state = counter.init_state()
    ck = str(tmp_path / "ck")
    n_seen = 0
    for i, rows in enumerate(pipeline.batches_from_file(fasta_file, cfg)):
        state = counter.step(state, rows)
        n_seen += 1
        # checkpoint only the first 5 batches; keep stepping so spill
        # runs past the checkpoint exist at "crash" time
        if i < 5:
            state = streaming._save(counter, ck, cfg, i + 1, state, None)
        if i >= 9:
            break
    state = counter.flush(state)  # force spills past the checkpoint
    assert counter._spill_n > 0, "spill never triggered; retune the test"

    got = streaming.stream_count([fasta_file], cfg, checkpoint_dir=ck)
    _spectra_equal(got, want)


def test_resume_topology_mismatch_rejected(fasta_file, tmp_path):
    """batch_index indexes a host's round-robin subsequence, so a
    checkpoint written at --num-processes 2 must refuse to resume at
    --num-processes 3 (it would silently skip the wrong batches)."""
    cfg = Config(k=6, chunk_len=1024, batch_rows=4)
    ck = str(tmp_path / "ck")
    streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ck, checkpoint_every=1,
        num_processes=2, process_id=0,
    )
    with pytest.raises(ValueError, match="num_processes"):
        streaming.stream_count(
            [fasta_file], cfg, checkpoint_dir=ck, checkpoint_every=1,
            num_processes=3, process_id=0,
        )


def test_route_overflow_fails_checkpoint(tmp_path, rng):
    """all_to_all: table_state refuses to persist overflowed (silently
    incomplete) routing state."""
    from findkmer_tpu.models.counter import make_counter

    cfg = Config(
        k=6, devices=4, merge="all_to_all", table_mode="direct",
        chunk_len=64, batch_rows=4, route_capacity_factor=0.01,
        packed_h2d=False,
    )
    counter = make_counter(cfg)
    state = counter.init_state()
    rows = np.zeros((4, cfg.row_len), np.uint8)  # all-A: one hot shard
    state = counter._step(state[0], state[1], counter.put_batch(rows))
    with pytest.raises(RuntimeError, match="overflow"):
        counter.table_state(state)


def _seed_checkpoint(fasta_file, cfg, ckpt, crash_at):
    from findkmer_tpu.models.counter import make_counter

    counter = make_counter(cfg)
    state = counter.init_state()
    for i, rows in enumerate(pipeline.batches_from_file(fasta_file, cfg)):
        if i >= crash_at:
            break
        state = counter.step(state, rows)
        state = streaming._save(counter, ckpt, cfg, i + 1, state, None)


def _copy_ck(src, dst):
    import shutil

    shutil.copytree(src, dst)
    return str(dst)
