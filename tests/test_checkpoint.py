"""Checkpoint/resume: a killed run resumed from its checkpoint must produce
bit-identical spectra (SURVEY.md §5 fault injection)."""

import numpy as np
import pytest

from conftest import random_dna
from findkmer_tpu.config import Config
from findkmer_tpu import pipeline, streaming


@pytest.fixture
def fasta_file(tmp_path, rng):
    recs = [random_dna(rng, n, n_prob=0.02) for n in (3000, 1500, 2200)]
    p = tmp_path / "in.fa"
    p.write_text("".join(f">r{i}\n{s}\n" for i, s in enumerate(recs)))
    return str(p)


def test_stream_equals_count(fasta_file):
    cfg = Config(k=6, chunk_len=128, batch_rows=4)
    a = streaming.stream_count([fasta_file], cfg)
    b = pipeline.count_file(fasta_file, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_bit_identical(fasta_file, tmp_path):
    cfg = Config(k=6, chunk_len=128, batch_rows=2)
    want = pipeline.count_file(fasta_file, cfg)

    ckpt = str(tmp_path / "ckpt")

    # simulate a crash: process only the first 3 batches, checkpointing
    # every batch, then abandon the run
    from findkmer_tpu.models.counter import KmerCounter
    from findkmer_tpu.utils import checkpoint as ckpt_mod

    counter = KmerCounter(cfg)
    state = counter.init_state()
    batches = pipeline.batches_from_file(fasta_file, cfg)
    for i, rows in enumerate(batches):
        if i >= 3:
            break  # "crash" mid-stream
        state = counter.step(state, rows)
        ckpt_mod.save(ckpt, cfg, i + 1, state, {})

    # resume and finish
    got = streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=2
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_resume_every_crash_point(fasta_file, tmp_path):
    """Exhaustive crash-point sweep: for EVERY batch index i, a run
    checkpointed through batch i and abandoned must resume to the
    bit-identical spectrum (test_resume_bit_identical covers one
    point; associativity says all points work — this checks it)."""
    from findkmer_tpu.models.counter import KmerCounter
    from findkmer_tpu.utils import checkpoint as ckpt_mod

    cfg = Config(k=6, chunk_len=256, batch_rows=2)
    want = np.asarray(pipeline.count_file(fasta_file, cfg))
    n_batches = sum(1 for _ in pipeline.batches_from_file(fasta_file, cfg))
    assert n_batches >= 3
    for crash_at in range(1, n_batches + 1):
        ckpt = str(tmp_path / f"ck{crash_at}")
        counter = KmerCounter(cfg)
        state = counter.init_state()
        for i, rows in enumerate(pipeline.batches_from_file(fasta_file,
                                                            cfg)):
            if i >= crash_at:
                break
            state = counter.step(state, rows)
            ckpt_mod.save(ckpt, cfg, i + 1, state, {})
        got = streaming.stream_count(
            [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=3
        )
        np.testing.assert_array_equal(np.asarray(got), want), crash_at


def test_resume_after_complete_is_stable(fasta_file, tmp_path):
    cfg = Config(k=5, chunk_len=256, batch_rows=2)
    ckpt = str(tmp_path / "ckpt2")
    a = streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=1
    )
    b = streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=1
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_config_mismatch_rejected(fasta_file, tmp_path):
    cfg = Config(k=5, chunk_len=256, batch_rows=2)
    ckpt = str(tmp_path / "ckpt3")
    streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=1
    )
    with pytest.raises(ValueError, match="mismatch"):
        streaming.stream_count(
            [fasta_file], cfg.replace(k=6), checkpoint_dir=ckpt
        )


def test_sparse_checkpoint_roundtrip(fasta_file, tmp_path):
    cfg = Config(
        k=17, chunk_len=128, batch_rows=2, sparse_capacity=16384
    )
    ckpt = str(tmp_path / "ckpt4")
    a = streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=2
    )
    b = pipeline.count_file(fasta_file, cfg)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_resume_stats_match_fresh_run(tmp_path, fixtures_dir):
    """Resumed runs must report the same stream stats (records/bases/
    valid_bases) as an uninterrupted run (round-2 advisor finding)."""
    import os
    from findkmer_tpu import pipeline, streaming
    from findkmer_tpu.config import Config

    src = os.path.join(fixtures_dir, "ecoli_frag.fa")
    cfg = Config(k=6, chunk_len=512, batch_rows=2)

    fresh = pipeline.StreamStats()
    spec_fresh = streaming.stream_count([src], cfg, stats=fresh)

    # first run writes checkpoints every batch; resume replays from the
    # last checkpoint and must recount the full stream's stats
    ck = str(tmp_path / "ck")
    streaming.stream_count([src], cfg, checkpoint_dir=ck,
                           checkpoint_every=1)
    resumed = pipeline.StreamStats()
    spec_resumed = streaming.stream_count(
        [src], cfg, checkpoint_dir=ck, checkpoint_every=1,
        stats=resumed)
    assert resumed.as_dict() == fresh.as_dict()
    import numpy as np
    np.testing.assert_array_equal(spec_fresh, spec_resumed)


def test_resume_fastq_fast_flow(tmp_path, rng, monkeypatch):
    """Checkpoint/resume over a FASTQ input on the offsets-based fast
    counting flow (pipeline._fastq_code_stream): a crash-resumed run
    must equal the uninterrupted spectrum, and a run checkpointed under
    one flow must resume bit-identically under the other (the batch
    stream is flow-independent — test_fastq pins the streams equal,
    this pins the composition)."""
    from findkmer_tpu.io import native
    from findkmer_tpu.models.counter import KmerCounter
    from findkmer_tpu.utils import checkpoint as ckpt_mod

    if not native.available():
        pytest.skip("native library not built")
    recs = [random_dna(rng, n, n_prob=0.02) for n in (800, 60, 400, 900)]
    p = tmp_path / "in.fastq"
    p.write_text(
        "".join(f"@r{i}\n{s}\n+\n{'I' * len(s)}\n"
                for i, s in enumerate(recs))
    )
    cfg = Config(k=6, chunk_len=128, batch_rows=2)
    monkeypatch.setenv("FINDKMER_FASTQ_FAST", "1")
    want = pipeline.count_file(str(p), cfg)

    ckpt = str(tmp_path / "ckpt")
    counter = KmerCounter(cfg)
    state = counter.init_state()
    for i, rows in enumerate(pipeline.batches_from_file(str(p), cfg)):
        if i >= 2:
            break  # "crash" mid-stream under the fast flow
        state = counter.step(state, rows)
        ckpt_mod.save(ckpt, cfg, i + 1, state, {})

    # resume under the LEGACY flow: the replayed batch prefix must line
    # up with the fast flow's checkpointed batches
    monkeypatch.setenv("FINDKMER_FASTQ_FAST", "0")
    got = streaming.stream_count(
        [str(p)], cfg, checkpoint_dir=ckpt, checkpoint_every=2
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_restore_from_legacy_flat_table(rng):
    """restore_state accepts round-1 style FLAT sorted SparseTable
    arrays (pre-row-store checkpoints) and keeps counts exact."""
    import jax.numpy as jnp

    import io

    from findkmer_tpu.models.counter import KmerCounter
    from findkmer_tpu.io.fasta import FastaReader
    from findkmer_tpu import table as table_mod

    seq = random_dna(rng, 2000, n_prob=0.02)
    cfg = Config(k=21, chunk_len=128, batch_rows=2, sparse_capacity=8192)
    counter = KmerCounter(cfg)

    # build the reference spectrum through the normal path
    state = counter.init_state()
    reader = FastaReader(io.BytesIO((">r\n" + seq + "\n").encode()))
    for rows in pipeline.batches_from_codes(pipeline.code_stream(reader), cfg):
        state = counter.step(state, rows)
    want_codes, want_counts = counter.finalize(state)

    # fake a legacy flat checkpoint: 1-D sorted (hi, lo, cnt)
    hi = jnp.asarray((want_codes >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray((want_codes & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    cnt = jnp.asarray(want_counts.astype(np.int32))
    table = table_mod.SparseTable(
        hi=hi, lo=lo, cnt=cnt, overflow=jnp.zeros((), bool), k=cfg.k
    )
    state = counter.restore_state(table)
    codes, counts = counter.finalize(state)
    np.testing.assert_array_equal(codes, want_codes)
    np.testing.assert_array_equal(counts, want_counts)


def test_resume_rejects_truncated_input(fasta_file, tmp_path):
    """A replay stream shorter than the checkpoint's batch index means
    the input changed — resume must error, not silently emit the stale
    table as a complete spectrum (round-5 review finding)."""
    import os

    cfg = Config(k=6, chunk_len=256, batch_rows=2)
    ckpt = str(tmp_path / "ck")
    streaming.stream_count(
        [fasta_file], cfg, checkpoint_dir=ckpt, checkpoint_every=1
    )
    short = tmp_path / "short.fa"
    with open(fasta_file) as f:
        text = f.read()
    short.write_text(text[: len(text) // 3])
    with pytest.raises(ValueError, match="input changed|ends after"):
        streaming.stream_count(
            [str(short)], cfg, checkpoint_dir=ckpt
        )
    assert os.path.exists(ckpt)
