"""Sparse (sorted-run) store tests vs a Python dict (SURVEY.md §7 M5)."""

import numpy as np
import jax.numpy as jnp

from findkmer_tpu.ops.sparse import (
    batch_to_runs,
    empty_store,
    merge_runs,
    store_to_host,
)

SENT = np.uint32(0xFFFFFFFF)


def _dict_counts(hi, lo, valid):
    d = {}
    for h, l, v in zip(
        np.asarray(hi).ravel(), np.asarray(lo).ravel(), np.asarray(valid).ravel()
    ):
        if v:
            key = (int(h) << 32) | int(l)
            d[key] = d.get(key, 0) + 1
    return d


def _runs_to_dict(hi, lo, cnt):
    hi, lo, cnt = map(np.asarray, (hi, lo, cnt))
    d = {}
    for h, l, c in zip(hi, lo, cnt):
        if c > 0:
            d[(int(h) << 32) | int(l)] = int(c)
    return d


def test_batch_to_runs(rng):
    hi = jnp.asarray(rng.integers(0, 4, (2, 50)).astype(np.uint32))
    lo = jnp.asarray(rng.integers(0, 8, (2, 50)).astype(np.uint32))
    valid = jnp.asarray(rng.random((2, 50)) < 0.7)
    rhi, rlo, rcnt = batch_to_runs(hi, lo, valid)
    assert _runs_to_dict(rhi, rlo, rcnt) == _dict_counts(hi, lo, valid)
    # sorted ascending with sentinels at the end
    rh, rl = np.asarray(rhi), np.asarray(rlo)
    key = rh.astype(np.uint64) << np.uint64(32) | rl.astype(np.uint64)
    assert (np.diff(key.astype(object)) >= 0).all()


def test_merge_runs_matches_dict(rng):
    cap = 128
    shi, slo, scnt = empty_store(cap)
    expect = {}
    for _ in range(5):
        hi = jnp.asarray(rng.integers(0, 3, (60,)).astype(np.uint32))
        lo = jnp.asarray(rng.integers(0, 10, (60,)).astype(np.uint32))
        valid = jnp.asarray(rng.random((60,)) < 0.8)
        for k_, v in _dict_counts(hi, lo, valid).items():
            expect[k_] = expect.get(k_, 0) + v
        rhi, rlo, rcnt = batch_to_runs(hi, lo, valid)
        shi, slo, scnt, ovf = merge_runs(shi, slo, scnt, rhi, rlo, rcnt)
        assert not bool(ovf)
    assert _runs_to_dict(shi, slo, scnt) == expect
    codes, counts = store_to_host(shi, slo, scnt)
    assert {int(c): int(n) for c, n in zip(codes, counts)} == expect
    assert (np.diff(codes.astype(object)) > 0).all()  # sorted distinct


def test_merge_overflow_detected(rng):
    cap = 8
    shi, slo, scnt = empty_store(cap)
    hi = jnp.zeros((32,), jnp.uint32)
    lo = jnp.arange(32, dtype=jnp.uint32)  # 32 distinct > cap
    valid = jnp.ones((32,), bool)
    rhi, rlo, rcnt = batch_to_runs(hi, lo, valid)
    shi, slo, scnt, ovf = merge_runs(shi, slo, scnt, rhi, rlo, rcnt)
    assert bool(ovf)


def test_merge_exact_at_capacity(rng):
    cap = 16
    shi, slo, scnt = empty_store(cap)
    hi = jnp.zeros((16,), jnp.uint32)
    lo = jnp.arange(16, dtype=jnp.uint32)
    valid = jnp.ones((16,), bool)
    rhi, rlo, rcnt = batch_to_runs(hi, lo, valid)
    shi, slo, scnt, ovf = merge_runs(shi, slo, scnt, rhi, rlo, rcnt)
    assert not bool(ovf)
    codes, counts = store_to_host(shi, slo, scnt)
    assert len(codes) == 16


def test_log_store_repeated_compactions_match_oracle(rng):
    """A tiny compaction threshold forces many store-carrying
    compactions (sort3 + value-RLE + squeeze); spectrum stays exact."""
    from conftest import random_dna
    from findkmer_tpu.config import Config
    from test_vs_oracle import check

    seq = random_dna(rng, 4000, n_prob=0.03)
    cfg = Config(
        k=17, chunk_len=64, batch_rows=2, sparse_capacity=16384,
        sparse_compact_entries=512,
    )
    check(">r\n" + seq + "\n", cfg)


def test_log_store_checkpoint_compacts(rng, tmp_path):
    """Checkpoints force compaction + squeeze; resume bit-identical."""
    import numpy as np
    from conftest import random_dna
    from findkmer_tpu.config import Config
    from findkmer_tpu import pipeline, streaming

    seq = random_dna(rng, 3000, n_prob=0.02)
    p = tmp_path / "in.fa"
    p.write_text(">r\n" + seq + "\n")
    cfg = Config(
        k=18, chunk_len=128, batch_rows=2, sparse_capacity=16384,
        sparse_compact_entries=1024,
    )
    ck = str(tmp_path / "ck")
    a = streaming.stream_count([str(p)], cfg, checkpoint_dir=ck,
                               checkpoint_every=2)
    b = pipeline.count_file(str(p), cfg)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_rle_pos_and_val_match_dict(rng):
    """New scan-RLE primitives vs dict on sorted inputs with dups."""
    from findkmer_tpu.ops import sparse as so

    lo = np.sort(rng.integers(0, 50, 300).astype(np.uint32))
    hi = np.zeros(300, np.uint32)
    cnt = so.rle_pos(jnp.asarray(hi), jnp.asarray(lo))
    got = {}
    for code, c in zip(lo, np.asarray(cnt)):
        if c:
            got[int(code)] = got.get(int(code), 0) + int(c)
    want = {}
    for code in lo:
        want[int(code)] = want.get(int(code), 0) + 1
    assert got == want

    cvals = rng.integers(1, 9, 300).astype(np.int32)
    cnt2 = so.rle_val(jnp.asarray(hi), jnp.asarray(lo),
                      jnp.asarray(cvals))
    got2 = {}
    for code, c in zip(lo, np.asarray(cnt2)):
        if c:
            got2[int(code)] = got2.get(int(code), 0) + int(c)
    want2 = {}
    for code, c in zip(lo, cvals):
        want2[int(code)] = want2.get(int(code), 0) + int(c)
    assert got2 == want2


def test_rle_exact_past_2e31_observations():
    """Regression (round-2 advisor finding): run totals must stay exact
    when cumulative observations in one merge input exceed 2^31 — the old
    value-propagating cummax wrapped negative and corrupted later runs."""
    shi = jnp.asarray(np.array([0, 0, 0, SENT], np.uint32))
    slo = jnp.asarray(np.array([1, 2, 3, SENT], np.uint32))
    scnt = jnp.asarray(np.array([1_600_000_000, 1_600_000_000, 5, 0],
                                np.int32))
    rhi = jnp.asarray(np.array([0, SENT, SENT, SENT], np.uint32))
    rlo = jnp.asarray(np.array([3, SENT, SENT, SENT], np.uint32))
    rcnt = jnp.asarray(np.array([1, 0, 0, 0], np.int32))
    nhi, nlo, ncnt, ovf = merge_runs(shi, slo, scnt, rhi, rlo, rcnt)
    out = _runs_to_dict(nhi, nlo, ncnt)
    assert out[3] == 6
    assert out[1] == 1_600_000_000
    assert out[2] == 1_600_000_000
    assert not bool(ovf)
