"""Dense histogram paths must agree with numpy and each other — the
deterministic sort path is the de-facto race detector (SURVEY.md §5)."""

import numpy as np
import jax.numpy as jnp
import pytest

from findkmer_tpu.ops.histogram import (
    add_counts_onehot,
    add_counts_scatter,
    add_counts_sort,
    histogram,
)


def _case(rng, T, n, dup_heavy=False):
    hi = T // 8 if dup_heavy else T
    codes = rng.integers(0, max(1, hi), (4, n)).astype(np.int32)
    valid = rng.random((4, n)) < 0.8
    return jnp.asarray(codes), jnp.asarray(valid)


@pytest.mark.parametrize("T", [4, 256, 65536])
@pytest.mark.parametrize("dup_heavy", [False, True])
def test_paths_agree(rng, T, dup_heavy):
    codes, valid = _case(rng, T, 1000, dup_heavy)
    want = np.bincount(
        np.asarray(codes)[np.asarray(valid)], minlength=T
    ).astype(np.int32)

    for fn in (add_counts_scatter, add_counts_sort, add_counts_onehot):
        table = jnp.zeros((T,), jnp.int32)
        got = np.asarray(fn(codes, valid, table, T))
        np.testing.assert_array_equal(got, want, err_msg=fn.__name__)


def test_accumulates(rng):
    T = 64
    codes, valid = _case(rng, T, 500)
    t1 = add_counts_scatter(codes, valid, jnp.zeros((T,), jnp.int32), T)
    t2 = add_counts_scatter(codes, valid, t1, T)
    want = 2 * np.bincount(
        np.asarray(codes)[np.asarray(valid)], minlength=T
    )
    np.testing.assert_array_equal(np.asarray(t2), want)


def test_all_invalid(rng):
    T = 16
    codes = jnp.asarray(rng.integers(0, T, (2, 100)).astype(np.int32))
    valid = jnp.zeros((2, 100), bool)
    got = np.asarray(histogram(codes, valid, T))
    assert (got == 0).all()
