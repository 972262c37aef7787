"""utils/directio.DirectWriter: O_DIRECT writer with buffered fallback."""

import os

import numpy as np
import pytest

from findkmer_tpu.utils.directio import BLOCK, STAGE, DirectWriter


@pytest.mark.parametrize("sizes", [
    [],                          # empty file
    [1],                         # tiny tail only
    [BLOCK],                     # exactly one block
    [BLOCK * 3 + 7],             # blocks + tail
    [STAGE],                     # exactly one staging flush
    [STAGE + 1],                 # flush + 1-byte tail
    [5, BLOCK - 5, 1, STAGE, 13],  # mixed pieces crossing boundaries
])
def test_directwriter_roundtrip(tmp_path, sizes):
    rng = np.random.default_rng(sum(sizes) + len(sizes))
    pieces = [rng.integers(0, 256, n, dtype=np.uint8) for n in sizes]
    p = tmp_path / "out.bin"
    with DirectWriter(str(p)) as w:
        for piece in pieces:
            w.write(piece)
    want = b"".join(x.tobytes() for x in pieces)
    assert p.read_bytes() == want


def test_directwriter_accepts_bytes_and_views(tmp_path):
    p = tmp_path / "out.bin"
    with DirectWriter(str(p)) as w:
        w.write(b"abc")
        w.write(memoryview(b"defg")[1:])
        w.write(np.frombuffer(b"hi", np.uint8))
    assert p.read_bytes() == b"abcefghi"


def test_directwriter_double_close(tmp_path):
    p = tmp_path / "out.bin"
    w = DirectWriter(str(p))
    w.write(b"x" * 10)
    w.close()
    w.close()  # idempotent
    assert p.read_bytes() == b"x" * 10
