"""Spectrum-file operations: parse, merge, diff (host side).

`findkmer merge` combines per-host / per-shard spectrum TSVs into one —
the host-side tail of a multi-host run (each host emits its shard's
spectrum; merging is exact because counting is associative).  Also the
tool for diffing against a reference spectrum file.

Two merge paths:
  * merge_sorted_streaming — k-way heap merge of SORTED spectrum files
    (our writers always sort — output.py) in O(buffer) memory.  A
    chr-scale k=21 spectrum is ~2.4 GB / ~99M lines per host; dict-based
    merging of N of those needs tens of GB of RAM, streaming needs MBs.
  * merge_spectra — dict-based, for small or unsorted inputs.
"""

from __future__ import annotations

import heapq
from typing import Dict, Iterable, Iterator, List, Tuple


def read_spectrum(path, sep: str = "\t") -> Dict[str, int]:
    """Parse a KMER<sep>COUNT file into a dict."""
    out: Dict[str, int] = {}
    with open(path, "r") as f:
        for line_no, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            try:
                kmer, cnt = line.split(sep)
                out[kmer] = out.get(kmer, 0) + int(cnt)
            except ValueError as e:
                raise ValueError(
                    f"{path}:{line_no}: malformed spectrum line {line!r}"
                ) from e
    return out


def merge_spectra(paths: Iterable[str], sep: str = "\t") -> Dict[str, int]:
    """Sum counts across spectrum files (exact; order-independent)."""
    total: Dict[str, int] = {}
    for p in paths:
        for kmer, cnt in read_spectrum(p, sep).items():
            total[kmer] = total.get(kmer, 0) + cnt
    return total


def _sorted_lines(path, sep_b: bytes) -> Iterator[Tuple[bytes, int]]:
    """Yield (kmer, count) pairs from a sorted spectrum file.

    Raises on out-of-order lines — the streaming merge is only exact on
    sorted inputs (every writer in this package emits sorted spectra).
    """
    prev = None
    with open(path, "rb") as f:
        for line_no, line in enumerate(f, 1):
            line = line.rstrip(b"\n").rstrip(b"\r")
            if not line:
                continue
            try:
                kmer, cnt = line.rsplit(sep_b, 1)
                yield kmer, int(cnt)
            except ValueError as e:
                raise ValueError(
                    f"{path}:{line_no}: malformed spectrum line {line!r}"
                ) from e
            if prev is not None and kmer < prev:
                raise ValueError(
                    f"{path}:{line_no}: input not sorted "
                    f"({kmer!r} after {prev!r}); streaming merge needs "
                    "sorted spectra — use merge --in-memory for unsorted "
                    "inputs"
                )
            prev = kmer


def merge_sorted_streaming(
    paths: Iterable[str],
    out_f,
    sep: str = "\t",
    zeros_k: int | None = None,
) -> int:
    """K-way heap merge of sorted spectrum files into out_f (binary).

    Memory is O(open-file buffers) regardless of spectrum size; counts
    for equal k-mers are summed.  zeros_k interleaves zero-count lines
    for every absent k-mer of length zeros_k (direct-table semantics).
    Returns the number of output lines written.
    """
    sep_b = sep.encode()
    streams = [_sorted_lines(p, sep_b) for p in paths]
    merged = heapq.merge(*streams)  # (kmer, count) tuples, kmer-ordered

    expected = None
    if zeros_k is not None:
        from oracle.scalar import all_kmers

        expected = (k_.encode() for k_ in all_kmers(zeros_k))

    lines = 0
    cur_kmer = None
    cur_count = 0
    buf: List[bytes] = []  # batched writes: ~64k lines per flush

    def _emit(kmer: bytes, count: int):
        nonlocal lines
        if expected is not None:
            for want in expected:
                if want == kmer:
                    break
                buf.append(want + sep_b + b"0")
                lines += 1
        buf.append(kmer + sep_b + str(count).encode())
        lines += 1
        if len(buf) >= 65536:
            out_f.write(b"\n".join(buf) + b"\n")
            buf.clear()

    for kmer, count in merged:
        if kmer == cur_kmer:
            cur_count += count
        else:
            if cur_kmer is not None:
                _emit(cur_kmer, cur_count)
            cur_kmer, cur_count = kmer, count
    if cur_kmer is not None:
        _emit(cur_kmer, cur_count)
    if expected is not None:
        for want in expected:
            buf.append(want + sep_b + b"0")
            lines += 1
            if len(buf) >= 65536:
                out_f.write(b"\n".join(buf) + b"\n")
                buf.clear()
    if buf:
        out_f.write(b"\n".join(buf) + b"\n")
    return lines


def spectrum_lines(
    counts: Dict[str, int], sep: str = "\t", zeros_k: int | None = None
) -> Iterable[str]:
    """Lexicographically ordered output lines.

    zeros_k: if set, emit all 4^k k-mers including zero counts.
    """
    if zeros_k is not None:
        from oracle.scalar import all_kmers

        for kmer in all_kmers(zeros_k):
            yield f"{kmer}{sep}{counts.get(kmer, 0)}"
    else:
        for kmer in sorted(counts):
            yield f"{kmer}{sep}{counts[kmer]}"


def diff_spectra(a: Dict[str, int], b: Dict[str, int]) -> List[str]:
    """Human-readable differences between two spectra (empty == equal)."""
    out = []
    for kmer in sorted(set(a) | set(b)):
        ca, cb = a.get(kmer, 0), b.get(kmer, 0)
        if ca != cb:
            out.append(f"{kmer}: {ca} != {cb}")
    return out
