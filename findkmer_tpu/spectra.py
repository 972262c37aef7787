"""Spectrum-file operations: parse, merge, diff (host side).

`findkmer merge` combines per-host / per-shard spectrum TSVs into one —
the host-side tail of a multi-host run (each host emits its shard's
spectrum; merging is exact because counting is associative).  Also the
tool for diffing against a reference spectrum file.
"""

from __future__ import annotations

from typing import Dict, Iterable, List


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
