"""Read filtering by spectrum membership (kmc_tools `filter` class).

`findkmer filter` keeps (or drops, --invert) reads whose k-mers hit a
spectrum: a read passes when at least `min_hits` of its valid k-mer
windows (or a `min_frac` fraction) are present in the given spectrum
file.  The tool-class envelope feature of KMC/kmc_tools (PAPERS.md
landscape); the reference has nothing comparable (SURVEY.md §2.1).

Host-side and vectorized: filtering is IO-bound per read (like the
reference's R1/R2 file plumbing, SURVEY.md §2.1, Python/numpy is the
appropriate tier); window codes are built with a numpy rolling
shift-or per record and membership is one searchsorted against the
sorted spectrum code array.  FASTQ quality lines are preserved
verbatim on output.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

from findkmer_tpu import spectra as _spectra

_CODE_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _b in enumerate(b"ACGT"):
    _CODE_LUT[_b] = _i
    _CODE_LUT[_b + 32] = _i  # lowercase


def window_codes_host(seq: bytes, k: int):
    """(codes u64, valid bool) for every window of one sequence.

    codes[i] covers seq[i:i+k]; valid[i] is False when any base in the
    window is non-ACGT.  Vectorized shift-or (O(k) numpy passes)."""
    b = _CODE_LUT[np.frombuffer(seq, dtype=np.uint8)]
    n = b.size - k + 1
    if n <= 0:
        return np.empty(0, np.uint64), np.empty(0, bool)
    bad = (b == 255).astype(np.int32)
    cbad = np.concatenate([[0], np.cumsum(bad)])
    valid = (cbad[k:] - cbad[:-k]) == 0
    safe = np.where(b == 255, 0, b).astype(np.uint64)
    codes = np.zeros(n, np.uint64)
    for j in range(k):
        codes |= safe[j : j + n] << np.uint64(2 * (k - 1 - j))
    return codes, valid


@dataclass
class FilterSpec:
    """A loaded spectrum as a membership set (sorted u64 codes)."""

    k: int
    codes: np.ndarray  # sorted uint64
    canonical: bool = False

    @classmethod
    def load(cls, path, sep: str = "\t", canonical: bool = False,
             min_count: int = 0, max_count: int = 0) -> "FilterSpec":
        spectra = _spectra
        sep_b = sep.encode()
        k = spectra._infer_k(path, sep_b)
        if k is None:
            raise ValueError(f"{path}: empty or malformed spectrum")
        parsed = (
            spectra._parse_binary(path, k, sep_b)
            if len(sep_b) == 1 else None
        )
        if parsed is None:
            from findkmer_tpu.ops.window import str_to_code

            d = spectra.read_spectrum(path, sep)
            codes = np.fromiter(
                (str_to_code(km) for km in d), np.uint64, len(d)
            )
            counts = np.fromiter(d.values(), np.int64, len(d))
        else:
            codes, counts = parsed
        m = counts > 0
        codes, counts = codes[m], counts[m]
        if canonical:
            # fold BEFORE thresholding: a revcomp pair's counts sum in
            # canonical space, and the threshold must see the sum
            codes, counts = spectra.canonize_runs(codes, counts, k)
        m = np.ones(codes.size, bool)
        if min_count > 1:
            m &= counts >= min_count
        if max_count:
            m &= counts <= max_count
        codes = np.sort(codes[m])
        return cls(k=k, codes=codes, canonical=canonical)

    def hits(self, seq: bytes) -> Tuple[int, int]:
        """(hit windows, valid windows) of one read against the set."""
        codes, valid = window_codes_host(seq, self.k)
        if self.canonical:
            codes = np.minimum(
                codes, _spectra.revcomp_codes_u64(codes, self.k)
            )
        codes = codes[valid]
        if codes.size == 0 or self.codes.size == 0:
            return 0, int(codes.size)
        idx = np.searchsorted(self.codes, codes)
        np.clip(idx, 0, self.codes.size - 1, out=idx)
        hit = self.codes[idx] == codes
        return int(np.count_nonzero(hit)), int(codes.size)


def _records_with_raw(path, fmt: str) -> Iterator[Tuple[bytes, bytes]]:
    """Yield (sequence_bytes, verbatim_record_bytes) per read.

    FASTQ: strict 4-line groups, quality preserved verbatim; FASTA:
    records re-emitted as '>header\\nseq\\n' (one line)."""
    from findkmer_tpu.io.fasta import FastaReader, open_maybe_gzip
    from findkmer_tpu.io.fastq import sniff_format

    if fmt == "auto":
        fmt = sniff_format(path)
    if fmt == "fastq":
        f, own = open_maybe_gzip(path)
        try:
            while True:
                group = [f.readline() for _ in range(4)]
                if not group[0]:
                    return
                if len(group[3]) == 0:
                    raise ValueError(f"{path}: truncated FASTQ record")
                # strict 4-line records only (same contract as
                # io/fastq.FastqReader): a non-'+' third line means
                # wrapped sequence/quality — refuse rather than filter
                # reads against misaligned bytes
                if not group[0].startswith(b"@") or not group[2].startswith(
                    b"+"
                ):
                    raise ValueError(
                        f"{path}: multi-line FASTQ is not supported "
                        "(expected @header/seq/+/quality groups)"
                    )
                seq = group[1].rstrip(b"\r\n")
                yield seq, b"".join(group)
        finally:
            if own:
                f.close()
        return
    with FastaReader(path) as reader:
        for header, seq in reader.records():
            raw = b">" + header.encode("ascii", "replace") + b"\n" + seq \
                + b"\n"
            yield seq, raw


def filter_file(
    path,
    out_f,
    spec: FilterSpec,
    *,
    fmt: str = "auto",
    min_hits: int = 1,
    min_frac: Optional[float] = None,
    invert: bool = False,
) -> Tuple[int, int]:
    """Stream reads from `path`, write passing records to out_f.

    A read passes when hits >= min_hits AND (min_frac is None or
    hits/valid_windows >= min_frac); --invert keeps the complement.
    Returns (reads kept, reads seen)."""
    kept = seen = 0
    for seq, raw in _records_with_raw(path, fmt):
        seen += 1
        hits, windows = spec.hits(seq)
        ok = hits >= min_hits
        if ok and min_frac is not None:
            ok = windows > 0 and hits / windows >= min_frac
        if ok != invert:
            out_f.write(raw)
            kept += 1
    return kept, seen
