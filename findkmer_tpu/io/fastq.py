"""Streaming FASTQ reader (4-line records) + transparent gzip input.

The reference reads FASTA only (SURVEY.md §2.1 R2); FASTQ and gzip input
are tool-class envelope features (PAPERS.md: KMC/Gerbil read FASTQ) added
per the round-1 verdict.  Counting semantics are unchanged: each read is
one record (windows never span reads), quality lines are skipped entirely,
and non-ACGT bases in the sequence line mask windows as usual.

Strict 4-line FASTQ only (@header / sequence / + / quality) — the
multi-line variant is long-deprecated and rejected with a clear error.
Quality lines may contain '@' and '+' freely; the parser is positional,
never content-sniffing.

The hot path is block-buffered: newline positions come from one numpy
scan per multi-MB block and sequence lines are sliced out by line index
(mod 4), so per-read Python work is one RecordChunk object.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from findkmer_tpu.io.fasta import RecordChunk, open_maybe_gzip


class FastqReader:
    """Block-buffered streaming FASTQ reader, RecordChunk-compatible.

    Yields one final RecordChunk per read so downstream record isolation
    (pipeline.code_stream's INVALID separator) works unchanged.
    """

    def __init__(self, path_or_file, block_size: int = 1 << 22):
        self._f, self._own = open_maybe_gzip(path_or_file)
        self.block_size = int(block_size)

    def close(self):
        if self._own:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ------------------------------------------------------------------
    def chunks(self) -> Iterator[RecordChunk]:
        leftover = b""
        line_idx = 0          # global line counter (record line = idx % 4)
        record_id = -1
        header = ""
        while True:
            block = self._f.read(self.block_size)
            buf = leftover + block
            if not buf:
                break
            if not block:  # EOF: terminate a final unterminated line
                buf += b"\n"
                leftover = b""
            else:
                # hold back the trailing partial line
                cut = buf.rfind(b"\n") + 1
                leftover = buf[cut:]
                buf = buf[:cut]
            if not buf:
                if not block:
                    break
                continue
            arr = np.frombuffer(buf, dtype=np.uint8)
            ends = np.flatnonzero(arr == 0x0A)
            start = 0
            for e in ends:
                end = int(e)
                if end > start and buf[end - 1] == 0x0D:  # CRLF
                    end -= 1
                line = buf[start:end]
                phase = line_idx % 4
                if phase == 0:
                    if not line:
                        # tolerate blank lines between records only
                        start = e + 1
                        continue
                    if line[:1] != b"@":
                        raise ValueError(
                            f"FASTQ parse error at line {line_idx + 1}: "
                            f"expected '@header', got {line[:30]!r} "
                            "(only strict 4-line FASTQ is supported)"
                        )
                    header = line[1:].decode("ascii", "replace").strip()
                elif phase == 1:
                    record_id += 1
                    yield RecordChunk(record_id, header, line, final=True)
                elif phase == 2:
                    if line[:1] != b"+":
                        raise ValueError(
                            f"FASTQ parse error at line {line_idx + 1}: "
                            f"expected '+', got {line[:30]!r} "
                            "(multi-line FASTQ is not supported)"
                        )
                # phase 3: quality line — skipped entirely
                line_idx += 1
                start = e + 1
            if not block:
                break
        if line_idx % 4 not in (0, 2, 3):
            # ended right after a header with no sequence line
            raise ValueError("truncated FASTQ: header without sequence")

    # ------------------------------------------------------------------
    def records(self):
        for ch in self.chunks():
            yield ch.header, ch.data


def sniff_head(head: bytes) -> str:
    """'fasta' | 'fastq' from a peeked prefix (no bytes consumed)."""
    for i in range(len(head)):
        b = head[i:i + 1]
        if not b.isspace():
            return "fastq" if b == b"@" else "fasta"
    return "fasta"


def sniff_format(path) -> str:
    """'fasta' | 'fastq' by first non-whitespace byte ('@' = FASTQ)."""
    f, own = open_maybe_gzip(path)
    try:
        while True:
            b = f.read(1)
            if not b:
                return "fasta"  # empty: either parser yields nothing
            if not b.isspace():
                return "fastq" if b == b"@" else "fasta"
    finally:
        if own:
            f.close()
