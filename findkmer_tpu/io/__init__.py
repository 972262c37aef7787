from findkmer_tpu.io.fasta import FastaReader, RecordChunk, read_records
from findkmer_tpu.io.sam import BamReader, SamReader
from findkmer_tpu.io.encode import (
    encode_bytes,
    INVALID,
    encoder_backend,
    pack_2bit,
    unpack_2bit,
)

__all__ = [
    "FastaReader",
    "BamReader",
    "SamReader",
    "RecordChunk",
    "read_records",
    "encode_bytes",
    "INVALID",
    "encoder_backend",
    "pack_2bit",
    "unpack_2bit",
]
