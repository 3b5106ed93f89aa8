"""I/O layer: FASTA parsing, sequence encoding/batching, result writing."""

from sequencealigning_tpu.io.fasta import Record, Records, parse_fasta, write_fasta
from sequencealigning_tpu.io.encode import encode_seq, decode_seq, pack_arrays, pack_batch, PairBatch

__all__ = [
    "Record",
    "Records",
    "parse_fasta",
    "write_fasta",
    "encode_seq",
    "decode_seq",
    "pack_arrays",
    "pack_batch",
    "PairBatch",
]
