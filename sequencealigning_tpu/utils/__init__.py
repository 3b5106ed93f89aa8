"""Utility layer: CIGAR ops, pretty-printing, timing/metrics."""

from sequencealigning_tpu.utils.cigar import Cigar, cigar_from_ops, ops_from_pair
from sequencealigning_tpu.utils.pprint import format_alignment

__all__ = ["Cigar", "cigar_from_ops", "ops_from_pair", "format_alignment"]
