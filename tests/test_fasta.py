"""FASTA parser tests.

The first four tests are the reference's own parser tests, byte-for-byte
(src/parse.rs:156-252) -- they are the spec for the parser's quirky
semantics.  The rest extend coverage (roundtrip, extension gate edge cases).
"""

import os

import pytest

from sequencealigning_tpu.errors import CharError, FastaError
from sequencealigning_tpu.io.fasta import (
    parse_bytes,
    parse_fasta,
    parse_fasta_lenient,
    write_fasta,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


# --- reference tests (src/parse.rs:156-252) ---------------------------------


def test_parse_good_fasta(tmp_path):
    """parse.rs:167-186."""
    p = _write(
        tmp_path,
        "good.fa",
        ">Record1\nATGCATGCATGCATGCATGCATGCATGC\n>Record2\nATGCATGCGTGCAGTGACCACA",
    )
    res = parse_fasta(p)
    assert len(res.records) == 2
    assert len(res.records[0].name) == 8, res.records[0].name
    assert len(res.records[0].seq) == 28


def test_parse_bad_header(tmp_path):
    """parse.rs:189-215: a missing '>' turns the header into CharError chars
    and merges the following sequence into the previous record."""
    p = _write(
        tmp_path,
        "bad_header.fa",
        ">Record1\nATGCATGCATGCATGCATGCATGCATGC\nRecord2\nATGCATGCGTGCAGTGACCACA",
    )
    with pytest.raises(CharError) as exc_info:
        parse_fasta(p)
    e = exc_info.value
    assert e.chars == ["R", "e", "c", "o", "r", "d", "2"]
    assert len(e.res.records) == 1
    rec = e.res.records[0]
    assert rec.name == b">Record1"
    assert rec.seq == b"ATGCATGCATGCATGCATGCATGCATGCATGCATGCGTGCAGTGACCACA"


def test_parse_bad_nt(tmp_path):
    """parse.rs:218-238: 'K' stripped and reported, 'N' kept."""
    p = _write(tmp_path, "bad_nt.fa", ">Record1\nATGCATGCAKGCATGCATGCANNNGCATGC")
    with pytest.raises(CharError) as exc_info:
        parse_fasta(p)
    e = exc_info.value
    assert e.chars == ["K"]
    rec = e.res.records[0]
    assert rec.name == b">Record1"
    assert rec.seq == b"ATGCATGCAGCATGCATGCANNNGCATGC"


def test_parse_false_file(tmp_path):
    """parse.rs:241-251: wrong extension => FastaError."""
    p = _write(tmp_path, "whatever.txt", ">R\nACGT\n")
    with pytest.raises(FastaError):
        parse_fasta(p)


# --- extended coverage -------------------------------------------------------


@pytest.mark.parametrize("ext", ["fa", "fasta", "fna"])
def test_extension_gate_accepts(tmp_path, ext):
    p = _write(tmp_path, f"x.{ext}", ">R\nACGT\n")
    res = parse_fasta(p)
    assert res.records[0].seq == b"ACGT"


@pytest.mark.parametrize("name", ["x.FA", "x.fa.txt", "x", ".fa", "x.fq"])
def test_extension_gate_rejects(tmp_path, name):
    p = _write(tmp_path, name, ">R\nACGT\n")
    with pytest.raises(FastaError):
        parse_fasta(p)


def test_missing_file(tmp_path):
    with pytest.raises(FastaError):
        parse_fasta(tmp_path / "nope.fa")


def test_leading_garbage_discarded():
    """Content before the first '>' lands in the throwaway record
    (parse.rs:61-63, 90-91)."""
    res = parse_bytes(b"ACGT\n>R\nTTTT\n")
    assert len(res.records) == 1
    assert res.records[0].seq == b"TTTT"


def test_name_keeps_gt_and_stops_at_newline():
    res = parse_bytes(b">hello world\nACGT")
    assert res.records[0].name == b">hello world"


def test_lenient_returns_cleaned(tmp_path):
    p = _write(tmp_path, "l.fa", ">R\nACXGT\n")
    warned = []
    res = parse_fasta_lenient(p, warn=warned.append)
    assert res.records[0].seq == b"ACGT"
    assert warned == [["X"]]


def test_roundtrip(tmp_path):
    """Records::Display writes a second '>' before the stored name
    (parse.rs:141-147) -- document that quirk by asserting it."""
    res = parse_bytes(b">R1\nACGT\n>R2\nTTNN\n")
    out = tmp_path / "out.fa"
    write_fasta(res, out)
    text = out.read_text()
    assert text == ">>R1\nACGT\n>>R2\nTTNN\n"


def test_multiline_sequence_joined():
    res = parse_bytes(b">R\nACGT\nACGT\nAC\n")
    assert res.records[0].seq == b"ACGTACGTAC"


def test_empty_file_has_no_records():
    assert len(parse_bytes(b"").records) == 0


def test_drain_pops_from_back():
    """Records::drain mirrors the reference's pop-from-back Iterator impl
    (src/parse.rs:121-126); __iter__ stays front-to-back for the driver."""
    res = parse_bytes(b">A\nAC\n>B\nGT\n>C\nTT\n")
    assert [r.name for r in res] == [b">A", b">B", b">C"]
    drained = list(res.drain())
    assert [r.name for r in drained] == [b">C", b">B", b">A"]
    assert len(res) == 0
