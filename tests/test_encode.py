"""Sequence-encoding and batch-packing tests."""

import numpy as np

from sequencealigning_tpu.config import ENCODE, PAD
from sequencealigning_tpu.io.encode import decode_seq, encode_seq, pack_batch


def test_encode_values():
    assert list(encode_seq(b"ACGTN")) == [1, 2, 4, 8, 15]


def test_match_is_bitwise_and():
    """The one-hot nibble encoding makes (a & b) != 0 exactly the reference's
    match rule incl. N-wildcard (src/align.rs:298-304)."""
    codes = {c: v for c, v in ENCODE.items()}
    for a in "ACGTN":
        for b in "ACGTN":
            expect = (a == b) or a == "N" or b == "N"
            assert ((codes[a] & codes[b]) != 0) == expect
    # PAD never matches anything, including N and PAD itself.
    for a in "ACGTN":
        assert (codes[a] & PAD) == 0
    assert (PAD & PAD) == 0


def test_decode_roundtrip():
    assert decode_seq(encode_seq(b"ACGTNNACGT")) == "ACGTNNACGT"


def test_pack_batch_shapes_and_masks():
    pairs = [(b"ACGT", b"AC"), (b"A" * 200, b"C" * 130)]
    batch = pack_batch(pairs, batch_size=8, len_multiple=128)
    assert batch.query.shape == (8, 256)
    assert batch.db.shape == (8, 256)
    assert list(batch.query_len[:2]) == [4, 200]
    assert list(batch.db_len[:2]) == [2, 130]
    assert batch.valid.tolist() == [True, True] + [False] * 6
    # Padding is PAD everywhere past the true length.
    assert (batch.query[0, 4:] == PAD).all()
    np.testing.assert_array_equal(batch.query[0, :4], encode_seq(b"ACGT"))
