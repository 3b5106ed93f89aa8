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


def test_pack_arrays_matches_pack_batch():
    import numpy as np

    from sequencealigning_tpu.io.encode import pack_arrays, pack_batch

    rng = np.random.default_rng(3)
    alpha = np.frombuffer(b"ACGTN", np.uint8)
    n, lmax = 9, 37
    arrs_q = alpha[rng.integers(0, 5, (n, lmax))]
    arrs_d = alpha[rng.integers(0, 5, (n, lmax))]
    qlen = rng.integers(1, lmax + 1, n).astype(np.int32)
    dlen = rng.integers(1, lmax + 1, n).astype(np.int32)
    pairs = [
        (arrs_q[i, : qlen[i]].tobytes(), arrs_d[i, : dlen[i]].tobytes())
        for i in range(n)
    ]
    a = pack_arrays(arrs_q, arrs_d, qlen, dlen, batch_size=16)
    b = pack_batch(pairs, batch_size=16)
    np.testing.assert_array_equal(a.query, b.query)
    np.testing.assert_array_equal(a.db, b.db)
    np.testing.assert_array_equal(a.query_len, b.query_len)
    np.testing.assert_array_equal(a.db_len, b.db_len)
    np.testing.assert_array_equal(a.valid, b.valid)


def test_pack_arrays_rejects_invalid_in_valid_region_only():
    import numpy as np
    import pytest

    from sequencealigning_tpu.io.encode import pack_arrays

    q = np.frombuffer(b"ACGTXXXX", np.uint8).reshape(1, 8).copy()
    d = np.frombuffer(b"ACGTACGT", np.uint8).reshape(1, 8).copy()
    # X beyond the true length is padding garbage: allowed.
    pack_arrays(q, d, np.array([4]), np.array([8]))
    with pytest.raises(ValueError, match="invalid query"):
        pack_arrays(q, d, np.array([6]), np.array([8]))
