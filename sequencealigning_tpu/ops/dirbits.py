"""Packed per-cell direction-bit layout shared by kernels and traceback.

One byte per DP cell, 4 consecutive anti-diagonals packed per uint32 word.
For cell (x, y) of pair b (x = db index = lane, y = query index,
d = x + y = anti-diagonal):

    word  = dirs[d // 4, b, x]
    byte  = (word >> (8 * (d % 4))) & 0xFF

Bit semantics (all computed on the maximizing Gotoh recurrence;
ties set multiple bits -- that is what enables co-optimal enumeration):

* HM/HI/HD: which plane(s) achieve H(x,y) = max(M,I,D)(x,y).  Because
  M(x+1,y+1) = H(x,y) + sub, these are exactly the M-parent set of the
  *successor* diagonal cell (reference m_pointer,
  needleman_wunsch_affine.rs:120-153).
* IEXT/IOPEN: I(x,y) came from I(x,y-1)+e / M(x,y-1)+o+e
  (reference i_pointer, :108-119).
* DEXT/DOPEN: D(x,y) came from D(x-1,y)+e / M(x-1,y)+o+e
  (reference d_pointer, :96-107).
"""

HM = 1
HI = 2
HD = 4
IEXT = 8
IOPEN = 16
DEXT = 32
DOPEN = 64
# Local (Smith-Waterman-affine) mode only: M(x,y) restarted from 0 here --
# the traceback stop condition.
LSTART = 128


def pack_bytes_to_words(bytes_, d_total: int):
    """Pack a (D, B, P) uint8 per-diagonal byte stack into (ceil(D/4), B, P)
    uint32 words, little-endian in d -- the shared layout every fill
    variant must emit and ops.traceback._byte reads."""
    import jax.numpy as jnp

    d4 = -(-d_total // 4)
    pad = d4 * 4 - d_total
    bytes_ = jnp.pad(bytes_, ((0, pad), (0, 0), (0, 0)))
    w = bytes_.reshape(d4, 4, bytes_.shape[1], bytes_.shape[2]).astype(
        jnp.uint32
    )
    return w[:, 0] | (w[:, 1] << 8) | (w[:, 2] << 16) | (w[:, 3] << 24)
