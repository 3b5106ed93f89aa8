"""Probe Mosaic dtype support on the current TPU toolchain.

NEXT.md item: retest i16 vector ops every round -- the moment they
compile, int16 absolute scores at bt=16 double the flagship kernel's
cells/vreg (~2x GCUPS).  Each probe compiles + runs a tiny Pallas kernel
exercising one op class and reports ok/fail.

Usage: python benchmarks/mosaic_probe.py
"""

from __future__ import annotations

import json
import sys

import numpy as np

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root

from sequencealigning_tpu.utils.compilecache import enable as _enable_cache

_enable_cache()


def main() -> int:
    import os

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def probe(name, body, dtype):
        def kernel(x_ref, o_ref):
            o_ref[...] = body(x_ref[...], jnp)

        x = jnp.asarray(np.arange(8 * 256).reshape(8, 256) % 17, dtype)
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                interpret=jax.default_backend() != "tpu",
            )(x)
            np.asarray(out)
            return {"probe": name, "ok": True}
        except Exception as ex:
            return {
                "probe": name, "ok": False,
                "error": f"{type(ex).__name__}: {str(ex)[:140]}",
            }

    cases = []
    for dt, tag in ((jnp.int16, "i16"), (jnp.int8, "i8")):
        cases += [
            (f"{tag}_add", lambda x, jnp: x + x, dt),
            # Derive the second operand from a roll so nothing constant-
            # folds: the old `where(x >= 3, max(x, x), x)` form folded to
            # `x` and reported a false OK on a Mosaic with no ordered
            # i16 compare or max (observed 2026-08-18).
            (f"{tag}_max_cmp_select",
             lambda x, jnp: jnp.where(
                 x >= jnp.roll(x, 1, axis=1),
                 jnp.maximum(x, jnp.roll(x, 1, axis=1)), x), dt),
            (f"{tag}_sub", lambda x, jnp: x - jnp.roll(x, 1, axis=1), dt),
            (f"{tag}_roll", lambda x, jnp: jnp.roll(x, 1, axis=1), dt),
        ]
    cases += [
        ("i16_loop_add",
         lambda x, jnp: jax.lax.fori_loop(0, 8, lambda i, v: v + x, x),
         jnp.int16),
        ("bf16_roll_pltpu",
         lambda x, jnp: __import__(
             "jax.experimental.pallas.tpu", fromlist=["roll"]
         ).roll(x, 1, 1),
         jnp.bfloat16),
        ("bf16_where",
         lambda x, jnp: jnp.where(x > 2, x, x + 1), jnp.bfloat16),
    ]

    out = []
    for name, body, dt in cases:
        row = probe(name, body, dt)
        out.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
