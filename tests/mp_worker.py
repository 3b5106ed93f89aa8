"""One JAX process of a process-spanning CPU mesh (driven by
tests/test_multiprocess.py).

Exercises the DCN-facing half of the distributed layer the way SURVEY §4
prescribes but round 3 never ran: REAL separate processes joined with
jax.distributed.initialize (mesh.multihost_init), a mesh spanning both,
per-process input shards assembled with
jax.make_array_from_process_local_data, shard_map fills with an
all_gather score merge (Gloo CPU collectives stand in for ICI/DCN), and
a process-0 result gather.

Usage: python tests/mp_worker.py <process_id> <num_processes> <port>
Prints "RESULT <json>" on process 0.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from sequencealigning_tpu.parallel.mesh import multihost_init

    multihost_init(f"localhost:{port}", num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    import json
    import random

    import numpy as np

    from sequencealigning_tpu.io.encode import pack_batch
    from sequencealigning_tpu.parallel.runner import DataParallelRunner
    from sequencealigning_tpu.parallel.streaming import stream_align

    rng = random.Random(21)
    pairs = []
    for _ in range(32):
        n1 = rng.randint(3, 24)
        n2 = rng.randint(3, 24)
        pairs.append(
            (
                bytes(rng.choice(b"ACGT") for _ in range(n1)),
                bytes(rng.choice(b"ACGT") for _ in range(n2)),
            )
        )
    per = 32 // nproc
    local = pairs[pid * per : (pid + 1) * per]  # this host's input shard

    runner = DataParallelRunner(backend="lax", np_slots=2)

    # --- runner.scores over the process-spanning mesh --------------------
    batch = pack_batch(local, batch_size=per)
    finals = np.asarray(runner.scores(batch))  # gathered: global rows

    def extract(global_scores, n_per):
        # Pair j of process p lives at global row p * bp_local + j
        # (runner.mp_local_slice layout).
        bp_local = global_scores.shape[0] // nproc
        return np.concatenate(
            [
                global_scores[p * bp_local : p * bp_local + n_per]
                for p in range(nproc)
            ]
        )

    scores_all = extract(finals, per)

    # --- stream_align with per-process shards, 2 batches ------------------
    got = {}
    n_local = stream_align(
        local, runner=runner, batch_size=per // 2,
        on_result=lambda i, s: got.__setitem__(i, s),
    )
    assert n_local == per, (n_local, per)
    stream_scores = []
    for i in sorted(got):
        stream_scores.append(extract(got[i], per // 2))
    stream_all = np.concatenate(
        [np.concatenate([b[p * (per // 2) : (p + 1) * (per // 2)]
                         for b in stream_scores])
         for p in range(nproc)]
    )

    # --- cigars streaming across processes (VERDICT r4 item 4) ------------
    # Each process walks + drains only its addressable packed-op rows
    # (runner._device_walk_finish_mp); on_alignments receives the LOCAL
    # pairs' alignments, which the harness stitches and byte-compares
    # against a single-process run.
    aln_got = {}
    n_cig = stream_align(
        local, runner=runner, batch_size=per // 2, cigars=True,
        on_alignments=lambda i, t: aln_got.__setitem__(i, list(t)),
    )
    assert n_cig == per, (n_cig, per)
    cig = []
    for i in sorted(aln_got):
        for t in aln_got[i]:
            assert isinstance(t, tuple), t
            cig.append([t[0], t[1][0][0], t[1][0][1]])
    print(f"CIGARS{pid} " + json.dumps(cig), flush=True)

    # --- textbook-mode (semi) cigars across processes (r5) ----------------
    aln_modes = {}
    n_m = stream_align(
        local, runner=runner, batch_size=per // 2, cigars=True,
        mode="semi",
        on_alignments=lambda i, t: aln_modes.__setitem__(i, list(t)),
    )
    assert n_m == per, (n_m, per)
    mod = []
    for i in sorted(aln_modes):
        for t in aln_modes[i]:
            assert isinstance(t, tuple), t
            mod.append([t[0], t[1][0][0], t[1][0][1]])
    print(f"MODES{pid} " + json.dumps(mod), flush=True)

    if pid == 0:
        print(
            "RESULT "
            + json.dumps(
                {
                    "scores": scores_all.max(axis=1).tolist(),
                    "stream": stream_all.max(axis=1).tolist(),
                    "devices": len(jax.devices()),
                    "processes": jax.process_count(),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
