"""bench.py's driver contract: ONE JSON line on stdout, always.

The driver records bench.py's stdout as the round's benchmark artifact,
so the script must emit a valid single-line JSON object with the agreed
keys even when the TPU tunnel is down (CPU fallback, flagged in detail).
Runs the real script in a subprocess on the forced-CPU path (tiny
shapes); asserts the schema, not the numbers.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_one_json_line_on_cpu():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "affine_nw_fill_gcups_per_chip"
    assert rec["unit"] == "GCUPS"
    assert isinstance(rec["value"], (int, float)) and rec["value"] > 0
    assert isinstance(rec["vs_baseline"], (int, float))
    detail = rec["detail"]
    assert detail["backend"] == "cpu"
    # CPU fallback must be flagged and must cite the last TPU headline so
    # an outage at driver-bench time reads as an outage, not a regression.
    assert detail["tpu_unavailable"] is True
    assert detail.get("last_committed_tpu_value", 0) > 1
