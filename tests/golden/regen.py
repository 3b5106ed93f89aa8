"""Regenerate the golden CLI fixtures.

Run from the repo root:  python tests/golden/regen.py

The fixtures freeze the framework's reference-compat CLI output (derived
from the Rust reference's tested semantics -- src/parse.rs:156-252,
src/align.rs:231-265, src/needleman_wunsch_affine.rs:390-411,
src/wfa.rs:950-980 -- and pinned by the oracle test layer) so any compat
regression fails the byte-comparing differential test
(tests/test_golden_cli.py)."""

import contextlib
import io
import os
import re
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# (fixture name, extra CLI args)
CASES = [
    ("a-star", ["-a", "a-star"]),
    ("needleman-wunsch", ["-a", "needleman-wunsch"]),
    ("wfa", ["-a", "wfa"]),
    ("nw-linear", ["-a", "nw-linear"]),
    ("banded", ["-a", "banded"]),
    ("wfa-textbook", ["-a", "wfa", "--textbook"]),
    # Mode matrix: compat mirrors the reference's "not implemented"
    # stubs; textbook implements semi-global/local.
    ("nw-local-compat", ["-a", "needleman-wunsch", "-m", "local"]),
    ("nw-local-textbook",
     ["-a", "needleman-wunsch", "-m", "local", "--textbook"]),
    ("nw-semiglobal-textbook",
     ["-a", "needleman-wunsch", "-m", "semi-global", "--textbook"]),
    ("nw-linear-local", ["-a", "nw-linear", "-m", "local"]),
    ("nw-first-only", ["-a", "needleman-wunsch", "--first-only"]),
]


def normalize(text: str) -> str:
    """Replace wall-clock lines (the affine NW prints elapsed ms
    unconditionally, needleman_wunsch_affine.rs:431) with a fixed token."""
    return re.sub(r"^\d+\.\d{3}ms$", "<TIME>ms", text, flags=re.M)


def run_case(args):
    from sequencealigning_tpu.cli import main

    out = io.StringIO()
    err = io.StringIO()
    with contextlib.redirect_stdout(out), contextlib.redirect_stderr(err):
        rc = main(
            ["-q", os.path.join(HERE, "queries.fa"),
             "-d", os.path.join(HERE, "db.fa"), "--no-out"] + args
        )
    return rc, normalize(out.getvalue()), normalize(err.getvalue())


def render(args) -> str:
    rc, out, err = run_case(args)
    return (
        f"# exit={rc}\n# --- stdout ---\n{out}# --- stderr ---\n{err}"
    )


def main_regen():
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    for name, args in CASES:
        path = os.path.join(HERE, f"{name}.out")
        with open(path, "w") as f:
            f.write(render(args))
        print(f"wrote {path}")


if __name__ == "__main__":
    main_regen()
