"""Golden CLI differential test: full runs on the shared FASTA corpus must
byte-match the committed fixtures (timing lines normalized).

The fixtures pin the reference-compat output shapes -- including the quirk
cases the corpus exercises: boundary gap chains (q_gap x d_longer),
co-optimal LIFO print order (q_tie x d_tie), the compat-WFA
non-convergence isolation (q_exact x d_longer), and A* N-wildcard scoring
(q_n).  Regenerate deliberately with `python tests/golden/regen.py` after
an intended output change."""

import os

import pytest

from tests.golden.regen import CASES, render

HERE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.mark.parametrize("name,args", CASES, ids=[c[0] for c in CASES])
def test_golden_cli(name, args):
    with open(os.path.join(HERE, f"{name}.out")) as f:
        expected = f.read()
    got = render(args)
    assert got == expected, (
        f"CLI output drifted from tests/golden/{name}.out -- if intended, "
        "regenerate with `python tests/golden/regen.py`"
    )
