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


def test_rust_differential_harness_contract():
    """tools/rust_differential/diff.py must exit 2 with a clear message
    when no cargo toolchain exists (this rig), and its case table must
    only name surfaces the reference binary has."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "rust_differential", "diff.py")
    env = dict(os.environ, PATH="/usr/bin:/bin")  # cargo absent either way
    if __import__("shutil").which("cargo", path=env["PATH"]):
        import pytest

        pytest.skip("cargo present; the real differential applies")
    p = subprocess.run(
        [sys.executable, script], capture_output=True, text=True, env=env,
    )
    assert p.returncode == 2, (p.returncode, p.stdout, p.stderr)
    assert "no cargo toolchain" in p.stdout
