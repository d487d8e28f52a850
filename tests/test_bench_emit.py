"""The bench artifact must be ONE parseable JSON line on stdout.

Round-2 post-mortem: BENCH_r02.json recorded `parsed: null` because a
multi-kilobyte jax exception string inside `extra` plus libtpu C-level
fd-1 chatter made the emitted line unparseable in the driver's tail
window.  bench.py now redirects fd 1 to stderr for the whole process,
writes the JSON line to the saved fd, truncates every string value, and
bounds the total line length.  This test drives that path with hostile
content (`--emit-test`): fake C-level stdout writes, 5 KB strings,
NaN/Inf floats.
"""
import json
import subprocess
import sys

import pytest


@pytest.fixture(scope="module")
def emit_run():
    return subprocess.run(
        [sys.executable, "bench.py", "--emit-test"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo")


def test_stdout_is_one_json_line(emit_run):
    lines = [l for l in emit_run.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout polluted: {lines[:3]}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "evals/s"
    assert isinstance(payload["value"], (int, float))
    assert isinstance(payload["vs_baseline"], (int, float))


def test_chatter_lands_on_stderr(emit_run):
    assert "FAKE LIBTPU LOG LINE ON FD1" in emit_run.stderr
    assert "python-level stdout print" in emit_run.stderr


def test_strings_bounded_and_floats_finite(emit_run):
    line = [l for l in emit_run.stdout.splitlines() if l.strip()][0]
    assert len(line) < 16500
    extra = json.loads(line)["extra"]
    assert len(extra["big_error"]) <= 310
    assert len(extra["nested"]["log"]) <= 310
    # json.loads with default settings would raise on bare NaN/Infinity;
    # a successful parse already proves they were stringified
    assert isinstance(extra["nan_val"], str)
    assert isinstance(extra["inf_val"], str)
    assert extra["wall_s"] == 0.123


def test_sanitize_unit():
    sys.path.insert(0, "/root/repo")
    import bench

    out = bench._sanitize({"a": "z" * 1000, "b": [1.0, float("nan")],
                           "c": {"d": ("x", "y" * 400)}})
    assert out["a"].endswith("...[cut]") and len(out["a"]) <= 310
    assert out["b"][1] == "nan"
    assert out["c"]["d"][1].endswith("...[cut]")
    json.dumps(out, allow_nan=False)
