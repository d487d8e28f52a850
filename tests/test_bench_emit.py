"""The bench artifact must be ONE parseable JSON line on stdout that
fits the driver's ~2000-char tail capture.

Round-2 post-mortem: BENCH_r02.json recorded `parsed: null` because a
multi-kilobyte jax exception string inside `extra` plus libtpu C-level
fd-1 chatter made the emitted line unparseable.  Round-4 post-mortem:
the line parsed as JSON but was LONGER than the driver's tail window
(the old 32768 bound guarded the wrong limit), so the artifact again
recorded `parsed: null`.  bench.py now packs priority scalars into a
1800-byte-bounded line (the five BASELINE-config keys first) and
writes the unbounded payload to BENCH_full_last.json.  This test
drives that path with hostile content (`--emit-test`): fake C-level
stdout writes, 5 KB strings, NaN/Inf floats, and a key flood.
"""
import json
import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


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


def test_line_fits_driver_tail(emit_run):
    """THE operative bound: the driver records only the last ~2000
    chars of stdout; a longer line means the whole round's numbers are
    lost (parsed: null) even at rc 0."""
    line = [l for l in emit_run.stdout.splitlines() if l.strip()][0]
    assert len(line) <= 1800


def test_strings_bounded_and_floats_finite(emit_run):
    line = [l for l in emit_run.stdout.splitlines() if l.strip()][0]
    extra = json.loads(line)["extra"]
    for v in extra.values():
        if isinstance(v, str):
            assert len(v) <= 130
    # json.loads with default settings would raise on bare NaN/Infinity;
    # a successful parse already proves they were stringified
    if "nan_val" in extra:
        assert isinstance(extra["nan_val"], str)
    assert extra["wall_s"] == 0.123


def test_full_payload_file_written(emit_run):
    # --emit-test redirects the full record to /tmp so the hostile
    # fixture can never clobber the committed record of a real run
    with open("/tmp/BENCH_full_emit_test.json") as fh:
        full = json.load(fh)
    assert full["extra"]["wall_s"] == 0.123
    assert "big_error" in full["extra"]


def test_priority_keys_survive_key_flood(capsys, monkeypatch, tmp_path):
    """200 filler keys must not crowd the five-config scalars out of
    the bounded line."""
    monkeypatch.setattr(bench, "_FULL_PATH",
                        str(tmp_path / "BENCH_full.json"))
    extra = {f"filler_{i:03d}_{'x' * 40}": float(i) for i in range(200)}
    pri = {"yt256_wall_s": 0.27, "yt256_cpu_seq_wall_s": 16.26,
           "nci256_wall_s": 3.6, "auto256h_wall_s": 9.9,
           "qtree_wall_s": 20.7, "qtree_exact_half_dev_e": 3.5e-6,
           "wfn_mesh_ultra_wall_s": 24.7, "cps_auto_wall_s": 33.0,
           "cps_nelec_err_e": 1e-7}
    extra.update(pri)
    bench._emit(3.4e9, 256, extra)
    line = [l for l in capsys.readouterr().out.splitlines()
            if l.strip()][-1]
    assert len(line) <= 1800
    got = json.loads(line)["extra"]
    for k, v in pri.items():
        assert got[k] == v, f"priority key {k} crowded out"
    assert got.get("more") == "BENCH_full_last.json"


def test_sanitize_unit():
    out = bench._sanitize({"a": "z" * 1000, "b": [1.0, float("nan")],
                           "c": {"d": ("x", "y" * 400)}})
    assert out["a"].endswith("...[cut]") and len(out["a"]) <= 130
    assert out["b"][1] == "nan"
    assert out["c"]["d"][1].endswith("...[cut]")
    json.dumps(out, allow_nan=False)
