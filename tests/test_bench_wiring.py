"""bench.py wiring guards: the driver artifact depends on this file's
lane/group tables being coherent -- a typo would silently zero a round's
BENCH_r{N}.json."""
import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_groups_cover_all_lanes_exactly_once():
    b = _load_bench()
    group_lanes = [lane for _, lanes, _ in b.GROUPS for lane in lanes]
    assert sorted(group_lanes) == sorted(b.LANES), \
        (group_lanes, list(b.LANES))
    assert len(group_lanes) == len(set(group_lanes))
    # flagship first: the driver's "parsed" field is the bprmf row
    assert b.GROUPS[0][1][0] == "bprmf"
    for _, _, cap in b.GROUPS:
        assert 60 <= cap <= 600


def test_skip_row_schema():
    b = _load_bench()
    row = b._skip_row("x", "why")
    assert set(row) >= {"metric", "value", "unit", "vs_baseline"}
    json.dumps(row)


def test_child_mode_unknown_lane_is_loud_not_silent():
    """`bench.py --lane <typo>` must fail visibly (the parent counts
    missing '#lane-done' markers as skips either way, but a typo in
    GROUPS should never look like a healthy empty lane)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--lane", "nope"],
        capture_output=True, text=True, timeout=120,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert "#lane-done nope" not in r.stdout
    assert "nope" in (r.stdout + r.stderr) or r.returncode != 0
