"""Multi-host path: 2 CPU processes x 4 devices = one 4x2 global mesh,
full runner train epoch + eval through the product path (VERDICT item 7).

Each subprocess runs _dist_worker.py: jax.distributed.initialize, then
the same corpus/seed -> identical batch-index matrices served shard-wise
via parallel.mesh.global_put. Both processes must converge to the SAME
loss and dev metric (GSPMD inserts the cross-host collectives)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_dist_worker.py")


def test_two_process_train_eval(tmp_path):
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    lines = [next(ln for ln in o.splitlines() if ln.startswith("DIST_OK")) for o in outs]
    assert lines[0] == lines[1], (lines, outs[0][-500:])


def test_two_process_host_sharded_input(tmp_path):
    """--host_shard_input across 2 real processes: results match between
    hosts AND each host materialized only ~half the train history rows
    (its own addressable 'data' blocks + the 2-row init prefix)."""
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(i), str(tmp_path), "1", "29531"],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=REPO)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]
    ok = [next(ln for ln in o.splitlines() if ln.startswith("DIST_OK")) for o in outs]
    assert ok[0] == ok[1], (ok, outs[0][-500:])
    for o in outs:
        built = next(ln for ln in o.splitlines() if ln.startswith("LAZY_BUILT"))
        fields = dict(kv.split("=") for kv in built.split()[1:])
        n, covered = int(fields["train_rows"]), int(fields["covered"])
        # 2 hosts x (2 of 4 blocks): about half the rows, never all
        assert covered <= (n + 4) // 2 + 4, built
        assert covered > 0, built
