"""HLO collective inventory per mesh size (VERDICT r4 item 7).

CPU wall-clock on a virtual mesh is NOT chip evidence; what IS
chip-independent design evidence is WHICH collectives GSPMD inserts into
the compiled epoch/eval programs and how their payloads scale with the
mesh. This harness runs scripts/scaling_bench.py one mesh size per
subprocess with `--xla_dump_to`, then scans the optimized HLO modules
for collective ops and prints one JSON line per size:

  {"n_devices": N, "module": ..., "collectives": {"all-reduce": [shapes],
   "all-gather": [...], "reduce-scatter": [...], "collective-permute":
   [...], "all-to-all": [...]}}

Usage:
  JAX_PLATFORMS=cpu python scripts/collective_inventory.py --sizes 1,4,8
"""
from __future__ import annotations

import argparse
import collections
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
               "collective-permute", "all-to-all")


def scan_dump(dump_dir: str):
    """Aggregate collective ops over the LARGEST optimized modules (the
    epoch program dominates; tiny init programs are noise)."""
    txts = [os.path.join(dump_dir, f) for f in os.listdir(dump_dir)
            if f.endswith(".txt") and "after_optimizations" in f]
    if not txts:
        return None, {}
    main = max(txts, key=os.path.getsize)
    ops = collections.defaultdict(list)
    pat = re.compile(r"%(all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)(?:-start)?[\w.]*\s*=\s*(.*)")
    with open(main) as f:
        for line in f:
            m = pat.search(line)
            if m and "-done" not in line.split("=")[0]:
                op, rhs = m.group(1), m.group(2)
                # shape(s) = RHS up to the op token; strip layout braces
                shape = rhs.split(m.group(1))[0].strip()
                shape = re.sub(r"\{[^}]*\}", "", shape)
                ops[op].append(shape)
    agg = {op: dict(collections.Counter(shapes)) for op, shapes in ops.items()}
    return os.path.basename(main), agg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--model", default="SASRec")
    a = ap.parse_args()
    for n in [int(x) for x in a.sizes.split(",")]:
        dump = tempfile.mkdtemp(prefix=f"hlo_{n}_")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_dump_to={dump}"
                            + " --xla_dump_hlo_pass_re=.*after_optimizations.*").strip()
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
             "--sizes", str(n), "--model", a.model],
            capture_output=True, text=True, env=env, timeout=3600)
        rate = None
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                try:
                    rate = json.loads(ln)
                except json.JSONDecodeError:
                    pass
        module, agg = scan_dump(dump)
        print(json.dumps({"n_devices": n, "rate": rate, "module": module,
                          "collectives": agg}), flush=True)
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-1500:] + "\n")


if __name__ == "__main__":
    main()
