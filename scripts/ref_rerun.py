"""Run the torch reference's OWN main.py on our regenerated Grocery splits.

Closure method for published-number gaps (same as Chorus/FPMC, RESULTS.md):
when our implementation converges below a published table entry, run the
reference's own code on identical splits -- if it lands at our operating
point, the delta is a split/era artifact, not an implementation gap.

Usage:
  python scripts/ref_rerun.py --model ContraRec --seed 0 \
      --flags "--emb_size 64 --lr 1e-4 ... "

Reference artifacts (pkl cache, checkpoints, logs) go under /tmp/ref_rerun;
the reference tree stays read-only.
"""
from __future__ import annotations

import argparse
import os
import shlex
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
WORK = "/tmp/ref_rerun"

# same numpy-compat wrapper as scripts/cross_parity.py
REF_WRAPPER = """
import numpy as np, os, sys, runpy
for name, val in (("int", int), ("float", float), ("bool", bool), ("object", object)):
    if name not in np.__dict__:
        setattr(np, name, val)
sys.path.insert(0, {ref_src!r})
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path(os.path.join({ref_src!r}, "main.py"), run_name="__main__")
""".format(ref_src=REF_SRC)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--mode", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset", default="Grocery_and_Gourmet_Food")
    ap.add_argument("--flags", default="")
    a = ap.parse_args()

    os.makedirs(WORK, exist_ok=True)
    data_dir = os.path.join(WORK, "data")
    dst = os.path.join(data_dir, a.dataset)
    if not os.path.exists(dst):
        os.makedirs(data_dir, exist_ok=True)
        src = os.path.join(REPO, "data", a.dataset)
        os.makedirs(dst)
        for f in os.listdir(src):
            if f.endswith(".csv"):
                shutil.copy(os.path.join(src, f), dst)

    tag = f"{a.model}{a.mode}_{a.dataset}_{a.seed}"
    log_file = os.path.join(WORK, tag + ".txt")
    model_file = os.path.join(WORK, tag + ".pt")
    wrapper = os.path.join(WORK, "_ref_main.py")
    with open(wrapper, "w") as f:
        f.write(REF_WRAPPER)
    cmd = [sys.executable, wrapper,
           "--model_name", a.model, "--model_mode", a.mode,
           "--random_seed", str(a.seed),
           "--path", data_dir, "--dataset", a.dataset,
           "--log_file", log_file, "--model_path", model_file,
           "--num_workers", "0", "--save_final_results", "0", "--gpu", "",
           ] + shlex.split(a.flags)
    print("RUN:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, cwd=WORK)
    print("rc =", r.returncode)
    if os.path.exists(log_file):
        with open(log_file) as f:
            lines = f.read().splitlines()
        for ln in lines[-8:]:
            print(ln)


if __name__ == "__main__":
    main()
