"""Re-record golden-tier metric bands from a multi-seed spread.

VERDICT r4 item 6: the golden execution tier's bands were single-seed and
wiring-break-wide (din_ctr spanned below-chance). This harness runs every
GOLDEN command from tests/test_golden_commands.py with N seeds on the
same substituted corpora and prints, per command, the seed values and a
recommended band [mean - max(3*sigma, 0.015), mean + max(3*sigma, 0.015)]
clamped to [0, 1]. Paste the bands back into GOLDEN (with this script's
date) and flag any band wider than +-0.04 with a written justification.

Usage: python scripts/record_golden_bands.py [--seeds 0,1,2] [--only fm_ctr,...]
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import re
import shlex
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

spec = importlib.util.spec_from_file_location(
    "golden_mod", os.path.join(REPO, "tests", "test_golden_commands.py"))
golden_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(golden_mod)


def build_corpora(root: str) -> dict:
    groc_root = os.path.join(root, "grocery")
    groc = os.path.join(groc_root, "Grocery_and_Gourmet_Food")
    subprocess.run([sys.executable, os.path.join(REPO, "scripts", "subsample_grocery.py"),
                    "--frac", "0.10", "--seed", "42", "--out", groc],
                   check=True, capture_output=True)
    synth_root = os.path.join(root, "synth")
    from rechorus_tpu.data.synthetic import make_ctr_dataset, make_impression_dataset

    make_ctr_dataset(os.path.join(synth_root, "SynthCTRBig"),
                     n_users=400, n_items=120, n_per_user=20, expose_bias=0.6)
    make_ctr_dataset(os.path.join(synth_root, "SynthTOPK"),
                     n_users=400, n_items=120, n_per_user=20, expose_bias=0.6, topk=True)
    make_impression_dataset(os.path.join(synth_root, "SynthImpBig"),
                            n_users=250, n_items=120, n_impressions=10, noise=0.3)
    return {"grocery": (groc_root, "Grocery_and_Gourmet_Food"),
            "ctr": (synth_root, "SynthCTRBig"),
            "topk": (synth_root, "SynthTOPK"),
            "imp": (synth_root, "SynthImpBig"),
            "root": root}


def run_one(tokens, workdir, log_file, model_path, seed: int):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""
    control = ["--epoch", "2", "--early_stop", "2", "--random_seed", str(seed),
               "--num_workers", "0", "--save_final_results", "0"]
    cmd = [sys.executable, "-m", "rechorus_tpu.main"] + tokens + control + [
        "--log_file", log_file, "--model_path", model_path]
    r = subprocess.run(cmd, cwd=workdir, capture_output=True, text=True, timeout=1800, env=env)
    if r.returncode != 0:
        raise RuntimeError((r.stdout + r.stderr)[-2000:])
    with open(log_file) as f:
        text = f.read()
    m = re.search(r"Test After Training: \(([^)]*)\)", text)
    metrics = {}
    for kv in m.group(1).split(","):
        k, v = kv.split(":")
        metrics[k.strip().replace("@All", "")] = float(v)
    return metrics


def main():
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--only", default="")
    a = ap.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]
    only = set(a.only.split(",")) if a.only else None

    root = tempfile.mkdtemp(prefix="golden_bands_")
    corpora = build_corpora(root)
    for name, src, cmd, kind, band in golden_mod.GOLDEN:
        if only and name not in only:
            continue
        tokens = golden_mod._substitute(cmd, kind, corpora)
        key = band[0]
        vals = []
        for s in seeds:
            log = os.path.join(root, f"{name}_s{s}.log")
            mp = os.path.join(root, f"{name}_s{s}.bin")
            try:
                metrics = run_one(tokens, corpora["root"], log, mp, s)
            except Exception as e:
                print(json.dumps({"name": name, "seed": s, "error": str(e)[:500]}),
                      flush=True)
                continue
            vals.append(metrics[key])
            print(json.dumps({"name": name, "seed": s, key: metrics[key]}), flush=True)
        if vals:
            mean, std = float(np.mean(vals)), float(np.std(vals))
            margin = max(3 * std, 0.015)
            lo = max(0.0, round(mean - margin, 3))
            hi = min(1.0, round(mean + margin, 3))
            print(json.dumps({"name": name, "metric": key, "values": vals,
                              "mean": round(mean, 4), "std": round(std, 4),
                              "band": [lo, hi], "width": round(hi - lo, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
