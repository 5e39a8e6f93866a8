"""Multi-lane driver benchmark (VERDICT r2 item 4).

Prints ONE JSON line PER LANE: {"metric", "value", "unit", "vs_baseline"}.
The flagship lane (BPRMF Grocery epoch time vs the reference's published
2.5 s/iter, BASELINE.md §1) prints LAST so single-line consumers keep the
round-1/2 metric. Lanes:

  sasrec      SASRec Grocery s/train-epoch  (ref published 5.5 s/iter)
  kda         KDA Grocery s/train-epoch     (ref published 9.9 s/iter)
  prod        1M-item BPRMF train ex/s: dense Adam vs --lazy_emb_adam
              + --sparse_emb_grad + --bf16_emb (vs_baseline = sparse/dense
              speedup; dense lane's vs_baseline = vs round-2's measured
              432k ex/s)
  serve       100k-item full-catalog top-100 users/s, exact + approx
              (vs round-2 measured 30.6k / 280k)
  testall     Grocery --test_all dev eval seconds (catalog protocol;
              vs round-2 measured 0.1 s)
  bprmf       BPRMF Grocery s/train-epoch   (ref published 2.5 s/iter)

Each lane runs in its own subprocess so TPU memory and compile state
never leak across lanes and one lane's failure doesn't kill the rest.
Reference baselines: docs/demo_scripts_results/README.md:44-65 (torch
1.12, unspecified GPU at "~90% utilization").
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

GROCERY_LANES = {
    # lane -> (model_name, flags, reference s/iter)
    "bprmf": ("BPRMF", ["--emb_size", "64", "--lr", "1e-3", "--l2", "1e-6"], 2.5),
    "sasrec": ("SASRec", ["--emb_size", "64", "--num_layers", "1", "--num_heads", "1",
                          "--lr", "1e-4", "--l2", "1e-6", "--history_max", "20"], 5.5),
    "kda": ("KDA", ["--emb_size", "64", "--include_attr", "1", "--freq_rand", "0",
                    "--lr", "1e-3", "--l2", "1e-6", "--num_heads", "4",
                    "--history_max", "20"], 9.9),
}

R02_BASELINES = {  # round-2 hand-measured numbers (RESULTS.md) for progress ratios
    "prod_dense_ex_s": 432_000.0,
    "serve_exact_users_s": 30_600.0,
    "serve_approx_users_s": 280_000.0,
    "testall_s": 0.1,
}


def _ensure_grocery():
    data = os.path.join(ROOT, "data", "Grocery_and_Gourmet_Food")
    if not os.path.exists(os.path.join(data, "dev.csv")):
        subprocess.run([sys.executable, os.path.join(ROOT, "scripts", "prepare_grocery.py")],
                       check=True)


def _build_args(model_name: str, flags: list):
    """Compose the full CLI parser for a model (same layering as main.py)
    so every lane runs with product defaults."""
    from rechorus_tpu import registry
    from rechorus_tpu.main import parse_global_args

    model_cls = registry.get_model(model_name)
    reader_cls = registry.get_reader(model_cls.reader)
    runner_cls = registry.get_runner(model_cls.runner)
    parser = argparse.ArgumentParser(add_help=False)
    parser = parse_global_args(parser)
    parser = reader_cls.parse_data_args(parser)
    parser = runner_cls.parse_runner_args(parser)
    parser = model_cls.parse_model_args(parser)
    args, _ = parser.parse_known_args(
        ["--path", os.path.join(ROOT, "data"), "--dataset", "Grocery_and_Gourmet_Food"]
        + flags)
    return args, model_cls, reader_cls, runner_cls


def lane_grocery_epoch(lane: str):
    import jax
    import numpy as np

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.main import build_corpus, enable_compilation_cache

    model_name, flags, ref_s = GROCERY_LANES[lane]
    args, model_cls, reader_cls, runner_cls = _build_args(model_name, flags)
    enable_compilation_cache(args)
    corpus = build_corpus(args, reader_cls)
    runner = runner_cls(args)
    model = model_cls.from_args(args, corpus)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = runner.place_arrays(batcher.device_arrays())
    state = runner.init_state(model, batcher, 0)
    rng = jax.random.key(0)

    state, _ = runner.fit(state, model, batcher, arrays, 0, rng)  # compile
    jax.block_until_ready(state.params)
    n_epochs = 5 if lane == "bprmf" else 3
    t0 = time.perf_counter()
    acc = 0.0
    for e in range(1, n_epochs + 1):
        state, loss = runner.fit(state, model, batcher, arrays, e, rng)
        acc += float(np.asarray(loss))  # dependent scalar: defeats async under-report
    dt = (time.perf_counter() - t0) / n_epochs
    return [{
        "metric": f"{model_name} Grocery s/train-epoch (batch 256, 92.5k ex)",
        "value": round(dt, 4), "unit": "s",
        "vs_baseline": round(ref_s / dt, 2),
    }]


def _run_prod(extra: list) -> list:
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "prod_bench.py")] + extra,
        capture_output=True, text=True, timeout=1800)
    out = []
    for ln in r.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                out.append(json.loads(ln))
            except json.JSONDecodeError:
                pass
    if not out:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-2000:] + "\n")
    return out

def lane_prod():
    """1M-item table training: dense Adam vs the sparse-grad fast lane."""
    base = ["--users", "200000", "--items", "1000000", "--interactions", "2000000"]
    rows = []
    dense = _run_prod(base + ["--lazy_adam", "0"])
    dense_ex = next((d["train_examples_per_s"] for d in dense if "train_examples_per_s" in d), None)
    if dense_ex:
        rows.append({"metric": "BPRMF 1M-item train ex/s (dense Adam, B=4096)",
                     "value": dense_ex, "unit": "examples/s",
                     "vs_baseline": round(dense_ex / R02_BASELINES["prod_dense_ex_s"], 2)})
    sparse = _run_prod(base + ["--lazy_adam", "1", "--sparse_grad", "1", "--bf16", "1"])
    sparse_ex = next((d["train_examples_per_s"] for d in sparse if "train_examples_per_s" in d), None)
    if sparse_ex and dense_ex:
        rows.append({"metric": "BPRMF 1M-item train ex/s (lazy+sparse+bf16 lane)",
                     "value": sparse_ex, "unit": "examples/s",
                     "vs_baseline": round(sparse_ex / dense_ex, 2)})
    return rows


def lane_serve():
    out = _run_prod(["--users", "200000", "--items", "100000",
                     "--interactions", "500000"])
    rows = []
    key_map = [
        ("serving_users_per_s_full_catalog_top100_dense_exact",
         "full-catalog top-100 serve users/s (100k items, exact)",
         R02_BASELINES["serve_exact_users_s"]),
        ("serving_users_per_s_full_catalog_top100_dense_approx",
         "full-catalog top-100 serve users/s (100k items, approx .98)",
         R02_BASELINES["serve_approx_users_s"]),
    ]
    for key, label, base in key_map:
        v = next((d[key] for d in out if key in d), None)
        if v:
            rows.append({"metric": label, "value": v, "unit": "users/s",
                         "vs_baseline": round(v / base, 2)})
    return rows


def lane_testall():
    import jax
    import numpy as np

    from rechorus_tpu.data.batching import get_batcher
    from rechorus_tpu.main import build_corpus, enable_compilation_cache

    args, model_cls, reader_cls, runner_cls = _build_args(
        "BPRMF", ["--emb_size", "64", "--test_all", "1"])
    enable_compilation_cache(args)
    corpus = build_corpus(args, reader_cls)
    runner = runner_cls(args)
    model = model_cls.from_args(args, corpus)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "dev", args)
    arrays = runner.place_arrays(batcher.device_arrays())
    tb = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    state = runner.init_state(model, tb, 0)
    runner.evaluate(state, model, batcher, arrays, "dev", [5], ["NDCG", "HR"])  # compile
    t0 = time.perf_counter()
    res = runner.evaluate(state, model, batcher, arrays, "dev", [5], ["NDCG", "HR"])
    dt = time.perf_counter() - t0
    assert np.isfinite(res["NDCG@5"])
    return [{"metric": "Grocery test_all dev eval s (full 8.7k catalog, 14.7k users)",
             "value": round(dt, 4), "unit": "s",
             "vs_baseline": round(R02_BASELINES["testall_s"] / dt, 2)}]


LANES = {
    "sasrec": lambda: lane_grocery_epoch("sasrec"),
    "kda": lambda: lane_grocery_epoch("kda"),
    "prod": lane_prod,
    "serve": lane_serve,
    "testall": lane_testall,
    "bprmf": lambda: lane_grocery_epoch("bprmf"),  # flagship: keep LAST
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", default="", help="(internal) run one lane in-process")
    ap.add_argument("--lanes", default=",".join(LANES),
                    help="comma list; default all, flagship bprmf last")
    a = ap.parse_args()

    if a.lane:
        for row in LANES[a.lane]():
            print(json.dumps(row), flush=True)
        return

    _ensure_grocery()
    for lane in a.lanes.split(","):
        r = subprocess.run([sys.executable, os.path.abspath(__file__), "--lane", lane],
                           capture_output=True, text=True, timeout=2400)
        emitted = False
        for ln in r.stdout.splitlines():
            ln = ln.strip()
            if ln.startswith("{") and '"metric"' in ln:
                print(ln, flush=True)
                emitted = True
        if not emitted:
            sys.stderr.write(f"[bench] lane {lane} produced no rows (rc={r.returncode})\n")
            sys.stderr.write(r.stderr[-2000:] + "\n")


if __name__ == "__main__":
    main()
