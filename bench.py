"""Multi-lane driver benchmark (VERDICT r2 item 4; rebudgeted r4 item 1).

Prints ONE JSON line PER LANE: {"metric", "value", "unit", "vs_baseline"}
plus, for the sub-second Grocery lanes, "spread": [min, max] over 5
individually-timed epochs with "value" = the median (VERDICT r4 item 3:
single-shot numbers cannot be compared across rounds through the
tunnel's ~2x ambient variance).
Lane order is VALUE-FIRST — the flagship BPRMF lane runs first so it is
captured even if the driver window closes early — and the flagship row is
RE-EMITTED as the final line so single-line consumers (the driver's
"parsed" field) keep the round-1/2 metric. Lanes:

  bprmf       BPRMF Grocery s/train-epoch   (ref published 2.5 s/iter)
  prod        1M-item BPRMF train ex/s: dense Adam vs the packed
              --lazy_emb_adam + --sparse_emb_grad + --bf16_emb lane
              (one prod_bench --compare subprocess; sparse row's
              vs_baseline = sparse/dense speedup)
  serve       100k-item full-catalog top-100 users/s, exact + approx
              (vs round-2 measured 30.6k / 280k)
  sasrec      SASRec Grocery s/train-epoch  (ref published 5.5 s/iter)
  kda         KDA Grocery s/train-epoch     (ref published 9.9 s/iter)
  testall     Grocery --test_all dev eval seconds (catalog protocol;
              vs round-2 measured 0.1 s)
  serve1m     1M-item full-catalog top-100 users/s, tiled exact +
              bucket-approx (vs r4 measured 19.9k / 24.2k)

Budget guard (VERDICT r3 item 1): the whole bench must finish inside the
driver's window. A global wall-clock budget (BENCH_BUDGET_S env, default
620 s) is enforced; each lane runs in its own subprocess under
min(lane_cap, remaining_budget) — the axon tunnel intermittently stalls
device RPCs for minutes (r4 opening: identical lane 27 s..7 min+), so a
stalled lane is killed and reported as an explicit "skipped" JSON row
instead of silently eating the window. Healthy total ~4 min.

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
    # --scan_unroll 4 measured -14% on this lane (r4 A/B: 106 -> 91 ms;
    # SASRec was flat, so only the flagship carries it)
    "bprmf": ("BPRMF", ["--emb_size", "64", "--lr", "1e-3", "--l2", "1e-6",
                        "--scan_unroll", "4"], 2.5),
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
    """Median-of-N epoch timing (VERDICT r4 item 3): the tunnel's ~2x
    ambient spread makes single-shot lanes incomparable across rounds;
    each epoch is timed individually (materializing the dependent loss
    scalar = the sync point) and the row reports the median plus the
    [min, max] spread."""
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
    times = []
    for e in range(1, 6):  # 5 timed epochs = 5 independent reps
        t0 = time.perf_counter()
        state, loss = runner.fit(state, model, batcher, arrays, e, rng)
        float(np.asarray(loss))  # dependent scalar: defeats async under-report
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return [{
        "metric": f"{model_name} Grocery s/train-epoch (batch 256, 92.5k ex)",
        "value": round(dt, 4), "unit": "s",
        "vs_baseline": round(ref_s / dt, 2),
        "spread": [round(min(times), 4), round(max(times), 4)],
    }]


def _run_prod(extra: list, timeout: float) -> list:
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "prod_bench.py")] + extra,
        capture_output=True, text=True, timeout=timeout)
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


def lane_prod(timeout: float = 240):
    """1M-item table training: dense Adam vs the packed sparse fast lane,
    both inside ONE prod_bench process (--compare) so the TPU client and
    id-array setup are paid once. 1M interactions / 2 timing epochs keeps
    the lane inside its cap; ex/s is scale-invariant at these sizes
    (round-3 measured the same rates at 2M interactions / 3 epochs)."""
    out = _run_prod(["--users", "200000", "--items", "1000000",
                     "--interactions", "1000000", "--epochs", "2",
                     "--compare", "1", "--serve", ""], timeout)
    rows = []
    dense_ex = next((d["train_examples_per_s"] for d in out
                     if d.get("lane") == "dense"), None)
    if dense_ex:
        rows.append({"metric": "BPRMF 1M-item train ex/s (dense Adam, B=4096)",
                     "value": dense_ex, "unit": "examples/s",
                     "vs_baseline": round(dense_ex / R02_BASELINES["prod_dense_ex_s"], 2)})
    sparse_ex = next((d["train_examples_per_s"] for d in out
                      if d.get("lane") == "packed"), None)
    if sparse_ex and dense_ex:
        rows.append({"metric": "BPRMF 1M-item train ex/s (packed lazy+sparse+bf16 lane)",
                     "value": sparse_ex, "unit": "examples/s",
                     "vs_baseline": round(sparse_ex / dense_ex, 2)})
    return rows


def lane_serve(timeout: float = 150):
    # tiled_exact is the PRODUCT exact path (runners predict_topk routes
    # catalogs >= MIN_ROWS_FOR_TILED through tiled_catalog_topk's fused
    # pallas stage 1); dense_approx stays the approx headline.
    # vs_baseline for exact = speedup over the r2 dense-exact 30.6k u/s.
    out = _run_prod(["--users", "200000", "--items", "100000",
                     "--interactions", "16384", "--train", "0",
                     "--serve", "tiled_exact,dense_approx"], timeout)
    rows = []
    key_map = [
        ("serving_users_per_s_full_catalog_top100_tiled_exact",
         "full-catalog top-100 serve users/s (100k items, exact, product tiled path)",
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


def lane_serve1m(timeout: float = 220):
    """1M-item full-catalog top-100 serving, both product tiled lanes
    (r5 target: VERDICT r4 item 2). vs_baseline = speedup over the r4
    same-session measurements (tiled exact 19.9k / tiled approx 24.2k
    u/s, docs/PERF.md r4)."""
    out = _run_prod(["--users", "200000", "--items", "1000000",
                     "--interactions", "16384", "--train", "0",
                     "--serve", "tiled_exact,tiled_approx"], timeout)
    rows = []
    for key, label, base in [
        ("serving_users_per_s_full_catalog_top100_tiled_exact",
         "full-catalog top-100 serve users/s (1M items, exact tiled+grouped)",
         19_900.0),
        ("serving_users_per_s_full_catalog_top100_tiled_approx",
         "full-catalog top-100 serve users/s (1M items, bucket-approx .98)",
         24_200.0),
    ]:
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
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = runner.evaluate(state, model, batcher, arrays, "dev", [5], ["NDCG", "HR"])
        times.append(time.perf_counter() - t0)
    assert np.isfinite(res["NDCG@5"])
    dt = float(np.median(times))
    return [{"metric": "Grocery test_all dev eval s (full 8.7k catalog, 14.7k users)",
             "value": round(dt, 4), "unit": "s",
             "vs_baseline": round(R02_BASELINES["testall_s"] / dt, 2),
             "spread": [round(min(times), 4), round(max(times), 4)]}]


LANES = {  # value-first order; flagship bprmf FIRST (re-emitted last)
    "bprmf": lambda: lane_grocery_epoch("bprmf"),
    "prod": lane_prod,
    "serve": lane_serve,
    "sasrec": lambda: lane_grocery_epoch("sasrec"),
    "kda": lambda: lane_grocery_epoch("kda"),
    "testall": lane_testall,
    "serve1m": lane_serve1m,
}

# lanes grouped into ONE child process each so the TPU client init and
# the tunnel's per-process program-load latency are paid per GROUP, not
# per lane; rows stream to the parent as they finish, so a stall in lane
# k still delivers lanes 1..k-1 (the r3 failure lost everything after
# the stall point)
GROUPS = [
    # the flagship runs ALONE first: its row is the driver's "parsed"
    # metric and must survive even a sick tunnel window (r5: a 4-lane
    # research group starved at cap 300 in one such window)
    ("flagship", ["bprmf"], 180),
    ("research", ["sasrec", "kda", "testall"], 280),
    ("prod", ["prod", "serve1m", "serve"], 430),
]


def _skip_row(lane: str, why: str):
    return {"metric": f"lane {lane} skipped ({why})", "value": 0.0,
            "unit": "skipped", "vs_baseline": 0.0}


def _run_lanes_inproc(lanes):
    """(child mode) run lanes sequentially, streaming one JSON row per
    metric and a '#lane-done <name>' marker the parent uses for skip
    accounting."""
    for lane in lanes:
        nrows = 0
        try:
            for row in LANES[lane]():
                print(json.dumps(row), flush=True)
                nrows += 1
        except Exception as e:  # keep later lanes alive
            sys.stderr.write(f"[bench] lane {lane} failed: {e!r}\n")
        if nrows:
            print(f"#lane-done {lane}", flush=True)
        # a lane that finished with zero rows is left un-acked so the
        # parent emits its explicit skip row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lane", default="",
                    help="(internal) comma list of lanes to run in-process")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 620)),
                    help="global wall-clock budget in seconds; lanes that "
                         "don't fit are skipped with an explicit JSON row")
    a = ap.parse_args()

    if a.lane:
        _run_lanes_inproc(a.lane.split(","))
        return

    _ensure_grocery()
    import selectors

    # tunnel warmup OUTSIDE the budget (t0 starts AFTER it): the FIRST
    # TPU process after
    # an idle period pays a large one-time tunnel (re)connect + device
    # init cost -- r5 observed it starving whichever group ran first
    # while every later group ran normally. One tiny device op in a
    # throwaway subprocess absorbs it (cheap if the tunnel is already
    # warm). Never run in-parent: the parent must not hold the TPU
    # client while children do.
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "print(float((jnp.ones((64,64)) @ jnp.ones((64,64))).sum()))"],
            capture_output=True, timeout=min(150.0, a.budget / 4))
    except subprocess.TimeoutExpired:
        pass  # sick tunnel; lanes will report their own skips
    t0 = time.monotonic()
    flagship_row = None
    # groups run SEQUENTIALLY: only ONE process may hold the TPU tunnel at
    # a time (a second heavy client, or killing one mid-device-call, can
    # wedge the tunnel server for everyone for 10-20 min). The deadline
    # kill below is the last resort the budget guard needs; warm
    # compilation caches keep healthy runs far away from it.
    for group, lanes, cap in GROUPS:
        remaining = a.budget - (time.monotonic() - t0)
        if remaining < 30:
            for lane in lanes:
                print(json.dumps(_skip_row(lane, "budget exhausted")), flush=True)
            continue
        deadline = time.monotonic() + min(cap, remaining)
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--lane", ",".join(lanes)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
        done_lanes, buf = set(), ""
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        while True:
            if time.monotonic() > deadline:
                proc.kill()
                break
            if not sel.select(timeout=1.0):
                continue
            chunk = os.read(proc.stdout.fileno(), 65536).decode(errors="replace")
            if not chunk:  # EOF: child exited
                break
            buf += chunk
            while "\n" in buf:
                ln, buf = buf.split("\n", 1)
                ln = ln.strip()
                if ln.startswith("#lane-done "):
                    done_lanes.add(ln.split(" ", 1)[1])
                elif ln.startswith("{") and '"metric"' in ln:
                    print(ln, flush=True)
                    if '"BPRMF Grocery' in ln and flagship_row is None:
                        flagship_row = ln
        sel.close()
        proc.wait()
        for lane in lanes:
            if lane not in done_lanes:
                print(json.dumps(_skip_row(
                    lane, f"group {group} timeout or no rows")), flush=True)
    if flagship_row is not None:
        # final line repeats the flagship so single-line consumers (the
        # driver's "parsed" last-JSON field) keep the round-1/2 metric
        print(flagship_row, flush=True)


if __name__ == "__main__":
    main()
