"""Cross-framework metric-parity harness (VERDICT round-1 item 4).

Runs the torch reference (/root/reference/src/main.py, CPU) and this
framework on the SAME mid-SNR synthetic CSVs -- hard enough that metrics
land well away from ceiling, so a subtly wrong loss / attention mask /
feature join shows up as a metric gap -- and compares the
"Test After Training" metrics across seeds.

Usage:
  python scripts/cross_parity.py [--families ctr,impression] [--seeds 0,1]
  python scripts/cross_parity.py --out PARITY.md

Reference artifacts (logs, pkl caches, checkpoints) all live under /tmp:
the reference defaults would write into /root/reference/{log,model}
otherwise. Each framework gets its own copy of the CSV dir because both
cache `<Reader>.pkl` under the data dir with incompatible pickles.
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
WORK = "/tmp/parity_data"

# wrapper so the (numpy<1.24-era) reference runs under this numpy; cwd is
# free (rerank runs need ./model/... to resolve under /tmp, never inside
# the read-only reference tree)
REF_WRAPPER = """
import numpy as np, os, sys, runpy
for name, val in (("int", int), ("float", float), ("bool", bool), ("object", object)):
    if name not in np.__dict__:
        setattr(np, name, val)
sys.path.insert(0, {ref_src!r})
sys.argv = ["main.py"] + sys.argv[1:]
runpy.run_path(os.path.join({ref_src!r}, "main.py"), run_name="__main__")
""".format(ref_src=REF_SRC)

CONFIGS = {
    "ctr": [
        ("FM", "CTR", ["--emb_size", "32", "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                       "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
        ("DIN", "CTR", ["--emb_size", "32", "--att_layers", "[32]", "--dnn_layers", "[32]",
                        "--history_max", "10", "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                        "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
        ("DIEN", "CTR", ["--emb_size", "32", "--evolving_gru_type", "AUGRU",
                         "--fcn_hidden_layers", "[32]", "--aux_hidden_layers", "[32]",
                         "--alpha_aux", "0.1", "--history_max", "10",
                         "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                         "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
    ],
    "impression": [
        ("BPRMF", "Impression", ["--emb_size", "32", "--lr", "1e-3", "--l2", "1e-6",
                                 "--loss_n", "BPR", "--metric", "NDCG,HR",
                                 "--topk", "1,3,5", "--main_metric", "NDCG@3"], "SynthImpBig"),
        ("SASRec", "Impression", ["--emb_size", "32", "--num_layers", "1", "--num_heads", "2",
                                  "--history_max", "10", "--lr", "1e-3", "--l2", "1e-6",
                                  "--loss_n", "BPR", "--metric", "NDCG,HR",
                                  "--topk", "1,3,5", "--main_metric", "NDCG@3"], "SynthImpBig"),
    ],
    # ImpressionSeq: dual pos/neg per-user histories (GRU4RecImpression)
    "impression_seq": [
        ("GRU4Rec", "Impression", ["--emb_size", "32", "--hidden_size", "32",
                                   "--history_max", "10", "--lr", "1e-3", "--l2", "1e-6",
                                   "--loss_n", "BPR", "--metric", "NDCG,HR",
                                   "--topk", "1,3,5", "--main_metric", "NDCG@3"], "SynthImpBig"),
    ],
    # context models under the ranking protocol (TopK mode classes).
    # SynthTOPK = the ML_1MTOPK contract: positive rows + dev/test
    # neg_items columns (the reference's GeneralModel.Dataset requires
    # them when test_all=0, BaseModel.py:192-203)
    "context_topk": [
        ("FM", "TopK", ["--emb_size", "32", "--lr", "5e-3", "--l2", "1e-6",
                        "--num_neg", "1", "--metric", "NDCG,HR",
                        "--topk", "1,3,5", "--main_metric", "NDCG@3"], "SynthTOPK"),
        ("DCNv2", "TopK", ["--emb_size", "32", "--layers", "[32]", "--cross_layer_num", "2",
                           "--mixed", "1", "--structure", "parallel", "--low_rank", "16",
                           "--expert_num", "2", "--lr", "5e-3", "--l2", "1e-6",
                           "--num_neg", "1", "--metric", "NDCG,HR",
                           "--topk", "1,3,5", "--main_metric", "NDCG@3"], "SynthTOPK"),
    ],
    # long-history retrieval CTR models. NB documented deviations
    # (models/context_seq/eta.py:9-15, sdim long-window mask): training
    # trajectories share the same objective but not bit-identical
    # attention windows; agreement is band-level, any gap must be
    # explained by those deviations.
    "ctr_long": [
        ("ETA", "CTR", ["--emb_size", "32", "--dnn_hidden_units", "[32]",
                        "--attention_dim", "16", "--num_heads", "2",
                        "--retrieval_k", "3", "--recent_k", "3", "--num_hashes", "2",
                        "--hash_bits", "8", "--history_max", "10",
                        "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                        "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
        ("SDIM", "CTR", ["--emb_size", "32", "--dnn_hidden_units", "[32]",
                         "--attention_dim", "16", "--num_heads", "2",
                         "--num_hashes", "2", "--hash_bits", "4", "--recent_k", "3",
                         "--history_max", "10",
                         "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                         "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
        ("CAN", "CTR", ["--emb_size", "32", "--induce_vec_size", "96", "--orders", "1",
                        "--co_action_layers", "[4,4]", "--evolving_gru_type", "AUGRU",
                        "--fcn_hidden_layers", "[32]", "--aux_hidden_layers", "[32]",
                        "--alpha_aux", "0.1", "--history_max", "10",
                        "--lr", "5e-3", "--l2", "1e-6", "--loss_n", "BCE",
                        "--metric", "AUC,LOG_LOSS"], "SynthCTRBig"),
    ],
}

COMMON = ["--epoch", "30", "--early_stop", "5", "--num_workers", "0",
          "--include_item_features", "1", "--include_user_features", "1",
          "--include_situation_features", "1", "--save_final_results", "0",
          "--gpu", ""]

TEST_RE = re.compile(r"Test After Training: \(([^)]*)\)")


def gen_data():
    sys.path.insert(0, REPO)
    from rechorus_tpu.data.synthetic import make_ctr_dataset, make_impression_dataset

    os.makedirs(WORK, exist_ok=True)
    shared = os.path.join(WORK, "shared")
    if not os.path.exists(os.path.join(shared, "SynthCTRBig")):
        make_ctr_dataset(os.path.join(shared, "SynthCTRBig"),
                         n_users=400, n_items=120, n_per_user=20, expose_bias=0.6)
    if not os.path.exists(os.path.join(shared, "SynthTOPK")):
        make_ctr_dataset(os.path.join(shared, "SynthTOPK"),
                         n_users=400, n_items=120, n_per_user=20, expose_bias=0.6,
                         topk=True)
    if not os.path.exists(os.path.join(shared, "SynthImpBig")):
        make_impression_dataset(os.path.join(shared, "SynthImpBig"),
                                n_users=250, n_items=120, n_impressions=10,
                                noise=0.3)
    for side in ("ref", "tpu"):
        for ds in ("SynthCTRBig", "SynthTOPK", "SynthImpBig"):
            dst = os.path.join(WORK, side, ds)
            if not os.path.exists(dst):
                shutil.copytree(os.path.join(shared, ds), dst)


def parse_metrics(text: str) -> dict:
    m = None
    for m in TEST_RE.finditer(text):
        pass
    if m is None:
        return {}
    out = {}
    for kv in m.group(1).split(","):
        k, v = kv.split(":")
        # reference CTRRunner keys metrics "AUC@All"; ours uses "AUC"
        out[k.strip().replace("@All", "")] = float(v)
    return out


def run_one(side: str, name: str, mode: str, extra: list, dataset: str, seed: int,
            model_path: str = None, cwd: str = None) -> dict:
    data_path = os.path.join(WORK, side)
    logdir = os.path.join(WORK, "logs", side)
    os.makedirs(logdir, exist_ok=True)
    tag = f"{name}{mode}_{dataset}_{seed}"
    log_file = os.path.join(logdir, tag + ".txt")
    args = ["--model_name", name, "--model_mode", mode, "--random_seed", str(seed),
            "--path", data_path, "--dataset", dataset,
            "--log_file", log_file,
            "--model_path", model_path or os.path.join(logdir, tag + ".bin"),
            ] + extra + COMMON
    if side == "ref":
        wrapper = os.path.join(WORK, "_ref_main.py")
        with open(wrapper, "w") as f:
            f.write(REF_WRAPPER)
        cmd = [sys.executable, wrapper] + args
        cwd = cwd or REF_SRC
    else:
        cmd = [sys.executable, "-m", "rechorus_tpu.main"] + args
        cwd = cwd or REPO
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if side != "ref":
        # metric parity is about algorithm semantics; CPU keeps the run
        # fast (tiny data) and off the exclusive TPU tunnel
        env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True, timeout=2400, env=env)
    text = ""
    if os.path.exists(log_file):
        with open(log_file) as f:
            text = f.read()
    metrics = parse_metrics(text) or parse_metrics(r.stdout + r.stderr)
    if not metrics:
        print(f"  !! {side} {tag} produced no metrics (rc={r.returncode})")
        tail = (r.stdout + r.stderr).strip().splitlines()[-12:]
        print("     " + "\n     ".join(tail))
    return metrics


RERANKERS = [
    ("PRM", "General", ["--emb_size", "32", "--n_blocks", "2", "--num_heads", "2",
                        "--num_hidden_unit", "32",
                        "--lr", "1e-3", "--l2", "1e-6"]),
    ("SetRank", "General", ["--emb_size", "32", "--n_blocks", "2", "--num_heads", "2",
                            "--num_hidden_unit", "32", "--setrank_type", "IMSAB",
                            "--lr", "1e-3", "--l2", "1e-6"]),
    ("MIR", "General", ["--emb_size", "32", "--num_heads", "2", "--num_hidden_unit", "32",
                        "--history_max", "10", "--lr", "1e-3", "--l2", "1e-6"]),
]
IMP_METRICS = ["--loss_n", "BPR", "--metric", "NDCG,HR", "--topk", "1,3,5",
               "--main_metric", "NDCG@3"]


def run_rerank_family(seeds):
    """Two-stage parity: train the reference/our BPRMF-Impression backbone,
    expose it as a frozen ranker (yaml + checkpoint under <side>work/model/
    BPRMFImpression/, the reference resolves ./model/... from cwd), then
    run each reranker over it."""
    rows = []
    for side in ("ref", "tpu"):
        work = os.path.join(WORK, side + "work")
        rdir = os.path.join(work, "model", "BPRMFImpression")
        os.makedirs(rdir, exist_ok=True)
        results = {}
        for seed in seeds:
            ext = ".pt" if side == "ref" else ".bin"
            ranker_file = f"ranker_{seed}{ext}"
            print(f"[{side}] backbone BPRMFImpression seed={seed} ...", flush=True)
            m = run_one(side, "BPRMF", "Impression",
                        ["--emb_size", "32"] + IMP_METRICS, "SynthImpBig", seed,
                        model_path=os.path.join(rdir, ranker_file), cwd=work)
            print(f"   -> {m}", flush=True)
            with open(os.path.join(rdir, f"ranker_{seed}.yaml"), "w") as f:
                f.write("emb_size: 32\n")
            for name, mode, extra in RERANKERS:
                print(f"[{side}] {name}{mode} over BPRMF seed={seed} ...", flush=True)
                m = run_one(side, name, mode,
                            extra + IMP_METRICS + [
                                "--ranker_name", "BPRMF",
                                "--ranker_config_file", f"ranker_{seed}.yaml",
                                "--ranker_model_file", ranker_file],
                            "SynthImpBig", seed, cwd=work)
                print(f"   -> {m}", flush=True)
                if m:
                    results.setdefault((name, mode), []).append(m)
        for (name, mode), runs in results.items():
            for key in ("NDCG@3", "HR@3"):
                vals = [m[key] for m in runs if key in m]
                rows.append((f"{name}{mode}+BPRMF", "SynthImpBig", key, side, vals))
    # fold per-side rows into the comparison shape
    merged = {}
    for model, ds, key, side, vals in rows:
        merged.setdefault((model, ds, key), {})[side] = vals
    out = []
    for (model, ds, key), d in merged.items():
        rv, tv = d.get("ref", []), d.get("tpu", [])
        if rv and tv:
            rm, tm = sum(rv) / len(rv), sum(tv) / len(tv)
            spread = max(max(rv) - min(rv), max(tv) - min(tv), 0.01)
            ok = abs(rm - tm) <= max(0.02, 1.5 * spread)
        else:
            ok = None
        out.append((model, ds, key, rv, tv, ok))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="ctr,impression")
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--out", default=os.path.join(REPO, "PARITY.md"))
    a = ap.parse_args()
    seeds = [int(s) for s in a.seeds.split(",")]
    gen_data()

    rows = []
    for fam in a.families.split(","):
        if fam == "rerank":
            rows.extend(run_rerank_family(seeds))
            continue
        for name, mode, extra, dataset in CONFIGS[fam]:
            per_side = {}
            for side in ("ref", "tpu"):
                runs = []
                for seed in seeds:
                    print(f"[{side}] {name}{mode} {dataset} seed={seed} ...", flush=True)
                    m = run_one(side, name, mode, extra, dataset, seed)
                    print(f"   -> {m}", flush=True)
                    if m:
                        runs.append(m)
                per_side[side] = runs
            keys = sorted(set().union(*[set(m) for m in per_side["ref"] + per_side["tpu"]])) \
                if (per_side["ref"] or per_side["tpu"]) else []
            main_key = ("AUC" if fam.startswith("ctr") else "NDCG@3")
            for key in keys:
                if key not in (main_key, "LOG_LOSS", "HR@3"):
                    continue
                ref_vals = [m[key] for m in per_side["ref"] if key in m]
                tpu_vals = [m[key] for m in per_side["tpu"] if key in m]
                if not ref_vals or not tpu_vals:
                    rows.append((f"{name}{mode}", dataset, key, ref_vals, tpu_vals, None))
                    continue
                ref_mean = sum(ref_vals) / len(ref_vals)
                tpu_mean = sum(tpu_vals) / len(tpu_vals)
                spread = max(
                    max(ref_vals) - min(ref_vals), max(tpu_vals) - min(tpu_vals), 0.01)
                ok = abs(ref_mean - tpu_mean) <= max(0.02, 1.5 * spread)
                rows.append((f"{name}{mode}", dataset, key, ref_vals, tpu_vals, ok))

    import time as _time

    lines = [
        "",
        "## families: {} (seeds {}, run {})".format(
            a.families, seeds, _time.strftime("%Y-%m-%d %H:%M")),
        "",
        "| model | dataset | metric | reference (per seed) | ours (per seed) | agree |",
        "|---|---|---|---|---|---|",
    ]
    for model, dataset, key, rv, tv, ok in rows:
        fmt = lambda vs: ", ".join(f"{v:.4f}" for v in vs) if vs else "FAILED"
        lines.append("| {} | {} | {} | {} | {} | {} |".format(
            model, dataset, key, fmt(rv), fmt(tv),
            {True: "yes", False: "**NO**", None: "n/a"}[ok]))
    out = "\n".join(lines) + "\n"
    # per-family sections APPEND so one family's rerun never erases
    # another family's recorded table
    if not os.path.exists(a.out):
        header = ("# Cross-framework metric parity (torch reference vs "
                  "rechorus_tpu)\n\nSame synthetic mid-SNR CSVs, same flags "
                  "(see scripts/cross_parity.py).\n")
        out = header + out
    with open(a.out, "a") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
