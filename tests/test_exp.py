"""exp.py in-process multi-seed harness (VERDICT round-1 item 9)."""
import os

import pandas as pd


def test_inproc_multi_seed(tmp_path):
    from rechorus_tpu.data.synthetic import make_topk_dataset
    from rechorus_tpu.exp import main as exp_main

    make_topk_dataset(str(tmp_path / "Synth"), n_users=40, n_items=60, n_per_user=8, n_neg=9)
    cmd = (
        "python -m rechorus_tpu.main --model_name BPRMF --emb_size 8 --lr 1e-2 "
        f"--epoch 2 --dataset Synth --path {tmp_path} --save_final_results 0 "
        f"--log_file {tmp_path}/run.log --model_path {tmp_path}/m.bin --xla_cache_dir ''"
    )
    (tmp_path / "run.sh").write_text(cmd + "\n")
    exp_main(["--log_dir", str(tmp_path), "--cmd_dir", str(tmp_path),
              "--in_f", "run.sh", "--out_f", "exp.csv", "--n", "2", "--inproc", "1"])

    df = pd.read_csv(tmp_path / "exp.csv")
    rows = df[df["Seed"].notna() & (df["Seed"] != "")]
    # 2 per-seed rows with parsable metrics + Best Iter, then a mean row
    assert len(rows) >= 2
    seed_rows = df.iloc[:2]
    for _, r in seed_rows.iterrows():
        assert "HR@5" in str(r["Test"])
        assert str(int(float(r["Best Iter"]))).isdigit()
    mean_row = df.iloc[2]
    assert "HR@5" in str(mean_row["Test"]) and mean_row["Model"] == "BPRMF"
    # seeds differ -> the runs were actually re-seeded
    assert {int(float(seed_rows.iloc[0]["Seed"])), int(float(seed_rows.iloc[1]["Seed"]))} == {0, 1}
