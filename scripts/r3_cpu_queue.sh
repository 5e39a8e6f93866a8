#!/bin/sh
# Round-3 serial CPU queue (one physical core: run everything serially).
# 1. Multi-seed all-family cross-framework parity matrix (VERDICT r2 items 1+2)
# 2. Published-gap closure reruns on the 10% Grocery subsample (item 3)
set -x
cd /root/repo

OUT=PARITY_r3.md
for fam in ctr context_topk impression impression_seq ctr_long; do
  timeout 7200 python scripts/cross_parity.py --families "$fam" --seeds 0,1,2 --out "$OUT" \
    || echo "FAMILY $fam FAILED"
done
timeout 7200 python scripts/cross_parity.py --families rerank --seeds 0,1 --out "$OUT" \
  || echo "FAMILY rerank FAILED"

# closure runs: reference's own code vs ours on the identical 10% subsample
SUB=/tmp/ref_rerun/data/Grocery_sub10
[ -d "$SUB" ] || python scripts/subsample_grocery.py --frac 0.10 --seed 42 --out "$SUB"

# GRU4Rec (published flags, Topk_Amazon.sh:19)
timeout 7200 python scripts/ref_rerun.py --model GRU4Rec --seed 0 --dataset Grocery_sub10 \
  --flags "--emb_size 64 --hidden_size 100 --lr 1e-3 --l2 1e-4 --history_max 20 --epoch 100 --early_stop 10"
# DirectAU (Topk_Amazon.sh:16; published --epoch 500, capped for 1-core box)
timeout 7200 python scripts/ref_rerun.py --model DirectAU --seed 0 --dataset Grocery_sub10 \
  --flags "--emb_size 64 --lr 1e-3 --l2 1e-5 --gamma 0.3 --epoch 300 --early_stop 15"
# ContraRec (Topk_Amazon.sh:39; batch 4096->1024 for 1-core feasibility, see
# scripts/subsample_grocery.py docstring -- both sides run the identical config;
# the published command's --temp 0.2 is ignored by the reference's own parser)
timeout 14400 python scripts/ref_rerun.py --model ContraRec --seed 0 --dataset Grocery_sub10 \
  --flags "--emb_size 64 --lr 1e-4 --l2 1e-6 --history_max 20 --encoder BERT4Rec --gamma 1 --batch_size 1024 --epoch 300 --early_stop 15"
echo QUEUE-DONE
