#!/bin/bash
# One-shot TPU measurement sweep: run when the tunnel is healthy.
# NEVER run two TPU processes at once (the tunnel is exclusive); this
# script runs its stages strictly sequentially and saves raw outputs
# under $OUT (default /tmp/tpu_measure_<date>).
set -u
OUT=${OUT:-/tmp/tpu_measure_$(date +%m%d_%H%M)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {  # run <name> <timeout_s> <cmd...>  -> returns the command's rc
  local name=$1 tmo=$2 rc; shift 2
  echo "=== $name ==="
  timeout "$tmo" "$@" >"$OUT/$name.txt" 2>&1
  rc=$?
  echo "rc=$rc (see $OUT/$name.txt)"; tail -2 "$OUT/$name.txt"
  return $rc
}

# 0. tunnel sanity: the probe itself exits nonzero unless a non-CPU
# (TPU) device ran the op -- string-grepping the transcript would
# false-pass on jax's 'Unable to initialize backend tpu' warning
run probe 120 python -c "
import sys
import jax
x = jax.numpy.ones((256, 256))
print(float((x @ x).sum()), jax.devices())
sys.exit(0 if jax.devices()[0].platform.lower() != 'cpu' else 1)
" || { echo "TPU not available; aborting"; exit 1; }

# 1. headline bench (the driver's metric)
run bench 900 python bench.py

# 2. production lanes at catalog 100k: dense vs tiled, exact vs approx
run prod_100k 1800 python scripts/prod_bench.py --items 100000
# 3. lazy Adam + bf16 + sparse-grad training lanes at 1M items
run prod_1m_dense 1800 python scripts/prod_bench.py --items 1000000
run prod_1m_lazy 1800 python scripts/prod_bench.py --items 1000000 --lazy_adam 1
run prod_1m_lazy_sparse 1800 python scripts/prod_bench.py --items 1000000 --lazy_adam 1 --sparse_grad 1
run prod_1m_lazy_bf16 1800 python scripts/prod_bench.py --items 1000000 --lazy_adam 1 --bf16 1

# 4. Pallas stage-1 on/off at 100k (ops.topk.PALLAS auto=on for TPU; force off to compare)
run pallas_off 1800 python -c "
from rechorus_tpu.ops import topk
topk.PALLAS = 'off'
import runpy, sys
sys.argv = ['prod_bench', '--items', '100000']
runpy.run_path('scripts/prod_bench.py', run_name='__main__')
"

# 5. Grocery end-to-end (epoch time + converged parity point)
run grocery_bprmf 1200 python -m rechorus_tpu.main --model_name BPRMF \
  --emb_size 64 --lr 1e-3 --l2 1e-6 --dataset Grocery_and_Gourmet_Food \
  --path data/ --epoch 200 --early_stop 10 \
  --log_file "$OUT/grocery_bprmf.log" --model_path "$OUT/bprmf.bin"

echo "All outputs in $OUT"
