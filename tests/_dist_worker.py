"""Worker for tests/test_distributed.py -- NOT a pytest module.

Runs one process of a 2-process CPU 'pod': 4 local devices each, global
4x2 ('data','model') mesh, SASRec train epoch + dev eval through the
runner product path."""
import argparse
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)

pid = int(sys.argv[1])
tmp = sys.argv[2]
host_shard = int(sys.argv[3]) if len(sys.argv) > 3 else 0
port = sys.argv[4] if len(sys.argv) > 4 else "29517"
jax.distributed.initialize(coordinator_address="localhost:" + port,
                           num_processes=2, process_id=pid)

from rechorus_tpu import registry  # noqa: E402
from rechorus_tpu.data.batching import get_batcher  # noqa: E402
from rechorus_tpu.data.synthetic import make_topk_dataset  # noqa: E402

ds = os.path.join(tmp, "Synth")
if pid == 0:
    make_topk_dataset(ds, n_users=64, n_items=2048, n_per_user=8, n_neg=9)
    open(os.path.join(ds, ".ready"), "w").write("1")
else:
    import time

    while not os.path.exists(os.path.join(ds, ".ready")):
        time.sleep(0.2)

args = argparse.Namespace(
    path=tmp, dataset="Synth", sep="\t",
    epoch=1, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-3, l2=1e-6,
    batch_size=32, eval_batch_size=32, optimizer="Adam",
    num_workers=0, pin_memory=0, topk="5", metric="NDCG,HR", main_metric="",
    model_path="", random_seed=0, num_neg=2, dropout=0.1, test_all=0,
    emb_size=32, history_max=8, buffer=1, num_layers=1, num_heads=2,
    data_parallel=4, model_parallel=2, host_shard_input=host_shard,
)

built_ranges = []
if host_shard:
    # count the rows this PROCESS materializes: with 2 hosts on a 4-wide
    # 'data' axis each host owns 2 of the 4 row blocks
    from rechorus_tpu.data import batching as B

    _orig_materialize = B.LazyRows.materialize

    def _spy(self, lo=0, hi=None):
        built_ranges.append((self.shape, lo, self.shape[0] if hi is None else hi))
        return _orig_materialize(self, lo, hi)

    B.LazyRows.materialize = _spy

corpus = registry.get_reader("SeqReader")(args)
model_cls = registry.get_model("SASRec")
runner = registry.get_runner(model_cls.runner)(args)
assert jax.device_count() == 8 and jax.process_count() == 2
model = model_cls.from_args(args, corpus)
batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
state = runner.init_state(model, batcher, 0)
arrays = runner.place_arrays(batcher.device_arrays())
state, loss = runner.fit(state, model, batcher, arrays, 1, jax.random.key(0))
eval_batcher = get_batcher(model_cls.batcher)(corpus, model, "dev", args)
eval_arrays = runner.place_arrays(eval_batcher.device_arrays())
res = runner.evaluate(state, model, eval_batcher, eval_arrays, "dev", [5], ["HR", "NDCG"])
print(f"DIST_OK loss={loss:.6f} HR@5={res['HR@5']:.6f} NDCG@5={res['NDCG@5']:.6f}", flush=True)
if host_shard:
    n_train = len(batcher)
    # distinct ranges built for the train history bank [n_train, H]:
    # this host must only have materialized ITS row blocks (+ the 2-row
    # init prefix), i.e. ~half the rows on 2 hosts
    H = args.history_max
    ranges = {(lo, hi) for shape, lo, hi in built_ranges
              if shape == (n_train, H) and hi - lo > 2}
    covered = sum(hi - lo for lo, hi in ranges)
    print(f"LAZY_BUILT train_rows={n_train} covered={covered}", flush=True)
