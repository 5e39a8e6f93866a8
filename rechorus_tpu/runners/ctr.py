"""CTR runner: BCE/MSE training, AUC/LogLoss/ACC/F1 evaluation.

Parity: reference src/helpers/CTRRunner.py -- predictions collected as a
flat array with labels; main_metric = metrics[0] (no @k); same train-loop
control as BaseRunner. TPU-first: the predict loop is a jitted scan
returning (prediction, label) pairs on device; metrics computed host-side
with exact sklearn tie semantics (ops/metrics.py).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu import registry
from rechorus_tpu.ops import metrics as metrics_ops
from rechorus_tpu.runners.base import BaseRunner


@registry.register_runner("CTRRunner")
class CTRRunner(BaseRunner):
    evaluate_method = staticmethod(metrics_ops.evaluate_ctr)

    def __init__(self, args):
        super().__init__(args)
        self.metrics = [m.strip().upper() for m in args.metric.split(",")]
        self.main_metric = self.metrics[0] if not args.main_metric else args.main_metric
        self.main_topk = 0

    def _get_eval_fn(self, model, batcher, phase: str):
        if phase in self._compiled:
            return self._compiled[phase]

        def pred_step(arrays, variables, idx):
            feed = batcher.eval_feed(arrays, idx)
            out = self._apply_eval(model, variables, feed)
            return variables, (out["prediction"].reshape(-1), feed["label"].reshape(-1))

        @jax.jit
        def eval_fn(params, extra_vars, arrays, idx_mat):
            variables = {"params": params, **extra_vars}
            _, (preds, labels) = jax.lax.scan(
                lambda v, i: pred_step(arrays, v, i), variables, idx_mat)
            return (self._replicate_out(preds.reshape(-1)),
                    self._replicate_out(labels.reshape(-1)))

        self._compiled[phase] = eval_fn
        return eval_fn

    def predict(self, state, model, batcher, arrays, phase: str):
        n = len(batcher)
        idx_mat = self._eval_index_matrix(n, self.eval_batch_size)
        eval_fn = self._get_eval_fn(model, batcher, phase)
        preds, labels = eval_fn(state.params, state.extra_vars, arrays, idx_mat)
        return np.asarray(preds)[:n], np.asarray(labels)[:n]

    # print_res is inherited: BaseRunner.print_res routes through the
    # evaluate() override below
    def evaluate(self, state, model, batcher, arrays, phase, topks, metric_names) -> Dict[str, float]:
        predictions, labels = self.predict(state, model, batcher, arrays, phase)
        return self.evaluate_method(predictions, labels, metric_names)
