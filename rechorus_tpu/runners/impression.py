"""Impression (listwise) runner.

Parity: reference src/helpers/ImpressionRunner.py -- listwise train with
the target matrix built from pos/neg masks; evaluation via the masked
HR/NDCG/MAP kernels with eps tie-break (ops/metrics.evaluate_impression).
TPU-first: the predict scan masks padding to -inf on device and returns
fixed-shape [B, P+N] score rows; metrics on host.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from rechorus_tpu import registry
from rechorus_tpu.ops import metrics as metrics_ops
from rechorus_tpu.runners.base import BaseRunner


@registry.register_runner("ImpressionRunner")
class ImpressionRunner(BaseRunner):
    evaluate_method = staticmethod(metrics_ops.evaluate_impression)

    def _get_eval_fn(self, model, batcher, phase: str):
        if phase in self._compiled:
            return self._compiled[phase]

        def pred_step(arrays, variables, idx):
            feed = batcher.eval_feed(arrays, idx)
            out = self._apply_eval(model, variables, feed)
            pred = out["prediction"]
            valid = feed["target"] != -1
            pred = jnp.where(valid, pred, -jnp.inf)
            return variables, (pred, feed["pos_num"], feed["neg_num"])

        @jax.jit
        def eval_fn(params, extra_vars, arrays, idx_mat):
            variables = {"params": params, **extra_vars}
            _, (preds, pos_num, neg_num) = jax.lax.scan(
                lambda v, i: pred_step(arrays, v, i), variables, idx_mat)
            return (
                self._replicate_out(preds.reshape(-1, preds.shape[-1])),
                self._replicate_out(pos_num.reshape(-1)),
                self._replicate_out(neg_num.reshape(-1)),
            )

        self._compiled[phase] = eval_fn
        return eval_fn

    def predict(self, state, model, batcher, arrays, phase: str):
        n = len(batcher)
        idx_mat = self._eval_index_matrix(n, self.eval_batch_size)
        eval_fn = self._get_eval_fn(model, batcher, phase)
        preds, pos_num, neg_num = eval_fn(state.params, state.extra_vars, arrays, idx_mat)
        return np.asarray(preds)[:n], np.asarray(pos_num)[:n], np.asarray(neg_num)[:n]

    def evaluate(self, state, model, batcher, arrays, phase, topks, metric_names) -> Dict[str, float]:
        preds, pos_num, neg_num = self.predict(state, model, batcher, arrays, phase)
        return metrics_ops.evaluate_impression(
            preds, topks, metric_names, pos_num, neg_num, batcher.pos_len
        )
