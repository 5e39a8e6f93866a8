"""BUIR runner: BaseRunner + EMA momentum update of the target networks
after every optimizer step.

Parity: reference src/helpers/BUIRRunner.py:36 (calls model._update_target()
after optimizer.step()). TPU-first: the EMA runs INSIDE the jitted epoch
scan as a pure function of (params, target collection) -- no host round
trip per step.
"""
from __future__ import annotations

from rechorus_tpu import registry
from rechorus_tpu.runners.base import BaseRunner


@registry.register_runner("BUIRRunner")
class BUIRRunner(BaseRunner):
    def _post_update(self, model, params, extra_vars):
        return model.ema_update(params, extra_vars)
