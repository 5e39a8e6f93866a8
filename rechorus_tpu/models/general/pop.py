"""POP -- rank items by train-set popularity; run with --train 0.

Reference behavior: src/models/general/POP.py.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from rechorus_tpu.models.base import GeneralModel
from rechorus_tpu.registry import register_model


@register_model("POP")
class POP(GeneralModel):
    popularity: Tuple[int, ...] = ()

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        pop = np.bincount(corpus.data_df["train"]["item_id"].to_numpy(),
                          minlength=corpus.n_items)
        kw["popularity"] = tuple(pop.tolist())
        return kw

    @nn.compact
    def __call__(self, feed, training: bool = False):
        pop = self.variable(
            "constants", "popularity", lambda: jnp.asarray(self.popularity, dtype=jnp.float32)
        )
        # a dummy param so optimizers have something to update under --train 0
        self.param("_unused", nn.initializers.zeros, (1,))
        prediction = pop.value[feed["item_id"]]
        return {"prediction": prediction}
