"""Model base hierarchy (flax.linen), mirroring reference src/models/BaseModel.py.

Contract: a model is a linen Module whose fields are hyperparameters
(filled from CLI args + corpus by `from_args`). It declares which reader /
runner / batcher it needs as class attributes (reference BaseModel.py:17),
implements `__call__(feed, training) -> out_dict` with
out_dict['prediction'] of shape [B, n_candidates] (ranking) or [B] (CTR),
and `loss(out_dict, feed) -> scalar` as a pure function used inside
jax.grad.

Differences from the reference by design (TPU-first):
  * No inner Dataset classes -- fixed-shape batch assembly lives in
    data/batching.py and runs inside jitted steps.
  * No mutable training state on the model; parameters are pytrees held
    by the runner's TrainState.
"""
from __future__ import annotations

import dataclasses
import logging
from typing import Any, ClassVar, Dict

import flax.linen as nn
import jax.numpy as jnp

from rechorus_tpu.ops import losses


class BaseModel(nn.Module):
    reader: ClassVar[str] = "BaseReader"
    runner: ClassVar[str] = "BaseRunner"
    batcher: ClassVar[str] = "general"
    extra_log_args: ClassVar[list] = []

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--model_path", type=str, default="", help="Model save path.")
        parser.add_argument("--buffer", type=int, default=1,
                            help="Kept for CLI parity; feeds are assembled on device, no host buffering.")
        return parser

    @classmethod
    def from_args(cls, args, corpus):
        """Build the module from parsed args + corpus statistics."""
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in ("parent", "name"):
                continue
            if hasattr(args, f.name):
                kwargs[f.name] = getattr(args, f.name)
        kwargs.update(cls.corpus_kwargs(args, corpus))
        return cls(**kwargs)

    @classmethod
    def corpus_kwargs(cls, args, corpus) -> Dict[str, Any]:
        return {}

    def loss(self, out_dict: Dict[str, jnp.ndarray], feed: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        raise NotImplementedError

    # ---- hooks mirroring the reference lifecycle ----
    def actions_after_train(self):
        pass


def count_variables(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


class GeneralModel(BaseModel):
    """Top-k model base: BPR multi-negative loss, sampled negatives.

    Parity: reference src/models/BaseModel.py:154-214.
    """

    reader: ClassVar[str] = "BaseReader"
    runner: ClassVar[str] = "BaseRunner"
    batcher: ClassVar[str] = "general"

    user_num: int = 0
    item_num: int = 0
    num_neg: int = 1
    dropout: float = 0.0
    test_all: int = 0

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--num_neg", type=int, default=1,
                            help="The number of negative items during training.")
        parser.add_argument("--dropout", type=float, default=0,
                            help="Dropout probability for each deep layer")
        parser.add_argument("--test_all", type=int, default=0,
                            help="Whether testing on all the items.")
        return BaseModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        return {"user_num": corpus.n_users, "item_num": corpus.n_items}

    def loss(self, out_dict, feed):
        return losses.bpr_multi_neg(out_dict["prediction"])


class SequentialModel(GeneralModel):
    """Adds truncated history feeds (reference BaseModel.py:216-245)."""

    reader: ClassVar[str] = "SeqReader"
    batcher: ClassVar[str] = "sequential"

    history_max: int = 20

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--history_max", type=int, default=20,
                            help="Maximum length of history.")
        return GeneralModel.parse_model_args(parser)


class CTRModel(BaseModel):
    """Pointwise CTR base: BCE/MSE on sigmoid outputs
    (reference BaseModel.py:247-288)."""

    reader: ClassVar[str] = "BaseReader"
    runner: ClassVar[str] = "CTRRunner"
    batcher: ClassVar[str] = "ctr"

    user_num: int = 0
    item_num: int = 0
    dropout: float = 0.0
    loss_n: str = "BCE"

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--dropout", type=float, default=0,
                            help="Dropout probability for each deep layer")
        parser.add_argument("--loss_n", type=str, default="BCE", help="Type of loss functions.")
        return BaseModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        return {"user_num": corpus.n_users, "item_num": corpus.n_items}

    def loss(self, out_dict, feed):
        if self.loss_n == "BCE":
            return losses.bce(out_dict["prediction"], feed["label"])
        elif self.loss_n == "MSE":
            return losses.mse(out_dict["prediction"], feed["label"])
        raise ValueError(f"Undefined loss function: {self.loss_n}")
