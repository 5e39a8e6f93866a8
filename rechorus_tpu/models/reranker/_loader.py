"""Frozen base-ranker loading for the re-ranking pipeline.

Parity surface: reference src/models/BaseRerankerModel.py:40-66 -- the
ranker is `<ranker_name>Impression` instantiated from the CLI args
overlaid with a YAML config (history_max excluded), its checkpoint
loaded, parameters frozen.

TPU re-architecture (SURVEY.md §7 step 6): the reference runs the frozen
ranker's forward INSIDE DataLoader collate on GPU (BaseRerankerModel.py:
70-84, forcing --num_workers 0); here the ranker forward is the FIRST
STAGE OF THE JITTED STEP -- its params are closed-over device constants,
XLA fuses ranker + reranker into one program.

Documented reference bug this module does NOT reproduce: every reference
reranker's __init__ ends with `self.apply(self.init_weights)` AFTER
RerankModel.__init__ loaded the frozen ranker (e.g. PRM.py:55 via
_base_init), re-randomizing the loaded checkpoint -- the reference's
rerankers run over a random frozen first stage. With that clobbering
undone, both pipelines produce identical metrics under ported weights
(tests/test_reader_parity.py::test_rerank_pipeline_parity).
"""
from __future__ import annotations

import copy
import logging
import os

import flax
import jax
import yaml


def resolve_path(args, name: str) -> str:
    if os.path.exists(name):
        return name
    return os.path.join("model", f"{args.ranker_name}Impression", name)


def ranker_args(args):
    """CLI args overlaid with the ranker's YAML config (except history_max,
    reference BaseRerankerModel.py:53-56)."""
    r_args = copy.deepcopy(args)
    cfg_path = resolve_path(args, args.ranker_config_file)
    if os.path.exists(cfg_path):
        with open(cfg_path, "r", encoding="utf-8") as f:
            cfg = yaml.safe_load(f.read()) or {}
        for k, v in cfg.items():
            if k != "history_max":
                setattr(r_args, k, v)
    else:
        logging.warning("Ranker config %s not found; using CLI args as-is", cfg_path)
    return r_args


def ranker_emb_size(args) -> int:
    return int(getattr(ranker_args(args), "emb_size", 64))


def load_ranker(args, corpus, example_feed_fn):
    """Build the frozen ranker and load its checkpoint.

    example_feed_fn() -> a feed dict for shape-correct init.
    Returns (module, variables) with variables = {'params', ...extras}.
    """
    from rechorus_tpu import registry

    r_args = ranker_args(args)
    ranker_cls = registry.get_model(args.ranker_name, "Impression")
    ranker = ranker_cls.from_args(r_args, corpus)
    key = jax.random.key(getattr(args, "random_seed", 0))
    variables = ranker.init({"params": key, "dropout": key}, example_feed_fn(), training=False)
    model_path = resolve_path(args, args.ranker_model_file)
    if os.path.exists(model_path):
        with open(model_path, "rb") as f:
            restored = flax.serialization.from_bytes(
                {"params": variables["params"],
                 "extra_vars": {k: v for k, v in variables.items() if k != "params"}},
                f.read(),
            )
        variables = {"params": restored["params"], **restored["extra_vars"]}
        logging.info("Loaded frozen ranker from %s", model_path)
    else:
        logging.warning("Ranker checkpoint %s not found; ranker is randomly initialized", model_path)
    return ranker, dict(variables)
