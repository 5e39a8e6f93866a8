"""CLI entry point.

Parity surface: reference src/main.py -- same two-stage arg parsing
(--model_name/--model_mode first, then a parser composed from
global + reader + runner + model argument groups), corpus pickle cache,
'Test Before Training' sanity eval, final dev/test eval, top-100
prediction export, and the exact log-line grammar exp.py parses.
Class names resolve through explicit registries instead of eval()
(reference main.py:164-166).

Usage:
  python -m rechorus_tpu.main --model_name BPRMF --emb_size 64 \
      --dataset Grocery_and_Gourmet_Food --path data/
"""
from __future__ import annotations

import argparse
import logging
import os
import pickle

import numpy as np

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.models.base import count_variables
from rechorus_tpu.utils import io as utils
from rechorus_tpu.utils.rng import init_seed


def parse_global_args(parser):
    parser.add_argument("--gpu", type=str, default="0",
                        help="Kept for CLI parity; device selection is JAX-managed on TPU.")
    parser.add_argument("--xla_cache_dir", type=str,
                        default=os.path.expanduser("~/.cache/rechorus_tpu_xla"),
                        help="Persistent XLA compilation cache (repeat runs skip the "
                             "20-40 s compile). Empty string disables.")
    from rechorus_tpu.parallel.distributed import parse_dist_args

    parser = parse_dist_args(parser)
    parser.add_argument("--verbose", type=int, default=logging.INFO, help="Logging Level, 0, 10, ..., 50")
    parser.add_argument("--log_file", type=str, default="", help="Logging file path")
    parser.add_argument("--random_seed", type=int, default=0, help="Random seed of numpy and jax.")
    parser.add_argument("--load", type=int, default=0, help="Whether load model and continue to train")
    parser.add_argument("--train", type=int, default=1, help="To train the model or not.")
    parser.add_argument("--save_final_results", type=int, default=1, help="To save the final validation and test results or not.")
    parser.add_argument("--regenerate", type=int, default=0, help="Whether to regenerate intermediate files")
    parser.add_argument("--dense_init", type=str, default="reference",
                        choices=["reference", "glorot"],
                        help="Dense-layer init scheme. 'reference' = N(0,0.01) for every "
                             "kernel+bias (reference BaseModel.init_weights); 'glorot' = "
                             "glorot-uniform kernels + zero bias, a documented deviation "
                             "that rescues deep multiplicative chains (ETA/SDIM DNNs) "
                             "from the dead-ReLU collapse the reference init causes "
                             "under l2>0 (see ops/layers.py).")
    return parser


def build_corpus(args, reader_cls):
    """Pickle-cache the corpus like reference main.py:58-65."""
    appendix = ""
    corpus_path = os.path.join(args.path, args.dataset, reader_cls.__name__ + appendix + ".pkl")
    if not args.regenerate and os.path.exists(corpus_path):
        logging.info("Load corpus from {}".format(corpus_path))
        try:
            with open(corpus_path, "rb") as f:
                return pickle.load(f)
        except Exception as e:  # stale/foreign cache -> rebuild
            logging.warning("Corpus cache unusable (%s); regenerating", e)
    corpus = reader_cls(args)
    try:
        logging.info("Save corpus to {}".format(corpus_path))
        with open(corpus_path, "wb") as f:
            pickle.dump(corpus, f)
    except OSError:
        logging.warning("Could not cache corpus (read-only data dir?)")
    return corpus


def save_rec_results(args, corpus, model, runner, state, batchers, arrays, topk: int = 100):
    """Per-task prediction export (reference main.py:96-153):
    CTR -> (user_id, item_id, pCTR, label); top-k -> (user_id, rec_items,
    rec_predictions) with the top-100 candidates; impression/rerank ->
    (user_id, pos_items, pos_predictions, neg_items, neg_predictions).
    NB: the reference's neg_predictions slice takes the FIRST neg_len
    columns (main.py:141 `predictions[i][:dataset.neg_len]`) -- we take
    the actual negative block [pos_len : pos_len+neg_len].
    """
    import pandas as pd

    from rechorus_tpu.runners.ctr import CTRRunner
    from rechorus_tpu.runners.impression import ImpressionRunner

    result_path = os.path.join(args.path, args.dataset, "rec-{}-{}.csv".format(model.registered_name, "test"))
    utils.check_dir(result_path)
    batcher, arr = batchers["test"], arrays["test"]
    df = corpus.data_df["test"]

    if isinstance(runner, CTRRunner):
        logging.info("Saving CTR prediction results to: {}".format(result_path))
        predictions, labels = runner.predict(state, model, batcher, arr, "test")
        src = getattr(batcher, "_df", df)
        out = pd.DataFrame({
            "user_id": src["user_id"].to_numpy(),
            "item_id": src["item_id"].to_numpy(),
            "pCTR": predictions,
            "label": labels,
        })
    elif isinstance(runner, ImpressionRunner):
        logging.info("Saving all recommendation results to: {}".format(result_path))
        preds, pos_num, neg_num = runner.predict(state, model, batcher, arr, "test")
        P = batcher.pos_len
        src = getattr(batcher, "_df", df)
        if getattr(batcher, "test_all", False):
            # catalog protocol (r5): the block after the positives is the
            # FULL catalog (clicked/id-0 already -inf); export the top-k
            # catalog recommendations instead of the logged negatives
            cat = preds[:, P:]
            kk = min(topk, cat.shape[1])
            part = np.argpartition(-cat, kk - 1, axis=1)[:, :kk]
            order = np.argsort(-np.take_along_axis(cat, part, axis=1),
                               axis=1, kind="stable")
            top_items = np.take_along_axis(part, order, axis=1)
            top_scores = np.take_along_axis(cat, top_items, axis=1)
            out = pd.DataFrame({
                "user_id": src["user_id"].to_numpy(),
                "pos_items": [list(map(int, r)) for r in src["pos_items"]],
                "pos_predictions": [list(np.round(r[:n], 4)) for r, n in zip(preds[:, :P], pos_num)],
                "rec_items": [list(map(int, r)) for r in top_items],
                "rec_predictions": [list(np.round(r, 4)) for r in top_scores],
            })
        else:
            out = pd.DataFrame({
                "user_id": src["user_id"].to_numpy(),
                "pos_items": [list(map(int, r)) for r in src["pos_items"]],
                "pos_predictions": [list(np.round(r[:n], 4)) for r, n in zip(preds[:, :P], pos_num)],
                "neg_items": [list(map(int, r)) for r in src["neg_items"]],
                "neg_predictions": [list(np.round(r[:n], 4)) for r, n in zip(preds[:, P:], neg_num)],
            })
    else:
        logging.info("Saving top-{} recommendation results to: {}".format(topk, result_path))
        items, scores = runner.predict_topk(state, model, batcher, arr, "test", k=topk)
        src = getattr(batcher, "_df", df)
        out = pd.DataFrame({
            "user_id": src["user_id"].to_numpy(),
            "rec_items": [list(map(int, r)) for r in items],
            "rec_predictions": [list(np.round(r, 4)) for r in scores],
        })
    out.to_csv(result_path, sep=args.sep, index=False)
    logging.info("test Prediction results saved!")


def enable_compilation_cache(args):
    cache_dir = getattr(args, "xla_cache_dir", "")
    if cache_dir:
        try:
            import jax

            jax.config.update("jax_compilation_cache_dir", cache_dir)
            # cache EVERY program: on the axon tunnel even a trivial
            # primitive costs ~0.45 s of compile RPC, and a research run
            # dispatches dozens of them eagerly during setup
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        except Exception as e:  # cache is an optimization, never fatal
            logging.warning("Could not enable XLA compilation cache: %s", e)


def build_stack(args, model_cls, reader_cls, runner_cls):
    """Corpus + runner + model + batchers + placed arrays -- everything
    seed-independent. The in-process multi-seed mode (exp.py --inproc)
    builds this ONCE and reuses the runner's compiled epoch/eval fns
    across seeds, so only seed 0 pays the XLA compile."""
    corpus = build_corpus(args, reader_cls)
    # runner first: it owns the device mesh and (on multi-device runs)
    # sets the embedding-table row pad, which must precede model init
    runner = runner_cls(args)
    model = model_cls.from_args(args, corpus)
    # two-stage models redirect the checkpoint to a well-known stage path
    # inside from_args (Chorus stage 1, reference Chorus.py:68-76); the
    # runner captured model_path at construction, so refresh it
    runner.model_path = getattr(args, "model_path", runner.model_path)
    logging.info(model_cls.__name__)
    batcher_cls = get_batcher(model_cls.batcher)
    batchers = {phase: batcher_cls(corpus, model, phase, args) for phase in ["train", "dev", "test"]}
    arrays = {phase: runner.place_arrays(b.device_arrays()) for phase, b in batchers.items()}
    return corpus, runner, model, batchers, arrays


def train_and_eval(args, corpus, runner, model, batchers, arrays, seed: int):
    """One seeded train+eval pass over a prebuilt stack; returns
    (state, info) with the exp.py trailer fields."""
    from time import time as _now

    init_seed(seed)
    runner.random_seed = seed
    t0 = _now()
    state = runner.init_state(model, batchers["train"], seed)
    logging.info("#params: {}".format(count_variables(state.params)))

    if args.load > 0:
        state = runner.load_model(state)

    logging.info(
        "Test Before Training: " + runner.print_res(state, model, batchers["test"], arrays["test"], "test")
    )

    if args.train > 0:
        state = runner.train(model, batchers, state, arrays)

    eval_res = runner.print_res(state, model, batchers["dev"], arrays["dev"], "dev")
    logging.info(os.linesep + "Dev  After Training: " + eval_res)
    test_res = runner.print_res(state, model, batchers["test"], arrays["test"], "test")
    logging.info("Test After Training: " + test_res)

    if args.save_final_results == 1:
        save_rec_results(args, corpus, model, runner, state, batchers, arrays)

    model.actions_after_train()
    info = {"Test": test_res.strip("()"), "Seed": str(seed), "Time": "%.1f" % (_now() - t0)}
    if getattr(runner, "last_best_epoch", None) is not None:
        info["Best Iter"] = str(runner.last_best_epoch)
    return state, info


def main(args, model_cls, reader_cls, runner_cls):
    logging.info("-" * 45 + " BEGIN: " + utils.get_time() + " " + "-" * 45)
    exclude = ["check_epoch", "log_file", "model_path", "path", "pin_memory", "load",
               "regenerate", "sep", "train", "verbose", "metric", "test_epoch", "buffer"]
    logging.info(utils.format_arg_str(args, exclude_lst=exclude))

    from rechorus_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(args)  # multi-host: must precede any other JAX call
    enable_compilation_cache(args)
    init_seed(args.random_seed)
    from rechorus_tpu.ops.layers import set_dense_init

    set_dense_init(getattr(args, "dense_init", "reference"))
    corpus, runner, model, batchers, arrays = build_stack(args, model_cls, reader_cls, runner_cls)
    state, _ = train_and_eval(args, corpus, runner, model, batchers, arrays, args.random_seed)
    logging.info(os.linesep + "-" * 45 + " END: " + utils.get_time() + " " + "-" * 45)
    return state


def build_parser_and_run(argv=None):
    # this image's TPU init hook overrides the JAX_PLATFORMS env var;
    # re-assert it so `JAX_PLATFORMS=cpu python -m rechorus_tpu.main ...`
    # reliably runs off the (exclusive) TPU tunnel
    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)

    init_parser = argparse.ArgumentParser(description="Model", add_help=False)
    init_parser.add_argument("--model_name", type=str, default="BPRMF", help="Choose a model to run.")
    init_parser.add_argument("--model_mode", type=str, default="", help="Task mode suffix (e.g. CTR, TopK, Impression).")
    init_args, init_extras = init_parser.parse_known_args(argv)

    model_cls = registry.get_model(init_args.model_name, init_args.model_mode)
    reader_cls = registry.get_reader(model_cls.reader)
    runner_cls = registry.get_runner(model_cls.runner)

    parser = argparse.ArgumentParser(parents=[init_parser])
    parser = parse_global_args(parser)
    parser = reader_cls.parse_data_args(parser)
    parser = runner_cls.parse_runner_args(parser)
    parser = model_cls.parse_model_args(parser)
    args, extras = parser.parse_known_args(argv)
    if extras:
        logging.warning("Unrecognized args: %s", extras)

    # log/model file names embed extra_log_args (reference main.py:182-189)
    log_args = [init_args.model_name + init_args.model_mode, args.dataset, str(args.random_seed)]
    for arg in ["lr", "l2"] + model_cls.extra_log_args:
        log_args.append(arg + "=" + str(getattr(args, arg)))
    log_file_name = "__".join(log_args).replace(" ", "__")
    if args.log_file == "":
        args.log_file = "../log/{}/{}.txt".format(init_args.model_name + init_args.model_mode, log_file_name)
    if args.model_path == "":
        args.model_path = "../model/{}/{}.bin".format(init_args.model_name + init_args.model_mode, log_file_name)

    utils.init_logging(args.log_file, args.verbose)
    return main(args, model_cls, reader_cls, runner_cls)


if __name__ == "__main__":
    build_parser_and_run()
