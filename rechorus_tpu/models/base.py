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
from typing import Any, ClassVar, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from rechorus_tpu.ops import losses


class BaseModel(nn.Module):
    reader: ClassVar[str] = "BaseReader"
    runner: ClassVar[str] = "BaseRunner"
    batcher: ClassVar[str] = "general"
    extra_log_args: ClassVar[list] = []
    # Catalog-scoring protocol (full-catalog eval/serving): models that
    # factor as score(u, i) = u_v . table[i] (+ bias[i]) set this True and
    # accept __call__(feed, training, catalog=True) returning
    # {"u_v": [B, d]} (+ optional "i_table" [N, d], "i_bias" [N]). The
    # runner then scores the catalog as ONE [B,d]x[d,N] MXU matmul --
    # and, when the table is row-sharded over the mesh 'model' axis,
    # routes through parallel.topk's shard_map kernels (O(B*k) comm).
    # When "i_table" is absent the runner reads the raw param table at
    # catalog_table; models with a transformed table (e.g. LightGCN's
    # propagated embeddings) return it explicitly.
    supports_catalog: ClassVar[bool] = False
    catalog_table: ClassVar[tuple] = ("i_embeddings",)
    # True when the catalog table the runner scores against IS the raw
    # param table at catalog_table (no "i_table" in the catalog output).
    # Lets predict_topk pre-build the grouped-slice rescore copy
    # (ops/topk.group_table_for_rescore) once per call, outside the
    # eval scan. Models returning a TRANSFORMED table (LightGCN's
    # propagated embeddings, FPMC's fused MF+FMC table) set False.
    catalog_raw_table: ClassVar[bool] = True

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
    # Self-supervised models (BUIR/DirectAU) train without negatives
    # (reference overrides Dataset.actions_before_epoch to sample none)
    train_with_neg: ClassVar[bool] = True

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

    def lazy_table_specs(self) -> dict:
        """Embedding tables eligible for `--lazy_emb_adam` (touched-rows
        optimizer updates): {param path: feed keys whose ids touch it}.
        Paths missing from a subclass's param tree are ignored (see
        ops/lazy_adam.resolve_lazy_rows); subclasses with differently
        named tables can override.

        CONSTRAINT (packed lane, --packed_opt_rows, default ON): every
        read of a listed table MUST go through TableEmbed's gather (the
        sparse-lookup context). During the epoch scan the flax-visible
        param leaf is a dead ZEROS placeholder -- any bypass read
        (nn.Embed.attend, raw `params[path]` access, a loss term over the
        whole table) silently sees zeros. Models that need whole-table
        reads (e.g. LightGCN's propagation) must NOT list that table
        here. Run with --debug_nan_placeholder 1 to NaN-fill the
        placeholder and surface violations (the NaN-loss abort fires)."""
        return {
            ("u_embeddings", "embedding"): ("user_id",),
            ("i_embeddings", "embedding"): ("item_id",),
        }

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

    def lazy_table_specs(self) -> dict:
        specs = dict(super().lazy_table_specs())
        # history ids also gather from the item table (pad id 0 rides
        # along harmlessly: its grad row is 0, so its update is 0)
        specs[("i_embeddings", "embedding")] = ("item_id", "history_items")
        return specs


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
        parser.add_argument("--num_neg", type=int, default=0,
                            help="CLI parity with the reference (its CTR scripts pass "
                                 "--num_neg 0); CTR training is pointwise, no sampling.")
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


class _ContextFields:
    """Schema fields + feed assembly shared by the context families
    (filled by corpus_kwargs from data/context.build_schema).

    TPU design: user/item feature matrices live in the 'constants'
    variable collection (placed on device once); the model gathers
    per-candidate features by id inside the jitted step. This keeps feeds
    small AND makes the runner's anti-leak candidate permutation safe --
    features follow item_id automatically (the reference instead carries
    every feature column in the feed dict, BaseContextModel.py:15-28).
    """

    @classmethod
    def schema_kwargs(cls, corpus):
        from rechorus_tpu.data.context import build_schema, feature_matrices
        from rechorus_tpu.data.context import is_categorical

        schema = build_schema(corpus)
        mats = feature_matrices(corpus)
        consts = {}
        if "user" in mats:
            cat_cols = [i for i, n in enumerate(schema.user_names) if is_categorical(n)]
            flt_cols = [i for i, n in enumerate(schema.user_names) if not is_categorical(n)]
            consts["user_cat"] = mats["user"][:, cat_cols].astype("int32")
            consts["user_float"] = mats["user"][:, flt_cols].astype("float32")
        if "item" in mats:
            cat_cols = [i for i, n in enumerate(schema.item_names) if is_categorical(n)]
            flt_cols = [i for i, n in enumerate(schema.item_names) if not is_categorical(n)]
            consts["item_cat"] = mats["item"][:, cat_cols].astype("int32")
            consts["item_float"] = mats["item"][:, flt_cols].astype("float32")
        cat_offsets = tuple(schema.offsets[i] for i in schema.cat_positions)
        return {
            "feature_names": schema.names,
            "feature_kinds": schema.kinds,
            "feature_offsets": cat_offsets,
            "total_vocab": schema.total_vocab,
            "n_situ_cat": len([n for n in schema.situ_names if is_categorical(n)]),
            "n_situ_float": len([n for n in schema.situ_names if not is_categorical(n)]),
            "source_names": (schema.user_names, schema.item_names, schema.situ_names),
            "constants_factory": (lambda consts=consts: consts),
        }

    def group_embeddings(self, feed, vec_size: int, include_history: bool = True,
                         extra_item_ids: dict | None = None):
        """Per-group feature embeddings via one shared fused table.

        Returns a dict of stacked embeddings (reference DIN.get_all_embedding,
        src/models/context_seq/DIN.py:97-137):
          'item'      [B, C, Fi, d]  -- item_id + i_* of each candidate
          'user'      [B, Fu, d]     -- user_id + u_*
          'situ'      [B, Fs, d]     -- c_* (empty-dim if none)
          'history'   [B, H, Fi, d]  -- history item ids + their i_*
          'history_situ' [B, H, Fs, d] when the feed carries it
        Group-internal order: id, categorical (sorted), float (sorted).
        """
        from rechorus_tpu.data.context import is_categorical
        from rechorus_tpu.ops.layers import dense, embed

        consts = self._consts()
        table = embed(self.total_vocab, vec_size, "fused_table")
        names, kinds = self.feature_names, self.feature_kinds
        cat_names = [n for n, k in zip(names, kinds) if k == "cat"]
        off = dict(zip(cat_names, self.feature_offsets))
        user_names, item_names, situ_names = self.source_names
        flt_dense = {
            n: dense(vec_size, use_bias=False, name=f"float_{n}")
            for n in names if not is_categorical(n)
        }

        users, items = feed["user_id"], feed["item_id"]
        if items.ndim == 1:
            items = items[:, None]
        B, C = items.shape

        def build(id_vals, id_offset, feat_names, cat_src, float_src):
            """id_vals [...]; cat_src [..., n_cat]; float_src [..., n_flt]."""
            cats = [id_vals[..., None] + id_offset]
            cat_feat = [n for n in feat_names if is_categorical(n)]
            if cat_feat:
                offs = jnp.asarray([off[n] for n in cat_feat], dtype=jnp.int32)
                cats.append(cat_src + offs)
            stacked = table(jnp.concatenate(cats, axis=-1).astype(jnp.int32))
            flts = [n for n in feat_names if not is_categorical(n)]
            if flts:
                fparts = [flt_dense[n](float_src[..., j : j + 1])[..., None, :] for j, n in enumerate(flts)]
                stacked = jnp.concatenate([stacked] + fparts, axis=-2)
            return stacked

        out = {}
        item_cat = consts.get("item_cat")
        item_flt = consts.get("item_float")
        zeros_c = jnp.zeros(items.shape + (0,), jnp.int32)
        zeros_f = jnp.zeros(items.shape + (0,), jnp.float32)
        out["item"] = build(
            items, off["item_id"], item_names,
            item_cat[items] if item_cat is not None else zeros_c,
            item_flt[items] if item_flt is not None else zeros_f,
        )
        user_cat = consts.get("user_cat")
        user_flt = consts.get("user_float")
        out["user"] = build(
            users, off["user_id"], user_names,
            user_cat[users] if user_cat is not None else jnp.zeros((B, 0), jnp.int32),
            user_flt[users] if user_flt is not None else jnp.zeros((B, 0), jnp.float32),
        )
        if situ_names:
            situ_parts = []
            cat_feat = [n for n in situ_names if is_categorical(n)]
            if cat_feat:
                offs = jnp.asarray([off[n] for n in cat_feat], dtype=jnp.int32)
                situ_parts.append(table(feed["situ_cat"].astype(jnp.int32) + offs))
            flts = [n for n in situ_names if not is_categorical(n)]
            for j, n in enumerate(flts):
                situ_parts.append(flt_dense[n](feed["situ_float"][..., j : j + 1])[..., None, :])
            out["situ"] = jnp.concatenate(situ_parts, axis=-2)  # [B, Fs, d]
        if include_history and "history_items" in feed:
            hist = feed["history_items"]
            out["history"] = build(
                hist, off["item_id"], item_names,
                item_cat[hist] if item_cat is not None else jnp.zeros(hist.shape + (0,), jnp.int32),
                item_flt[hist] if item_flt is not None else jnp.zeros(hist.shape + (0,), jnp.float32),
            )
        for key, ids in (extra_item_ids or {}).items():
            # embed arbitrary extra item-id arrays (e.g. DIEN's sampled
            # negative history) with the SAME table/feature machinery
            out[key] = build(
                ids, off["item_id"], item_names,
                item_cat[ids] if item_cat is not None else jnp.zeros(ids.shape + (0,), jnp.int32),
                item_flt[ids] if item_flt is not None else jnp.zeros(ids.shape + (0,), jnp.float32),
            )
        if include_history and "history_items" in feed:
            if "history_situ" in feed and situ_names:
                cat_feat = [n for n in situ_names if is_categorical(n)]
                parts = []
                if cat_feat:
                    offs = jnp.asarray([off[n] for n in cat_feat], dtype=jnp.int32)
                    # history_situ carries cat columns first (batcher order)
                    parts.append(table(feed["history_situ"][..., : len(cat_feat)].astype(jnp.int32) + offs))
                flts = [n for n in situ_names if not is_categorical(n)]
                for j, n in enumerate(flts):
                    parts.append(
                        flt_dense[n](feed["history_situ"][..., len(cat_feat) + j : len(cat_feat) + j + 1]
                                     .astype(jnp.float32))[..., None, :]
                    )
                out["history_situ"] = jnp.concatenate(parts, axis=-2)
        return out

    def feature_value(self, feed, name):
        """Raw value of a named context feature, shaped [B, C]
        (or [B, C, 1] float). Used by models that condition on specific
        features (e.g. FinalMLP feature selection, DIN-style gates)."""
        from rechorus_tpu.data.context import is_categorical

        consts = self._consts()
        users, items = feed["user_id"], feed["item_id"]
        if items.ndim == 1:
            items = items[:, None]
        B, C = items.shape
        if name == "user_id":
            return jnp.broadcast_to(users[:, None], (B, C))
        if name == "item_id":
            return items
        user_names, item_names, situ_names = self.source_names
        cat = is_categorical(name)
        if name in user_names:
            group = [n for n in user_names if is_categorical(n) == cat]
            col = group.index(name)
            src = consts["user_cat" if cat else "user_float"][users][:, None, :]
            return jnp.broadcast_to(src[..., col], (B, C))
        if name in item_names:
            group = [n for n in item_names if is_categorical(n) == cat]
            col = group.index(name)
            return consts["item_cat" if cat else "item_float"][items][..., col]
        if name in situ_names:
            group = [n for n in situ_names if is_categorical(n) == cat]
            col = group.index(name)
            src = feed["situ_cat" if cat else "situ_float"][:, None, :]
            return jnp.broadcast_to(src[..., col], (B, C))
        raise ValueError(f"Unknown context feature: {name}")

    def _consts(self):
        factory = self.constants_factory
        arrays = factory() if factory is not None else {}
        out = {}
        for k, v in arrays.items():
            if self.has_variable("constants", k):
                out[k] = self.get_variable("constants", k)
            else:
                out[k] = self.variable("constants", k, lambda v=v: jnp.asarray(v)).value
        return out

    def context_inputs(self, feed):
        """Assemble (cat_ids [B,C,F_cat] offset-applied, float_vals
        [B,C,F_float]) in canonical order: user + item + situation + ids."""
        consts = self._consts()
        users, items = feed["user_id"], feed["item_id"]
        if items.ndim == 1:
            items = items[:, None]
        B, C = items.shape
        cat_parts, float_parts = [], []
        if "user_cat" in consts and consts["user_cat"].shape[1] > 0:
            cat_parts.append(jnp.broadcast_to(consts["user_cat"][users][:, None, :], (B, C, consts["user_cat"].shape[1])))
        if "user_float" in consts and consts["user_float"].shape[1] > 0:
            float_parts.append(jnp.broadcast_to(consts["user_float"][users][:, None, :], (B, C, consts["user_float"].shape[1])))
        if "item_cat" in consts and consts["item_cat"].shape[1] > 0:
            cat_parts.append(consts["item_cat"][items])
        if "item_float" in consts and consts["item_float"].shape[1] > 0:
            float_parts.append(consts["item_float"][items])
        if self.n_situ_cat > 0:
            cat_parts.append(jnp.broadcast_to(feed["situ_cat"][:, None, :].astype(jnp.int32), (B, C, self.n_situ_cat)))
        if self.n_situ_float > 0:
            float_parts.append(jnp.broadcast_to(feed["situ_float"][:, None, :], (B, C, self.n_situ_float)))
        cat_parts.append(jnp.broadcast_to(users[:, None, None].astype(jnp.int32), (B, C, 1)))
        cat_parts.append(items[:, :, None].astype(jnp.int32))
        cat_ids = jnp.concatenate(cat_parts, axis=-1)
        cat_ids = cat_ids + jnp.asarray(self.feature_offsets, dtype=jnp.int32)[None, None, :]
        if float_parts:
            float_vals = jnp.concatenate(float_parts, axis=-1).astype(jnp.float32)
        else:
            float_vals = jnp.zeros((B, C, 0), jnp.float32)
        return cat_ids, float_vals


class ContextModel(GeneralModel, _ContextFields):
    """Context-aware top-k model base (reference BaseContextModel.py:30-71):
    BPR loss (inherited) or multi-negative BCE."""

    reader: ClassVar[str] = "ContextReader"
    runner: ClassVar[str] = "BaseRunner"
    batcher: ClassVar[str] = "context"

    loss_n: str = "BPR"
    feature_names: tuple = ()
    feature_kinds: tuple = ()
    feature_offsets: tuple = ()
    total_vocab: int = 0
    n_situ_cat: int = 0
    n_situ_float: int = 0
    source_names: tuple = ((), (), ())
    constants_factory: Any = None

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--loss_n", type=str, default="BPR", help="Type of loss functions.")
        return GeneralModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls.schema_kwargs(corpus))
        return kw

    def loss(self, out_dict, feed):
        if self.loss_n == "BPR":
            return losses.bpr_multi_neg(out_dict["prediction"])
        elif self.loss_n == "BCE":
            # multi-negative BCE (reference BaseContextModel.py:52-56)
            predictions = jax.nn.sigmoid(out_dict["prediction"])
            pos_pred, neg_pred = predictions[:, 0], predictions[:, 1:]
            return -(
                jnp.log(jnp.maximum(pos_pred, 1e-12))
                + jnp.log(jnp.maximum(1 - neg_pred, 1e-12)).sum(axis=1)
            ).mean()
        raise ValueError(f"Undefined loss function: {self.loss_n}")


class ContextCTRModel(CTRModel, _ContextFields):
    """Context-aware CTR base (reference BaseContextModel.py:74-87)."""

    reader: ClassVar[str] = "ContextReader"
    runner: ClassVar[str] = "CTRRunner"
    batcher: ClassVar[str] = "context_ctr"

    feature_names: tuple = ()
    feature_kinds: tuple = ()
    feature_offsets: tuple = ()
    total_vocab: int = 0
    n_situ_cat: int = 0
    n_situ_float: int = 0
    source_names: tuple = ((), (), ())
    constants_factory: Any = None

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        kw = super().corpus_kwargs(args, corpus)
        kw.update(cls.schema_kwargs(corpus))
        return kw


class ContextSeqModel(ContextModel):
    """Context + history (reference BaseContextModel.py:89-124)."""

    reader: ClassVar[str] = "ContextSeqReader"
    batcher: ClassVar[str] = "context_seq"

    history_max: int = 20
    add_historical_situations: int = 0

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--history_max", type=int, default=20, help="Maximum length of history.")
        parser.add_argument("--add_historical_situations", type=int, default=0,
                            help="Whether to add historical situation context as sequence.")
        return ContextModel.parse_model_args(parser)


class ContextSeqCTRModel(ContextCTRModel):
    """Context + history, CTR (reference BaseContextModel.py:129-166)."""

    reader: ClassVar[str] = "ContextSeqReader"
    batcher: ClassVar[str] = "context_seq_ctr"

    history_max: int = 20
    add_historical_situations: int = 0

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--history_max", type=int, default=20, help="Maximum length of history.")
        parser.add_argument("--add_historical_situations", type=int, default=0,
                            help="Whether to add historical situation context as sequence.")
        return ContextCTRModel.parse_model_args(parser)


class ImpressionModel(GeneralModel):
    """Listwise impression model base (reference BaseImpressionModel.py:
    10-211): logged pos/neg lists padded to fixed caps, 4 listwise loss
    families, no train-time sampling, no anti-leak permutation (the
    pos|neg column layout is structural)."""

    reader: ClassVar[str] = "ImpressionReader"
    runner: ClassVar[str] = "ImpressionRunner"
    batcher: ClassVar[str] = "impression"
    permute_candidates: ClassVar[bool] = False

    loss_n: str = "BPR"
    train_max_pos_item: int = 20
    train_max_neg_item: int = 20
    test_max_pos_item: int = 20
    test_max_neg_item: int = 20

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--loss_n", type=str, default="BPR",
                            help="BPR(+after/before/simple/hard) | listnet | softmaxCE | attention_rank")
        parser.add_argument("--train_max_pos_item", type=int, default=20,
                            help="Max number of positive items per impression in training.")
        parser.add_argument("--train_max_neg_item", type=int, default=20,
                            help="Max number of negative items per impression in training.")
        parser.add_argument("--test_max_pos_item", type=int, default=20,
                            help="Max number of positive items per impression in testing.")
        parser.add_argument("--test_max_neg_item", type=int, default=20,
                            help="Max number of negative items per impression in testing.")
        return GeneralModel.parse_model_args(parser)

    def loss(self, out_dict, feed):
        return losses.impression_loss(
            out_dict["prediction"], feed["target"], self.train_max_pos_item, self.loss_n
        )


class ImpressionSeqModel(ImpressionModel):
    """Adds dual pos/neg history feeds (reference BaseImpressionModel.py:
    213-277)."""

    reader: ClassVar[str] = "ImpressionSeqReader"
    batcher: ClassVar[str] = "impression_seq"

    history_max: int = 20

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--history_max", type=int, default=20, help="Maximum length of history.")
        return ImpressionModel.parse_model_args(parser)


class RerankModel(ImpressionModel):
    """Listwise re-ranker over a pre-trained base ranker.

    Parity: reference src/models/BaseRerankerModel.py:15-84. The ranker
    forward runs as the first stage of the jitted step (see
    models/reranker/_loader.py); feeds gain 'scores' (pads -inf),
    'position' (rank order of ranker scores), 'padding_mask', 'u_v',
    'i_v'.

    --tuneranker 0 (default): the ranker's params are frozen device
    constants closed over by the batcher -- XLA folds the two stages into
    one program with zero optimizer state for the ranker.
    --tuneranker 1 (reference BaseRerankerModel.py:58-66): the ranker is
    a TRAINABLE SUBMODULE (`ranker_module`); its loaded checkpoint params
    are injected into the reranker's param tree after init
    (RerankBatcher.post_init_state) and receive joint gradient updates.
    The ranker stage then runs inside the model forward (rerank_feed) so
    grads flow through scores/u_v/i_v (+his_v); 'position' is an argsort
    rank -- discrete, no gradient, same as the reference.
    """

    reader: ClassVar[str] = "ImpressionReader"
    runner: ClassVar[str] = "ImpressionRunner"
    batcher: ClassVar[str] = "rerank"
    extra_log_args: ClassVar[list] = ["tuneranker"]
    _needs_his_v: ClassVar[bool] = False

    ranker_name: str = "BPRMF"
    ranker_config_file: str = ""
    ranker_model_file: str = ""
    tuneranker: int = 0
    ranker_emb_size: int = 64
    ranker_module: Any = None

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--ranker_name", type=str, default="BPRMF", help="Base ranker")
        parser.add_argument("--ranker_config_file", type=str, default="", help="Base ranker config file (yaml)")
        parser.add_argument("--ranker_model_file", type=str, default="", help="Base ranker model file")
        parser.add_argument("--tuneranker", type=int, default=0,
                            help="Fine-tune the loaded ranker jointly with the "
                                 "re-ranker (its params join the trainable tree).")
        return ImpressionModel.parse_model_args(parser)

    @classmethod
    def corpus_kwargs(cls, args, corpus):
        from rechorus_tpu.models.reranker._loader import ranker_args, ranker_emb_size

        kw = super().corpus_kwargs(args, corpus)
        kw["ranker_emb_size"] = ranker_emb_size(args)
        if getattr(args, "tuneranker", 0):
            from rechorus_tpu import registry

            r_args = ranker_args(args)
            ranker_cls = registry.get_model(args.ranker_name, "Impression")
            kw["ranker_module"] = ranker_cls.from_args(r_args, corpus)
        return kw

    def rerank_feed(self, feed: Dict[str, jnp.ndarray], training: bool) -> Dict[str, jnp.ndarray]:
        """Materialize the ranker-stage feed keys. Frozen lane: they were
        precomputed by the batcher (no-op here). Tuned lane: run the
        trainable ranker submodule so the keys are differentiable w.r.t.
        its params."""
        if not self.tuneranker or "scores" in feed:
            return feed
        out = self.ranker_module(feed, training=False)
        feed = dict(feed)
        valid = feed["target"] != -1
        scores = jnp.where(valid, out["prediction"], -jnp.inf)
        order = jnp.argsort(-scores, axis=1)
        feed["scores"] = scores
        feed["position"] = jnp.argsort(order, axis=1).astype(jnp.int32)
        feed["padding_mask"] = ~valid
        feed["u_v"] = out["u_v"]
        feed["i_v"] = out["i_v"]
        if self._needs_his_v:
            his_feed = dict(feed)
            his_feed["item_id"] = feed["history_items"]
            feed["his_v"] = self.ranker_module(his_feed, training=False)["i_v"]
        return feed


class RerankSeqModel(RerankModel):
    """+ history feeds and 'his_v' = ranker item embeddings of the
    positive history (reference BaseRerankerModel.py:86-133)."""

    reader: ClassVar[str] = "ImpressionSeqReader"
    batcher: ClassVar[str] = "rerank_seq"
    _needs_his_v: ClassVar[bool] = True

    history_max: int = 20

    @staticmethod
    def parse_model_args(parser):
        parser.add_argument("--history_max", type=int, default=20, help="Maximum length of history.")
        return RerankModel.parse_model_args(parser)
