"""End-to-end: knowledge-aware family (KGReader, CFKG, SLRC+, Chorus 2-stage)."""
import argparse
import os

import numpy as np
import pytest

from rechorus_tpu import registry
from rechorus_tpu.data.batching import get_batcher
from rechorus_tpu.data.synthetic import make_kg_dataset


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_kg_dataset(str(root / "SynthKG"))
    reader_cls = registry.get_reader("KGReader")
    args = argparse.Namespace(path=str(root), dataset="SynthKG", sep="\t", include_attr=0)
    return reader_cls(args)


@pytest.fixture(scope="module")
def corpus_attr(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_attr")
    make_kg_dataset(str(root / "SynthKG"))
    reader_cls = registry.get_reader("KGReader")
    args = argparse.Namespace(path=str(root), dataset="SynthKG", sep="\t", include_attr=1)
    return reader_cls(args)


def make_args(**over):
    base = dict(
        epoch=6, check_epoch=0, test_epoch=-1, early_stop=10, lr=1e-2, l2=0.0,
        batch_size=128, eval_batch_size=128, optimizer="Adam", num_workers=0,
        pin_memory=0, topk="5,10", metric="NDCG,HR", main_metric="",
        model_path="", random_seed=42, dataset="SynthKG",
        num_neg=1, dropout=0.0, test_all=0, emb_size=16, buffer=1, history_max=10,
    )
    base.update(over)
    return argparse.Namespace(**base)


def run_model(corpus, name, args):
    model_cls = registry.get_model(name)
    model = model_cls.from_args(args, corpus)
    runner = registry.get_runner(model_cls.runner)(args)
    batchers = {p: get_batcher(model_cls.batcher)(corpus, model, p, args) for p in ["train", "dev", "test"]}
    arrays = {p: runner.place_arrays(b.device_arrays()) for p, b in batchers.items()}
    state = runner.init_state(model, batchers["train"], args.random_seed)
    before = runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [5], ["HR", "NDCG"])
    state = runner.train(model, batchers, state, arrays)
    after = runner.evaluate(state, model, batchers["test"], arrays["test"], "test", [5], ["HR", "NDCG"])
    return before, after, state, runner


def test_kg_reader(corpus):
    assert corpus.n_relations == 3  # complement, substitute + virtual 0
    assert corpus.item_relations == ["r_complement", "r_substitute"]
    assert len(corpus.triplet_set) > 0
    h, r, t = next(iter(corpus.triplet_set))
    assert 1 <= r < corpus.n_relations
    keys = corpus.sorted_triplet_keys()
    assert (np.diff(keys) > 0).all()


def test_kg_reader_attr(corpus_attr):
    # + i_category_c attribute relation; attribute entities offset past items
    assert corpus_attr.n_relations == 4
    assert corpus_attr.n_entities > corpus_attr.n_items


def test_relational_intervals_match_reference_semantics(corpus):
    """Golden-check the searchsorted kernel against a python set probe
    (the reference's per-row loops, SLRCPlus.py:94-116)."""
    import jax.numpy as jnp

    from rechorus_tpu.ops import kg as kg_ops

    rng = np.random.default_rng(0)
    B, H, C = 8, 6, 4
    R = corpus.n_relations
    hist = rng.integers(0, corpus.n_items, size=(B, H)).astype(np.int32)
    hist[:, -2:] = 0  # padding
    times = np.sort(rng.integers(1, 1000, size=(B, H))).astype(np.int64) * (hist > 0)
    now = np.full((B,), 2000, dtype=np.int64)
    cands = rng.integers(1, corpus.n_items, size=(B, C)).astype(np.int32)

    got = np.asarray(kg_ops.relational_intervals(
        jnp.asarray(hist), jnp.asarray(times), jnp.asarray(now), jnp.asarray(cands),
        jnp.asarray(corpus.member_table()), corpus.n_relations,
        corpus.n_entities, 10.0, include_repeat=True))

    for b in range(B):
        for c in range(C):
            expect = -np.ones(R)
            for j in range(H - 1, -1, -1):
                if hist[b, j] == cands[b, c] and hist[b, j] > 0:
                    expect[0] = (now[b] - times[b, j]) / 10.0
                    break
            for r in range(1, R):
                for j in range(H - 1, -1, -1):
                    if hist[b, j] > 0 and (hist[b, j], r, cands[b, c]) in corpus.triplet_set:
                        expect[r] = (now[b] - times[b, j]) / 10.0
                        break
            np.testing.assert_allclose(got[b, c], expect, rtol=1e-5)


def test_member_table_exact_membership():
    """Cuckoo table == python set, across sizes incl. powers of two,
    key 0, adversarial duplicates, and the near-full collision tail."""
    import jax.numpy as jnp

    from rechorus_tpu.ops import kg as kg_ops

    rng = np.random.default_rng(3)
    # 64-bit-scale key space: E large enough that R*E^2 >> int32 (the
    # two-half table must stay exact where the old packing overflowed)
    R, E = 5, 2_000_000
    for n in [1, 2, 7, 16, 255, 256, 4096, 100_000]:
        h = rng.integers(0, E, size=n).astype(np.int64)
        r = rng.integers(0, R, size=n).astype(np.int64)
        t = rng.integers(0, E, size=n).astype(np.int64)
        h[0], r[0], t[0] = 0, 0, 0  # all-zero triplet vs the empty sentinel
        table = kg_ops.build_member_table(h, r, t, R, E)
        cap = table.shape[0] - 1  # row 0 = (salt, 0) header
        assert (cap & (cap - 1)) == 0
        in_set = set(zip(h.tolist(), r.tolist(), t.tolist()))
        m = min(n, 500)
        qh = np.concatenate([h[:m], rng.integers(0, E, size=500)])
        qr = np.concatenate([r[:m], rng.integers(0, R, size=500)])
        qt = np.concatenate([t[:m], rng.integers(0, E, size=500)])
        got = np.asarray(kg_ops.is_member(
            jnp.asarray(table), jnp.asarray(qh, dtype=jnp.int32),
            jnp.asarray(qr, dtype=jnp.int32), jnp.asarray(qt, dtype=jnp.int32),
            R, E))
        expect = np.array([(int(a), int(b), int(c)) in in_set
                           for a, b, c in zip(qh, qr, qt)])
        np.testing.assert_array_equal(got, expect, err_msg=f"n={n}")


def test_member_table_single_mix_collisions_build():
    """ADVICE r4: keys engineered to share the OLD single 32-bit mix
    (lo*M1 ^ hi*M3 all equal) used to collide on BOTH cuckoo slots at
    every capacity -- 3+ of them made the grow loop hang forever. With
    independent per-slot hashes + per-rebuild salt they must build and
    probe exactly."""
    import jax.numpy as jnp

    from rechorus_tpu.ops import kg as kg_ops

    M1, M3 = 0x9E3779B1, 0xC2B2AE3D
    M1_inv = pow(M1, -1, 1 << 32)
    target_mix = 0x12345678
    his, los = [], []
    for hi in range(1, 33):  # 32 keys all sharing lo*M1 ^ hi*M3
        lo = ((target_mix ^ (hi * M3 & 0xFFFFFFFF)) * M1_inv) & 0xFFFFFFFF
        if lo < (1 << 31) - 1:  # keep int32-representable halves
            his.append(hi)
            los.append(lo)
    assert len(his) >= 3
    for h, l in zip(his, los):
        assert ((l * M1) ^ (h * M3)) & 0xFFFFFFFF == target_mix
    # feed the halves straight through the (h, r, t) packing: r=0 makes
    # lo = t, hi = h
    E = (1 << 31) - 1
    table = kg_ops.build_member_table(
        np.array(his, np.int64), np.zeros(len(his), np.int64),
        np.array(los, np.int64), 1, E)
    got = np.asarray(kg_ops.member_probe(
        jnp.asarray(table), jnp.asarray(his, dtype=jnp.int32),
        jnp.asarray(los, dtype=jnp.int32)))
    assert got.all()
    miss = np.asarray(kg_ops.member_probe(
        jnp.asarray(table), jnp.asarray([h + 40 for h in his], dtype=jnp.int32),
        jnp.asarray(los, dtype=jnp.int32)))
    assert not miss.any()


def test_member_table_matches_triplet_set(corpus):
    import jax.numpy as jnp

    from rechorus_tpu.ops import kg as kg_ops

    table = jnp.asarray(corpus.member_table())
    rng = np.random.default_rng(1)
    h = rng.integers(0, corpus.n_items, size=400).astype(np.int32)
    r = rng.integers(0, corpus.n_relations, size=400).astype(np.int32)
    t = rng.integers(0, corpus.n_items, size=400).astype(np.int32)
    got = np.asarray(kg_ops.is_member(table, jnp.asarray(h), jnp.asarray(r),
                                      jnp.asarray(t), corpus.n_relations,
                                      corpus.n_entities))
    expect = np.array([(int(a), int(b), int(c)) in corpus.triplet_set
                       for a, b, c in zip(h, r, t)])
    np.testing.assert_array_equal(got, expect)


def test_cfkg_learns(corpus_attr):
    args = make_args(margin=1.0, epoch=10, lr=5e-3, include_attr=1)
    before, after, _, _ = run_model(corpus_attr, "CFKG", args)
    assert np.isfinite(after["HR@5"])
    assert after["HR@5"] > before["HR@5"]


def test_slrcplus_learns(corpus):
    args = make_args(time_scalar=86400 * 10, epoch=6)
    before, after, _, _ = run_model(corpus, "SLRCPlus", args)
    assert after["HR@5"] > before["HR@5"]
    assert after["HR@5"] > 0.4


def test_chorus_two_stage(corpus, tmp_path):
    # stage 1: KG pretrain, checkpointed every epoch to pretrain_path
    args1 = make_args(stage=1, margin=1.0, epoch=3, lr=5e-3, base_method="BPR",
                      category_col="i_category_c", lr_scale=0.1,
                      time_scalar=86400 * 10,
                      model_path=str(tmp_path / "Chorus" / "x.bin"))
    _, _, state1, _ = run_model(corpus, "Chorus", args1)
    model_cls = registry.get_model("Chorus")
    model1 = model_cls.from_args(args1, corpus)
    assert os.path.exists(model1.pretrain_path)

    # stage 2: loads pretrain, trains recommendation
    args2 = make_args(stage=2, margin=1.0, epoch=5, lr=1e-2, base_method="BPR",
                      category_col="i_category_c", lr_scale=0.1,
                      time_scalar=86400 * 10,
                      model_path=str(tmp_path / "Chorus" / "x.bin"))
    before, after, _, _ = run_model(corpus, "Chorus", args2)
    assert np.isfinite(after["HR@5"])
    assert after["HR@5"] > before["HR@5"]


def test_chorus_stage2_requires_pretrain(corpus, tmp_path):
    args = make_args(stage=2, margin=1.0, epoch=1, category_col="i_category_c",
                     time_scalar=86400 * 10, lr_scale=0.1, base_method="BPR",
                     model_path=str(tmp_path / "nowhere" / "x.bin"))
    with pytest.raises(ValueError, match="stage 1"):
        run_model(corpus, "Chorus", args)


@pytest.fixture(scope="module")
def kda_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("data_kda")
    make_kg_dataset(str(root / "SynthKG"))
    reader_cls = registry.get_reader("KDAReader")
    args = argparse.Namespace(path=str(root), dataset="SynthKG", sep="\t",
                              include_attr=1, t_scalar=60, n_dft=32, freq_rand=0,
                              regenerate=0)
    return reader_cls(args)


def test_kda_reader_freq(kda_corpus):
    # complex freq_x per relation; DC bin = 2*sum(distribution) > 0
    assert kda_corpus.freq_x.shape == (kda_corpus.n_relations, kda_corpus.n_dft // 2 + 1)
    assert np.isfinite(kda_corpus.freq_x).all()
    assert (np.real(kda_corpus.freq_x[:, 0]) > 0).all()
    iv = kda_corpus.item_value_matrix()
    assert iv.shape == (kda_corpus.n_items, kda_corpus.n_relations)
    assert (iv[:, :3] == 0).all()  # virtual + item relations carry no value
    assert iv[1:, 3].min() >= kda_corpus.n_items  # attr entities offset past items


def test_kda_learns(kda_corpus):
    args = make_args(epoch=6, lr=5e-3, num_layers=1, num_heads=2, gamma=-1,
                     attention_size=8, pooling="average", include_val=1,
                     neg_head_p=0.5, include_attr=1, t_scalar=60, n_dft=32,
                     freq_rand=0, regenerate=0)
    before, after, _, _ = run_model(kda_corpus, "KDA", args)
    assert np.isfinite(after["HR@5"])
    assert after["HR@5"] > before["HR@5"]


def test_candidate_aligned_keys_follow_permutation(corpus):
    """The anti-leak column shuffle must carry per-candidate features
    (relational_interval etc.) along with item_id -- regression for the
    misalignment that cost SLRC+/Chorus ~0.05 HR@5."""
    import jax
    import jax.numpy as jnp

    from rechorus_tpu.data.batching import get_batcher

    args = make_args(time_scalar=86400 * 10, epoch=1)
    model_cls = registry.get_model("SLRCPlus")
    model = model_cls.from_args(args, corpus)
    batcher = get_batcher(model_cls.batcher)(corpus, model, "train", args)
    arrays = batcher.device_arrays()

    # contract check mirroring runners/base.py step_fn
    key = jax.random.key(0)
    feed = batcher.train_feed(arrays, jnp.arange(32, dtype=jnp.int32), key)
    before_items = np.asarray(feed["item_id"])
    before_intervals = np.asarray(feed["relational_interval"])
    u = jax.random.uniform(key, feed["item_id"].shape)
    idx = jnp.argsort(u, axis=-1)
    permuted_items = np.asarray(jnp.take_along_axis(feed["item_id"], idx, axis=-1))
    ix = idx[:, :, None]
    permuted_intervals = np.asarray(jnp.take_along_axis(feed["relational_interval"], ix, axis=1))
    # after permutation, the (item, interval) pairs must be preserved
    for b in range(before_items.shape[0]):
        pairs_before = {int(before_items[b, c]): tuple(before_intervals[b, c]) for c in range(before_items.shape[1])}
        for c in range(permuted_items.shape[1]):
            assert tuple(permuted_intervals[b, c]) == pairs_before[int(permuted_items[b, c])]


def test_contra_kda_learns(kda_corpus):
    """ContraKDA = KDA + CCC contrast over augmented views (the reference
    results table's strongest Grocery row; no reference source exists)."""
    args = make_args(epoch=6, lr=5e-3, num_layers=1, num_heads=2, gamma=-1,
                     attention_size=8, pooling="average", include_val=1,
                     neg_head_p=0.5, include_attr=1, t_scalar=60, n_dft=32,
                     freq_rand=0, regenerate=0, contra_gamma=0.3, ccc_temp=0.2,
                     beta_a=3, beta_b=3)
    before, after, _, _ = run_model(kda_corpus, "ContraKDA", args)
    assert np.isfinite(after["HR@5"])
    assert after["HR@5"] > before["HR@5"] + 0.2


def test_slrcplus_host_shard_input(corpus):
    """Regression: SLRC's interval precompute slices the history arrays
    with [lo:hi]; under --host_shard_input those are LazyRows, which used
    to raise TypeError (not subscriptable) before training started."""
    args = make_args(epoch=1, host_shard_input=1)
    before, after, state, runner = run_model(corpus, "SLRCPlus", args)
    assert np.isfinite(after["HR@5"])
