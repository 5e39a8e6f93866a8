import numpy as np
import pytest

from rechorus_tpu.ops import metrics as M


class TestTopK:
    def test_gt_rank_parity(self):
        # oracle: full argsort rank of column 0, ties counted against it
        rng = np.random.default_rng(0)
        preds = rng.normal(size=(64, 100)).astype(np.float32)
        # inject ties
        preds[:5, 1] = preds[:5, 0]
        ranks = (preds >= preds[:, :1]).sum(-1)
        res = M.evaluate_topk(preds, [5, 10], ["HR", "NDCG"])
        hit5 = (ranks <= 5).mean()
        assert res["HR@5"] == pytest.approx(hit5)
        assert res["NDCG@5"] == pytest.approx(((ranks <= 5) / np.log2(ranks + 1)).mean())

    def test_device_ranks_match_host(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(1)
        preds = rng.normal(size=(32, 50)).astype(np.float32)
        dev = np.asarray(M.gt_rank(jnp.asarray(preds)))
        host = (preds >= preds[:, :1]).sum(-1)
        np.testing.assert_array_equal(dev, host)

    def test_perfect_and_worst(self):
        preds = np.zeros((4, 10), dtype=np.float32)
        preds[:, 0] = 1.0  # positive best everywhere
        res = M.evaluate_topk(preds, [1], ["HR", "NDCG"])
        assert res["HR@1"] == 1.0 and res["NDCG@1"] == 1.0
        preds[:, 0] = -1.0
        res = M.evaluate_topk(preds, [5], ["HR"])
        assert res["HR@5"] == 0.0


class TestCTR:
    def test_auc_matches_sklearn(self):
        from sklearn.metrics import roc_auc_score

        rng = np.random.default_rng(2)
        for trial in range(5):
            y = rng.integers(0, 2, size=500)
            if y.sum() in (0, len(y)):
                continue
            p = rng.normal(size=500)
            # quantize to force ties
            if trial % 2:
                p = np.round(p, 1)
            assert M.auc_score(y, p) == pytest.approx(roc_auc_score(y, p), abs=1e-10)

    def test_log_loss_matches_sklearn_clipping(self):
        y = np.array([0, 1, 1, 0])
        p = np.array([0.1, 0.9, 0.0, 1.0])
        eps = 1e-7
        pc = np.clip(p, eps, 1 - eps)
        expected = -(y * np.log(pc) + (1 - y) * np.log(1 - pc)).mean()
        assert M.log_loss(y, p) == pytest.approx(expected)

    def test_acc_f1(self):
        y = np.array([1, 0, 1, 1, 0])
        p = np.array([0.9, 0.2, 0.4, 0.6, 0.7])
        assert M.accuracy(y, p) == pytest.approx(3 / 5)
        from sklearn.metrics import f1_score as skf1

        assert M.f1_score(y, p) == pytest.approx(skf1(y, p > 0.5))


class TestImpression:
    def _oracle(self, preds, pos_num, neg_num, P, topks):
        """Independent re-derivation of the listwise protocol."""
        B, L = preds.shape
        out = {}
        for k in topks:
            hrs, ndcgs, maps = [], [], []
            for b in range(B):
                p = preds[b].copy().astype(np.float64)
                p[:P] -= 1e-6
                labels = np.zeros(L)
                labels[: min(pos_num[b], P)] = 1
                order = np.argsort(-p, kind="mergesort")
                lab_sorted = labels[order]
                valid = min(pos_num[b], P) + min(neg_num[b], L - P)
                lab_sorted = lab_sorted * (np.arange(L) < valid)
                topk_lab = lab_sorted[:k]
                npos = lab_sorted.sum()
                denom = min(max(npos, 1), k)
                hrs.append(1.0 if topk_lab.sum() > 0 else 0.0)
                dcg = (topk_lab / np.log2(np.arange(2, k + 2))).sum()
                ideal = np.sort(lab_sorted)[::-1][:k]
                idcg = (ideal / np.log2(np.arange(2, k + 2))).sum()
                ndcgs.append(dcg / idcg if idcg > 0 else 0.0)
                cum = np.cumsum(lab_sorted)
                cum_k = cum.copy()
                cum_k[k:] = 0
                prec = cum_k / np.arange(1, L + 1)
                maps.append((prec * lab_sorted).sum() / denom)
            out[f"HR@{k}"] = np.mean(hrs)
            out[f"NDCG@{k}"] = np.mean(ndcgs)
            out[f"MAP@{k}"] = np.mean(maps)
        return out

    def test_masked_listwise_parity(self):
        rng = np.random.default_rng(3)
        B, P, N = 16, 5, 10
        preds = rng.normal(size=(B, P + N))
        pos_num = rng.integers(1, P + 2, size=B)  # may exceed P (clipped)
        neg_num = rng.integers(1, N + 2, size=B)
        # pad scores to -inf as the runner does
        for b in range(B):
            preds[b, min(pos_num[b], P):P] = -np.inf
            preds[b, P + min(neg_num[b], N):] = -np.inf
        res = M.evaluate_impression(preds, [2, 5], ["HR", "NDCG", "MAP"], pos_num, neg_num, P)
        oracle = self._oracle(preds, pos_num, neg_num, P, [2, 5])
        for key in oracle:
            assert res[key] == pytest.approx(oracle[key]), key

    def test_tie_positives_rank_last(self):
        # one pos, one neg with identical score: positive must lose the tie
        preds = np.array([[0.5, 0.5]])
        res = M.evaluate_impression(preds, [1], ["HR"], np.array([1]), np.array([1]), 1)
        assert res["HR@1"] == 0.0
