import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from rechorus_tpu.ops import losses as L


def torch_bpr_multi_neg(predictions):
    """Oracle: the reference GeneralModel.loss formula in torch
    (src/models/BaseModel.py:175-189)."""
    predictions = torch.tensor(predictions)
    pos_pred, neg_pred = predictions[:, 0], predictions[:, 1:]
    neg_softmax = (neg_pred - neg_pred.max()).softmax(dim=1)
    loss = -(
        ((pos_pred[:, None] - neg_pred).sigmoid() * neg_softmax).sum(dim=1)
    ).clamp(min=1e-8, max=1 - 1e-8).log().mean()
    return float(loss)


class TestBPR:
    def test_matches_torch_oracle(self):
        rng = np.random.default_rng(0)
        for num_neg in [1, 4, 99]:
            preds = rng.normal(size=(32, 1 + num_neg)).astype(np.float32)
            got = float(L.bpr_multi_neg(jnp.asarray(preds)))
            want = torch_bpr_multi_neg(preds)
            assert got == pytest.approx(want, rel=1e-4)

    def test_single_neg_reduces_to_bpr(self):
        # with one negative, loss = -log sigmoid(pos - neg)
        preds = np.array([[2.0, 0.5]], dtype=np.float32)
        got = float(L.bpr_multi_neg(jnp.asarray(preds)))
        want = -np.log(1 / (1 + np.exp(-(2.0 - 0.5))))
        assert got == pytest.approx(want, rel=1e-4)

    def test_grad_finite(self):
        import jax

        rng = np.random.default_rng(1)
        preds = rng.normal(size=(8, 5)).astype(np.float32)
        g = jax.grad(lambda p: L.bpr_multi_neg(p))(jnp.asarray(preds))
        assert np.isfinite(np.asarray(g)).all()


class TestPointwise:
    def test_bce_matches_torch(self):
        rng = np.random.default_rng(2)
        p = rng.uniform(0.01, 0.99, size=64).astype(np.float32)
        y = rng.integers(0, 2, size=64).astype(np.float32)
        got = float(L.bce(jnp.asarray(p), jnp.asarray(y)))
        want = float(F.binary_cross_entropy(torch.tensor(p), torch.tensor(y)))
        assert got == pytest.approx(want, rel=1e-5)


def torch_impression_loss(prediction, target, P, loss_n):
    """Oracle: reference BaseImpressionModel.loss in torch
    (src/models/BaseImpressionModel.py:44-128), re-derived."""
    prediction = torch.tensor(prediction, dtype=torch.float64)
    target = torch.tensor(target, dtype=torch.float64)
    B, Lc = prediction.shape
    mask = torch.where(target == -1, target, torch.zeros_like(target)) + 1
    have_neg = mask[:, P]

    if "BPR" in loss_n:
        valid = mask.unsqueeze(-1) * mask.unsqueeze(-1).transpose(-1, -2)
        pos_mask = (torch.arange(Lc).unsqueeze(0).repeat(B, 1) < P).double()
        neg_mask = (torch.arange(Lc).unsqueeze(0).repeat(B, 1) >= P).double()
        select = pos_mask.unsqueeze(-1) * neg_mask.unsqueeze(-1).transpose(-1, -2) * valid
        diff = prediction.unsqueeze(-1) - prediction.unsqueeze(-1).transpose(-1, -2)
        diff_mask = diff * select
        neg_pred = torch.where(neg_mask * mask == 1, prediction, torch.tensor(float("-inf"), dtype=torch.float64))
        neg_softmax = (neg_pred - neg_pred.max()).softmax(dim=1)
        if "hard" in loss_n:
            pos_pred = torch.where(pos_mask * mask == 1, prediction, torch.tensor(float("inf"), dtype=torch.float64))
            pos_softmax = (pos_pred.min() - pos_pred).softmax(dim=1)
        else:
            pos_pred = torch.where(pos_mask * mask == 1, prediction, torch.tensor(float("-inf"), dtype=torch.float64))
            pos_softmax = (pos_pred - pos_pred.max()).softmax(dim=1)
        if "after" in loss_n:
            loss = ((F.softplus(-diff_mask) * neg_softmax.unsqueeze(1)).sum(-1) * pos_softmax).sum(-1)
            return float(loss.mean())
        elif "before" in loss_n:
            loss = F.softplus(-(diff_mask * neg_softmax.unsqueeze(1)).sum(-1) * pos_softmax).sum(-1)
            return float(loss.mean())
        else:  # between
            diff_mask = torch.where(select == 1, diff_mask, torch.tensor(float("-inf"), dtype=torch.float64))
            loss = -((diff_mask.sigmoid() * neg_softmax.unsqueeze(1)).sum(-1) * pos_softmax).sum(-1).log()
            return float(loss.mean())
    elif loss_n == "listnet":
        t = torch.where(target != -1, target, torch.tensor(float("-inf"), dtype=torch.float64))
        t_soft = (t - t.max()).softmax(dim=1)
        p_soft = (prediction - prediction.max()).softmax(dim=1)
        p_soft = torch.where(mask == 1, p_soft, torch.ones_like(p_soft))
        loss = -(t_soft * p_soft.log()).sum(dim=1)
        loss = loss * have_neg / have_neg.sum() * len(have_neg)
        return float(loss.mean())
    elif loss_n == "softmaxCE":
        pos_m = torch.where(target == 1, target, torch.zeros_like(target))
        pos_len = pos_m.sum(axis=1)
        pred = torch.where(mask == 1, prediction, torch.tensor(float("-inf"), dtype=torch.float64))
        pre_softmax = (pred - pred.max(dim=1, keepdim=True)[0]).softmax(dim=1)
        tp = pre_softmax[:, :P]
        tp = torch.where(mask[:, :P] == 1, tp, torch.ones_like(tp))
        loss = -(tp).log().sum(axis=1).div(pos_len)
        loss = loss * have_neg / have_neg.sum() * len(have_neg)
        return float(loss.mean())
    elif loss_n == "attention_rank":
        t = torch.where(target != -1, target, torch.tensor(float("-inf"), dtype=torch.float64))
        t_soft = (t - t.max()).softmax(dim=1)
        pred = torch.where(mask == 1, prediction, torch.tensor(float("-inf"), dtype=torch.float64))
        p_soft = (pred - pred.max()).softmax(dim=1)
        p1 = torch.where(mask == 1, p_soft, torch.ones_like(p_soft))
        loss1 = -(t_soft * p1.log()).sum(dim=1)
        p2 = torch.where(mask == 1, p_soft, torch.zeros_like(p_soft))
        p2 = torch.where(p2 != 1, p2, torch.zeros_like(p2))
        loss2 = -((1 - t_soft) * (1 - p2).log()).sum(dim=1)
        loss = (loss1 + loss2) * have_neg / have_neg.sum() * len(have_neg)
        return float(loss.mean())


def make_impression_batch(seed=0, B=8, P=4, N=6):
    rng = np.random.default_rng(seed)
    pred = rng.normal(size=(B, P + N)).astype(np.float32)
    target = np.full((B, P + N), -1.0, dtype=np.float32)
    for b in range(B):
        np_pos = rng.integers(1, P + 1)
        np_neg = rng.integers(1, N + 1)
        target[b, :np_pos] = 1.0
        target[b, P : P + np_neg] = 0.0
    return pred, target


@pytest.mark.parametrize(
    "loss_n",
    ["BPR", "BPRafter", "BPRbefore", "BPRhard", "listnet", "softmaxCE", "attention_rank"],
)
def test_impression_loss_parity(loss_n):
    pred, target = make_impression_batch()
    got = float(L.impression_loss(jnp.asarray(pred), jnp.asarray(target), 4, loss_n))
    want = torch_impression_loss(pred, target, 4, loss_n)
    assert got == pytest.approx(want, rel=1e-4), loss_n


def test_impression_loss_grad_finite():
    import jax

    pred, target = make_impression_batch(seed=5)
    for loss_n in ["BPR", "listnet", "softmaxCE", "attention_rank"]:
        g = jax.grad(lambda p: L.impression_loss(p, jnp.asarray(target), 4, loss_n))(jnp.asarray(pred))
        assert np.isfinite(np.asarray(g)).all(), loss_n


class TestRepresentation:
    def test_alignment_uniformity(self):
        rng = np.random.default_rng(4)
        u = rng.normal(size=(16, 8)).astype(np.float32)
        i = rng.normal(size=(16, 8)).astype(np.float32)
        ut = F.normalize(torch.tensor(u), dim=-1)
        it = F.normalize(torch.tensor(i), dim=-1)
        want_align = float((ut - it).norm(p=2, dim=1).pow(2).mean())
        got = float(L.alignment_loss(jnp.asarray(u), jnp.asarray(i)))
        assert got == pytest.approx(want_align, rel=1e-5)
        want_unif = float(torch.pdist(ut, p=2).pow(2).mul(-2).exp().mean().log())
        got_u = float(L.uniformity_loss(jnp.asarray(u)))
        assert got_u == pytest.approx(want_unif, rel=1e-4)

    def test_infonce_identity_mask(self):
        rng = np.random.default_rng(6)
        f = rng.normal(size=(8, 2, 16)).astype(np.float32)
        val = float(L.infonce(jnp.asarray(f), temperature=0.5))
        assert np.isfinite(val) and val > 0
