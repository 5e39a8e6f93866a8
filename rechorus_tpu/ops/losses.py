"""Training loss kernels (pure jnp; differentiable; fixed-shape, mask-driven).

Parity sources in the reference:
  * BPR with multiple softmax-weighted negatives:
      src/models/BaseModel.py:175-189 (GeneralModel.loss)
  * BCE / MSE pointwise CTR losses:  src/models/BaseModel.py:262-274
  * Listwise impression losses (BPR between/after/before/simple + hard
    positive mining, listnet, softmaxCE, attention_rank):
      src/models/BaseImpressionModel.py:44-128
  * InfoNCE-style contrastive (ContraRec): src/models/sequential/ContraRec.py

All listwise kernels take fixed-shape padded inputs + masks; fully jittable
(no data-dependent shapes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite stand-in for -inf: keeps softmax grads NaN-free


def masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax over `axis` restricted to mask==True; all-masked rows -> 0."""
    logits = jnp.where(mask, logits, NEG_INF)
    logits = logits - jax.lax.stop_gradient(jnp.max(logits, axis=axis, keepdims=True))
    unnorm = jnp.where(mask, jnp.exp(logits), 0.0)
    denom = jnp.sum(unnorm, axis=axis, keepdims=True)
    return unnorm / jnp.maximum(denom, 1e-12)


def bpr_multi_neg(predictions: jnp.ndarray) -> jnp.ndarray:
    """BPR ranking loss over 1 positive (col 0) + N softmax-weighted negatives.

    loss = -log( clip( sum_j sigmoid(pos - neg_j) * softmax(neg)_j ) )
    Parity: reference src/models/BaseModel.py:175-189 ("Recurrent neural
    networks with top-k gains for session-based recommendations").
    Note: the reference softmax-normalizes over the WHOLE batch's max
    (neg_pred.max() is global); softmax itself is per-row (dim=1), and
    subtracting any constant leaves it unchanged, so per-row max is
    equivalent and numerically safer.
    """
    pos_pred, neg_pred = predictions[:, 0], predictions[:, 1:]
    neg_softmax = jax.nn.softmax(neg_pred, axis=1)
    agg = (jax.nn.sigmoid(pos_pred[:, None] - neg_pred) * neg_softmax).sum(axis=1)
    return -jnp.log(jnp.clip(agg, 1e-8, 1 - 1e-8)).mean()


def bce(predictions: jnp.ndarray, labels: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on probabilities (post-sigmoid), clipped."""
    p = jnp.clip(predictions, eps, 1 - eps)
    y = labels.astype(p.dtype)
    return -(y * jnp.log(p) + (1 - y) * jnp.log(1 - p)).mean()


def mse(predictions: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return ((predictions - labels.astype(predictions.dtype)) ** 2).mean()


def softplus(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.softplus(x)


# ---------------------------------------------------------------------------
# Listwise impression losses
# ---------------------------------------------------------------------------


def impression_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    train_max_pos: int,
    loss_n: str = "BPR",
) -> jnp.ndarray:
    """Dispatch over the four listwise loss families.

    prediction: [B, P+N] scores, columns [0:P) positives, [P:) negatives.
    target: [B, P+N] with +1 valid positive, 0 valid negative, -1 pad
            (built by ImpressionRunner.fit, reference ImpressionRunner.py:
             187-190).
    Parity: reference src/models/BaseImpressionModel.py:44-128.
    """
    if "BPR" in loss_n:
        return _impression_bpr(prediction, target, train_max_pos, loss_n)
    elif loss_n == "listnet":
        return _impression_listnet(prediction, target, train_max_pos)
    elif loss_n == "softmaxCE":
        return _impression_softmax_ce(prediction, target, train_max_pos)
    elif loss_n == "attention_rank":
        return _impression_attention_rank(prediction, target, train_max_pos)
    raise ValueError("Undefined loss function: {}".format(loss_n))


def _valid_mask(target: jnp.ndarray) -> jnp.ndarray:
    """mask==1 for non-pad entries (reference: where(target==-1)+1)."""
    return (target != -1).astype(jnp.float32)


def _have_neg(target: jnp.ndarray, train_max_pos: int) -> jnp.ndarray:
    """Row weight: 1 if the first negative slot is valid (reference
    `test_have_neg = mask[:, train_max_pos_item]`)."""
    return (target[:, train_max_pos] != -1).astype(jnp.float32)


def _impression_bpr(prediction, target, P, loss_n):
    B, L = prediction.shape
    mask = _valid_mask(target)
    col = jnp.arange(L)
    pos_mask = (col < P).astype(jnp.float32)[None, :]
    neg_mask = (col >= P).astype(jnp.float32)[None, :]
    valid_pair = mask[:, :, None] * mask[:, None, :]
    select_mask = pos_mask[:, :, None] * neg_mask[:, None, :] * valid_pair  # [B,L,L]
    score_diff = prediction[:, :, None] - prediction[:, None, :]
    score_diff_mask = score_diff * select_mask

    neg_valid = (neg_mask * mask) == 1
    neg_softmax = masked_softmax(prediction, neg_valid, axis=1)
    pos_valid = (pos_mask * mask) == 1
    if "hard" in loss_n:
        # higher weight for LOWER-score positives (softmax of -pred);
        # reference uses (pos_pred.min() - pos_pred).softmax -- the global
        # min is a constant shift, equivalent per-row.
        pos_softmax = masked_softmax(-prediction, pos_valid, axis=1)
    else:
        pos_softmax = masked_softmax(prediction, pos_valid, axis=1)

    if "after" in loss_n:
        loss = ((softplus(-score_diff_mask) * neg_softmax[:, None, :]).sum(-1) * pos_softmax).sum(-1)
        return loss.mean()
    elif "before" in loss_n:
        # NB: pos_softmax multiplies INSIDE softplus in the reference, and
        # the sum runs over all columns (zero-weight columns contribute
        # softplus(0)=log 2 each) -- replicated for parity.
        loss = softplus(-(score_diff_mask * neg_softmax[:, None, :]).sum(-1) * pos_softmax).sum(-1)
        return loss.mean()
    elif "simple" in loss_n:
        loss = (softplus(-score_diff_mask) * select_mask).sum(-1).sum(-1)
        # NOTE: the reference returns this un-reduced (a [B] vector), which
        # torch cannot backprop -- a latent bug; we mean-reduce.
        return loss.mean()
    else:  # 'between' (default)
        sig = jnp.where(select_mask == 1, jax.nn.sigmoid(score_diff_mask), 0.0)
        agg = ((sig * neg_softmax[:, None, :]).sum(-1) * pos_softmax).sum(-1)
        return -jnp.log(jnp.maximum(agg, 1e-12)).mean()


def _row_weight(loss_rows: jnp.ndarray, have_neg: jnp.ndarray) -> jnp.ndarray:
    """reference: loss * have_neg / have_neg.sum() * B, then .mean() --
    i.e. mean over rows that have >=1 valid negative."""
    denom = jnp.maximum(have_neg.sum(), 1.0)
    return (loss_rows * have_neg).sum() / denom


def _impression_listnet(prediction, target, P):
    mask = _valid_mask(target)
    have_neg = _have_neg(target, P)
    t_soft = masked_softmax(target.astype(jnp.float32), mask == 1, axis=1)
    # NB: the reference does NOT mask predictions before this softmax --
    # pad columns' raw scores stay in the denominator (BaseImpressionModel.py
    # listnet branch); replicated for parity.
    p_soft = jax.nn.softmax(prediction, axis=1)
    p_soft = jnp.where(mask == 1, p_soft, 1.0)  # pads -> log 0
    loss_rows = -(t_soft * jnp.log(jnp.maximum(p_soft, 1e-12))).sum(axis=1)
    return _row_weight(loss_rows, have_neg)


def _impression_softmax_ce(prediction, target, P):
    mask = _valid_mask(target)
    have_neg = _have_neg(target, P)
    pos_len = jnp.maximum((target == 1).sum(axis=1).astype(jnp.float32), 1.0)
    pre_softmax = masked_softmax(prediction, mask == 1, axis=1)
    target_pre = pre_softmax[:, :P]
    target_pre = jnp.where(mask[:, :P] == 1, target_pre, 1.0)
    loss_rows = -jnp.log(jnp.maximum(target_pre, 1e-12)).sum(axis=1) / pos_len
    return _row_weight(loss_rows, have_neg)


def _impression_attention_rank(prediction, target, P):
    mask = _valid_mask(target)
    have_neg = _have_neg(target, P)
    t_soft = masked_softmax(target.astype(jnp.float32), mask == 1, axis=1)
    p_soft = masked_softmax(prediction, mask == 1, axis=1)
    p1 = jnp.where(mask == 1, p_soft, 1.0)
    loss_1 = -(t_soft * jnp.log(jnp.maximum(p1, 1e-12))).sum(axis=1)
    p2 = jnp.where(mask == 1, p_soft, 0.0)
    p2 = jnp.where(p2 != 1.0, p2, 0.0)  # singleton rows contribute 0
    loss_2 = -((1 - t_soft) * jnp.log(jnp.maximum(1 - p2, 1e-12))).sum(axis=1)
    return _row_weight(loss_1 + loss_2, have_neg)


# ---------------------------------------------------------------------------
# Contrastive / representation losses
# ---------------------------------------------------------------------------


def infonce(
    features: jnp.ndarray,
    temperature: float = 1.0,
    same_target_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Context-context contrastive loss over two views (ContraRec CCC).

    features: [B, 2, D] L2-normalizable views.
    same_target_mask: [B, B] bool, True where rows share the target item
    (those count as positives, not negatives).
    Parity: reference src/models/sequential/ContraRec.py:142-195.
    """
    B = features.shape[0]
    feats = features / jnp.maximum(jnp.linalg.norm(features, axis=-1, keepdims=True), 1e-12)
    n_views = feats.shape[1]
    # VIEW-MAJOR concat (reference: cat(unbind(dim=1)) -> [2B, D]); a
    # row-major reshape would interleave views per sample and silently
    # corrupt the positive-mask tiling below
    flat = jnp.concatenate([feats[:, v, :] for v in range(n_views)], axis=0)
    sim = flat @ flat.T / temperature  # [2B, 2B]
    if same_target_mask is None:
        same_target_mask = jnp.eye(B, dtype=bool)
    mask = jnp.tile(same_target_mask, (n_views, n_views))
    logits_mask = ~jnp.eye(B * n_views, dtype=bool)  # drop self-contrast
    mask = mask & logits_mask
    sim = sim - jax.lax.stop_gradient(sim.max(axis=1, keepdims=True))
    exp_sim = jnp.where(logits_mask, jnp.exp(sim), 0.0)
    log_prob = sim - jnp.log(jnp.maximum(exp_sim.sum(axis=1, keepdims=True), 1e-12))
    pos_cnt = jnp.maximum(mask.sum(axis=1), 1)
    mean_log_prob_pos = (jnp.where(mask, log_prob, 0.0)).sum(axis=1) / pos_cnt
    return -mean_log_prob_pos.mean()


def alignment_loss(u: jnp.ndarray, i: jnp.ndarray) -> jnp.ndarray:
    """DirectAU alignment: ||u-i||^2 on normalized embeddings
    (reference src/models/general/DirectAU.py:54-57)."""
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), 1e-12)
    i = i / jnp.maximum(jnp.linalg.norm(i, axis=-1, keepdims=True), 1e-12)
    return ((u - i) ** 2).sum(axis=-1).mean()


def uniformity_loss(x: jnp.ndarray) -> jnp.ndarray:
    """DirectAU uniformity: log mean exp(-2 * pdist^2)
    (reference src/models/general/DirectAU.py:59-62)."""
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    sq = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    n = x.shape[0]
    iu = jnp.triu_indices(n, k=1)
    pd = sq[iu]
    return jnp.log(jnp.maximum(jnp.exp(-2.0 * pd).mean(), 1e-12))


def margin_rank_loss(pos_score: jnp.ndarray, neg_score: jnp.ndarray, margin: float = 1.0) -> jnp.ndarray:
    """TransE-style margin ranking (CFKG/Chorus stage-1,
    reference src/models/general/CFKG.py:70-76)."""
    return jnp.maximum(0.0, margin + neg_score - pos_score).mean()
