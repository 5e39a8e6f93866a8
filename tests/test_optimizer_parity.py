"""Optimizer-step parity vs torch.

The reference trains with torch.optim.Adam(weight_decay=l2) over two
param groups -- biases excluded from decay (BaseModel.customize_parameters,
src/models/BaseModel.py:64-73). torch Adam's weight_decay adds l2*w to the
GRADIENT before moment accumulation (NOT AdamW's decoupled decay), so our
optax chain must place add_decayed_weights before adam
(runners/base.build_optimizer). These tests run several real steps and
require the resulting parameters to match torch bit-tightly.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rechorus_tpu.runners.base import build_optimizer


def _run_parity(l2, steps=5, lr=1e-2):
    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    ib0 = rng.normal(size=(3,)).astype(np.float32)  # bias-NAMED table row
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8, 3)).astype(np.float32)

    # torch side: reference grouping (`'bias' in name` -> no decay,
    # BaseModel.py:63-72) -- catches both Dense biases and bias-named
    # tables like item_bias.weight
    wt = torch.nn.Parameter(torch.tensor(w0))
    bt = torch.nn.Parameter(torch.tensor(b0))
    ibt = torch.nn.Parameter(torch.tensor(ib0))
    opt = torch.optim.Adam(
        [{"params": [wt], "weight_decay": l2},
         {"params": [bt, ibt], "weight_decay": 0.0}], lr=lr)
    xt, yt = torch.tensor(x), torch.tensor(y)
    for _ in range(steps):
        opt.zero_grad()
        ((xt @ wt + bt + ibt - yt) ** 2).mean().backward()
        opt.step()

    # ours: same param tree through build_optimizer; 'item_bias' is a
    # non-leaf-'bias' path that must still be exempt from decay
    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)},
              "item_bias": {"embedding": jnp.asarray(ib0)}}
    tx = build_optimizer("Adam", lr, l2)
    opt_state = tx.init(params)

    def loss_fn(p):
        out = x @ p["dense"]["kernel"] + p["dense"]["bias"] + p["item_bias"]["embedding"]
        return ((out - y) ** 2).mean()

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["dense"]["kernel"]), wt.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["dense"]["bias"]), bt.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["item_bias"]["embedding"]), ibt.detach().numpy(), atol=1e-6)


def test_adam_step_parity_no_decay():
    _run_parity(l2=0.0)


def test_adam_step_parity_with_l2():
    """l2 > 0: decay enters the gradient before moments (torch Adam
    weight_decay semantics), biases excluded."""
    _run_parity(l2=0.1)


@pytest.mark.parametrize("l2", [0.0, 0.1])
def test_adamw_step_parity(l2):
    """--optimizer AdamW: decoupled decay = --l2 with the bias exemption
    (regression: optax.adamw's DEFAULT weight_decay=1e-4 on all params
    used to apply because l2 was never forwarded)."""
    steps, lr = 5, 1e-2
    rng = np.random.default_rng(1)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    b0 = rng.normal(size=(3,)).astype(np.float32)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8, 3)).astype(np.float32)

    wt = torch.nn.Parameter(torch.tensor(w0))
    bt = torch.nn.Parameter(torch.tensor(b0))
    opt = torch.optim.AdamW(
        [{"params": [wt], "weight_decay": l2},
         {"params": [bt], "weight_decay": 0.0}], lr=lr)
    xt, yt = torch.tensor(x), torch.tensor(y)
    for _ in range(steps):
        opt.zero_grad()
        ((xt @ wt + bt - yt) ** 2).mean().backward()
        opt.step()

    params = {"dense": {"kernel": jnp.asarray(w0), "bias": jnp.asarray(b0)}}
    tx = build_optimizer("AdamW", lr, l2)
    opt_state = tx.init(params)

    def loss_fn(p):
        return ((x @ p["dense"]["kernel"] + p["dense"]["bias"] - y) ** 2).mean()

    for _ in range(steps):
        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

    np.testing.assert_allclose(
        np.asarray(params["dense"]["kernel"]), wt.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["dense"]["bias"]), bt.detach().numpy(), atol=1e-6)
