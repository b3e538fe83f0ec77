"""Mesh-sharding tests on the 8-virtual-device CPU backend.

The reference has zero distributed tests (SURVEY.md section 4); this is
the JAX fake-backend pattern it lacked: real meshes, real psum
collectives, no TPU slice needed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.models import WHVILinear, WHVIRegression, relu
from whvi_tpu.parallel import make_mesh, make_sharded_train_step, sharded_loss_fn
from whvi_tpu.train import TrainConfig, Trainer, decayed_adam


def _net(train_samples=4):
    return WHVIRegression(
        [WHVILinear(4, 8, lambda_=1.0), relu, WHVILinear(8, 1)],
        train_samples=train_samples,
        eval_samples=8,
    )


def _data(n=32, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.randn(n, 4).astype(np.float32)
    y = (X.sum(axis=1, keepdims=True) + 0.1 * rng.randn(n, 1)).astype(
        np.float32
    )
    return X, y


def test_make_mesh_shapes():
    mesh = make_mesh(data=2, sample=4)
    assert mesh.shape == {"data": 2, "sample": 4}
    with pytest.raises(ValueError):
        make_mesh(data=4, sample=4)  # only 8 devices


@pytest.mark.parametrize("data,sample", [(1, 8), (2, 4), (8, 1), (1, 1)])
def test_sharded_loss_matches_single_device(data, sample):
    # The psum-reduced sharded estimator must equal the single-device
    # estimator exactly (same keys, same math, different partitioning).
    net = _net()
    X, y = _data(n=32)
    params = net.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    S = 8

    mesh = make_mesh(data=data, sample=sample)
    loss_fn = sharded_loss_fn(net, mesh, n_samples=S)
    loss_sharded, aux = jax.jit(loss_fn)(
        params, key, jnp.asarray(X), jnp.asarray(y), 32
    )

    loss_ref, aux_ref = net.loss(
        params, key, jnp.asarray(X), jnp.asarray(y), n=32, n_samples=S
    )
    np.testing.assert_allclose(
        float(loss_sharded), float(loss_ref), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(aux["mnll"]), float(aux_ref["mnll"]), rtol=2e-5
    )


def test_sharded_train_step_runs_and_learns():
    net = _net()
    X, y = _data(n=32)
    mesh = make_mesh(data=2, sample=4)
    tx = decayed_adam()
    step, shard_state, shard_batch = make_sharded_train_step(
        net, tx, mesh, n_samples=4
    )
    trainer = Trainer(net)
    state = shard_state(trainer.init(jax.random.PRNGKey(2)))
    xb, yb = shard_batch(X, y)
    losses = []
    for _ in range(30):
        state, metrics = step(state, xb, yb, 32)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 30


def test_sharded_grads_match_single_device():
    # Gradient reduction through psum must reproduce single-device grads.
    net = _net()
    X, y = _data(n=16)
    params = net.init(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(4)
    S = 4

    mesh = make_mesh(data=2, sample=2)
    loss_fn = sharded_loss_fn(net, mesh, n_samples=S)
    g_sharded = jax.jit(
        jax.grad(lambda p: loss_fn(p, key, jnp.asarray(X), jnp.asarray(y), 16)[0])
    )(params)
    g_ref = jax.grad(
        lambda p: net.loss(
            p, key, jnp.asarray(X), jnp.asarray(y), n=16, n_samples=S
        )[0]
    )(params)
    for a, b in zip(jax.tree.leaves(g_sharded), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5
        )


def test_scan_steps_matches_repeated_steps():
    # step.scan(k) must equal k sequential step() calls exactly
    net = _net()
    X, y = _data(n=16)
    mesh = make_mesh(data=2, sample=2)
    tx = decayed_adam()
    step, shard_state, shard_batch = make_sharded_train_step(
        net, tx, mesh, n_samples=4
    )
    trainer = Trainer(net)
    s_a = shard_state(trainer.init(jax.random.PRNGKey(5)))
    s_b = shard_state(trainer.init(jax.random.PRNGKey(5)))
    xb, yb = shard_batch(X, y)
    for _ in range(4):
        s_a, m_a = step(s_a, xb, yb, 16)
    s_b, m_b = step.scan(s_b, xb, yb, 16, 4)
    np.testing.assert_allclose(
        float(m_a["loss"]), float(m_b["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
