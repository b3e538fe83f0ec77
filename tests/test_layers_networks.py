"""Tests for the layer dispatch, likelihoods, and network ELBO.

Mirrors reference test/likelihoods.py (scalar-formula oracle) and
test/networks.py (shape contract over output dims, interop with
deterministic layers), adapted to the sample-axis-first convention.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whvi_tpu.models import (
    CategoricalLikelihood,
    ColumnMatrix,
    Dense,
    GaussianLikelihood,
    HeteroscedasticGaussianLikelihood,
    SquarePow2Matrix,
    StackedMatrix,
    WHVILinear,
    WHVINetwork,
    WHVIRegression,
    cosine,
    mlp_layers,
    relu,
)


def test_whvi_linear_dispatch():
    # reference layers.py:31-38 dispatch semantics
    assert isinstance(WHVILinear(1, 7).matrix, ColumnMatrix)
    assert not WHVILinear(1, 7).matrix.transposed
    assert isinstance(WHVILinear(7, 1).matrix, ColumnMatrix)
    assert WHVILinear(7, 1).matrix.transposed
    assert isinstance(WHVILinear(16, 16).matrix, SquarePow2Matrix)
    assert isinstance(WHVILinear(12, 16).matrix, StackedMatrix)
    assert isinstance(WHVILinear(12, 12).matrix, StackedMatrix)  # not pow2


@pytest.mark.parametrize("n_in,n_out", [(1, 5), (5, 1), (8, 8), (5, 9)])
def test_whvi_linear_shapes_and_bias(n_in, n_out):
    layer = WHVILinear(n_in, n_out, bias=True)
    p = layer.init(jax.random.PRNGKey(0))
    assert "bias" in p
    x = jax.random.normal(jax.random.PRNGKey(1), (4, n_in))
    y = layer.apply(p, x, jax.random.PRNGKey(2))
    assert y.shape == (4, n_out)
    assert float(layer.kl(p)) > 0.0


def test_gaussian_mnll_scalar_oracle():
    # Triple-nested scalar-formula oracle, the reference's
    # test/likelihoods.py:8-56 pattern.
    import math

    lik = GaussianLikelihood(sigma0=0.7)
    p = lik.init()
    S, B, O = 3, 4, 2
    key = jax.random.PRNGKey(3)
    y = jax.random.normal(key, (B, O))
    y_hat = jax.random.normal(jax.random.PRNGKey(4), (S, B, O))
    n = 57
    got = float(lik.mnll(p, y, y_hat, n))
    sigma = float(jax.nn.softplus(p["rho"]))
    total = 0.0
    for s in range(S):
        for b in range(B):
            for o in range(O):
                z = (float(y[b, o]) - float(y_hat[s, b, o])) / sigma
                total += -0.5 * z * z - 0.5 * math.log(2 * math.pi) - math.log(sigma)
    expect = -n / (S * B) * total
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_gaussian_sigma_positive():
    # softplus constraint (fixes reference likelihoods.py:16 raw param)
    lik = GaussianLikelihood(sigma0=1.0)
    p = {"rho": jnp.asarray(-20.0)}
    assert float(lik.sigma(p)) > 0.0
    p0 = lik.init()
    np.testing.assert_allclose(float(lik.sigma(p0)), 1.0, rtol=1e-5)


def test_heteroscedastic_mnll_matches_manual():
    lik = HeteroscedasticGaussianLikelihood(sigma_min=0.0)
    S, B, O = 2, 3, 1
    y = jax.random.normal(jax.random.PRNGKey(5), (B, O))
    y_hat = jax.random.normal(jax.random.PRNGKey(6), (S, B, 2 * O))
    n = 10
    got = float(lik.mnll({}, y, y_hat, n))
    mean = np.asarray(y_hat)[..., :O]
    # sigma = softplus(raw + shift), shift = inv_softplus(sigma0 - sigma_min)
    shift = np.log(np.expm1(1.0))
    sigma = np.log1p(np.exp(np.asarray(y_hat)[..., O:] + shift))
    z = (np.asarray(y)[None] - mean) / sigma
    lp = -0.5 * z**2 - 0.5 * np.log(2 * np.pi) - np.log(sigma)
    expect = -n / (S * B) * lp.sum()
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_heteroscedastic_sigma0_sets_init_scale():
    # With the head emitting raw_sigma == 0 (the WHVI-layer init regime),
    # the noise stddev must come out ~= sigma0 for any sigma0.
    for sigma0 in (0.1, 0.3, 1.0):
        lik = HeteroscedasticGaussianLikelihood(sigma0=sigma0)
        y_hat = jnp.zeros((1, 2, 2))
        _, sigma = lik.split(y_hat)
        np.testing.assert_allclose(
            np.asarray(sigma), sigma0, rtol=1e-4, atol=1e-4
        )


def test_categorical_mnll_matches_manual():
    lik = CategoricalLikelihood()
    S, B, C = 2, 5, 3
    y = jnp.array([0, 2, 1, 1, 0])
    logits = jax.random.normal(jax.random.PRNGKey(7), (S, B, C))
    n = 20
    got = float(lik.mnll({}, y, logits, n))
    lp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    total = sum(lp[s, b, int(y[b])] for s in range(S) for b in range(B))
    np.testing.assert_allclose(got, -n / (S * B) * total, rtol=1e-4)


def test_predictive_mnll_logmeanexp_oracle():
    # Posterior-predictive MNLL (the original paper's UCI metric):
    # -mean_b log (1/S) sum_s p(y_b | f_s) — scalar oracle per likelihood.
    S, B, O = 4, 3, 2
    y = jax.random.normal(jax.random.PRNGKey(11), (B, O))
    y_hat = jax.random.normal(jax.random.PRNGKey(12), (S, B, O))

    lik = GaussianLikelihood(sigma0=0.9)
    p = lik.init()
    lp = np.asarray(lik.log_prob(p, y, y_hat))  # (S, B)
    assert lp.shape == (S, B)
    sigma = float(jax.nn.softplus(p["rho"]))
    z = (np.asarray(y)[None] - np.asarray(y_hat)) / sigma
    lp_manual = (-0.5 * z**2 - 0.5 * np.log(2 * np.pi) - np.log(sigma)).sum(-1)
    np.testing.assert_allclose(lp, lp_manual, rtol=1e-4)
    # logmeanexp against a direct density-average oracle
    pred = -np.mean(np.log(np.mean(np.exp(lp_manual), axis=0)))
    got = -np.mean(
        np.asarray(
            jax.scipy.special.logsumexp(jnp.asarray(lp), axis=0) - jnp.log(S)
        )
    )
    np.testing.assert_allclose(got, pred, rtol=1e-4)

    cat = CategoricalLikelihood()
    yc = jnp.array([0, 2, 1])
    logits = jax.random.normal(jax.random.PRNGKey(13), (S, B, 3))
    lpc = np.asarray(cat.log_prob({}, yc, logits))
    lsm = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    expect = np.stack(
        [[lsm[s, b, int(yc[b])] for b in range(B)] for s in range(S)]
    )
    np.testing.assert_allclose(lpc, expect, rtol=1e-5)


def test_eval_metrics_includes_predictive_mnll():
    net = WHVIRegression(
        [WHVILinear(4, 8), relu, WHVILinear(8, 1)], eval_samples=5
    )
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (6, 4))
    y = jax.random.normal(jax.random.PRNGKey(2), (6, 1))
    m = net.eval_metrics(params, jax.random.PRNGKey(3), x, y)
    assert "pred_mnll_per_point" in m
    # Jensen: predictive MNLL <= mean-of-log MNLL per point
    assert float(m["pred_mnll_per_point"]) <= float(m["mnll_per_point"]) + 1e-5


def test_parallel_layer_concat_and_kl():
    from whvi_tpu.models import Parallel

    b0 = WHVILinear(8, 1, lambda_=1e-5)
    b1 = WHVILinear(8, 1, lambda_=1.0)
    par = Parallel((b0, b1))
    key = jax.random.PRNGKey(0)
    p = par.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 8))
    y = par.apply(p, x, jax.random.PRNGKey(2))
    assert y.shape == (5, 2)
    # concat order is branch order, each branch applied with its own key
    k0, k1 = jax.random.split(jax.random.PRNGKey(2), 2)
    np.testing.assert_allclose(
        np.asarray(y[:, :1]),
        np.asarray(b0.apply(p["branches"][0], x, k0)),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(y[:, 1:]),
        np.asarray(b1.apply(p["branches"][1], x, k1)),
        rtol=1e-6,
    )
    # kl sums branch KLs
    np.testing.assert_allclose(
        float(par.kl(p)),
        float(b0.kl(p["branches"][0])) + float(b1.kl(p["branches"][1])),
        rtol=1e-6,
    )


def test_split_head_heteroscedastic_network_trains():
    # WHVINetwork with a Parallel [mean, raw_sigma] split-prior head +
    # heteroscedastic likelihood: full loss/grad path must work.
    from whvi_tpu.models import Parallel

    net = WHVIRegression(
        [
            WHVILinear(4, 8, lambda_=3.0),
            relu,
            Parallel(
                (WHVILinear(8, 1, lambda_=1e-5), WHVILinear(8, 1, lambda_=1.0))
            ),
        ],
        train_samples=2,
    )
    net = dataclasses.replace(
        net, likelihood=HeteroscedasticGaussianLikelihood(sigma0=0.3)
    )
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (16, 4))
    y = jax.random.normal(jax.random.PRNGKey(2), (16, 1))
    loss, grads = jax.value_and_grad(
        lambda p: net.loss(p, jax.random.PRNGKey(3), x, y, n=16)[0]
    )(params)
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)
    )
    assert gnorm > 0.0


def test_coverage95_calibrated_gaussian():
    # A perfectly specified predictive — y drawn from N(mean, sigma)
    # with the likelihood's (mean, sd) moments — must cover ~95%.
    sigma = 0.7
    lik = GaussianLikelihood(sigma0=sigma)
    net = WHVIRegression([Dense(2, 1)])
    net = dataclasses.replace(net, likelihood=lik)
    B = 4000
    mean = jax.random.normal(jax.random.PRNGKey(0), (B, 1))
    y_hat = mean[None]  # S=1: predictive sd == likelihood sigma
    y = mean + sigma * jax.random.normal(jax.random.PRNGKey(1), (B, 1))
    params = {"likelihood": lik.init()}
    m = net.metrics_from_predictions(params, y, y_hat)
    assert 0.93 < float(m["coverage95"]) < 0.97
    # heteroscedastic variant: sigma emitted per point via the raw head
    hlik = HeteroscedasticGaussianLikelihood(sigma_min=0.0, sigma0=1.0)
    hnet = dataclasses.replace(net, likelihood=hlik)
    sig_pp = 0.2 + 0.8 * jax.random.uniform(jax.random.PRNGKey(2), (B, 1))
    shift = float(np.log(np.expm1(1.0)))
    raw = jnp.log(jnp.expm1(sig_pp)) - shift  # softplus(raw+shift)=sig_pp
    y_hat_h = jnp.concatenate([mean, raw], axis=-1)[None]
    y_h = mean + sig_pp * jax.random.normal(jax.random.PRNGKey(3), (B, 1))
    mh = hnet.metrics_from_predictions({"likelihood": {}}, y_h, y_hat_h)
    assert 0.93 < float(mh["coverage95"]) < 0.97


@pytest.mark.parametrize("k", [1, 3])
def test_network_shape_contract(k):
    # reference test/networks.py:11-23: output (B, k, S); ours is (S, B, k).
    # Also mixes a deterministic Dense with WHVI layers for interop.
    net = WHVIRegression(
        [
            Dense(3, 8),
            relu,
            WHVILinear(8, 8),
            relu,
            WHVILinear(8, k),
        ],
        train_samples=2,
        eval_samples=5,
    )
    params = net.init(jax.random.PRNGKey(8))
    x = jax.random.normal(jax.random.PRNGKey(9), (50, 3))
    y_train = net.predict(params, x, jax.random.PRNGKey(10), net.train_samples)
    assert y_train.shape == (2, 50, k)
    y_eval = net.predict(params, x, jax.random.PRNGKey(11), net.eval_samples)
    assert y_eval.shape == (5, 50, k)


def test_network_kl_sums_only_bayesian_layers():
    net = WHVIRegression([Dense(3, 8), relu, WHVILinear(8, 4)])
    params = net.init(jax.random.PRNGKey(12))
    kl_total = float(net.kl(params))
    layer = net.layers[2]
    kl_whvi = float(layer.kl(params["layers"][2]))
    np.testing.assert_allclose(kl_total, kl_whvi, rtol=1e-6)


def test_loss_ignore_kl():
    net = WHVIRegression([WHVILinear(4, 4)], train_samples=2)
    params = net.init(jax.random.PRNGKey(13))
    x = jax.random.normal(jax.random.PRNGKey(14), (6, 4))
    y = jax.random.normal(jax.random.PRNGKey(15), (6, 4))
    key = jax.random.PRNGKey(16)
    loss_full, aux = net.loss(params, key, x, y, n=6)
    loss_nokl, aux2 = net.loss(params, key, x, y, n=6, ignore_kl=True)
    np.testing.assert_allclose(
        float(loss_full), float(aux["mnll"]) + float(aux["kl"]), rtol=1e-5
    )
    np.testing.assert_allclose(float(loss_nokl), float(aux2["mnll"]), rtol=1e-5)
    assert float(aux["kl"]) > 0


def test_network_is_jittable_and_deterministic():
    net = WHVIRegression([WHVILinear(3, 8), cosine, WHVILinear(8, 1)])
    params = net.init(jax.random.PRNGKey(17))
    x = jax.random.normal(jax.random.PRNGKey(18), (10, 3))
    y = jax.random.normal(jax.random.PRNGKey(19), (10, 1))

    @jax.jit
    def loss_fn(p, k):
        return net.loss(p, k, x, y, n=10)[0]

    k = jax.random.PRNGKey(20)
    l1 = float(loss_fn(params, k))
    l2 = float(loss_fn(params, k))
    assert l1 == l2
    assert np.isfinite(l1)


def test_mlp_layers_builder():
    layers = mlp_layers(13, 1, hidden=(128, 128))
    # WHVI(13->128), relu, WHVI(128->128), relu, WHVI(128->1)
    assert len(layers) == 5
    assert layers[0].lambda_ == 3.0
    assert layers[2].lambda_ == 3.0
    assert layers[4].lambda_ == 1e-5
    assert isinstance(layers[2].matrix, SquarePow2Matrix)


def test_toy_param_count():
    # The paper's toy model [WHVILinear(1,128), act, WHVILinear(128,128),
    # act, WHVILinear(128,1)] has 1537 parameters in the reference
    # (report/model-testing.tex:60; paper says 1541).
    from whvi_tpu.models import WHVILinear, cosine

    net = WHVIRegression(
        [WHVILinear(1, 128), cosine, WHVILinear(128, 128), cosine, WHVILinear(128, 1)]
    )
    params = net.init(jax.random.PRNGKey(21))
    leaves = jax.tree.leaves(params["layers"])
    count = sum(int(np.prod(l.shape)) for l in leaves)
    # column(128): 4*128; square(128): 4*128; column_T(128): 4*128 = 1536
    assert count == 1536
    # +1 likelihood sigma parameter = 1537, matching the reference count
    count_all = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(params)
    )
    assert count_all == 1537
