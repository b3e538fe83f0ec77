"""Golden-sampler validation study: VI vs HMC/NUTS vs exact posterior.

Round-2 deliverable (VERDICT.md missing #3/#4), extended in rounds 4-5.

Tiers:

1. **Analytic tier** — a single square WHVI layer is LINEAR in ``g``:
   ``y = W(g) x = diag(s1) H diag(g) H (s2 * x) = M(x) g`` with
   ``M(x) = diag(s1) H diag(H (s2*x))``. With a Gaussian likelihood and
   the ``N(0, lambda I)`` prior, the posterior over g is an EXACT
   multivariate Gaussian: ``Lambda = X^T X-style normal equations``.
   This gives three ground truths at once:
     - NUTS moments must match the exact posterior (sampler correctness);
     - the mean-field VI optimum is known in closed form for a Gaussian
       target: q matches the exact MEAN, and its variances are the
       inverse precision DIAGONAL, ``1/Lambda_ii`` — an UNDERestimate of
       the exact marginal variance ``(Lambda^-1)_ii`` whenever the
       posterior is correlated. The trained VI must land on THAT, which
       turns the round-1 "2-3x sd mismatch" from an anomaly into a
       measured, theory-matched property of mean-field WHVI.
2. **Nonlinear tier** — small WHVI MLP on a yacht subset (or synthetic
   fallback): 4-chain NUTS over the per-layer g posterior with R-hat /
   ESS / divergence gates, the per-layer VI-vs-NUTS moment table, AND
   (round 5) the symmetry-invariant FUNCTION-SPACE comparison:
   posterior-predictive RMSE / MNLL on held-out rows computed from NUTS
   draws (mode-local and over-dispersed starts) vs from VI draws.
   Parameter-space moments of a ReLU posterior are corrupted by its
   sign/permutation symmetries (measured mode-local mu_corr ~ 0.16);
   the predictive is the quantity both inference engines actually claim
   to get right, and it is invariant under those symmetries — the
   over-dispersed-start NUTS row lands in DIFFERENT symmetry modes yet
   must produce the same predictive.
3. **Mixed-lambda study** — the flagship prior mix {3, 1e-5} (~550x
   prior-scale ratio), SELF-DOCUMENTING (round-5 VERDICT weak #5): one
   run emits BOTH the 8000-epoch row (mass adaptation passes all gates)
   and the 12000-epoch row (the measured limitation: the over-trained
   posterior defeats identity AND adapted metrics, ESS ~ 2), plus a
   parallel-tempering arm on the failing posterior (mcmc.tempering) —
   the standard escape for the mode-structure diagnosis, with swap-rate
   evidence either way.

Run:  python experiments/run_vi_vs_hmc.py [--cpu] [--out results.json]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _maybe_force_cpu():
    if "--cpu" in sys.argv:
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from whvi_tpu.mcmc import (
    NUTSConfig,
    ess,
    make_whvi_g_log_posterior,
    nuts_sample_chains,
    split_rhat,
)
from whvi_tpu.models import (
    GaussianLikelihood,
    SquarePow2Matrix,
    WHVILinear,
    WHVINetwork,
    WHVIRegression,
    mlp_layers,
    relu,
)
from whvi_tpu.ops.hadamard import build_H, kl_diag_normal


# ------------------------------------------------------------ analytic tier


def analytic_tier(D=16, n=48, sigma=0.1, lam=1.0, seed=0, n_vi_steps=4000):
    """Exact Gaussian posterior vs NUTS vs trained mean-field VI.

    Every matmul here runs at ``Precision.HIGHEST`` (true fp32 on the
    MXU): this tier is an exactness ORACLE, and the TPU's default
    bf16-operand einsum corrupts exactly the thing it checks — measured
    round 5: the default-precision log density left NUTS at R-hat 22 /
    ESS 2 on the v5e while the identical tier passed on CPU; at HIGHEST
    all gates pass on both backends (same repo convention as the f64
    CPU oracles: correctness paths pin their precision).
    """
    HI = jax.lax.Precision.HIGHEST
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    layer = SquarePow2Matrix(D, lambda_=lam, s_init="auto")
    p0 = layer.init(k1)
    s1, s2 = p0["s1"], p0["s2"]
    X = jax.random.normal(k2, (n, D))
    g_true = jax.random.normal(k3, (D,)) * jnp.sqrt(lam)
    H = build_H(D)

    def design(x):  # M(x): y = M(x) g
        return s1[:, None] * H * jnp.matmul(
            H, s2 * x, precision=HI
        )[None, :]

    M = jax.vmap(design)(X)  # (n, D, D)
    y = jnp.einsum("nij,j->ni", M, g_true, precision=HI)
    y = y + sigma * jax.random.normal(k4, y.shape)

    # exact Gaussian posterior over g
    Lam = jnp.eye(D) / lam + jnp.einsum(
        "nij,nik->jk", M, M, precision=HI
    ) / sigma**2
    Sigma = jnp.linalg.inv(Lam)  # 16x16 LU (f32 kernel, not MXU-rounded)
    mu = jnp.matmul(
        Sigma,
        jnp.einsum("nij,ni->j", M, y, precision=HI) / sigma**2,
        precision=HI,
    )
    exact_sd = jnp.sqrt(jnp.diag(Sigma))
    # the mean-field optimum against a Gaussian: same mean, variances =
    # inverse precision DIAGONAL (Bishop 10.1.2)
    mf_sd = 1.0 / jnp.sqrt(jnp.diag(Lam))

    # --- NUTS on the exact target
    def logp(q):
        g = q["g"]
        r = y - jnp.einsum("nij,j->ni", M, g, precision=HI)
        return (
            -0.5 * jnp.sum(jnp.square(r)) / sigma**2
            - 0.5 * jnp.sum(jnp.square(g)) / lam
        )

    samples, stats = nuts_sample_chains(
        logp,
        {"g": jnp.zeros(D)},
        k5,
        NUTSConfig(n_samples=1000, n_warmup=500, max_tree_depth=6),
        n_chains=4,
    )
    gs = samples["g"]  # (4, 1000, D)
    nuts_mean = jnp.mean(gs, axis=(0, 1))
    nuts_sd = jnp.std(gs, axis=(0, 1))

    # --- mean-field VI trained on the same model (s1, s2, sigma frozen)
    def elbo_loss(qp, key):
        g_sigma = jax.nn.softplus(qp["g_rho"])
        eps = jax.random.normal(key, (8, D))
        g = qp["g_mu"][None] + g_sigma[None] * eps  # (S, D)
        r = y[None] - jnp.einsum("nij,sj->sni", M, g, precision=HI)
        ll = -0.5 * jnp.sum(jnp.square(r), axis=(1, 2)) / sigma**2 - (
            y.size * 0.5 * jnp.log(2 * jnp.pi * sigma**2)
        )
        kl = kl_diag_normal(qp["g_mu"], g_sigma, 0.0, jnp.sqrt(lam))
        return -(jnp.mean(ll) - kl)

    qp = {"g_mu": jnp.zeros(D), "g_rho": jnp.full((D,), -2.5)}
    tx = optax.adam(1e-2)

    import functools

    @functools.partial(jax.jit, static_argnames="steps")
    def vi_fit(qp, key, steps):
        def body(carry, k):
            qp, opt = carry
            loss, grads = jax.value_and_grad(elbo_loss)(qp, k)
            upd, opt = tx.update(grads, opt, qp)
            return (optax.apply_updates(qp, upd), opt), loss

        keys = jax.random.split(key, steps)
        (qp, _), losses = jax.lax.scan(body, (qp, tx.init(qp)), keys)
        return qp, losses

    qp, losses = vi_fit(qp, jax.random.PRNGKey(seed + 1), n_vi_steps)
    vi_mean = qp["g_mu"]
    vi_sd = jax.nn.softplus(qp["g_rho"])

    def corr(a, b):
        a = np.asarray(a) - np.mean(np.asarray(a))
        b = np.asarray(b) - np.mean(np.asarray(b))
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

    rhat = float(jnp.max(split_rhat(gs)))
    n_eff = float(jnp.min(ess(gs)))
    out = {
        "D": D,
        "n": n,
        "nuts": {
            "rhat_max": rhat,
            "ess_min": n_eff,
            "divergences": int(jnp.sum(stats["divergences"])),
            "mean_rmse_vs_exact": float(
                jnp.sqrt(jnp.mean(jnp.square(nuts_mean - mu)))
            ),
            "sd_ratio_vs_exact_mean": float(jnp.mean(nuts_sd / exact_sd)),
        },
        "vi": {
            "mean_corr_vs_exact": corr(vi_mean, mu),
            "mean_rmse_vs_exact": float(
                jnp.sqrt(jnp.mean(jnp.square(vi_mean - mu)))
            ),
            # the two sd comparisons that EXPLAIN the mean-field gap:
            "sd_ratio_vs_exact_marginal": float(jnp.mean(vi_sd / exact_sd)),
            "sd_ratio_vs_meanfield_optimum": float(jnp.mean(vi_sd / mf_sd)),
        },
        # how correlated the exact posterior is (drives the mf gap)
        "exact_meanfield_sd_deficit": float(jnp.mean(mf_sd / exact_sd)),
        "final_elbo": float(-losses[-1]),
    }
    return out


# ------------------------------------------------------------ shared helpers


def _load_subset(seed=0, n_train=64, n_test=0):
    """Yacht subset (synthetic fallback): standardized train rows plus
    ``n_test`` disjoint held-out rows from the same permutation."""
    try:
        from whvi_tpu.data.uci import load_uci

        X_all, y_all = load_uci("yacht")
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(X_all))
        Xf = X_all[idx].astype(np.float32)
        yf = y_all[idx].astype(np.float32)
        yf = yf if yf.ndim > 1 else yf[:, None]
        source = "yacht"
    except Exception:
        rng = np.random.RandomState(seed)
        Xf = rng.randn(n_train + n_test, 6).astype(np.float32)
        yf = np.sin(Xf.sum(1, keepdims=True)).astype(np.float32)
        source = "synthetic"
    X, y = Xf[:n_train], yf[:n_train]
    mu_x, sd_x = X.mean(0), X.std(0) + 1e-8
    mu_y, sd_y = y.mean(0), y.std(0) + 1e-8
    X = (X - mu_x) / sd_x
    y = (y - mu_y) / sd_y
    X_te = (Xf[n_train : n_train + n_test] - mu_x) / sd_x
    y_te = (yf[n_train : n_train + n_test] - mu_y) / sd_y
    return X, y, X_te, y_te, source


def _q_draw_inits(params, bayes_i, n_chains, seed):
    """Per-chain starts drawn from the trained q (mode-local protocol)."""
    k_q = jax.random.split(jax.random.PRNGKey(seed + 11), n_chains)

    def q_draw(k):
        ks = jax.random.split(k, len(bayes_i))
        out = {}
        for kk, i in zip(ks, bayes_i):
            lp = params["layers"][i]
            sd = jax.nn.softplus(lp["g_rho"])
            out[i] = lp["g_mu"] + sd * jax.random.normal(
                kk, lp["g_mu"].shape
            )
        return out

    return jax.tree.map(lambda *xs: jnp.stack(xs), *[q_draw(k) for k in k_q])


def _predictive_from_g_draws(net, params, X_te, y_te, samples, n_use=256):
    """Posterior-predictive metrics on held-out rows from MCMC g draws.

    ``samples``: dict {layer_index: (C, N, *g_shape)}. Thins the pooled
    chain draws to ``n_use`` evenly spaced g's, runs the deterministic
    forward (apply_given_g, all other params frozen) for each, and
    scores with the same ``metrics_from_predictions`` the VI eval uses —
    so the two predictives are computed by ONE code path. Every metric
    here is invariant under the posterior's sign/permutation symmetries
    (it only consumes function values), unlike parameter-space moments.
    """
    bayes_i = sorted(samples.keys())
    flat = {
        i: np.asarray(samples[i]).reshape(
            (-1,) + tuple(np.asarray(samples[i]).shape[2:])
        )
        for i in bayes_i
    }
    total = flat[bayes_i[0]].shape[0]
    sel = np.linspace(0, total - 1, min(n_use, total)).astype(int)
    g_stack = {i: jnp.asarray(flat[i][sel]) for i in bayes_i}
    X_te = jnp.asarray(X_te)

    def fwd(gdict):
        h = X_te
        for i, layer in enumerate(net.layers):
            p = params["layers"][i]
            if i in samples:
                h = layer.apply_given_g(p, h, gdict[i])
            else:
                h = layer.apply(p, h, jax.random.PRNGKey(0))
        return h

    y_hat = jax.jit(jax.vmap(fwd))(g_stack)  # (S, B, out)
    m = net.metrics_from_predictions(params, jnp.asarray(y_te), y_hat)
    return {k: float(v) for k, v in m.items()}


def _vi_predictive(net, params, X_te, y_te, seed, n_samples=256):
    """The same held-out metrics from VI posterior draws (one shared
    metric code path with `_predictive_from_g_draws`)."""
    y_hat = jax.jit(
        lambda p, x, k: net.predict(p, x, k, n_samples)
    )(params, jnp.asarray(X_te), jax.random.PRNGKey(seed + 29))
    m = net.metrics_from_predictions(params, jnp.asarray(y_te), y_hat)
    return {k: float(v) for k, v in m.items()}


# ----------------------------------------------------------- nonlinear tier


def nonlinear_tier(
    seed=0, n_train=64, epochs=20000, n_test=100, n_nuts=1500,
    tree_depth=9,
):
    """Small WHVI MLP: train VI, then 4-chain NUTS over the g posterior.

    Two NUTS arms — mode-local (chains started at q draws) and
    over-dispersed (jittered starts, which provably land in different
    sign/permutation modes of the ReLU posterior) — and for each arm
    the FUNCTION-SPACE comparison against VI: posterior-predictive
    RMSE/MNLL on ``n_test`` held-out rows (round-5 VERDICT item #1).
    """
    from whvi_tpu.train import TrainConfig, Trainer

    X, y, X_te, y_te, source = _load_subset(seed, n_train, n_test)

    # bias + per-example noise + warmup: the recipe that avoids the
    # posterior-collapse local optimum (see the yacht study in
    # docs/RESULTS.md; without it the ELBO parks at posterior == prior
    # with sigma -> data sd, and the VI-vs-NUTS comparison is vacuous)
    import dataclasses as _dc

    def _lin(a, b):
        return WHVILinear(
            a, b, lambda_=1.0, s_init="auto", bias=True,
            per_example_noise=True,
        )

    # deliberately SMALL: one hidden layer, 16 total g dims. Deeper
    # models have posterior geometry (funnels + symmetry modes) that HMC
    # cannot traverse reliably even mode-locally (measured: 500+
    # divergences, ESS ~ 3 on a 48-dim 2-hidden-layer posterior); the
    # quantitative VI-vs-sampler verdict needs a target the sampler
    # provably handles — the gates below enforce that.
    net = WHVIRegression(
        [_lin(6, 8), relu, _lin(8, 1)],
        sigma0=0.3,
        train_samples=4,
    )
    # Freeze the likelihood noise at sigma0 for the WHOLE run (all
    # epochs in phase 1): letting sigma shrink to the ~0.02 the yacht
    # subset supports makes the g posterior so sharp that NUTS chains
    # cannot move (measured ESS -> 2); with sigma fixed at 0.2 the
    # target is well-conditioned and the VI and NUTS see the SAME
    # posterior, which is all the validation needs.
    cfg = TrainConfig(
        epochs1=epochs,
        epochs2=0,
        epochs_per_call=2000,
        batch_size=64,
        kl_warmup_steps=(epochs * 3) // 10,
    )
    tr = Trainer(net, cfg)
    state = tr.init(jax.random.PRNGKey(seed))
    state, logs = tr.fit(state, X, y)
    params = state.params

    logp, init = make_whvi_g_log_posterior(net, params, X, y)
    # The g posterior of a deep ReLU WHVI net is MULTIMODAL (sign/permutation
    # symmetries): over-dispersed chain starts land in different modes and
    # split-R-hat correctly explodes (measured ~1e5). Mean-field q can only
    # ever cover one mode, so the meaningful validation is MODE-LOCAL:
    # start every chain at an independent draw from the trained q and
    # check that the chains agree with each other (within-mode R-hat/ESS)
    # and with q's moments. This is the standard practice for BNN
    # posterior comparisons.
    n_chains = 4
    bayes_i = sorted(init.keys())
    inits = _q_draw_inits(params, bayes_i, n_chains, seed)
    nuts_cfg = NUTSConfig(
        n_samples=n_nuts,
        n_warmup=n_nuts,
        max_tree_depth=tree_depth,
        target_accept=0.95,
    )
    samples, stats = nuts_sample_chains(
        logp,
        init,
        jax.random.PRNGKey(seed + 7),
        nuts_cfg,
        n_chains=n_chains,
        inits=inits,
    )

    per_layer = {}
    bayes = [i for i, l in enumerate(net.layers) if hasattr(l, "matrix")]
    for i in bayes:
        gs = samples[i]  # (C, N, *g_shape)
        lp = params["layers"][i]
        vi_mu = np.asarray(lp["g_mu"]).ravel()
        vi_sd = np.asarray(jax.nn.softplus(lp["g_rho"])).ravel()
        hmc_mu = np.asarray(jnp.mean(gs, axis=(0, 1))).ravel()
        hmc_sd = np.asarray(jnp.std(gs, axis=(0, 1))).ravel()
        a = vi_mu - vi_mu.mean()
        b = hmc_mu - hmc_mu.mean()
        per_layer[f"layer{i}"] = {
            "dim": int(vi_mu.size),
            "rhat_max": float(jnp.max(split_rhat(gs))),
            "ess_min": float(jnp.min(ess(gs))),
            "mu_corr": float(
                a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            ),
            "mu_rmse": float(np.sqrt(np.mean((vi_mu - hmc_mu) ** 2))),
            "sd_ratio_vi_over_hmc": float(np.mean(vi_sd / (hmc_sd + 1e-12))),
            "vi_sd_mean": float(vi_sd.mean()),
            "hmc_sd_mean": float(hmc_sd.mean()),
        }

    out = {
        "source": source,
        "scope": "mode-local (chains initialized from q draws; "
        "over-dispersed starts provably land in symmetry-equivalent "
        "modes of the ReLU posterior)",
        "n_train": n_train,
        "final_train_loss": logs[-1]["loss"],
        "noise_sigma": float(
            jax.nn.softplus(params["likelihood"]["rho"])
        ),
        "divergences": int(jnp.sum(stats["divergences"])),
        "per_layer": per_layer,
    }

    # ---- function space (round-5 VERDICT #1): the symmetry-invariant
    # comparison. Parameter moments of a ReLU posterior are corrupted by
    # sign/permutation symmetry; the posterior predictive is not — so
    # RMSE/MNLL on held-out rows, computed from NUTS draws vs VI draws
    # through ONE metric code path, is the end-to-end validation.
    if n_test:
        vi_pred = _vi_predictive(net, params, X_te, y_te, seed)
        nuts_pred = _predictive_from_g_draws(
            net, params, X_te, y_te, samples
        )
        # over-dispersed arm: jittered starts land in DIFFERENT symmetry
        # modes (param-space R-hat explodes by design — recorded, not
        # gated); its predictive must nevertheless match the mode-local
        # one, which is the measurable meaning of "symmetry-invariant".
        samples_od, stats_od = nuts_sample_chains(
            logp,
            init,
            jax.random.PRNGKey(seed + 17),
            nuts_cfg,
            n_chains=n_chains,
            jitter=1.0,
        )
        nuts_od_pred = _predictive_from_g_draws(
            net, params, X_te, y_te, samples_od
        )
        od_rhat = float(
            max(jnp.max(split_rhat(samples_od[i])) for i in bayes_i)
        )
        out["function_space"] = {
            "n_test": int(len(np.asarray(y_te))),
            "vi": vi_pred,
            "nuts_mode_local": nuts_pred,
            "nuts_overdispersed": nuts_od_pred,
            "overdispersed_param_rhat_max": od_rhat,
            "overdispersed_divergences": int(
                jnp.sum(stats_od["divergences"])
            ),
            "note": "param-space R-hat of the over-dispersed arm is "
            "EXPECTED to explode (chains sit in different symmetry "
            "modes); the predictive rows must agree anyway",
        }
    return out


# --------------------------------------------------------- mixed-lambda tier


def _train_mixed_posterior(seed=0, n_train=64, epochs=8000):
    """Train the flagship-prior-mix net and freeze its g posterior.

    Returned context is shared by the NUTS arms and the tempering arm
    so every sampler sees the IDENTICAL posterior."""
    from whvi_tpu.train import TrainConfig, Trainer

    X, y, _, _, source = _load_subset(seed, n_train, 0)

    def _lin(a, b, lam):
        return WHVILinear(
            a, b, lambda_=lam, s_init="auto", bias=True,
            per_example_noise=True,
        )

    # the flagship UCI prior mix (reference evaluation.py:79-85)
    net = WHVIRegression(
        [_lin(6, 8, 3.0), relu, _lin(8, 1, 1e-5)],
        sigma0=0.3,
        train_samples=4,
    )
    cfg = TrainConfig(
        epochs1=epochs,
        epochs2=0,
        epochs_per_call=2000,
        batch_size=64,
        kl_warmup_steps=(epochs * 3) // 10,
    )
    tr = Trainer(net, cfg)
    state = tr.init(jax.random.PRNGKey(seed))
    state, logs = tr.fit(state, X, y)
    params = state.params
    logp, init = make_whvi_g_log_posterior(net, params, X, y)
    bayes_i = sorted(init.keys())
    return dict(
        net=net,
        params=params,
        source=source,
        epochs=epochs,
        n_train=n_train,
        seed=seed,
        logp=logp,
        init=init,
        bayes_i=bayes_i,
        inits=_q_draw_inits(params, bayes_i, 4, seed),
    )


def mixed_lambda_tier(
    seed=0, n_train=64, epochs=8000, n_draws=800, tree_depth=6,
    dense_mass=False, ctx=None,
):
    """Before/after demonstration of the mass-matrix adaptation on the
    FLAGSHIP prior mix: hidden layer lambda = 3, output layer
    lambda = 1e-5 — prior stddevs sqrt(3) vs sqrt(1e-5), a ~550x scale
    ratio inside one posterior. The identity-mass sampler tunes its step
    to the tight output-layer coordinates and random-walks the hidden
    ones (round-2 VERDICT weak #3); the windowed diagonal adaptation
    (mcmc.adapt) should restore healthy ESS/R-hat. Same mode-local
    protocol as the nonlinear tier (chains started from q draws).
    """
    if ctx is None:
        ctx = _train_mixed_posterior(seed, n_train, epochs)
    logp, init, inits = ctx["logp"], ctx["init"], ctx["inits"]
    bayes_i = ctx["bayes_i"]
    params = ctx["params"]
    n_chains = 4

    out = {"source": ctx["source"], "n_train": n_train, "epochs": epochs,
           "prior_scale_ratio": float(np.sqrt(3.0 / 1e-5))}
    for name, mass in (("identity_mass", False), ("adapted_mass", True)):
        import time as _time

        def _run():
            s, st = nuts_sample_chains(
                logp,
                init,
                jax.random.PRNGKey(seed + 7),
                NUTSConfig(
                    n_samples=n_draws,
                    n_warmup=n_draws,
                    max_tree_depth=tree_depth,
                    target_accept=0.9,
                    mass_adapt=mass,
                    dense_mass=dense_mass and mass,
                ),
                n_chains=n_chains,
                inits=inits,
            )
            # value fetch = the only reliable sync on this remote backend
            float(jnp.sum(s[bayes_i[0]]))
            return s, st

        t0 = _time.time()
        samples, stats = _run()  # includes compile
        wall_cold = _time.time() - t0
        t0 = _time.time()
        samples, stats = _run()  # compiled: honest sampling wall
        wall = _time.time() - t0
        draws_total = n_chains * 2 * n_draws  # warmup + kept
        per_layer = {}
        for i in bayes_i:
            gs = samples[i]
            per_layer[f"layer{i}"] = {
                "rhat_max": float(jnp.max(split_rhat(gs))),
                "ess_min": float(jnp.min(ess(gs))),
            }
        row = {
            "per_layer": per_layer,
            "ess_min_overall": min(
                v["ess_min"] for v in per_layer.values()
            ),
            "rhat_max_overall": max(
                v["rhat_max"] for v in per_layer.values()
            ),
            "divergences": int(jnp.sum(stats["divergences"])),
            "step_size_mean": float(jnp.mean(stats["step_size"])),
            "wall_s": round(wall, 2),
            "wall_cold_s": round(wall_cold, 2),
            "draws_per_s": round(draws_total / max(wall, 1e-9), 1),
            "backend": jax.default_backend(),
        }
        if mass:
            # adapted inverse-mass scale per layer: should track the
            # ~550x posterior scale split
            m_inv = np.asarray(stats["inv_mass"])  # (chains, dim[, dim])
            if m_inv.ndim == 3:  # dense metric: per-layer DIAGONAL
                m_inv = np.diagonal(m_inv, axis1=1, axis2=2)
            sizes = [int(np.prod(params["layers"][i]["g_mu"].shape))
                     for i in bayes_i]
            off = 0
            for i, sz in zip(bayes_i, sizes):
                row[f"inv_mass_mean_layer{i}"] = float(
                    np.mean(m_inv[:, off : off + sz])
                )
                off += sz
        out[name] = row
    out["gates"] = {
        "adapted_ess_beats_identity": out["adapted_mass"]["ess_min_overall"]
        > out["identity_mass"]["ess_min_overall"],
        "adapted_rhat_ok": out["adapted_mass"]["rhat_max_overall"] < 1.05,
        "adapted_divergence_free": out["adapted_mass"]["divergences"] == 0,
    }
    return out


def tempering_row(
    ctx, n_draws=1600, n_rungs=16, beta_min=0.05, n_leapfrog=16,
):
    """Parallel-tempering arm on a frozen g posterior (mcmc.tempering).

    Round-4 proved the over-trained mixed-lambda posterior defeats any
    linearly preconditioned NUTS (ESS ~ 2, diagonal AND dense metric,
    ANY draw budget) and attributed it to mode structure; a K-rung
    tempered ladder is the standard test of that diagnosis. The
    discriminator between "frozen" and "slow but mixing" is whether ESS
    SCALES WITH DRAWS, so the row runs the ladder at a quarter budget
    and the full budget and reports both (NUTS stays at ESS ~ 2 at any
    budget; CPU ladder-config scan, sweeps/r5: a DENSE ladder —
    K = 16, every swap rate 0.6+ — is what transports, a hotter-but-
    sparse one is not: K = 8 at beta_min 0.001-0.01 stays at ESS ~ 3).
    Round-5 VERDICT item #3."""
    import time as _time

    from whvi_tpu.mcmc import PTConfig, pt_sample_chains

    logp, init, inits = ctx["logp"], ctx["init"], ctx["inits"]
    bayes_i = ctx["bayes_i"]
    seed = ctx["seed"]

    def _run(nd):
        cfg = PTConfig(
            n_samples=nd,
            n_warmup=nd,
            n_rungs=n_rungs,
            beta_min=beta_min,
            n_leapfrog=n_leapfrog,
            target_accept=0.9,
        )
        t0 = _time.time()
        s, st = pt_sample_chains(
            logp,
            init,
            jax.random.PRNGKey(seed + 13),
            cfg,
            n_chains=4,
            inits=inits,
        )
        float(jnp.sum(s[bayes_i[0]]))  # fetch = reliable sync
        return s, st, _time.time() - t0

    s_q, st_q, _ = _run(n_draws // 4)
    ess_quarter = min(
        float(jnp.min(ess(s_q[i]))) for i in bayes_i
    )
    samples, stats, wall = _run(n_draws)
    per_layer = {}
    for i in bayes_i:
        gs = samples[i]
        per_layer[f"layer{i}"] = {
            "rhat_max": float(jnp.max(split_rhat(gs))),
            "ess_min": float(jnp.min(ess(gs))),
        }
    ess_full = min(v["ess_min"] for v in per_layer.values())
    swap = np.asarray(stats["swap_rate"])  # (chains, K-1)
    return {
        "sampler": f"pt-{n_rungs}rung-hmc",
        "n_rungs": n_rungs,
        "beta_min": beta_min,
        "n_draws": n_draws,
        "per_layer": per_layer,
        "ess_min_overall": ess_full,
        "rhat_max_overall": max(
            v["rhat_max"] for v in per_layer.values()
        ),
        "ess_scaling": {
            "draws_quarter": n_draws // 4,
            "ess_quarter": ess_quarter,
            "draws_full": n_draws,
            "ess_full": ess_full,
            "scales_with_draws": ess_full > 1.5 * ess_quarter,
        },
        "divergences": int(jnp.sum(stats["divergences"])),
        "swap_rate_per_pair": [round(float(x), 3) for x in swap.mean(0)],
        "swap_rate_min": float(swap.mean(0).min()),
        "cold_accept_rate": float(
            np.mean(np.asarray(stats["accept_rate"])[:, 0])
        ),
        "wall_s": round(wall, 2),
        # cost accounting: a PT round spends K rungs x n_leapfrog grads
        # for ONE cold draw per ladder
        "cold_draws_per_s": round(4 * 2 * n_draws / max(wall, 1e-9), 1),
        "backend": jax.default_backend(),
    }


def mixed_lambda_study(
    seed=0, n_train=64, n_draws=800, tree_depth=6, dense_mass=False,
    epochs_pass=8000, epochs_fail=12000, skip_tempering=False,
):
    """The SELF-DOCUMENTING mixed-lambda artifact (round-5 VERDICT #5/#6):
    one run records BOTH the 8000-epoch row (mass adaptation passes all
    gates) and the 12000-epoch row (the measured limitation: the
    over-trained posterior defeats linear preconditioning), plus the
    parallel-tempering arm on the failing posterior. The JSON no longer
    flips meaning on an off-by-default epochs flag."""
    out = {}
    ctx_p = _train_mixed_posterior(seed, n_train, epochs_pass)
    out[f"epochs_{epochs_pass}"] = mixed_lambda_tier(
        seed, n_train, epochs_pass, n_draws, tree_depth, dense_mass,
        ctx=ctx_p,
    )
    ctx_f = _train_mixed_posterior(seed, n_train, epochs_fail)
    row_f = mixed_lambda_tier(
        seed, n_train, epochs_fail, n_draws, tree_depth, dense_mass,
        ctx=ctx_f,
    )
    if not skip_tempering:
        ml = tempering_row(ctx_f, n_draws=2 * n_draws)
        ml["gates"] = {
            "pt_ess_beats_adapted_nuts": ml["ess_min_overall"]
            > row_f["adapted_mass"]["ess_min_overall"],
            "pt_ladder_connected": ml["swap_rate_min"] > 0.2,
            # frozen-vs-slow discriminator: NUTS ESS is ~2 at ANY
            # budget; a connected ladder's ESS must grow with draws
            "pt_ess_scales_with_draws": ml["ess_scaling"][
                "scales_with_draws"
            ],
        }
        row_f["tempering"] = ml
    out[f"epochs_{epochs_fail}"] = row_f
    out["verdict"] = {
        "passing_config": f"epochs={epochs_pass}",
        "failing_config": f"epochs={epochs_fail}",
        "pass_gates_all": all(
            out[f"epochs_{epochs_pass}"]["gates"].values()
        ),
        "fail_is_limitation": not all(
            row_f["gates"].values()
        ),
        "note": "the 12000-epoch posterior is the DOCUMENTED sampler "
        "limitation (round-4 RESULTS): identity, adapted-diagonal and "
        "dense metrics all park at ESS ~ 2 at any draw budget. The "
        "tempering row tests the mode-structure diagnosis: a DENSE "
        "16-rung ladder (all swap rates ~0.6) restores genuine mixing "
        "— cold-rung ESS scales with the draw budget — but does not "
        "fully rescue the posterior at this budget (ESS ~ 15 at 6400 "
        "rounds vs the >100 bar); the partial result refines the "
        "diagnosis from 'multimodal' to 'locally near-singular "
        "geometry that tempering relaxes only gradually'",
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--skip-nonlinear", action="store_true")
    ap.add_argument("--skip-mixed", action="store_true")
    ap.add_argument(
        "--tier",
        default=None,
        choices=("analytic", "nonlinear", "mixed"),
        help="run just one tier (default: all)",
    )
    ap.add_argument(
        "--epochs",
        type=int,
        default=12000,
        help="nonlinear-tier training epochs; the mixed study ignores "
        "this and records BOTH its 8000 (passing) and 12000 (failing) "
        "configs in one artifact",
    )
    ap.add_argument(
        "--skip-tempering",
        action="store_true",
        help="drop the parallel-tempering arm from the mixed study",
    )
    ap.add_argument(
        "--dense-mass",
        action="store_true",
        help="full-covariance metric for the adapted-mass arm (the "
        "mixed posterior is 16-dim; round-4 capability)",
    )
    ap.add_argument(
        "--precision",
        default=None,
        choices=("default", "highest", "bf16"),
        help="MXU operand precision for every WHVI product (trace-time "
        "default via ops.set_fwht_precision). Measured: precision is "
        "NOT the lever for sampler convergence — the mixed tier passes "
        "all gates on the v5e at DEFAULT (bf16-operand) precision at "
        "its epochs=8000 config, and 'highest' does not rescue the "
        "harder 12000-epoch posterior (sweeps/r4_mixed_lambda_tpu*)",
    )
    args = ap.parse_args()
    if args.precision:
        from whvi_tpu.ops import set_fwht_precision

        set_fwht_precision(args.precision)

    if args.tier == "mixed":
        results = {
            "mixed_lambda": mixed_lambda_study(
                dense_mass=args.dense_mass,
                skip_tempering=args.skip_tempering,
            )
        }
        print(json.dumps(results, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
        return
    if args.tier == "nonlinear":
        results = {"nonlinear": nonlinear_tier(epochs=args.epochs)}
        print(json.dumps(results, indent=2))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(results, f, indent=2)
        return

    results = {"analytic": analytic_tier()}
    a = results["analytic"]
    gates = {
        "nuts_rhat_ok": a["nuts"]["rhat_max"] < 1.01,
        "nuts_ess_ok": a["nuts"]["ess_min"] > 400,  # 100 per chain
        "nuts_divergence_free": a["nuts"]["divergences"] == 0,
        "nuts_matches_exact_sd": abs(a["nuts"]["sd_ratio_vs_exact_mean"] - 1)
        < 0.1,
        "vi_mean_matches_exact": a["vi"]["mean_corr_vs_exact"] > 0.99,
        "vi_sd_matches_meanfield_theory": abs(
            a["vi"]["sd_ratio_vs_meanfield_optimum"] - 1
        )
        < 0.15,
    }
    results["analytic_gates"] = gates

    if not args.skip_nonlinear and args.tier != "analytic":
        results["nonlinear"] = nonlinear_tier(epochs=args.epochs)
    if not args.skip_mixed and args.tier != "analytic":
        results["mixed_lambda"] = mixed_lambda_study(
            dense_mass=args.dense_mass,
            skip_tempering=args.skip_tempering,
        )

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
