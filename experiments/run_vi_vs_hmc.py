"""Golden-sampler validation study: VI vs HMC/NUTS vs exact posterior.

Round-2 deliverable (VERDICT.md missing #3/#4): turn the "HMC validates
VI" claim into a quantitative verdict with convergence diagnostics.

Three tiers:

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
   ESS / divergence gates, then the per-layer VI-vs-NUTS moment table.
3. Verdict JSON: every gate explicit (rhat_max < 1.01, ess_min > 100
   per chain equivalent, divergences == 0).

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
    """Exact Gaussian posterior vs NUTS vs trained mean-field VI."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    layer = SquarePow2Matrix(D, lambda_=lam, s_init="auto")
    p0 = layer.init(k1)
    s1, s2 = p0["s1"], p0["s2"]
    X = jax.random.normal(k2, (n, D))
    g_true = jax.random.normal(k3, (D,)) * jnp.sqrt(lam)
    H = build_H(D)

    def design(x):  # M(x): y = M(x) g
        return s1[:, None] * H * (H @ (s2 * x))[None, :]

    M = jax.vmap(design)(X)  # (n, D, D)
    y = jnp.einsum("nij,j->ni", M, g_true)
    y = y + sigma * jax.random.normal(k4, y.shape)

    # exact Gaussian posterior over g
    Lam = jnp.eye(D) / lam + jnp.einsum("nij,nik->jk", M, M) / sigma**2
    Sigma = jnp.linalg.inv(Lam)
    mu = Sigma @ (jnp.einsum("nij,ni->j", M, y) / sigma**2)
    exact_sd = jnp.sqrt(jnp.diag(Sigma))
    # the mean-field optimum against a Gaussian: same mean, variances =
    # inverse precision DIAGONAL (Bishop 10.1.2)
    mf_sd = 1.0 / jnp.sqrt(jnp.diag(Lam))

    # --- NUTS on the exact target
    def logp(q):
        g = q["g"]
        r = y - jnp.einsum("nij,j->ni", M, g)
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
        r = y[None] - jnp.einsum("nij,sj->sni", M, g)
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


# ----------------------------------------------------------- nonlinear tier


def nonlinear_tier(seed=0, n_train=64, epochs=20000):
    """Small WHVI MLP: train VI, then 4-chain NUTS over the g posterior."""
    from whvi_tpu.train import TrainConfig, Trainer

    # data: yacht subset if available, else smooth synthetic
    try:
        from whvi_tpu.data.uci import load_uci

        X, y = load_uci("yacht")
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(X))[:n_train]
        X = X[idx].astype(np.float32)
        y = y[idx].astype(np.float32)[:, None]
        X = (X - X.mean(0)) / (X.std(0) + 1e-8)
        y = (y - y.mean(0)) / (y.std(0) + 1e-8)
        source = "yacht"
    except Exception:
        rng = np.random.RandomState(seed)
        X = rng.randn(n_train, 6).astype(np.float32)
        y = np.sin(X.sum(1, keepdims=True)).astype(np.float32)
        source = "synthetic"

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
    k_q = jax.random.split(jax.random.PRNGKey(seed + 11), n_chains)
    bayes_i = sorted(init.keys())

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

    inits = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[q_draw(k) for k in k_q]
    )
    samples, stats = nuts_sample_chains(
        logp,
        init,
        jax.random.PRNGKey(seed + 7),
        NUTSConfig(
            n_samples=1500,
            n_warmup=1500,
            max_tree_depth=9,
            target_accept=0.95,
        ),
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

    return {
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


# --------------------------------------------------------- mixed-lambda tier


def mixed_lambda_tier(
    seed=0, n_train=64, epochs=8000, n_draws=800, tree_depth=6,
    dense_mass=False,
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
    from whvi_tpu.train import TrainConfig, Trainer

    try:
        from whvi_tpu.data.uci import load_uci

        X, y = load_uci("yacht")
        rng = np.random.RandomState(seed)
        idx = rng.permutation(len(X))[:n_train]
        X = X[idx].astype(np.float32)
        y = y[idx].astype(np.float32)[:, None]
        X = (X - X.mean(0)) / (X.std(0) + 1e-8)
        y = (y - y.mean(0)) / (y.std(0) + 1e-8)
        source = "yacht"
    except Exception:
        rng = np.random.RandomState(seed)
        X = rng.randn(n_train, 6).astype(np.float32)
        y = np.sin(X.sum(1, keepdims=True)).astype(np.float32)
        source = "synthetic"

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
    n_chains = 4
    bayes_i = sorted(init.keys())
    k_q = jax.random.split(jax.random.PRNGKey(seed + 11), n_chains)

    def q_draw(k):
        ks = jax.random.split(k, len(bayes_i))
        out = {}
        for kk, i in zip(ks, bayes_i):
            lp = params["layers"][i]
            sd = jax.nn.softplus(lp["g_rho"])
            out[i] = lp["g_mu"] + sd * jax.random.normal(kk, lp["g_mu"].shape)
        return out

    inits = jax.tree.map(lambda *xs: jnp.stack(xs), *[q_draw(k) for k in k_q])

    out = {"source": source, "n_train": n_train,
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
    ap.add_argument("--epochs", type=int, default=12000)
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
            "mixed_lambda": mixed_lambda_tier(
                epochs=args.epochs, dense_mass=args.dense_mass
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
        results["mixed_lambda"] = mixed_lambda_tier(epochs=args.epochs)

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
