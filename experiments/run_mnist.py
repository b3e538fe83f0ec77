"""Bayesian MNIST classifier with WHVI layers + HMC moment validation.

BASELINE.json config: "MNIST Bayesian classifier with WHVILinear D=1024
+ softmax likelihood; HMC golden run on a frozen subset to validate VI
moments". Architecture: 784 -> 1024 (WHVI) -> ReLU -> 1024 (WHVI,
square pow-2) -> ReLU -> 1024 -> 10 (WHVI stacked), categorical
likelihood, two-phase ELBO training, test accuracy + MNLL.

Falls back to structured synthetic classification data when the MNIST
IDX files are absent (zero-egress environments); pass --require-mnist
to fail instead.

The optional --hmc pass freezes the trained model, builds the exact
g-posterior on a data subset and compares HMC posterior moments of the
last layer's g against the variational (g_mu, softplus(g_rho)).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def _maybe_force_cpu():
    import sys as _sys

    if "--cpu" in _sys.argv:
        _sys.argv.remove("--cpu")
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from whvi_tpu.data.mnist import (
    load_mnist,
    mnist_available,
    synthetic_classification,
)
from whvi_tpu.models import (
    CategoricalLikelihood,
    WHVILinear,
    WHVINetwork,
    relu,
)
from whvi_tpu.train import TrainConfig, Trainer


def accuracy(net, params, X, y, key, n_samples=16, batch=2048):
    pad = (-len(X)) % batch
    Xp = np.pad(X, ((0, pad), (0, 0)))

    @jax.jit
    def batch_probs(params, xb, key):
        return net.likelihood.predict(
            params["likelihood"], net.predict(params, xb, key, n_samples)
        )

    correct = 0
    for i in range(0, len(Xp), batch):
        probs = batch_probs(params, jnp.asarray(Xp[i : i + batch]), key)
        pred = np.asarray(jnp.argmax(probs, -1))
        yb = y[i : i + batch]
        correct += int(np.sum(pred[: len(yb)] == yb))
    return correct / len(X)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--epochs1", type=int, default=2)
    ap.add_argument("--epochs2", type=int, default=18)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--train-samples", type=int, default=1)
    ap.add_argument("--eval-samples", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--require-mnist", action="store_true")
    ap.add_argument("--hmc", action="store_true", help="golden-sampler check")
    ap.add_argument("--subset", type=int, default=0, help="train subset size")
    args = ap.parse_args()

    if mnist_available():
        (X_tr, y_tr), (X_te, y_te) = load_mnist()
        source = "mnist"
    elif args.require_mnist:
        raise SystemExit("MNIST IDX files not found")
    else:
        (X_tr, y_tr), (X_te, y_te) = synthetic_classification()
        source = "synthetic"
    if args.subset:
        X_tr, y_tr = X_tr[: args.subset], y_tr[: args.subset]

    W = args.width
    net = WHVINetwork(
        layers=(
            WHVILinear(X_tr.shape[1], W, lambda_=3.0, s_init="auto"),
            relu,
            WHVILinear(W, W, lambda_=3.0, s_init="auto"),
            relu,
            WHVILinear(W, 10, lambda_=1.0, s_init="auto"),
        ),
        likelihood=CategoricalLikelihood(),
        train_samples=args.train_samples,
        eval_samples=args.eval_samples,
    )
    total = args.epochs1 + args.epochs2
    steps_per_epoch = -(-len(X_tr) // args.batch)
    cfg = TrainConfig(
        batch_size=args.batch,
        epochs1=args.epochs1,
        epochs2=args.epochs2,
        epochs_per_call=max(1, total // 10),
        kl_warmup_steps=int(0.3 * total * steps_per_epoch),
    )
    trainer = Trainer(net, cfg)
    state = trainer.init(jax.random.PRNGKey(args.seed))

    t0 = time.time()
    state, logs = trainer.fit(
        state,
        X_tr,
        y_tr.astype(np.int32),
        log_fn=lambda e: print(json.dumps(e), flush=True),
    )
    wall = time.time() - t0

    acc = accuracy(net, state.params, X_te, y_te, jax.random.PRNGKey(1))
    out = {
        "experiment": "mnist",
        "source": source,
        "width": W,
        "test_accuracy": acc,
        "wall_s": round(wall, 1),
        "epochs_per_s": round(total / max(wall, 1e-9), 2),
    }

    if args.hmc:
        from whvi_tpu.mcmc import (
            HMCConfig,
            hmc_sample,
            make_whvi_g_log_posterior,
            moments,
        )

        # frozen subset golden run (keep it small: exactness > scale)
        Xs, ys = X_tr[:256], y_tr[:256]
        logp, init = make_whvi_g_log_posterior(net, state.params, Xs, ys)
        samples, stats = hmc_sample(
            logp,
            init,
            jax.random.PRNGKey(2),
            HMCConfig(n_samples=300, n_warmup=200, n_leapfrog=16),
        )
        m, s = moments(samples)
        last = max(init.keys())
        vi_mu = state.params["layers"][last]["g_mu"]
        vi_sd = jax.nn.softplus(state.params["layers"][last]["g_rho"])
        mu_corr = float(
            jnp.corrcoef(
                jnp.ravel(m[last]), jnp.ravel(vi_mu)
            )[0, 1]
        )
        out["hmc"] = {
            "accept_rate": float(stats["accept_rate"]),
            "mu_corr_vi_hmc": mu_corr,
            "hmc_sd_mean": float(jnp.mean(s[last])),
            "vi_sd_mean": float(jnp.mean(vi_sd)),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
