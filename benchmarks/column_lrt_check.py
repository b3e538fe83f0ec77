"""Gradient-variance A/B: explicit column sample vs per-example LRT.

The reference always draws ONE explicit weight sample per forward for
column-shaped layers (src/weights.py:250-251) — every batch row sees
the same draw, which makes the column layer the highest-variance
estimator in the net. The column is linear in ``g``, so a per-example
LRT is available (weights.ColumnMatrix.apply, round-4, opt-in via
``WHVILinear(column_lrt=True)``); this CLI measures what it buys:
per-parameter ELBO-gradient variance across K independent keys, for the
(D -> 1) output-column architecture at several D (round-3 VERDICT weak
#6 called for exactly this measurement).

Run: python benchmarks/column_lrt_check.py [--cpu] [--sizes 128 1024 8192]
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

import jax
import jax.numpy as jnp
import numpy as np


def grad_var(net, params, X, y, keys):
    """Mean elementwise variance of the ELBO gradient across keys,
    per parameter subtree, plus the loss-estimator variance."""
    lfn = jax.jit(
        jax.value_and_grad(
            lambda p, k: net.loss(p, k, X, y, n=X.shape[0])[0]
        )
    )
    losses, grads = [], []
    for k in keys:
        l, g = lfn(params, k)
        losses.append(float(l))
        grads.append(g)
    stacked = jax.tree.map(lambda *gs: jnp.stack(gs), *grads)
    per_leaf = [
        float(jnp.mean(jnp.var(leaf, axis=0)))
        for leaf in jax.tree.leaves(stacked)
    ]
    return float(np.var(losses)), float(np.mean(per_leaf))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[128, 1024, 8192])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--keys", type=int, default=64)
    # measure at a TRAINED point: at init g_mu=0 and sigma ~ softplus(-3)
    # are tiny, so the weight-noise share of the estimator variance (the
    # part per-example LRT reduces) is invisible next to the likelihood
    # noise
    ap.add_argument("--train-epochs", type=int, default=300)
    args = ap.parse_args()

    from whvi_tpu.models import WHVILinear, WHVIRegression, relu

    for D in args.sizes:
        rng = np.random.RandomState(0)
        X = jnp.asarray(rng.randn(args.batch, D), jnp.float32)
        y = jnp.asarray(rng.randn(args.batch, 1), jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(1), args.keys)
        row = {"D": D, "B": args.batch, "keys": args.keys}
        for name, col_lrt in (("explicit", False), ("column_lrt", True)):
            net = WHVIRegression(
                [
                    WHVILinear(
                        D,
                        1,
                        lambda_=1e-5,
                        s_init="auto",
                        per_example_noise=True,
                        column_lrt=col_lrt,
                    )
                ],
                sigma0=1.0,
                train_samples=1,
            )
            from whvi_tpu.train import TrainConfig, Trainer

            tr = Trainer(
                net,
                TrainConfig(
                    epochs1=0,
                    epochs2=args.train_epochs,
                    epochs_per_call=max(args.train_epochs, 1),
                ),
            )
            state = tr.init(jax.random.PRNGKey(0))
            if args.train_epochs:
                state, _ = tr.fit(state, np.asarray(X), np.asarray(y))
            params = state.params
            lvar, gvar = grad_var(net, params, X, y, keys)
            row[f"{name}_loss_var"] = lvar
            row[f"{name}_grad_var"] = gvar
        row["grad_var_reduction"] = round(
            row["explicit_grad_var"] / max(row["column_lrt_grad_var"], 1e-30),
            2,
        )
        row["loss_var_reduction"] = round(
            row["explicit_loss_var"] / max(row["column_lrt_loss_var"], 1e-30),
            2,
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
