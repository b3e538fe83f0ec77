"""kin8nm-scale protocol feasibility: the FULL 500+50000-epoch UCI
protocol on a synthetic dataset of kin8nm's exact shape (n=8192, 8
features), one split, wall-clock + throughput + MFU recorded.

The reference needed **35 hours per split** at this scale on a GTX 970
(/root/reference/report/model-testing.tex:92); the real kin8nm/naval/
boston/protein files are absent in this zero-egress environment (see
whvi_tpu/data/README.md for the exact files that unlock them), so this
run demonstrates the protocol's wall-clock feasibility — the shape and
epoch count are identical, only the target function is synthetic
(smooth nonlinear map + noise, standardized like the real pipeline).

Run: python experiments/run_protocol_feasibility.py [--cpu]
         [--epochs2 50000] [--n 8192] [--features 8]
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

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--features", type=int, default=8)
    ap.add_argument("--epochs1", type=int, default=500)
    ap.add_argument("--epochs2", type=int, default=50000)
    ap.add_argument("--splits", type=int, default=1)
    ap.add_argument(
        "--configs",
        type=int,
        default=0,
        help="stack N configs on top of the split axis (a sigma0 x "
        "lambda_hidden spread) and run the whole splits x configs grid "
        "as ONE fit via evaluate_config_grid — the round-5 protocol-"
        "utilization lever (replica axis n_splits -> N * n_splits)",
    )
    ap.add_argument(
        "--epochs-per-call",
        type=int,
        default=2500,
        help="scan-chunk size (epochs per device dispatch). Large "
        "replica stacks at kin8nm scale need SHORTER chunks on the "
        "remote backend: a single dispatch running longer than ~2-3 "
        "minutes crashes the axon TPU worker (round-5 measurement: "
        "16x8192 at 2500-epoch chunks reproducibly dies, at 500 it "
        "runs; the same program at tiny epochs compiles and runs fine)",
    )
    ap.add_argument(
        "--prng",
        choices=["threefry", "rbg"],
        default="threefry",
        help="PRNG implementation. 'rbg' uses the TPU hardware RNG: "
        "1.85x protocol throughput with per-example LRT noise (the "
        "threefry VPU cost dominates the step — round-5 measurement, "
        "warm MFU 4.5%% -> 8.3%% at kin8nm scale). Streams differ from "
        "threefry (results change within statistical noise); default "
        "stays threefry for bit-reproducibility of earlier rows",
    )
    ap.add_argument(
        "--rect-mode",
        choices=["stack", "pad"],
        default="stack",
        help="non-square layer construction. 'pad' turns the 8->128 "
        "first layer's sixteen D=8 blocks (8-wide ops on 128-lane "
        "hardware) into one D=128 padded block: 1.3-2.6x throughput, "
        "warm MFU 1.8%% -> 4.8%% (round-5 measurement)",
    )
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    if args.prng == "rbg":
        import jax as _jax

        _jax.config.update("jax_default_prng_impl", "rbg")

    import jax

    from whvi_tpu.evaluation import (
        ProtocolConfig,
        evaluate_bayesian_regression,
    )
    from whvi_tpu.models import WHVIRegression, mlp_layers
    from whvi_tpu.utils import net_train_step_flops, v5e_peak_flops

    # synthetic kin8nm-shaped data: smooth nonlinear target (the real
    # kin8nm is forward kinematics of an 8-link arm — smooth + mildly
    # nonlinear), noise sd ~0.05 of signal
    rng = np.random.RandomState(args.seed)
    X = rng.randn(args.n, args.features).astype(np.float32)
    w1 = rng.randn(args.features, 16).astype(np.float32) / np.sqrt(
        args.features
    )
    w2 = rng.randn(16).astype(np.float32) / 4.0
    f = np.tanh(X @ w1) @ w2
    y = (f + 0.05 * f.std() * rng.randn(args.n)).astype(np.float32)

    cfg = ProtocolConfig(
        n_splits=args.splits,
        epochs1=args.epochs1,
        epochs2=args.epochs2,
        epochs_per_call=args.epochs_per_call,
        seed=args.seed,
        # tuned recipe (docs/RESULTS.md): bias + per-example noise +
        # 8 train samples + sigma0 0.1 — the quality configuration, so
        # the feasibility number reflects the settings real runs use
        bias=True,
        per_example_noise=True,
        train_samples=8,
        sigma0=0.1,
        rect_mode=args.rect_mode,
    )

    # analytic flops: protocol model on this shape (for MFU; batches
    # are wrap-padded to full 64-row batches like the Trainer does)
    net = WHVIRegression(
        mlp_layers(
            args.features, 1, hidden=cfg.hidden, bias=True,
            rect_mode=cfg.rect_mode,
        ),
        train_samples=cfg.train_samples,
    )
    n_train = args.n - max(1, int(round(args.n * cfg.test_frac)))
    batches = -(-n_train // cfg.batch_size)
    step_flops = net_train_step_flops(net, cfg.batch_size)
    total_epochs = args.epochs1 + args.epochs2

    t0 = time.time()
    if args.configs:
        from whvi_tpu.evaluation import evaluate_config_grid

        # a realistic tuning spread: sigma0 x lambda_hidden variations
        # around the recipe (what a sweep actually runs)
        sig = [0.05, 0.1, 0.2, 0.4]
        lam = [1.0, 3.0, 10.0]
        overrides = [
            {"sigma0": sig[i % len(sig)], "lambda_hidden": lam[i % len(lam)]}
            for i in range(args.configs)
        ]
        grid = evaluate_config_grid(X, y, cfg, overrides)
        out = grid["configs"][0]
        n_replicas = args.configs * args.splits
    else:
        out = evaluate_bayesian_regression(X, y, cfg, ckpt_dir=None)
        n_replicas = args.splits
    wall = time.time() - t0
    eps = n_replicas * total_epochs / wall
    flops_per_s = eps * batches * step_flops
    on_tpu = jax.default_backend() == "tpu"
    print(
        json.dumps(
            {
                "experiment": "kin8nm_scale_feasibility",
                "shape": [args.n, args.features],
                "epochs": total_epochs,
                "splits": args.splits,
                "configs": args.configs or None,
                "prng": args.prng,
                "rect_mode": args.rect_mode,
                "stack_replicas": n_replicas,
                "rmse_mean": out["rmse_mean"],
                "pred_mnll_mean": out.get("pred_mnll_per_point_mean"),
                "wall_s": round(wall, 1),
                "wall_s_per_replica_amortized": round(
                    wall / n_replicas, 1
                ),
                "epochs_per_s": round(eps, 1),
                "tflops": round(flops_per_s / 1e12, 2),
                "mfu": round(flops_per_s / v5e_peak_flops(), 4)
                if on_tpu
                else None,
                "reference_wall_per_split_h": 35.0,
                "speedup_vs_reference": round(
                    35.0 * 3600.0 / (wall / n_replicas), 1
                ),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
