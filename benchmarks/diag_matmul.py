"""Diagonal-matmul micro-benchmark.

Counterpart of the reference's ``benchmarks/utils.py:6-67``, which times
``torch.diag(d) @ A`` against the broadcasted product. Here we compare

  - dense:     ``jnp.diag(d) @ A``      (materializes the D x D diagonal)
  - broadcast: ``matmul_diag_left(d, A)``  (`d[:, None] * A`)

and the right-product variants, on the current default backend, using
difference-timed on-device chains (fixed dispatch latency cancels).

Run: python benchmarks/diag_matmul.py [--cpu] [--sizes 256 1024 4096]
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

from whvi_tpu.ops import matmul_diag_left, matmul_diag_right
from whvi_tpu.utils.profiling import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[256, 1024, 4096])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    for D in args.sizes:
        if D < 1:
            print(json.dumps({"D": D, "error": "size must be >= 1"}))
            continue
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        d = jax.random.normal(k1, (D,))
        A = jax.random.normal(k2, (D, D))
        # normalize so chained application stays bounded
        d = d / jnp.sqrt(jnp.mean(d * d))

        fns = {
            "dense_left": lambda A: jnp.diag(d) @ A,
            "broadcast_left": lambda A: matmul_diag_left(d, A),
            "dense_right": lambda A: A @ jnp.diag(d),
            "broadcast_right": lambda A: matmul_diag_right(A, d),
        }
        # correctness cross-check
        ok_l = bool(
            jnp.allclose(fns["dense_left"](A), fns["broadcast_left"](A), atol=1e-4)
        )
        ok_r = bool(
            jnp.allclose(fns["dense_right"](A), fns["broadcast_right"](A), atol=1e-4)
        )
        row = {"D": D, "match_left": ok_l, "match_right": ok_r}
        for name, f in fns.items():
            t = chain_time(jax.jit(f), A, iters=args.iters)
            row[f"{name}_us"] = round(t * 1e6, 2)
        tiny = 1e-3  # rounding floor: guard ratios at very small D
        row["speedup_left"] = round(
            row["dense_left_us"] / max(row["broadcast_left_us"], tiny), 1
        )
        row["speedup_right"] = round(
            row["dense_right_us"] / max(row["broadcast_right_us"], tiny), 1
        )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
