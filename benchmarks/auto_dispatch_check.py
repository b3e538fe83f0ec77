"""Auto-dispatch A/B: whvi_mul backend "auto" vs "xla" on real shapes.

Validates the round-4 per-shape dispatch rule (ops/whvi_op.py
_PALLAS_AUTO_SHAPES): "auto" must be >= 1.0x the XLA path at the
measured Pallas-win shape (direct product, D=4096) and exactly the XLA
path everywhere else (the off-niche rows time identically up to noise).

Same measurement discipline as tpu_kernel_check.py: dependent on-device
chains with difference timing and norm-preserving random-SIGN diagonals
(never identity chains — the remote backend shortcuts those).

Run: python benchmarks/auto_dispatch_check.py [--batch 512] [--iters 200]
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

from benchmarks.tpu_kernel_check import chain_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument(
        "--sizes", type=int, nargs="*", default=[2048, 4096, 8192]
    )
    args = ap.parse_args()

    from whvi_tpu.ops import whvi_mul
    from whvi_tpu.ops.whvi_op import set_whvi_mul_backend

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    for D in args.sizes:
        B = args.batch
        c0 = D ** (-1.0 / 3.0)
        sk = jax.random.split(jax.random.PRNGKey(7), 4)
        sgn = lambda k: c0 * jnp.where(
            jax.random.bernoulli(k, 0.5, (D,)), 1.0, -1.0
        ).astype(jnp.float32)
        c1, c2, c3 = sgn(sk[0]), sgn(sk[1]), sgn(sk[2])
        x = jax.jit(
            lambda k: jax.random.normal(k, (B, D)), static_argnums=()
        )(sk[3])

        times = {}
        for backend in ("xla", "auto"):
            set_whvi_mul_backend(backend)
            try:
                # fresh wrapper per backend: _BACKEND is read at trace
                # time, and chain_time jits with its own cache per fn
                def f(a, b, c, v):
                    return whvi_mul(a, b, c, v)

                times[backend] = chain_time(f, c1, c2, c3, x, args.iters)
            finally:
                set_whvi_mul_backend("auto")
        row = {
            "D": D,
            "B": B,
            "xla_us": round(times["xla"] * 1e6, 1),
            "auto_us": round(times["auto"] * 1e6, 1),
            "auto_speedup": round(times["xla"] / times["auto"], 3),
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
