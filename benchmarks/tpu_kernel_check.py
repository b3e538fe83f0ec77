"""Real-TPU correctness + roofline benchmark for the fused WHVI kernel.

Counterpart of the reference's FWHT benchmark protocol
(benchmarks/walsh_plot.py:20-97: 1000 transforms x batch 512,
D = 2^6..2^11, CPU vs CUDA) extended to the fused op and to the large D
the reference kernel cannot reach (D > 4096, SURVEY.md section 2.1).

For each D: checks pallas vs jnp numerics on device, then times
  - jnp path (XLA-fused Kronecker matmuls)
  - pallas fused kernel
with an on-device ``fori_loop`` chain (the remote-dispatch latency of
this environment otherwise dominates), and reports effective HBM GB/s
(2 * B * D * 4 bytes per call: one read of x, one write of y).

The chained operand uses ``s1 = s2 = u = D**(-1/3)`` so each
application is exactly the identity (H(c * H(c x)) * c = c^3 D x = x):
magnitudes stay bounded over any chain length.

Run: python benchmarks/tpu_kernel_check.py [--batch 512] [--iters 100]
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


def chain_time(f, s1, u, s2, x, iters):
    """Seconds per application of f over a dependent on-device chain.

    This environment has ~30 ms of fixed per-call dispatch/fetch latency
    (remote TPU tunnel), so we time chains of ``iters`` and ``2*iters``
    applications and report the difference — the fixed cost cancels.
    """
    import functools

    @functools.partial(jax.jit, static_argnames="n")
    def chained(x, n):
        y = jax.lax.fori_loop(0, n, lambda i, v: f(s1, u, s2, v), x)
        # full on-device reduction, fetched: block_until_ready returns
        # early on this remote backend for XLA-only chains (measured
        # ~1.6x optimistic in round 2) — only a value fetch truly syncs
        return jnp.sum(y)

    def run(n):
        float(chained(x, n))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x, n))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument(
        "--sizes", type=int, nargs="*", default=[256, 1024, 4096, 8192, 16384]
    )
    args = ap.parse_args()

    from whvi_tpu.ops import whvi_mul
    from whvi_tpu.ops.fwht_pallas import whvi_mul_pallas
    from whvi_tpu.ops.hadamard import fwht_kron
    from whvi_tpu.utils import V5E_HBM_GBPS, v5e_peak_flops, whvi_mul_flops

    f_jnp = whvi_mul

    def f_jnp16(s1, u, s2, x):
        # XLA Kronecker path with bf16 MXU operands / fp32 accumulation —
        # the same precision tradeoff the Pallas kernel makes
        return s1 * fwht_kron(
            u * fwht_kron(s2 * x, precision="bf16"), precision="bf16"
        )

    f_pal = lambda a, b, c, d: whvi_mul_pallas(a, b, c, d, False)

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    results = []
    for D in args.sizes:
        B = args.batch
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        mk = jax.jit(
            lambda k, s: jax.random.normal(k, s), static_argnums=1
        )
        rs1 = mk(ks[0], (D,))
        ru = mk(ks[1], (D,))
        rs2 = mk(ks[2], (D,))
        x = mk(ks[3], (B, D))

        # numerics check with random diagonals
        y_j = jax.jit(f_jnp)(rs1, ru, rs2, x)
        y_p = jax.jit(f_pal)(rs1, ru, rs2, x)
        err = float(
            jnp.max(jnp.abs(y_j - y_p)) / (jnp.max(jnp.abs(y_j)) + 1e-9)
        )

        # throughput with norm-preserving random-SIGN diagonals: |y| = |x|
        # exactly (each diag is +-D^(-1/3), H scales norms by sqrt(D)), so
        # chains of any length stay bounded — but the map is NOT the
        # identity. Identity-normalized chains (round 1) produced
        # above-roofline "measurements" on this remote backend; a chain
        # whose value never changes cannot be trusted to have run.
        c0 = D ** (-1.0 / 3.0)
        sk = jax.random.split(jax.random.PRNGKey(7), 3)
        sgn = lambda k: c0 * jnp.where(
            jax.random.bernoulli(k, 0.5, (D,)), 1.0, -1.0
        ).astype(jnp.float32)
        c1, c2, c3 = sgn(sk[0]), sgn(sk[1]), sgn(sk[2])
        t_j = chain_time(f_jnp, c1, c2, c3, x, args.iters)
        t_j16 = chain_time(f_jnp16, c1, c2, c3, x, args.iters)
        t_p = chain_time(f_pal, c1, c2, c3, x, args.iters)
        bytes_moved = 2 * B * D * 4
        flops = whvi_mul_flops(D, B)
        on_tpu = jax.default_backend() == "tpu"
        # all three timed paths run bf16 MXU operands (jnp default TPU
        # matmul rounds fp32 operands; see ops.hadamard precision modes)
        peak = v5e_peak_flops("default")
        row = {
            "D": D,
            "B": B,
            "rel_err": round(err, 5),
            "jnp_us": round(t_j * 1e6, 1),
            "jnp_bf16_us": round(t_j16 * 1e6, 1),
            "pallas_us": round(t_p * 1e6, 1),
            "jnp_GBps": round(bytes_moved / t_j / 1e9, 1),
            "jnp_bf16_GBps": round(bytes_moved / t_j16 / 1e9, 1),
            "pallas_GBps": round(bytes_moved / t_p / 1e9, 1),
            "jnp_TFLOPs": round(flops / t_j / 1e12, 1),
            "pallas_TFLOPs": round(flops / t_p / 1e12, 1),
            "jnp_mfu": round(flops / t_j / peak, 3) if on_tpu else None,
            "pallas_mfu": round(flops / t_p / peak, 3) if on_tpu else None,
            "hbm_frac_jnp": round(
                bytes_moved / t_j / 1e9 / V5E_HBM_GBPS, 3
            ) if on_tpu else None,
            "speedup": round(t_j / t_p, 2),
            "speedup_vs_bf16": round(t_j16 / t_p, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    main()
