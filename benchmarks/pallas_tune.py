"""Tuning harness for the fused WHVI Pallas kernel (y-only, 2-factor path).

Measures candidate kernel formulations against the XLA Kronecker path on
the real TPU so the production kernel (ops/fwht_pallas.py) can adopt the
fastest one. Counterpart in spirit to the reference's kernel perf sweep
(benchmarks/walsh_plot.py) but aimed at *choosing* an implementation.

Variants (all compute y = s1 * H(u * H(s2 * x)), D = a*b, blocks (TB,a,b)):
  cur    — middle-axis dot_general swaps (what the kernel ships today)
  swap   — explicit swapaxes(1,2) + last-axis dots only
  par    — cur + dimension_semantics=("parallel",)
  bf16io — cur with bf16 HBM transport (halves traffic; params fp32)

plus a TB (batch-tile) sweep for the winner.

Run: python benchmarks/pallas_tune.py [--batch 512] [--sizes 8192 16384]
"""

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whvi_tpu.ops.hadamard import build_H
from whvi_tpu.ops import whvi_mul

_LANE = 128


def _dotg(t, h, axis):
    return jax.lax.dot_general(
        t.astype(h.dtype), h, (((axis,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_cur(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t, hb_ref[:], 2)
    t = _dotg(t, ha_ref[:], 1)
    t = t * ut_ref[:]
    t = _dotg(t, ha_ref[:], 2)
    t = _dotg(t, hb_ref[:], 1)
    y_ref[:] = (t * s1_ref[:]).astype(y_ref.dtype)


def k_swap(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t, hb_ref[:], 2)          # (TB, a, b)
    t = jnp.swapaxes(t, 1, 2)           # (TB, b, a)
    t = _dotg(t, ha_ref[:], 2)          # (TB, b, a)
    t = t * ut_ref[:]
    t = _dotg(t, ha_ref[:], 2)          # (TB, b, a)
    t = jnp.swapaxes(t, 1, 2)           # (TB, a, b)
    t = _dotg(t, hb_ref[:], 2)
    y_ref[:] = (t * s1_ref[:]).astype(y_ref.dtype)


def k_flat(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    # Merge the batch dim into the matmul rows: every stage is ONE large
    # (TB*f, f) @ (f, f) MXU matmul instead of TB batched 128x128 ones.
    # Leading-dim merges/splits only (lane dim unchanged) — Mosaic-legal.
    TB, a, b = x_ref.shape
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    t = jnp.swapaxes(t, 1, 2)                      # (TB, b, a)
    t = _dotg(t.reshape(TB * b, a), ha_ref[:], 1).reshape(TB, b, a)
    t = t * ut_ref[:]
    t = _dotg(t.reshape(TB * b, a), ha_ref[:], 1).reshape(TB, b, a)
    t = jnp.swapaxes(t, 1, 2)                      # (TB, a, b)
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    y_ref[:] = (t * s1_ref[:]).astype(y_ref.dtype)


def k_onecast(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    # scale in bf16 where exactness allows; minimize VPU passes
    t = (x_ref[:] * s2_ref[:]).astype(jnp.bfloat16)
    t = _dotg(t, hb_ref[:], 2)
    t = _dotg(t, ha_ref[:], 1)
    t = (t * ut_ref[:]).astype(jnp.bfloat16)
    t = _dotg(t, ha_ref[:], 2)
    t = _dotg(t, hb_ref[:], 1)
    y_ref[:] = (t * s1_ref[:]).astype(y_ref.dtype)


def make_fn(kernel, TB, D, dtype=jnp.float32, sem=None, io_dtype=None):
    a = max(1, D // _LANE)
    b = D // a
    io_dtype = io_dtype or dtype

    @jax.jit
    def f(s1, u, s2, x):
        B = x.shape[0]
        x3 = x.reshape(B, a, b).astype(io_dtype)
        grid = (B // TB,)
        vec_nat = lambda: pl.BlockSpec((1, a, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        vec_sw = pl.BlockSpec((1, b, a), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        mat = lambda n: pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
        tile = pl.BlockSpec((TB, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ut = u.reshape(a, b).T.reshape(1, b, a)
        cp = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=(sem,) if sem else None,
        )
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[vec_nat(), vec_sw, vec_nat(), mat(a), mat(b), tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((B, a, b), io_dtype),
            compiler_params=cp,
        )(
            s2.reshape(1, a, b).astype(io_dtype),
            ut.astype(jnp.float32),
            s1.reshape(1, a, b).astype(jnp.float32),
            build_H(a, jnp.bfloat16),
            build_H(b, jnp.bfloat16),
            x3,
        )
        return y.reshape(B, D).astype(x.dtype)

    return f


def chain_time(f, s1, u, s2, x, iters):
    @functools.partial(jax.jit, static_argnames="n")
    def chained(x, n):
        y = jax.lax.fori_loop(0, n, lambda i, v: f(s1, u, s2, v), x)
        # fetched reduction: block_until_ready is unreliable on the
        # remote backend (see utils/profiling.chain_time)
        return jnp.sum(y)

    def run(n):
        float(chained(x, n))
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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--sizes", type=int, nargs="*", default=[8192, 16384])
    ap.add_argument("--tbs", type=int, nargs="*", default=[64, 128, 256])
    args = ap.parse_args()

    print(f"backend={jax.default_backend()}")
    for D in args.sizes:
        B = args.batch
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        mk = jax.jit(lambda k, s: jax.random.normal(k, s), static_argnums=1)
        rs1, ru, rs2 = mk(ks[0], (D,)), mk(ks[1], (D,)), mk(ks[2], (D,))
        x = mk(ks[3], (B, D))
        c = jnp.full((D,), D ** (-1.0 / 3.0), jnp.float32)
        ref = jax.jit(whvi_mul)(rs1, ru, rs2, x)
        t_ref = chain_time(jax.jit(whvi_mul), c, c, c, x, args.iters)
        bytes_moved = 2 * B * D * 4
        print(json.dumps({"D": D, "variant": "xla", "us": round(t_ref * 1e6, 1),
                          "GBps": round(bytes_moved / t_ref / 1e9, 1)}), flush=True)

        variants = []
        for TB in args.tbs:
            variants += [
                (f"flat/tb{TB}", make_fn(k_flat, TB, D, sem="parallel")),
                (f"cur/tb{TB}", make_fn(k_cur, TB, D, sem="parallel")),
            ]
        # repeat the last candidate to gauge run-to-run noise (use the
        # CLI tile so the grid B // TB always covers the batch)
        TB_rep = args.tbs[-1]
        variants.append(
            (f"flat/tb{TB_rep}-rep", make_fn(k_flat, TB_rep, D, sem="parallel"))
        )
        for name, f in variants:
            try:
                y = f(rs1, ru, rs2, x)
                err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
                t = chain_time(f, c, c, c, x, args.iters)
                nbytes = bytes_moved if "bf16io" not in name else bytes_moved // 2
                print(json.dumps({
                    "D": D, "variant": name, "us": round(t * 1e6, 1),
                    "GBps_eff_fp32": round(bytes_moved / t / 1e9, 1),
                    "GBps_moved": round(nbytes / t / 1e9, 1),
                    "rel_err": round(err, 5),
                    "vs_xla": round(t_ref / t, 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"D": D, "variant": name,
                                  "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
