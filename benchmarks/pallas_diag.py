"""Stage-by-stage Pallas diagnosis: where does the fused kernel's time go?

Builds the fused product up one stage at a time at fixed tile geometry and
measures each on the real TPU:

  copy     y = x                          (pure DMA floor for this tiling)
  scale    y = x * s1                     (+1 VPU pass)
  mm1      y = flat (TB*a, b) @ Hb        (+1 MXU stage)
  mm2      y = swap + (TB*b, a) @ Ha      (+transpose +1 MXU)
  full     y = s1*H(u*H(s2*x))            (the real kernel, flat variant)
  prod     production whvi_mul_pallas     (ships today)
  xla      XLA Kronecker whvi_mul         (the path to beat)

If `copy` already sits at ~350 GB/s the pallas_call pipeline itself is the
bound (fix: tiling/emit_pipeline/aliasing); if `copy` reaches the HBM
roofline the gap is in the compute stages (fix: matmul formulation).

Run (TPU): python benchmarks/pallas_diag.py --sizes 16384 --batch 512
"""

import argparse
import functools
import json
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from whvi_tpu.ops import whvi_mul
from whvi_tpu.ops.fwht_pallas import whvi_mul_pallas
from whvi_tpu.ops.hadamard import build_H
from whvi_tpu.utils.profiling import chain_time

_LANE = 128


def chain_time_scalar(fn, x, iters=50, reps=3):
    """Like profiling.chain_time but forces completion by fetching a
    scalar reduction of the result (block_until_ready is unreliable on
    the remote-tunnel backend for some programs, CLAUDE.md)."""
    import time as _time
    import functools as _ft

    @_ft.partial(jax.jit, static_argnames="n")
    def chained(v, n):
        w = jax.lax.fori_loop(0, n, lambda i, w: fn(w), v)
        return jnp.sum(w[:1, :1])

    def run(n):
        float(chained(x, n))
        best = float("inf")
        for _ in range(reps):
            t0 = _time.perf_counter()
            float(chained(x, n))
            best = min(best, _time.perf_counter() - t0)
        return best

    return max(run(2 * iters) - run(iters), 1e-9) / iters


def _dotg(t, h, axis):
    return jax.lax.dot_general(
        t.astype(h.dtype), h, (((axis,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def k_copy(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    y_ref[:] = x_ref[:]


def k_scale(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    y_ref[:] = x_ref[:] * s1_ref[:]


def k_mm1(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    TB, a, b = x_ref.shape
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    y_ref[:] = t.astype(y_ref.dtype)


def k_mm2(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    TB, a, b = x_ref.shape
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    t = jnp.swapaxes(t, 1, 2)
    t = _dotg(t.reshape(TB * b, a), ha_ref[:], 1).reshape(TB, b, a)
    t = jnp.swapaxes(t, 1, 2)
    y_ref[:] = t.astype(y_ref.dtype)


def k_full(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_ref, y_ref):
    TB, a, b = x_ref.shape
    t = x_ref[:] * s2_ref[:]
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    t = jnp.swapaxes(t, 1, 2)
    t = _dotg(t.reshape(TB * b, a), ha_ref[:], 1).reshape(TB, b, a)
    t = t * ut_ref[:]
    t = _dotg(t.reshape(TB * b, a), ha_ref[:], 1).reshape(TB, b, a)
    t = jnp.swapaxes(t, 1, 2)
    t = _dotg(t.reshape(TB * a, b), hb_ref[:], 1).reshape(TB, a, b)
    y_ref[:] = (t * s1_ref[:]).astype(y_ref.dtype)


KERNELS = {
    "copy": k_copy,
    "scale": k_scale,
    "mm1": k_mm1,
    "mm2": k_mm2,
    "full": k_full,
}


def make_emit_full(B, D, TB, h_dtype=jnp.bfloat16):
    """The FULL fused product under a manual ``emit_pipeline`` (explicit
    double-buffered DMA, ANY-memory operands) — the round-2 VERDICT's
    last unturned stone: the copy-only emit_pipeline was benchmarked
    (main_floors below) but the fused compute never was. Diagonals and
    the H factors sit whole in VMEM via the outer pallas_call; only
    x/y stream through the inner pipeline."""
    a, b = D // _LANE, _LANE
    Ha, Hb = build_H(a, h_dtype), build_H(b, h_dtype)

    def kern(s2_ref, ut_ref, s1_ref, ha_ref, hb_ref, x_hbm, y_hbm):
        ha = ha_ref[:]
        hb = hb_ref[:]

        def inner(x_blk, y_blk):
            t = x_blk[:] * s2_ref[:]
            t = _dotg(t.reshape(TB * a, b), hb, 1).reshape(TB, a, b)
            t = jnp.swapaxes(t, 1, 2)
            t = _dotg(t.reshape(TB * b, a), ha, 1).reshape(TB, b, a)
            t = t * ut_ref[:]
            t = _dotg(t.reshape(TB * b, a), ha, 1).reshape(TB, b, a)
            t = jnp.swapaxes(t, 1, 2)
            t = _dotg(t.reshape(TB * a, b), hb, 1).reshape(TB, a, b)
            y_blk[:] = (t * s1_ref[:]).astype(y_blk.dtype)

        pltpu.emit_pipeline(
            inner,
            grid=(B // TB,),
            in_specs=[pl.BlockSpec((TB, a, b), lambda i: (i, 0, 0))],
            out_specs=[pl.BlockSpec((TB, a, b), lambda i: (i, 0, 0))],
        )(x_hbm, y_hbm)

    @jax.jit
    def fn(s1, u, s2, x):
        x3 = x.reshape(B, a, b)
        ut = u.reshape(a, b).T.reshape(1, b, a)
        y = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
            + [pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((B, a, b), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(s2.reshape(1, a, b), ut, s1.reshape(1, a, b), Ha, Hb, x3)
        return y.reshape(B, D)

    return fn


def make_fn(kernel, TB, D, h_dtype=jnp.bfloat16, sem="parallel"):
    a, b = D // _LANE, _LANE
    Ha, Hb = build_H(a, h_dtype), build_H(b, h_dtype)

    vec_nat = pl.BlockSpec((1, a, b), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    vec_sw = pl.BlockSpec((1, b, a), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    mat = lambda n: pl.BlockSpec((n, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    tile = pl.BlockSpec((TB, a, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def fn(s1, u, s2, x):
        B = x.shape[0]
        x3 = x.reshape(B, a, b)
        ut = u.reshape(a, b).T.reshape(1, b, a)
        y = pl.pallas_call(
            kernel,
            grid=(B // TB,),
            in_specs=[vec_nat, vec_sw, vec_nat, mat(a), mat(b), tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((B, a, b), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=(sem,),
            ),
        )(s2.reshape(1, a, b), ut, s1.reshape(1, a, b), Ha, Hb, x3)
        return y.reshape(B, D)

    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sizes", type=int, nargs="*", default=[16384])
    ap.add_argument("--tbs", type=int, nargs="*", default=[32, 128, 256])
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    for D in args.sizes:
        B = args.batch
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        s1 = jax.random.normal(ks[0], (D,), jnp.float32)
        u = jax.random.normal(ks[1], (D,), jnp.float32)
        s2 = jax.random.normal(ks[2], (D,), jnp.float32)
        x = jax.random.normal(ks[3], (B, D), jnp.float32)
        bytes_moved = 2 * B * D * 4

        def timed(fn3):
            # chain x -> fn(x) with the diagonals closed over
            f = lambda v: fn3(s1, u, s2, v)
            return chain_time(f, x, args.iters)

        t = timed(jax.jit(whvi_mul))
        print(json.dumps({"D": D, "variant": "xla", "us": round(t * 1e6, 1),
                          "GBps": round(bytes_moved / t / 1e9, 1)}), flush=True)
        t = timed(lambda a_, u_, b_, v: whvi_mul_pallas(a_, u_, b_, v))
        print(json.dumps({"D": D, "variant": "prod", "us": round(t * 1e6, 1),
                          "GBps": round(bytes_moved / t / 1e9, 1)}), flush=True)

        for TB in args.tbs:
            if B % TB:
                continue
            cands = [(name, lambda k=k, TB=TB: make_fn(k, TB, D))
                     for name, k in KERNELS.items()]
            cands.append(
                ("emit_full", lambda TB=TB: make_emit_full(B, D, TB))
            )
            for name, mk in cands:
                try:
                    fn = mk()
                    t = timed(fn)
                    row = {
                        "D": D, "variant": name, "TB": TB,
                        "us": round(t * 1e6, 1),
                        "GBps": round(bytes_moved / t / 1e9, 1),
                    }
                    if name in ("full", "emit_full"):
                        # these compute the real product: verify
                        y_ref = jax.jit(whvi_mul)(s1, u, s2, x)
                        y_got = fn(s1, u, s2, x)
                        row["rel_err"] = round(float(
                            jnp.max(jnp.abs(y_got - y_ref))
                            / (jnp.max(jnp.abs(y_ref)) + 1e-9)
                        ), 5)
                    print(json.dumps(row), flush=True)
                except Exception as e:
                    print(json.dumps({"D": D, "variant": name, "TB": TB,
                                      "error": str(e)[:160]}), flush=True)


if __name__ == "__main__" and "--floors" not in sys.argv:
    main()


# ---------------------------------------------------------------- DMA floors


def make_hbm_copy(B, D):
    """One whole-array DMA HBM->HBM: the raw DMA-engine floor."""

    def kern(x_ref, y_ref, sem):
        c = pltpu.make_async_copy(x_ref, y_ref, sem)
        c.start()
        c.wait()

    @jax.jit
    def fn(s1, u, s2, x):
        del s1, u, s2
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        )(x)

    return fn


def make_single_step(kernel, D, B):
    """Whole batch in ONE grid step (no pipeline): TB = B."""
    return make_fn(kernel, B, D)


def make_copy_2d(B, D, TB):
    """2D blocks (TB, D) instead of 3D — same bytes, simpler block shape."""

    def kern(x_ref, y_ref):
        y_ref[:] = x_ref[:]

    tile = pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def fn(s1, u, s2, x):
        del s1, u, s2
        return pl.pallas_call(
            kern,
            grid=(B // TB,),
            in_specs=[tile],
            out_specs=tile,
            out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024,
                dimension_semantics=("parallel",),
            ),
        )(x)

    return fn


def make_emit_copy(B, D, TB):
    """Copy via an inner emit_pipeline (manual pipeline, ANY memory)."""

    def inner(x_blk, y_blk):
        y_blk[:] = x_blk[:]

    def kern(x_hbm, y_hbm):
        pipe = pltpu.emit_pipeline(
            inner,
            grid=(B // TB,),
            in_specs=[pl.BlockSpec((TB, D), lambda i: (i, 0))],
            out_specs=[pl.BlockSpec((TB, D), lambda i: (i, 0))],
        )
        pipe(x_hbm, y_hbm)

    @jax.jit
    def fn(s1, u, s2, x):
        del s1, u, s2
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            out_shape=jax.ShapeDtypeStruct((B, D), x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024
            ),
        )(x)

    return fn


def main_floors():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--sizes", type=int, nargs="*", default=[16384])
    ap.add_argument("--tbs", type=int, nargs="*", default=[64, 128, 256])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--floors", action="store_true")
    args, _ = ap.parse_known_args()

    for D in args.sizes:
        B = args.batch
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        s1 = jax.random.normal(ks[0], (D,), jnp.float32)
        u = jax.random.normal(ks[1], (D,), jnp.float32)
        s2 = jax.random.normal(ks[2], (D,), jnp.float32)
        x = jax.random.normal(ks[3], (B, D), jnp.float32)
        bytes_moved = 2 * B * D * 4

        def timed(fn3):
            f = lambda v: fn3(s1, u, s2, v)
            return chain_time_scalar(f, x, args.iters)

        cands = [("hbm_copy", make_hbm_copy(B, D))]
        for TB in args.tbs:
            cands.append((f"copy2d/tb{TB}", make_copy_2d(B, D, TB)))
            cands.append((f"emit_copy/tb{TB}", make_emit_copy(B, D, TB)))
        cands.append((f"copy3d/tb{B}-1step", make_fn(k_copy, B, D)))
        for name, f in cands:
            try:
                t = timed(f)
                print(json.dumps({"D": D, "variant": name,
                                  "us": round(t * 1e6, 1),
                                  "GBps": round(bytes_moved / t / 1e9, 1)}),
                      flush=True)
            except Exception as e:
                print(json.dumps({"D": D, "variant": name,
                                  "error": str(e)[:160]}), flush=True)


if __name__ == "__main__" and "--floors" in sys.argv:
    main_floors()
