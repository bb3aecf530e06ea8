"""Settle the VPU bf16 elementwise-rate question (ROUND_NOTES round 2 open
item; VERDICT round 2 'next' #2).

Round 2's three attempts got constant-folded because the op chain hung off a
single input; this version feeds every FMA from TWO input arrays (x, w) and
uses four independent accumulators so the chain is throughput- not
latency-bound, exactly the documented fix.

Measures a pallas kernel doing P fused multiply-adds per element over a
(TILE, C) block in f32 vs bf16, grid over n_tiles. If bf16 ~2x, the dense
intersect kernel's candidate tests are worth converting (winner recomputed
in f32); if ~1x, the question is settled negative and recorded.

Run on the real chip: python experiments/bf16_rate_bench.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
C = 1024
PASSES = 64


def _kernel(x_ref, w_ref, o_ref, *, passes):
    x = x_ref[:]
    w = w_ref[:]
    a0 = x
    a1 = x * 1.0009765625  # exactly representable in bf16
    a2 = x * 1.001953125
    a3 = x * 1.0029296875
    for _ in range(passes // 4):
        a0 = a0 * w + x
        a1 = a1 * w + x
        a2 = a2 * w + x
        a3 = a3 * w + x
    o_ref[:] = ((a0 + a1) + (a2 + a3)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "passes", "n_tiles"))
def run(x, w, *, dtype, passes, n_tiles):
    xd = x.astype(dtype)
    wd = w.astype(dtype)
    return pl.pallas_call(
        functools.partial(_kernel, passes=passes),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, C), dtype),
    )(xd, wd)


def main():
    n_tiles = 64
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n_tiles * TILE, C), jnp.float32) + 0.5
    w = jnp.full((n_tiles * TILE, C), 0.99993896484375, jnp.float32)

    for passes in (16, 64, 256):
        for dtype in (jnp.float32, jnp.bfloat16):
            out = run(x, w, dtype=dtype, passes=passes, n_tiles=n_tiles)
            jax.block_until_ready(out)
            # serialize reps by CHAINING the output into the next call —
            # independent dispatches were measured 50x too fast through the
            # async tunnel (the first timing attempt's 52 Tflop/s artifact)
            reps = 10
            xi = x.astype(dtype)
            wi = w.astype(dtype)
            t0 = time.time()
            for _ in range(reps):
                xi = run(xi, wi, dtype=dtype, passes=passes, n_tiles=n_tiles)
            jax.block_until_ready(xi)
            dt = (time.time() - t0) / reps
            flops = 2 * passes * n_tiles * TILE * C
            print(f"passes={passes} {jnp.dtype(dtype).name}: "
                  f"{dt*1e3:.3f} ms, {flops/dt/1e12:.2f} Tflop/s")


if __name__ == "__main__":
    main()
