"""Grid-overhead isolation sweep (VERDICT r4 item 1).

The round-4 attribution showed an EMPTY pass costs ~8 ms device at N=10M
block=1024 (~6.5 µs per grid step, two passes pay it twice) while streaming
22 planes read-only costs nothing above the dispatch floor.  This sweep
isolates WHAT scales with grid-step count by timing minimal kernels over a
fixed T ≈ 10M f32 lane budget while varying:

  block ∈ {256, 512, 1024, 2048, 4096}   (grid B = T / (8·block))
  kernel ∈
    noop        — reads nothing, writes one revisited (1,8,128) tile
    stream3     — streams 3 single-row planes (the dt filter's input set)
    stream22    — streams 22 rows of planes (plane filter's input set)
    carry33     — noop + a (33,8,128) scratch carry read+broadcast-write
                  per step (the strip filter's carry plumbing)
    outwrite12  — stream3 + writes 12 output rows per step (pass-2 shape)

Per-step cost = slope of wall vs B.  Writes results/grid_isolation.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=5, outer=4):
        r = f(*args)
        jax.tree.map(lambda x: x.block_until_ready(), r)
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            for _ in range(reps):
                r = f(*args)
            float(jnp.sum(jax.tree.leaves(r)[0]))
            ts.append((time.perf_counter() - t0) / reps)
        return min(ts)

    S = 8
    T = 10_000_000
    W = -(-T // (S * 4096)) * 4096  # aligned for every block in the sweep
    dtype = jnp.float32

    x3 = jnp.asarray(np.random.rand(3, S, W), dtype)
    x22 = jnp.asarray(np.random.rand(22, S, W), dtype)
    jax.block_until_ready((x3, x22))

    f_empty = jax.jit(lambda x: x + 1.0)
    emit(bench="floor_empty", wall_ms=med(f_empty, x3[:1, :1, :8]) * 1e3)

    def run(name, block, nrows, kernel, extra_out=None, scratch=None, x=None):
        B = W // block
        mk = pl.BlockSpec((nrows, S, block), lambda i: (0, 0, i),
                          memory_space=pltpu.VMEM)
        out_specs = pl.BlockSpec((1, S, 128), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, S, 128), dtype)
        if extra_out:
            out_specs = (out_specs,
                         pl.BlockSpec((extra_out, S, block),
                                      lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM))
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((extra_out, S, W), dtype))
        fn = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[mk],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch or [],
        )
        wall = med(jax.jit(fn), x)
        emit(bench=name, block=block, grid_steps=B, wall_ms=wall * 1e3,
             us_per_step=wall * 1e6 / B)

    def k_noop(x_ref, out_ref):
        out_ref[:] = jnp.ones_like(out_ref)

    def k_stream(x_ref, out_ref):
        s = jnp.sum(x_ref[:, :, 0:128], axis=0)
        out_ref[:] = s[None]

    def k_carry(x_ref, out_ref, carry_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry_ref[:] = jnp.zeros_like(carry_ref)

        cols = [carry_ref[k, :, 0:1] for k in range(33)]
        edge = [c + float(k) for k, c in enumerate(cols)]
        carry_ref[:] = jnp.broadcast_to(
            jnp.stack(edge, axis=0), carry_ref.shape
        )
        out_ref[:] = carry_ref[0:1]

    def k_outwrite(x_ref, out_ref, big_ref):
        s = x_ref[0:1]
        big_ref[:] = jnp.concatenate([s] * 12, axis=0)
        out_ref[:] = s[:, :, 0:128]

    for block in (256, 512, 1024, 2048, 4096):
        run("noop", block, 1, k_noop, x=x3[:1])
        run("stream3", block, 3, k_stream, x=x3)
        run("stream22", block, 22, k_stream, x=x22)
        run("carry33", block, 1, k_carry,
            scratch=[pltpu.VMEM((33, S, 128), dtype)], x=x3[:1])
        run("outwrite12", block, 3, k_outwrite, extra_out=12, x=x3)

    os.makedirs("results", exist_ok=True)
    with open("results/grid_isolation.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
