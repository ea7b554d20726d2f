"""DMA-efficiency probe for the strip kernels' block pipeline.

The attribution run (results/scan_attrib.json) showed the whole in-kernel
scan costs ~5 ms of the 40.5 ms N=10M filter: the rest is scaffolding that
scales with bytes but not with block size.  This probe times a pure-copy
pallas kernel over the SAME (nrows, S, W) layout and BlockSpecs as the
production kernels (sublane rows strided W*4 bytes apart in HBM) against a
"blocked" layout (B, nrows, S, block) where each grid step's tile is one
contiguous region — if the strided copy runs at ~50 GB/s and the blocked
copy near HBM speed, the production kernels are strided-DMA-bound and a
layout change is the fix.
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
            float(jnp.sum(jax.tree.leaves(r)[0].ravel()[:8]))
            ts.append((time.perf_counter() - t0) / reps)
        return min(ts)

    def copy_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:]

    n, S, W = 27, 8, 1_250_000  # the d=3 filter element tile at T=10M
    T = S * W

    for block in (1024, 2048):
        B = W // block
        Wp = B * block
        x = jnp.ones((n, S, Wp), jnp.float32)

        # 1. Production-style strided tiles: (n, S, block) out of (n, S, W).
        f_str = jax.jit(
            lambda x: pl.pallas_call(
                copy_kernel,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (n, S, block), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (n, S, block), lambda i: (0, 0, i),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((n, S, Wp), jnp.float32),
            )(x)
        )
        gb = 2 * n * S * Wp * 4 / 1e9  # read + write
        w = med(f_str, x)
        emit(bench="copy_strided", block=block, wall_ms=w * 1e3,
             eff_gbps=gb / w)

        # 2. Blocked-contiguous tiles: (1, n, S, block) out of (B, n, S, block).
        xb = jnp.ones((B, n, S, block), jnp.float32)
        f_blk = jax.jit(
            lambda x: pl.pallas_call(
                copy_kernel,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (1, n, S, block), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, n, S, block), lambda i: (i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct((B, n, S, block), jnp.float32),
            )(x)
        )
        w = med(f_blk, xb)
        emit(bench="copy_blocked", block=block, wall_ms=w * 1e3,
             eff_gbps=gb / w)

        # 3. XLA copy of the same bytes (reference for HBM speed).
        f_xla = jax.jit(lambda x: x + 1.0)
        w = med(f_xla, x)
        emit(bench="copy_xla_add1", block=block, wall_ms=w * 1e3,
             eff_gbps=gb / w)
        del x, xb

    os.makedirs("results", exist_ok=True)
    with open("results/dma_probe.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done", n=len(RESULTS))


if __name__ == "__main__":
    main()
