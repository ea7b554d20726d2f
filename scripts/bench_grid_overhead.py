"""Locate the strip kernels' per-grid-step overhead (TPU, N=10M d=3).

Round-4 attribution (results/r4_attrib.json) showed an EMPTY pass-1 scan
still costs ~8 ms device at block=1024 — grid/pipelining overhead, not
combine arithmetic.  If that cost is per grid STEP, halving the step count
(block 1024 -> 2048) should halve it; if it is input streaming, it should
not move.  This sweeps block in {512, 1024, 2048} for:

  lml_dt / pkfs_dt  — dt-engine (tiny inputs: dt+y rows only, so HBM
                      streaming is negligible and overhead dominates)
  lml_plane         — plane engine via strip_filter directly (22 input rows)

Writes results/grid_overhead.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman import pallas_scan as ps
    from parallel_gps_tpu.kalman.pallas_dt import (
        dt_strip_align,
        lml_dt,
        pkfs_dt,
    )
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=3, outer=4):
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

    d = 3
    align = max(ps.strip_align(d, 4), dt_strip_align(d, 4), 8 * 2048)
    T = (10_000_000 // align) * align
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    kern = Matern52(0.8, 0.4)
    ts_j = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ys = jnp.asarray(y).reshape(-1, 1)
    emit(event="setup", T=T, align=align)

    probe = jnp.zeros((8,), jnp.float32)
    floor = med(jax.jit(lambda x: x + 1.0), probe, reps=8)
    emit(bench="floor_empty", wall_ms=floor * 1e3)

    for block in (512, 1024, 2048):
        try:
            f_l = jax.jit(
                lambda tt, o, b=block: lml_dt(kern, tt, R, o, block=b)
            )
            emit(bench="lml_dt", block=block,
                 wall_ms=med(f_l, ts_j, ys) * 1e3)
        except Exception as e:  # noqa: BLE001
            emit(bench="lml_dt", block=block, error=str(e)[:200])
        try:
            f_p = jax.jit(
                lambda tt, o, b=block: pkfs_dt(kern, tt, R, o, block=b)
            )
            emit(bench="pkfs_dt", block=block,
                 wall_ms=med(f_p, ts_j, ys) * 1e3)
        except Exception as e:  # noqa: BLE001
            emit(bench="pkfs_dt", block=block, error=str(e)[:200])

    # Plane engine reference at its production block (via lml_tl) once.
    ssm = jax.jit(kern.get_ssm_tl)(ts_j, R)
    jax.block_until_ready(ssm)
    f_lp = jax.jit(lambda s, o: lml_tl(s, o, True))
    emit(bench="lml_plane", block="auto", wall_ms=med(f_lp, ssm, ys) * 1e3)

    os.makedirs("results", exist_ok=True)
    with open("results/grid_overhead.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
