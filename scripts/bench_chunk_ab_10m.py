"""N=10M chunked-vs-Kogge-Stone in-block scan A/B (round 3 follow-up).

The N=1M A/B in bench_d_sweep.py is masked by the tunnel's ~4 ms dispatch
floor; at N=10M device time dominates (~80 ms), so a real VPU-work delta
between the chunked (≈9 combines/element) and Kogge-Stone
(log2(block)+2 combines/element) in-block scans must show here if it exists.
Also records the N=10M LML+grad wall (Fisher VJP) for the BASELINE table.
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

    from parallel_gps_tpu.kalman import pallas_scan as _ps
    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
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

    T = 10_000_000
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    kern = Matern52(0.8, 0.4)
    ssm = kern.get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    ys = jnp.asarray(y).reshape(-1, 1)

    for block in (512, 1024):
        for label, chunk in (("chunked", 128), ("kogge_stone", 1 << 30)):
            _ps._SCAN_CHUNK = chunk
            fk = jax.jit(
                lambda s, o, b=block: pkfs_from_tl(s, o, pallas=True, block=b)
            )
            fl = jax.jit(
                lambda s, o, b=block: lml_tl(s, o, True)
            ) if block == 512 else None
            emit(bench="pkfs_d3_N10M_scan_ab", block=block, scan=label,
                 wall_ms=med(fk, ssm, ys) * 1e3)
            if fl is not None:
                emit(bench="lml_d3_N10M_scan_ab", block=block, scan=label,
                     wall_ms=med(fl, ssm, ys) * 1e3)
    _ps._SCAN_CHUNK = 128

    # N=10M training-step wall for the BASELINE table (round-2 row: 163 ms).
    vg = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, True)))
    emit(bench="lml_grad_d3_N10M",
         wall_ms=med(lambda s, o: vg(s, o)[1].P0, ssm, ys) * 1e3)

    os.makedirs("results", exist_ok=True)
    with open("results/chunk_ab_10m.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done", n=len(RESULTS))


if __name__ == "__main__":
    main()
