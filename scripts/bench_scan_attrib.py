"""Attribute the strip-scan's cost: rolls vs selects vs combine arithmetic.

Round-3 finding (BASELINE.md): cutting combine arithmetic ~25% moved pkfs
wall <2% at N=10M, so the kernels are NOT arithmetic-count-bound.  This
script times deliberately-WRONG variants of the filter scan (monkeypatched
internals, identical program shape) to locate the actual limiter:

  A baseline        — production kernel (correct).
  B no_roll         — pltpu.roll replaced by identity: removes the
                      27-rows x 7-rounds lane permutes.
  C no_roll_select  — KS round body = combine(rows, rows): no rolls, no
                      masks/identity materialization; pure combine chain.
  D trivial_combine — combine = elementwise add: keeps rolls+selects,
                      removes ~97% of the arithmetic.

Timing-only: B/C/D compute garbage (documented, asserted NOT to be used
for values).  Run standalone on the TPU; writes results/scan_attrib.json.
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

    T = 10_000_000
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    ssm = Matern52(0.8, 0.4).get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
    )
    ys = jnp.asarray(y).reshape(-1, 1)

    orig_roll = ps._roll
    orig_rounds = ps._strip_ks_rounds
    orig_combine = ps._filt_combine_rows

    def timed(label):
        f = jax.jit(lambda s, o: lml_tl(s, o, True))
        emit(variant=label, bench="lml_d3_N10M", wall_ms=med(f, ssm, ys) * 1e3)

    try:
        timed("A_baseline")

        ps._roll = lambda x, shift, reverse: x
        timed("B_no_roll")
        ps._roll = orig_roll

        def rounds_no_comm(rows, combine_rows, d, ident_rows, reverse):
            import math as _m

            Lb = rows[0].shape[1]
            n_rounds = max(1, int(_m.ceil(_m.log2(Lb)))) if Lb > 1 else 0
            for _ in range(n_rounds):
                rows = combine_rows(rows, rows, d)
            return rows

        ps._strip_ks_rounds = rounds_no_comm
        timed("C_no_roll_select")
        ps._strip_ks_rounds = orig_rounds

        ps._filt_combine_rows = lambda a, b, d: [x + y for x, y in zip(a, b)]
        timed("D_trivial_combine")
        ps._filt_combine_rows = orig_combine
    finally:
        ps._roll = orig_roll
        ps._strip_ks_rounds = orig_rounds
        ps._filt_combine_rows = orig_combine

    os.makedirs("results", exist_ok=True)
    with open("results/scan_attrib.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done", n=len(RESULTS))


if __name__ == "__main__":
    main()
