"""Composite kernels on the dt-engine vs plane engine vs XLA, N=1M TPU.

Round-4's composite transition_coeffs (Sum/Product/Periodic) put composite
Matérn/quasi-periodic kernels on the fused dt path with structural-zero
skipping.  This measures, per composite at N=1M f32:

  lml_dt / pkfs_dt      — dt-engine (F/Q rebuilt in registers, sparse)
  lml_plane / pkfs_plane — plane strip engine (F/Q streamed from HBM)
  lml_xla               — XLA time-last engine
  disc                  — get_ssm_tl alone (what the plane paths pay first)

Composites: Sum d=4 (M32+M32), Product d=4 (M32·M12), quasi-periodic d=8
(Periodic(1)·M32 — the CO2 shape at reduced order).  Writes
results/dt_composites.json.
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
    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
    from parallel_gps_tpu.kernels import Matern12, Matern32, Periodic
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=4, outer=4):
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

    probe = jnp.zeros((8,), jnp.float32)
    emit(bench="floor_empty",
         wall_ms=med(jax.jit(lambda x: x + 1.0), probe, reps=8) * 1e3)

    T0 = 1_000_000
    cases = [
        ("sum_d4", Matern32(1.0, 0.5) + Matern32(0.6, 0.15)),
        ("prod_d4", Matern32(1.0, 0.5) * Matern12(0.8, 0.4)),
        ("qp_d8", Periodic(1.0, 1.0, period=0.3, order=1) * Matern32(0.5, 0.8)),
    ]
    for name, kern in cases:
        d = kern.state_dim
        align = max(ps.strip_align(d, 4), dt_strip_align(d, 4))
        T = (T0 // align) * align
        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        ts_j = jnp.asarray(t).reshape(-1, 1)
        R = jnp.asarray(0.1).reshape(1, 1)
        ys = jnp.asarray(y).reshape(-1, 1)

        f_disc = jax.jit(kern.get_ssm_tl)
        ssm = f_disc(ts_j, R)
        jax.block_until_ready(ssm)
        emit(bench=f"disc_{name}", d=d, T=T,
             wall_ms=med(f_disc, ts_j, R, reps=3, outer=3) * 1e3)

        f_lx = jax.jit(lambda s, o: lml_tl(s, o, False))
        f_lp = jax.jit(lambda s, o: lml_tl(s, o, True))
        f_ld = jax.jit(lambda tt, o: lml_dt(kern, tt, R, o))
        ex, ep, ed = (
            float(f_lx(ssm, ys)), float(f_lp(ssm, ys)), float(f_ld(ts_j, ys))
        )
        emit(event=f"lml_{name}_value", xla=ex, plane=ep, dt=ed,
             rel_dt_vs_xla=abs(ed - ex) / max(abs(ex), 1e-30))
        emit(bench=f"lml_{name}", engine="xla",
             wall_ms=med(f_lx, ssm, ys, reps=3, outer=3) * 1e3)
        emit(bench=f"lml_{name}", engine="plane",
             wall_ms=med(f_lp, ssm, ys) * 1e3)
        emit(bench=f"lml_{name}", engine="dt",
             wall_ms=med(f_ld, ts_j, ys) * 1e3)

        f_pp = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
        f_pd = jax.jit(lambda tt, o: pkfs_dt(kern, tt, R, o))
        emit(bench=f"pkfs_{name}", engine="plane",
             wall_ms=med(f_pp, ssm, ys) * 1e3)
        emit(bench=f"pkfs_{name}", engine="dt",
             wall_ms=med(f_pd, ts_j, ys) * 1e3)

        # Training step from hyperparameters (includes discretization where
        # the engine needs it) — the honest end-to-end comparison.
        # Differentiates w.r.t. the kernel pytree's hyperparameter leaves.
        def tr_plane(k, tt, o):
            return lml_tl(k.get_ssm_tl(tt, R), o, True)

        def tr_dt(k, tt, o):
            return lml_dt(k, tt, R, o)

        kern_f32 = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32), kern
        )
        g_pl = jax.jit(jax.value_and_grad(tr_plane))
        g_dt = jax.jit(jax.value_and_grad(tr_dt))
        emit(bench=f"train_{name}", engine="plane",
             wall_ms=med(lambda a, b, c: g_pl(a, b, c)[1], kern_f32, ts_j,
                         ys, reps=3, outer=3) * 1e3)
        emit(bench=f"train_{name}", engine="dt",
             wall_ms=med(lambda a, b, c: g_dt(a, b, c)[1], kern_f32, ts_j,
                         ys, reps=3, outer=3) * 1e3)
        del ssm, ys, ts_j

    os.makedirs("results", exist_ok=True)
    with open("results/dt_composites.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
