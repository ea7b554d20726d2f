"""Measure the dt-engine (fused discretization) vs the plane strip engine
at N=10M on the TPU, both aligned.  Writes results/dt_10m.json.

Rows:
  floor_empty       — today's tunnel dispatch floor.
  lml_plane/pkfs_plane — plane engine (with the round-4 pass-1 totals fold).
  lml_dt/pkfs_dt    — dt-engine (F/Q built in-kernel from the dt plane).
  train_step_plane  — value_and_grad of lml INCLUDING discretization
                      (get_ssm_tl inside), the real training-step cost.
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
    align = max(ps.strip_align(d, 4), dt_strip_align(d, 4))
    T = (10_000_000 // align) * align
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    kern = Matern52(0.8, 0.4)
    ts_j = jnp.asarray(t).reshape(-1, 1)
    R = jnp.asarray(0.1).reshape(1, 1)
    ssm = jax.jit(kern.get_ssm_tl)(ts_j, R)
    jax.block_until_ready(ssm)
    ys = jnp.asarray(y).reshape(-1, 1)
    emit(event="setup", T=T, align=align)

    f_empty = jax.jit(lambda x: x + 1.0)
    emit(bench="floor_empty", wall_ms=med(f_empty, ys[:8]) * 1e3)

    f_lml = jax.jit(lambda s, o: lml_tl(s, o, True))
    emit(bench="lml_plane", wall_ms=med(f_lml, ssm, ys) * 1e3)
    f_pkfs = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
    emit(bench="pkfs_plane", wall_ms=med(f_pkfs, ssm, ys) * 1e3)

    f_lml_dt = jax.jit(lambda k, tt, o: lml_dt(k, tt, R, o))
    v_dt = f_lml_dt(kern, ts_j, ys)
    v_pl = f_lml(ssm, ys)
    emit(
        event="parity",
        lml_dt=float(v_dt),
        lml_plane=float(v_pl),
        rel=abs(float(v_dt) - float(v_pl)) / abs(float(v_pl)),
    )
    emit(bench="lml_dt", wall_ms=med(f_lml_dt, kern, ts_j, ys) * 1e3)
    f_pkfs_dt = jax.jit(lambda k, tt, o: pkfs_dt(k, tt, R, o))
    g_dt = f_pkfs_dt(kern, ts_j, ys)
    g_pl = f_pkfs(ssm, ys)
    rel = float(
        jnp.max(jnp.abs(jnp.moveaxis(g_dt[0], -1, 0) - g_pl[0]))
        / (jnp.max(jnp.abs(g_pl[0])) + 1e-30)
    )
    emit(event="pkfs_parity", rel=rel)
    emit(bench="pkfs_dt", wall_ms=med(f_pkfs_dt, kern, ts_j, ys) * 1e3)

    # Training step: LML + grad including discretization.
    def train_plane(params, tt, o):
        k = Matern52(params[0], params[1])
        s = k.get_ssm_tl(tt, R)
        return lml_tl(s, o, True)

    p0 = jnp.asarray([0.8, 0.4], jnp.float32)
    f_tr = jax.jit(jax.value_and_grad(train_plane))
    emit(
        bench="train_step_plane",
        wall_ms=med(lambda p, tt, o: f_tr(p, tt, o)[1], p0, ts_j, ys) * 1e3,
    )

    # dt-engine training step: Fisher VJP with the dt filter forward, dt
    # smoother backward, planes materialized ONCE in the backward tail.
    def train_dt(params, tt, o):
        k = Matern52(params[0], params[1])
        return lml_dt(k, tt, R, o)

    f_tr_dt = jax.jit(jax.value_and_grad(train_dt))
    v_p = f_tr(p0, ts_j, ys)
    v_d = f_tr_dt(p0, ts_j, ys)
    emit(
        event="train_grad_parity",
        grad_plane=[float(x) for x in v_p[1]],
        grad_dt=[float(x) for x in v_d[1]],
    )
    emit(
        bench="train_step_dt",
        wall_ms=med(lambda p, tt, o: f_tr_dt(p, tt, o)[1], p0, ts_j, ys) * 1e3,
    )

    os.makedirs("results", exist_ok=True)
    with open("results/dt_10m.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
