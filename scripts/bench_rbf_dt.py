"""RBF spectral closed forms on hardware (VERDICT r4 item 3 done-criterion).

Round-5 gives RBF order ≤ 8 (a) elementwise spectral transitions for the
plane path's discretization (kernels/rbf.py::transitions_m1_tl — replaces
the 13th-order Padé solve, which cost ~62 ms at d=6 N=1M in round 2) and
(b) a transition_coeffs build for the dt-engine (planes never exist).
Rows at N=1M f32, order ∈ {4, 6, 8}:

  disc_spectral  — get_ssm_tl wall (was Padé in rounds 2-4)
  lml_plane      — fused strip engine on the planes (round-3 crossover rows)
  lml_dt         — dt-engine straight from (kernel, ts)
  train_plane    — value_and_grad incl. discretization, plane path
  train_dt       — value_and_grad through lml_dt (fused Fisher backward)

Writes results/rbf_dt.json.
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
    from parallel_gps_tpu.kalman.pallas_dt import dt_strip_align, lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import RBF
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=4, outer=3):
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

    f_empty = jax.jit(lambda x: x + 1.0)
    probe = jnp.zeros((8,), jnp.float32)
    emit(bench="floor_empty", wall_ms=med(f_empty, probe, reps=8) * 1e3)

    for order in (4, 6, 8):
        kern = RBF(1.0, 0.5, order=order)
        align = max(
            ps.strip_align(order, 4), dt_strip_align(order, 4)
        )
        T = (1_000_000 // align) * align
        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        ts_j = jnp.asarray(t).reshape(-1, 1)
        R = jnp.asarray(0.1, jnp.float32).reshape(1, 1)
        ys = jnp.asarray(y).reshape(-1, 1)
        emit(event="setup", order=order, T=T)

        f_disc = jax.jit(lambda tt: kern.get_ssm_tl(tt, R))
        emit(bench=f"disc_spectral_d{order}",
             wall_ms=med(f_disc, ts_j) * 1e3)
        ssm = f_disc(ts_j)
        jax.block_until_ready(ssm)

        f_lml = jax.jit(lambda s, o: lml_tl(s, o, True))
        v_pl = f_lml(ssm, ys)
        emit(bench=f"lml_plane_d{order}", wall_ms=med(f_lml, ssm, ys) * 1e3)

        f_ldt = jax.jit(lambda tt, o: lml_dt(kern, tt, R, o))
        v_dt = f_ldt(ts_j, ys)
        emit(event=f"parity_d{order}", lml_plane=float(v_pl),
             lml_dt=float(v_dt),
             rel=abs(float(v_dt) - float(v_pl))
             / (abs(float(v_pl)) + 1e-30))
        emit(bench=f"lml_dt_d{order}", wall_ms=med(f_ldt, ts_j, ys) * 1e3)

        def train_plane(p, tt, o):
            k = RBF(p[0], p[1], order=order)
            return lml_tl(k.get_ssm_tl(tt, R), o, True)

        def train_dt(p, tt, o):
            return lml_dt(RBF(p[0], p[1], order=order), tt, R, o)

        p0 = jnp.asarray([1.0, 0.5], jnp.float32)
        f_tp = jax.jit(jax.value_and_grad(train_plane))
        emit(bench=f"train_plane_d{order}",
             wall_ms=med(lambda *a: f_tp(*a)[1], p0, ts_j, ys) * 1e3)
        f_td = jax.jit(jax.value_and_grad(train_dt))
        g_pl = f_tp(p0, ts_j, ys)
        g_dt = f_td(p0, ts_j, ys)
        emit(event=f"grad_parity_d{order}",
             grad_plane=[float(x) for x in g_pl[1]],
             grad_dt=[float(x) for x in g_dt[1]])
        emit(bench=f"train_dt_d{order}",
             wall_ms=med(lambda *a: f_td(*a)[1], p0, ts_j, ys) * 1e3)
        del ssm

    os.makedirs("results", exist_ok=True)
    with open("results/rbf_dt.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
