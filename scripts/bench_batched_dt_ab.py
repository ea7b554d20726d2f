"""Batched (vmapped-chains) A/B: dt-engine entry vs plane path (VERDICT r4
item 8).

The dt entry points fall back under vmap to per-element plane
materialization + the batched-sublane PLANE kernels (pallas_dt custom_vmap
rules), so batched MCMC loses the discretization-skip the dt-engine was
built for.  This measures what that costs at the production shapes
(32/64 chains x T=65,536, Matern32), per-chain hyperparameters:

  lml_plane_B*    — vmap(lml_tl ∘ get_ssm_tl)    (the round-2 batched path)
  lml_dt_B*       — vmap(lml_dt)                 (dt entry, vmap fallback)
  vg_plane_B*     — vmap(value_and_grad(...))    (the MCMC leapfrog step)
  vg_dt_B*        — ditto through lml_dt

B=64 runs as two 32-chain chunks via lax.map (the XLA fusion cliff beyond
~32 chains — CLAUDE.md), mirroring inference.sample_chains.  Writes
results/batched_dt_ab.json.
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

    from parallel_gps_tpu.kalman.pallas_dt import lml_dt
    from parallel_gps_tpu.kalman.timelast import lml_tl
    from parallel_gps_tpu.kernels import Matern32
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    def med(f, *args, reps=5, outer=3):
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

    T = 65_536
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    ts_j = jnp.asarray(t).reshape(-1, 1)
    ys = jnp.asarray(y).reshape(-1, 1)
    emit(event="setup", T=T)

    def lml_plane_one(p):
        kern = Matern32(p[0], p[1])
        return lml_tl(kern.get_ssm_tl(ts_j, p[2].reshape(1, 1)), ys, True)

    def lml_dt_one(p):
        return lml_dt(Matern32(p[0], p[1]), ts_j, p[2].reshape(1, 1), ys)

    for B in (32, 64):
        rngp = np.random.RandomState(B)
        ps = jnp.asarray(
            np.stack(
                [
                    0.7 + 0.6 * rngp.rand(B),
                    0.3 + 0.4 * rngp.rand(B),
                    0.05 + 0.1 * rngp.rand(B),
                ],
                axis=-1,
            ),
            jnp.float32,
        )

        def chunked(f, ps_):
            if B <= 32:
                return jax.vmap(f)(ps_)
            return jax.lax.map(jax.vmap(f), ps_.reshape(2, B // 2, 3)).reshape(B)

        def chunked_vg(f, ps_):
            vg = jax.vmap(jax.value_and_grad(f))
            if B <= 32:
                return vg(ps_)
            out = jax.lax.map(vg, ps_.reshape(2, B // 2, 3))
            return jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), out)

        f_pl = jax.jit(lambda ps_: chunked(lml_plane_one, ps_))
        f_dt = jax.jit(lambda ps_: chunked(lml_dt_one, ps_))
        v_pl = f_pl(ps)
        v_dt = f_dt(ps)
        emit(event=f"parity_B{B}",
             max_rel=float(jnp.max(jnp.abs(v_dt - v_pl)
                                   / jnp.abs(v_pl))))
        emit(bench=f"lml_plane_B{B}", wall_ms=med(f_pl, ps) * 1e3)
        emit(bench=f"lml_dt_B{B}", wall_ms=med(f_dt, ps) * 1e3)

        g_pl = jax.jit(lambda ps_: chunked_vg(lml_plane_one, ps_))
        g_dt = jax.jit(lambda ps_: chunked_vg(lml_dt_one, ps_))
        gv_pl = g_pl(ps)
        gv_dt = g_dt(ps)
        emit(event=f"grad_parity_B{B}",
             max_rel=float(jnp.max(jnp.abs(gv_dt[1] - gv_pl[1])
                                   / (jnp.max(jnp.abs(gv_pl[1])) + 1e-30))))
        emit(bench=f"vg_plane_B{B}",
             wall_ms=med(lambda ps_: g_pl(ps_)[1], ps) * 1e3)
        emit(bench=f"vg_dt_B{B}",
             wall_ms=med(lambda ps_: g_dt(ps_)[1], ps) * 1e3)

    os.makedirs("results", exist_ok=True)
    with open("results/batched_dt_ab.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
