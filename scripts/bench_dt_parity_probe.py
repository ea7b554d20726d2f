"""Explain the dt-vs-plane pkfs moment delta (2e-2 max-rel at N=10M f32).

Three candidate sources, isolated pairwise (TPU f32, d=3 Matern52):

  1. F/Q CONSTRUCTION: build_planes_tl (the dt-engine's closed forms,
     materialized in XLA) vs get_ssm_tl (ops/disc.py) — compared bitwise,
     then the SAME plane engine run on both.
  2. SCAN PATH: plane strip engine vs XLA TL engine on the SAME planes —
     the generic f32 reassociation floor between any two engines.
  3. SCALE: the plane-vs-dt delta at T=2^20 vs T~10M — does it accumulate?

Also reports WHERE the max delta sits (argmax index / time value) and the
H-projected posterior-mean delta (what a user actually reads).

Writes results/dt_parity_probe.json.
"""
from __future__ import annotations

import json
import os
import sys

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
        build_planes_tl,
        dt_strip_align,
        pkfs_dt,
    )
    from parallel_gps_tpu.kalman.timelast import pkfs_from_tl
    from parallel_gps_tpu.kernels import Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    kern = Matern52(0.8, 0.4)
    R = jnp.asarray(0.1).reshape(1, 1)

    def series(n_target):
        d = 3
        align = max(ps.strip_align(d, 4), dt_strip_align(d, 4))
        T = (n_target // align) * align
        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        return jnp.asarray(t).reshape(-1, 1), jnp.asarray(y).reshape(-1, 1), T

    def maxrel(a, b):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        diff = jnp.max(jnp.abs(a - b))
        return float(diff) / scale

    for n_target, tag in ((1 << 20, "T1M"), (10_000_000, "T10M")):
        ts_j, ys, T = series(n_target)
        emit(event="setup", tag=tag, T=T)

        ssm = jax.jit(kern.get_ssm_tl)(ts_j, R)
        jax.block_until_ready(ssm)

        # 1. Construction: dt closed forms materialized vs ops/disc.py.
        sde = kern.get_sde()
        coeffs, build = kern.transition_coeffs()
        dts = jnp.diff(
            ts_j.reshape(-1), prepend=jnp.zeros((1,), ts_j.dtype)
        )
        ssm_dt_planes = jax.jit(
            lambda c, p, dt: build_planes_tl(build, c, p, dt)
        )(coeffs, sde.P0, dts)
        dF = maxrel(ssm_dt_planes[0], ssm.Fs)
        dQ = maxrel(ssm_dt_planes[1], ssm.Qs)
        emit(event="construction", tag=tag, rel_F=dF, rel_Q=dQ)

        # 2. Engines on the same planes (all outputs kept time-last (d, T)).
        f_plane = jax.jit(
            lambda s, o: pkfs_from_tl(s, o, pallas=True, time_first_out=False)
        )
        g_pl = f_plane(ssm, ys)
        jax.block_until_ready(g_pl)
        g_pl_dtplanes = f_plane(ssm._replace(
            Fs=ssm_dt_planes[0], Qs=ssm_dt_planes[1], P0=ssm_dt_planes[2]
        ), ys)
        emit(event="plane_on_dt_planes", tag=tag,
             rel_mean=maxrel(g_pl_dtplanes[0], g_pl[0]))

        f_dt = jax.jit(lambda tt, o: pkfs_dt(kern, tt, R, o))
        g_dt = f_dt(ts_j, ys)  # time-last (d, T)
        m_pl = g_pl[0]
        diff = jnp.abs(g_dt[0] - m_pl)
        scale = jnp.max(jnp.abs(m_pl))
        idx = jnp.unravel_index(jnp.argmax(diff), diff.shape)
        emit(
            event="dt_vs_plane",
            tag=tag,
            rel_mean=float(jnp.max(diff) / (scale + 1e-30)),
            argmax=[int(i) for i in idx],
            t_at_argmax=float(ts_j.reshape(-1)[int(idx[-1])]),
            frac_above_1e3=float(
                jnp.mean((diff / (scale + 1e-30)) > 1e-3)
            ),
        )
        # H-projected posterior mean (the user-facing quantity).
        h = sde.H.reshape(-1)
        mu_dt = jnp.tensordot(h, g_dt[0], axes=(0, 0))
        mu_pl = jnp.tensordot(h, m_pl, axes=(0, 0))
        emit(event="dt_vs_plane_posterior_mean", tag=tag,
             rel=maxrel(mu_dt, mu_pl),
             rmse=float(jnp.sqrt(jnp.mean((mu_dt - mu_pl) ** 2))))

        if n_target == 1 << 20:
            # 3. XLA TL engine on the same planes (reassociation floor).
            f_xla = jax.jit(
                lambda s, o: pkfs_from_tl(
                    s, o, pallas=False, time_first_out=False
                )
            )
            g_x = f_xla(ssm, ys)
            emit(event="xla_vs_plane", tag=tag,
                 rel_mean=maxrel(g_x[0], g_pl[0]))
        del ssm, g_pl, g_dt, ssm_dt_planes

    os.makedirs("results", exist_ok=True)
    with open("results/dt_parity_probe.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
