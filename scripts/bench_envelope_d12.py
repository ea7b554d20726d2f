"""f32 conditioning envelope at d=12 (VERDICT r4 item 5a).

Round 4 recorded RBF-12 N=1M f32 LML = NaN and called d>8 at large T "f64
territory" — but the onset was probed only at N=1M, while the reference's
own stability sweeps stop at T=32,768
(/root/reference/pssgp/experiments/toy_models/speed_and_stability.py:73).
This sweep finds the f32 NaN onset over T ∈ {4k, 16k, 32k, 128k, 1M}: if
T=32k is finite, the repo covers on-accelerator every size the reference
ever ran at d=12 (its d≥12 runs are f64-only).  XLA time-last engine
(d>8 dispatch rule).  Writes results/envelope_d12.json.
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

    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
    from parallel_gps_tpu.kernels import RBF
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    emit(event="start", device=jax.devices()[0].platform)

    kern = RBF(1.0, 0.25, order=12)

    for T in (4096, 16384, 32768, 131072, 1 << 20):
        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32) * 4.0
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        ts = jnp.asarray(t).reshape(-1, 1)
        R = jnp.asarray(0.1, jnp.float32).reshape(1, 1)
        ys = jnp.asarray(y).reshape(-1, 1)
        try:
            ssm = jax.jit(kern.get_ssm_tl)(ts, R)
            jax.block_until_ready(ssm)
            t0 = time.perf_counter()
            ell = float(jax.jit(lambda s, o: lml_tl(s, o, False))(ssm, ys))
            wall = time.perf_counter() - t0
            g, P = jax.jit(
                lambda s, o: pkfs_from_tl(s, o, pallas=False,
                                          time_first_out=False)
            )(ssm, ys)
            var_ok = bool(jnp.all(jnp.isfinite(P)))
            var_pos = bool(
                jnp.all(P[jnp.arange(12), jnp.arange(12), :] > -1e-3)
            )
            emit(case=f"T={T}", T=T, lml=ell,
                 lml_finite=bool(np.isfinite(ell)),
                 moments_finite=var_ok, variances_nonneg=var_pos,
                 first_call_wall_s=round(wall, 2))
            del ssm, g, P
        except Exception as e:  # noqa: BLE001
            emit(case=f"T={T}", T=T, error=str(e)[:200])

        # Square-root engine with quadrature (Gramian) factored
        # discretization (kalman/sqrt.py::sqrt_pkf_kernel): does the
        # Cholesky-factor combine move the f32 NaN onset? (VERDICT r4 5b)
        try:
            from parallel_gps_tpu.kalman.sqrt import sqrt_pkf_kernel

            t0 = time.perf_counter()
            ms, Us, ell_s = jax.jit(
                lambda tt, o: sqrt_pkf_kernel(
                    kern, tt, R, o, return_loglikelihood=True
                )
            )(ts, ys)
            jax.block_until_ready(ms)
            wall_s = time.perf_counter() - t0
            emit(case=f"sqrt_T={T}", T=T, engine="sqrt-quadrature",
                 lml=float(ell_s), lml_finite=bool(np.isfinite(float(ell_s))),
                 moments_finite=bool(jnp.all(jnp.isfinite(ms))),
                 first_call_wall_s=round(wall_s, 2))
            del ms, Us
        except Exception as e:  # noqa: BLE001
            emit(case=f"sqrt_T={T}", T=T, engine="sqrt-quadrature",
                 error=str(e)[:200])

    os.makedirs("results", exist_ok=True)
    with open("results/envelope_d12.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done")


if __name__ == "__main__":
    main()
