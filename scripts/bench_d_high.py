"""TPU measurement battery: d > 8 (VERDICT r3 item 5).

Covers the gap above the fused engine's d<=8 auto-dispatch ceiling
(config.FUSED_MAX_D, results/d_sweep.json stops at d=8):

1. d=12 / d=16 (RBF order k) at N=1M: XLA time-last engine LML + pkfs, and
   an ATTEMPT at the fused strip kernels (pick_strip_block gives 128 there;
   the unrolled combine body is O(d^3) x 7 rounds, so Mosaic compile may be
   the binding constraint -- failures are recorded, not fatal).
2. The CO2 composite (Periodic(3)*M32 + M32, d=18 -- reference
   co2/mcmc.py:42-65) at the reference size T=3,192 AND at T=1M: LML, pkfs,
   LML+grad on the XLA time-last engine (Schur-recursed inverses).

Writes results/d_high.json.  The dispatch rule this records: fused strips
for d <= FUSED_MAX_D (=8), XLA time-last engine above it.
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

    def med(f, *args, reps=3, outer=3):
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

    def make(kern, T, seed=0):
        rng = np.random.RandomState(seed)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, seed).astype(np.float32)
        from parallel_gps_tpu.kalman.pallas_scan import strip_align

        a = strip_align(kern.state_dim, 4)
        Tp = -(-T // a) * a
        if Tp != T and T >= a:
            t = np.concatenate([t, np.full(Tp - T, t[-1], t.dtype)])
            y = np.concatenate([y, np.full(Tp - T, np.nan, y.dtype)])
        ssm = jax.jit(kern.get_ssm_tl)(
            jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
        )
        jax.block_until_ready(ssm)
        return ssm, jnp.asarray(y).reshape(-1, 1)

    T = int(os.environ.get("DHIGH_T", 1_000_000))
    probe = jnp.zeros((8,), jnp.float32)
    f_empty = jax.jit(lambda x: x + 1.0)
    emit(bench="floor_empty", wall_ms=med(f_empty, probe, reps=8) * 1e3)
    part = os.environ.get("DHIGH_PART", "all")  # rbf | co2 | all

    # ---- 1. d=12 / d=16 (RBF order k), N=1M -------------------------------
    # (d=16's Pade discretization OOMs at T=1M — dozens of (16,16,T) lane-
    # plane temps; DHIGH_DS/DHIGH_T shrink the attempt.  A TPU OOM wedges
    # the client for the rest of the process, so parts run separately.)
    ds = tuple(
        int(x) for x in os.environ.get("DHIGH_DS", "12,16").split(",") if x
    )
    for d in ds if part in ("rbf", "all") else ():
        kern = RBF(variance=1.0, lengthscales=0.25, order=d, balancing_iter=10)
        try:
            ssm, ys = make(kern, T)
        except Exception as e:  # noqa: BLE001
            emit(bench=f"make_d{d}", error=str(e)[:200])
            continue
        fx = jax.jit(lambda s, o: lml_tl(s, o, False))
        ex = float(fx(ssm, ys))
        emit(bench=f"lml_d{d}_N1M_value", xla=ex, finite=bool(np.isfinite(ex)))
        emit(bench=f"lml_d{d}_N1M", engine="xla",
             wall_ms=med(fx, ssm, ys) * 1e3)
        gx = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=False))
        emit(bench=f"pkfs_d{d}_N1M", engine="xla",
             wall_ms=med(gx, ssm, ys) * 1e3)
        vg = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, False)))
        emit(bench=f"lml_grad_d{d}_N1M", engine="xla",
             wall_ms=med(lambda s, o: vg(s, o)[1].P0, ssm, ys) * 1e3)

        # Fused-strip attempt (opt-in engine request above FUSED_MAX_D).
        if os.environ.get("DHIGH_FUSED", "1") == "1":
            try:
                fp = jax.jit(lambda s, o: lml_tl(s, o, True))
                ep = float(fp(ssm, ys))
                emit(bench=f"lml_d{d}_N1M_value", pallas=ep,
                     rel_diff=abs(ep - ex) / max(abs(ex), 1e-30))
                emit(bench=f"lml_d{d}_N1M", engine="pallas",
                     wall_ms=med(fp, ssm, ys) * 1e3)
                gp = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
                emit(bench=f"pkfs_d{d}_N1M", engine="pallas",
                     wall_ms=med(gp, ssm, ys) * 1e3)
            except Exception as e:  # noqa: BLE001
                emit(bench=f"fused_d{d}", error=str(e)[:300])
        del ssm, ys

    # ---- 2. CO2 composite d=18 --------------------------------------------
    from parallel_gps_tpu.experiments.co2.common import (
        get_covariance_function,
    )

    kern18 = get_covariance_function(3)
    emit(event="co2_kernel", d=kern18.state_dim)
    co2_sizes = ((3_192, "T3192"), (1_000_000, "T1M"))
    for Tc, label in co2_sizes if part in ("co2", "all") else ():
        try:
            ssm, ys = make(kern18, Tc, seed=1)
        except Exception as e:  # noqa: BLE001
            emit(bench=f"make_co2_{label}", error=str(e)[:200])
            continue
        fx = jax.jit(lambda s, o: lml_tl(s, o, False))
        ex = float(fx(ssm, ys))
        emit(bench=f"lml_co2_{label}_value", xla=ex,
             finite=bool(np.isfinite(ex)))
        emit(bench=f"lml_co2_{label}", engine="xla",
             wall_ms=med(fx, ssm, ys) * 1e3)
        gx = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=False))
        r = gx(ssm, ys)
        emit(event=f"pkfs_co2_{label}_finite",
             finite=bool(jnp.isfinite(r[0]).all()))
        emit(bench=f"pkfs_co2_{label}", engine="xla",
             wall_ms=med(gx, ssm, ys) * 1e3)
        vg = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, False)))
        emit(bench=f"lml_grad_co2_{label}", engine="xla",
             wall_ms=med(lambda s, o: vg(s, o)[1].P0, ssm, ys) * 1e3)
        del ssm, ys

    os.makedirs("results", exist_ok=True)
    suffix = "" if part == "all" else f"_{part}"
    with open(f"results/d_high{suffix}.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done", n=len(RESULTS))


if __name__ == "__main__":
    main()
