"""TPU measurement battery: strip block-size sweep + d=6 fused-engine bench.

Run on the tunneled chip (plain ``python scripts/bench_d_sweep.py``); writes
one JSON line per measurement to stdout and a summary to
``results/d_sweep.json``.  Covers:

1. d=3 (Matern32) N=1M: pkfs + LML across strip block sizes — the
   (log2(block)+2)-combines-per-element tradeoff (kalman/pallas_scan.py).
2. N=10M d=3 (Matern52) block sweep — device time dominates there, so the
   block effect is visible through the tunnel's ~3 ms dispatch floor.
3. d=6 (RBF order 6) N=1M: fused Pallas vs XLA time-last engine — LML,
   pkfs, LML+grad (Fisher VJP) — the VERDICT-2 d>3 fast-path question.
4. d=6 f32 accuracy vs the recorded CPU f64 truth (BASELINE.md round-3
   notes): rel err should sit at the ~3e-5 f32 conditioning floor.

Known truths (CPU f64, see BASELINE.md): RBF-6 T=65,536 seed=42 LML =
11880.51690343001; Matern32 N=1M bench-data LML = 181806.12359865863.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

D6_TRUTH = 11880.51690343001
RESULTS: list[dict] = []


def emit(**kw):
    RESULTS.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from parallel_gps_tpu.config import enable_compilation_cache

    enable_compilation_cache()

    from parallel_gps_tpu.kalman.timelast import (
        lml_tl,
        pkf_from_tl,
        pkfs_from_tl,
    )
    from parallel_gps_tpu.kernels import RBF, Matern32, Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu

    dev = jax.devices()[0].platform
    emit(event="start", device=dev)

    def med(f, *args, reps=10, outer=5):
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

    def make(kern, T, seed=0, align=True):
        rng = np.random.RandomState(seed)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, seed).astype(np.float32)
        if align:
            # Born strip-aligned (identity tail): the production layout
            # (models/ssgp.py::_align_pad, bench.py::_align_np).
            from parallel_gps_tpu.kalman.pallas_scan import strip_align

            a = strip_align(kern.state_dim, 4)
            Tp = -(-T // a) * a
            if Tp != T and T >= a:
                t = np.concatenate([t, np.full(Tp - T, t[-1], t.dtype)])
                y = np.concatenate([y, np.full(Tp - T, np.nan, y.dtype)])
        ssm = kern.get_ssm_tl(
            jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1)
        )
        return ssm, jnp.asarray(y).reshape(-1, 1)

    # ---- 1. d=3 block sweep, N=1M ----------------------------------------
    T = 1_000_000
    ssm3, ys3 = make(Matern32(1.0, 0.5), T)
    for block in (256, 512, 1024, 2048):
        fk = jax.jit(lambda s, o, b=block: pkfs_from_tl(s, o, pallas=True, block=b))
        fl = jax.jit(
            lambda s, o, b=block: pkf_from_tl(s, o, True, pallas=True, block=b)[2]
        )
        emit(bench="pkfs_d3_N1M", block=block, wall_ms=med(fk, ssm3, ys3) * 1e3)
        emit(bench="lml_d3_N1M", block=block, wall_ms=med(fl, ssm3, ys3) * 1e3)

    # ---- 1b. chunked vs unchunked in-block scan A/B (round 3) -------------
    # Same binary, same data: disable the 128-lane chunk decomposition by
    # raising _SCAN_CHUNK past any block (fresh jit objects force retrace).
    from parallel_gps_tpu.kalman import pallas_scan as _ps

    for block in (512, 1024, 2048):
        for label, chunk in (("chunked", 128), ("kogge_stone", 1 << 30)):
            _ps._SCAN_CHUNK = chunk
            fk = jax.jit(
                lambda s, o, b=block: pkfs_from_tl(s, o, pallas=True, block=b)
            )
            fl = jax.jit(
                lambda s, o, b=block: pkf_from_tl(s, o, True, pallas=True, block=b)[2]
            )
            emit(bench="pkfs_d3_N1M_scan_ab", block=block, scan=label,
                 wall_ms=med(fk, ssm3, ys3) * 1e3)
            emit(bench="lml_d3_N1M_scan_ab", block=block, scan=label,
                 wall_ms=med(fl, ssm3, ys3) * 1e3)
    _ps._SCAN_CHUNK = 128

    # ---- 2. N=10M block sweep ---------------------------------------------
    T10 = 10_000_000
    ssm10, ys10 = make(Matern52(0.8, 0.4), T10)
    for block in (256, 512, 1024, 2048):
        fk = jax.jit(lambda s, o, b=block: pkfs_from_tl(s, o, pallas=True, block=b))
        try:
            emit(
                bench="pkfs_d3_N10M",
                block=block,
                wall_ms=med(fk, ssm10, ys10, reps=3, outer=3) * 1e3,
            )
        except Exception as e:  # noqa: BLE001 — sweep records failures
            emit(bench="pkfs_d3_N10M", block=block, error=str(e)[:160])
    del ssm10, ys10

    # ---- 3. d=6 fused vs XLA ----------------------------------------------
    kern6 = RBF(variance=1.0, lengthscales=0.25, order=6, balancing_iter=10)
    ssm6, ys6 = make(kern6, T)
    f_x = jax.jit(lambda s, o: lml_tl(s, o, False))
    f_p = jax.jit(lambda s, o: lml_tl(s, o, True))
    ex, ep = float(f_x(ssm6, ys6)), float(f_p(ssm6, ys6))
    emit(bench="lml_d6_N1M_value", xla=ex, pallas=ep,
         rel_diff=abs(ep - ex) / abs(ex))
    emit(bench="lml_d6_N1M", engine="xla",
         wall_ms=med(f_x, ssm6, ys6, reps=3, outer=3) * 1e3)
    emit(bench="lml_d6_N1M", engine="pallas", wall_ms=med(f_p, ssm6, ys6) * 1e3)

    fk_x = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=False))
    fk_p = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
    emit(bench="pkfs_d6_N1M", engine="xla",
         wall_ms=med(fk_x, ssm6, ys6, reps=3, outer=3) * 1e3)
    emit(bench="pkfs_d6_N1M", engine="pallas",
         wall_ms=med(fk_p, ssm6, ys6) * 1e3)

    vg_x = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, False)))
    vg_p = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, True)))
    emit(bench="lml_grad_d6_N1M", engine="xla",
         wall_ms=med(lambda s, o: vg_x(s, o)[1].P0, ssm6, ys6, reps=3, outer=3) * 1e3)
    emit(bench="lml_grad_d6_N1M", engine="pallas",
         wall_ms=med(lambda s, o: vg_p(s, o)[1].P0, ssm6, ys6) * 1e3)
    del ssm6, ys6

    # ---- 3b. fused-vs-XLA crossover at d=4 and d=8 (VERDICT-2 item 3:
    # "recorded crossover table") — LML + pkfs only, at N=1M ----------------
    for d, kern in ((4, RBF(variance=1.0, lengthscales=0.25, order=4,
                            balancing_iter=10)),
                    (8, RBF(variance=1.0, lengthscales=0.25, order=8,
                            balancing_iter=10))):
        try:
            ssmd, ysd = make(kern, T)
            fx = jax.jit(lambda s, o: lml_tl(s, o, False))
            fp = jax.jit(lambda s, o: lml_tl(s, o, True))
            ex, ep = float(fx(ssmd, ysd)), float(fp(ssmd, ysd))
            emit(bench=f"lml_d{d}_N1M_value", xla=ex, pallas=ep,
                 rel_diff=abs(ep - ex) / max(abs(ex), 1e-30))
            emit(bench=f"lml_d{d}_N1M", engine="xla",
                 wall_ms=med(fx, ssmd, ysd, reps=3, outer=3) * 1e3)
            emit(bench=f"lml_d{d}_N1M", engine="pallas",
                 wall_ms=med(fp, ssmd, ysd) * 1e3)
            gx = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=False))
            gp = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
            emit(bench=f"pkfs_d{d}_N1M", engine="xla",
                 wall_ms=med(gx, ssmd, ysd, reps=3, outer=3) * 1e3)
            emit(bench=f"pkfs_d{d}_N1M", engine="pallas",
                 wall_ms=med(gp, ssmd, ysd) * 1e3)
            del ssmd, ysd
        except Exception as e:  # noqa: BLE001 — sweep records failures
            emit(bench=f"crossover_d{d}", error=str(e)[:200])

    # ---- 4. d=6 accuracy vs CPU f64 truth ----------------------------------
    ssma, ysa = make(kern6, 65_536, seed=42)
    for name, f in (("xla", f_x), ("pallas", f_p)):
        ell = float(jax.jit(f)(ssma, ysa))
        emit(bench="acc_d6_T65536", engine=name, lml=ell,
             rel_err_vs_f64=abs(ell - D6_TRUTH) / abs(D6_TRUTH))

    # ---- 5. sharded engine on ONE chip vs the fused single-chip path -------
    # VERDICT r2 item 2 "done" criterion: n_shards=1 sharded (strip kernels
    # as the per-shard local scan + degenerate collective) within ~10% of
    # the plain fused engine's wall.
    try:
        from parallel_gps_tpu.parallel.sharded import (
            make_time_mesh,
            sharded_lml_tl,
            sharded_pkfs_tl,
        )

        mesh1 = make_time_mesh(1)
        f_sh = jax.jit(
            lambda s, o: sharded_pkfs_tl(s, o, mesh1, engine="pallas")
        )
        f_fu = jax.jit(
            lambda s, o: pkfs_from_tl(s, o, pallas=True, time_first_out=False)
        )
        w_sh = med(f_sh, ssm3, ys3) * 1e3
        w_fu = med(f_fu, ssm3, ys3) * 1e3
        emit(bench="sharded1_vs_fused_pkfs_d3_N1M", sharded_ms=w_sh,
             fused_ms=w_fu, ratio=w_sh / w_fu)
        f_shl = jax.jit(lambda s, o: sharded_lml_tl(s, o, mesh1))
        emit(bench="sharded1_lml_d3_N1M", wall_ms=med(f_shl, ssm3, ys3) * 1e3)
    except Exception as e:  # noqa: BLE001
        emit(bench="sharded1_vs_fused_pkfs_d3_N1M", error=str(e)[:200])

    os.makedirs("results", exist_ok=True)
    with open("results/d_sweep.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)
    emit(event="done", n=len(RESULTS))


if __name__ == "__main__":
    main()
