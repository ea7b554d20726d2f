"""A/B: aligned T (pad_end no-op) vs unaligned T (full pad copies of F/Q/y).

Validates the traffic model: the pack/pad pass costs ~1.6 GB r+w at N=10M,
which at the measured ~230 GB/s platform copy rate should be ~7 ms of LML.
"""
import json, os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from parallel_gps_tpu.config import enable_compilation_cache
    enable_compilation_cache()
    from parallel_gps_tpu.kalman.timelast import lml_tl, pkfs_from_tl
    from parallel_gps_tpu.kernels import Matern52
    from parallel_gps_tpu.toymodels import obs_noise, sinu
    out = []
    def emit(**kw):
        out.append(kw); print(json.dumps(kw), flush=True)
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
    for label, T in (("unaligned", 10_000_000), ("aligned", 8 * 1024 * 1220)):
        rng = np.random.RandomState(0)
        t = np.sort(rng.rand(T)).astype(np.float32)
        y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
        ssm = Matern52(0.8, 0.4).get_ssm_tl(
            jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1))
        ys = jnp.asarray(y).reshape(-1, 1)
        fl = jax.jit(lambda s, o: lml_tl(s, o, True))
        fk = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
        emit(bench="lml_d3_10M_pad_ab", t_align=label, T=T,
             wall_ms=med(fl, ssm, ys) * 1e3)
        emit(bench="pkfs_d3_10M_pad_ab", t_align=label, T=T,
             wall_ms=med(fk, ssm, ys) * 1e3)
        del ssm, ys
    os.makedirs("results", exist_ok=True)
    json.dump(out, open("results/pad_ab.json", "w"), indent=1)
    emit(event="done")

if __name__ == "__main__":
    main()
