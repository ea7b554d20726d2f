"""Quick post-change timing: aligned N=10M LML / pkfs / LML+grad with the
recompute-in-pass2 strip kernels (vs the store/apply numbers in
results/pad_ab.json: LML 29.0 ms, pkfs 43.3 ms aligned)."""
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
    T = 8 * 1024 * 1220  # aligned (= pad_ab's aligned size)
    rng = np.random.RandomState(0)
    t = np.sort(rng.rand(T)).astype(np.float32)
    y = obs_noise(sinu(t), 0.1, 0).astype(np.float32)
    ssm = Matern52(0.8, 0.4).get_ssm_tl(
        jnp.asarray(t).reshape(-1, 1), jnp.asarray(0.1).reshape(1, 1))
    ys = jnp.asarray(y).reshape(-1, 1)
    fl = jax.jit(lambda s, o: lml_tl(s, o, True))
    fk = jax.jit(lambda s, o: pkfs_from_tl(s, o, pallas=True))
    vg = jax.jit(jax.value_and_grad(lambda s, o: lml_tl(s, o, True)))
    emit(bench="lml_d3_10M_recompute", wall_ms=med(fl, ssm, ys) * 1e3)
    emit(bench="pkfs_d3_10M_recompute", wall_ms=med(fk, ssm, ys) * 1e3)
    emit(bench="lml_grad_d3_10M_recompute",
         wall_ms=med(lambda s, o: vg(s, o)[1].P0, ssm, ys) * 1e3)
    # correctness spot value vs the XLA engine
    ex = float(jax.jit(lambda s, o: lml_tl(s, o, False))(ssm, ys))
    ep = float(fl(ssm, ys))
    emit(bench="lml_value_agreement", xla=ex, pallas=ep,
         rel_diff=abs(ep - ex) / abs(ex))
    os.makedirs("results", exist_ok=True)
    json.dump(out, open("results/recompute_check.json", "w"), indent=1)
    emit(event="done")

if __name__ == "__main__":
    main()
