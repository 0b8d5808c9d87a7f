import json, statistics, sys, time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
from mbt_gym_tpu.ops import pallas_episode as pe
from mbt_gym_tpu.utils.config import as_env_config

def timed(fn, k, label):
    @jax.jit
    def f(s):
        outs = fn(s)
        leaves = jax.tree_util.tree_leaves(outs)
        return outs, sum(l.ravel()[-1] for l in leaves)
    float(f(jnp.int32(9))[1])
    per = []
    for w in range(3):
        t0 = time.time(); chks = []
        for i in range(k):
            chks.append(f(jnp.int32(100 + w*100 + i))[1])
        float(jnp.stack(chks).sum())
        per.append((time.time()-t0)/k)
    med = statistics.median(per)
    print(f"  {label}: {med*1e3:.1f} ms/ep (all {[f'{x*1e3:.1f}' for x in per]})", file=sys.stderr)
    return med

for n, k in ((16384, 60), (131072, 24), (1048576, 8)):
    cfg = as_env_config(num_trajectories=n)
    p = pe.params_from_config(cfg, risk_aversion=0.1)
    row = {"n": n}
    print(f"batch {n}:", file=sys.stderr)
    for name, fn in (
        ("raw3", lambda s: pe.as_episode_trajectories_pallas(p, s, n)),
        ("raw6", lambda s: pe.as_episode_trajectories_pallas(p, s, n, emit="full")),
        ("container7", lambda s: pe.as_episode_trajectories_pallas(p, s, n, emit="container")),
    ):
        try:
            med = timed(fn, k, name)
            row[name] = round(n * 200 / med / 1e9, 3)
        except Exception as exc:
            row[name] = f"{type(exc).__name__}: {str(exc)[:100]}"
    if isinstance(row.get("container7"), float) and isinstance(row.get("raw3"), float):
        row["ratio_c7_raw3"] = round(row["container7"] / row["raw3"], 3)
    print(json.dumps(row))
