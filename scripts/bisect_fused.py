"""Bisect which part of the fused PPO kernel hangs the Mosaic compile.
Each stage compiles+runs a progressively larger kernel; prints are
unbuffered so the hanging stage is identifiable from the log tail."""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def log(*a):
    print(*a, flush=True)


M, TILE, S, H, A = 8192, 1024, 4, 256, 2
GRID = M // TILE


def run(name, kernel, inputs, in_specs, out_shape, out_specs):
    t0 = time.time()
    outs = pl.pallas_call(
        kernel, grid=(GRID,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
    )(*inputs)
    leaves = jax.tree_util.tree_leaves(outs)
    acc = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    log(f"{name}: OK {time.time()-t0:.1f}s sum={float(acc):.3e}")


def full(shape):
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))


def main():
    log("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (M, S), dtype=jnp.float32)
    w1 = jax.random.normal(jax.random.fold_in(key, 1), (S, H), jnp.float32) * 0.1
    w2 = jax.random.normal(jax.random.fold_in(key, 2), (H, H), jnp.float32) * 0.05
    col = jax.random.normal(jax.random.fold_in(key, 3), (M, 1), jnp.float32)

    # stage A: tiled input, matmul chain, tiled output
    def kern_a(obs_ref, w1_ref, w2_ref, out_ref):
        h = jnp.tanh(
            jax.lax.dot_general(
                obs_ref[:].astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        h2 = jnp.tanh(
            jax.lax.dot_general(
                h.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
        out_ref[:] = h2

    run(
        "A fwd-chain", kern_a,
        [obs, w1, w2],
        [pl.BlockSpec((TILE, S), lambda i: (i, 0)), full((S, H)), full((H, H))],
        jax.ShapeDtypeStruct((M, H), jnp.float32),
        pl.BlockSpec((TILE, H), lambda i: (i, 0)),
    )

    # stage B: (tile, 1) column input blocks
    def kern_b(col_ref, out_ref):
        out_ref[:] = col_ref[:] * 2.0

    run(
        "B col-blocks", kern_b,
        [col],
        [pl.BlockSpec((TILE, 1), lambda i: (i, 0))],
        jax.ShapeDtypeStruct((M, 1), jnp.float32),
        pl.BlockSpec((TILE, 1), lambda i: (i, 0)),
    )

    # stage C: accumulated full-block output across grid (init at i==0)
    def kern_c(obs_ref, w1_ref, dw_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        x = obs_ref[:]
        g = jax.lax.dot_general(
            x.astype(jnp.bfloat16),
            jnp.tanh(
                jax.lax.dot_general(
                    x.astype(jnp.bfloat16), w1_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            ).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_ref[:] += g

    run(
        "C grid-accum", kern_c,
        [obs, w1],
        [pl.BlockSpec((TILE, S), lambda i: (i, 0)), full((S, H))],
        jax.ShapeDtypeStruct((S, H), jnp.float32),
        full((S, H)),
    )

    # stage D: accumulated tiny outputs (1, A) and (1, 1) and (1, 128)
    def kern_d(col_ref, da_ref, db_ref, dm_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            da_ref[:] = jnp.zeros_like(da_ref)
            db_ref[:] = jnp.zeros_like(db_ref)
            dm_ref[:] = jnp.zeros_like(dm_ref)

        x = col_ref[:]
        da_ref[:] += jnp.sum(x, axis=0, keepdims=True) * jnp.ones((1, A), jnp.float32)
        db_ref[:] += jnp.sum(x, axis=0, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        dm_ref[:] += jnp.where(lane == 0, jnp.sum(x), 0.0)

    run(
        "D tiny-accum", kern_d,
        [col],
        [pl.BlockSpec((TILE, 1), lambda i: (i, 0))],
        [
            jax.ShapeDtypeStruct((1, A), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ],
        [full((1, A)), full((1, 1)), full((1, 128))],
    )

    # stage E: the real fused kernel, one call
    from mbt_gym_tpu.agents import networks
    from mbt_gym_tpu.ops import fused_ppo

    params = networks.init_actor_critic(
        jax.random.PRNGKey(0), S, A, hidden=(H, H), shared_trunk=True
    )
    t0 = time.time()
    g, met = fused_ppo.ppo_fused_grads(
        params, obs,
        jax.random.normal(jax.random.fold_in(key, 5), (M, A)),
        col[:, 0], col[:, 0], col[:, 0],
        tile=TILE,
    )
    log(f"E full kernel: OK {time.time()-t0:.1f}s pg={float(met['pg_loss']):.4f}")


if __name__ == "__main__":
    main()
