"""Microbenchmark variants of the transposed fused PPO update kernel at
production config-5 shapes (T=200, N=262144, H=256, L=2048, Tc=8).

Each variant is one pallas_call over the FULL batch (52.4M samples,
grid=(N/L, T/Tc)); chained 3x with one scalar fetch (per-call relay RTT
~30ms would otherwise dominate).  Ordered most-valuable-first so a wedged
relay still yields the headline comparisons.

Variants:
  base          current _kernel_T structure (separate heads, fori_loop)
  merged        pi+vf heads concatenated into one (A+1, H) matmul set
  dualw         trunk weights passed in BOTH layouts; dh chain uses the
                untransposed layout so its contraction is canonical
                (lanes of lhs x sublanes of rhs) instead of sublane-sublane
  md            merged + dualw
  md_unroll     md with the Tc step loop python-unrolled
  md_concat     md_unroll storing dz/hs per step, ONE dW matmul per layer
                over the lane-concatenated (H, Tc*L) tensors
  fwd           forward+logp only (floor for the forward pass)
  no_dw         full backward chain but dW/db accumulations skipped
"""
from __future__ import annotations

import math
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG_2PI = math.log(2.0 * math.pi)

INTERP = bool(os.environ.get("EXP_INTERPRET"))
if INTERP:
    jax.config.update("jax_platforms", "cpu")
    T, N, S, A, H, L, TC = 16, 1024, 4, 2, 32, 256, 8
else:
    T, N, S, A, H, L, TC = 200, 1 << 18, 4, 2, 256, 2048, 8
CLIP, VFC = 0.2, 0.5
CDT = jnp.bfloat16


def log(*a):
    print(*a, flush=True)


def _mm(a, b, dims):
    return jax.lax.dot_general(
        a.astype(CDT), b.astype(CDT),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_kernel(variant: str):
    merged = variant in ("merged", "md", "md_unroll", "md_concat")
    dualw = variant in ("dualw", "md", "md_unroll", "md_concat")
    unroll = variant in ("md_unroll", "md_concat")
    concat_dw = variant == "md_concat"
    fwd_only = variant == "fwd"
    no_dw = variant == "no_dw"
    n_layers = 2
    inv_m = 1.0 / (T * N)

    def kernel(*refs):
        it = iter(refs)
        obs_ref, act_ref, olp_ref, adv_ref, ret_ref = (next(it) for _ in range(5))
        trunk = [(next(it), next(it)) for _ in range(n_layers)]  # (wT(out,in), b)
        trunk_row = [next(it) for _ in range(n_layers)] if dualw else None  # w(in,out)
        whead_row_ref = next(it) if (dualw and merged) else None  # (H, A+1)
        if merged:
            whead_ref, bhead_ref, lstd_ref = (next(it) for _ in range(3))
        else:
            wpi_ref, bpi_ref, wvf_ref, bvf_ref, lstd_ref = (next(it) for _ in range(5))
        d_trunk = [(next(it), next(it)) for _ in range(n_layers)]
        if merged:
            dwh_ref, dbh_ref, dlstd_ref, metrics_ref = (next(it) for _ in range(4))
        else:
            dwpi_ref, dbpi_ref, dwvf_ref, dbvf_ref, dlstd_ref, metrics_ref = (
                next(it) for _ in range(6)
            )

        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _init():
            for dw, db in d_trunk:
                dw[:] = jnp.zeros_like(dw)
                db[:] = jnp.zeros_like(db)
            if merged:
                dwh_ref[:] = jnp.zeros_like(dwh_ref)
                dbh_ref[:] = jnp.zeros_like(dbh_ref)
            else:
                dwpi_ref[:] = jnp.zeros_like(dwpi_ref)
                dbpi_ref[:] = jnp.zeros_like(dbpi_ref)
                dwvf_ref[:] = jnp.zeros_like(dwvf_ref)
                dbvf_ref[:] = jnp.zeros_like(dbvf_ref)
            dlstd_ref[:] = jnp.zeros_like(dlstd_ref)
            metrics_ref[:] = jnp.zeros_like(metrics_ref)

        log_std = lstd_ref[:]  # (A, 1)
        inv_std = jnp.exp(-log_std)

        def step(t, carry):
            (accs, pg_sum, vf_sum, kl_sum, saved) = carry
            x = obs_ref[t]  # (S, L)
            hs = [x]
            h = x
            for w_ref, b_ref in trunk:
                h = jnp.tanh(_mm(w_ref[:], h, ((1,), (0,))) + b_ref[:]).astype(CDT)
                hs.append(h)
            if merged:
                mv = _mm(whead_ref[:], h, ((1,), (0,))) + bhead_ref[:]  # (A+1, L)
                mean, v = mv[:A], mv[A:]
            else:
                mean = _mm(wpi_ref[:], h, ((1,), (0,))) + bpi_ref[:]
                v = _mm(wvf_ref[:], h, ((1,), (0,))) + bvf_ref[:]

            z = (act_ref[t] - mean) * inv_std
            logp = jnp.sum(-0.5 * z * z - log_std - 0.5 * _LOG_2PI, axis=0, keepdims=True)
            old_logp = olp_ref[t].reshape(1, -1)
            adv = adv_ref[t].reshape(1, -1)
            ret = ret_ref[t].reshape(1, -1)

            ratio = jnp.exp(logp - old_logp)
            pg1 = ratio * adv
            pg2 = jnp.clip(ratio, 1.0 - CLIP, 1.0 + CLIP) * adv
            vf_err = v - ret
            pg_sum = pg_sum + jnp.sum(-jnp.minimum(pg1, pg2))
            vf_sum = vf_sum + jnp.sum(0.5 * vf_err * vf_err)
            kl_sum = kl_sum + jnp.sum(old_logp - logp)
            if fwd_only:
                return (accs, pg_sum, vf_sum, kl_sum, saved)

            inside = ((ratio > 1.0 - CLIP) & (ratio < 1.0 + CLIP)).astype(jnp.float32)
            take1 = (pg1 < pg2).astype(jnp.float32)
            tie = (pg1 == pg2).astype(jnp.float32)
            branch = take1 + (1.0 - take1 - tie) * inside + 0.5 * tie * (1.0 + inside)
            dratio = -(adv * inv_m) * branch
            dlogp = dratio * ratio  # (1, L)
            dmean = dlogp * (z * inv_std)  # (A, L)
            dv = (VFC * inv_m) * vf_err  # (1, L)

            if merged:
                dmv = jnp.concatenate([dmean, dv], axis=0)  # (A+1, L)
                if dualw:
                    # whead_row (H, A+1): contraction over A+1 is lhs-lanes
                    # x rhs-sublanes — canonical.
                    dh = _mm(whead_row_ref[:], dmv, ((1,), (0,)))
                else:
                    dh = _mm(whead_ref[:], dmv, ((0,), (0,)))
            else:
                dh = (
                    _mm(wpi_ref[:], dmean, ((0,), (0,)))
                    + _mm(wvf_ref[:], dv, ((0,), (0,)))
                )

            (a_trunk, a_head, a_lstd) = accs
            a_lstd = a_lstd + jnp.sum(dlogp * (z * z - 1.0), axis=1, keepdims=True)

            if concat_dw:
                # save per-step tensors; dW matmuls happen once per chunk
                dzs = []
                dh_cur = dh
                for li in range(n_layers - 1, -1, -1):
                    h_out = hs[li + 1]
                    dz = (dh_cur * (1.0 - h_out.astype(jnp.float32) ** 2)).astype(CDT)
                    dzs.append(dz)
                    if li > 0:
                        if dualw:
                            dh_cur = _mm(trunk_row[li][:], dz, ((1,), (0,)))
                        else:
                            dh_cur = _mm(trunk[li][0][:], dz, ((0,), (0,)))
                saved = saved + [(hs, list(reversed(dzs)), dmv)]
                return ((a_trunk, a_head, a_lstd), pg_sum, vf_sum, kl_sum, saved)

            if not no_dw:
                if merged:
                    a_head = (
                        a_head[0] + _mm(dmv, hs[-1], ((1,), (1,))),
                        a_head[1] + jnp.sum(dmv, axis=1, keepdims=True),
                    )
                else:
                    a_head = (
                        a_head[0] + _mm(dmean, hs[-1], ((1,), (1,))),
                        a_head[1] + jnp.sum(dmean, axis=1, keepdims=True),
                        a_head[2] + _mm(dv, hs[-1], ((1,), (1,))),
                        a_head[3] + jnp.sum(dv, axis=1, keepdims=True),
                    )

            new_trunk = []
            for li in range(n_layers - 1, -1, -1):
                h_out = hs[li + 1]
                dz = dh * (1.0 - h_out.astype(jnp.float32) ** 2)
                a_w, a_b = a_trunk[li]
                if not no_dw:
                    a_w = a_w + _mm(dz, hs[li], ((1,), (1,)))
                    a_b = a_b + jnp.sum(dz, axis=1, keepdims=True)
                new_trunk.append((a_w, a_b))
                if li > 0:
                    if dualw:
                        dh = _mm(trunk_row[li][:], dz, ((1,), (0,)))
                    else:
                        dh = _mm(trunk[li][0][:], dz, ((0,), (0,)))
            new_trunk = tuple(reversed(new_trunk))
            return ((new_trunk, a_head, a_lstd), pg_sum, vf_sum, kl_sum, saved)

        if merged:
            zero_head = (
                jnp.zeros(dwh_ref.shape, jnp.float32),
                jnp.zeros(dbh_ref.shape, jnp.float32),
            )
        else:
            zero_head = (
                jnp.zeros(dwpi_ref.shape, jnp.float32),
                jnp.zeros(dbpi_ref.shape, jnp.float32),
                jnp.zeros(dwvf_ref.shape, jnp.float32),
                jnp.zeros(dbvf_ref.shape, jnp.float32),
            )
        zero_accs = (
            tuple(
                (jnp.zeros(dw.shape, jnp.float32), jnp.zeros(db.shape, jnp.float32))
                for dw, db in d_trunk
            ),
            zero_head,
            jnp.zeros(dlstd_ref.shape, jnp.float32),
        )
        init = (zero_accs, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()), [])
        if unroll:
            carry = init
            for t in range(TC):
                carry = step(t, carry)
            (accs, pg_sum, vf_sum, kl_sum, saved) = carry
            if concat_dw:
                (a_trunk, a_head, a_lstd) = accs
                # one dW matmul per layer over lane-concatenated chunks
                hs_cat = [
                    jnp.concatenate([s[0][li] for s in saved], axis=1)
                    for li in range(n_layers + 1)
                ]
                dz_cat = [
                    jnp.concatenate([s[1][li] for s in saved], axis=1)
                    for li in range(n_layers)
                ]
                dmv_cat = jnp.concatenate([s[2] for s in saved], axis=1)
                a_head = (
                    a_head[0] + _mm(dmv_cat, hs_cat[-1], ((1,), (1,))),
                    a_head[1] + jnp.sum(dmv_cat, axis=1, keepdims=True),
                )
                new_trunk = []
                for li in range(n_layers):
                    a_w, a_b = a_trunk[li]
                    a_w = a_w + _mm(dz_cat[li], hs_cat[li], ((1,), (1,)))
                    a_b = a_b + jnp.sum(dz_cat[li], axis=1, keepdims=True)
                    new_trunk.append((a_w, a_b))
                accs = (tuple(new_trunk), a_head, a_lstd)
        else:
            (accs, pg_sum, vf_sum, kl_sum, saved) = jax.lax.fori_loop(
                0, TC, lambda t, c: step(t, c), init
            )
        (a_trunk, a_head, a_lstd) = accs
        for (dw_ref, db_ref), (a_w, a_b) in zip(d_trunk, a_trunk):
            dw_ref[:] += a_w
            db_ref[:] += a_b
        if merged:
            dwh_ref[:] += a_head[0]
            dbh_ref[:] += a_head[1]
        else:
            dwpi_ref[:] += a_head[0]
            dbpi_ref[:] += a_head[1]
            dwvf_ref[:] += a_head[2]
            dbvf_ref[:] += a_head[3]
        dlstd_ref[:] += a_lstd
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        metrics_ref[:] += (
            jnp.where(lane == 0, pg_sum, 0.0)
            + jnp.where(lane == 1, vf_sum, 0.0)
            + jnp.where(lane == 2, kl_sum, 0.0)
        )

    return kernel


def main():
    log("devices:", jax.devices())
    variants = sys.argv[1:] or [
        "base", "merged", "dualw", "md", "md_unroll", "md_concat", "fwd", "no_dw"
    ]
    key = jax.random.PRNGKey(0)
    obs_t = jax.random.normal(key, (T, S, N), jnp.float32)
    act_t = jax.random.normal(jax.random.fold_in(key, 1), (T, A, N), jnp.float32)
    olp = jax.random.normal(jax.random.fold_in(key, 2), (T, N), jnp.float32) * 0.1
    adv = jax.random.normal(jax.random.fold_in(key, 3), (T, N), jnp.float32)
    ret = jax.random.normal(jax.random.fold_in(key, 4), (T, N), jnp.float32)

    import numpy as np

    rng = np.random.default_rng(0)
    w0T = jnp.asarray(rng.normal(size=(H, S)) * 0.3, jnp.float32)
    w1T = jnp.asarray(rng.normal(size=(H, H)) * 0.05, jnp.float32)
    b0 = jnp.zeros((H, 1), jnp.float32)
    b1 = jnp.zeros((H, 1), jnp.float32)
    wpiT = jnp.asarray(rng.normal(size=(A, H)) * 0.05, jnp.float32)
    wvfT = jnp.asarray(rng.normal(size=(1, H)) * 0.05, jnp.float32)
    bpi = jnp.zeros((A, 1), jnp.float32)
    bvf = jnp.zeros((1, 1), jnp.float32)
    lstd = jnp.zeros((A, 1), jnp.float32)
    whead = jnp.concatenate([wpiT, wvfT], axis=0)  # (A+1, H)
    bhead = jnp.concatenate([bpi, bvf], axis=0)

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape))

    for variant in variants:
        merged = variant in ("merged", "md", "md_unroll", "md_concat")
        dualw = variant in ("dualw", "md", "md_unroll", "md_concat")
        # concat saves Tc steps of activations+dz in VMEM: narrow the lane
        # tile so 4x(256, Lv)xTc bf16 fits the 16M scoped budget.
        Lv = 512 if variant == "md_concat" else L
        kernel = make_kernel(variant)

        flat = pl.BlockSpec((TC, Lv), lambda i, j: (j, i))
        inputs = [obs_t, act_t, olp, adv, ret]
        in_specs = [
            pl.BlockSpec((TC, S, Lv), lambda i, j: (j, 0, i)),
            pl.BlockSpec((TC, A, Lv), lambda i, j: (j, 0, i)),
            flat, flat, flat,
        ]
        inputs += [w0T, b0, w1T, b1]
        in_specs += [full(w0T.shape), full(b0.shape), full(w1T.shape), full(b1.shape)]
        if dualw:
            inputs += [w0T.T, w1T.T]
            in_specs += [full((S, H)), full((H, H))]
            if merged:
                inputs += [whead.T]
                in_specs += [full((H, A + 1))]
        if merged:
            inputs += [whead, bhead, lstd]
            in_specs += [full(whead.shape), full(bhead.shape), full(lstd.shape)]
        else:
            inputs += [wpiT, bpi, wvfT, bvf, lstd]
            in_specs += [
                full(wpiT.shape), full(bpi.shape), full(wvfT.shape),
                full(bvf.shape), full(lstd.shape),
            ]

        out_shapes = [
            jax.ShapeDtypeStruct((H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
        ]
        out_specs = [full((H, S)), full((H, 1)), full((H, H)), full((H, 1))]
        if merged:
            out_shapes += [
                jax.ShapeDtypeStruct((A + 1, H), jnp.float32),
                jax.ShapeDtypeStruct((A + 1, 1), jnp.float32),
            ]
            out_specs += [full((A + 1, H)), full((A + 1, 1))]
        else:
            out_shapes += [
                jax.ShapeDtypeStruct((A, H), jnp.float32),
                jax.ShapeDtypeStruct((A, 1), jnp.float32),
                jax.ShapeDtypeStruct((1, H), jnp.float32),
                jax.ShapeDtypeStruct((1, 1), jnp.float32),
            ]
            out_specs += [full((A, H)), full((A, 1)), full((1, H)), full((1, 1))]
        out_shapes += [
            jax.ShapeDtypeStruct((A, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ]
        out_specs += [full((A, 1)), full((1, 128))]

        @jax.jit
        def run_once(*ins):
            outs = pl.pallas_call(
                kernel,
                grid=(N // Lv, T // TC),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=INTERP,
            )(*ins)
            return sum(jnp.sum(o) for o in outs)

        try:
            t0 = time.time()
            s = float(run_once(*inputs))
            log(f"{variant:12s} compile+first {time.time()-t0:6.1f}s sum={s:.4e}")
            t0 = time.time()
            acc = None
            for _ in range(3):
                r = run_once(*inputs)
                acc = r if acc is None else acc + r
            float(acc)
            dt = (time.time() - t0) / 3
            rate = T * N / dt / 1e6
            log(f"{variant:12s} {dt*1e3:8.1f} ms  -> {rate:8.1f}M samples/s")
        except Exception as e:
            log(f"{variant:12s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
