"""Round-3 microbenchmark: restructuring the fused PPO update kernel's dW
contractions so the MXU stops paying operand transposes (VERDICT r2 item 1).

Background (BENCH_NOTES round 2): the transposed update kernel's dW
accumulations contract over the LANE dimension of both operands
(dz (H, L) x hs (I, L) -> (H, I), dims ((1,), (1,))).  The MXU-natural
forms are ((1,), (0,)) (lhs lanes x rhs sublanes) and ((0,), (0,)) (the
lhsT form used by standard row-major dW) — lane-lane forces Mosaic to
relayout the rhs per accumulation.  Measured update: 196 ms standalone vs
~107 ms FLOP floor at config-5 shapes.

Variants (all merged-head, 2-layer trunk, Tc fori_loop):
  base      current production _kernel_T math (lane-lane dW)
  hsT       explicitly transpose the hs operands (bf16) once per step;
            dW via natural ((1,), (0,)); accumulator layouts unchanged
  dzT       explicitly transpose dz per layer (bf16); dW accumulated
            ROW-major (in, out) via natural ((1,), (0,))
  rowmajor  forward+backward entirely row-major (envs on sublanes): every
            matmul is natural/native; only small per-step transposes of
            the (S, L)/(A, L) inputs and (L, 1) scalar vectors remain;
            the scalar loss chain stays feature-major (unpadded)
  fwd       forward+logp only (floor)
  no_dw     backward without dW accumulation (isolates dW cost)

Each variant runs the FULL 52.4M-sample batch (grid N/L x T/Tc), chained
3x with one scalar fetch.  Variants print their output sums — on the same
inputs all full variants must agree to bf16 tolerance (cross-checked in
interpret mode via EXP_INTERPRET=1).
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
    T, N, S, A, H, L, TC = 16, 512, 4, 2, 32, 256, 8
else:
    T, N, S, A, H, L, TC = 200, 1 << 18, 4, 2, 256, 2048, 8
CLIP, VFC = 0.2, 0.5
CDT = jnp.float32 if INTERP else jnp.bfloat16


def log(*a):
    print(*a, flush=True)


def _mm(a, b, dims):
    return jax.lax.dot_general(
        a.astype(CDT), b.astype(CDT),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _scalar_chain(logp, old_logp, adv, ret, v, inv_m):
    """Feature-major (1, L) PPO scalar chain; returns dlogp, dv and the
    three metric partial sums."""
    ratio = jnp.exp(logp - old_logp)
    pg1 = ratio * adv
    pg2 = jnp.clip(ratio, 1.0 - CLIP, 1.0 + CLIP) * adv
    vf_err = v - ret
    inside = ((ratio > 1.0 - CLIP) & (ratio < 1.0 + CLIP)).astype(jnp.float32)
    take1 = (pg1 < pg2).astype(jnp.float32)
    tie = (pg1 == pg2).astype(jnp.float32)
    branch = take1 + (1.0 - take1 - tie) * inside + 0.5 * tie * (1.0 + inside)
    dratio = -(adv * inv_m) * branch
    dlogp = dratio * ratio
    dv = (VFC * inv_m) * vf_err
    sums = (
        jnp.sum(-jnp.minimum(pg1, pg2)),
        jnp.sum(0.5 * vf_err * vf_err),
        jnp.sum(old_logp - logp),
    )
    return dlogp, dv, sums


def make_kernel(variant: str):
    n_layers = 2
    inv_m = 1.0 / (T * N)
    fwd_only = variant in ("fwd", "fwd_fastact")
    no_dw = variant == "no_dw"
    rowmajor = variant == "rowmajor"
    # timing-only probes (semantics deliberately broken):
    #   *_fastact  : tanh -> x*rsqrt(1+x^2) (no transcendental) — isolates
    #                the VPU/transcendental share of the step
    #   nosmall    : the five pad-forced small matmuls (K=4 fwd layer0,
    #                M=3 head fwd, K=3 dh-head, M=3 dW-head, N=4 dW0)
    #                replaced by O(HxL) VPU broadcasts/slices — isolates
    #                the MXU padding tax
    #   floor      : nosmall + fastact
    fast_act = variant in ("fastact", "fwd_fastact", "floor")
    no_small = variant in ("nosmall", "floor")
    act = (lambda x: x * jax.lax.rsqrt(1.0 + x * x)) if fast_act else jnp.tanh
    # per-op ablations: remove ONE small matmul to measure its marginal cost
    skip_l0 = no_small or variant == "no_l0"          # fwd layer0 (K=S=4)
    skip_fwdhead = no_small or variant == "no_fwdhead"  # fwd head (M=A+1)
    skip_dhhead = no_small or variant == "no_dhhead"  # dh-head (K=A+1 lhsT)
    skip_dwh = no_small or variant == "no_dwh"        # dW-head (M=A+1)
    skip_dw0 = no_small or variant == "no_dw0"        # dW0 (N=S=4)
    # cheapforms: tiny dims moved to the 8-granular sublane position —
    # fwd layer0 via the lhsT ((0,),(0,)) form (K on sublanes of both) and
    # dW0 with swapped operands (tiny dim becomes M, accumulated (S, H))
    cheap = variant == "cheapforms"
    cheap_l0 = cheap or variant in ("cheap_l0", "cheap3")  # layer0 lhsT only
    cheap_dw0 = cheap or variant == "cheap_dw0"  # dW0 operand swap only
    dw0_dzT = variant == "cheap3"  # dW0 via explicit dz1T, fully natural

    def kernel(*refs):
        it = iter(refs)
        obs_ref, act_ref, olp_ref, adv_ref, ret_ref = (next(it) for _ in range(5))
        trunk = [(next(it), next(it)) for _ in range(n_layers)]  # (wT(out,in), b(out,1))
        trunk_row = [next(it) for _ in range(n_layers)]  # w(in,out)
        whead_ref = next(it)  # (A+1, H)
        whead_row_ref = next(it)  # (H, A+1)
        bhead_ref, lstd_ref = next(it), next(it)  # (A+1,1), (A,1)
        d_trunk = [(next(it), next(it)) for _ in range(n_layers)]
        dwh_ref, dbh_ref, dlstd_ref, metrics_ref = (next(it) for _ in range(4))

        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _init():
            for dw, db in d_trunk:
                dw[:] = jnp.zeros_like(dw)
                db[:] = jnp.zeros_like(db)
            dwh_ref[:] = jnp.zeros_like(dwh_ref)
            dbh_ref[:] = jnp.zeros_like(dbh_ref)
            dlstd_ref[:] = jnp.zeros_like(dlstd_ref)
            metrics_ref[:] = jnp.zeros_like(metrics_ref)

        log_std = lstd_ref[:]  # (A, 1)
        inv_std = jnp.exp(-log_std)

        def step_fm(t, carry):
            """Feature-major variants: base / hsT / dzT / fwd / no_dw."""
            (accs, pg_sum, vf_sum, kl_sum) = carry
            x = obs_ref[t]  # (S, L)
            hs = [x]
            h = x
            for li, (w_ref, b_ref) in enumerate(trunk):
                if skip_l0 and li == 0:
                    h = act(x[0:1] + b_ref[:]).astype(CDT)  # probe: skip K=4
                elif cheap_l0 and li == 0:
                    # lhsT form: K=S on SUBLANES of both operands (8-granular
                    # pad) instead of the lhs LANE dim (128-granular pad)
                    h = act(_mm(trunk_row[0][:], h, ((0,), (0,))) + b_ref[:]).astype(CDT)
                else:
                    h = act(_mm(w_ref[:], h, ((1,), (0,))) + b_ref[:]).astype(CDT)
                hs.append(h)
            if skip_fwdhead:
                mv = h[: A + 1].astype(jnp.float32) + bhead_ref[:]  # probe: skip M=3
            else:
                mv = _mm(whead_ref[:], h, ((1,), (0,))) + bhead_ref[:]  # (A+1, L)
            mean, v = mv[:A], mv[A:]

            z = (act_ref[t] - mean) * inv_std
            logp = jnp.sum(-0.5 * z * z - log_std - 0.5 * _LOG_2PI, axis=0, keepdims=True)
            dlogp, dv, (ps, vs, ks) = _scalar_chain(
                logp, olp_ref[t].reshape(1, -1), adv_ref[t].reshape(1, -1),
                ret_ref[t].reshape(1, -1), v, inv_m,
            )
            pg_sum, vf_sum, kl_sum = pg_sum + ps, vf_sum + vs, kl_sum + ks
            if fwd_only:
                return (accs, pg_sum, vf_sum, kl_sum)

            dmean = dlogp * (z * inv_std)  # (A, L)
            dmv = jnp.concatenate([dmean, dv], axis=0)  # (A+1, L)
            if skip_dhhead:
                dh = jnp.broadcast_to(dmv[0:1], hs[-1].shape).astype(jnp.float32)
            else:
                dh = _mm(whead_ref[:], dmv, ((0,), (0,)))  # (H, L), native lhsT

            (a_trunk, a_wh, a_bh, a_lstd) = accs
            a_lstd = a_lstd + jnp.sum(dlogp * (z * z - 1.0), axis=1, keepdims=True)
            if not no_dw:
                if skip_dwh:
                    a_wh = a_wh + dmv[:, : a_wh.shape[1]]  # probe: skip M=3 dW
                elif variant == "hsT":
                    # natural ((1,),(0,)) with an explicit bf16 rhs transpose
                    a_wh = a_wh + _mm(dmv, hs[-1].astype(CDT).T, ((1,), (0,)))
                elif variant == "dzT":
                    # head dW accumulated (H, A+1): natural with dmvT
                    a_wh = a_wh + _mm(hs[-1], dmv.astype(CDT).T, ((1,), (0,)))
                else:
                    a_wh = a_wh + _mm(dmv, hs[-1], ((1,), (1,)))  # lane-lane
                a_bh = a_bh + jnp.sum(dmv, axis=1, keepdims=True)

            new_trunk = []
            for li in range(n_layers - 1, -1, -1):
                h_out = hs[li + 1]
                dz = dh * (1.0 - h_out.astype(jnp.float32) * h_out.astype(jnp.float32))
                a_w, a_b = a_trunk[li]
                if not no_dw:
                    if (skip_dw0) and li == 0:
                        a_w = a_w + dz[:, : a_w.shape[1]]  # probe: skip N=4 dW
                    elif cheap_dw0 and li == 0:
                        # swapped operands: tiny dim S becomes M (8-granular)
                        # instead of N (128-granular); accumulate (S, H)
                        a_w = a_w + _mm(hs[0], dz, ((1,), (1,)))
                    elif dw0_dzT and li == 0:
                        # fully natural: explicit dz1T then (S,L)x(L,H)
                        a_w = a_w + _mm(hs[0], dz.astype(CDT).T, ((1,), (0,)))
                    elif variant == "hsT":
                        a_w = a_w + _mm(dz, hs[li].astype(CDT).T, ((1,), (0,)))
                    elif variant == "dzT":
                        # accumulate ROW-major (in, out): hs (I, L) x dzT (L, O)
                        a_w = a_w + _mm(hs[li], dz.astype(CDT).T, ((1,), (0,)))
                    else:
                        a_w = a_w + _mm(dz, hs[li], ((1,), (1,)))
                    a_b = a_b + jnp.sum(dz, axis=1, keepdims=True)
                new_trunk.append((a_w, a_b))
                if li > 0:
                    w_ref, _ = trunk[li]
                    dh = _mm(w_ref[:], dz, ((0,), (0,)))
            new_trunk = tuple(reversed(new_trunk))
            return ((new_trunk, a_wh, a_bh, a_lstd), pg_sum, vf_sum, kl_sum)

        def step_row(t, carry):
            """Row-major variant: envs on SUBLANES, features on lanes.
            All matmuls natural ((1,),(0,)) or native lhsT ((0,),(0,));
            scalar chain stays feature-major via (L,1)<->(1,L) flips."""
            (accs, pg_sum, vf_sum, kl_sum) = carry
            xT = obs_ref[t].astype(CDT).T  # (L, S) small transpose
            actT = act_ref[t].astype(CDT).T  # (L, A)
            hs = [xT]
            h = xT
            for w_row, (_, b_ref) in zip(trunk_row, trunk):
                h = jnp.tanh(
                    _mm(h, w_row[:], ((1,), (0,))) + b_ref[:].reshape(1, -1)
                ).astype(CDT)
                hs.append(h)
            mv = _mm(h, whead_row_ref[:], ((1,), (0,))) + bhead_ref[:].reshape(1, -1)
            mean, v_row = mv[:, :A], mv[:, A:]  # (L, A), (L, 1)

            z = (actT.astype(jnp.float32) - mean) * inv_std.reshape(1, -1)  # (L, A)
            logp_row = jnp.sum(
                -0.5 * z * z - log_std.reshape(1, -1) - 0.5 * _LOG_2PI,
                axis=1, keepdims=True,
            )  # (L, 1)
            dlogp, dv, (ps, vs, ks) = _scalar_chain(
                logp_row.T, olp_ref[t].reshape(1, -1), adv_ref[t].reshape(1, -1),
                ret_ref[t].reshape(1, -1), v_row.T, inv_m,
            )
            pg_sum, vf_sum, kl_sum = pg_sum + ps, vf_sum + vs, kl_sum + ks

            dlogp_row = dlogp.T  # (L, 1)
            dmean = dlogp_row * (z * inv_std.reshape(1, -1))  # (L, A)
            dmv = jnp.concatenate([dmean, dv.T], axis=1)  # (L, A+1)
            dh = _mm(dmv, whead_ref[:], ((1,), (0,)))  # (L, H) natural

            (a_trunk, a_wh, a_bh, a_lstd) = accs
            a_lstd = a_lstd + jnp.sum(dlogp_row * (z * z - 1.0), axis=0, keepdims=True)
            # head dW accumulated (H, A+1) via native lhsT
            a_wh = a_wh + _mm(hs[-1], dmv, ((0,), (0,)))
            a_bh = a_bh + jnp.sum(dmv, axis=0, keepdims=True)

            new_trunk = []
            for li in range(n_layers - 1, -1, -1):
                h_out = hs[li + 1]
                dz = dh * (1.0 - h_out.astype(jnp.float32) * h_out.astype(jnp.float32))
                a_w, a_b = a_trunk[li]
                # ROW-major dW (in, out) via native lhsT
                a_w = a_w + _mm(hs[li], dz, ((0,), (0,)))
                a_b = a_b + jnp.sum(dz, axis=0, keepdims=True)
                new_trunk.append((a_w, a_b))
                if li > 0:
                    w_ref, _ = trunk[li]
                    dh = _mm(dz, w_ref[:], ((1,), (0,)))  # dz (L,O) x wT (O,I) natural
            new_trunk = tuple(reversed(new_trunk))
            return ((new_trunk, a_wh, a_bh, a_lstd), pg_sum, vf_sum, kl_sum)

        # accumulator layouts per variant (converted to the canonical output
        # layout after the loop so every variant writes identical outputs)
        if cheap_dw0 or dw0_dzT:
            trunk_acc_shapes = [
                (dw.shape[1], dw.shape[0]) if li == 0 else dw.shape
                for li, (dw, _) in enumerate(d_trunk)
            ]
            head_acc_shape = dwh_ref.shape
            b_axis_kept = 0
        elif cheap_l0:
            trunk_acc_shapes = [dw.shape for dw, _ in d_trunk]
            head_acc_shape = dwh_ref.shape
            b_axis_kept = 0
        elif variant in ("dzT",):
            trunk_acc_shapes = [(dw.shape[1], dw.shape[0]) for dw, _ in d_trunk]
            head_acc_shape = (dwh_ref.shape[1], dwh_ref.shape[0])
            b_axis_kept = 0  # biases accumulated (out,1) in fm chain
        elif rowmajor:
            trunk_acc_shapes = [(dw.shape[1], dw.shape[0]) for dw, _ in d_trunk]
            head_acc_shape = (dwh_ref.shape[1], dwh_ref.shape[0])
            b_axis_kept = 1  # biases accumulated (1,out) rows
        else:
            trunk_acc_shapes = [dw.shape for dw, _ in d_trunk]
            head_acc_shape = dwh_ref.shape
            b_axis_kept = 0

        def b_shape(out_dim):
            return (out_dim, 1) if b_axis_kept == 0 else (1, out_dim)

        zero_accs = (
            tuple(
                (jnp.zeros(shp, jnp.float32), jnp.zeros(b_shape(db.shape[0]), jnp.float32))
                for shp, (_, db) in zip(trunk_acc_shapes, d_trunk)
            ),
            jnp.zeros(head_acc_shape, jnp.float32),
            jnp.zeros(b_shape(dbh_ref.shape[0]), jnp.float32),
            jnp.zeros(dlstd_ref.shape if not rowmajor else (1, dlstd_ref.shape[0]), jnp.float32),
        )
        step = step_row if rowmajor else step_fm
        (accs, pg_sum, vf_sum, kl_sum) = jax.lax.fori_loop(
            0, TC, step, (zero_accs, jnp.zeros(()), jnp.zeros(()), jnp.zeros(())),
        )
        (a_trunk, a_wh, a_bh, a_lstd) = accs
        transposed_acc = variant in ("dzT",) or rowmajor
        for li, ((dw_ref, db_ref), (a_w, a_b)) in enumerate(zip(d_trunk, a_trunk)):
            t_this = transposed_acc or ((cheap_dw0 or dw0_dzT) and li == 0)
            dw_ref[:] += a_w.T if t_this else a_w
            db_ref[:] += a_b.T if (rowmajor and b_axis_kept == 1) else a_b
        dwh_ref[:] += a_wh.T if transposed_acc else a_wh
        dbh_ref[:] += a_bh.T if (rowmajor and b_axis_kept == 1) else a_bh
        dlstd_ref[:] += a_lstd.T if rowmajor else a_lstd
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        metrics_ref[:] += (
            jnp.where(lane == 0, pg_sum, 0.0)
            + jnp.where(lane == 1, vf_sum, 0.0)
            + jnp.where(lane == 2, kl_sum, 0.0)
        )

    return kernel


def main():
    log("devices:", jax.devices())
    variants = sys.argv[1:] or ["base", "dzT", "rowmajor", "hsT", "fwd", "no_dw"]
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
    whead = jnp.asarray(rng.normal(size=(A + 1, H)) * 0.05, jnp.float32)
    bhead = jnp.zeros((A + 1, 1), jnp.float32)
    lstd = jnp.zeros((A, 1), jnp.float32)

    full = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape))

    results = {}
    for variant in variants:
        kernel = make_kernel(variant)
        flat = pl.BlockSpec((TC, L), lambda i, j: (j, i))
        inputs = [obs_t, act_t, olp, adv, ret]
        in_specs = [
            pl.BlockSpec((TC, S, L), lambda i, j: (j, 0, i)),
            pl.BlockSpec((TC, A, L), lambda i, j: (j, 0, i)),
            flat, flat, flat,
        ]
        inputs += [w0T, b0, w1T, b1, w0T.T, w1T.T, whead, whead.T, bhead, lstd]
        in_specs += [
            full(w0T.shape), full(b0.shape), full(w1T.shape), full(b1.shape),
            full((S, H)), full((H, H)), full(whead.shape), full((H, A + 1)),
            full(bhead.shape), full(lstd.shape),
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((H, S), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((H, H), jnp.float32),
            jax.ShapeDtypeStruct((H, 1), jnp.float32),
            jax.ShapeDtypeStruct((A + 1, H), jnp.float32),
            jax.ShapeDtypeStruct((A + 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((A, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 128), jnp.float32),
        ]
        out_specs = [
            full((H, S)), full((H, 1)), full((H, H)), full((H, 1)),
            full((A + 1, H)), full((A + 1, 1)), full((A, 1)), full((1, 128)),
        ]

        @jax.jit
        def run_once(*ins):
            outs = pl.pallas_call(
                kernel,
                grid=(N // L, T // TC),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shapes,
                interpret=INTERP,
            )(*ins)
            return sum(jnp.sum(jnp.abs(o)) for o in outs)

        try:
            t0 = time.time()
            s = float(run_once(*inputs))
            log(f"{variant:10s} compile+first {time.time()-t0:6.1f}s |sum|={s:.6e}")
            results[variant] = s
            # burst warmup (BENCH_NOTES round 2: short-call warmup tails
            # span several dispatches), then two timed windows; report both.
            acc = None
            for _ in range(4):
                r = run_once(*inputs)
                acc = r if acc is None else acc + r
            float(acc)
            for win in range(2):
                t0 = time.time()
                acc = None
                for _ in range(3):
                    r = run_once(*inputs)
                    acc = r if acc is None else acc + r
                float(acc)
                dt = (time.time() - t0) / 3
                rate = T * N / dt / 1e6
                log(f"{variant:10s} w{win} {dt*1e3:8.1f} ms  -> {rate:8.1f}M samples/s")
        except Exception as e:
            log(f"{variant:10s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    if "base" in results:
        for k, v in results.items():
            if k in ("fwd", "no_dw"):
                continue
            rel = abs(v - results["base"]) / max(abs(results["base"]), 1e-9)
            log(f"  |sum| vs base: {k:10s} rel={rel:.2e}")


if __name__ == "__main__":
    main()
