"""Fused PPO update kernel: forward + backward of the shared-trunk
actor-critic in ONE Pallas pass, with all hidden activations resident in
VMEM.

Why: at pod batch (bench_suite config 5: 52M transitions/iteration) the
XLA update is HBM-bandwidth-bound — every 256-wide activation tensor
(~27 GB per pass over the batch) streams to HBM between forward and
backward, ~10 such passes per update.  Measured round-1: the update phase
alone is 564-911 ms of the 739-1166 ms iteration.  This kernel reads each
transition's fundamental data once (obs, action, old_logp, advantage,
return ≈ 40 B/sample), keeps h1/h2 for a tile of samples in VMEM, and
writes only the accumulated weight gradients — making the update
FLOP-bound on the MXU instead.

Scope: any actor-critic layout from ``networks.init_actor_critic`` —
the shared trunk (``shared_trunk=True``) or the reference's separate
pi/vf towers (run as a STACKED trunk with per-tower row slices, the
round-4 ``split_at`` mode of :func:`ppo_fused_grads_T`) —
with any trunk depth/widths and any obs/action dims; diagonal-Gaussian
policy with state-independent ``log_std`` (identical loss to
``agents.ppo._ppo_loss``).  Gradient parity with ``jax.grad`` of the XLA
loss is asserted in tests/test_fused_ppo.py for both layouts (interpret
mode runs on CPU — no hardware PRNG in this kernel).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG_2PI = math.log(2.0 * math.pi)


def _mm(a, b, dims, compute_dtype=jnp.bfloat16):
    """MXU matmul: bf16 inputs, f32 accumulation."""
    return jax.lax.dot_general(
        a.astype(compute_dtype), b.astype(compute_dtype),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _kernel(
    n_layers: int,
    inv_m: float,
    clip_eps: float,
    vf_coef: float,
    compute_dtype,
    *refs,
):
    """One grid step = one tile of samples.  ``refs`` layout:

    inputs:  obs, actions, old_logp, adv, returns,
             w0, b0, ..., w{L-1}, b{L-1},            (trunk)
             wpi, bpi, wvf, bvf, log_std
    outputs: dw0, db0, ..., dw{L-1}, db{L-1},
             dwpi, dbpi, dwvf, dbvf, dlog_std, metrics (1, 128)
    """
    it = iter(refs)
    obs_ref, act_ref, olp_ref, adv_ref, ret_ref = (next(it) for _ in range(5))
    trunk = [(next(it), next(it)) for _ in range(n_layers)]
    wpi_ref, bpi_ref, wvf_ref, bvf_ref, lstd_ref = (next(it) for _ in range(5))
    d_trunk = [(next(it), next(it)) for _ in range(n_layers)]
    dwpi_ref, dbpi_ref, dwvf_ref, dbvf_ref, dlstd_ref, metrics_ref = (
        next(it) for _ in range(6)
    )

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for dw, db in d_trunk:
            dw[:] = jnp.zeros_like(dw)
            db[:] = jnp.zeros_like(db)
        dwpi_ref[:] = jnp.zeros_like(dwpi_ref)
        dbpi_ref[:] = jnp.zeros_like(dbpi_ref)
        dwvf_ref[:] = jnp.zeros_like(dwvf_ref)
        dbvf_ref[:] = jnp.zeros_like(dbvf_ref)
        dlstd_ref[:] = jnp.zeros_like(dlstd_ref)
        metrics_ref[:] = jnp.zeros_like(metrics_ref)

    obs = obs_ref[:].astype(jnp.float32)  # (tile, S)

    # ---- forward: trunk with tanh after every layer, activations saved ----
    hs = [obs]
    h = obs
    for w_ref, b_ref in trunk:
        h = jnp.tanh(_mm(h, w_ref[:], ((1,), (0,)), compute_dtype) + b_ref[:])
        hs.append(h)

    mean = _mm(h, wpi_ref[:], ((1,), (0,)), compute_dtype) + bpi_ref[:]  # (tile, A)
    v = _mm(h, wvf_ref[:], ((1,), (0,)), compute_dtype) + bvf_ref[:]  # (tile, 1)

    # ---- loss pieces (mirrors agents.ppo._ppo_loss) ----
    log_std = lstd_ref[:]  # (1, A)
    inv_std = jnp.exp(-log_std)
    z = (act_ref[:].astype(jnp.float32) - mean) * inv_std  # (tile, A)
    logp = jnp.sum(-0.5 * z * z - log_std - 0.5 * _LOG_2PI, axis=1, keepdims=True)
    old_logp = olp_ref[:].astype(jnp.float32)  # (tile, 1)
    adv = adv_ref[:].astype(jnp.float32)  # (tile, 1)
    ret = ret_ref[:].astype(jnp.float32)  # (tile, 1)

    ratio = jnp.exp(logp - old_logp)
    clipped = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps)
    pg1 = ratio * adv
    pg2 = clipped * adv
    pg_per = -jnp.minimum(pg1, pg2)
    vf_err = v - ret

    # ---- backward ----
    # d(-min(pg1, pg2))/dratio, matching jnp.minimum's tie-splitting grad.
    inside = ((ratio > 1.0 - clip_eps) & (ratio < 1.0 + clip_eps)).astype(jnp.float32)
    take1 = (pg1 < pg2).astype(jnp.float32)
    tie = (pg1 == pg2).astype(jnp.float32)
    # 1 where pg1 strictly selected; `inside` where pg2 strictly selected;
    # 0.5*(1+inside) on ties (jnp.minimum splits tie gradients evenly).
    branch = take1 + (1.0 - take1 - tie) * inside + 0.5 * tie * (1.0 + inside)
    dratio = -(adv * inv_m) * branch
    dlogp = dratio * ratio  # (tile, 1)
    dmean = dlogp * (z * inv_std)  # chain through logp: d logp/d mean
    dlstd_tile = jnp.sum(dlogp * (z * z - 1.0), axis=0, keepdims=True)  # (1, A)
    dv = (vf_coef * inv_m) * vf_err  # (tile, 1)

    dh = (
        _mm(dmean, wpi_ref[:], ((1,), (1,)), compute_dtype)
        + _mm(dv, wvf_ref[:], ((1,), (1,)), compute_dtype)
    )  # (tile, H)

    dwpi_ref[:] += _mm(hs[-1], dmean, ((0,), (0,)), compute_dtype)
    dbpi_ref[:] += jnp.sum(dmean, axis=0, keepdims=True)
    dwvf_ref[:] += _mm(hs[-1], dv, ((0,), (0,)), compute_dtype)
    dbvf_ref[:] += jnp.sum(dv, axis=0, keepdims=True)
    dlstd_ref[:] += dlstd_tile

    for li in range(n_layers - 1, -1, -1):
        h_out = hs[li + 1]
        dz = dh * (1.0 - h_out * h_out)  # tanh'
        dw_ref, db_ref = d_trunk[li]
        dw_ref[:] += _mm(hs[li], dz, ((0,), (0,)), compute_dtype)
        db_ref[:] += jnp.sum(dz, axis=0, keepdims=True)
        if li > 0:
            w_ref, _ = trunk[li]
            dh = _mm(dz, w_ref[:], ((1,), (1,)), compute_dtype)

    # ---- metrics: sums in lanes 0..2 of a (1, 128) row ----
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    pg_sum = jnp.sum(pg_per)
    vf_sum = jnp.sum(0.5 * vf_err * vf_err)
    kl_sum = jnp.sum(old_logp - logp)
    row = (
        jnp.where(lane == 0, pg_sum, 0.0)
        + jnp.where(lane == 1, vf_sum, 0.0)
        + jnp.where(lane == 2, kl_sum, 0.0)
    )
    metrics_ref[:] += row


# ---------------------------------------------------------------------------
# Transposed (feature-major) variant: consumes the fused rollout kernel's
# (T, C, N) buffers directly.  Rationale: any (.., N, small-C) array on TPU
# pads the minor dim to 128 lanes — obs (M, 4) costs 32x its true bytes in
# both HBM footprint and kernel read traffic, and transposing to row-major
# materializes a 26.8 GB copy at pod batch.  With envs on the LANE dim
# everywhere (rollout outputs, GAE, minibatch slices, this kernel), no array
# is ever padded and no transpose is ever materialized; minibatches are env
# slices (all T timesteps for a contiguous env range), which at
# shuffle=False mixes at least as well as time-contiguous row-major blocks.
# ---------------------------------------------------------------------------
def _kernel_T(
    n_layers: int,
    n_steps: int,
    s_dim: int,
    a_dim: int,
    inv_m: float,
    clip_eps: float,
    vf_coef: float,
    compute_dtype,
    swap_dw0: bool,
    split_at: Tuple[int, ...] | None,
    *refs,
):
    """One grid step = one (env tile x T-chunk) block; grid is 2D
    ``(n/L, T/Tc)`` so the per-step matmul lane width L can be large
    (1024) without holding all T timesteps of the tile in VMEM — at a
    fixed total FLOP count, wider matmuls mean ~4x fewer kernel-loop
    iterations and far better MXU utilisation than the 1D (all-T,
    L=256) blocking (measured 355 ms vs the 107 ms FLOP floor).

    ``refs`` layout:
    inputs:  obs (Tc, S, L), actions (Tc, A, L) — the fused rollout's
             buffers; old_logp / adv / returns (Tc, L) — 2D, unpadded,
             w0T (H, S), b0 (H, 1), ..., whead (A+1, H) (pi rows then the
             vf row), bhead (A+1, 1), log_std (A, 1)
    outputs: dw0T, db0, ..., dwhead (A+1, H), dbhead (A+1, 1),
             dlog_std (A, 1), metrics (1, 128) — accumulated across the
             whole grid

    The pi and vf heads are CONCATENATED into one (A+1, H) matrix: each
    separate head op is M- or K-padded to the MXU's 128 granularity, so
    merging halves the head op count per step (fwd, dh, dW) — measured
    233.6 -> 196.2 ms for the 52.4M-sample update (scripts/
    exp_update_kernel.py; dual-layout weights and python-unrolled /
    lane-concatenated dW variants measured no further gain).

    ``split_at`` (round 4) enables the reference's SEPARATE pi/vf towers
    (experiments/helpers.py:71 ``net_arch=[dict(pi=[256,256],
    vf=[256,256])]``) as a STACKED trunk: per-layer entry = the per-tower
    output width.  Layer 0 stacks both towers' weights on the output dim
    (shared input x, ONE matmul, zero waste); inner layers run two
    per-tower matmuls on sublane row slices of the stacked carries; the
    merged (A+1, 2H) head carries TRUE ZERO off-blocks, so the existing
    merged forward (mv), dh contraction, and dW accumulation stay
    bit-identical code — the off-block dW garbage never influences any
    in-block value and is discarded by the host unpack.  No op is
    block-diagonal-padded: total MXU work is exactly the two towers' own
    (2x the shared trunk's, which is the honest cost of the reference
    architecture).
    """
    it = iter(refs)
    obs_ref, act_ref, olp_ref, adv_ref, ret_ref = (next(it) for _ in range(5))
    trunk = [(next(it), next(it)) for _ in range(n_layers)]
    whead_ref, bhead_ref, lstd_ref = (next(it) for _ in range(3))
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
    t_chunk = obs_ref.shape[0]
    # program_id must be read at kernel top level (the interpret-mode
    # lowering cannot evaluate it inside the fori_loop body's closed call)
    t_base = pl.program_id(1) * t_chunk

    def step(t, carry):
        (accs, pg_sum, vf_sum, kl_sum) = carry
        # Zero-padded timesteps (T padded to a multiple of 8 by the caller
        # so a small multiple-of-8 T-chunk always exists): the policy-
        # gradient terms vanish on their own (adv = 0 -> dlogp = 0), but
        # the value head sees v(0) != ret = 0, so dv and the vf/kl metric
        # sums must be masked by step validity.
        valid = (t_base + t < n_steps).astype(jnp.float32)
        x = obs_ref[t]  # (S, L)

        hs = [x]
        h = x
        for li, (w_ref, b_ref) in enumerate(trunk):
            # saved activations in compute_dtype (bf16 in production):
            # halves the live VMEM so L=1024 lanes fit
            if split_at is None or li == 0:
                pre = _mm(w_ref[:], h, ((1,), (0,)), compute_dtype)
            else:
                wo, wi = split_at[li], split_at[li - 1]
                pre = jnp.concatenate(
                    [
                        _mm(w_ref[:wo], h[:wi], ((1,), (0,)), compute_dtype),
                        _mm(w_ref[wo:], h[wi:], ((1,), (0,)), compute_dtype),
                    ],
                    axis=0,
                )
            h = jnp.tanh(pre + b_ref[:]).astype(compute_dtype)
            hs.append(h)
        mv = _mm(whead_ref[:], h, ((1,), (0,)), compute_dtype) + bhead_ref[:]  # (A+1, L)
        mean = mv[:a_dim]  # (A, L)
        v = mv[a_dim:]  # (1, L)

        z = (act_ref[t] - mean) * inv_std  # (A, L)
        logp = jnp.sum(-0.5 * z * z - log_std - 0.5 * _LOG_2PI, axis=0, keepdims=True)
        old_logp = olp_ref[t].reshape(1, -1)  # (L,) -> (1, L)
        adv = adv_ref[t].reshape(1, -1)
        ret = ret_ref[t].reshape(1, -1)

        ratio = jnp.exp(logp - old_logp)
        pg1 = ratio * adv
        pg2 = jnp.clip(ratio, 1.0 - clip_eps, 1.0 + clip_eps) * adv
        vf_err = v - ret

        inside = ((ratio > 1.0 - clip_eps) & (ratio < 1.0 + clip_eps)).astype(jnp.float32)
        take1 = (pg1 < pg2).astype(jnp.float32)
        tie = (pg1 == pg2).astype(jnp.float32)
        branch = take1 + (1.0 - take1 - tie) * inside + 0.5 * tie * (1.0 + inside)
        dratio = -(adv * inv_m) * branch
        dlogp = dratio * ratio  # (1, L)
        dmean = dlogp * (z * inv_std)  # (A, L)
        dv = (valid * vf_coef * inv_m) * vf_err  # (1, L); masked on padding
        dmv = jnp.concatenate([dmean, dv], axis=0)  # (A+1, L)

        # dh: contract the merged heads' output dim in one op.
        dh = _mm(whead_ref[:], dmv, ((0,), (0,)), compute_dtype)  # (H, L)

        (a_trunk, a_wh, a_bh, a_lstd) = accs
        a_wh = a_wh + _mm(dmv, hs[-1], ((1,), (1,)), compute_dtype)  # (A+1, H)
        a_bh = a_bh + jnp.sum(dmv, axis=1, keepdims=True)
        a_lstd = a_lstd + jnp.sum(dlogp * (z * z - 1.0), axis=1, keepdims=True)

        new_trunk = []
        for li in range(n_layers - 1, -1, -1):
            h_out = hs[li + 1]
            dz = dh * (1.0 - h_out * h_out)
            a_w, a_b = a_trunk[li]
            if li == 0 and swap_dw0:
                # Layer-0 dW with SWAPPED operands, accumulated (in, H): the
                # tiny obs dim lands on the output-sublane position M
                # (8-granular pad) instead of the lane position N
                # (128-granular pad).  The MXU charges M_pad x K x N, so the
                # lane-lane form dot(dz, x) -> (H, S) pays 256 x L x 128
                # where dot(x, dz) -> (S, H) pays 8 x L x 256 — a measured
                # 15.5 ms (8%) of the 52.4M-sample config-5 update
                # (scripts/exp_dw_layout.py round-3 ablation; per-op marginal
                # costs in BENCH_NOTES.md).  In split mode the stacked
                # layer-0 dW is still ONE matmul (shared input x).
                a_w = a_w + _mm(hs[0], dz, ((1,), (1,)), compute_dtype)
            elif split_at is None or li == 0:
                a_w = a_w + _mm(dz, hs[li], ((1,), (1,)), compute_dtype)  # (H, in)
            else:
                wo, wi = split_at[li], split_at[li - 1]
                a_w = a_w + jnp.concatenate(
                    [
                        _mm(dz[:wo], hs[li][:wi], ((1,), (1,)), compute_dtype),
                        _mm(dz[wo:], hs[li][wi:], ((1,), (1,)), compute_dtype),
                    ],
                    axis=0,
                )
            a_b = a_b + jnp.sum(dz, axis=1, keepdims=True)
            new_trunk.append((a_w, a_b))
            if li > 0:
                w_ref, _ = trunk[li]
                if split_at is None:
                    dh = _mm(w_ref[:], dz, ((0,), (0,)), compute_dtype)
                else:
                    wo, wi = split_at[li], split_at[li - 1]
                    dh = jnp.concatenate(
                        [
                            _mm(w_ref[:wo], dz[:wo], ((0,), (0,)), compute_dtype),
                            _mm(w_ref[wo:], dz[wo:], ((0,), (0,)), compute_dtype),
                        ],
                        axis=0,
                    )
        new_trunk = tuple(reversed(new_trunk))

        pg_sum = pg_sum + valid * jnp.sum(-jnp.minimum(pg1, pg2))
        vf_sum = vf_sum + valid * jnp.sum(0.5 * vf_err * vf_err)
        kl_sum = kl_sum + valid * jnp.sum(old_logp - logp)
        return ((new_trunk, a_wh, a_bh, a_lstd), pg_sum, vf_sum, kl_sum)

    zero_accs = (
        tuple(
            (jnp.zeros(dw.shape, jnp.float32), jnp.zeros(db.shape, jnp.float32))
            for dw, db in d_trunk
        ),
        jnp.zeros(dwh_ref.shape, jnp.float32),
        jnp.zeros(dbh_ref.shape, jnp.float32),
        jnp.zeros(dlstd_ref.shape, jnp.float32),
    )
    (accs, pg_sum, vf_sum, kl_sum) = jax.lax.fori_loop(
        0, obs_ref.shape[0], step, (zero_accs, jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    )
    (a_trunk, a_wh, a_bh, a_lstd) = accs
    for (dw_ref, db_ref), (a_w, a_b) in zip(d_trunk, a_trunk):
        dw_ref[:] += a_w
        db_ref[:] += a_b
    dwh_ref[:] += a_wh
    dbh_ref[:] += a_bh
    dlstd_ref[:] += a_lstd
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    metrics_ref[:] += (
        jnp.where(lane == 0, pg_sum, 0.0)
        + jnp.where(lane == 1, vf_sum, 0.0)
        + jnp.where(lane == 2, kl_sum, 0.0)
    )


@partial(
    jax.jit,
    static_argnames=("clip_eps", "vf_coef", "tile", "interpret", "compute_dtype"),
)
def ppo_fused_grads_T(
    params: Dict,
    obs_t: jax.Array,
    actions_t: jax.Array,
    old_logp: jax.Array,
    adv: jax.Array,
    returns: jax.Array,
    clip_eps: float = 0.2,
    vf_coef: float = 0.5,
    tile: int = 512,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
) -> Tuple[Dict, Dict]:
    """Feature-major fused PPO grads: ``obs_t (T, S, N)``, ``actions_t
    (T, A, N)``, ``old_logp/adv/returns (T, N)`` — the fused rollout
    kernel's native buffers.  ``N`` must be a multiple of ``tile``.
    Returns grads in the standard (row-major) param layout + metrics.

    Accepts BOTH actor-critic layouts: the shared-trunk production layout
    and the reference's separate pi/vf towers (``{"pi": [...], "vf":
    [...], "log_std"}``, experiments/helpers.py:71) — the latter runs as
    a stacked trunk with a zero-off-block merged head (see ``_kernel_T``);
    grads come back in the same layout as ``params``.
    """
    T, s_dim, n = obs_t.shape
    a_dim = actions_t.shape[1]
    assert n % tile == 0, (n, tile)
    # Pad the horizon to a multiple of 8 so a small multiple-of-8 T-chunk
    # ALWAYS exists (Mosaic requires 2D block sublane dims divisible by 8
    # unless equal to the array dim; without padding, T=100 forced
    # t_chunk=T, whose input blocks capped the lane tile at 512 — a
    # measured 17.94M scoped-vmem OOM at 1024).  Padded steps are zeros;
    # the kernel masks the value-head gradient and the metric sums by
    # step validity (the pg terms vanish on their own via adv = 0), so
    # grads equal the unpadded math exactly (asserted vs jax.grad in
    # tests/test_fused_ppo.py at T % 8 != 0).  Padding per call (rather
    # than once per batch in the caller) re-copies each minibatch's input
    # slices, but keeps this function correct standalone AND keeps the
    # caller's advantage-normalisation statistics exact (body-level
    # padding would inject zeros into the per-minibatch mean/std);
    # measured cost at T=100/262k envs: none (170-173M steps/s, equal to
    # the unpadded 171M baseline).
    T_pad = -(-T // 8) * 8
    if T_pad != T:
        dt_pad = T_pad - T
        obs_t = jnp.pad(obs_t, ((0, dt_pad), (0, 0), (0, 0)))
        actions_t = jnp.pad(actions_t, ((0, dt_pad), (0, 0), (0, 0)))
        old_logp = jnp.pad(old_logp, ((0, dt_pad), (0, 0)))
        adv = jnp.pad(adv, ((0, dt_pad), (0, 0)))
        returns = jnp.pad(returns, ((0, dt_pad), (0, 0)))
    # (tile, T-chunk) selection under Mosaic's 16M scoped-vmem stack:
    # t_chunk is a multiple-of-8 divisor of T_pad under a cap that keeps
    # input blocks small at wide tiles.  Footprint model = double-buffered
    # input blocks (2 x 4 B x t_chunk x tile x (pad(S) + pad(A) + 3 flat
    # channels)) + per-lane live tensors (saved bf16 activations + f32
    # dz/dh/staging, scaling with trunk width/depth).  Calibrated so every
    # empirically measured point is reproduced: (tile=2048, Tc=8, S=4,
    # A=2, h=256) runs on v5e (production config 5, modelled 15.1M) and
    # (1024, Tc=40) runs (modelled 9.9M).
    from mbt_gym_tpu.ops.pallas_rollout import _sublane_pad

    split = "shared" not in params
    if split:
        t_pi, t_vf = params["pi"][:-1], params["vf"][:-1]
        assert [l["w"].shape for l in t_pi] == [l["w"].shape for l in t_vf], (
            "separate pi/vf towers must have matching widths (the reference "
            "always uses symmetric net_arch, experiments/helpers.py:71)"
        )
        n_layers = len(t_pi)
        widths = tuple(l["w"].shape[1] for l in t_pi)
        split_at = widths
        # stacked-trunk arrays: (2*w_out, w_in) transposed weights; layer 0
        # shares the obs input so its in-dim stays s_dim
        trunk_arrays = [
            (
                jnp.concatenate([p["w"].T, v["w"].T], axis=0),
                jnp.concatenate([p["b"], v["b"]]).reshape(-1, 1),
            )
            for p, v in zip(t_pi, t_vf)
        ]
        hp, hv = params["pi"][-1], params["vf"][-1]
        w_last = widths[-1]
        h_dim = 2 * w_last  # stacked carry width (VMEM model + head specs)
        whead = jnp.zeros((a_dim + 1, h_dim), hp["w"].dtype)
        whead = whead.at[:a_dim, :w_last].set(hp["w"].T)
        whead = whead.at[a_dim:, w_last:].set(hv["w"].T)
        bhead = jnp.concatenate([hp["b"], hv["b"]]).reshape(-1, 1)
    else:
        trunk = params["shared"]
        n_layers = len(trunk)
        split_at = None
        h_dim = trunk[-1]["w"].shape[1]
        trunk_arrays = [
            (trunk[li]["w"].T, trunk[li]["b"].reshape(-1, 1))
            for li in range(n_layers)
        ]
        whead = jnp.concatenate(
            [params["pi_head"]["w"], params["vf_head"]["w"]], axis=1
        ).T  # (A+1, H)
        bhead = jnp.concatenate(
            [params["pi_head"]["b"], params["vf_head"]["b"]]
        ).reshape(-1, 1)  # (A+1, 1)
    channels = _sublane_pad(s_dim) + _sublane_pad(a_dim) + 3
    per_lane = 6800 * max(h_dim, 128) // 256 * max(n_layers, 2) // 2
    budget = int(15.75 * 1024 * 1024)

    def chunk_for(t_tile):
        cap = 8 if t_tile >= 2048 else 40
        return next(
            d for d in range(min(cap, T_pad), 0, -1)
            if T_pad % d == 0 and d % 8 == 0
        )

    t_chunk = chunk_for(tile)
    while tile > 128 and (
        2 * 4 * chunk_for(tile) * tile * channels + per_lane * tile > budget
    ):
        tile //= 2
        t_chunk = chunk_for(tile)
    # Halving preserves 128-lane granularity only for power-of-two multiples
    # of 128; a caller-passed tile like 384 would halve to an illegal 96-lane
    # width the Mosaic blocking assumes away (ADVICE r2) — fail loudly.
    # (Interpret mode has no lane constraint; CPU tests use small tiles.)
    assert interpret or tile % 128 == 0, (
        f"VMEM-fit halving produced lane tile {tile}; pass a power-of-two "
        "multiple of 128"
    )
    assert n % tile == 0, (n, tile)
    grid = (n // tile, T_pad // t_chunk)
    m = T * n  # normalisation uses the TRUE sample count, not the padding
    cdt = jnp.dtype(compute_dtype)

    def full(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape))

    flat_block = pl.BlockSpec((t_chunk, tile), lambda i, j: (j, i))
    inputs = [obs_t, actions_t, old_logp, adv, returns]
    in_specs = [
        pl.BlockSpec((t_chunk, s_dim, tile), lambda i, j: (j, 0, i)),
        pl.BlockSpec((t_chunk, a_dim, tile), lambda i, j: (j, 0, i)),
        flat_block, flat_block, flat_block,
    ]
    for wT, b in trunk_arrays:
        inputs += [wT, b]
        in_specs += [full(wT.shape), full(b.shape)]
    inputs += [whead, bhead, params["log_std"].reshape(-1, 1)]
    in_specs += [full((a_dim + 1, h_dim)), full((a_dim + 1, 1)), full((a_dim, 1))]

    # Layer-0 dW is accumulated with swapped operands in natural (in, out)
    # layout whenever the input dim is narrow (see _kernel_T's swap_dw0
    # comment) — for production obs dims (4-8) this moves the pad-forced
    # dimension from 128-granular N to 8-granular M.
    swap_dw0 = s_dim < 128
    out_shapes = []
    out_specs = []
    for li in range(n_layers):
        wT_shape = trunk_arrays[li][0].shape  # (out_tot, in)
        dw_shape = wT_shape[::-1] if (li == 0 and swap_dw0) else wT_shape
        out_shapes += [
            jax.ShapeDtypeStruct(dw_shape, jnp.float32),
            jax.ShapeDtypeStruct((wT_shape[0], 1), jnp.float32),
        ]
        out_specs += [full(dw_shape), full((wT_shape[0], 1))]
    out_shapes += [
        jax.ShapeDtypeStruct((a_dim + 1, h_dim), jnp.float32),
        jax.ShapeDtypeStruct((a_dim + 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((a_dim, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
    ]
    out_specs += [
        full((a_dim + 1, h_dim)), full((a_dim + 1, 1)),
        full((a_dim, 1)), full((1, 128)),
    ]

    kernel = partial(
        _kernel_T, n_layers, T, s_dim, a_dim, 1.0 / m, clip_eps, vf_coef, cdt,
        swap_dw0, split_at,
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    it = iter(outs)
    if split:
        g_pi, g_vf = [], []
        for li in range(n_layers):
            dwT, db = next(it), next(it)
            wo = widths[li]
            if li == 0 and swap_dw0:
                dwp, dwv = dwT[:, :wo], dwT[:, wo:]  # natural (S, w0)
            else:
                dwp, dwv = dwT[:wo].T, dwT[wo:].T
            g_pi.append({"w": dwp.astype(t_pi[li]["w"].dtype),
                         "b": db[:wo, 0].astype(t_pi[li]["b"].dtype)})
            g_vf.append({"w": dwv.astype(t_vf[li]["w"].dtype),
                         "b": db[wo:, 0].astype(t_vf[li]["b"].dtype)})
        dwh, dbh, dlstd, metrics = (next(it) for _ in range(4))
        # in-block slices only — the off-block dW garbage dies here
        g_pi.append({"w": dwh[:a_dim, :w_last].T.astype(hp["w"].dtype),
                     "b": dbh[:a_dim, 0].astype(hp["b"].dtype)})
        g_vf.append({"w": dwh[a_dim:, w_last:].T.astype(hv["w"].dtype),
                     "b": dbh[a_dim:, 0].astype(hv["b"].dtype)})
        grads = {
            "pi": g_pi,
            "vf": g_vf,
            "log_std": dlstd[:, 0].astype(params["log_std"].dtype),
        }
    else:
        g_trunk = []
        for li in range(n_layers):
            dwT, db = next(it), next(it)
            dw = dwT if (li == 0 and swap_dw0) else dwT.T  # layer 0 is natural
            g_trunk.append({
                "w": dw.astype(trunk[li]["w"].dtype),
                "b": db[:, 0].astype(trunk[li]["b"].dtype),
            })
        dwh, dbh, dlstd, metrics = (next(it) for _ in range(4))
        grads = {
            "shared": g_trunk,
            "pi_head": {"w": dwh[:a_dim].T.astype(params["pi_head"]["w"].dtype),
                        "b": dbh[:a_dim, 0].astype(params["pi_head"]["b"].dtype)},
            "vf_head": {"w": dwh[a_dim:].T.astype(params["vf_head"]["w"].dtype),
                        "b": dbh[a_dim:, 0].astype(params["vf_head"]["b"].dtype)},
            "log_std": dlstd[:, 0].astype(params["log_std"].dtype),
        }
    metric_dict = {
        "pg_loss": metrics[0, 0] / m,
        "vf_loss": metrics[0, 1] / m,
        "approx_kl": metrics[0, 2] / m,
    }
    return grads, metric_dict


@partial(
    jax.jit,
    static_argnames=("clip_eps", "vf_coef", "tile", "interpret", "compute_dtype"),
)
def ppo_fused_grads(
    params: Dict,
    obs: jax.Array,
    actions: jax.Array,
    old_logp: jax.Array,
    adv: jax.Array,
    returns: jax.Array,
    clip_eps: float = 0.2,
    vf_coef: float = 0.5,
    tile: int = 1024,
    interpret: bool = False,
    compute_dtype: str = "bfloat16",
) -> Tuple[Dict, Dict]:
    """Gradients of the PPO clipped-surrogate + value loss w.r.t. the
    shared-trunk params, plus loss metrics, for one minibatch.

    ``obs (M, S)``, ``actions (M, A)``, ``old_logp/adv/returns (M,)``;
    ``M`` must be a multiple of ``tile``.  Advantages should already be
    normalised (the caller normalises per minibatch, as the XLA path
    does).  Entropy does not depend on ``obs`` — its metric/grad term is
    handled analytically by the caller."""
    assert "shared" in params, "fused update requires the shared-trunk layout"
    m = obs.shape[0]
    assert m % tile == 0, (m, tile)
    grid = m // tile
    s_dim = obs.shape[1]
    a_dim = actions.shape[1]
    trunk = params["shared"]
    n_layers = len(trunk)
    widths = [trunk[li]["w"].shape[1] for li in range(n_layers)]
    h_dim = widths[-1]
    cdt = jnp.dtype(compute_dtype)

    col = lambda x: x.reshape(m, 1)
    inputs = [obs, actions, col(old_logp), col(adv), col(returns)]
    in_specs = [
        pl.BlockSpec((tile, s_dim), lambda i: (i, 0)),
        pl.BlockSpec((tile, a_dim), lambda i: (i, 0)),
        pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile, 1), lambda i: (i, 0)),
        pl.BlockSpec((tile, 1), lambda i: (i, 0)),
    ]
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape))
    for li in range(n_layers):
        w, b = trunk[li]["w"], trunk[li]["b"]
        inputs += [w, b.reshape(1, -1)]
        in_specs += [full(w.shape), full((1, b.shape[0]))]
    inputs += [
        params["pi_head"]["w"], params["pi_head"]["b"].reshape(1, -1),
        params["vf_head"]["w"], params["vf_head"]["b"].reshape(1, -1),
        params["log_std"].reshape(1, -1),
    ]
    in_specs += [
        full(params["pi_head"]["w"].shape), full((1, a_dim)),
        full(params["vf_head"]["w"].shape), full((1, 1)),
        full((1, a_dim)),
    ]

    out_shapes = []
    out_specs = []
    for li in range(n_layers):
        w = trunk[li]["w"]
        out_shapes += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, w.shape[1]), jnp.float32),
        ]
        out_specs += [full(w.shape), full((1, w.shape[1]))]
    out_shapes += [
        jax.ShapeDtypeStruct((h_dim, a_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, a_dim), jnp.float32),
        jax.ShapeDtypeStruct((h_dim, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((1, a_dim), jnp.float32),
        jax.ShapeDtypeStruct((1, 128), jnp.float32),
    ]
    out_specs += [
        full((h_dim, a_dim)), full((1, a_dim)),
        full((h_dim, 1)), full((1, 1)),
        full((1, a_dim)), full((1, 128)),
    ]

    kernel = partial(_kernel, n_layers, 1.0 / m, clip_eps, vf_coef, cdt)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    it = iter(outs)
    g_trunk = []
    for li in range(n_layers):
        dw, db = next(it), next(it)
        g_trunk.append({"w": dw.astype(trunk[li]["w"].dtype), "b": db[0].astype(trunk[li]["b"].dtype)})
    dwpi, dbpi, dwvf, dbvf, dlstd, metrics = (next(it) for _ in range(6))
    grads = {
        "shared": g_trunk,
        "pi_head": {"w": dwpi.astype(params["pi_head"]["w"].dtype), "b": dbpi[0].astype(params["pi_head"]["b"].dtype)},
        "vf_head": {"w": dwvf.astype(params["vf_head"]["w"].dtype), "b": dbvf[0].astype(params["vf_head"]["b"].dtype)},
        "log_std": dlstd[0].astype(params["log_std"].dtype),
    }
    metric_dict = {
        "pg_loss": metrics[0, 0] / m,
        "vf_loss": metrics[0, 1] / m,
        "approx_kl": metrics[0, 2] / m,
    }
    return grads, metric_dict
