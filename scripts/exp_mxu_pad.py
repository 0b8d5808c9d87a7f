"""Probe: what does the MXU charge for matmuls with a tiny (pad-forced)
dimension?  Decides where the fused-update kernel's remaining headroom is.

Hypothesis (round 3): the update kernel's per-step cost is dominated not by
dW operand transposes (measured: dzT/hsT restructure moves <3%) but by the
five SMALL matmuls whose M/K/N of 3-4 pads to the MXU's 128 granularity
(fwd layer0 K=S=4, fwd head M=A+1=3, dh-head K=3, dW-head M=3, dW0 N=4) —
each costing ~as much as half a 256x2048x256 matmul.

Each case: grid=(n,), per program ONE dot_general accumulating into the
output (grid-indexed lhs blocks prevent CSE/hoisting); rhs VMEM-resident.
Reports ns/dot and effective vs padded FLOP utilisation.
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

INTERP = bool(os.environ.get("EXP_INTERPRET"))
if INTERP:
    jax.config.update("jax_platforms", "cpu")

N_ITER = 4000 if not INTERP else 8
L = 2048 if not INTERP else 256


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    H = 256

    def rc(name, lhs, rhs, dims):
        # kernel squeezes the leading 1 of the lhs block via a_ref[0]
        def kernel(a_ref, b_ref, out_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            out_ref[:] += jax.lax.dot_general(
                a_ref[0].astype(jnp.bfloat16), b_ref[:].astype(jnp.bfloat16),
                dimension_numbers=(dims, ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_m = lhs[1 - dims[0][0]]
        out_n = rhs[1 - dims[1][0]]
        k_dim = lhs[dims[0][0]]
        m_ = out_m
        n_ = out_n
        a = jax.random.normal(jax.random.PRNGKey(0), (N_ITER, *lhs), jnp.float32) * 0.1
        b = jax.random.normal(jax.random.PRNGKey(1), rhs, jnp.float32) * 0.1

        @jax.jit
        def run(a, b):
            out = pl.pallas_call(
                kernel,
                grid=(N_ITER,),
                in_specs=[
                    pl.BlockSpec((1, *lhs), lambda i: (i, 0, 0)),
                    pl.BlockSpec(rhs, lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((out_m, out_n), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((out_m, out_n), jnp.float32),
                interpret=INTERP,
            )(a, b)
            return jnp.sum(jnp.abs(out))

        try:
            float(run(a, b))
            t0 = time.time()
            acc = None
            for _ in range(3):
                r = run(a, b)
                acc = r if acc is None else acc + r
            float(acc)
            dt = (time.time() - t0) / 3
            ns = dt / N_ITER * 1e9
            true_macs = m_ * k_dim * n_
            log(f"{name:30s} {ns:9.1f} ns/dot  true {true_macs/1e6:7.2f}M MACs "
                f"-> {true_macs/(dt/N_ITER)/1e12:6.2f} T-MACs/s")
        except Exception as e:
            log(f"{name:30s} FAILED: {type(e).__name__}: {str(e)[:200]}")

    cases = [
        # name, lhs shape, rhs shape, dims  (natural (1,0) unless noted)
        ("big (256x256)x(256xL)", (H, H), (H, L), (((1,), (0,)))),
        ("K=4: (256x4)x(4xL)", (H, 4), (4, L), (((1,), (0,)))),
        ("K=8: (256x8)x(8xL)", (H, 8), (8, L), (((1,), (0,)))),
        ("K=128: (256x128)x(128xL)", (H, 128), (128, L), (((1,), (0,)))),
        ("M=3: (3x256)x(256xL)", (3, H), (H, L), (((1,), (0,)))),
        ("M=8: (8x256)x(256xL)", (8, H), (H, L), (((1,), (0,)))),
        ("M=128: (128x256)x(256xL)", (128, H), (H, L), (((1,), (0,)))),
        # the update kernel's actual lane-lane dW form
        ("dW lane-lane (256xL)x(256xL)", (H, L), (H, L), (((1,), (1,)))),
        ("dW N=4: (256xL)x(4xL)", (H, L), (4, L), (((1,), (1,)))),
        # lhsT (sublane-sublane) form used by dh
        ("dh K=3 lhsT (3x256)x(3xL)", (3, H), (3, L), (((0,), (0,)))),
    ]
    which = sys.argv[1:] or [c[0] for c in cases]
    for c in cases:
        if c[0] in which or not sys.argv[1:]:
            rc(*c)


if __name__ == "__main__":
    main()
