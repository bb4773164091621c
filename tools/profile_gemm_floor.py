"""Bare-GEMM floor for the 256^2 x 64 conv shape (ceiling-claim closure).

The conv ledger (PARITY.md) rejected eight conv formulations against the
XLA emitter's ~1.9-2.1 ms at b8 256^2 64->64, while both rooflines sit
~10x lower (HBM 0.17 ms, MXU 0.2 ms). Last diagnostic: time the PURE
im2col GEMM shape, (b*h*w, 9c) @ (9c, cout) = (524288, 576) @ (576, 64),
with the im2col matrix *pre-materialized* — i.e. what a conv would cost if
the im2col assembly were free. Its HBM floor alone is 604 MB bf16 / ~819
GB/s = 0.74 ms, so:

  - measured >= ~1.9 ms  -> the emitter is already at the achievable
    GEMM floor for this shape; the ceiling claim is fully closed.
  - measured well below  -> a cheaper im2col would win in principle, but
    the measured kernels showed the assembly is NOT free (2.89 ms total).

Pitfalls handled by construction (CLAUDE.md gotchas):
  - DCE: each iteration's product feeds the next weight through abs(), and
    the final carry is returned — no dead branches.
  - algebraic collapse: abs() breaks linearity, so XLA cannot rewrite
    sum(x @ w) into reductions.
  - tunnel memoization: the WEIGHT varies >=1% inside the scan and the
    timed call's inputs differ from the warm-up's.
  - dispatch overhead: one jitted scan of ITERS GEMMs, not isolated calls.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_gemm_floor.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ITERS_A, ITERS_B = 15, 60


def _sync(r):
    # block_until_ready is NOT a real sync through the axon tunnel — only
    # a value transfer forces completion (CLAUDE.md). r is small for both
    # chains, so the transfer itself is one round trip.
    return float(jnp.sum(jnp.abs(r).astype(jnp.float32)))


def timed(make_chain, x, w, label, per_iter_bytes, per_iter_flops):
    """Marginal per-iteration time: (T(60) - T(15)) / 45, each T measured
    with a forced value transfer and with inputs varied >=1% vs the
    warm-up (the tunnel memoizes identical (executable, args) calls).
    The subtraction removes dispatch + transfer + constant overhead."""
    chains = {n: make_chain(n) for n in (ITERS_A, ITERS_B)}
    scales = iter([1.01, 1.02, 1.03, 1.04, 1.05, 1.06])
    totals = {}
    for n, chain in chains.items():
        _sync(chain(x, w))  # warm-up / compile
        s = next(scales)
        x2, w2 = x * jnp.bfloat16(s), w * jnp.bfloat16(s + 0.01)
        _sync(x2), _sync(w2)
        best = float("inf")
        for _ in range(2):
            s = next(scales)
            x2, w2 = x * jnp.bfloat16(s), w * jnp.bfloat16(s + 0.005)
            _sync(x2), _sync(w2)
            t0 = time.time()
            _sync(chain(x2, w2))
            best = min(best, time.time() - t0)
        totals[n] = best
    ms = (totals[ITERS_B] - totals[ITERS_A]) / (ITERS_B - ITERS_A) * 1000
    print(f"{label}: {ms:.2f} ms/iter marginal "
          f"(T15 {totals[ITERS_A]*1e3:.0f} ms, T60 {totals[ITERS_B]*1e3:.0f} "
          f"ms; {per_iter_bytes / ms / 1e6 / 819:.1%} of HBM peak, "
          f"{per_iter_flops / ms / 1e9 / 197:.1%} MFU)")
    return ms


def main():
    print("backend:", jax.default_backend())
    b, hw, c = 8, 256 * 256, 64
    M, K, N = b * hw, 9 * c, c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.bfloat16)

    def make_gemm_chain(iters):
        @jax.jit
        def gemm_chain(x, w0):
            def body(w, i):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                # EVERY row of y feeds the next weight through abs()+sum —
                # no dead rows (a y[:K] slice would let XLA shrink the GEMM
                # to (K,K)@(K,N); measured: "0.00 ms"), and abs() blocks
                # factoring the reduction through the matmul. w is loop-
                # carried through y, so x@w cannot be hoisted either.
                colsum = jnp.sum(jnp.abs(y), axis=0)  # (N,)
                w = (w * 0.98 + 1e-9 * colsum[None, :]).astype(x.dtype)
                return w, ()

            w, _ = lax.scan(body, w0, jnp.arange(iters))
            return w

        return gemm_chain

    def make_read_chain(iters):
        @jax.jit
        def read_chain(x, w0):
            # HBM floor calibration: one full pass over x per iteration, no
            # MXU. The carried scalar enters ADDITIVELY inside abs() so the
            # reduction cannot be factored into hoisted sum(abs(x)) * scale
            # (the multiplicative form collapsed to one pass; measured).
            def body(s, i):
                # cast s to bf16 before the add: an fp32 broadcast would
                # upcast the whole 604 MB operand
                s = jnp.sum(jnp.abs(x + s.astype(x.dtype)),
                            dtype=jnp.float32) * jnp.float32(1e-9)
                return s, ()

            s, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(iters))
            return s

        return read_chain

    gemm_bytes = M * K * 2 + K * N * 2 + M * N * 4  # x read, w read, y write
    # y is consumed in-kernel (fed to the weight update) but XLA will still
    # materialize the fp32 product; count it for honesty, it's 134 MB
    gemm_flops = 2 * M * K * N
    t_read = timed(make_read_chain, x, w0, f"read x ({M*K*2/1e6:.0f} MB)",
                   M * K * 2, 0)
    t_gemm = timed(make_gemm_chain, x, w0,
                   f"GEMM ({M}x{K})@({K}x{N}) bf16", gemm_bytes, gemm_flops)
    print(f"XLA conv emitter at this shape (ledger): ~1.91 ms; "
          f"im2col Pallas conv: 2.89 ms")
    print(f"=> pre-materialized-im2col GEMM floor is {t_gemm:.2f} ms "
          f"(pure read floor {t_read:.2f} ms)")


if __name__ == "__main__":
    main()
