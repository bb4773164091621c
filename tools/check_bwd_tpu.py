"""On-chip microbench of the Pallas LinearAttention backward vs XLA vjp.

Chained: K calls inside one jitted lax.scan with per-iteration-varied dy
(the axon tunnel memoizes identical calls and a single call is dominated by
the ~28 ms tunnel round-trip — CLAUDE.md benchmark gotcha).

VARIATION NOTE: inputs are varied by >=1% steps — bf16 cannot
represent 1e-6-relative changes, so smaller steps produce bit-identical
inputs that the axon tunnel memoizes (times collapse to ~0.01 ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))

import jax.numpy as jnp
import numpy as np

from pointreggpt_tpu.ops import linear_attention as LA

HEADS, D = 4, 32
K = 16


def log(m):
    print(m, file=sys.stderr, flush=True)


def bench(fn, *args, reps=3):
    jax.block_until_ready(fn(jnp.float32(1.0), *args))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(jnp.float32(1.0 + 0.01 * (i + 1)), *args))
        ts.append(time.time() - t0)
    return min(ts) / K


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    for (b, n, c) in [(16, 65536, 64), (16, 16384, 128), (16, 4096, 256)]:
        x = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
        dy = jnp.asarray(rng.normal(size=(b, n, c)), jnp.bfloat16)
        w_qkv = jnp.asarray(rng.normal(size=(c, 3 * HEADS * D)) * 0.1,
                            jnp.float32)
        w_out = jnp.asarray(rng.normal(size=(HEADS * D, c)) * 0.1,
                            jnp.float32)
        b_out = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
        g_out = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)), jnp.float32)

        @jax.jit
        def pal_chain(eps, x, dy):
            def body(acc, i):
                outs = LA._pallas_fused_bwd(
                    x, (dy * (eps + i * 0.01)).astype(dy.dtype), w_qkv, w_out, b_out, g_out,
                    HEADS, D, 1e-3)
                return acc + outs[2][0, 0] + outs[0][0, 0, 0].astype(
                    jnp.float32), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return out

        @jax.jit
        def xla_chain(eps, x, dy):
            def body(acc, i):
                _, vjp = jax.vjp(
                    lambda *w: LA._xla_fused(*w, HEADS, D, 1e-3),
                    x, w_qkv, w_out, b_out, g_out)
                outs = vjp((dy * (eps + i * 0.01)).astype(dy.dtype))
                return acc + outs[1][0, 0] + outs[0][0, 0, 0].astype(
                    jnp.float32), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return out

        @jax.jit
        def fwd_chain(eps, x, dy):
            def body(acc, i):
                out = LA._pallas_fused(
                    (x * (eps + i * 0.01)).astype(x.dtype), w_qkv, w_out, b_out, g_out,
                    HEADS, D, 1e-3)
                return acc + out[0, 0, 0].astype(jnp.float32), None
            out, _ = jax.lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
            return out

        t_f = bench(fwd_chain, x, dy)
        log(f"(b={b}, n={n}, c={c}): fwd {1000*t_f:.2f} ms")
        t_p = bench(pal_chain, x, dy)
        log(f"(b={b}, n={n}, c={c}): bwd pallas {1000*t_p:.2f} ms")
        t_x = bench(xla_chain, x, dy)
        log(f"(b={b}, n={n}, c={c}): bwd xla-vjp {1000*t_x:.2f} ms")


if __name__ == "__main__":
    main()
