"""Compare conv lowerings for the U-Net's hot 256^2 stages on chip.

Variants per shape (NHWC, bf16, 3x3 SAME):
  conv    — lax.conv_general_dilated (what WSConv uses today)
  shift9  — nine shifted (M,K)@(K,N) matmuls accumulated (K=C_in)
  pair    — taps paired along the channel axis: 4 matmuls with K=2*C_in
            + one K=C_in remainder (fuller MXU contraction dim)

All timed as K-step chained scans with varied inputs (axon memoization).
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
from jax import lax

K = 16


def log(m):
    print(m, file=sys.stderr, flush=True)


def conv_xla(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _shift(x, dy, dx):
    """x padded-shift by (dy, dx) with zero fill, same shape."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.dynamic_slice(xp, (0, 1 + dy, 1 + dx, 0), (b, h, w, c))


def conv_shift9(x, w):
    """w: (3, 3, cin, cout)."""
    b, h, ww, c = x.shape
    acc = None
    for i in range(3):
        for j in range(3):
            xs = _shift(x, i - 1, j - 1).reshape(b * h * ww, c)
            p = jnp.dot(xs, w[i, j], preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
    return acc.reshape(b, h, ww, -1).astype(x.dtype)


def conv_pair(x, w):
    """Taps paired along channels: K=2*cin contractions."""
    b, h, ww, c = x.shape
    taps = [(i - 1, j - 1) for i in range(3) for j in range(3)]
    acc = None
    for t0, t1 in zip(taps[0::2], taps[1::2]):
        xs = jnp.concatenate(
            [_shift(x, *t0), _shift(x, *t1)], axis=-1).reshape(
                b * h * ww, 2 * c)
        wk = jnp.concatenate(
            [w[t0[0] + 1, t0[1] + 1], w[t1[0] + 1, t1[1] + 1]], axis=0)
        p = jnp.dot(xs, wk, preferred_element_type=jnp.float32)
        acc = p if acc is None else acc + p
    t_last = taps[-1]
    xs = _shift(x, *t_last).reshape(b * h * ww, c)
    acc = acc + jnp.dot(xs, w[t_last[0] + 1, t_last[1] + 1],
                        preferred_element_type=jnp.float32)
    return acc.reshape(b, h, ww, -1).astype(x.dtype)


def bench(fn, x, w, reps=3):
    @jax.jit
    def chain(eps, x, w):
        def body(acc, i):
            out = fn((x * (eps + i * 1e-7)).astype(x.dtype), w)
            return acc + out[0, 0, 0, 0].astype(jnp.float32), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    jax.block_until_ready(chain(jnp.float32(1.0), x, w))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain(jnp.float32(1.0 + 1e-6 * (i + 1)), x, w))
        ts.append(time.time() - t0)
    return min(ts) / K


def bench_grad(fn, x, w, reps=3):
    @jax.jit
    def chain(eps, x, w):
        def body(acc, i):
            def loss(xx, ww):
                out = fn(xx, ww)
                return jnp.sum(out.astype(jnp.float32)**2)
            gx, gw = jax.grad(loss, argnums=(0, 1))(
                (x * (eps + i * 1e-7)).astype(x.dtype), w)
            return (acc + gx[0, 0, 0, 0].astype(jnp.float32) +
                    gw[0, 0, 0, 0]), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    jax.block_until_ready(chain(jnp.float32(1.0), x, w))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain(jnp.float32(1.0 + 1e-6 * (i + 1)), x, w))
        ts.append(time.time() - t0)
    return min(ts) / K


def main():
    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    shapes = [
        (16, 256, 256, 64, 64),    # stage-1 resblock conv (train batch)
        (16, 256, 256, 128, 64),   # stage-1 up-path conv
        (8, 256, 256, 64, 64),     # generation batch
        (16, 128, 128, 128, 128),  # stage-2
    ]
    for (b, h, w_, cin, cout) in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, w_, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        flops = 2 * b * h * w_ * cin * cout * 9
        for name, fn in [("conv", conv_xla), ("shift9", conv_shift9),
                         ("pair", conv_pair)]:
            t = bench(fn, x, w)
            # correctness vs conv
            if name != "conv":
                ref = np.asarray(conv_xla(x, w), np.float32)
                got = np.asarray(fn(x, w), np.float32)
                err = np.abs(ref - got).max() / max(1e-6,
                                                    np.abs(ref).max())
                errs = f" err {err:.1e}"
            else:
                errs = ""
            log(f"({b},{h},{w_},{cin}->{cout}) {name}: {1000*t:.2f} ms "
                f"({flops/t/1e12:.1f} TF/s, {100*flops/t/197e12:.1f}% MFU)"
                f"{errs}")


if __name__ == "__main__":
    main()
