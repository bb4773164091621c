"""Compare conv lowerings for the U-Net's hot 256^2 stages on chip.

Variants per shape (NHWC, bf16, 3x3 SAME):
  conv    — lax.conv_general_dilated (what WSConv uses today)
  shift9  — nine shifted (M,K)@(K,N) matmuls accumulated (K=C_in)
  pair    — taps paired along the channel axis: 4 matmuls with K=2*C_in
            + one K=C_in remainder (fuller MXU contraction dim)

All timed as K-step chained scans with varied inputs (axon memoization).

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


# --- REJECTED experiment: Pallas tap-paired 3x3 conv (see PARITY.md) ---
import functools
Array = jax.Array






def conv3x3_xla(x: Array, w: Array) -> Array:
    """lax 3x3 SAME conv, NHWC/HWIO, fp32 accumulation."""
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _pick_block_rows(h: int, wd: int, cin: int, cout: int) -> int:
    """Largest row block keeping the fp32 accumulator + window <= ~6 MB."""
    budget = 6 * (1 << 20)
    per_row = wd * (cout * 4 + 3 * cin * 4)  # acc fp32 + shifted copies
    r = max(8, min(h, budget // max(per_row, 1)))
    while h % r:
        r -= 1
    return r


def _conv3x3_pallas(x: Array, w: Array, interpret: bool = False) -> Array:
    from jax.experimental import pallas as pl

    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    dtype = x.dtype
    r = _pick_block_rows(h, wd, cin, cout)
    nblocks = h // r

    # Overlapping +-1-row halo windows, materialized once in XLA (~(1+2/r)x
    # the activation bytes; BlockSpec windows cannot overlap and Mosaic
    # rejects dynamic HBM slices for a manual halo DMA).
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    wins = jnp.stack([
        lax.slice_in_dim(xp, i * r, i * r + r + 2, axis=1)
        for i in range(nblocks)
    ], axis=1)  # (b, nblocks, r+2, wd, cin)
    w9 = w.reshape(9, cin, cout).astype(dtype)

    # tap order pairs (di, dj) row-major; 4 pairs + tap 8 (di=2, dj=2)
    taps = [(i, j) for i in range(3) for j in range(3)]

    def kernel(win_ref, w_ref, o_ref):
        win = win_ref[0, 0]  # (r+2, wd, cin)
        col = lax.broadcasted_iota(jnp.int32, (r, wd, cin), 1)

        def shifted(di, dj):
            rows = win[di:di + r]  # (r, wd, cin)
            if dj == 1:
                return rows
            s = 1 - dj  # +1: read left neighbor, -1: read right
            rolled = jnp.roll(rows, s, axis=1)
            if s == 1:
                return jnp.where(col >= 1, rolled, 0).astype(dtype)
            return jnp.where(col < wd - 1, rolled, 0).astype(dtype)

        acc = jnp.zeros((r * wd, cout), jnp.float32)
        for t0, t1 in zip(taps[0:8:2], taps[1:8:2]):
            xs = jnp.concatenate(
                [shifted(*t0), shifted(*t1)], axis=-1).reshape(
                    r * wd, 2 * cin)
            wk = jnp.concatenate(
                [w_ref[t0[0] * 3 + t0[1]], w_ref[t1[0] * 3 + t1[1]]],
                axis=0)
            acc = acc + lax.dot_general(
                xs, wk, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        t8 = taps[8]
        acc = acc + lax.dot_general(
            shifted(*t8).reshape(r * wd, cin), w_ref[8],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(r, wd, cout).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, nblocks),
        in_specs=[
            pl.BlockSpec((1, 1, r + 2, wd, cin),
                         lambda bi, ri: (bi, ri, 0, 0, 0)),
            pl.BlockSpec((9, cin, cout), lambda bi, ri: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, wd, cout),
                               lambda bi, ri: (bi, ri, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), dtype),
        interpret=interpret,
    )(wins, w9)


def _shift2d(x: Array, di: int, dj: int) -> Array:
    """x shifted so output[r, c] = x[r + di - 1, c + dj - 1], zero-filled."""
    b, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return lax.dynamic_slice(xp, (0, di, dj, 0), (b, h, wd, c))


def _wgrad(x: Array, dy: Array) -> Array:
    """dw[di,dj] = shifted-x^T @ dy over all pixels (full-MXU contraction)."""
    b, h, wd, cin = x.shape
    cout = dy.shape[-1]
    dyf = dy.reshape(b * h * wd, cout)
    parts = []
    for di in range(3):
        for dj in range(3):
            xs = _shift2d(x, di, dj).reshape(b * h * wd, cin)
            parts.append(lax.dot_general(
                xs, dyf, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
    return jnp.stack(parts).reshape(3, 3, cin, cout)


def _dispatch(x, w):
    b, h, wd, cin = x.shape
    cout = w.shape[-1]
    use_pallas = (
        jax.default_backend() == "tpu"
        and wd % 128 == 0
        and cin % 8 == 0 and cout % 8 == 0
        and h >= 8
    )
    if use_pallas:
        try:
            return _conv3x3_pallas(x, w.astype(x.dtype))
        except Exception:  # pragma: no cover - fallback safety net
            pass
    return conv3x3_xla(x, w)


@jax.custom_vjp
def conv3x3(x: Array, w: Array) -> Array:
    """3x3 stride-1 SAME conv (NHWC x HWIO), Pallas on TPU.

    Args:
        x: (b, h, w, cin) activations (model dtype).
        w: (3, 3, cin, cout) weights (cast to x.dtype inside).

    Returns:
        (b, h, w, cout), x.dtype.
    """
    return _dispatch(x, w)


def _conv_fwd(x, w):
    return _dispatch(x, w), (x, w)


def _conv_bwd(residuals, dy):
    x, w = residuals
    # dx: full correlation = conv of dy with spatially-flipped weights,
    # in/out channels transposed
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = _dispatch(dy, w_flip.astype(dy.dtype))
    dw = _wgrad(x, dy)
    return dx.astype(x.dtype), dw.astype(w.dtype)


conv3x3.defvjp(_conv_fwd, _conv_bwd)

def bench(fn, x, w, reps=3):
    @jax.jit
    def chain(eps, x, w):
        def body(acc, i):
            out = fn((x * (eps + i * 0.01)).astype(x.dtype), w)
            # reduce over the FULL output or XLA slices the conv to one
            # live pixel (DCE) and the timing is fiction
            return acc + jnp.sum(out.astype(jnp.float32)), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    jax.block_until_ready(chain(jnp.float32(1.0), x, w))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain(jnp.float32(1.0 + 0.01 * (i + 1)), x, w))
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
                (x * (eps + i * 0.01)).astype(x.dtype), w)
            # full reductions: a single live element lets XLA slice the
            # dgrad conv down to a 3x3 neighborhood
            return (acc + jnp.sum(gx.astype(jnp.float32)) +
                    jnp.sum(gw.astype(jnp.float32))), None
        out, _ = lax.scan(body, 0.0, jnp.arange(K, dtype=jnp.float32))
        return out

    jax.block_until_ready(chain(jnp.float32(1.0), x, w))
    ts = []
    for i in range(reps):
        t0 = time.time()
        jax.block_until_ready(chain(jnp.float32(1.0 + 0.01 * (i + 1)), x, w))
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
                         ("pair", conv_pair),
                         ("pallas", lambda a, b_: _conv3x3_pallas(a, b_))]:
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
        # fwd+bwd: custom-vjp (pallas dgrad + matmul wgrad) vs XLA autodiff
        # (plain bf16 conv like WSConv; preferred_element_type breaks the
        # transpose rule's dtype matching)
        def conv_xla_plain(a, b_):
            return lax.conv_general_dilated(
                a, b_.astype(a.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t_cv = bench_grad(conv3x3, x, w)
        t_ad = bench_grad(conv_xla_plain, x, w)
        log(f"({b},{h},{w_},{cin}->{cout}) fwd+bwd: custom-vjp "
            f"{1000*t_cv:.2f} ms vs xla-autodiff {1000*t_ad:.2f} ms")


if __name__ == "__main__":
    main()
