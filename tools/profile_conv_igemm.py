"""Implicit-GEMM Pallas 3x3 conv experiment (round-3 verdict item #4).

The round-2 ledger rejected a K=2*C_in tap-paired Pallas conv and XLA-level
shift-9 materializations, leaving ONE untried formulation: a true implicit
GEMM — build the (pixels, 9*C_in) im2col tile in VMEM from a halo-shared
input window (zero extra HBM traffic) and hit the MXU with a single
K=9*C_in=576 contraction instead of nine K=64 ones.

Measures forward wall-clock vs the XLA conv emitter at the two hottest
shapes (256^2 x 64->64, batch 8 generation / batch 16 training) via
chained scans (isolated small-op probes mislead; CLAUDE.md). Inputs vary
>=1% per rep to defeat the tunnel memoization.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_conv_igemm.py
"""

import functools
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

ROWS = 8  # output rows per grid step


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def conv3_igemm(x, w, rows=ROWS, interpret=False):
    """3x3 SAME conv, NHWC bf16, via one K=9*C im2col matmul per row block.

    The whole halo-padded image of one batch element stays VMEM-resident
    (8.5 MB bf16 at 258^2 x 64 — v5e VMEM is 128 MB) while the inner grid
    dimension walks row blocks, so each input byte crosses HBM once. Per
    block the kernel assembles the (rows*wd, 9c) im2col tile from nine
    halo-shifted VMEM windows and fires a single K=9c MXU contraction.

    x: (b, h, wd, c) bf16; w: (3, 3, c, cout) fp32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wd, c = x.shape
    cout = w.shape[-1]
    assert h % rows == 0
    nrb = h // rows
    # halo pad once in HBM (33 MB bf16 at the hot shape)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wmat = w.reshape(9 * c, cout).astype(x.dtype)

    def kernel(x_ref, w_ref, o_ref):
        rb = pl.program_id(1)
        cols = []
        for dy in range(3):
            for dx in range(3):
                win = x_ref[0, pl.ds(rb * rows + dy, rows),
                            pl.ds(dx, wd), :]
                cols.append(win.reshape(rows * wd, c))
        im = jnp.concatenate(cols, axis=-1)  # (rows*wd, 9c)
        out = jnp.dot(im, w_ref[...], preferred_element_type=jnp.float32)
        o_ref[0] = out.reshape(rows, wd, cout).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, nrb),
        in_specs=[
            # full padded image per batch element; index ignores the row
            # dim so the block stays resident across the inner grid walk
            pl.BlockSpec((1, h + 2, wd + 2, c), lambda i, r: (i, 0, 0, 0)),
            pl.BlockSpec((9 * c, cout), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rows, wd, cout),
                               lambda i, r: (i, r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, cout), x.dtype),
        # the resident full-image block (8.5 MB bf16) double-buffered plus
        # the im2col tile exceed the default 16 MB scoped-VMEM budget;
        # v5e has 128 MB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wmat)
    return out


@jax.jit
def conv3_xla(x, w):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.jit
def conv3_blockdiag(x, w):
    """Fold batch pairs into channels: (b, h, w, c) -> (b/2, h, w, 2c) with
    block-diagonal weights. 2x the MACs, but the MXU contraction doubles to
    128 — testing whether the emitter's measured ~26% MFU at c>=128 beats
    its ~10-13% at c=64 despite the wasted zero-block FLOPs."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    xf = x.reshape(b // 2, 2, h, wd, c).transpose(0, 2, 3, 1, 4)
    xf = xf.reshape(b // 2, h, wd, 2 * c)
    wb = jnp.zeros((3, 3, 2 * c, 2 * cout), w.dtype)
    wb = wb.at[:, :, :c, :cout].set(w).at[:, :, c:, cout:].set(w)
    out = lax.conv_general_dilated(
        xf, wb.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = out.reshape(b // 2, h, wd, 2, cout).transpose(0, 3, 1, 2, 4)
    return out.reshape(b, h, wd, cout)


def timed_chain(fn, x, w, iters=30):
    """Chained scan timing: out feeds the next input (defeats memoization +
    dispatch overhead)."""

    @jax.jit
    def chain(x0, w):
        def body(carry, i):
            # vary input >=1% per iteration (bf16-visible)
            xi = carry * (1.0 + 0.02 * (i % 3).astype(jnp.bfloat16))
            y = fn(xi, w)
            return y * 0.98, ()

        y, _ = lax.scan(body, x0, jnp.arange(iters))
        return y

    r = chain(x, w)
    r.block_until_ready()
    # vary the timed call's inputs vs the warm-up: the axon tunnel
    # memoizes identical (executable, args) calls (CLAUDE.md gotcha)
    x2, w2 = x * jnp.bfloat16(1.01), w * np.float32(1.02)
    jax.block_until_ready((x2, w2))
    t0 = time.time()
    r = chain(x2, w2)
    r.block_until_ready()
    return (time.time() - t0) / iters * 1000


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32)
    wj = jnp.asarray(w)

    # correctness first (small shape)
    xs = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 64)), jnp.bfloat16)
    got = conv3_igemm(xs, wj)
    want = conv3_xla(xs, wj)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                want.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"correctness: max abs err {err:.4f} (rel {rel:.4f})")
    assert rel < 0.05, "implicit-GEMM conv mismatch"

    batches = tuple(
        int(s) for s in os.environ.get("IGEMM_BATCHES", "8,16").split(","))
    rows_list = tuple(
        int(s) for s in os.environ.get("IGEMM_ROWS", str(ROWS)).split(","))
    for batch in batches:
        x = jnp.asarray(rng.normal(0, 1, (batch, 256, 256, 64)),
                        jnp.bfloat16)
        t_xla = timed_chain(lambda a, b: conv3_xla(a, b), x, wj)
        flops = 2 * batch * 256 * 256 * 9 * 64 * 64
        print(f"b{batch} 256^2 64->64: XLA {t_xla:.2f} ms "
              f"({flops / t_xla / 1e9 / 197:.1%} MFU)")
        for rows in rows_list:
            t_ig = timed_chain(
                lambda a, b, r=rows: conv3_igemm(a, b, rows=r), x, wj)
            print(f"  igemm rows={rows}: {t_ig:.2f} ms "
                  f"({flops / t_ig / 1e9 / 197:.1%} MFU)")
        if os.environ.get("IGEMM_BLOCKDIAG"):
            got = conv3_blockdiag(x[:2], wj)
            want = conv3_xla(x[:2], wj)
            rel = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32)))) / \
                float(jnp.max(jnp.abs(want.astype(jnp.float32))))
            assert rel < 0.05, f"blockdiag mismatch rel {rel}"
            t_bd = timed_chain(lambda a, b: conv3_blockdiag(a, b), x, wj)
            print(f"  blockdiag c128: {t_bd:.2f} ms (useful "
                  f"{flops / t_bd / 1e9 / 197:.1%} MFU)")


if __name__ == "__main__":
    main()
