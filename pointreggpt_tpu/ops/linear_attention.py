"""Fused linear (kernelized) attention: Pallas TPU kernel + XLA fallback.

The reference's LinearAttention (softmax-q over d, softmax-k over n,
sdd:737-769) runs at every U-Net resolution except the bottleneck. Its
FLOPs are tiny (the 32x32 per-head context), but the XLA lowering streams
several full-size (b, n, heads*dim_head) tensors through HBM (softmax
statistics, normalized copies, einsum operands) — measured 16.5 ms of a
42 ms U-Net forward at 256^2 batch 8 on v5e, ~39% of the whole sampling
step for ~5% of its FLOPs.

The Pallas kernel fuses everything between the two projection matmuls into
one two-phase streaming pass over the raw qkv Dense output (b, n, 3*H*D)
with fp32 accumulators:

- phase 0 (k, v): flash-style online softmax-over-n per k-lane — running
  max m[d], running sum s[d], and the head-block context
  C[d, e] = sum_n exp(k[n, d] - m[d]) * v[n, e], accumulated for all heads
  at once as a single 128x128 MXU product per chunk (off-diagonal head
  blocks are computed and masked later; their FLOPs are negligible).
- phase transition: C_hat = block_diag(C / s[:, None]) * dim_head^-0.5 / n.
- phase 1 (q): per-row softmax over each head's d lanes (row max over all
  128 lanes is a constant shift within every head group, so it is exact;
  per-head denominators come from one matmul with the block-diagonal ones
  matrix), then out = q_softmax @ C_hat.

HBM traffic: qkv read twice + out written once (~940 MB at 256^2 batch 8,
~1.2 ms roofline) versus the several-GB unfused chain.

The backward pass differentiates the XLA math (custom_vjp), so training
gradients are identical on all backends.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_warned_fallbacks: set = set()


def _warn_fallback(site: str, exc: Exception) -> None:
    """Log a swallowed Pallas trace-time failure once per site.

    The try/except around the Pallas paths only covers *trace-time* errors
    (bad shapes, unsupported ops); compile-time failures (e.g. scoped-VMEM
    overflow) surface later, outside the try — those are prevented by the
    explicit chunk/channel guards in the dispatch conditions instead. A
    silent ``pass`` here would also mask genuine kernel bugs, so report the
    first occurrence per call site."""
    if site not in _warned_fallbacks:
        _warned_fallbacks.add(site)
        warnings.warn(
            f"pointreggpt_tpu.ops.linear_attention: Pallas {site} failed at "
            f"trace time ({type(exc).__name__}: {exc}); using the XLA "
            "fallback. This costs performance and may indicate a kernel "
            "bug — please report.", RuntimeWarning)


def _xla_core(qkv: Array, heads: int, dim_head: int) -> Array:
    """Reference math, HBM-lean XLA formulation (see models/blocks.py).

    Args:
        qkv: (b, n, 3 * heads * dim_head), layout [q | k | v], head-major
            within each third (the raw ``to_qkv`` Dense output).

    Returns:
        (b, n, heads * dim_head) attention output, qkv.dtype.
    """
    b, n, _ = qkv.shape
    dtype = qkv.dtype
    x = qkv.reshape(b, n, 3, heads, dim_head)
    q, k, v = x[:, :, 0], x[:, :, 1], x[:, :, 2]  # (b, n, h, d)

    kf = k.astype(jnp.float32)
    kmax = jnp.max(kf, axis=1, keepdims=True)
    ek = jnp.exp(kf - kmax)
    ksum = jnp.sum(ek, axis=1)  # (b, h, d) fp32
    context = jnp.einsum("bnhd,bnhe->bhde", ek.astype(dtype),
                         v.astype(dtype),
                         preferred_element_type=jnp.float32)
    context = context * (dim_head**-0.5 / n) / ksum[..., None]

    qs = jax.nn.softmax(q.astype(jnp.float32), axis=-1)  # over d
    out = jnp.einsum("bhde,bnhd->bnhe", context.astype(dtype),
                     qs.astype(dtype), preferred_element_type=jnp.float32)
    return out.reshape(b, n, heads * dim_head).astype(dtype)


def _pallas_core(qkv: Array, heads: int, dim_head: int,
                 interpret: bool = False) -> Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, three_hidden = qkv.shape
    hidden = heads * dim_head
    assert three_hidden == 3 * hidden
    chunk = min(2048, n)
    assert n % chunk == 0
    nchunks = n // chunk
    scale = dim_head**-0.5 / n

    def kernel(x_ref, o_ref, m_ref, s_ref, c_ref, chat_ref):
        phase = pl.program_id(1)
        ci = pl.program_id(2)

        head_row = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        0) // dim_head
        head_col = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        1) // dim_head
        same_head = head_row == head_col

        @pl.when((phase == 0) & (ci == 0))
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            s_ref[...] = jnp.zeros_like(s_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        @pl.when(phase == 0)
        def _accumulate_kv():
            blk = x_ref[0]
            k = blk[:, hidden:2 * hidden].astype(jnp.float32)
            v = blk[:, 2 * hidden:].astype(jnp.float32)
            m_old = m_ref[0]                      # (hidden,)
            m_new = jnp.maximum(m_old, jnp.max(k, axis=0))
            alpha = jnp.exp(m_old - m_new)        # (hidden,)
            ek = jnp.exp(k - m_new[None, :])      # (chunk, hidden)
            s_ref[0] = s_ref[0] * alpha + jnp.sum(ek, axis=0)
            c_ref[...] = c_ref[...] * alpha[:, None] + lax.dot_general(
                ek, v, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[0] = m_new

        @pl.when((phase == 1) & (ci == 0))
        def _finalize_context():
            s = jnp.maximum(s_ref[0], 1e-30)
            chat = c_ref[...] / s[:, None] * scale
            chat_ref[...] = jnp.where(same_head, chat, 0.0)

        @pl.when(phase == 1)
        def _emit_out():
            blk = x_ref[0]
            q = blk[:, :hidden].astype(jnp.float32)
            # row max over all lanes is constant within each head's softmax
            # group -> exact shift
            eq = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
            denom = lax.dot_general(
                eq, same_head.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qs = eq / denom
            o_ref[0] = lax.dot_general(
                qs, chat_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid=(b, 2, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, 3 * hidden),
                         lambda bi, ph, ci: (bi, ci, 0)),
        ],
        # phase 0 never writes: park the out window on block (bi, 0) so no
        # garbage is ever flushed and phase 1 revisits it in place
        out_specs=pl.BlockSpec((1, chunk, hidden),
                               lambda bi, ph, ci: (bi, ci * ph, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, hidden), qkv.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.float32),       # running max
            pltpu.VMEM((1, hidden), jnp.float32),       # running sum
            pltpu.VMEM((hidden, hidden), jnp.float32),  # context accum
            pltpu.VMEM((hidden, hidden), jnp.float32),  # finalized context
        ],
        interpret=interpret,
    )(qkv)


def _xla_fused(x: Array, w_qkv: Array, w_out: Array, b_out: Array,
               g_out: Array, heads: int, dim_head: int,
               eps: float) -> Array:
    """XLA fallback of the fused block: qkv proj -> core -> out proj ->
    channel LayerNorm. Matches the unfused flax composition
    (Dense -> core -> Dense -> ChannelLayerNorm) bit-for-bit per dtype."""
    dtype = x.dtype
    qkv = jnp.dot(x, w_qkv.astype(dtype))
    core = _xla_core(qkv, heads, dim_head)
    out = jnp.dot(core.astype(dtype), w_out.astype(dtype)) + \
        b_out.astype(dtype)
    xf = out.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    ln = (xf - mean) * lax.rsqrt(var + eps) * g_out
    return ln.astype(dtype)


def _pallas_fused(x: Array, w_qkv: Array, w_out: Array, b_out: Array,
                  g_out: Array, heads: int, dim_head: int, eps: float,
                  interpret: bool = False) -> Array:
    """Whole LinearAttention block in one two-phase streaming kernel.

    HBM traffic per instance: x read twice + output written once (the
    intermediate (b, n, 3*hidden) qkv and (b, n, hidden) core tensors never
    leave VMEM). Weights stay VMEM-resident across the grid.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    hidden = heads * dim_head
    chunk = _fwd_chunk(n, c)
    assert n % chunk == 0
    nchunks = n // chunk
    scale = dim_head**-0.5 / n
    dtype = x.dtype

    def kernel(x_ref, wqkv_ref, wout_ref, bout_ref, gout_ref, o_ref,
               m_ref, s_ref, c_ref, chat_ref):
        phase = pl.program_id(1)
        ci = pl.program_id(2)

        head_row = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        0) // dim_head
        head_col = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        1) // dim_head
        same_head = head_row == head_col

        @pl.when((phase == 0) & (ci == 0))
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            s_ref[...] = jnp.zeros_like(s_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        @pl.when(phase == 0)
        def _accumulate_kv():
            xc = x_ref[0]  # (chunk, c), model dtype
            kv = lax.dot_general(
                xc, wqkv_ref[:, hidden:].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (chunk, 2*hidden)
            k = kv[:, :hidden]
            v = kv[:, hidden:]
            m_old = m_ref[0]
            m_new = jnp.maximum(m_old, jnp.max(k, axis=0))
            alpha = jnp.exp(m_old - m_new)
            ek = jnp.exp(k - m_new[None, :])
            s_ref[0] = s_ref[0] * alpha + jnp.sum(ek, axis=0)
            c_ref[...] = c_ref[...] * alpha[:, None] + lax.dot_general(
                ek.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[0] = m_new

        @pl.when((phase == 1) & (ci == 0))
        def _finalize_context():
            s = jnp.maximum(s_ref[0], 1e-30)
            chat = c_ref[...] / s[:, None] * scale
            chat_ref[...] = jnp.where(same_head, chat, 0.0)

        @pl.when(phase == 1)
        def _emit_out():
            xc = x_ref[0]
            q = lax.dot_general(
                xc, wqkv_ref[:, :hidden].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            eq = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
            denom = lax.dot_general(
                eq, same_head.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qs = (eq / denom).astype(dtype)
            core = lax.dot_general(
                qs, chat_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (chunk, hidden)
            out = lax.dot_general(
                core.astype(dtype), wout_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + \
                bout_ref[0].astype(jnp.float32)[None, :]
            mean = jnp.mean(out, axis=1, keepdims=True)
            var = jnp.mean((out - mean)**2, axis=1, keepdims=True)
            ln = (out - mean) * lax.rsqrt(var + eps) * gout_ref[0][None, :]
            o_ref[0] = ln.astype(o_ref.dtype)

    small = lambda *_: (0, 0)  # weights: one block, every program
    return pl.pallas_call(
        kernel,
        grid=(b, 2, nchunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda bi, ph, ci: (bi, ci, 0)),
            pl.BlockSpec((c, 3 * hidden), small),
            pl.BlockSpec((hidden, c), small),
            pl.BlockSpec((1, c), small),
            pl.BlockSpec((1, c), small),
        ],
        out_specs=pl.BlockSpec((1, chunk, c),
                               lambda bi, ph, ci: (bi, ci * ph, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((1, hidden), jnp.float32),
            pltpu.VMEM((hidden, hidden), jnp.float32),
            pltpu.VMEM((hidden, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(x, w_qkv, w_out, b_out.reshape(1, c), g_out.reshape(1, c))


def _pallas_fused_bwd(x: Array, dy: Array, w_qkv: Array, w_out: Array,
                      b_out: Array, g_out: Array, heads: int, dim_head: int,
                      eps: float, interpret: bool = False):
    """Analytic backward of the fused LinearAttention block, streamed.

    Four phases per batch element (grid (b, 4, nchunks)), fp32 accumulators:

    - phase 0: recompute the k-side online-softmax stats m, s and the
      context C (identical to the forward's phase 0).
    - phase 1: per chunk, recompute the q path (q softmax, core, out
      projection, LayerNorm) and backprop chunk-locally: LN bwd -> dWout /
      dbout / dg -> dcore -> dChat (accumulated over chunks) and the q
      softmax bwd -> dWq and the q-path dx.
    - phase 2: fold the accumulated dChat through Chat = mask(C/s)*scale
      into dC and ds.
    - phase 3: per chunk, recompute ek and v and emit dk = ek*(v dC^T + ds),
      dv = ek dC, the k/v-path dx, and dWk/dWv.

    Gradients through the running max m cancel exactly (C/s is invariant to
    the per-lane shift), as in every flash-style backward, so m is treated
    as a constant.

    Returns (dx_q, dx_kv, dw_qkv, dw_out, db_out, dg); the caller adds the
    two dx partials (they are produced in different phases; separate outputs
    avoid an output-window revisit hazard).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, c = x.shape
    hidden = heads * dim_head
    # the q-path backward holds ~5 fp32 (chunk, hidden) plus ~6 fp32
    # (chunk, c) temporaries on the scoped-VMEM stack (16 MB limit); at
    # chunk 2048 that fits through c=128 and overflows at c=256, so halve
    # the chunk while chunk * c exceeds the measured-safe 2048 * 128
    chunk = min(2048, n)
    while chunk > 128 and chunk * c > 2048 * 128:
        chunk //= 2
    # unreachable with current widths (c <= 512); the c <= 2048 dispatch
    # guard in _fused_bwd keeps such shapes on the XLA vjp
    assert chunk * c <= 2048 * 128, (
        f"backward chunk {chunk} x c {c} exceeds the measured-safe "
        "scoped-VMEM bound 2048*128")
    assert n % chunk == 0
    nchunks = n // chunk
    scale = dim_head**-0.5 / n
    dtype = x.dtype
    b_total = b * 4 * nchunks

    def kernel(x_ref, dy_ref, wqkv_ref, wout_ref, bout_ref, gout_ref,
               dxq_ref, dxkv_ref, dwqkv_ref, dwout_ref, dbout_ref, dg_ref,
               m_ref, s_ref, c_ref, chat_ref, dchat_ref, dc_ref, ds_ref,
               dwqkv_acc, dwout_acc, dbout_acc, dg_acc):
        bi = pl.program_id(0)
        phase = pl.program_id(1)
        ci = pl.program_id(2)
        linear_id = (bi * 4 + phase) * nchunks + ci

        head_row = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        0) // dim_head
        head_col = lax.broadcasted_iota(jnp.int32, (hidden, hidden),
                                        1) // dim_head
        same_head = (head_row == head_col).astype(jnp.float32)

        @pl.when(linear_id == 0)
        def _init_weight_grads():
            dwqkv_acc[...] = jnp.zeros_like(dwqkv_acc)
            dwout_acc[...] = jnp.zeros_like(dwout_acc)
            dbout_acc[...] = jnp.zeros_like(dbout_acc)
            dg_acc[...] = jnp.zeros_like(dg_acc)

        @pl.when((phase == 0) & (ci == 0))
        def _init():
            m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
            s_ref[...] = jnp.zeros_like(s_ref)
            c_ref[...] = jnp.zeros_like(c_ref)

        @pl.when(phase == 0)
        def _accumulate_kv():
            xc = x_ref[0]
            kv = lax.dot_general(
                xc, wqkv_ref[:, hidden:].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            k = kv[:, :hidden]
            v = kv[:, hidden:]
            m_old = m_ref[0]
            m_new = jnp.maximum(m_old, jnp.max(k, axis=0))
            alpha = jnp.exp(m_old - m_new)
            ek = jnp.exp(k - m_new[None, :])
            s_ref[0] = s_ref[0] * alpha + jnp.sum(ek, axis=0)
            c_ref[...] = c_ref[...] * alpha[:, None] + lax.dot_general(
                ek.astype(dtype), v.astype(dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_ref[0] = m_new

        @pl.when((phase == 1) & (ci == 0))
        def _finalize_context():
            s = jnp.maximum(s_ref[0], 1e-30)
            chat = c_ref[...] / s[:, None] * scale
            chat_ref[...] = chat * same_head
            dchat_ref[...] = jnp.zeros_like(dchat_ref)

        @pl.when(phase == 1)
        def _q_path_bwd():
            xc = x_ref[0]
            dy = dy_ref[0].astype(jnp.float32)
            # recompute the q path exactly as the forward
            q = lax.dot_general(
                xc, wqkv_ref[:, :hidden].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            eq = jnp.exp(q - jnp.max(q, axis=1, keepdims=True))
            denom = lax.dot_general(
                eq, same_head,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            qs = eq / denom
            qs_c = qs.astype(dtype)
            core = lax.dot_general(
                qs_c, chat_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            core_c = core.astype(dtype)
            pre = lax.dot_general(
                core_c, wout_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + \
                bout_ref[0].astype(jnp.float32)[None, :]
            mu = jnp.mean(pre, axis=1, keepdims=True)
            var = jnp.mean((pre - mu)**2, axis=1, keepdims=True)
            sinv = lax.rsqrt(var + eps)
            xhat = (pre - mu) * sinv

            # LayerNorm (scale-only) backward
            g = gout_ref[0].astype(jnp.float32)[None, :]
            dg_acc[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)
            dxhat = dy * g
            dpre = sinv * (
                dxhat - jnp.mean(dxhat, axis=1, keepdims=True) -
                xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
            dpre_c = dpre.astype(dtype)

            dbout_acc[...] += jnp.sum(dpre, axis=0, keepdims=True)
            dwout_acc[...] += lax.dot_general(
                core_c, dpre_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dcore = lax.dot_general(
                dpre_c, wout_ref[...].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dcore_c = dcore.astype(dtype)
            dchat_ref[...] += lax.dot_general(
                qs_c, dcore_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dqs = lax.dot_general(
                dcore_c, chat_ref[...].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            # per-head softmax backward over the d lanes
            r = lax.dot_general(
                (dqs * qs).astype(jnp.float32), same_head,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dq = qs * (dqs - r)
            dq_c = dq.astype(dtype)
            dwqkv_acc[:, :hidden] += lax.dot_general(
                xc, dq_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxq_ref[0] = lax.dot_general(
                dq_c, wqkv_ref[:, :hidden].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dxq_ref.dtype)

        @pl.when((phase == 2) & (ci == 0))
        def _fold_context_grad():
            s = jnp.maximum(s_ref[0], 1e-30)
            dch = dchat_ref[...] * same_head
            dc_ref[...] = dch * scale / s[:, None]
            ds_ref[0] = -jnp.sum(dch * c_ref[...], axis=1) * scale / (s * s)

        @pl.when(phase == 3)
        def _kv_path_bwd():
            xc = x_ref[0]
            kv = lax.dot_general(
                xc, wqkv_ref[:, hidden:].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            k = kv[:, :hidden]
            v = kv[:, hidden:]
            ek = jnp.exp(k - m_ref[0][None, :])
            dek = lax.dot_general(
                v.astype(dtype), dc_ref[...].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + ds_ref[0][None, :]
            dk = ek * dek
            dv = lax.dot_general(
                ek.astype(dtype), dc_ref[...].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dk_c = dk.astype(dtype)
            dv_c = dv.astype(dtype)
            dwqkv_acc[:, hidden:2 * hidden] += lax.dot_general(
                xc, dk_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dwqkv_acc[:, 2 * hidden:] += lax.dot_general(
                xc, dv_c,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxkv_ref[0] = (lax.dot_general(
                dk_c, wqkv_ref[:, hidden:2 * hidden].astype(dtype),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) + lax.dot_general(
                    dv_c, wqkv_ref[:, 2 * hidden:].astype(dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)).astype(
                        dxkv_ref.dtype)

        @pl.when(linear_id == b_total - 1)
        def _emit_weight_grads():
            dwqkv_ref[...] = dwqkv_acc[...]
            dwout_ref[...] = dwout_acc[...]
            dbout_ref[...] = dbout_acc[...]
            dg_ref[...] = dg_acc[...]

    small = lambda *_: (0, 0)
    outs = pl.pallas_call(
        kernel,
        grid=(b, 4, nchunks),
        in_specs=[
            # park x during phase 2 (unused there), stream otherwise
            pl.BlockSpec((1, chunk, c),
                         lambda bi, ph, ci: (bi, ci * (ph != 2), 0)),
            # dy is only read in phase 1
            pl.BlockSpec((1, chunk, c),
                         lambda bi, ph, ci: (bi, ci * (ph == 1), 0)),
            pl.BlockSpec((c, 3 * hidden), small),
            pl.BlockSpec((hidden, c), small),
            pl.BlockSpec((1, c), small),
            pl.BlockSpec((1, c), small),
        ],
        out_specs=[
            # dx_q: written in phase 1; parked on block 0 before, and on the
            # last-written block after, so no unwritten window ever flushes
            # over valid data
            pl.BlockSpec(
                (1, chunk, c),
                lambda bi, ph, ci: (bi, ci * (ph == 1) +
                                    (nchunks - 1) * (ph >= 2), 0)),
            # dx_kv: written in phase 3, parked on block 0 before
            pl.BlockSpec((1, chunk, c),
                         lambda bi, ph, ci: (bi, ci * (ph == 3), 0)),
            pl.BlockSpec((c, 3 * hidden), small),
            pl.BlockSpec((hidden, c), small),
            pl.BlockSpec((1, c), small),
            pl.BlockSpec((1, c), small),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), dtype),
            jax.ShapeDtypeStruct((b, n, c), dtype),
            jax.ShapeDtypeStruct((c, 3 * hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, hidden), jnp.float32),        # m
            pltpu.VMEM((1, hidden), jnp.float32),        # s
            pltpu.VMEM((hidden, hidden), jnp.float32),   # C
            pltpu.VMEM((hidden, hidden), jnp.float32),   # Chat
            pltpu.VMEM((hidden, hidden), jnp.float32),   # dChat accum
            pltpu.VMEM((hidden, hidden), jnp.float32),   # dC
            pltpu.VMEM((1, hidden), jnp.float32),        # ds
            pltpu.VMEM((c, 3 * hidden), jnp.float32),    # dWqkv accum
            pltpu.VMEM((hidden, c), jnp.float32),        # dWout accum
            pltpu.VMEM((1, c), jnp.float32),             # dbout accum
            pltpu.VMEM((1, c), jnp.float32),             # dg accum
        ],
        interpret=interpret,
    )(x, dy, w_qkv, w_out, b_out.reshape(1, c), g_out.reshape(1, c))
    dxq, dxkv, dwqkv, dwout, dbout, dg = outs
    return dxq, dxkv, dwqkv, dwout, dbout.reshape(b_out.shape), \
        dg.reshape(g_out.shape)


def _fwd_chunk(n: int, c: int) -> int:
    """Fused-forward chunk: narrow channels leave VMEM headroom, so double
    the chunk to halve the per-grid-step overhead (the fp32 q-path
    temporaries stay under ~12 MB)."""
    return min(4096 if c <= 64 else 2048, n)


def _dispatch_fused(x, w_qkv, w_out, b_out, g_out, heads, dim_head, eps):
    n, c = x.shape[1], x.shape[2]
    hidden = heads * dim_head
    use_pallas = (
        jax.default_backend() == "tpu"
        and hidden % 128 == 0
        and c % 8 == 0
        and n % _fwd_chunk(n, c) == 0
        and n % 8 == 0
    )
    if use_pallas:
        try:
            return _pallas_fused(x, w_qkv, w_out, b_out, g_out, heads,
                                 dim_head, eps)
        except Exception as e:  # pragma: no cover - fallback safety net
            _warn_fallback("fused forward", e)
    return _xla_fused(x, w_qkv, w_out, b_out, g_out, heads, dim_head, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_linear_attention(x: Array, w_qkv: Array, w_out: Array,
                           b_out: Array, g_out: Array, heads: int,
                           dim_head: int, eps: float) -> Array:
    """LinearAttention block body: qkv proj -> softmax-q/softmax-k core ->
    out proj -> channel LayerNorm (scale only).

    Args:
        x: (b, n, c) pre-normalized activations, model dtype.
        w_qkv: (c, 3*heads*dim_head) fp32 params (cast to x.dtype inside).
        w_out: (heads*dim_head, c); b_out: (c,); g_out: (c,) fp32.
        eps: LayerNorm epsilon (dtype-dependent, see blocks._ws_eps).

    Returns:
        (b, n, c), x.dtype. Add the residual outside.
    """
    return _dispatch_fused(x, w_qkv, w_out, b_out, g_out, heads, dim_head,
                           eps)


def _fused_fwd(x, w_qkv, w_out, b_out, g_out, heads, dim_head, eps):
    out = _dispatch_fused(x, w_qkv, w_out, b_out, g_out, heads, dim_head,
                          eps)
    return out, (x, w_qkv, w_out, b_out, g_out)


def _fused_bwd(heads, dim_head, eps, residuals, g):
    x, w_qkv, w_out, b_out, g_out = residuals
    n, c = x.shape[1], x.shape[2]
    hidden = heads * dim_head
    use_pallas = (
        jax.default_backend() == "tpu"
        and hidden % 128 == 0
        and c % 8 == 0
        # chunk floor is 128, so past c=2048 no chunk keeps the q-path
        # temporaries inside the measured-safe chunk*c <= 2048*128 scoped-
        # VMEM bound — route to the XLA vjp (the overflow would only
        # surface at compile time, outside the try below)
        and c <= 2048
        and n % min(2048, n) == 0
        and n % 8 == 0
    )
    if use_pallas:
        try:
            dxq, dxkv, dwqkv, dwout, dbout, dg = _pallas_fused_bwd(
                x, g.astype(x.dtype), w_qkv, w_out, b_out, g_out, heads,
                dim_head, eps)
            return dxq + dxkv, dwqkv, dwout, dbout, dg
        except Exception as e:  # pragma: no cover - fallback safety net
            _warn_fallback("fused backward", e)
    _, vjp = jax.vjp(
        lambda *a: _xla_fused(*a, heads, dim_head, eps),
        x, w_qkv, w_out, b_out, g_out)
    return vjp(g)


fused_linear_attention.defvjp(_fused_fwd, _fused_bwd)


def _dispatch(qkv: Array, heads: int, dim_head: int) -> Array:
    n = qkv.shape[1]
    hidden = heads * dim_head
    use_pallas = (
        jax.default_backend() == "tpu"
        and hidden % 128 == 0
        and n % min(2048, n) == 0
        and n % 8 == 0
    )
    if use_pallas:
        try:
            return _pallas_core(qkv, heads, dim_head)
        except Exception as e:  # pragma: no cover - fallback safety net
            _warn_fallback("core forward", e)
    return _xla_core(qkv, heads, dim_head)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def linear_attention_core(qkv: Array, heads: int, dim_head: int) -> Array:
    """softmax-q/softmax-k linear attention over a packed qkv tensor.

    Args:
        qkv: (b, n, 3*heads*dim_head) packed [q | k | v] (head-major).

    Returns:
        (b, n, heads*dim_head).
    """
    return _dispatch(qkv, heads, dim_head)


def _fwd(qkv, heads, dim_head):
    return _dispatch(qkv, heads, dim_head), (qkv,)


def _bwd(heads, dim_head, residuals, g):
    (qkv,) = residuals
    _, vjp = jax.vjp(lambda a: _xla_core(a, heads, dim_head), qkv)
    return vjp(g)


linear_attention_core.defvjp(_fwd, _bwd)
