"""Exponential moving average of params as a jittable pytree state.

Matches the behavior of the lucidrains ``ema_pytorch.EMA`` the reference
trains with (sdd:1658-1661; decay 0.995, update_every 10): updates are
applied every ``update_every`` calls, skipped entirely for the first
``update_after_step`` calls (params copied instead), and the decay ramps in
as ``1 - (1 + k/inv_gamma)^(-power)`` clamped to [min_value, beta].

The whole update is pure and lives inside the jitted train step — no host
sync, no rank gating needed (EMA is replicated like params).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array


class EMAState(NamedTuple):
    params: Any  # EMA param tree (same structure as model params)
    step: Array  # int32 count of .update() calls
    initted: Array  # bool: has the first hard copy happened


def init(params: Any) -> EMAState:
    """Start EMA as a copy of the current params."""
    return EMAState(
        params=jax.tree_util.tree_map(jnp.asarray, params),
        step=jnp.asarray(0, jnp.int32),
        initted=jnp.asarray(False),
    )


def _current_decay(k: Array, beta: float, inv_gamma: float, power: float,
                   min_value: float) -> Array:
    value = 1.0 - (1.0 + k / inv_gamma)**(-power)
    return jnp.clip(value, min_value, beta)


def update(
    state: EMAState,
    params: Any,
    *,
    beta: float = 0.995,
    update_after_step: int = 100,
    update_every: int = 10,
    inv_gamma: float = 1.0,
    power: float = 2.0 / 3.0,
    min_value: float = 0.0,
) -> EMAState:
    """One EMA update tick (call once per optimizer step)."""
    step = state.step
    do_tick = (step % update_every) == 0
    # decay epoch counts RAW steps, not ticks: ema_pytorch reads its step
    # counter *after* incrementing, so epoch = step - update_after_step
    # (with beta .995 / update_every 10 the cap is reached near step ~3k;
    # a tick-unit epoch would stretch that 10x to ~30k, leaving every
    # early-milestone EMA sample tracking the raw params)
    k = step - update_after_step
    warm = k <= 0

    decay = _current_decay(
        jnp.maximum(k, 0).astype(jnp.float32), beta, inv_gamma, power,
        min_value)
    # warmup or first tick: hard copy; else lerp
    eff_decay = jnp.where(warm | ~state.initted, 0.0, decay)
    eff_decay = jnp.where(do_tick, eff_decay, 1.0)  # no-op between ticks

    new_params = jax.tree_util.tree_map(
        lambda e, p: e * eff_decay + p.astype(e.dtype) * (1.0 - eff_decay),
        state.params, params)
    return EMAState(
        params=new_params,
        step=step + 1,
        # initted only on a POST-warmup tick: ema_pytorch hard-copies on
        # every warmup tick without setting initted, then hard-copies once
        # more on the first real tick — setting it during warmup would
        # make that first post-warmup tick lerp against a
        # update_every-steps-stale warmup copy instead
        initted=state.initted | (do_tick & ~warm),
    )
