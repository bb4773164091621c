"""Benchmark: generated point-cloud pairs per minute per chip.

Times the Generator's fused device program at the production configuration
(BASELINE.json): batch of 8 scenes (profiled v5e sweet spot; the
reference used 4 on one GPU), 250-step DDIM+DDNM chain with the
dim-64 256x256 U-Net (bf16 compute), depth-correction MaskUNet before and
after, z-buffer splat of a padded scene-memory cloud, and the voxel-0.002
memory update. One program step = one generated frame per scene = one
(real, generated) registration pair per scene.

Prints ONE JSON line:
  {"metric": "generated_pairs_per_min_per_chip", "value": N,
   "unit": "pairs/min/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.md north-star of >= 50
pairs/min on a v5e-8 slice == 6.25 pairs/min/chip (the reference publishes
no throughput numbers; SURVEY.md §6).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/pointreggpt_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

BASELINE_PAIRS_PER_MIN_PER_CHIP = 50.0 / 8.0  # north-star on v5e-8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from pointreggpt_tpu.diffusion import GaussianDiffusion
    from pointreggpt_tpu.generate.generator import Generator
    from pointreggpt_tpu.models import DiffusionUNet, MaskUNet

    # profiled sweet spot on v5e: 43.7 vs 26.5 pairs/min at batch 4 (round
    # 1); PRGPT_BENCH_BATCH overrides for batch-size experiments
    batch = int(os.environ.get("PRGPT_BENCH_BATCH", "8"))
    image_size = 256
    sampling_timesteps = 250
    memory_capacity = 1 << 18

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    model = DiffusionUNet(dim=64, param_cond_dim=4, dim_mults=(1, 2, 4, 8),
                          channels=1, dtype=jnp.bfloat16)
    dc_model = MaskUNet(dim=64, dim_mults=(1, 2, 4, 8), dtype=jnp.bfloat16)

    diffusion = GaussianDiffusion(
        apply_fn=lambda p, x, t, pc: model.apply(p, x, t, pc),
        image_size=image_size, timesteps=1000,
        sampling_timesteps=sampling_timesteps, loss_type="l1",
        objective="pred_x0", beta_schedule="sigmoid", ddim_sampling_eta=1.0,
        is_ddnm_sampling=True)

    from pointreggpt_tpu.models import maybe_bake

    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1, image_size, image_size, 1)),
                        jnp.zeros((1,)), jnp.zeros((1, 4)))
    dc_params = dc_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, image_size, image_size, 1)))
    # the production path (Generator.generate -> device_params) bakes
    # inference params (models/bake.py) and device_puts the baked host tree
    # ONCE; without the device_put every timed call would re-upload ~74 MB
    # of numpy weights through the tunnel (measured 28.7 -> 145.8 ms/step,
    # tools/profile_bake.py)
    params = jax.block_until_ready(
        jax.device_put(maybe_bake(params, model.dtype)))
    dc_params = jax.block_until_ready(
        jax.device_put(maybe_bake(dc_params, dc_model.dtype)))

    gen = Generator(model, diffusion, folder=".",
                    batch_size=batch, memory_capacity=memory_capacity,
                    depth_correction_model=dc_model)
    step_fn = gen._build_step_fn(has_refine_step=False, memory_voxel=0.002)

    # synthetic scene memory: one back-projected 256^2 frame per scene
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 3.4, (batch, image_size, image_size)).astype(
        np.float32)
    intr = np.tile(
        np.array([[[312.0, 0, 128.0], [0, 312.0, 128.0], [0, 0, 1]]],
                 np.float32), (batch, 1, 1))
    from pointreggpt_tpu.core import geometry as G

    pts, valid = G.depth_to_points(jnp.asarray(depth), jnp.asarray(intr),
                                   clip=(0.5, 10.0))
    pad = memory_capacity - pts.shape[1]
    mem_pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
    mem_valid = jnp.pad(valid, ((0, 0), (0, pad)))
    param_cond = G.param_vector(jnp.asarray(intr))

    def run(k):
        out = step_fn(params, dc_params, mem_pts, mem_valid,
                      jnp.asarray(intr), param_cond, k)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready()
            if hasattr(x, "block_until_ready") else x, out)
        return out

    log("compiling full generation step (250-step chain)...")
    t0 = time.time()
    run(jax.random.PRNGKey(2))
    log(f"compile+first-run: {time.time() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.time()
        run(jax.random.PRNGKey(3 + i))
        times.append(time.time() - t0)
    t_step = min(times)
    log(f"steady-state step times: {[f'{t:.2f}' for t in times]}")

    pairs_per_min = batch * 60.0 / t_step
    unet_steps_per_sec = sampling_timesteps / t_step
    log(f"DDNM chain: {unet_steps_per_sec:.1f} U-Net steps/s "
        f"(batch {batch} @ {image_size}^2)")

    # analytic MFU: XLA cost-analysis FLOPs of the single forwards times
    # their call counts per step (cost_analysis counts a scan body once, so
    # the chain itself cannot be queried directly). v5e bf16 peak: 197e12.
    mfu = float("nan")
    try:
        x = jnp.zeros((batch, image_size, image_size, 1), jnp.bfloat16)
        tt = jnp.zeros((batch,), jnp.float32)
        pc = jnp.zeros((batch, 4), jnp.float32)

        def _flops(fn, *args):
            ca = jax.jit(fn).lower(*args).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca["flops"])

        unet_flops = _flops(lambda p, a, b_, c: model.apply(p, a, b_, c),
                            params, x, tt, pc)
        dc_flops = _flops(lambda p, a: dc_model.apply(p, a), dc_params, x)
        step_flops = sampling_timesteps * unet_flops + 2 * dc_flops
        mfu = step_flops / t_step / 197e12
        log(f"analytic FLOPs/step: {step_flops/1e12:.1f} TFLOP "
            f"-> MFU {100*mfu:.1f}% (v5e bf16 peak 197 TFLOP/s)")
    except Exception as e:  # pragma: no cover - cost model availability
        log(f"MFU unavailable: {e}")

    result = {
        "metric": "generated_pairs_per_min_per_chip",
        "value": round(pairs_per_min, 3),
        "unit": "pairs/min/chip",
        "vs_baseline": round(pairs_per_min / BASELINE_PAIRS_PER_MIN_PER_CHIP,
                             3),
        "mfu": round(mfu, 4) if np.isfinite(mfu) else None,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
