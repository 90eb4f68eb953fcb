"""Standalone benchmark: Pallas fused aug+target kernel vs the production
jnp chain (DevicePreprocessor-style jitter/noise/normalize +
generate_target_batch), on the attached TPU.

Records the north-star fusion measurement (BASELINE.json): whichever side
wins, the number lands in ops/pallas/fused_aug.py's docstring and the
production step keeps the winner. Amdahl context: this whole segment is
<1% of the train step's bytes, so the headline img/s cannot move either
way.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from lighthand_tpu.core.cache import enable_compilation_cache
    from lighthand_tpu.train.watchdog import device_reachability_gate

    device_reachability_gate(who="bench_fused_aug")
    enable_compilation_cache()
    from lighthand_tpu.ops.color import channel_pixel_noise, color_jitter, \
        normalize_imagenet
    from lighthand_tpu.ops.heatmap import generate_target_batch
    from lighthand_tpu.ops.pallas.fused_aug import fused_aug_targets_pallas

    B, S, HM = 128, 256, 64
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, size=(B, S, S, 3),
                                      dtype=np.uint8))
    joints = jnp.asarray(rng.uniform(16, S - 16, size=(B, 21, 2))
                         .astype(np.float32))
    aug = jnp.ones((B,), jnp.float32)
    noise = jnp.zeros((B,), jnp.float32)

    @jax.jit
    def jnp_chain(key, images_u8, aug_enabled, noise_enabled):
        imgs = images_u8.astype(jnp.float32) / 255.0
        k1, k2 = jax.random.split(key)
        keys = jax.random.split(k1, imgs.shape[0])
        imgs = jax.vmap(color_jitter)(keys, imgs, enable=aug_enabled)
        nkeys = jax.random.split(k2, imgs.shape[0])
        imgs = jax.vmap(lambda k, im, en: channel_pixel_noise(k, im,
                                                              enable=en)
                        )(nkeys, imgs, noise_enabled)
        out = normalize_imagenet(imgs).astype(jnp.bfloat16)
        tgt = generate_target_batch(joints, HM, 4.0, 2.0)
        return out, tgt

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3  # ms

    from lighthand_tpu.core.prng import cpu_prng_key

    key = cpu_prng_key(0)
    ms_jnp = timeit(lambda k: jnp_chain(k, images, aug, noise), key)
    ms_pallas = timeit(
        lambda k: fused_aug_targets_pallas(k, images, joints, aug, noise,
                                           heatmap_size=HM), key)
    print(f"bs{B}@{S}: jnp chain {ms_jnp:.3f} ms | pallas fused "
          f"{ms_pallas:.3f} ms | ratio {ms_jnp / ms_pallas:.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
