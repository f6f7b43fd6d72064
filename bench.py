#!/usr/bin/env python
"""Benchmark: SenseVoiceSmall-shaped forward on one TPU chip, batch 8, 8 s audio.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time factor (elapsed seconds per audio second per chip) at
batch 8 x 8 s windows — the reference's headline metric (README.md:44-64,
measured there on CPUs; best published SenseVoiceSmall f32 RTF = 0.019 on
i3-12300, and the driver target is <= 0.01 per TPU v5e chip).
``vs_baseline`` = ours / 0.019 (lower is better, <1 beats the reference).
"""

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.019  # SenseVoiceSmall f32, best CPU in reference README.md:52
BATCH = 8
WINDOW_SECONDS = 8.0
ITERS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    # f32 parity precision: matmuls at HIGHEST so the number is honest for
    # the token-for-token configuration, not a silent bf16 downgrade.
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent compile cache: the axon remote-compile path is slow and
    # occasionally hangs; cache hits skip it entirely on re-runs.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    from asr_tpu.models import sensevoice as sv

    cfg = sv.SenseVoiceConfig()  # full SenseVoiceSmall geometry (70 SANM blocks)
    params = sv.init_params(cfg, jax.random.PRNGKey(0))

    samples = int(WINDOW_SECONDS * cfg.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((BATCH, samples)) * 2000).astype(np.float32))
    valid = jnp.full((BATCH,), samples, jnp.int32)
    lang = jnp.zeros((BATCH,), jnp.int32)

    # Warmup / compile.
    toks, cnt = sv.forward(params, cfg, audio, valid, lang)
    jax.block_until_ready(toks)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        toks, cnt = sv.forward(params, cfg, audio, valid, lang)
    jax.block_until_ready(toks)
    elapsed = time.perf_counter() - t0

    audio_seconds = ITERS * BATCH * WINDOW_SECONDS
    rtf = elapsed / audio_seconds
    print(
        json.dumps(
            {
                "metric": "rtf_sensevoice_small_f32_batch8_per_chip",
                "value": round(rtf, 6),
                "unit": "s_elapsed_per_s_audio",
                "vs_baseline": round(rtf / BASELINE_RTF, 6),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
