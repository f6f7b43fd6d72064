#!/usr/bin/env python
"""Benchmark: SenseVoiceSmall-shaped forward on one TPU chip, batch 8, 8 s audio.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: real-time factor (elapsed seconds per audio second per chip) at
batch 8 x 8 s windows — the reference's headline metric (README.md:44-64,
measured there on CPUs; best published SenseVoiceSmall f32 RTF = 0.019 on
i3-12300, and the driver target is <= 0.01 per TPU v5e chip).
``vs_baseline`` = ours / 0.019 (lower is better, <1 beats the reference).

Resilience: the axon TPU tunnel intermittently hangs backend init / remote
compile for minutes-to-hours.  The measurement therefore runs in a watchdogged
subprocess with bounded retries + backoff; if every attempt fails, ONE
machine-readable failure JSON line is printed (value=null, error=...) instead
of a traceback.  A persistent XLA compile cache makes retries cheap.
"""

import json
import os
import subprocess
import sys
import time

BASELINE_RTF = 0.019  # SenseVoiceSmall f32, best CPU in reference README.md:52
BATCH = 8
WINDOW_SECONDS = 8.0
ITERS = 20
METRIC = "rtf_sensevoice_small_f32_batch8_per_chip"

ATTEMPTS = int(os.environ.get("BENCH_ATTEMPTS", "3"))
PROBE_TIMEOUT = float(os.environ.get("BENCH_PROBE_TIMEOUT", "60"))
ATTEMPT_TIMEOUT = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT", "560"))
BACKOFF_SECONDS = float(os.environ.get("BENCH_BACKOFF", "20"))


def _force_platform() -> None:
    """Honor BENCH_PLATFORM=cpu|axon|...: the axon plugin appends itself to
    jax_platforms at import, so the env var alone cannot deselect it — the
    config update is also required."""
    want = os.environ.get("BENCH_PLATFORM")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def _probe() -> None:
    """Child process: touch the backend with one trivial jit (fast fail/hang
    detection before committing to the expensive model compile)."""
    _force_platform()
    import jax
    import jax.numpy as jnp

    jax.block_until_ready(
        jnp.zeros((8, 128), jnp.float32) @ jnp.zeros((128, 8), jnp.float32)
    )
    print(jax.devices()[0].platform)


def _measure() -> None:
    """Child process: compile + time the forward; print the JSON line."""
    _force_platform()
    import jax
    import jax.numpy as jnp
    import numpy as np

    # f32 parity precision: matmuls at HIGHEST so the number is honest for
    # the token-for-token configuration, not a silent bf16 downgrade.
    jax.config.update("jax_default_matmul_precision", "highest")
    # Persistent compile cache: the axon remote-compile path is slow and
    # occasionally hangs; cache hits skip it entirely on re-runs/retries.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass

    platform = jax.devices()[0].platform

    from asr_tpu.models import sensevoice as sv

    cfg = sv.SenseVoiceConfig()  # full SenseVoiceSmall geometry (70 SANM blocks)
    params = sv.init_params(cfg, jax.random.PRNGKey(0))

    samples = int(WINDOW_SECONDS * cfg.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray((rng.standard_normal((BATCH, samples)) * 2000).astype(np.float32))
    valid = jnp.full((BATCH,), samples, jnp.int32)
    lang = jnp.zeros((BATCH,), jnp.int32)

    def fetch(x):
        """Force completion with a 1-element host read: block_until_ready
        is not trusted through the remote-TPU tunnel (observed returning
        before queued device work finished); a D2H copy of the result
        cannot resolve until every execution producing it has run."""
        np.asarray(jnp.ravel(x)[:1])

    # Warmup / compile.
    toks, cnt = sv.forward(params, cfg, audio, valid, lang)
    fetch(toks)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        toks, cnt = sv.forward(params, cfg, audio, valid, lang)
    fetch(toks)
    elapsed = time.perf_counter() - t0

    audio_seconds = ITERS * BATCH * WINDOW_SECONDS
    rtf = elapsed / audio_seconds
    record = {
        "metric": METRIC,
        "value": round(rtf, 6),
        "unit": "s_elapsed_per_s_audio",
        "vs_baseline": round(rtf / BASELINE_RTF, 6),
        "platform": platform,
    }
    # Analytic FLOPs -> achieved TFLOP/s (the MFU numerator; VERDICT r1
    # weak #8 asked for an auditable utilization estimate).
    flops = None
    try:
        cost = sv.forward.lower(params, cfg, audio, valid, lang).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    if flops:
        record["achieved_tflops_per_s"] = round(flops * ITERS / elapsed / 1e12, 3)
        record["flops_per_forward"] = flops
    print(json.dumps(record))
    _save_run_record(record, elapsed)


def _save_run_record(record: dict, elapsed: float) -> None:
    """Audit trail: append the raw measurement (device, precision, compile
    cache state) under bench_runs/ so perf claims link to artifacts."""
    try:
        import datetime

        import jax

        runs = os.path.join(os.path.dirname(os.path.abspath(sys.argv[0])), "bench_runs")
        os.makedirs(runs, exist_ok=True)
        stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y%m%dT%H%M%SZ")
        dev = jax.devices()[0]
        full = record | {
            "timestamp_utc": stamp,
            "device": str(dev),
            "device_kind": getattr(dev, "device_kind", "?"),
            "batch": BATCH,
            "window_seconds": WINDOW_SECONDS,
            "iters": ITERS,
            "elapsed_seconds": round(elapsed, 4),
            "matmul_precision": "highest (f32 parity config)",
            "compile_cache": "/tmp/jax_cache (persistent; warm if pre-populated)",
        }
        path = os.path.join(runs, f"bench_{record['platform']}_{stamp}.json")
        with open(path, "w") as f:
            json.dump(full, f, indent=2)
    except Exception:
        pass  # the stdout JSON line is the contract; the audit file is best-effort


def _run_child(flag: str, timeout: float):
    return subprocess.run(
        [sys.executable, sys.argv[0], flag],
        cwd=os.path.dirname(os.path.abspath(sys.argv[0])) or ".",
        timeout=timeout,
        capture_output=True,
        text=True,
    )


def main() -> None:
    errors = []
    for attempt in range(ATTEMPTS):
        if attempt:
            time.sleep(BACKOFF_SECONDS)
        # Cheap probe first: a wedged tunnel is caught in <= PROBE_TIMEOUT
        # instead of burning the full measurement leash.
        try:
            probe = _run_child("--probe", PROBE_TIMEOUT)
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt + 1}: probe timeout after {PROBE_TIMEOUT:.0f}s")
            continue
        if probe.returncode != 0:
            tail = (probe.stderr or probe.stdout).strip().splitlines()
            errors.append(
                f"attempt {attempt + 1}: probe rc={probe.returncode} {' | '.join(tail[-2:])[-300:]}"
            )
            continue
        try:
            proc = _run_child("--measure", ATTEMPT_TIMEOUT)
        except subprocess.TimeoutExpired:
            errors.append(f"attempt {attempt + 1}: measure timeout after {ATTEMPT_TIMEOUT:.0f}s")
            continue
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")), None
        )
        if proc.returncode == 0 and line:
            print(line)
            return
        tail = (proc.stderr or proc.stdout).strip().splitlines()
        errors.append(f"attempt {attempt + 1}: rc={proc.returncode} {' | '.join(tail[-3:])[-400:]}")
    # Structured failure record — still one JSON line, machine-readable.
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": None,
                "unit": "s_elapsed_per_s_audio",
                "vs_baseline": None,
                "error": "backend_unavailable",
                "attempts": errors,
            }
        )
    )
    sys.exit(1)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(sys.argv[0])) or ".")
    if "--measure" in sys.argv:
        _measure()
    elif "--probe" in sys.argv:
        _probe()
    else:
        main()
