#!/usr/bin/env python
"""Ablate the vmapped Dolphin streaming chunk step to localize its cost.

VERDICT r4 #3: the ×8 multistream row shows ~zero vmap amortization
(7.9 ms/tick for 8 streams vs 0.9 ms single-stream) while the other
streaming families amortize 1.8–2.5×.  This tool times the vmapped step
with individual pieces disabled (STATIC flags → separate executables) so
the regression has a named owner instead of a hypothesis list:

  full          the production step (asr_tpu.streaming.dolphin_stream)
  no_kv_write   attention reads the history buffers but skips the
                per-stream dynamic_update_slice writes (k/v + cross) —
                tests the "vmapped scatter" hypothesis
  static_write  k/v writes land at offset 0 (static) instead of `valid`
                (dynamic per stream) — isolates scatter lowering from
                write bandwidth
  no_attn       skips the 752-key attention einsums (keeps projections)
  no_ctc        skips the vocab-27588 CTC head
  no_frontend   skips fbank + conv subsampling (feeds a precomputed x)

Timing: same in-jit fori difference method as tools/bench_matrix.py
(min over repeats, (t(2n)-t(n))/n cancels dispatch + tunnel RTT).

Run on TPU: ``python tools/ablate_dolphin_multistream.py [n_streams]``.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
except Exception:
    pass

from asr_tpu.frontend.kaldi_fbank import log_mel_fbank
from asr_tpu.layers.attention import NEG_INF
from asr_tpu.layers.norms import layer_norm
from asr_tpu.layers.sanm import depthwise_conv1d_time
from asr_tpu.layers.transformer import dense
from asr_tpu.models import dolphin as dp
from asr_tpu.streaming import dolphin_stream as ds


@functools.partial(jax.jit, static_argnames=("cfg", "variant"))
def step_variant(params, cfg, state, window, rel_k_cache, variant="full"):
    """dolphin_stream.encoder_step with pieces disabled by STATIC flag.

    Mirrors the production math (asr_tpu/streaming/dolphin_stream.py) —
    intentionally duplicated so ablations can cut mid-layer paths the
    production code has no reason to parameterize."""
    b = cfg.base
    fb = cfg.fbank
    if variant == "no_frontend":
        x = jnp.zeros((1, cfg.chunk_frames, b.d_model), jnp.float32) + window[0] * 1e-9
    else:
        mel = log_mel_fbank(window[None], fb, cfg.window_mel)
        mel = (mel - params["cmvn_mean"]) * params["cmvn_istd"]
        x = mel[..., None]
        sub = params["subsample"]
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, sub["conv0"]["w"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + sub["conv0"]["b"])
        x = jax.nn.relu(jax.lax.conv_general_dilated(
            x, sub["conv1"]["w"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + sub["conv1"]["b"])
        t = x.shape[1]
        x = x.transpose(0, 1, 3, 2).reshape(1, t, -1)
        x = dense(x, sub["out"]) * (b.d_model ** 0.5)
        x = x[:, : cfg.chunk_frames]

    valid = state["valid"]
    n = cfg.chunk_frames
    max_f = cfg.max_frames
    kv_len_total = valid + n
    kpos = jnp.arange(max_f, dtype=jnp.int32)[None, :]
    key_bias = jnp.where(kpos < kv_len_total, 0.0, NEG_INF)[:, None, None, :].astype(jnp.float32)

    new_att_k, new_att_v, new_cnn = [], [], []
    hd = b.head_dim
    for li, p in enumerate(params["enc_blocks"]):
        y = layer_norm(x, p["ffn_macaron"]["norm"]["scale"], p["ffn_macaron"]["norm"]["bias"])
        x = x + 0.5 * dense(jax.nn.silu(dense(y, p["ffn_macaron"]["w1"])), p["ffn_macaron"]["w2"])
        xn = layer_norm(x, p["norm_mha"]["scale"], p["norm_mha"]["bias"])
        q = dense(xn, p["attn"]["q"]).reshape(1, n, b.enc_heads, hd)
        k_new = dense(xn, p["attn"]["k"]).reshape(n, b.enc_heads, hd)
        v_new = dense(xn, p["attn"]["v"]).reshape(n, b.enc_heads, hd)
        if variant == "no_kv_write":
            k_buf, v_buf = state["att_k"][li], state["att_v"][li]
        elif variant == "static_write":
            k_buf = jax.lax.dynamic_update_slice(state["att_k"][li], k_new, (0, 0, 0))
            v_buf = jax.lax.dynamic_update_slice(state["att_v"][li], v_new, (0, 0, 0))
        else:
            k_buf = jax.lax.dynamic_update_slice(state["att_k"][li], k_new, (valid, 0, 0))
            v_buf = jax.lax.dynamic_update_slice(state["att_v"][li], v_new, (valid, 0, 0))
        if variant not in ("no_kv_write",):
            new_att_k.append(k_buf)
            new_att_v.append(v_buf)
        rel_k = rel_k_cache[li]
        if variant == "no_attn":
            x1 = dense(v_new.reshape(1, n, b.d_model), p["attn"]["o"])
        else:
            qu = q + p["attn"]["bias_u"][None, None]
            qv = q + p["attn"]["bias_v"][None, None]
            ac = jnp.einsum("bqhd,khd->bhqk", qu, k_buf)
            bdm = jnp.einsum("bqhd,khd->bhqk", qv, rel_k)
            scores = (ac + bdm).astype(jnp.float32) * (hd ** -0.5) + key_bias
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            x1 = jnp.einsum("bhqk,khd->bqhd", probs, v_buf).reshape(1, n, b.d_model)
            x1 = dense(x1, p["attn"]["o"])
        xm = layer_norm(x, p["norm_mlp"]["scale"], p["norm_mlp"]["bias"])
        g0 = jax.nn.gelu(dense(xm, p["cgmlp"]["proj1"]), approximate=False)
        r, g = jnp.split(g0, 2, axis=-1)
        g = layer_norm(g, p["cgmlp"]["csgu"]["norm"]["scale"], p["cgmlp"]["csgu"]["norm"]["bias"])
        g_in = jnp.concatenate([state["cnn"][li][None], g], axis=1)
        new_cnn.append(g_in[0, -(b.csgu_kernel - 1):])
        g = depthwise_conv1d_time(g_in, p["cgmlp"]["csgu"]["conv"]["w"], 0, 0)
        if "b" in p["cgmlp"]["csgu"]["conv"]:
            g = g + p["cgmlp"]["csgu"]["conv"]["b"]
        x2 = dense(r * g, p["cgmlp"]["proj2"])
        c = jnp.concatenate([x1, x2], axis=-1)
        fk = p["fusion"]["w"].shape[0]
        fused = depthwise_conv1d_time(c, p["fusion"]["w"], fk - 1, 0)
        if "b" in p["fusion"]:
            fused = fused + p["fusion"]["b"]
        c = c + fused
        x = x + dense(c, p["merge_proj"])
        y = layer_norm(x, p["ffn"]["norm"]["scale"], p["ffn"]["norm"]["bias"])
        x = x + 0.5 * dense(jax.nn.silu(dense(y, p["ffn"]["w1"])), p["ffn"]["w2"])
        x = layer_norm(x, p["norm_final"]["scale"], p["norm_final"]["bias"])

    enc_out = layer_norm(x, params["after_norm"]["scale"], params["after_norm"]["bias"])
    if variant == "no_ctc":
        ctc_ids = jnp.zeros((1, n), jnp.int32)
    else:
        ctc_ids = jnp.argmax(dense(enc_out, params["ctc"]), axis=-1).astype(jnp.int32)

    new_cross_k, new_cross_v = [], []
    for li, p in enumerate(params["decoder"]["blocks"]):
        k = dense(enc_out, p["cross"]["k"]).reshape(n, b.dec_heads, hd)
        v = dense(enc_out, p["cross"]["v"]).reshape(n, b.dec_heads, hd)
        if variant == "no_kv_write":
            new_cross_k.append(state["cross_k"][li])
            new_cross_v.append(state["cross_v"][li])
        else:
            off = jnp.asarray(0, jnp.int32) if variant == "static_write" else valid
            new_cross_k.append(jax.lax.dynamic_update_slice(state["cross_k"][li], k, (off, 0, 0)))
            new_cross_v.append(jax.lax.dynamic_update_slice(state["cross_v"][li], v, (off, 0, 0)))

    if variant == "no_kv_write":
        new_state = {**state, "cnn": jnp.stack(new_cnn),
                     "valid": jnp.minimum(kv_len_total, max_f)}
    else:
        new_state = {
            "att_k": jnp.stack(new_att_k), "att_v": jnp.stack(new_att_v),
            "cnn": jnp.stack(new_cnn),
            "cross_k": jnp.stack(new_cross_k), "cross_v": jnp.stack(new_cross_v),
            "valid": jnp.minimum(kv_len_total, max_f),
        }
    return new_state, ctc_ids


def time_variant(variant, params, cfg, relk, n_streams, iters=25):
    # params/relk ride as jit ARGUMENTS — closing over them bakes ~0.5 GB
    # of trace-time constants into the remote-compile payload (HTTP 413).
    vstep = jax.vmap(
        lambda p, rk, s, w: step_variant(p, cfg, s, w, rk, variant),
        in_axes=(None, None, 0, 0))
    states = jax.vmap(lambda _: ds.init_state(cfg))(jnp.arange(n_streams))
    rng = np.random.default_rng(0)
    windows = jnp.asarray((rng.standard_normal((n_streams, cfg.window_samples))
                           * 2000).astype(np.float32))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(n, params, relk, states, windows):
        def body(_, carry):
            s, acc = carry
            s, ids = vstep(params, relk, s, windows)
            return s, acc + jnp.sum(ids)
        return jax.lax.fori_loop(0, n, body, (states, jnp.zeros((), jnp.int32)))

    def fetch(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(jnp.ravel(leaf)[:1])

    fetch(run(iters, params, relk, states, windows))
    fetch(run(2 * iters, params, relk, states, windows))
    t1s, t2s = [], []
    for _ in range(7):
        t0 = time.perf_counter(); fetch(run(iters, params, relk, states, windows))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(run(2 * iters, params, relk, states, windows))
        t2s.append(time.perf_counter() - t0)
    per_tick = (min(t2s) - min(t1s)) / iters
    return per_tick * 1e3


def main():
    n_streams = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = ds.DolphinStreamConfig(base=dp.DolphinConfig())
    params = dp.init_params(cfg.base, jax.random.PRNGKey(0))
    relk = ds.precompute_rel_k(params, cfg)
    print(f"device: {jax.devices()[0]}  streams={n_streams}", flush=True)
    out = {}
    for variant in ("full", "no_kv_write", "static_write", "no_attn",
                    "no_ctc", "no_frontend"):
        ms = time_variant(variant, params, cfg, relk, n_streams)
        out[variant] = round(ms, 3)
        print(json.dumps({"variant": variant, "ms_per_tick": out[variant]}),
              flush=True)
    base = out["full"]
    print("\n| variant | ms/tick | saved vs full |")
    print("|---|---|---|")
    for k, v in out.items():
        print(f"| {k} | {v} | {base - v:+.3f} |")


if __name__ == "__main__":
    main()
