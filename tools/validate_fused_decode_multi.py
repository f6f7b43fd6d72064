#!/usr/bin/env python
"""Validate the multi-slot continuous-batching decode megakernel on REAL
TPU hardware.

Correctness: one compiled ``fused_decode_step_multi`` (28 layers + fused
tied LM head in ONE pallas_call, 8 slots) vs ``qwen3.decoder_step_rowwise``
+ ``logits_from_hidden`` at the true Qwen3-0.6B geometry (random q4-packed
weights + int4 quantized tied embed head), with per-slot positions and one
parked slot.

Performance: N chained multi-slot steps inside one jit (``lax.fori_loop``
carrying x/caches — every step depends on the previous), timed with the
difference method (t(2N) - t(N)) / N to cancel the axon-tunnel round trip.
The A/B is the rowwise XLA step the continuous batcher used before this
kernel (r3: 4x slower than lockstep).

Run: ``python tools/validate_fused_decode_multi.py [t_max] [n_slots]``.
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

from asr_tpu.layers import qwen3
from asr_tpu.layers.norms import rms_norm
from asr_tpu.layers.rope import rope_tables
from asr_tpu.ops.fused_decode import stack_decode_params
from asr_tpu.ops.fused_decode_multi import fused_decode_step_multi, fused_fits_multi
from asr_tpu.quant.quantize import quantize_embedding, quantize_pytree


def _fetch(out):
    for leaf in jax.tree.leaves(out):
        np.asarray(jnp.ravel(leaf)[:1])


def _median_diff(run, n):
    _fetch(run(n))
    _fetch(run(2 * n))
    diffs = []
    for _ in range(5):
        t0 = time.perf_counter(); _fetch(run(n)); t1 = time.perf_counter()
        _fetch(run(2 * n)); t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / n)
    return float(np.median(diffs))


def main():
    t_max = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cfg = qwen3.Qwen3Config()  # 0.6B geometry
    nl, h = cfg.num_layers, cfg.hidden
    kvw = cfg.num_kv_heads * cfg.head_dim
    print(f"backend={jax.default_backend()} t_max={t_max} slots={bs}")
    assert fused_fits_multi(cfg, bs, t_max, head_cols=1), "geometry must fit"

    params = qwen3.init_params(cfg, jax.random.PRNGKey(0))
    table = params.pop("embed")
    fused = qwen3.fuse_params(
        quantize_pytree({"layers": params["layers"],
                         "final_norm": params["final_norm"]}, bits=4,
                        block=128, min_size=0, pack=True, refine_iters=0), cfg)
    fused["embed"] = quantize_embedding(table, bits=4, block=128)
    del table
    stacked = stack_decode_params(fused, cfg)
    assert stacked is not None and "wh" in stacked
    jax.block_until_ready((fused, stacked))
    vocab = fused["embed"].q.shape[0]
    cs = jnp.asarray(rope_tables(t_max, cfg.head_dim, cfg.rope_theta))

    # per-slot compact prefills at different lengths; slot bs-1 parked
    lens = [200 + 7 * b for b in range(bs)]
    lens[-1] = 0
    state = qwen3.make_kv_state(cfg, bs, t_max, jnp.float32)
    prefill = jax.jit(lambda p, e, s, bias: qwen3.decoder_pass(
        p, cfg, e, s, jnp.asarray(0, jnp.int32), bias))
    for b, lb in enumerate(lens):
        if lb == 0:
            continue
        emb = jax.random.normal(jax.random.PRNGKey(10 + b), (1, lb, h),
                                jnp.float32) * 0.3
        bias = qwen3.causal_prefill_bias(jnp.asarray([lb], jnp.int32), lb, t_max)
        _, small = prefill(fused, emb, qwen3.make_kv_state(cfg, 1, t_max,
                                                           jnp.float32), bias)
        state = jax.tree.map(lambda big, sm, b=b: big.at[b].set(sm[0]),
                             state, small)
    kc = jnp.stack([ls["k"].reshape(bs, t_max, kvw)
                    for ls in state["layers"]]).astype(jnp.bfloat16)
    vc = jnp.stack([ls["v"].reshape(bs, t_max, kvw)
                    for ls in state["layers"]]).astype(jnp.bfloat16)

    # ---- correctness: one step, fused vs rowwise ------------------------
    pos = jnp.asarray(lens, jnp.int32)
    active = pos > 0
    x = jax.random.normal(jax.random.PRNGKey(2), (bs, h), jnp.float32) * 0.3
    h_ref, state2 = jax.jit(lambda p, xx, s: qwen3.decoder_step_rowwise(
        p, cfg, xx[:, None], s, pos, active))(fused, x, state)
    lg_ref = jax.jit(lambda p, hh: qwen3.logits_from_hidden(p, cfg, hh))(
        fused, h_ref[:, 0])
    posf = jnp.where(active, pos, -1)
    logical = jnp.clip(pos, 0, t_max - 1)
    h_fu, lg_fu, kc2, vc2 = fused_decode_step_multi(
        stacked, cfg, x, kc, vc, posf,
        jnp.take(cs[0], logical, axis=0), jnp.take(cs[1], logical, axis=0))

    ref = np.asarray(rms_norm(h_ref[:, 0], fused["final_norm"]["scale"],
                              cfg.rms_eps))
    got = np.asarray(h_fu)
    live = np.asarray(active)
    err = (np.abs(got - ref)[live].max() / max(np.abs(ref[live]).max(), 1e-9))
    lr = np.asarray(lg_ref)
    lerr = (np.abs(np.asarray(lg_fu[:, :vocab]) - lr)[live].max()
            / max(np.abs(lr[live]).max(), 1e-9))
    kerr = 0.0
    for b, lb in enumerate(lens):
        if lb == 0:  # parked slot: cache must be untouched bit-for-bit
            same = np.array_equal(np.asarray(kc2[:, b]), np.asarray(kc[:, b]))
            assert same, "parked slot cache was modified"
            continue
        kr = np.asarray(state2["layers"][nl - 1]["k"][b, lb].reshape(-1))
        kerr = max(kerr, np.abs(np.asarray(kc2[nl - 1, b, lb], np.float32)
                                - kr).max() / max(np.abs(kr).max(), 1e-9))
    print(f"hidden rel err {err:.3e}  logits rel err {lerr:.3e}  "
          f"k-row rel err {kerr:.3e}")
    ok = err < 3e-2 and kerr < 3e-2 and lerr < 3e-2

    # ---- timing: chained multi-slot steps in one jit --------------------
    span = t_max - max(lens) - 2
    pos0 = jnp.where(active, pos, 0)

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_fused(stk, x0, kc0, vc0, n):
        def body(i, carry):
            xx, k, v = carry
            pp = pos0 + jax.lax.rem(i, jnp.int32(span))
            lg_idx = jnp.clip(pp, 0, t_max - 1)
            hh, lg, k, v = fused_decode_step_multi(
                stk, cfg, xx, k, v, jnp.where(active, pp, -1),
                jnp.take(cs[0], lg_idx, axis=0), jnp.take(cs[1], lg_idx, axis=0))
            return (jnp.tanh(hh + lg[:, :1] * 1e-3) * 0.3, k, v)
        return jax.lax.fori_loop(0, n, body, (x0, kc0, vc0))[0]

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_row(p, x0, st, n):
        def body(i, carry):
            xx, s = carry
            pp = pos0 + jax.lax.rem(i, jnp.int32(span))
            hh, s = qwen3.decoder_step_rowwise(p, cfg, xx[:, None], s, pp, active)
            lg = qwen3.logits_from_hidden(p, cfg, hh[:, 0])
            return (jnp.tanh(hh[:, 0] + lg[:, :1] * 1e-3) * 0.3, s)
        return jax.lax.fori_loop(0, n, body, (x0, st))[0]

    n = 100
    ms_fused = _median_diff(lambda k: loop_fused(stacked, x, kc, vc, k), n) * 1e3
    st_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), state)
    ms_row = _median_diff(lambda k: loop_row(fused, x, st_bf16, k), n) * 1e3

    qbytes = sum(int(np.prod(stacked[k].shape))
                 for k in ("wq", "wo", "wgu", "wd", "wh"))
    scale_b = sum(int(np.prod(stacked[k].shape)) * 4 for k in stacked
                  if k.endswith("_s") or k.endswith("_zs"))
    cache_b = 2 * nl * bs * t_max * kvw * 2  # bf16, all slots
    gbs = (qbytes + scale_b + cache_b) / (ms_fused * 1e-3) / 1e9
    print(f"fused multi-slot step: {ms_fused:.3f} ms  (~{gbs:.0f} GB/s incl. "
          f"cache; {ms_fused / bs * 1e3:.0f} us/token)")
    print(f"rowwise XLA step:      {ms_row:.3f} ms  -> speedup "
          f"{ms_row / ms_fused:.2f}x")

    rec = {"t_max": t_max, "n_slots": bs, "hidden_rel_err": float(err),
           "logits_rel_err": float(lerr), "krow_rel_err": float(kerr),
           "ms_fused": ms_fused, "ms_rowwise": ms_row,
           "speedup_vs_rowwise": ms_row / ms_fused,
           "gbs_incl_cache": gbs, "ok": bool(ok)}
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_runs", "fused_decode_multi_tpu.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
