#!/usr/bin/env python
"""Validate the fused Qwen3 decode megakernel on REAL TPU hardware.

Correctness: one compiled ``fused_decode_step`` (28 layers + fused tied
LM head in ONE pallas_call) vs ``qwen3.decoder_pass`` +
``logits_from_hidden`` at the true Qwen3-0.6B geometry (random q4-packed
weights + int4 quantized tied embed head).

Performance: N chained FULL decode steps (stack + LM head) inside one jit
(``lax.fori_loop`` carrying x/caches — every step depends on the previous,
so nothing hoists), timed with the difference method (t(2N) - t(N)) / N to
cancel the ~29 ms axon-tunnel round trip. The same loop runs the
per-weight production path (``decoder_pass`` through the Pallas matvec
kernels + the separate tied-head matvec) for the A/B.

Run: ``python tools/validate_fused_decode.py [t_max]`` (needs the TPU tunnel).
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
from asr_tpu.ops.fused_decode import fused_decode_step, stack_decode_params
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
    t_max = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = qwen3.Qwen3Config()  # 0.6B geometry
    nl, h = cfg.num_layers, cfg.hidden
    kvw = cfg.num_kv_heads * cfg.head_dim
    print(f"backend={jax.default_backend()} t_max={t_max} nl={nl}")

    params = qwen3.init_params(cfg, jax.random.PRNGKey(0))
    table = params.pop("embed")
    fused = qwen3.fuse_params(
        quantize_pytree({"layers": params["layers"],
                         "final_norm": params["final_norm"]}, bits=4,
                        block=128, min_size=0, pack=True, refine_iters=0), cfg)
    fused["embed"] = quantize_embedding(table, bits=4, block=128)
    del table
    stacked = stack_decode_params(fused, cfg)
    assert stacked is not None and "wh" in stacked, "0.6B + tied head must tile"
    # flush the quantize/stack queue before compiling the prefill: the axon
    # tunnel FailedPreconditions when a large compile lands on a deep queue
    jax.block_until_ready((fused, stacked))
    vocab = fused["embed"].q.shape[0]

    cs = jnp.asarray(rope_tables(t_max, cfg.head_dim, cfg.rope_theta))
    shift = jnp.asarray([0], jnp.int32)
    prompt = 32
    state = qwen3.make_kv_state(cfg, 1, t_max, jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, prompt, h), jnp.float32) * 0.3
    bias = qwen3.left_prefill_bias(shift, prompt, t_max)
    hid, state = jax.jit(
        lambda p, e, s: qwen3.decoder_pass(p, cfg, e, s, jnp.asarray(0, jnp.int32),
                                           bias, pos_offset=shift),
    )(fused, emb, state)
    kc = jnp.stack([ls["k"][0].reshape(t_max, kvw)
                    for ls in state["layers"]]).astype(jnp.bfloat16)
    vc = jnp.stack([ls["v"][0].reshape(t_max, kvw)
                    for ls in state["layers"]]).astype(jnp.bfloat16)

    # ---- correctness: one step, fused vs per-weight --------------------
    x = jax.random.normal(jax.random.PRNGKey(2), (1, h), jnp.float32) * 0.3
    pos = jnp.asarray(prompt, jnp.int32)
    sbias = qwen3.left_step_bias(shift, pos, t_max)
    h_ref, state2 = jax.jit(
        lambda p, xx, s: qwen3.decoder_pass(p, cfg, xx[:, None], s, pos, sbias,
                                            pos_offset=shift))(fused, x, state)
    lg_ref = jax.jit(
        lambda p, hh: qwen3.logits_from_hidden(p, cfg, hh))(fused, h_ref[:, 0])
    cos, sin = cs[0][prompt][None], cs[1][prompt][None]
    h_fu, lg_fu, kc2, vc2 = fused_decode_step(stacked, cfg, x, kc, vc, pos,
                                              shift[0], cos, sin)
    ref = np.asarray(rms_norm(h_ref[:, 0], fused["final_norm"]["scale"],
                              cfg.rms_eps))
    got = np.asarray(h_fu)
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    lr = np.asarray(lg_ref)
    lerr = (np.abs(np.asarray(lg_fu[:, :vocab]) - lr).max()
            / max(np.abs(lr).max(), 1e-9))
    kr = np.asarray(state2["layers"][nl - 1]["k"][0, prompt].reshape(-1))
    kerr = (np.abs(np.asarray(kc2[nl - 1, prompt], np.float32) - kr).max()
            / max(np.abs(kr).max(), 1e-9))
    print(f"hidden rel err {err:.3e}  logits rel err {lerr:.3e}  "
          f"last-layer k-row rel err {kerr:.3e}")
    ok = err < 3e-2 and kerr < 3e-2 and lerr < 3e-2

    # ---- timing: chained FULL steps (stack + head) in one jit ----------
    span = t_max - prompt - 2

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_fused(stk, x0, kc0, vc0, n):
        def body(i, carry):
            xx, k, v = carry
            p = prompt + jax.lax.rem(i, jnp.int32(span))
            hh, lg, k, v = fused_decode_step(stk, cfg, xx, k, v,
                                             p.astype(jnp.int32), shift[0],
                                             cs[0][p][None], cs[1][p][None])
            return (jnp.tanh(hh + lg[:, :1] * 1e-3) * 0.3, k, v)
        return jax.lax.fori_loop(0, n, body, (x0, kc0, vc0))[0]

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop_ref(p, x0, st, n):
        def body(i, carry):
            xx, s = carry
            ppos = prompt + jax.lax.rem(i, jnp.int32(span))
            sb = qwen3.left_step_bias(shift, ppos, t_max)
            hh, s = qwen3.decoder_pass(p, cfg, xx[:, None], s, ppos, sb,
                                       pos_offset=shift)
            lg = qwen3.logits_from_hidden(p, cfg, hh[:, 0])
            return (jnp.tanh(hh[:, 0] + lg[:, :1] * 1e-3) * 0.3, s)
        return jax.lax.fori_loop(0, n, body, (x0, st))[0]

    n = 200
    ms_fused = _median_diff(lambda k: loop_fused(stacked, x, kc, vc, k), n) * 1e3
    ms_ref = _median_diff(lambda k: loop_ref(fused, x, state, k), n) * 1e3

    qbytes = sum(int(np.prod(stacked[k].shape)) for k in ("wq", "wo", "wgu", "wd", "wh"))
    scale_b = sum(int(np.prod(stacked[k].shape)) * 4 for k in stacked
                  if k.endswith("_s") or k.endswith("_zs"))
    cache_b = 2 * nl * t_max * kvw * 2  # bf16 cache tiles
    gbs = (qbytes + scale_b + cache_b) / (ms_fused * 1e-3) / 1e9
    print(f"fused megakernel (+head): {ms_fused:.3f} ms/step  (~{gbs:.0f} GB/s incl. cache)")
    print(f"per-weight path (+head):  {ms_ref:.3f} ms/step  -> speedup {ms_ref/ms_fused:.2f}x")

    rec = {"t_max": t_max, "hidden_rel_err": float(err),
           "logits_rel_err": float(lerr), "krow_rel_err": float(kerr),
           "ms_fused": ms_fused, "ms_per_weight": ms_ref,
           "speedup": ms_ref / ms_fused, "gbs_incl_cache": gbs, "ok": bool(ok)}
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "bench_runs", "fused_decode_tpu.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
