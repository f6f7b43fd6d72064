"""Checkpoint loaders: FunASR name mapping on synthetic state dicts,
Kaldi mvn parsing, end-to-end forward through mapped params."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from asr_tpu.loaders import funasr
from asr_tpu.models import paraformer as pf
from asr_tpu.models import sensevoice as sv

SV_CFG = sv.SenseVoiceConfig(
    vocab_size=64, hidden=32, num_heads=4, head_dim=8, ffn_dim=48,
    num_encoders0=1, num_encoders=2, num_tp_encoders=1, fsmn_kernel=5,
)


def _sanm_sd(prefix, in_size, hidden, ffn, kernel, rng):
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    return {
        f"{prefix}.norm1.weight": t(in_size), f"{prefix}.norm1.bias": t(in_size),
        f"{prefix}.self_attn.linear_q_k_v.weight": t(3 * hidden, in_size),
        f"{prefix}.self_attn.linear_q_k_v.bias": t(3 * hidden),
        f"{prefix}.self_attn.fsmn_block.weight": t(hidden, 1, kernel),
        f"{prefix}.self_attn.linear_out.weight": t(hidden, hidden),
        f"{prefix}.self_attn.linear_out.bias": t(hidden),
        f"{prefix}.norm2.weight": t(hidden), f"{prefix}.norm2.bias": t(hidden),
        f"{prefix}.feed_forward.w_1.weight": t(ffn, hidden),
        f"{prefix}.feed_forward.w_1.bias": t(ffn),
        f"{prefix}.feed_forward.w_2.weight": t(hidden, ffn),
        f"{prefix}.feed_forward.w_2.bias": t(hidden),
    }


def _sensevoice_sd(cfg, rng):
    sd = {}
    f = cfg.feature_size
    sd.update(_sanm_sd("encoder.encoders0.0", f, cfg.hidden, cfg.ffn_dim, cfg.fsmn_kernel, rng))
    for i in range(cfg.num_encoders):
        sd.update(_sanm_sd(f"encoder.encoders.{i}", cfg.hidden, cfg.hidden, cfg.ffn_dim, cfg.fsmn_kernel, rng))
    for i in range(cfg.num_tp_encoders):
        sd.update(_sanm_sd(f"encoder.tp_encoders.{i}", cfg.hidden, cfg.hidden, cfg.ffn_dim, cfg.fsmn_kernel, rng))
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    sd["encoder.after_norm.weight"] = t(cfg.hidden)
    sd["encoder.after_norm.bias"] = t(cfg.hidden)
    sd["encoder.tp_norm.weight"] = t(cfg.hidden)
    sd["encoder.tp_norm.bias"] = t(cfg.hidden)
    sd["ctc.ctc_lo.weight"] = t(cfg.vocab_size, cfg.hidden)
    sd["ctc.ctc_lo.bias"] = t(cfg.vocab_size)
    sd["embed.weight"] = t(16, f)
    return sd


def test_sensevoice_mapping_and_forward():
    rng = np.random.default_rng(0)
    cfg = SV_CFG
    sd = _sensevoice_sd(cfg, rng)
    neg_means = rng.standard_normal(cfg.feature_size).astype(np.float32)
    istd = np.abs(rng.standard_normal(cfg.feature_size)).astype(np.float32) + 0.5
    params = funasr.sensevoice_params_from_state_dict(sd, cfg, neg_means, istd)
    # weight orientation: qkv w is (in, 3*hidden)
    assert params["encoders"][0]["qkv"]["w"].shape == (cfg.hidden, 3 * cfg.hidden)
    assert params["encoders"][0]["fsmn_w"].shape == (cfg.fsmn_kernel, cfg.hidden)
    # sqrt(hidden) scale folded into cmvn + prompt rows
    np.testing.assert_allclose(
        np.asarray(params["cmvn_istd"]), istd * cfg.hidden ** 0.5, rtol=1e-6
    )
    lang_row0 = np.asarray(params["language_embed"][0])
    np.testing.assert_allclose(lang_row0, sd["embed.weight"][0].numpy() * cfg.hidden ** 0.5, rtol=1e-6)
    audio = jnp.asarray((rng.standard_normal((1, 4800)) * 2000).astype(np.float32))
    toks, counts = sv.forward(params, cfg, audio, jnp.asarray([4800]), jnp.asarray([1]))
    assert counts.shape == (1,)


def test_paraformer_mapping_and_forward():
    rng = np.random.default_rng(1)
    cfg = pf.ParaformerConfig(
        vocab_size=50, hidden=32, num_heads=4, head_dim=8, ffn_dim=48,
        num_encoders0=1, num_encoders=1, num_decoders=1, num_decoder_ffn=1,
        fsmn_kernel=5, predictor_kernel=3,
    )
    sd = {}
    f = cfg.feature_size
    sd.update(_sanm_sd("encoder.encoders0.0", f, cfg.hidden, cfg.ffn_dim, cfg.fsmn_kernel, rng))
    sd.update(_sanm_sd("encoder.encoders.0", cfg.hidden, cfg.hidden, cfg.ffn_dim, cfg.fsmn_kernel, rng))
    t = lambda *s: torch.tensor(rng.standard_normal(s).astype(np.float32))
    sd["encoder.after_norm.weight"] = t(cfg.hidden)
    sd["encoder.after_norm.bias"] = t(cfg.hidden)
    sd["predictor.cif_conv1d.weight"] = t(cfg.hidden, cfg.hidden, 3)
    sd["predictor.cif_conv1d.bias"] = t(cfg.hidden)
    sd["predictor.cif_output.weight"] = t(1, cfg.hidden)
    sd["predictor.cif_output.bias"] = t(1)
    pfx = "decoder.decoders.0"
    sd.update({
        f"{pfx}.norm1.weight": t(cfg.hidden), f"{pfx}.norm1.bias": t(cfg.hidden),
        f"{pfx}.feed_forward.w_1.weight": t(cfg.ffn_dim, cfg.hidden),
        f"{pfx}.feed_forward.w_1.bias": t(cfg.ffn_dim),
        f"{pfx}.feed_forward.norm.weight": t(cfg.ffn_dim),
        f"{pfx}.feed_forward.norm.bias": t(cfg.ffn_dim),
        f"{pfx}.feed_forward.w_2.weight": t(cfg.hidden, cfg.ffn_dim),
        f"{pfx}.feed_forward.w_2.bias": t(cfg.hidden),
        f"{pfx}.norm2.weight": t(cfg.hidden), f"{pfx}.norm2.bias": t(cfg.hidden),
        f"{pfx}.self_attn.fsmn_block.weight": t(cfg.hidden, 1, cfg.fsmn_kernel),
        f"{pfx}.norm3.weight": t(cfg.hidden), f"{pfx}.norm3.bias": t(cfg.hidden),
        f"{pfx}.src_attn.linear_q.weight": t(cfg.hidden, cfg.hidden),
        f"{pfx}.src_attn.linear_q.bias": t(cfg.hidden),
        f"{pfx}.src_attn.linear_k_v.weight": t(2 * cfg.hidden, cfg.hidden),
        f"{pfx}.src_attn.linear_k_v.bias": t(2 * cfg.hidden),
        f"{pfx}.src_attn.linear_out.weight": t(cfg.hidden, cfg.hidden),
        f"{pfx}.src_attn.linear_out.bias": t(cfg.hidden),
    })
    pfx3 = "decoder.decoders3.0"
    sd.update({
        f"{pfx3}.norm1.weight": t(cfg.hidden), f"{pfx3}.norm1.bias": t(cfg.hidden),
        f"{pfx3}.feed_forward.w_1.weight": t(cfg.ffn_dim, cfg.hidden),
        f"{pfx3}.feed_forward.w_1.bias": t(cfg.ffn_dim),
        f"{pfx3}.feed_forward.norm.weight": t(cfg.ffn_dim),
        f"{pfx3}.feed_forward.norm.bias": t(cfg.ffn_dim),
        f"{pfx3}.feed_forward.w_2.weight": t(cfg.hidden, cfg.ffn_dim),
        f"{pfx3}.feed_forward.w_2.bias": t(cfg.hidden),
    })
    sd["decoder.after_norm.weight"] = t(cfg.hidden)
    sd["decoder.after_norm.bias"] = t(cfg.hidden)
    sd["decoder.output_layer.weight"] = t(cfg.vocab_size, cfg.hidden)
    sd["decoder.output_layer.bias"] = t(cfg.vocab_size)

    neg_means = rng.standard_normal(f).astype(np.float32)
    istd = np.abs(rng.standard_normal(f)).astype(np.float32) + 0.5
    params = funasr.paraformer_params_from_state_dict(sd, cfg, neg_means, istd)
    audio = jnp.asarray((rng.standard_normal((1, 4800)) * 2000).astype(np.float32))
    ids, counts = pf.forward(params, cfg, audio, jnp.asarray([4800]), max_tokens=16)
    assert ids.shape == (1, 16)


def test_parse_kaldi_mvn(tmp_path):
    p = tmp_path / "am.mvn"
    p.write_text(
        "<Nnet>\n<Splice> 5 5\n[ 0 ]\n<AddShift> 3 3\n<LearnRateCoef> 0 [ -1.5 -2.5 -3.5 ]\n"
        "<Rescale> 3 3\n<LearnRateCoef> 0 [ 0.5 0.25 0.125 ]\n</Nnet>\n"
    )
    neg_means, istd = funasr.parse_kaldi_mvn(p)
    np.testing.assert_allclose(neg_means, [-1.5, -2.5, -3.5])
    np.testing.assert_allclose(istd, [0.5, 0.25, 0.125])
