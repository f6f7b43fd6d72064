"""Device meshes and sharding for multi-chip serving/training.

The reference is single-process/single-device (SURVEY.md §2: no
parallelism exists to mirror); the TPU-native scaling story is
``jax.sharding`` over an ICI mesh:

- **data**: batch data-parallel — the throughput axis for serving
  (independent audio windows per chip, collective-free inference).
- **model**: tensor-parallel sharding of the wide matmuls (qkv/out/ffn/
  vocab head) for models whose per-chip HBM or latency demands it; XLA
  inserts the psum/all-gathers from sharding constraints.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1, devices=None
) -> Mesh:
    """Create a (data, model) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    grid = np.array(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def _sanm_block_spec(in_size_key: str = "qkv") -> dict:
    """Tensor-parallel PartitionSpecs for one SANM block: qkv/ffn-in are
    column-sharded, out/ffn-out row-sharded (Megatron layout); XLA adds the
    psum at the row-sharded matmuls."""
    return {
        "norm1": {"scale": P(), "bias": P()},
        "qkv": {"w": P(None, "model"), "b": P("model")},
        "fsmn_w": P(None, "model"),
        "out": {"w": P("model", None), "b": P()},
        "norm2": {"scale": P(), "bias": P()},
        "ffn": {"w1": P(None, "model"), "b1": P("model"), "w2": P("model", None), "b2": P()},
    }


def sensevoice_param_specs(params: Any) -> Any:
    """PartitionSpec pytree matching a SenseVoice param pytree."""
    return {
        "cmvn_means": P(),
        "cmvn_istd": P(),
        "language_embed": P(),
        "system_embed": P(),
        "encoders0": [_sanm_block_spec() for _ in params["encoders0"]],
        "encoders": [_sanm_block_spec() for _ in params["encoders"]],
        "tp_encoders": [_sanm_block_spec() for _ in params["tp_encoders"]],
        "after_norm": {"scale": P(), "bias": P()},
        "tp_norm": {"scale": P(), "bias": P()},
        "ctc": {"w": P(None, "model"), "b": P("model")},
    }


def shard_params(params: Any, mesh: Mesh, specs: Any | None = None) -> Any:
    """Place a param pytree on the mesh (replicated by default, or per-spec)."""
    if specs is None:
        sharding = replicated(mesh)
        return jax.device_put(params, sharding)
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)
