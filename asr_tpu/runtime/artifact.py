"""Model artifact folders: weights (safetensors) + metadata.json + tokenizer.

Replaces the reference's optimized-folder layout (strategy graphs +
``*_SharedInitializers.onnx.data`` blob + ``ASR_Metadata.onnx`` + tokenizer
assets, reference ``Whisper/Shared_Merged.py:1653-1743``). One pytree per
model; "weight sharing across graphs" is inherent (there is one pytree) and
loading is an mmap'd safetensors read.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax.numpy as jnp
import numpy as np

from asr_tpu.runtime.metadata import ModelMetadata

WEIGHTS_FILENAME = "weights.safetensors"


def flatten_pytree(tree: Any, prefix: str = "") -> dict[str, np.ndarray]:
    from asr_tpu.quant.quantize import QuantizedLinear

    out: dict[str, np.ndarray] = {}
    if isinstance(tree, QuantizedLinear):
        for k in ("q", "scale", "zero"):
            out[f"{prefix}__quant__/{k}"] = np.ascontiguousarray(np.asarray(tree[k]))
        out[f"{prefix}__quant__/bits"] = np.asarray(tree.bits, np.int32)
        out[f"{prefix}__quant__/block"] = np.asarray(tree.block, np.int32)
        out[f"{prefix}__quant__/packed"] = np.asarray(int(tree.packed), np.int32)
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    else:
        # ascontiguousarray: safetensors silently mis-serializes
        # non-contiguous views (TPU-backed arrays can round-trip as such).
        out[prefix[:-1]] = np.ascontiguousarray(np.asarray(tree))
    return out


def unflatten_pytree(flat: dict[str, np.ndarray]) -> Any:
    root: dict = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if "__quant__" in node and len(node) == 1:
            from asr_tpu.quant.quantize import QuantizedLinear

            q = node["__quant__"]
            return QuantizedLinear(q["q"], q["scale"], q["zero"],
                                   int(q["bits"]), int(q["block"]),
                                   packed=bool(int(q.get("packed", 0))))
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_model(folder: str | Path, params: Any, metadata: ModelMetadata) -> None:
    from safetensors.numpy import save_file

    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    flat = flatten_pytree(params)
    save_file(flat, str(folder / WEIGHTS_FILENAME))
    metadata.save(folder)


def load_model(folder: str | Path, dtype=None) -> tuple[Any, ModelMetadata]:
    from safetensors.numpy import load_file

    folder = Path(folder)
    flat = load_file(str(folder / WEIGHTS_FILENAME))
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    params = _to_device(unflatten_pytree(flat))
    return params, ModelMetadata.load(folder)


def _to_device(tree: Any) -> Any:
    from asr_tpu.quant.quantize import QuantizedLinear

    if isinstance(tree, QuantizedLinear):
        return QuantizedLinear(
            jnp.asarray(tree.q), jnp.asarray(tree.scale), jnp.asarray(tree.zero),
            tree.bits, tree.block, packed=tree.packed,
        )
    if isinstance(tree, dict):
        return {k: _to_device(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_device(v) for v in tree]
    return jnp.asarray(tree)
