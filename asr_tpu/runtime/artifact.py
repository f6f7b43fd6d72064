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
    from asr_tpu.quant.quantize import QuantizedEmbedding, QuantizedLinear

    out: dict[str, np.ndarray] = {}
    if isinstance(tree, QuantizedLinear):
        for k in ("q", "scale", "zero"):
            out[f"{prefix}__quant__/{k}"] = np.ascontiguousarray(np.asarray(tree[k]))
        out[f"{prefix}__quant__/bits"] = np.asarray(tree.bits, np.int32)
        out[f"{prefix}__quant__/block"] = np.asarray(tree.block, np.int32)
        out[f"{prefix}__quant__/packed"] = np.asarray(int(tree.packed), np.int32)
        out[f"{prefix}__quant__/dynamic"] = np.asarray(int(tree.dynamic), np.int32)
    elif isinstance(tree, QuantizedEmbedding):
        for k in ("q", "scale", "zero"):
            out[f"{prefix}__qembed__/{k}"] = np.ascontiguousarray(np.asarray(getattr(tree, k)))
        out[f"{prefix}__qembed__/bits"] = np.asarray(tree.bits, np.int32)
        out[f"{prefix}__qembed__/block"] = np.asarray(tree.block, np.int32)
        # tied-head orientation is derived (q.T) — store only the flag
        out[f"{prefix}__qembed__/tied"] = np.asarray(int(tree.q_t is not None), np.int32)
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
                                   packed=bool(int(q.get("packed", 0))),
                                   dynamic=bool(int(q.get("dynamic", 0))))
        if "__qembed__" in node and len(node) == 1:
            from asr_tpu.quant.quantize import QuantizedEmbedding

            q = node["__qembed__"]
            q_t = scale_t = zero_t = None
            q_t_packed = False
            if int(q.get("tied", 1)):
                from asr_tpu.quant.quantize import tied_head_arrays
                import jax.numpy as _jnp

                q_t, scale_t, zero_t, q_t_packed = tied_head_arrays(
                    _jnp.asarray(np.ascontiguousarray(np.asarray(q["q"]).T)),
                    _jnp.asarray(np.ascontiguousarray(np.asarray(q["scale"]).T)),
                    _jnp.asarray(np.ascontiguousarray(np.asarray(q["zero"]).T)),
                    bits=int(q["bits"]), block=int(q["block"]),
                )
            return QuantizedEmbedding(q["q"], q["scale"], q["zero"],
                                      int(q["bits"]), int(q["block"]),
                                      q_t=q_t, scale_t=scale_t, zero_t=zero_t,
                                      q_t_packed=q_t_packed)
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def dedup_flat(flat: dict[str, np.ndarray]) -> tuple[dict[str, np.ndarray], dict[str, str]]:
    """Byte-identical tensor consolidation: each duplicate family keeps one
    canonical entry; the rest become alias rows (the reference dedups
    initializer byte-ranges into one shared blob and stores tied
    embed/LM-head weights once, ``Whisper/Shared_Merged.py:1653-1706,285``).

    Only tensors >= 1 KiB are considered (small biases aren't worth the
    metadata row). Returns (kept tensors, {alias_key: canonical_key})."""
    by_sig: dict[tuple, str] = {}
    kept: dict[str, np.ndarray] = {}
    aliases: dict[str, str] = {}
    for key, arr in flat.items():
        if arr.nbytes < 1024:
            kept[key] = arr
            continue
        sig = (arr.dtype.str, arr.shape, hash(arr.tobytes()))
        canon = by_sig.get(sig)
        # hash() collisions are broken by a full byte compare.
        if canon is not None and kept[canon].tobytes() == arr.tobytes():
            aliases[key] = canon
        else:
            by_sig[sig] = key
            kept[key] = arr
    return kept, aliases


def save_model(folder: str | Path, params: Any, metadata: ModelMetadata) -> None:
    from safetensors.numpy import save_file

    folder = Path(folder)
    folder.mkdir(parents=True, exist_ok=True)
    flat, aliases = dedup_flat(flatten_pytree(params))
    if aliases:
        metadata.extra["weight_aliases"] = aliases
    else:
        metadata.extra.pop("weight_aliases", None)
    save_file(flat, str(folder / WEIGHTS_FILENAME))
    metadata.save(folder)


def load_model(folder: str | Path, dtype=None) -> tuple[Any, ModelMetadata]:
    from safetensors.numpy import load_file

    folder = Path(folder)
    flat = load_file(str(folder / WEIGHTS_FILENAME))
    meta = ModelMetadata.load(folder)
    for alias, canon in meta.extra.get("weight_aliases", {}).items():
        flat[alias] = flat[canon]
    if dtype is not None:
        flat = {k: v.astype(dtype) for k, v in flat.items()}
    params = _to_device(unflatten_pytree(flat))
    return params, meta


def _to_device(tree: Any, _memo: dict | None = None) -> Any:
    """Host tree -> device tree. Aliased numpy leaves (weight dedup) map to
    ONE device buffer — N references, one physical HBM copy, matching the
    reference's mmap'd shared-initializer behavior."""
    from asr_tpu.quant.quantize import QuantizedEmbedding, QuantizedLinear

    memo = _memo if _memo is not None else {}

    def put(x):
        key = id(x)
        if key not in memo:
            memo[key] = jnp.asarray(x)
        return memo[key]

    if isinstance(tree, QuantizedLinear):
        return QuantizedLinear(
            put(tree.q), put(tree.scale), put(tree.zero),
            tree.bits, tree.block, packed=tree.packed, dynamic=tree.dynamic,
        )
    if isinstance(tree, QuantizedEmbedding):
        return QuantizedEmbedding(
            put(tree.q), put(tree.scale), put(tree.zero), tree.bits, tree.block,
            q_t=None if tree.q_t is None else put(tree.q_t),
            scale_t=None if tree.scale_t is None else put(tree.scale_t),
            zero_t=None if tree.zero_t is None else put(tree.zero_t),
            q_t_packed=tree.q_t_packed,
        )
    if isinstance(tree, dict):
        return {k: _to_device(v, memo) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_device(v, memo) for v in tree]
    return put(tree)
