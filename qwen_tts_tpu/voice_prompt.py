"""Voice-clone prompt serialization — save/load reusable voice files.

The reference demo persists cloned voices as a torch ``.pt`` payload
``{"items": [asdict(VoiceClonePromptItem), ...]}`` (cli/demo.py:501-583,
items defined in inference/qwen3_tts_model.py:41-52). We read and write that
exact schema (torch is available in this image) so voice files round-trip
between the two stacks, and additionally support a pure-numpy ``.npz``
container for torch-free deployments.

Internally this framework represents a prompt as a dict of lists
(pipeline.create_voice_clone_prompt): ``ref_code`` ([T, G] int arrays or
None), ``ref_spk_embedding`` ([D] float arrays), ``ref_text`` (str or None),
``icl_mode`` / ``x_vector_only_mode`` (bools) — one list entry per sample.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np

_FIELDS = ("ref_code", "ref_spk_embedding", "ref_text",
           "icl_mode", "x_vector_only_mode")


def _prompt_to_items(prompt: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Dict-of-lists → the reference's list-of-item-dicts."""
    n = len(prompt["ref_spk_embedding"])

    def col(name, default):
        v = prompt.get(name)
        return v if v is not None else [default] * n

    items = []
    for i in range(n):
        spk = prompt["ref_spk_embedding"][i]
        if spk is None:
            raise ValueError(
                "ref_spk_embedding is required to save a voice-clone prompt "
                "(the speaker encoder was unavailable when it was created)"
            )
        code = col("ref_code", None)[i]
        items.append({
            "ref_code": None if code is None else np.asarray(code),
            "ref_spk_embedding": np.asarray(spk),
            "ref_text": col("ref_text", None)[i],
            "icl_mode": bool(col("icl_mode", True)[i]),
            "x_vector_only_mode": bool(col("x_vector_only_mode", False)[i]),
        })
    return items


def _items_to_prompt(items: List[Dict[str, Any]]) -> Dict[str, Any]:
    prompt: Dict[str, List] = {k: [] for k in _FIELDS}
    for d in items:
        if not isinstance(d, dict):
            raise ValueError("invalid voice file: item is not a dict")
        spk = d.get("ref_spk_embedding")
        if spk is None:
            raise ValueError("invalid voice file: missing ref_spk_embedding")
        code = d.get("ref_code")
        xvec_only = bool(d.get("x_vector_only_mode", False))
        prompt["ref_code"].append(
            None if code is None else _to_numpy(code).astype(np.int32)
        )
        prompt["ref_spk_embedding"].append(
            _to_numpy(spk).astype(np.float32)
        )
        rt = d.get("ref_text")
        prompt["ref_text"].append(None if rt is None else str(rt))
        prompt["icl_mode"].append(bool(d.get("icl_mode", not xvec_only)))
        prompt["x_vector_only_mode"].append(xvec_only)
    if not prompt["ref_spk_embedding"]:
        raise ValueError("invalid voice file: empty items")
    return prompt


def normalize_voice_clone_prompt(prompt) -> Dict[str, Any]:
    """Accept every prompt form the reference's generate_voice_clone takes
    (qwen3_tts_model.py:470-487): the dict-of-lists layout, a single
    VoiceClonePromptItem-like object, or a list of them (dataclasses or
    plain dicts) — normalized to the dict-of-lists layout."""
    if isinstance(prompt, dict) and "ref_spk_embedding" in prompt:
        v = prompt["ref_spk_embedding"]
        if v is None or isinstance(v, (list, tuple)):
            return prompt  # already dict-of-lists
        return _items_to_prompt([prompt])  # single flat-dict item
    items = prompt if isinstance(prompt, (list, tuple)) else [prompt]

    def as_dict(it):
        if isinstance(it, dict):
            return it
        import dataclasses as _dc

        if _dc.is_dataclass(it):
            return _dc.asdict(it)
        return {k: getattr(it, k) for k in _FIELDS if hasattr(it, k)}

    return _items_to_prompt([as_dict(it) for it in items])


def _to_numpy(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def save_voice_clone_prompt(prompt: Dict[str, Any], path: str) -> str:
    """Persist a voice-clone prompt. ``.npz`` → numpy container; anything
    else → the reference's torch payload (cli/demo.py:514-521)."""
    items = _prompt_to_items(prompt)
    if path.endswith(".npz"):
        flat: Dict[str, np.ndarray] = {"n": np.int64(len(items))}
        for i, it in enumerate(items):
            if it["ref_code"] is not None:
                flat[f"ref_code_{i}"] = np.asarray(it["ref_code"], np.int32)
            flat[f"ref_spk_embedding_{i}"] = np.asarray(
                it["ref_spk_embedding"], np.float32
            )
            if it["ref_text"] is not None:
                flat[f"ref_text_{i}"] = np.str_(it["ref_text"])
            flat[f"icl_mode_{i}"] = np.bool_(it["icl_mode"])
            flat[f"x_vector_only_mode_{i}"] = np.bool_(
                it["x_vector_only_mode"]
            )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez(f, **flat)
        os.replace(tmp, path)
        return path
    import torch

    payload = {"items": [
        {**it,
         # .copy(): torch.from_numpy rejects read-only views (e.g. arrays
         # fresh off jax device_get) with a warning.
         "ref_code": None if it["ref_code"] is None
         else torch.from_numpy(np.array(it["ref_code"], copy=True)),
         "ref_spk_embedding": torch.from_numpy(
             np.array(it["ref_spk_embedding"], copy=True)
         )}
        for it in items
    ]}
    tmp = path + ".tmp"
    torch.save(payload, tmp)
    os.replace(tmp, path)
    return path


def load_voice_clone_prompt(path: str) -> Dict[str, Any]:
    """Load a voice file written by :func:`save_voice_clone_prompt` or by the
    reference demo (torch payload, cli/demo.py:526-583) → prompt dict usable
    with ``generate_voice_clone``."""
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as z:
            n = int(z["n"])
            items = []
            for i in range(n):
                items.append({
                    "ref_code": z[f"ref_code_{i}"]
                    if f"ref_code_{i}" in z else None,
                    "ref_spk_embedding": z[f"ref_spk_embedding_{i}"],
                    "ref_text": str(z[f"ref_text_{i}"])
                    if f"ref_text_{i}" in z else None,
                    "icl_mode": bool(z[f"icl_mode_{i}"]),
                    "x_vector_only_mode": bool(
                        z[f"x_vector_only_mode_{i}"]
                    ),
                })
            return _items_to_prompt(items)
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(payload, dict) or "items" not in payload:
        raise ValueError(
            "invalid voice file: expected a dict with an 'items' key "
            "(reference cli/demo.py:536-538 schema)"
        )
    items = payload["items"]
    if not isinstance(items, list):
        raise ValueError("invalid voice file: 'items' is not a list")
    return _items_to_prompt(items)
