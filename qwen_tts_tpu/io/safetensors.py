"""Multi-shard SafeTensors reader: zero-copy mmap → numpy views.

TPU analogue of the reference's C reader (c/qwen_tts_safetensors.c): tensors
are exposed as numpy views over an ``mmap``'d file — no copy until the bytes
are shipped to HBM with ``jax.device_put`` (mirroring the BF16 zero-copy
policy, c/qwen_tts.c:362). Shard discovery follows the same rules
(``model.safetensors.index.json`` when present, else a sorted directory scan —
c/qwen_tts_safetensors.c:293-363).

A C++ fast path for header parsing lives in ``csrc/`` (see
qwen_tts_tpu.io.native); this module is the always-available pure-Python
implementation with identical semantics.
"""

from __future__ import annotations

import json
import mmap
import os
import struct
from typing import Dict, Iterable, List, Mapping, Tuple

import ml_dtypes
import numpy as np

_DTYPES: Mapping[str, np.dtype] = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "BF16": np.dtype(ml_dtypes.bfloat16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


class SafeTensorsFile:
    """One mmap'd .safetensors file."""

    def __init__(self, path: str):
        self.path = path
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        (header_len,) = struct.unpack("<Q", self._mm[:8])
        header = json.loads(self._mm[8 : 8 + header_len].decode("utf-8"))
        self._data_start = 8 + header_len
        self.tensors: Dict[str, dict] = {
            k: v for k, v in header.items() if k != "__metadata__"
        }
        self.metadata = header.get("__metadata__", {})
        self._buf = np.frombuffer(self._mm, dtype=np.uint8)

    def keys(self) -> Iterable[str]:
        return self.tensors.keys()

    def info(self, name: str) -> Tuple[str, Tuple[int, ...]]:
        t = self.tensors[name]
        return t["dtype"], tuple(t["shape"])

    def get(self, name: str) -> np.ndarray:
        """Zero-copy view into the mmap."""
        t = self.tensors[name]
        dtype = _DTYPES[t["dtype"]]
        begin, end = t["data_offsets"]
        raw = self._buf[self._data_start + begin : self._data_start + end]
        return raw.view(dtype).reshape(t["shape"])

    def close(self):
        """Release the mapping. If zero-copy views are still alive the mmap
        stays valid until they are garbage-collected (CPython keeps the
        exported buffer alive); we just drop our handle."""
        self._buf = None
        try:
            self._mm.close()
        except BufferError:
            pass
        self._file.close()


class MultiSafeTensors:
    """All shards in a directory, with name → shard resolution."""

    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        index_path = None
        for fname in sorted(os.listdir(model_dir)):
            if fname.endswith(".safetensors.index.json"):
                index_path = os.path.join(model_dir, fname)
                break
        shard_names: List[str]
        if index_path:
            with open(index_path, encoding="utf-8") as f:
                index = json.load(f)
            shard_names = sorted(set(index["weight_map"].values()))
        else:
            shard_names = sorted(
                f for f in os.listdir(model_dir) if f.endswith(".safetensors")
            )
        if not shard_names:
            raise FileNotFoundError(f"no .safetensors shards in {model_dir}")
        self.shards = [
            SafeTensorsFile(os.path.join(model_dir, s)) for s in shard_names
        ]
        self._index: Dict[str, SafeTensorsFile] = {}
        for shard in self.shards:
            for name in shard.keys():
                self._index[name] = shard

    def __contains__(self, name: str) -> bool:
        return name in self._index

    def keys(self) -> Iterable[str]:
        return self._index.keys()

    def info(self, name: str):
        return self._index[name].info(name)

    def get(self, name: str) -> np.ndarray:
        if name not in self._index:
            raise KeyError(f"tensor {name!r} not found in {self.model_dir}")
        return self._index[name].get(name)

    def get_f32(self, name: str) -> np.ndarray:
        return np.asarray(self.get(name), dtype=np.float32)

    def close(self):
        for s in self.shards:
            s.close()
