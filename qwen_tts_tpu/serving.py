"""Batched serving engine (BASELINE config #5).

Window-batching scheduler over the jitted decode loop: requests queue up, a
worker groups them (up to ``max_batch``, waiting at most ``max_wait_ms``),
runs one batched generation program, and resolves each request's future with
its trimmed waveform. Weight reads amortize across the whole batch — the
decisive factor for aggregate RTF on TPU since decode is HBM-bandwidth-bound.

Left-padded batching, per-slot EOS masking and per-row trims follow the
reference's batch path (modeling_qwen3_tts.py:2239-2291).

Roadmap note: per-slot continuous batching (admitting new requests into live
decode slots) needs per-row step/offset bookkeeping in the decode state and is
planned for a later round; the window scheduler below already achieves the
weight-amortization win.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

from qwen_tts_tpu.generate import GenerationParams, Prompt, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@dataclasses.dataclass
class TTSRequest:
    prompt: Prompt
    params: GenerationParams
    future: "Future[np.ndarray]" = dataclasses.field(default_factory=Future)
    enqueued_at: float = dataclasses.field(default_factory=time.perf_counter)


class ServingEngine:
    def __init__(
        self,
        model: Qwen3TTSModel,
        *,
        max_batch: int = 8,
        max_wait_ms: float = 30.0,
        max_new_tokens: int = 512,
    ):
        self.model = model
        self.max_batch = max_batch
        self.max_wait_ms = max_wait_ms
        self.max_new_tokens = max_new_tokens
        self._queue: "queue.Queue[Optional[TTSRequest]]" = queue.Queue()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._running = False
        self.stats = {"requests": 0, "batches": 0, "frames": 0}

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "ServingEngine":
        self._running = True
        self._worker.start()
        return self

    def stop(self):
        self._running = False
        self._queue.put(None)
        self._worker.join(timeout=30)

    # -- API ---------------------------------------------------------------

    def submit_text(
        self,
        text: str,
        speaker: Optional[str] = None,
        language: str = "auto",
        **gen_kwargs,
    ) -> "Future[np.ndarray]":
        ids = self.model._tokenize(self.model.build_assistant_text(text))
        return self.submit_ids(ids, speaker=speaker, language=language,
                               **gen_kwargs)

    def submit_ids(
        self,
        ids: np.ndarray,
        speaker: Optional[str] = None,
        language: str = "auto",
        **gen_kwargs,
    ) -> "Future[np.ndarray]":
        prompt = build_prompt(
            self.model.talker_params, self.model.cfg, ids,
            language=language, speaker=speaker,
            st_params=self.model.subtalker_params,
        )
        params = self.model._merge_params(
            max_new_tokens=gen_kwargs.pop("max_new_tokens", None)
            or self.max_new_tokens,
            **gen_kwargs,
        )
        req = TTSRequest(prompt, params)
        self._queue.put(req)
        return req.future

    # -- worker ------------------------------------------------------------

    def _collect_batch(self) -> List[TTSRequest]:
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                break
            batch.append(req)
        return batch

    def _run(self):
        while self._running:
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                # All requests in a window share one GenerationParams set
                # (static under jit): take the first request's.
                params = batch[0].params
                codes, _info = self.model.generate_codes_from_prompts(
                    [r.prompt for r in batch], params
                )
                wavs = self.model.decode_codes(codes)
                for req, wav in zip(batch, wavs):
                    req.future.set_result(wav)
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                self.stats["frames"] += sum(c.shape[0] for c in codes)
            except Exception as exc:  # resolve futures rather than wedging
                for req in batch:
                    if not req.future.done():
                        req.future.set_exception(exc)
