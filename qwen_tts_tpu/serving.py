"""Batched serving engine (BASELINE config #5).

Window-batching scheduler over the jitted decode loop: requests queue up, a
worker groups them (up to ``max_batch``, waiting at most ``max_wait_ms``),
runs one batched generation program, and resolves each request's future with
its trimmed waveform. Weight reads amortize across the whole batch — the
decisive factor for aggregate RTF on TPU since decode is HBM-bandwidth-bound.

Left-padded batching, per-slot EOS masking and per-row trims follow the
reference's batch path (modeling_qwen3_tts.py:2239-2291).

A window runs with ONE GenerationParams set (static under jit), so the
scheduler groups the queue by identical params — no request ever runs under
another request's settings. For per-request controls inside a single program
use the continuous-batching engine (qwen_tts_tpu/continuous.py), which makes
every sampling knob per-row via VecSampling.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import CancelledError, Future
from typing import Dict, List, Optional

import numpy as np

from qwen_tts_tpu.generate import GenerationParams, Prompt, build_prompt
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@dataclasses.dataclass
class TTSRequest:
    prompt: Prompt
    params: GenerationParams
    future: "Future[np.ndarray]" = dataclasses.field(default_factory=Future)
    enqueued_at: float = dataclasses.field(default_factory=time.perf_counter)
    cancelled: bool = False
    # Voice clone (ICL): codec codes of the reference audio, prepended before
    # codec decode and cut from the waveform after — the reference's
    # ref-code prepend + proportional wav cut (qwen3_tts_model.py:612-631).
    ref_codes: Optional[np.ndarray] = None


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
        self._req_by_future: Dict[int, TTSRequest] = {}
        self._held: List[TTSRequest] = []  # params-incompatible, next window
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
        *,
        speaker_embed: Optional[np.ndarray] = None,
        ref_ids: Optional[np.ndarray] = None,
        ref_codes: Optional[np.ndarray] = None,
        instruct_ids: Optional[np.ndarray] = None,
        non_streaming: bool = False,
        **gen_kwargs,
    ) -> "Future[np.ndarray]":
        """Full prompt-schema surface: custom voice (speaker), voice design
        (instruct_ids), voice clone (speaker_embed x-vector, plus
        ref_ids/ref_codes for ICL mode)."""
        prompt = build_prompt(
            self.model.talker_params, self.model.cfg, ids,
            language=language, speaker=speaker,
            speaker_embed=speaker_embed, instruct_ids=instruct_ids,
            ref_ids=ref_ids, ref_codes=ref_codes,
            non_streaming=non_streaming,
            st_params=self.model.subtalker_params,
        )
        req_max_new = gen_kwargs.pop("max_new_tokens", None)
        if req_max_new is not None and req_max_new > self.max_new_tokens:
            # The window decodes under the engine's compiled ceiling; a
            # larger request budget would be silently truncated — reject at
            # submit (mirrors the prompt-length validation).
            raise ValueError(
                f"max_new_tokens={req_max_new} exceeds the engine ceiling "
                f"{self.max_new_tokens} (set ServingEngine(max_new_tokens=…) "
                "at construction)"
            )
        params = self.model._merge_params(
            max_new_tokens=req_max_new or self.max_new_tokens,
            **gen_kwargs,
        )
        rc = None
        if ref_codes is not None:
            # Same width contract as ContinuousBatchingEngine.submit_prompt:
            # generated codes have num_code_groups columns, so ICL context
            # must be sliced to match before the merge (a mismatch would
            # otherwise crash the worker thread with an opaque shape error).
            rc = np.asarray(ref_codes, np.int32)
            groups = self.model.cfg.talker.num_code_groups
            if rc.shape[1] < groups:
                raise ValueError(
                    f"ref_codes have {rc.shape[1]} groups, talker emits "
                    f"{groups} — ICL clone serving needs equal widths"
                )
            rc = rc[:, :groups]
        req = TTSRequest(prompt, params, ref_codes=rc)
        self._req_by_future[id(req.future)] = req
        self._queue.put(req)
        return req.future

    def cancel(self, future: "Future[np.ndarray]") -> bool:
        """Cancel a QUEUED request (resolves with CancelledError at window
        assembly). A window engine cannot interrupt a request already inside
        a compiled batch program — for mid-decode cancellation use the
        continuous engine, whose slots reclaim at segment boundaries."""
        req = self._req_by_future.get(id(future))
        if req is None or req.future.done():
            return False
        req.cancelled = True
        return True

    # -- worker ------------------------------------------------------------

    def _collect_batch(self) -> List[TTSRequest]:
        def drop_if_cancelled(req):
            if req is not None and req.cancelled:
                self._req_by_future.pop(id(req.future), None)
                if not req.future.done():
                    req.future.set_exception(CancelledError())
                return True
            return False

        first = None
        while first is None:
            first = self._queue.get() if not self._held else self._held.pop(0)
            if first is None:
                return []
            if drop_if_cancelled(first):
                first = None
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            if self._held:
                req = None
                for i, h in enumerate(self._held):
                    if self._window_key(h.params) == self._window_key(
                            first.params):
                        req = self._held.pop(i)
                        break
                if req is None:
                    break  # only incompatible requests held — run what we have
                if drop_if_cancelled(req):
                    continue
                batch.append(req)
                continue
            timeout = deadline - time.perf_counter()
            if timeout <= 0:
                break
            try:
                req = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if req is None:
                break
            if drop_if_cancelled(req):
                continue
            if self._window_key(req.params) == self._window_key(first.params):
                batch.append(req)
            else:
                # Different GenerationParams can't share a window (params are
                # static under jit); hold it for the next window instead of
                # silently running it under this window's settings.
                self._held.append(req)
        return batch

    @staticmethod
    def _window_key(params):
        """Window compatibility: sampling controls are static under jit, but
        max_new_tokens is served DYNAMICALLY (per-row step_limit under one
        ceiling-compiled program), so requests differing only in budget
        share a window."""
        import dataclasses

        return dataclasses.replace(params, max_new_tokens=0)

    def _run(self):
        while self._running:
            batch = self._collect_batch()
            if not batch:
                continue
            try:
                # _collect_batch guarantees the window shares one SAMPLING
                # params set; budgets vary per request. Shape hygiene: every
                # unique decode-loop shape is a minutes-long XLA compile on
                # TPU, so the window decodes at the engine's fixed budget
                # ceiling with per-row dynamic step_limit, pads the batch to
                # a power of two, and buckets the trailing-text axis.
                import dataclasses as _dc

                ceiling = self.max_new_tokens
                params = _dc.replace(batch[0].params, max_new_tokens=ceiling)
                limits = [min(r.params.max_new_tokens, ceiling)
                          for r in batch]
                pad_to = 1 << (len(batch) - 1).bit_length()
                codes, _info = self.model.generate_codes_from_prompts(
                    [r.prompt for r in batch], params,
                    step_limit=limits, max_new_ceiling=ceiling,
                    pad_batch_to=min(pad_to, self.max_batch),
                    trailing_bucket=16,
                )
                # ICL voice clone: ref codes join the codec decode as leading
                # context, their audio is cut (qwen3_tts_model.py:612-631).
                merged, cut = [], []
                for req, c in zip(batch, codes):
                    if req.ref_codes is not None:
                        merged.append(np.concatenate([req.ref_codes, c],
                                                     axis=0))
                        cut.append(req.ref_codes.shape[0])
                    else:
                        merged.append(c)
                        cut.append(0)
                # Bucketed codec shape — one compiled program family under
                # heterogeneous request lengths (see decode_codes docstring).
                wavs = self.model.decode_codes(merged, bucket=32)
                up = self.model.cfg.codec.decode_upsample_rate
                for req, wav, k in zip(batch, wavs, cut):
                    self._req_by_future.pop(id(req.future), None)
                    req.future.set_result(wav[k * up:])
                self.stats["requests"] += len(batch)
                self.stats["batches"] += 1
                self.stats["frames"] += sum(c.shape[0] for c in codes)
            except Exception as exc:  # resolve futures rather than wedging
                for req in batch:
                    self._req_by_future.pop(id(req.future), None)
                    if not req.future.done():
                        req.future.set_exception(exc)
