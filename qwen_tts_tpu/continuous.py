"""Per-slot continuous batching: requests join and leave live decode slots.

The decode state is fully per-row (generate.py DecodeState: per-row frame
counters, cache positions, EOS and frame budgets), so one compiled segment
program serves slots at arbitrary depths. The engine:

* prefills an incoming request as a batch-of-1 program (fixed prefill bucket),
* scatters its row into a free slot of the batched state (one jitted insert —
  caches splice on the batch axis, per-row bookkeeping overwrites the slot),
* repeatedly runs fixed-size decode segments over all slots,
* drains finished slots (EOS or per-slot budget) to the codec and resolves
  futures, freeing the slot for the next queued request.

Compared to the window scheduler in serving.py, requests no longer wait for a
whole batch generation to finish — admission latency is one segment
(~segment_frames × per-frame time), and weight reads amortize over whatever
mix of slots is live.
"""

from __future__ import annotations

import dataclasses
import os
import queue
import threading
import time
from concurrent.futures import CancelledError, Future
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from qwen_tts_tpu.generate import (
    DecodeState,
    GenerationParams,
    Prompt,
    batch_prompts,
    build_prompt,
    decode_segment,
    init_decode,
)
from qwen_tts_tpu.ops.sampling import SamplingConfig
from qwen_tts_tpu.ops.sampling_vec import VecSampling
from qwen_tts_tpu.pipeline import Qwen3TTSModel


@partial(jax.jit, donate_argnames=("state", "trailing", "limits",
                                   "vec", "st_vec"))
def _insert_slot(
    state: DecodeState,
    trailing: jnp.ndarray,     # [B, T_cap, D]
    limits: jnp.ndarray,       # [B]
    vec: VecSampling,          # per-row talker sampling controls [B]
    st_vec: VecSampling,       # per-row sub-talker sampling controls [B]
    slot: jnp.ndarray,         # scalar int32
    sub: DecodeState,          # batch-of-1 state fresh from init_decode
    sub_trailing: jnp.ndarray, # [T_cap, D]
    sub_limit: jnp.ndarray,    # scalar int32
    sub_vec: VecSampling,      # batch-1 (VecSampling.host_row)
    sub_st_vec: VecSampling,   # batch-1
):
    def put(field, value):
        return field.at[slot].set(value)

    def splice_cache(pool, sub_c):
        # Works for both raw-array and int8-dict caches (leaf-wise splice).
        return jax.tree_util.tree_map(
            lambda p, s: p.at[:, slot].set(s[:, 0]), pool, sub_c
        )

    new_state = DecodeState(
        tick=state.tick,
        token=put(state.token, sub.token[0]),
        hidden=put(state.hidden, sub.hidden[0].astype(state.hidden.dtype)),
        k_cache=splice_cache(state.k_cache, sub.k_cache),
        v_cache=splice_cache(state.v_cache, sub.v_cache),
        presence=put(state.presence, sub.presence[0]),
        eos=put(state.eos, sub.eos[0]),
        num_gen=put(state.num_gen, sub.num_gen[0]),
        prefix_len=put(state.prefix_len, sub.prefix_len[0]),
        n_real=put(state.n_real, sub.n_real[0]),
        valid_from=put(state.valid_from, sub.valid_from[0]),
        rng=state.rng,
    )
    trailing = trailing.at[slot].set(sub_trailing.astype(trailing.dtype))
    limits = limits.at[slot].set(sub_limit)
    # Per-row sampling controls splice inside the SAME program — eager
    # .at[].set chains were ~12 extra device round trips per admission.
    vec = jax.tree_util.tree_map(lambda v, s: v.at[slot].set(s[0]),
                                 vec, sub_vec)
    st_vec = jax.tree_util.tree_map(lambda v, s: v.at[slot].set(s[0]),
                                    st_vec, sub_st_vec)
    return new_state, trailing, limits, vec, st_vec


@dataclasses.dataclass
class _SlotRequest:
    prompt: Prompt
    params: GenerationParams
    future: "Future[np.ndarray]" = dataclasses.field(default_factory=Future)
    # Optional per-request streaming: called with (wav_chunk, done) as the
    # slot's frames decode — merges low-latency streaming with continuous
    # batching (each slot streams independently).
    stream_callback: Optional[object] = None
    emitted_frames: int = 0
    # Voice clone (ICL): reference codec codes seed the slot's code history
    # as already-emitted context — they condition the codec decode (left
    # context) but their audio is never emitted, the continuous analog of
    # the reference's ref-code prepend + wav cut (qwen3_tts_model.py:612-631).
    ref_codes: Optional[np.ndarray] = None
    ref_frames: int = 0
    # Robustness: client-driven cancellation + per-request wall deadline.
    # A cancelled/expired slot is reclaimed at the next segment boundary
    # (its per-row frame budget is zeroed so the compiled program stops
    # spending device time on it) — a disconnect never holds a slot for its
    # full budget.
    cancelled: bool = False
    deadline: Optional[float] = None


class ContinuousBatchingEngine:
    """Continuous-batching TTS serving engine over a fixed slot pool."""

    def __init__(
        self,
        model: Qwen3TTSModel,
        *,
        num_slots: int = 8,
        segment_frames: int = 25,
        max_new_tokens: int = 512,
        prefill_bucket=64,
        trailing_cap: int = 256,
        stream_context_frames: int = 25,
        sync_dispatch: Optional[bool] = None,
    ):
        self.model = model
        # Double-buffered segment dispatch (default) overlaps segment K's
        # ~25 ms host fetch with segment K+1's device compute, at the cost
        # of one segment of admission/finish lag. Measured NEUTRAL on the
        # round-5 soaks (steady wall 14.92/15.72 s vs the r3 synchronous
        # 13.5-14.05 s — inside the tunnel's intra-day drift, but 2/2 on
        # the slow side), so the synchronous mode stays selectable for
        # operator A/B: sync_dispatch=True or QTTS_ENGINE_SYNC_DISPATCH=1
        # processes each segment immediately after dispatch (the pre-r4
        # loop). Byte-identical output either way — only the host fetch
        # order moves.
        if sync_dispatch is None:
            sync_dispatch = os.environ.get(
                "QTTS_ENGINE_SYNC_DISPATCH", "") in ("1", "true")
        self.sync_dispatch = bool(sync_dispatch)
        self.num_slots = num_slots
        self.segment_frames = segment_frames
        self.max_new_tokens = max_new_tokens
        # One or several prefill buckets (e.g. (64, 256)): each admit pads
        # the prompt to the smallest fitting bucket, so short custom-voice
        # prompts don't pay a long-ICL bucket's prefill FLOPs while long
        # clone prompts still fit. Compile cost is bounded: one prefill
        # program per bucket; the slot-pool KV cache is sized by the
        # largest. Back-compat: a plain int keeps the old single-bucket
        # behavior.
        buckets = ((prefill_bucket,) if isinstance(prefill_bucket, int)
                   else tuple(prefill_bucket))
        self.prefill_buckets = tuple(sorted(set(int(b) for b in buckets)))
        self.prefill_bucket = self.prefill_buckets[-1]
        self.trailing_cap = trailing_cap
        self.stream_context_frames = stream_context_frames
        self.stats = {"requests": 0, "segments": 0, "frames": 0,
                      # In-flight segment results whose slot was freed (and
                      # possibly re-admitted) before processing — dropped by
                      # the identity check in _process_segment.
                      "stale_skips": 0,
                      "bucket_admits": {b: 0 for b in self.prefill_buckets},
                      # Cumulative wall per loop phase (seconds) — the
                      # serving-cost breakdown (admit = init_decode +
                      # slot insertion; segment = dispatch + batched fetch;
                      # finish = codec decode + future resolution).
                      "time_admit_s": 0.0, "time_segment_s": 0.0,
                      "time_finish_s": 0.0, "time_emit_s": 0.0}
        # Host shadows of per-slot num_gen and frame limits (each saves a
        # blocking ~25 ms device round trip per segment; see _run). _limits
        # only changes at _admit/_abort, so the shadow is exact.
        self._host_gen = np.zeros((num_slots,), np.int32)
        self._host_limits = np.zeros((num_slots,), np.int32)

        cfg = model.cfg.talker
        dtype = model.talker_params["norm"].dtype
        b = num_slots
        s_max = self.prefill_bucket + max_new_tokens
        from qwen_tts_tpu.models.talker import alloc_kv_cache

        kc, vc = alloc_kv_cache(cfg, b, s_max, dtype,
                                kv_int8=getattr(model, "kv_int8", False))
        self._state = DecodeState(
            tick=jnp.int32(0),
            token=jnp.zeros((b,), jnp.int32),
            hidden=jnp.zeros((b, cfg.hidden_size), dtype),
            k_cache=kc,
            v_cache=vc,
            presence=jnp.zeros((b, cfg.vocab_size), bool),
            eos=jnp.ones((b,), bool),            # all slots start idle
            num_gen=jnp.zeros((b,), jnp.int32),
            prefix_len=jnp.full((b,), self.prefill_bucket, jnp.int32),
            n_real=jnp.full((b,), self.prefill_bucket, jnp.int32),
            valid_from=jnp.zeros((b,), jnp.int32),
            rng=jax.random.PRNGKey(0),
        )
        self._trailing = jnp.zeros((b, trailing_cap, cfg.hidden_size), dtype)
        self._limits = jnp.zeros((b,), jnp.int32)
        self._slot_req: Dict[int, _SlotRequest] = {}
        self._slot_codes: Dict[int, List[np.ndarray]] = {}
        # Every sampling control — talker AND sub-talker — is per-row
        # (VecSampling arrays riding the compiled program), so heterogeneous
        # requests share one program with their own knobs from token 0.
        self._vec = VecSampling.broadcast(SamplingConfig(), b)
        self._st_vec = VecSampling.broadcast(SamplingConfig(), b)
        # Static configs are shape-only placeholders when vecs are present.
        self._static_sampling = (SamplingConfig(), SamplingConfig())

        self._queue: "queue.Queue[Optional[_SlotRequest]]" = queue.Queue()
        self._req_by_future: Dict[int, _SlotRequest] = {}
        # Double-buffered segment dispatch (see _run): the segment whose
        # results have been dispatched but not yet fetched/bookkept.
        self._inflight = None
        self._running = False
        self._worker = threading.Thread(target=self._run, daemon=True)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "ContinuousBatchingEngine":
        self._running = True
        self._worker.start()
        return self

    def stop(self):
        self._running = False
        self._queue.put(None)
        self._worker.join(timeout=60)

    # -- API ---------------------------------------------------------------

    def submit_prompt(self, prompt: Prompt, params: GenerationParams,
                      stream_callback=None,
                      ref_codes=None,
                      timeout_s: Optional[float] = None
                      ) -> "Future[np.ndarray]":
        if prompt.embeds.shape[0] > self.prefill_bucket:
            raise ValueError(
                f"prompt length {prompt.embeds.shape[0]} exceeds the engine's "
                f"prefill bucket {self.prefill_bucket}"
            )
        if prompt.trailing_text.shape[0] + 1 > self.trailing_cap:
            raise ValueError("trailing text exceeds trailing_cap")
        req = _SlotRequest(prompt, params, stream_callback=stream_callback)
        if timeout_s is not None:
            req.deadline = time.monotonic() + timeout_s
        if ref_codes is not None:
            rc = np.asarray(ref_codes, np.int32)
            groups = self.model.cfg.talker.num_code_groups
            if rc.shape[1] < groups:
                raise ValueError(
                    f"ref_codes have {rc.shape[1]} groups, talker emits "
                    f"{groups} — ICL clone serving needs equal widths"
                )
            req.ref_codes = rc[:, :groups]
            req.ref_frames = rc.shape[0]
        self._req_by_future[id(req.future)] = req
        self._queue.put(req)
        return req.future

    def cancel(self, future: "Future[np.ndarray]") -> bool:
        """Cancel a submitted request (queued or mid-decode). The slot is
        reclaimed at the next segment boundary and the future resolves with
        CancelledError. Returns False for unknown/finished futures."""
        req = self._req_by_future.get(id(future))
        if req is None or req.future.done():
            return False
        req.cancelled = True
        return True

    def submit_text(self, text: str, speaker=None, language="auto",
                    **gen_kwargs) -> "Future[np.ndarray]":
        ids = self.model._tokenize(self.model.build_assistant_text(text))
        return self.submit_ids(ids, speaker=speaker, language=language,
                               **gen_kwargs)

    def submit_ids(self, ids, speaker=None, language="auto", *,
                   speaker_embed=None, ref_ids=None, ref_codes=None,
                   instruct_ids=None, non_streaming=False,
                   stream_callback=None, timeout_s=None, **gen_kwargs
                   ) -> "Future[np.ndarray]":
        """Full prompt-schema surface (custom voice / voice design /
        voice clone incl. ICL) — mirrors ServingEngine.submit_ids."""
        prompt = build_prompt(
            self.model.talker_params, self.model.cfg, np.asarray(ids, np.int32),
            language=language, speaker=speaker,
            speaker_embed=speaker_embed, instruct_ids=instruct_ids,
            ref_ids=ref_ids, ref_codes=ref_codes,
            non_streaming=non_streaming,
            st_params=self.model.subtalker_params,
        )
        req_max_new = gen_kwargs.pop("max_new_tokens", None)
        if req_max_new is not None and req_max_new > self.max_new_tokens:
            # Same contract as ServingEngine.submit_ids: reject rather than
            # silently truncate to the engine's compiled frame-budget ceiling.
            raise ValueError(
                f"max_new_tokens={req_max_new} exceeds the engine ceiling "
                f"{self.max_new_tokens} (set ContinuousBatchingEngine("
                "max_new_tokens=…) at construction)"
            )
        params = self.model._merge_params(
            max_new_tokens=req_max_new or self.max_new_tokens,
            **gen_kwargs,
        )
        return self.submit_prompt(prompt, params,
                                  stream_callback=stream_callback,
                                  ref_codes=ref_codes, timeout_s=timeout_s)

    # -- internals ---------------------------------------------------------

    def _admit(self, slot: int, req: _SlotRequest) -> None:
        params = req.params
        # Smallest bucket the prompt fits (submit_prompt validated the max).
        plen = req.prompt.embeds.shape[0]
        bucket = next(b for b in self.prefill_buckets if plen <= b)
        self.stats["bucket_admits"][bucket] += 1
        embeds, mask, trailing, _ = batch_prompts(
            [req.prompt], bucket=bucket
        )
        dtype = self.model.talker_params["norm"].dtype
        sub = init_decode(
            self.model.talker_params, self.model.subtalker_params,
            self.model.cfg.talker,
            jnp.asarray(embeds, dtype), jnp.asarray(mask),
            sampling=self._static_sampling[0],
            # Token 0 honors the request's OWN controls (do_sample /
            # min_new_tokens / penalty), not an engine-wide pin.
            vec_sampling=VecSampling.broadcast(params.talker_sampling(), 1),
            max_cache_len=self.prefill_bucket + self.max_new_tokens,
            rng=jax.random.fold_in(jax.random.PRNGKey(params.seed),
                                   self.stats["requests"]),
            kv_int8=getattr(self.model, "kv_int8", False),
        )
        # Fixed-shape trailing row (pad with the prompt's tts_pad embed, which
        # is what the trailing buffer's overflow rows must hold).
        d = trailing.shape[-1]
        row = np.empty((self.trailing_cap, d), np.float32)
        n = min(trailing.shape[1], self.trailing_cap)
        row[:n] = trailing[0, :n]
        row[n:] = req.prompt.tts_pad_embed
        limit = min(params.max_new_tokens, self.max_new_tokens)
        (self._state, self._trailing, self._limits,
         self._vec, self._st_vec) = _insert_slot(
            self._state, self._trailing, self._limits,
            self._vec, self._st_vec,
            jnp.int32(slot), sub, jnp.asarray(row), jnp.int32(limit),
            VecSampling.host_row(params.talker_sampling()),
            VecSampling.host_row(params.subtalker_sampling()),
        )
        self._slot_req[slot] = req
        self._host_gen[slot] = 0  # fresh init_decode: no frames generated yet
        self._host_limits[slot] = limit
        # ICL clone: ref codes enter the history as already-emitted frames —
        # codec left context only, audio never emitted (see _SlotRequest).
        self._slot_codes[slot] = (
            [req.ref_codes] if req.ref_codes is not None else []
        )
        req.emitted_frames = req.ref_frames
        self.stats["requests"] += 1

    def _stream_emit(self, req: "_SlotRequest", codes, done: bool) -> None:
        """Incrementally decode + emit a slot's fresh frames (the pipeline's
        chunked-decode pattern: re-decode a left context, discard it).

        Operates on captured (req, codes) — the caller may defer this past
        the NEXT segment dispatch so the codec work overlaps device compute,
        by which time the slot's dict entries may already be reassigned."""
        total = sum(c.shape[0] for c in codes)
        fresh = total - req.emitted_frames
        if fresh <= 0:
            if done:
                req.stream_callback(
                    np.zeros((0,), np.float32), True
                )
            return
        dec_cfg = self.model.cfg.codec.decoder
        nq = dec_cfg.num_quantizers
        up = self.model.cfg.codec.decode_upsample_rate
        merged = np.concatenate(codes, axis=0)[:, :nq]
        ctx = min(self.stream_context_frames, req.emitted_frames)
        # Fixed-shape window (right-padded): the codec is causal, so pad
        # frames never affect the emitted region — ONE compiled codec shape
        # for the whole serving lifetime instead of one per chunk length.
        window_len = self.stream_context_frames + self.segment_frames
        window = np.zeros((1, window_len, nq), np.int32)
        window[0, : ctx + fresh] = merged[req.emitted_frames - ctx :]
        wav = np.asarray(self.model._codec_decode_jit(
            self.model.codec_params, dec_cfg, jnp.asarray(window)
        ))[0, ctx * up : (ctx + fresh) * up]
        req.emitted_frames = total
        req.stream_callback(wav, done)

    def _abort(self, slot: int, exc: Exception) -> None:
        """Reclaim a cancelled/expired slot: zero its frame budget (the
        compiled segment program stops spending device time on the row) and
        resolve its future with ``exc``. Other slots are untouched."""
        req = self._slot_req.pop(slot)
        self._slot_codes.pop(slot, None)
        self._limits = self._limits.at[slot].set(0)
        self._host_limits[slot] = 0
        self._req_by_future.pop(id(req.future), None)
        if req.stream_callback is not None:
            try:
                req.stream_callback(np.zeros((0,), np.float32), True)
            except Exception:
                pass
        if not req.future.done():
            req.future.set_exception(exc)

    def _finish_one(self, req: "_SlotRequest", codes) -> None:
        """Resolve one finished request from captured (req, codes) — slot
        dict entries were already popped at bookkeeping time, so this may
        run after the slot has been re-admitted. Non-streaming wavs decode
        per request at batch 1 with a BUCKETED length: the smallest possible
        compiled-shape set ({1} x length buckets). A batched variant
        (pow2-padded batch) was measured WORSE on the axon tunnel — each
        extra shape family is a fresh device program whose first load can
        cost minutes under the tunnel's load degradation, dwarfing the
        ~25 ms/dispatch it saves (soak_tpu.json history)."""
        if req.stream_callback is not None:
            if not req.future.done():
                req.future.set_result(np.zeros((0,), np.float32))
            return
        g = self.model.cfg.talker.num_code_groups
        try:
            merged = (np.concatenate(codes, axis=0) if codes
                      else np.zeros((0, g), np.int32))
            wav = self.model.decode_codes(
                [merged], bucket=max(32, self.segment_frames)
            )[0]
            up = self.model.cfg.codec.decode_upsample_rate
            req.future.set_result(wav[req.ref_frames * up:])
        except Exception as exc:
            if not req.future.done():
                req.future.set_exception(exc)

    def _resolve_pending(self, work) -> None:
        """Run a slot's emit/finish work items (captured req + codes), with
        per-phase timing and per-item exception isolation."""
        for kind, req, codes, done in work:
            try:
                if kind == "emit":
                    if req.future.done():
                        continue  # cancelled/aborted since capture
                    t0 = time.perf_counter()
                    self._stream_emit(req, codes, done)
                    self.stats["time_emit_s"] += time.perf_counter() - t0
                else:
                    t0 = time.perf_counter()
                    self._finish_one(req, codes)
                    self.stats["time_finish_s"] += time.perf_counter() - t0
            except Exception as exc:
                if not req.future.done():
                    req.future.set_exception(exc)

    def _run(self):
        try:
            self._run_loop()
        finally:
            # Shutdown drain — runs on EVERY exit path (stop() racing an
            # active decode clears _running before the sentinel is read, so
            # the loop can exit with a segment still in flight): fetch it
            # so slots that finished in it resolve normally, then fail
            # whatever is still unresolved instead of leaving clients
            # blocked on futures that no thread will ever complete.
            try:
                if self._inflight is not None:
                    self._process_segment(self._inflight)
                    self._inflight = None
            except Exception:
                pass
            for slot in list(self._slot_req):
                try:
                    self._abort(slot, CancelledError("engine stopped"))
                except Exception:
                    pass
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is None:
                    continue
                self._req_by_future.pop(id(req.future), None)
                if not req.future.done():
                    req.future.set_exception(CancelledError("engine stopped"))

    def _run_loop(self):
        while self._running:
            # Admit queued requests into free slots.
            free = [i for i in range(self.num_slots) if i not in self._slot_req]
            # Fully idle (and nothing dispatched-but-unprocessed) → wait.
            block = len(free) == self.num_slots and self._inflight is None
            while free:
                try:
                    req = self._queue.get(block=block, timeout=1.0 if block else 0)
                except queue.Empty:
                    break
                if req is None:
                    return  # the _run finally-drain fetches any in-flight
                block = False
                if req.cancelled:
                    self._req_by_future.pop(id(req.future), None)
                    if not req.future.done():
                        req.future.set_exception(CancelledError())
                    continue
                try:
                    t0 = time.perf_counter()
                    self._admit(free.pop(0), req)
                    self.stats["time_admit_s"] += time.perf_counter() - t0
                except Exception as exc:
                    # Poisoned request: resolve its future, keep serving.
                    self._req_by_future.pop(id(req.future), None)
                    if not req.future.done():
                        req.future.set_exception(exc)
            # Reap cancelled/expired slots BEFORE spending a segment on them.
            now = time.monotonic()
            for slot, req in list(self._slot_req.items()):
                if req.cancelled:
                    self._abort(slot, CancelledError())
                elif req.deadline is not None and now > req.deadline:
                    self._abort(slot, TimeoutError(
                        "request exceeded its deadline (timeout_s) after "
                        f"{sum(c.shape[0] for c in self._slot_codes.get(slot, []))}"
                        " generated frames"))
            if not self._slot_req and self._inflight is None:
                continue

            # DOUBLE-BUFFERED dispatch: queue the NEXT segment before
            # fetching the in-flight one's results, so the blocking ~25 ms
            # device_get round trip of segment K overlaps segment K+1's
            # device compute instead of idling the chip (docs/SERVING.md).
            # Costs one segment of admission/finish lag (a slot that hit
            # EOS in the unprocessed segment still rides the next one,
            # eos-frozen). Greedy rows stay byte-equal: the device-op
            # sequence is unchanged — only the host fetch order moves.
            # Distinct from the measured emit/finish-deferral dead end
            # (commit 8aa078b), which moved DEVICE codec work a segment
            # later; here only a host fetch is deferred.
            dispatched = None
            if self._slot_req:
                t_seg = time.perf_counter()
                # with_report: fetching this segment's num_gen/eos happens
                # AFTER the next dispatch donates self._state, so the
                # snapshot must hold the report's donation-surviving
                # (bias-encoded) copies, not state fields (which would be
                # deleted/reused buffers by then).
                self._state, seg_codes, report = decode_segment(
                    self.model.talker_params, self.model.subtalker_params,
                    self.model.cfg.talker, self._state, self._trailing,
                    sampling=self._static_sampling[0],
                    st_sampling=self._static_sampling[1],
                    segment=self.segment_frames, step_limit=self._limits,
                    vec_sampling=self._vec, st_vec_sampling=self._st_vec,
                    with_report=True,
                )
                # Participant snapshot BY IDENTITY: when this segment's
                # results are processed (next iteration), a slot may have
                # been freed and re-admitted — the identity check skips
                # frames that belong to a previous occupant.
                dispatched = (dict(self._slot_req), report[0], report[1],
                              seg_codes)
                self.stats["time_segment_s"] += time.perf_counter() - t_seg
                self.stats["segments"] += 1
            if self.sync_dispatch and dispatched is not None:
                # Operator A/B mode: fetch this segment's results NOW (the
                # pre-double-buffering loop; no admission/finish lag).
                t_seg = time.perf_counter()
                self._process_segment(dispatched)
                self.stats["time_segment_s"] += time.perf_counter() - t_seg
                dispatched = None
            if self._inflight is not None:
                t_seg = time.perf_counter()
                self._process_segment(self._inflight)
                self.stats["time_segment_s"] += time.perf_counter() - t_seg
            self._inflight = dispatched

    def _process_segment(self, inflight) -> None:
        """Fetch + bookkeep one dispatched segment's results (the fetch is
        ONE batched device_get: every separate blocking fetch costs a full
        ~25 ms round trip over the axon tunnel, and this used to make 4)."""
        participants, ng_biased_dev, eos_inv_dev, seg_dev = inflight
        ng_biased, eos_inv, seg = jax.device_get(
            (ng_biased_dev, eos_inv_dev, seg_dev))
        new_gen, eos = ng_biased - 1, ~eos_inv  # undo the report encoding
        limits = self._host_limits
        for slot, req in participants.items():
            if self._slot_req.get(slot) is not req:
                # Aborted, finished, or slot re-admitted since dispatch:
                # these frames belong to a previous occupant (eos-frozen
                # rows ride one extra segment under double-buffering) —
                # appending them would corrupt the new occupant's stream.
                self.stats["stale_skips"] += 1
                continue
            # _host_gen is a host shadow: zeroed at _admit, advanced here —
            # exactly mirroring the device ops, so fresh counts stay exact
            # under the one-segment processing lag.
            fresh = int(new_gen[slot]) - int(self._host_gen[slot])
            self._host_gen[slot] = int(new_gen[slot])
            done = bool(eos[slot]) or int(new_gen[slot]) >= int(limits[slot])
            if done and not bool(eos[slot]) and fresh > 0:
                # Budget-exhausted slots drop their final frame (the
                # reference never expands the last cb0 token's groups,
                # modeling_qwen3_tts.py:2280-2291) — keeps continuous ==
                # one-shot generate_codes.
                fresh -= 1
            if fresh > 0:
                self._slot_codes[slot].append(seg[slot, :fresh])
                self.stats["frames"] += fresh
            # NOTE (measured dead end): deferring this emit/finish codec
            # work past the NEXT segment's dispatch does NOT overlap it —
            # the codec decode is DEVICE work serialized behind the next
            # segment on the single TensorCore, so only trivial host time
            # hides (soak steady 13.7→17.8 s incl. tunnel noise).
            # Resolve inline.
            work = []
            if req.stream_callback is not None and (fresh > 0 or done):
                work.append(("emit", req, self._slot_codes[slot], done))
            if done:
                self._slot_req.pop(slot)
                codes = self._slot_codes.pop(slot)
                self._req_by_future.pop(id(req.future), None)
                work.append(("finish", req, codes, True))
            if work:
                self._resolve_pending(work)
