"""Continuous-batching serving engine over a slot-based KV cache.

The reference framework decodes one prompt at a time (an eager HF loop,
magma/sampling.py:43-121).  This engine is the TPU-native production
counterpart: a single resident (L, B, max_len, h, hd) KV cache on device
(bf16 or int8 — gptj.init_kv_cache), requests mapped to batch *slots*,
and two compiled programs that serve every request shape:

* ``prefill``: runs the prompt through the LM into a 1-row scratch cache,
  scatters that row into the engine cache at the assigned slot, and
  samples the first token.  Prompts are right-padded to a bucket multiple
  so one executable serves a whole bucket of lengths (padding is masked
  via ``kv_len``; the first token reads the last *true* position).
* ``decode``: one token step for ALL slots at once — per-row cache
  positions (``cache_index``/``cur_len`` are (B,) arrays), per-row EOS
  masking.  Finished/empty slots still ride along (their writes land
  behind their frozen ``cur_len`` and are overwritten by the next
  prefill), so the step shape never changes and nothing recompiles.

Scheduling is plain continuous batching: after every decode step the
host admits pending requests into free slots (prefill), appends the new
token of each active slot, and retires rows that hit EOS or their token
budget.  Only (B,) int32 tokens cross device->host per step — the logits
and the sampling stay on device (D2H of large buffers is pathologically
slow through tunneled TPU transports).

Long prompts can prefill incrementally (``prefill_chunk``): one chunk —
attending to the cache history plus itself — between decode windows, so
an arriving 2000-token prompt does not stall every other slot for its
whole prefill.  Remaining simplification vs. state-of-the-art engines:
the cache is dense per slot (no paging) — with B slots of ``max_len``
the int8 cache keeps 6B-scale serving well inside one v5e chip.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.models import gptj
from magma_tpu.ops.sampling import sample_token, strip_after_eos


@dataclasses.dataclass
class _Slot:
    req_id: int
    tokens: List[int]
    max_new_tokens: int


@dataclasses.dataclass
class _InflightPrefill:
    slot_id: int
    req_id: int
    embeds: object          # (1, s, D) full prompt
    s: int                  # true prompt length
    off: int                # tokens prefilled so far
    scratch: object         # 1-row scratch cache (chunk-multiple length)
    max_new: int


@dataclasses.dataclass
class FinishedRequest:
    req_id: int
    tokens: List[int]          # generated ids, EOS included if emitted
    finish_reason: str         # "eos" | "length"


@functools.partial(jax.jit, static_argnames=("cfg", "scratch_len"))
def _prefill_full(cfg, params, embeds, prompt_len, *, scratch_len):
    """Whole-prompt prefill into a fresh 1-row scratch cache.  Returns
    (scratch, hidden of the last true position); _install_slot scatters
    the scratch into the engine cache and samples the first token."""
    scratch = gptj.init_kv_cache(cfg, 1, scratch_len)
    hidden, scratch = gptj.forward(
        cfg, params, embeds, cache=scratch, cache_index=jnp.int32(0),
        kv_len=jnp.broadcast_to(prompt_len, (1,)), remat=False,
        return_hidden=True,
    )
    last_h = jax.lax.dynamic_slice_in_dim(hidden, prompt_len - 1, 1, axis=1)
    return scratch, last_h


@functools.partial(
    jax.jit, static_argnames=("cfg",),
    donate_argnames=("scratch",),
)
def _prefill_chunk(cfg, params, scratch, emb_chunk, offset, true_len):
    """One chunk of an incremental prefill into a 1-row scratch cache:
    the chunk attends to the already-written history [0, offset) AND
    causally to itself (gptj read_history).  Returns (scratch, hidden of
    the chunk's last true position)."""
    hidden, scratch = gptj.forward(
        cfg, params, emb_chunk, cache=scratch, cache_index=offset,
        kv_len=jnp.broadcast_to(true_len, (1,)), remat=False,
        return_hidden=True, read_history=True,
    )
    last_h = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
    return scratch, last_h


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "temperature", "top_k", "top_p", "top_p_mode"),
    donate_argnames=("cache",),
)
def _install_slot(cfg, params, cache, scratch, slot, last_h, rng, *,
                  temperature, top_k, top_p, top_p_mode):
    """Scatter a finished scratch prefill into the engine cache at
    ``slot`` and sample the request's first token.  The scratch may be
    longer than the engine cache (chunked prefill rounds its length up to
    a chunk multiple so a padded final chunk never writes out of range —
    dynamic_update_slice would silently clamp-and-corrupt)."""
    max_len = cache["k"].shape[2]
    cache = {
        name: jax.lax.dynamic_update_slice(
            cache[name], scratch[name][:, :, :max_len],
            (0, slot) + (0,) * (cache[name].ndim - 2),
        )
        for name in cache
    }
    logits = gptj.lm_head(cfg, params, last_h)[:, 0]
    tok = sample_token(
        rng, logits, temperature=temperature, top_k=top_k, top_p=top_p,
        vocab_size=cfg.vocab_size, top_p_mode=top_p_mode,
    )
    return cache, tok[0]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "temperature", "top_k", "top_p",
                     "top_p_mode", "eos_token"),
    donate_argnames=("cache",),   # in-place cache writes
)
def _decode(cfg, params, cache, last_toks, cur_lens, active, rng, *,
            n_steps, temperature, top_k, top_p, top_p_mode, eos_token):
    """``n_steps`` decode steps for every slot in one program.  Returns
    (cache, tokens (B, n_steps)).

    Running a window of steps per dispatch amortizes the host->device
    round trip (1-3 ms on tunneled transports) over n tokens.  The
    active mask is frozen for the window; rows that hit EOS inside it
    keep decoding into positions the host will discard — their slots get
    retired (and the cache rows overwritten by the next prefill) anyway.
    """

    def step(carry, i):
        cache, toks, lens = carry
        emb = gptj.embed_tokens(cfg, params, toks[:, None])
        hidden, cache = gptj.forward(
            cfg, params, emb, cache=cache, cache_index=lens, remat=False,
            return_hidden=True,
        )
        logits = gptj.lm_head(cfg, params, hidden)[:, 0]
        tok = sample_token(
            jax.random.fold_in(rng, i), logits, temperature=temperature,
            top_k=top_k, top_p=top_p, vocab_size=cfg.vocab_size,
            top_p_mode=top_p_mode,
        )
        tok = jnp.where(active, tok, jnp.int32(eos_token))
        return (cache, tok, lens + active.astype(jnp.int32)), tok

    (cache, _, _), toks = jax.lax.scan(
        step, (cache, last_toks, cur_lens), jnp.arange(n_steps)
    )
    return cache, toks.T  # (B, n_steps)


class LMServingEngine:
    """Continuous batching over ``max_batch`` KV-cache slots.

    Parameters mirror ``generate_tokens``; sampling settings are engine-
    wide (one compiled decode program).  ``kv_cache_dtype`` comes from
    ``cfg`` — pass a config with ``kv_cache_dtype="int8"`` to halve the
    resident cache.
    """

    def __init__(
        self,
        cfg,
        params,
        *,
        max_batch: int = 8,
        max_len: int = 2048,
        eos_token: int = 50256,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        top_p_mode: str = "reference",
        prefill_bucket: int = 64,
        decode_window: int = 4,
        prefill_chunk: int = 0,
        seed: int = 0,
    ):
        self.cfg = cfg
        self.params = params
        self.max_batch = max_batch
        self.max_len = max_len
        self.eos_token = eos_token
        self.sampling = dict(
            temperature=float(temperature), top_k=int(top_k),
            top_p=float(top_p), top_p_mode=top_p_mode,
        )
        self.prefill_bucket = prefill_bucket
        # tokens decoded per dispatch: amortizes host round trips; new
        # requests are admitted at window boundaries
        self.decode_window = max(1, int(decode_window))
        # >0: long prompts prefill incrementally, prefill_chunk tokens
        # between decode windows (gptj read_history attention) — a long
        # prompt no longer stalls every other slot for its whole prefill.
        # One chunked prefill is in flight at a time (bounds the scratch
        # cache to one extra row).
        self.prefill_chunk = int(prefill_chunk)
        self._inflight: Optional[_InflightPrefill] = None
        self._rng = jax.random.PRNGKey(seed)
        self._step_count = 0
        self._next_id = 0

        self.cache = gptj.init_kv_cache(cfg, max_batch, max_len)
        self.cur_lens = np.zeros(max_batch, np.int32)
        self.last_toks = np.full(max_batch, eos_token, np.int32)
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        self.pending = collections.deque()
        self.finished: Dict[int, FinishedRequest] = {}

    # ------------------------------------------------------------------
    def submit(self, embeds, max_new_tokens: int = 100) -> int:
        """Queue a request.  ``embeds``: (s, D) or (1, s, D) prompt
        embeddings.  Returns the request id."""
        embeds = jnp.asarray(embeds)
        if embeds.ndim == 2:
            embeds = embeds[None]
        if embeds.shape[1] > self.max_len:
            raise ValueError(
                f"prompt length {embeds.shape[1]} > max_len {self.max_len}"
            )
        if embeds.shape[1] == self.max_len and max_new_tokens > 1:
            # a full-cache prompt has no room for decode writes: it would
            # retire with reason "length" after only the prefill-sampled
            # token — surprise the caller with an error instead
            raise ValueError(
                f"prompt length equals max_len ({self.max_len}): at most 1 "
                f"token can be generated, but max_new_tokens="
                f"{max_new_tokens}; shorten the prompt or raise max_len"
            )
        req_id = self._next_id
        self._next_id += 1
        self.pending.append((req_id, embeds, int(max_new_tokens)))
        return req_id

    @property
    def has_work(self) -> bool:
        return (bool(self.pending) or self._inflight is not None
                or any(s is not None for s in self.slots))

    def _fold_rng(self):
        self._step_count += 1
        return jax.random.fold_in(self._rng, self._step_count)

    def _install(self, slot_id, req_id, s, scratch, last_h, max_new,
                 emitted):
        """Finish a prefill: scatter the scratch into the engine cache,
        record the first token, mark the slot live."""
        self.cache, tok = _install_slot(
            self.cfg, self.params, self.cache, scratch, jnp.int32(slot_id),
            last_h, self._fold_rng(), **self.sampling,
        )
        tok = int(tok)
        self.slots[slot_id] = _Slot(req_id, [tok], max_new)
        self.cur_lens[slot_id] = s
        self.last_toks[slot_id] = tok
        emitted.setdefault(req_id, []).append(tok)
        self._maybe_retire(slot_id)

    def _advance_inflight(self, emitted):
        """Run ONE chunk of the in-flight incremental prefill."""
        fl = self._inflight
        C = self.prefill_chunk
        chunk = fl.embeds[:, fl.off:fl.off + C]
        true_len = chunk.shape[1]
        if true_len < C:
            chunk = jnp.pad(chunk, ((0, 0), (0, C - true_len), (0, 0)))
        fl.scratch, last_h = _prefill_chunk(
            self.cfg, self.params, fl.scratch, chunk, jnp.int32(fl.off),
            jnp.int32(true_len),
        )
        fl.off += true_len
        if fl.off >= fl.s:
            self._inflight = None
            self._install(fl.slot_id, fl.req_id, fl.s, fl.scratch, last_h,
                          fl.max_new, emitted)

    def _admit(self, emitted):
        """Move pending requests into free slots (prefill each)."""
        if self._inflight is not None:
            self._advance_inflight(emitted)
        for slot_id in range(self.max_batch):
            if not self.pending or self.slots[slot_id] is not None:
                continue
            if self._inflight is not None and self._inflight.slot_id == slot_id:
                continue
            # pick the first ADMISSIBLE pending request, not merely the
            # head: while one chunked prefill is in flight, a long prompt
            # at the head must not block shorter requests behind it from
            # taking other free slots (head-of-line fairness)
            pick = None
            for i, (_, embeds_i, _) in enumerate(self.pending):
                needs_chunk = (self.prefill_chunk
                               and embeds_i.shape[1] > self.prefill_chunk)
                if needs_chunk and self._inflight is not None:
                    continue
                pick = i
                break
            if pick is None:
                break  # every pending request is chunk-blocked
            req_id, embeds, max_new = self.pending[pick]
            del self.pending[pick]
            s = embeds.shape[1]
            if self.prefill_chunk and s > self.prefill_chunk:
                # incremental: one chunk now, the rest between windows.
                # The scratch rounds up to a chunk multiple so the padded
                # final chunk writes in range (_install_slot trims).
                C = self.prefill_chunk
                scratch_len = -(-self.max_len // C) * C
                scratch = gptj.init_kv_cache(self.cfg, 1, scratch_len)
                self._inflight = _InflightPrefill(
                    slot_id, req_id, embeds, s, 0, scratch, max_new
                )
                self._advance_inflight(emitted)
                continue
            # clamp bucket padding so it never exceeds the cache length
            pad = min((-s) % self.prefill_bucket, self.max_len - s)
            if pad:
                embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
            scratch, last_h = _prefill_full(
                self.cfg, self.params, embeds, jnp.int32(s),
                scratch_len=self.max_len,
            )
            self._install(slot_id, req_id, s, scratch, last_h, max_new,
                          emitted)

    def _maybe_retire(self, slot_id):
        # after prefill the next decode write lands at cur_len (== s)
        self._retire_check(slot_id, int(self.cur_lens[slot_id]))

    def _retire_check(self, slot_id, next_write):
        """Retire the slot if its latest token ends the request.
        ``next_write`` is the cache position the NEXT decode step would
        write this slot's K/V to."""
        slot = self.slots[slot_id]
        if slot is None:
            return
        if slot.tokens and slot.tokens[-1] == self.eos_token:
            reason = "eos"
        elif len(slot.tokens) >= slot.max_new_tokens:
            reason = "length"
        elif next_write >= self.max_len:
            reason = "length"
        else:
            return
        self.finished[slot.req_id] = FinishedRequest(
            slot.req_id, slot.tokens, reason
        )
        self.slots[slot_id] = None

    def step(self) -> Dict[int, List[int]]:
        """Admit pending requests, run one decode window (``decode_window``
        tokens per active slot in one dispatch).  Returns {req_id:
        [tokens]} emitted during this call (a request admitted this call
        yields its prefill token plus its decode-window tokens)."""
        emitted: Dict[int, List[int]] = {}
        self._admit(emitted)
        active = np.array([s is not None for s in self.slots])
        if not active.any():
            return emitted
        start_lens = self.cur_lens.copy()
        self.cache, toks = _decode(
            self.cfg, self.params, self.cache,
            jnp.asarray(self.last_toks), jnp.asarray(self.cur_lens),
            jnp.asarray(active), self._fold_rng(),
            n_steps=self.decode_window,
            eos_token=self.eos_token, **self.sampling,
        )
        toks = np.asarray(toks)  # (B, n) int32 — the only D2H per window
        # device wrote n positions for every row active at window start;
        # host bookkeeping must mirror that even for rows retired below
        self.cur_lens = self.cur_lens + active.astype(np.int32) * toks.shape[1]
        for slot_id in range(self.max_batch):
            if self.slots[slot_id] is None:
                continue
            for k in range(toks.shape[1]):
                slot = self.slots[slot_id]
                if slot is None:
                    break  # retired mid-window: discard the tail tokens
                tok = int(toks[slot_id, k])
                slot.tokens.append(tok)
                self.last_toks[slot_id] = tok
                emitted.setdefault(slot.req_id, []).append(tok)
                # token k's input K/V wrote at start+k; next write: +1
                self._retire_check(slot_id, int(start_lens[slot_id]) + k + 1)
        return emitted

    def run(self) -> Dict[int, FinishedRequest]:
        """Drain every pending/active request; returns {req_id: result}."""
        while self.has_work:
            self.step()
        return self.finished


class MagmaServingEngine(LMServingEngine):
    """Continuous batching at the Magma level: requests are (image, text)
    multimodal prompts, embedded through the vision tower + ImagePrefix,
    and results decode to strings through the tokenizer."""

    def __init__(self, model, **kwargs):
        kwargs.setdefault("eos_token", model.eos_token)
        super().__init__(model.lm_config, model.params["lm"], **kwargs)
        self.model = model

    def submit_prompt(self, inputs, max_new_tokens: int = 100) -> int:
        """``inputs``: the list accepted by ``Magma.preprocess_inputs``
        (ImageInput / PIL images / caption strings)."""
        embeds = self.model.preprocess_inputs(inputs)
        return self.submit(embeds, max_new_tokens)

    def text_results(self) -> Dict[int, str]:
        return {
            rid: self.model.tokenizer._decode_ids(
                strip_after_eos(res.tokens, self.eos_token,
                                self.model.image_token)
            )
            for rid, res in self.finished.items()
        }
