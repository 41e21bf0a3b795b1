"""Continuous-batching serving engine over size-classed KV cache pools.

The reference framework decodes one prompt at a time (an eager HF loop,
magma/sampling.py:43-121).  This engine is the TPU-native production
counterpart: resident KV cache pools on device, requests mapped to batch
*slots*, and a small set of compiled programs that serve every request
shape:

* ``prefill``: runs the prompt through the LM into a 1-row scratch cache,
  scatters that row into the slot's pool at the assigned slot, and
  samples the first token.  Prompts are right-padded to a bucket multiple
  so one executable serves a whole bucket of lengths (padding is masked
  via ``kv_len``; the first token reads the last *true* position).
* ``decode``: one window of token steps for ALL slots of a pool at once —
  per-row cache positions (``cache_index``/``cur_len`` are (B,) arrays),
  per-row EOS masking.  Finished/empty slots still ride along (their
  writes land behind their frozen ``cur_len`` and are overwritten by the
  next prefill), so the step shape never changes and nothing recompiles.

**Size-classed cache pools (the TPU answer to paged KV).**  A dense
(B, max_len) cache wastes HBM when most requests are short: a 64-token
chat reply pins a 2048-position row.  vLLM-style 128-token pages do not
map well onto this platform: a per-layer paged-attention Pallas kernel
pays the measured ~100-170 us serial-chain launch latency 28x per token
(the same reason the hand-written decode kernel lost to XLA and was
removed), and an XLA gather of the page table re-materializes the
gathered cache every step — GB/token of pure copy at long context.
Instead the engine allocates SEVERAL pools of different sequence
capacities (e.g. 8 slots x 2048 plus 16 slots x 512) and routes each
request to the smallest class that fits ``prompt + max_new_tokens``.
Every pool keeps the dense layout XLA fuses perfectly (static slices in
the unrolled decode), short requests cost a quarter of the residency,
and attention for short-class slots reads a quarter of the cache.  This
is paging at class granularity: same capability (2-4x more resident
requests on mixed traces), none of the per-step gather/launch taxes.

**Piggybacked chunked prefill.**  Long prompts prefill incrementally
(``prefill_chunk`` tokens at a time) so an arriving 2000-token prompt
does not stall other slots for its whole prefill; the chunk rides INSIDE
the next decode-window dispatch (one fused program runs the chunk and
the window back to back), so chunked prefill costs zero extra
host->device round trips (1-3 ms each on tunneled transports).

Scheduling is plain continuous batching: after every decode window the
host admits pending requests into free slots (prefill), appends the new
tokens of each active slot, and retires rows that hit EOS or their token
budget.  Only (B,) int32 tokens cross device->host per window — the
logits and the sampling stay on device.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.models import gptj
from magma_tpu.ops.sampling import (
    sample_token, sample_token_batched, strip_after_eos,
)


@dataclasses.dataclass
class _Slot:
    req_id: int
    tokens: List[int]
    max_new_tokens: int
    sampling: Tuple[float, int, float]  # (temperature, top_k, top_p)
    # pipelined mode: the install program's first sampled token, kept on
    # device until the next collect so admission costs no host sync
    pending_first: Optional[object] = None
    install_next_write: int = 0


@dataclasses.dataclass
class _PendingWindow:
    """A dispatched-but-unfetched decode window (pipelined mode)."""
    toks: object                # (B, n) int32 device array
    start_lens: np.ndarray      # cur_lens at dispatch
    active: np.ndarray          # active mask at dispatch
    req_ids: List[Optional[int]]  # slot -> req id at dispatch


@dataclasses.dataclass
class _InflightPrefill:
    group_id: int
    slot_id: int
    req_id: int
    embeds: object          # (1, s, D) full prompt
    s: int                  # true prompt length
    off: int                # tokens prefilled so far
    scratch: object         # 1-row scratch cache (chunk-multiple length)
    max_new: int
    sampling: Tuple[float, int, float]


@dataclasses.dataclass
class FinishedRequest:
    req_id: int
    tokens: List[int]          # generated ids, EOS included if emitted
    finish_reason: str         # "eos" | "length"


class _CacheGroup:
    """One size class: a dense (B, max_len) cache pool + host bookkeeping."""

    def __init__(self, cfg, max_batch: int, max_len: int, eos_token: int,
                 mesh=None):
        self.max_batch = max_batch
        self.max_len = max_len
        self.cache = gptj.init_kv_cache(cfg, max_batch, max_len)
        if mesh is not None:
            # head-sharded pool, matching the head-sharded projections —
            # decode/install programs then run fully under GSPMD
            from magma_tpu.parallel.sharding import shard_kv_cache

            self.cache = shard_kv_cache(mesh, self.cache)
        self.cur_lens = np.zeros(max_batch, np.int32)
        self.last_toks = np.full(max_batch, eos_token, np.int32)
        # pipelined mode: the device-resident last-token vector the next
        # window chains from (no host fetch), plus the in-flight window
        self.last_dev = jnp.asarray(self.last_toks)
        self.pending: Optional[_PendingWindow] = None
        self.slots: List[Optional[_Slot]] = [None] * max_batch
        # per-slot sampling params (only meaningful where slots[i] is set)
        self.temps = np.zeros(max_batch, np.float32)
        self.top_ks = np.zeros(max_batch, np.int32)
        self.top_ps = np.zeros(max_batch, np.float32)

    @property
    def active(self) -> np.ndarray:
        return np.array([s is not None for s in self.slots])


@functools.partial(jax.jit, static_argnames=("cfg", "scratch_len"))
def _prefill_full(cfg, params, embeds, prompt_len, *, scratch_len):
    """Whole-prompt prefill into a fresh 1-row scratch cache.  Returns
    (scratch, hidden of the last true position); _install_slot scatters
    the scratch into the group cache and samples the first token."""
    scratch = gptj.init_kv_cache(cfg, 1, scratch_len)
    hidden, scratch = gptj.forward(
        cfg, params, embeds, cache=scratch, cache_index=jnp.int32(0),
        kv_len=jnp.broadcast_to(prompt_len, (1,)), remat=False,
        return_hidden=True,
    )
    last_h = jax.lax.dynamic_slice_in_dim(hidden, prompt_len - 1, 1, axis=1)
    return scratch, last_h


def _chunk_body(cfg, params, scratch, emb_chunk, offset, true_len):
    """One chunk of an incremental prefill into a 1-row scratch cache:
    the chunk attends to the already-written history [0, offset) AND
    causally to itself (gptj read_history)."""
    hidden, scratch = gptj.forward(
        cfg, params, emb_chunk, cache=scratch, cache_index=offset,
        kv_len=jnp.broadcast_to(true_len, (1,)), remat=False,
        return_hidden=True, read_history=True,
    )
    last_h = jax.lax.dynamic_slice_in_dim(hidden, true_len - 1, 1, axis=1)
    return scratch, last_h


@functools.partial(
    jax.jit, static_argnames=("cfg",), donate_argnames=("scratch",),
)
def _prefill_chunk(cfg, params, scratch, emb_chunk, offset, true_len):
    return _chunk_body(cfg, params, scratch, emb_chunk, offset, true_len)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "top_p_mode"),
    donate_argnames=("cache",),
)
def _install_slot(cfg, params, cache, scratch, slot, last_h, rng, temp, tk,
                  tp, *, top_p_mode):
    """Scatter a finished scratch prefill into a group cache at ``slot``
    and sample the request's first token.  The scratch may be longer than
    the group cache (chunked prefill rounds its length up to a chunk
    multiple so a padded final chunk never writes out of range).

    ``temp``/``tk``/``tp`` are TRACED (1,) sampling params: one compiled
    install program serves every request, whatever its per-request
    settings (static params would recompile per distinct combination)."""
    max_len = cache["k"].shape[2]

    def clip_pos(name, arr):
        # position axis: 2 for K/V (L, b, s, h, hd); 3 for the
        # position-minor int8-cache scales (L, b, h, s)
        if name.endswith("_scale"):
            return arr[:, :, :, :max_len]
        return arr[:, :, :max_len]

    cache = {
        name: jax.lax.dynamic_update_slice(
            cache[name], clip_pos(name, scratch[name]),
            (0, slot) + (0,) * (cache[name].ndim - 2),
        )
        for name in cache
    }
    logits = gptj.lm_head(cfg, params, last_h)[:, 0]
    tok = sample_token_batched(
        rng, logits, temp, tk, tp, vocab_size=cfg.vocab_size,
        top_p_mode=top_p_mode,
    )
    return cache, tok[0]


def _window_body(cfg, params, cache, last_toks, cur_lens, active, rng,
                 sample_fn, *, n_steps, eos_token):
    """``n_steps`` decode steps for every slot of one pool.
    ``sample_fn(rng, logits) -> (B,) tokens`` closes over the sampling
    params — static engine-wide values or traced per-slot arrays."""

    def step(carry, i):
        cache, toks, lens = carry
        emb = gptj.embed_tokens(cfg, params, toks[:, None])
        hidden, cache = gptj.forward(
            cfg, params, emb, cache=cache, cache_index=lens, remat=False,
            return_hidden=True,
        )
        logits = gptj.lm_head(cfg, params, hidden)[:, 0]
        tok = sample_fn(jax.random.fold_in(rng, i), logits)
        tok = jnp.where(active, tok, jnp.int32(eos_token))
        return (cache, tok, lens + active.astype(jnp.int32)), tok

    (cache, _, _), toks = jax.lax.scan(
        step, (cache, last_toks, cur_lens), jnp.arange(n_steps)
    )
    return cache, toks.T  # (B, n_steps)


def _static_sampler(cfg, temperature, top_k, top_p, top_p_mode):
    def fn(rng, logits):
        return sample_token(
            rng, logits, temperature=temperature, top_k=top_k, top_p=top_p,
            vocab_size=cfg.vocab_size, top_p_mode=top_p_mode,
        )
    return fn


def _batched_sampler(cfg, temps, top_ks, top_ps, top_p_mode):
    def fn(rng, logits):
        return sample_token_batched(
            rng, logits, temps, top_ks, top_ps, vocab_size=cfg.vocab_size,
            top_p_mode=top_p_mode,
        )
    return fn


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "temperature", "top_k", "top_p",
                     "top_p_mode", "eos_token"),
    donate_argnames=("cache",),   # in-place cache writes
)
def _decode(cfg, params, cache, last_toks, cur_lens, active, rng, *,
            n_steps, temperature, top_k, top_p, top_p_mode, eos_token):
    """A decode window alone.  Running a window of steps per dispatch
    amortizes the host->device round trip over n tokens.  The active mask
    is frozen for the window; rows that hit EOS inside it keep decoding
    into positions the host will discard — their slots get retired (and
    the cache rows overwritten by the next prefill) anyway."""
    return _window_body(
        cfg, params, cache, last_toks, cur_lens, active, rng,
        _static_sampler(cfg, temperature, top_k, top_p, top_p_mode),
        n_steps=n_steps, eos_token=eos_token,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "top_p_mode", "eos_token"),
    donate_argnames=("cache",),
)
def _decode_mixed(cfg, params, cache, last_toks, cur_lens, active, rng,
                  temps, top_ks, top_ps, *, n_steps, top_p_mode, eos_token):
    """``_decode`` with per-slot TRACED sampling params — used when the
    active slots carry different (temperature, top_k, top_p) settings.
    One executable serves every mix; the extra cost is one (B, V)
    descending sort per step (only paid on mixed windows — uniform
    windows keep the static program's cheap path)."""
    return _window_body(
        cfg, params, cache, last_toks, cur_lens, active, rng,
        _batched_sampler(cfg, temps, top_ks, top_ps, top_p_mode),
        n_steps=n_steps, eos_token=eos_token,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "temperature", "top_k", "top_p",
                     "top_p_mode", "eos_token"),
    donate_argnames=("cache", "scratch"),
)
def _decode_with_chunk(cfg, params, cache, last_toks, cur_lens, active, rng,
                       scratch, emb_chunk, offset, true_len, *,
                       n_steps, temperature, top_k, top_p, top_p_mode,
                       eos_token):
    """Piggybacked dispatch: ONE program that advances the in-flight
    chunked prefill (independent scratch cache) and runs a decode window
    (pool cache).  The two halves touch disjoint state, so XLA may
    overlap them; either way the chunk stops costing its own
    host->device round trip."""
    scratch, last_h = _chunk_body(
        cfg, params, scratch, emb_chunk, offset, true_len
    )
    cache, toks = _window_body(
        cfg, params, cache, last_toks, cur_lens, active, rng,
        _static_sampler(cfg, temperature, top_k, top_p, top_p_mode),
        n_steps=n_steps, eos_token=eos_token,
    )
    return cache, toks, scratch, last_h


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "top_p_mode", "eos_token"),
    donate_argnames=("cache", "scratch"),
)
def _decode_with_chunk_mixed(cfg, params, cache, last_toks, cur_lens, active,
                             rng, scratch, emb_chunk, offset, true_len,
                             temps, top_ks, top_ps, *,
                             n_steps, top_p_mode, eos_token):
    """``_decode_with_chunk`` with per-slot traced sampling params."""
    scratch, last_h = _chunk_body(
        cfg, params, scratch, emb_chunk, offset, true_len
    )
    cache, toks = _window_body(
        cfg, params, cache, last_toks, cur_lens, active, rng,
        _batched_sampler(cfg, temps, top_ks, top_ps, top_p_mode),
        n_steps=n_steps, eos_token=eos_token,
    )
    return cache, toks, scratch, last_h


class LMServingEngine:
    """Continuous batching over size-classed KV cache pools.

    ``cache_classes``: sequence of (slots, max_len) pools, e.g.
    ``((8, 2048), (16, 512))``.  Default: one pool of
    (``max_batch``, ``max_len``) — the round-2 behavior.  Requests route
    to the smallest class whose capacity covers prompt + max_new_tokens.

    Sampling: the constructor sets engine-wide defaults; ``submit`` may
    override (temperature, top_k, top_p) PER REQUEST.  Windows whose
    active slots all share the default settings run the cheap static
    program (greedy = pure argmax); windows with any override run a
    per-slot-parameter program (``sample_token_batched``) that costs one
    extra (B, V) sort per step and never recompiles across mixes.
    ``kv_cache_dtype`` comes from ``cfg`` — pass a config with
    ``kv_cache_dtype="int8"`` to halve the resident pools.
    """

    def __init__(
        self,
        cfg,
        params,
        *,
        max_batch: int = 8,
        max_len: int = 2048,
        cache_classes: Optional[Sequence[Tuple[int, int]]] = None,
        eos_token: int = 50256,
        temperature: float = 0.0,
        top_k: int = 0,
        top_p: float = 0.0,
        top_p_mode: str = "reference",
        prefill_bucket: int = 64,
        decode_window: int = 4,
        prefill_chunk: int = 0,
        seed: int = 0,
        mesh=None,
        pipeline_windows: bool = True,
    ):
        """``mesh``: a jax.sharding.Mesh with a "tp" axis — the engine
        then serves a TENSOR-PARALLEL LM: params are placed with the
        Megatron-style layouts (parallel/sharding.py lm_param_spec), the
        KV pools/scratch caches shard over heads, and every compiled
        program (prefill, install, decode window) runs under GSPMD with
        XLA-inserted collectives.  This is what makes bf16-6B serving
        possible off a single chip (the params must still be the raw or
        bf16-packed layout for clean head-aligned shardings — the fused
        int8 in_proj concatenates [q|k|v|fc_in], which GSPMD still
        handles but with extra resharding).  n_heads must divide by the
        tp size.  Output tokens are replicated — identical to the
        single-device engine."""
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            if cfg.n_heads % mesh.shape["tp"]:
                raise ValueError(
                    f"n_heads {cfg.n_heads} not divisible by tp="
                    f"{mesh.shape['tp']}")
            from magma_tpu.parallel.sharding import shard_lm_params

            params = shard_lm_params(mesh, params)
        self.params = params
        if cache_classes is None:
            cache_classes = ((max_batch, max_len),)
        # ascending capacity: admission picks the first class that fits
        self.classes = sorted(cache_classes, key=lambda c: c[1])
        self.max_len = max(c[1] for c in self.classes)
        self.eos_token = eos_token
        self.sampling = dict(
            temperature=float(temperature), top_k=int(top_k),
            top_p=float(top_p), top_p_mode=top_p_mode,
        )
        self.default_sampling = (float(temperature), int(top_k),
                                 float(top_p))
        self.top_p_mode = top_p_mode
        self.prefill_bucket = prefill_bucket
        # tokens decoded per dispatch: amortizes host round trips; new
        # requests are admitted at window boundaries
        self.decode_window = max(1, int(decode_window))
        # >0: long prompts prefill incrementally, prefill_chunk tokens
        # piggybacked on decode-window dispatches (see module docstring).
        # One chunked prefill is in flight at a time (bounds the scratch
        # cache to one extra row).
        self.prefill_chunk = int(prefill_chunk)
        # pipelined windows (default): each step dispatches the next
        # decode window BEFORE fetching the previous one's tokens, chained
        # device-side through the pool's last-token vector — the host
        # round trip (dispatch + (B,) fetch, ~1-33 ms depending on
        # transport) rides the window's device execution instead of
        # serializing with it.  Host bookkeeping (streaming, EOS/budget
        # retirement, admission) lags exactly one window; a request's
        # final window may overlap one discarded speculative window.
        # Token outputs are identical to the unpipelined engine.
        self.pipeline_windows = bool(pipeline_windows)
        self._inflight: Optional[_InflightPrefill] = None
        self._rng = jax.random.PRNGKey(seed)
        self._step_count = 0
        self._next_id = 0

        self.groups = [
            _CacheGroup(cfg, b, ml, eos_token, mesh=mesh)
            for b, ml in self.classes
        ]
        self.pending = collections.deque()
        self.finished: Dict[int, FinishedRequest] = {}

    # ------------------------------------------------------------------
    def submit(self, embeds, max_new_tokens: int = 100, *,
               temperature: Optional[float] = None,
               top_k: Optional[int] = None,
               top_p: Optional[float] = None) -> int:
        """Queue a request.  ``embeds``: (s, D) or (1, s, D) prompt
        embeddings.  ``temperature``/``top_k``/``top_p`` override the
        engine-wide defaults for this request only (semantics as in
        ``ops.sampling.sample_token``; temperature 0 = greedy).  Returns
        the request id."""
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
        d_t, d_k, d_p = self.default_sampling
        sampling = (
            d_t if temperature is None else float(temperature),
            d_k if top_k is None else int(top_k),
            d_p if top_p is None else float(top_p),
        )
        req_id = self._next_id
        self._next_id += 1
        self.pending.append((req_id, embeds, int(max_new_tokens), sampling))
        return req_id

    @property
    def has_work(self) -> bool:
        return (bool(self.pending) or self._inflight is not None
                or any(g.active.any() or g.pending is not None
                       for g in self.groups))

    @property
    def resident_cache_positions(self) -> int:
        """Total cache positions allocated across pools (the residency
        metric size classes optimize — a single (B, max) pool of the same
        slot count allocates B * max)."""
        return sum(g.max_batch * g.max_len for g in self.groups)

    def _fold_rng(self):
        self._step_count += 1
        return jax.random.fold_in(self._rng, self._step_count)

    def _pick_group(self, s: int, max_new: int) -> Optional[Tuple[int, int]]:
        """Smallest class whose capacity covers prompt + budget, with a
        free slot.  The largest class accepts any request that fits its
        prompt (over-budget generations retire with reason "length", as
        in the single-pool engine).  Returns (group_id, slot_id) or None;
        never returns the slot reserved by the in-flight chunked prefill.
        """
        need = min(max(s + max_new, s + 1), self.max_len)
        fl = self._inflight
        for gi, g in enumerate(self.groups):
            if g.max_len < need and g.max_len != self.max_len:
                continue
            for slot in range(g.max_batch):
                if g.slots[slot] is not None:
                    continue
                if fl is not None and (fl.group_id, fl.slot_id) == (gi, slot):
                    continue
                return gi, slot
        return None

    def _install(self, group_id, slot_id, req_id, s, scratch, last_h,
                 max_new, sampling, emitted):
        """Finish a prefill: scatter the scratch into the group cache,
        record the first token, mark the slot live."""
        g = self.groups[group_id]
        t, k, p = sampling
        g.cache, tok = _install_slot(
            self.cfg, self.params, g.cache, scratch, jnp.int32(slot_id),
            last_h, self._fold_rng(),
            jnp.full((1,), t, jnp.float32), jnp.full((1,), k, jnp.int32),
            jnp.full((1,), p, jnp.float32), top_p_mode=self.top_p_mode,
        )
        if self.pipeline_windows:
            # keep the first token on device: it feeds the next window via
            # last_dev; the host copy (streaming + retire check) lands at
            # the next collect — admission costs zero host syncs
            g.last_dev = g.last_dev.at[slot_id].set(tok)
            g.slots[slot_id] = _Slot(req_id, [], max_new, sampling,
                                     pending_first=tok,
                                     install_next_write=s)
            g.cur_lens[slot_id] = s
            g.temps[slot_id], g.top_ks[slot_id], g.top_ps[slot_id] = t, k, p
            return
        tok = int(tok)
        g.slots[slot_id] = _Slot(req_id, [tok], max_new, sampling)
        g.cur_lens[slot_id] = s
        g.last_toks[slot_id] = tok
        g.temps[slot_id], g.top_ks[slot_id], g.top_ps[slot_id] = t, k, p
        emitted.setdefault(req_id, []).append(tok)
        self._maybe_retire(group_id, slot_id)

    def _start_inflight(self, group_id, slot_id, req_id, embeds, max_new,
                        sampling, emitted):
        C = self.prefill_chunk
        g = self.groups[group_id]
        scratch_len = -(-g.max_len // C) * C
        scratch = gptj.init_kv_cache(self.cfg, 1, scratch_len)
        self._inflight = _InflightPrefill(
            group_id, slot_id, req_id, embeds, embeds.shape[1], 0, scratch,
            max_new, sampling,
        )
        # run the first chunk immediately (standalone) so admission makes
        # progress even when no decode window runs this step
        self._advance_inflight(emitted)

    def _advance_inflight(self, emitted):
        """Run ONE chunk of the in-flight incremental prefill as its own
        dispatch (used at admission and when no decode window runs)."""
        fl = self._inflight
        chunk, off, true_len = self._next_chunk()
        fl.scratch, last_h = _prefill_chunk(
            self.cfg, self.params, fl.scratch, chunk, jnp.int32(off),
            jnp.int32(true_len),
        )
        self._finish_chunk(true_len, last_h, emitted)

    def _next_chunk(self):
        fl = self._inflight
        C = self.prefill_chunk
        chunk = fl.embeds[:, fl.off:fl.off + C]
        true_len = chunk.shape[1]
        if true_len < C:
            chunk = jnp.pad(chunk, ((0, 0), (0, C - true_len), (0, 0)))
        return chunk, fl.off, true_len

    def _finish_chunk(self, true_len, last_h, emitted):
        fl = self._inflight
        fl.off += true_len
        if fl.off >= fl.s:
            self._inflight = None
            self._install(fl.group_id, fl.slot_id, fl.req_id, fl.s,
                          fl.scratch, last_h, fl.max_new, fl.sampling,
                          emitted)

    def _admit(self, emitted):
        """Move pending requests into free slots (prefill each)."""
        # pick ADMISSIBLE pending requests, not merely the head: while one
        # chunked prefill is in flight, a long prompt at the head must not
        # block shorter requests behind it (head-of-line fairness)
        made_progress = True
        while made_progress and self.pending:
            made_progress = False
            for i, (req_id, embeds, max_new, sampling) in enumerate(
                    self.pending):
                s = embeds.shape[1]
                needs_chunk = (self.prefill_chunk
                               and s > self.prefill_chunk)
                if needs_chunk and self._inflight is not None:
                    continue
                placed = self._pick_group(s, max_new)
                if placed is None:
                    continue
                gi, slot = placed
                if (self._inflight is not None
                        and self._inflight.group_id == gi
                        and self._inflight.slot_id == slot):
                    continue
                del self.pending[i]
                if needs_chunk:
                    self._start_inflight(gi, slot, req_id, embeds, max_new,
                                         sampling, emitted)
                else:
                    pad = min((-s) % self.prefill_bucket,
                              self.groups[gi].max_len - s)
                    if pad:
                        embeds = jnp.pad(
                            embeds, ((0, 0), (0, pad), (0, 0))
                        )
                    scratch, last_h = _prefill_full(
                        self.cfg, self.params, embeds, jnp.int32(s),
                        scratch_len=self.groups[gi].max_len,
                    )
                    self._install(gi, slot, req_id, s, scratch, last_h,
                                  max_new, sampling, emitted)
                made_progress = True
                break

    def _maybe_retire(self, group_id, slot_id):
        # after prefill the next decode write lands at cur_len (== s)
        g = self.groups[group_id]
        self._retire_check(group_id, slot_id, int(g.cur_lens[slot_id]))

    def _retire_check(self, group_id, slot_id, next_write):
        """Retire the slot if its latest token ends the request.
        ``next_write`` is the cache position the NEXT decode step would
        write this slot's K/V to."""
        g = self.groups[group_id]
        slot = g.slots[slot_id]
        if slot is None:
            return
        if slot.tokens and slot.tokens[-1] == self.eos_token:
            reason = "eos"
        elif len(slot.tokens) >= slot.max_new_tokens:
            reason = "length"
        elif next_write >= g.max_len:
            reason = "length"
        else:
            return
        self.finished[slot.req_id] = FinishedRequest(
            slot.req_id, slot.tokens, reason
        )
        g.slots[slot_id] = None

    def _worth_dispatching(self, gi) -> bool:
        """Pipelined mode: is any live slot still owed tokens after the
        ones already committed (window in flight + deferred install
        token)?  Skipping the dispatch when every slot's budget is covered
        avoids a pure-waste speculative window during the drain."""
        g = self.groups[gi]
        n_pend = g.pending.toks.shape[1] if g.pending is not None else 0
        for sid, slot in enumerate(g.slots):
            if slot is None:
                continue
            committed = len(slot.tokens)
            if slot.pending_first is not None:
                committed += 1
            if g.pending is not None and g.pending.active[sid] \
                    and g.pending.req_ids[sid] == slot.req_id:
                committed += n_pend
            if committed < slot.max_new_tokens:
                return True
        return False

    def _run_group_window(self, gi, chunk_job, emitted):
        """Dispatch one decode window for group ``gi``; piggyback the
        in-flight prefill chunk when ``chunk_job`` is set.

        Pipelined mode: the window chains from the device-resident
        ``last_dev`` token vector and is stashed as ``g.pending``; the
        PREVIOUS pending window is collected afterwards, so its
        device->host token fetch overlaps this window's execution."""
        g = self.groups[gi]
        pipelined = self.pipeline_windows
        if pipelined and not self._worth_dispatching(gi):
            self._collect_group(gi, emitted)
            if chunk_job is not None:
                self._advance_inflight(emitted)
            return
        active = g.active
        start_lens = g.cur_lens.copy()
        last_toks = g.last_dev if pipelined else jnp.asarray(g.last_toks)
        args = (
            self.cfg, self.params, g.cache,
            last_toks, jnp.asarray(g.cur_lens),
            jnp.asarray(active), self._fold_rng(),
        )
        # uniform-default windows keep the cheap static program (greedy
        # default = pure argmax, no per-step sort); any per-request
        # override routes the window to the traced-params program
        mixed = any(
            s is not None and s.sampling != self.default_sampling
            for s in g.slots
        )
        if mixed:
            sample_args = (jnp.asarray(g.temps), jnp.asarray(g.top_ks),
                           jnp.asarray(g.top_ps))
            kw = dict(n_steps=self.decode_window, eos_token=self.eos_token,
                      top_p_mode=self.top_p_mode)
            decode_fn, decode_chunk_fn = _decode_mixed, _decode_with_chunk_mixed
        else:
            sample_args = ()
            kw = dict(n_steps=self.decode_window, eos_token=self.eos_token,
                      **self.sampling)
            decode_fn, decode_chunk_fn = _decode, _decode_with_chunk
        chunk_done = None
        if chunk_job is not None:
            chunk, off, true_len = chunk_job
            fl = self._inflight
            g.cache, toks, fl.scratch, last_h = decode_chunk_fn(
                *args, fl.scratch, chunk, jnp.int32(off),
                jnp.int32(true_len), *sample_args, **kw,
            )
            # defer _finish_chunk until AFTER the token bookkeeping below:
            # finishing may install a request into a slot that was
            # INACTIVE during this window — the bookkeeping loop must not
            # hand that fresh slot the window's placeholder tokens
            chunk_done = (true_len, last_h)
        else:
            g.cache, toks = decode_fn(*args, *sample_args, **kw)
        if pipelined:
            prev = g.pending
            g.pending = _PendingWindow(
                toks, start_lens, active,
                [s.req_id if s is not None else None for s in g.slots],
            )
            g.last_dev = toks[:, -1]
            # device wrote n positions for every active row; mirror that
            # now (deterministic) so the next dispatch positions correctly
            g.cur_lens = g.cur_lens + active.astype(np.int32) * int(
                toks.shape[1])
            if chunk_done is not None:
                # install (if the prefill completed) dispatches AFTER this
                # window on the device stream, so its full-row scatter
                # overwrites the window's placeholder writes to that slot
                self._finish_chunk(*chunk_done, emitted)
            self._collect_window(gi, prev, emitted)
            return
        toks = np.asarray(toks)  # (B, n) int32 — the only D2H per window
        # device wrote n positions for every row active at window start;
        # host bookkeeping must mirror that even for rows retired below
        g.cur_lens = g.cur_lens + active.astype(np.int32) * toks.shape[1]
        for slot_id in range(g.max_batch):
            if g.slots[slot_id] is None:
                continue
            for k in range(toks.shape[1]):
                slot = g.slots[slot_id]
                if slot is None:
                    break  # retired mid-window: discard the tail tokens
                tok = int(toks[slot_id, k])
                slot.tokens.append(tok)
                g.last_toks[slot_id] = tok
                emitted.setdefault(slot.req_id, []).append(tok)
                # token k's input K/V wrote at start+k; next write: +1
                self._retire_check(gi, slot_id,
                                   int(start_lens[slot_id]) + k + 1)
        if chunk_done is not None:
            self._finish_chunk(*chunk_done, emitted)

    def _collect_window(self, gi, prev, emitted):
        """Fetch and book a previously dispatched window (pipelined mode):
        ONE device->host transfer covers the window tokens and any
        deferred install tokens, then the usual streaming/retire loop
        runs against the states recorded at dispatch."""
        g = self.groups[gi]
        firsts = [(sid, s) for sid, s in enumerate(g.slots)
                  if s is not None and s.pending_first is not None]
        fetch = ([] if prev is None else [prev.toks]) + [
            s.pending_first for _, s in firsts]
        if not fetch:
            return
        vals = jax.device_get(fetch)
        toks = None
        if prev is not None:
            toks, vals = np.asarray(vals[0]), vals[1:]
        # install tokens first: the install preceded any window that
        # includes its slot, so its token is that row's first output
        for (sid, slot), v in zip(firsts, vals):
            tok = int(v)
            slot.pending_first = None
            slot.tokens.append(tok)
            g.last_toks[sid] = tok
            emitted.setdefault(slot.req_id, []).append(tok)
            self._retire_check(gi, sid, slot.install_next_write)
        if toks is None:
            return
        for sid in range(g.max_batch):
            if not prev.active[sid] or prev.req_ids[sid] is None:
                continue
            for k in range(toks.shape[1]):
                slot = g.slots[sid]
                if slot is None or slot.req_id != prev.req_ids[sid]:
                    break  # retired (slot possibly reused): stale tail
                tok = int(toks[sid, k])
                slot.tokens.append(tok)
                g.last_toks[sid] = tok
                emitted.setdefault(slot.req_id, []).append(tok)
                self._retire_check(gi, sid, int(prev.start_lens[sid]) + k + 1)

    def _collect_group(self, gi, emitted):
        g = self.groups[gi]
        prev, g.pending = g.pending, None
        self._collect_window(gi, prev, emitted)

    def step(self) -> Dict[int, List[int]]:
        """Admit pending requests, run one decode window per active pool
        (``decode_window`` tokens per active slot, one dispatch per pool;
        the in-flight prefill chunk piggybacks on the first dispatch).
        Returns {req_id: [tokens]} emitted during this call.

        Pipelined mode (default): each pool's window is dispatched before
        the previous window's tokens are fetched, so emission lags one
        window behind the device; a second admission pass fills slots the
        collects just freed."""
        emitted: Dict[int, List[int]] = {}
        self._admit(emitted)
        active_groups = [
            gi for gi, g in enumerate(self.groups) if g.active.any()
        ]
        chunk_job = (self._next_chunk()
                     if self._inflight is not None and active_groups
                     else None)
        if not active_groups:
            if self._inflight is not None:
                self._advance_inflight(emitted)
            if self.pipeline_windows:
                for gi in range(len(self.groups)):
                    self._collect_group(gi, emitted)
                self._admit(emitted)  # slots the collects just freed
            return emitted
        for n, gi in enumerate(active_groups):
            self._run_group_window(
                gi, chunk_job if n == 0 else None, emitted
            )
        if self.pipeline_windows:
            for gi, g in enumerate(self.groups):
                if gi not in active_groups and g.pending is not None:
                    self._collect_group(gi, emitted)
            self._admit(emitted)  # fill slots this step's collects freed
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

    def submit_prompt(self, inputs, max_new_tokens: int = 100,
                      **sampling) -> int:
        """``inputs``: the list accepted by ``Magma.preprocess_inputs``
        (ImageInput / PIL images / caption strings).  ``sampling``:
        per-request temperature/top_k/top_p overrides (see ``submit``)."""
        embeds = self.model.preprocess_inputs(inputs)
        return self.submit(embeds, max_new_tokens, **sampling)

    def text_results(self) -> Dict[int, str]:
        return {
            rid: self.model.tokenizer._decode_ids(
                strip_after_eos(res.tokens, self.eos_token,
                                self.model.image_token)
            )
            for rid, res in self.finished.items()
        }
