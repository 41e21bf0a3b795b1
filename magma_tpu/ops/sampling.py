"""Autoregressive sampling: top-k / top-p filters + jitted decode loop.

Parity target: magma/sampling.py:7-121.  The reference runs an eager
per-token python loop over HF ``past_key_values``; here the whole decode is
one jitted ``lax.while_loop`` over a fixed-shape KV cache — no host sync
per token, early exit when every row has emitted EOS.

Semantics matched exactly:

* temperature == 0 -> pure argmax (sampling.py:96-97).
* top-k keeps the k largest logits (sampling.py:22-30); boundary ties are
  all kept here (torch.topk picks by index) — indistinguishable in float
  practice.
* top-p reproduces the reference's *nonstandard* filter (sampling.py:7-19):
  sort descending, remove ranks whose shifted cumulative probability is
  < (1 - threshold), always keep rank 0.  (Standard nucleus sampling would
  remove the tail instead; we replicate the reference so published
  checkpoints sample identically.)  Set ``top_p_mode="standard"`` for
  textbook nucleus sampling.
* temperature divides the logits *after* filtering (sampling.py:104).
* decode loop: step 0 consumes the full prompt embeddings (prefill), then
  one token per step (sampling.py:79-90); generation stops when all rows
  have produced EOS (sampling.py:107-110) — rows that finished early are
  held at EOS, which is output-equivalent after EOS-stripping.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.utils import round_up

NEG_INF = float("-inf")


def _shard_cache_sp(cfg, cache, mesh):
    """Constrain the KV cache's position axis to shard over the mesh's
    ``sp`` axis: K/V are (L, b, max_len, h, hd) -> P(None, None, sp);
    int8 scales are position-minor (L, b, h, max_len) -> last-axis sp.
    Everything else about the cache pytree is untouched."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    ax = cfg.sp_axis
    kv = NamedSharding(mesh, P(None, None, ax, None, None))
    sc = NamedSharding(mesh, P(None, None, None, ax))
    return {
        k: jax.lax.with_sharding_constraint(
            v, sc if k.endswith("_scale") else kv)
        for k, v in cache.items()
    }


def top_k_filter(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest logits per row, -inf elsewhere (sampling.py:22-30)."""
    assert k > 0
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits >= kth, logits, NEG_INF)


def top_p_filter(
    logits: jnp.ndarray, threshold: float = 0.9, mode: str = "reference"
) -> jnp.ndarray:
    """Nucleus-style filter over the last axis.

    mode="reference" replicates magma/sampling.py:7-19 bit-for-bit in
    structure; mode="standard" is conventional nucleus sampling.
    """
    order = jnp.argsort(-logits, axis=-1, stable=True)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)

    if mode == "reference":
        remove = cum_probs < (1.0 - threshold)
    else:
        remove = cum_probs > threshold
    # shift right: the first rank crossing the boundary stays included
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    filtered_sorted = jnp.where(remove, NEG_INF, sorted_logits)

    inv = jnp.argsort(order, axis=-1)
    return jnp.take_along_axis(filtered_sorted, inv, axis=-1)


def sample_token(
    rng: jax.Array,
    logits: jnp.ndarray,           # (b, V) fp32
    *,
    temperature: float,
    top_k: int,
    top_p: float,
    vocab_size: int,
    top_p_mode: str = "reference",
) -> jnp.ndarray:
    """One sampling step over possibly vocab-padded logits.  Returns (b,)."""
    # mask MXU-padding columns (gptj.padded_vocab_size > true vocab)
    if logits.shape[-1] > vocab_size:
        col = jnp.arange(logits.shape[-1])
        logits = jnp.where(col < vocab_size, logits, NEG_INF)

    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    if top_k > 0:
        logits = top_k_filter(logits, top_k)
    if top_p > 0.0:
        logits = top_p_filter(logits, top_p, mode=top_p_mode)
    return jax.random.categorical(rng, logits / temperature, axis=-1).astype(
        jnp.int32
    )


def sample_token_batched(
    rng: jax.Array,
    logits: jnp.ndarray,            # (b, V) fp32
    temperature: jnp.ndarray,       # (b,) — 0.0 rows decode greedily
    top_k: jnp.ndarray,             # (b,) int32 — 0 disables
    top_p: jnp.ndarray,             # (b,) — 0.0 disables
    *,
    vocab_size: int,
    top_p_mode: str = "reference",
) -> jnp.ndarray:
    """``sample_token`` with PER-ROW sampling parameters (traced arrays,
    not static) — the serving engine's mixed-request path, where slots
    carry different (temperature, top_k, top_p) settings.

    Row semantics match ``sample_token`` with that row's settings: greedy
    rows (temperature 0) take the argmax; top-k / top-p filters apply in
    the same order, and temperature divides after filtering.  One
    descending sort serves both filters, so a mixed batch costs the same
    as a batch with top_p enabled.  Returns (b,) int32.
    """
    if logits.shape[-1] > vocab_size:
        col = jnp.arange(logits.shape[-1])
        logits = jnp.where(col < vocab_size, logits, NEG_INF)

    order = jnp.argsort(-logits, axis=-1, stable=True)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    rank = jax.lax.broadcasted_iota(jnp.int32, sorted_logits.shape, 1)

    keep_k = jnp.logical_or(
        (top_k <= 0)[:, None], rank < top_k[:, None]
    )
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    if top_p_mode == "reference":
        remove = cum < (1.0 - top_p[:, None])
    else:
        remove = cum > top_p[:, None]
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1
    )
    keep_p = jnp.logical_or((top_p <= 0.0)[:, None], ~remove)

    filtered = jnp.where(
        jnp.logical_and(keep_k, keep_p), sorted_logits, NEG_INF
    )
    safe_t = jnp.where(temperature > 0, temperature, 1.0)[:, None]
    pick = jax.random.categorical(rng, filtered / safe_t, axis=-1)
    sampled = jnp.take_along_axis(order, pick[:, None], axis=-1)[:, 0]
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temperature > 0, sampled, greedy).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_steps", "temperature", "top_k", "top_p", "eos_token",
        "top_p_mode", "mesh",
    ),
)
def generate_tokens(
    cfg,
    params,
    embeddings: jnp.ndarray,       # (b, s, D) prompt embeddings
    rng: jax.Array,
    *,
    max_steps: int = 100,
    temperature: float = 0.7,
    top_k: int = 0,
    top_p: float = 0.9,
    eos_token: int = 50256,
    prompt_len: Optional[jnp.ndarray] = None,  # scalar or (b,) true lengths
    top_p_mode: str = "reference",
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """KV-cached generation.  Returns (tokens (b, max_steps) int32,
    n_steps int32 — number of valid steps before early exit).

    ``prompt_len`` may be per-row (b,) for a batch of right-padded prompts
    of different true lengths (e.g. batched VQA): each row decodes from
    its own last true position, padding is masked out of attention, and
    cache writes land at per-row offsets.

    ``mesh``: with ``cfg.attention_impl == "ring"`` and a mesh whose
    ``sp`` axis is >1, the KV cache's position axis shards over ``sp``
    and decode attention runs the distributed online softmax
    (parallel/sp_decode.py) — contexts beyond one chip's KV budget.

    Positions beyond the early-exit step are filled with EOS.
    """
    from magma_tpu.models import gptj

    b, s, _ = embeddings.shape
    if prompt_len is None:
        prompt_len = jnp.int32(s)
    else:
        prompt_len = jnp.asarray(prompt_len).astype(jnp.int32)
    per_row = prompt_len.ndim == 1

    # cache length rounded up to 64: the fused decode-layer kernel's
    # position blocks need a block-divisible max_len, and its clamped
    # index maps make the padding positions free (the XLA decode path
    # pays ~10 MB/token of masked reads for it -- noise at these sizes)
    sp_cache = gptj._sp_cache_active(cfg, mesh)
    max_len = round_up(s + max_steps, 64)
    if sp_cache:
        # shard_map needs the position axis divisible by the sp size
        max_len = round_up(max_len, mesh.shape[cfg.sp_axis])
    else:
        mesh = None  # keep the single-chip trace unchanged
    cache = gptj.init_kv_cache(cfg, b, max_len)
    if sp_cache:
        cache = _shard_cache_sp(cfg, cache, mesh)

    # ---- prefill (sampling.py:81-85) ----
    # return_hidden: only the last true position feeds the sampler, so the
    # LM head runs on one row per batch element — materializing the full
    # (b, s, 50304) fp32 prefill logits would cost 3.3 GB of HBM and
    # ~0.8 TFLOP at b=8/ctx-2048 for values that are thrown away
    hidden, cache = gptj.forward(
        cfg, params, embeddings, cache=cache,
        cache_index=jnp.int32(0), kv_len=jnp.broadcast_to(prompt_len, (b,)),
        remat=False, return_hidden=True, mesh=mesh,
    )
    # hidden at the last *true* prompt position
    if per_row:
        last_h = jnp.take_along_axis(
            hidden, (prompt_len - 1)[:, None, None], axis=1
        )
    else:
        last_h = jax.lax.dynamic_slice_in_dim(
            hidden, prompt_len - 1, 1, axis=1
        )
    last = gptj.lm_head(cfg, params, last_h)[:, 0]

    tokens0 = jnp.full((b, max_steps), eos_token, jnp.int32)
    done0 = jnp.zeros((b,), jnp.bool_)

    def cond(state):
        step, _, _, _, done, _ = state
        return jnp.logical_and(step < max_steps, ~jnp.all(done))

    def body(state):
        step, tokens, cache, last_logits, done, cur_len = state
        tok = sample_token(
            jax.random.fold_in(rng, step), last_logits,
            temperature=temperature, top_k=top_k, top_p=top_p,
            vocab_size=cfg.vocab_size, top_p_mode=top_p_mode,
        )
        tok = jnp.where(done, jnp.int32(eos_token), tok)
        tokens = jax.lax.dynamic_update_slice(tokens, tok[:, None], (0, step))
        done = jnp.logical_or(done, tok == eos_token)

        # the forward runs UNCONDITIONALLY: an earlier revision skipped
        # the final unconsumed step behind a lax.cond, but a cond whose
        # operands include the KV cache blocks XLA's in-place
        # while-loop buffer aliasing — every step then copies the cache
        # (~1.2 ms/tok at 6B int4, measured), dwarfing the one decode
        # step (~5.6 ms once per generate call) the cond saved.  The
        # extra step's K/V land at cur_len and are never read (the loop
        # exits before any consumer).
        emb = gptj.embed_tokens(cfg, params, tok[:, None])  # (b, 1, D)
        logits, cache = gptj.forward(
            cfg, params, emb, cache=cache, cache_index=cur_len,
            remat=False, mesh=mesh,
        )
        if sp_cache:
            # pin the carry's position sharding so the while_loop never
            # drifts to a replicated cache between steps
            cache = _shard_cache_sp(cfg, cache, mesh)
        return step + 1, tokens, cache, logits[:, -1], done, cur_len + 1

    state = (jnp.int32(0), tokens0, cache, last, done0, prompt_len)
    step, tokens, *_ = jax.lax.while_loop(cond, body, state)
    return tokens, step


@functools.partial(jax.jit, static_argnames=("cfg", "max_steps"))
def _split_prefill(cfg, params, embeddings, prompt_len, *, max_steps):
    """Prefill program of the split generate: builds a cache sized for
    ``max_steps`` decode positions and returns it with the last true
    position's logits."""
    from magma_tpu.models import gptj

    b, s, _ = embeddings.shape
    per_row = prompt_len.ndim == 1
    cache = gptj.init_kv_cache(cfg, b, round_up(s + max_steps, 64))
    hidden, cache = gptj.forward(
        cfg, params, embeddings, cache=cache, cache_index=jnp.int32(0),
        kv_len=jnp.broadcast_to(prompt_len, (b,)), remat=False,
        return_hidden=True,
    )
    if per_row:
        last_h = jnp.take_along_axis(
            hidden, (prompt_len - 1)[:, None, None], axis=1
        )
    else:
        last_h = jax.lax.dynamic_slice_in_dim(
            hidden, prompt_len - 1, 1, axis=1
        )
    last = gptj.lm_head(cfg, params, last_h)[:, 0]
    return cache, last


@functools.partial(jax.jit, static_argnames=("cfg", "batch", "total_len"))
def _split_cache_init(cfg, *, batch, total_len):
    from magma_tpu.models import gptj

    return gptj.init_kv_cache(cfg, batch, total_len)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _split_head(cfg, params, last_h):
    from magma_tpu.models import gptj

    return gptj.lm_head(cfg, params, last_h)[:, 0]


@functools.partial(
    jax.jit, static_argnames=("cfg", "chunk"), donate_argnames=("cache",),
)
def _split_prefill_chunk(cfg, params, emb_chunk, cache, last_h, offset,
                         prompt_len, *, chunk):
    """One chunk of the split generate's prefill: attends to the cache
    history [0, offset) plus itself (gptj read_history) and carries the
    last-true-position hidden state per row.  Bounds prefill activation
    memory to one chunk's worth for ANY (batch x context) — the
    whole-prompt prefill at b=8 x ctx-2048 exhausted HBM on transients.

    Rows whose prompt ended before this chunk write garbage K/V beyond
    their true length — harmless: a cache position p >= prompt_len only
    becomes attendable after the decode step that overwrites it
    (valid < cur_len masking), so the garbage is never read."""
    from magma_tpu.models import gptj

    b = emb_chunk.shape[0]
    prompt_len = jnp.broadcast_to(prompt_len, (b,))
    fresh = jnp.clip(prompt_len - offset, 0, chunk)
    hidden, cache = gptj.forward(
        cfg, params, emb_chunk, cache=cache, cache_index=offset,
        kv_len=fresh, remat=False, return_hidden=True, read_history=True,
    )
    last_pos = prompt_len - 1
    has_last = jnp.logical_and(last_pos >= offset, last_pos < offset + chunk)
    idx = jnp.clip(last_pos - offset, 0, chunk - 1)
    cand = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)
    last_h = jnp.where(has_last[:, None, None], cand, last_h)
    return cache, last_h


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "window", "temperature", "top_k", "top_p",
                     "eos_token", "top_p_mode"),
    donate_argnames=("cache",),
)
def _split_window(cfg, params, cache, last_logits, done, cur_len, rng,
                  step0, *, window, temperature, top_k, top_p, eos_token,
                  top_p_mode):
    """``window`` decode steps in one program.  Semantics mirror
    ``generate_tokens``'s loop body exactly (same rng folding by global
    step index, same EOS holding), so the split path is token-identical.
    The final window may compute forwards past the last needed token —
    their logits are never consumed (cost: < one window of steps)."""
    from magma_tpu.models import gptj

    def body(carry, i):
        cache, last, done, cur_len = carry
        tok = sample_token(
            jax.random.fold_in(rng, step0 + i), last,
            temperature=temperature, top_k=top_k, top_p=top_p,
            vocab_size=cfg.vocab_size, top_p_mode=top_p_mode,
        )
        tok = jnp.where(done, jnp.int32(eos_token), tok)
        done = jnp.logical_or(done, tok == eos_token)
        emb = gptj.embed_tokens(cfg, params, tok[:, None])
        logits, cache = gptj.forward(
            cfg, params, emb, cache=cache, cache_index=cur_len, remat=False,
        )
        return (cache, logits[:, -1], done, cur_len + 1), tok

    (cache, last, done, cur_len), toks = jax.lax.scan(
        body, (cache, last_logits, done, cur_len), jnp.arange(window)
    )
    return cache, last, done, cur_len, toks.T  # (b, window)


def generate_tokens_split(
    cfg,
    params,
    embeddings: jnp.ndarray,
    rng: jax.Array,
    *,
    max_steps: int = 100,
    temperature: float = 0.7,
    top_k: int = 0,
    top_p: float = 0.9,
    eos_token: int = 50256,
    prompt_len: Optional[jnp.ndarray] = None,
    top_p_mode: str = "reference",
    window: int = 8,
    prefill_chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``generate_tokens`` as TWO compiled programs — prefill and a
    reusable decode window — instead of one monolithic while-loop
    program.  Token-identical output (same rng stream, same EOS
    semantics); early exit is checked on the host at window granularity.

    Why it exists: the single-program path compiles prompt-shape-specific
    prefill INTO the decode loop, so very large (batch x context)
    combinations compile one huge program (b=8 x ctx-2048 crashed XLA's
    compile helper in round 2 — the reference's eager loop handled any
    shape, magma/sampling.py:43-121).  Splitting keeps each program small,
    reuses the decode window across prompt shapes, and bounds compile
    memory.  ``prefill_chunk > 0`` additionally runs the prefill in
    history-attention chunks, bounding prefill ACTIVATION memory too (the
    whole-prompt b=8 x ctx-2048 prefill exhausted HBM on transients).
    ``Magma.generate`` routes here automatically above a size threshold.
    """
    b, s, _ = embeddings.shape
    if prompt_len is None:
        prompt_len = jnp.int32(s)
    else:
        prompt_len = jnp.asarray(prompt_len).astype(jnp.int32)

    if prefill_chunk and s > prefill_chunk:
        C = prefill_chunk
        n_chunks = -(-s // C)
        # the final (padded) chunk writes up to n_chunks * C
        total_len = round_up(max(s + max_steps, n_chunks * C), 64)
        cache = _split_cache_init(cfg, batch=b, total_len=total_len)
        last_h = jnp.zeros(
            (b, 1, embeddings.shape[2]), cfg.compute_dtype
        )
        for ci in range(n_chunks):
            emb_c = embeddings[:, ci * C:(ci + 1) * C]
            if emb_c.shape[1] < C:
                emb_c = jnp.pad(
                    emb_c, ((0, 0), (0, C - emb_c.shape[1]), (0, 0))
                )
            cache, last_h = _split_prefill_chunk(
                cfg, params, emb_c, cache, last_h, jnp.int32(ci * C),
                prompt_len, chunk=C,
            )
        last = _split_head(cfg, params, last_h)
    else:
        cache, last = _split_prefill(
            cfg, params, embeddings, prompt_len, max_steps=max_steps,
        )
    done = jnp.zeros((b,), jnp.bool_)
    cur_len = jnp.broadcast_to(prompt_len, (b,))

    out = []
    step = 0
    while step < max_steps:
        w = min(window, max_steps - step)
        cache, last, done, cur_len, toks = _split_window(
            cfg, params, cache, last, done, cur_len, rng, jnp.int32(step),
            window=w, temperature=temperature, top_k=top_k, top_p=top_p,
            eos_token=eos_token, top_p_mode=top_p_mode,
        )
        out.append(np.asarray(toks))
        step += w
        if bool(np.asarray(done).all()):
            break

    tokens = np.concatenate(out, axis=1)
    n_steps = tokens.shape[1]
    if n_steps < max_steps:  # early exit: pad with EOS like the while-loop
        tokens = np.concatenate(
            [tokens,
             np.full((b, max_steps - n_steps), eos_token, np.int32)],
            axis=1,
        )
    return jnp.asarray(tokens), jnp.int32(min(n_steps, max_steps))


def strip_after_eos(row, eos_token: int, image_token: int):
    """Host-side post-processing mirroring remove_tokens_after_eos
    (sampling.py:33-40): truncate at the first EOS, drop image tokens."""
    out = []
    for t in [int(x) for x in row]:
        if t == eos_token:
            break
        if t != image_token:
            out.append(t)
    return out
