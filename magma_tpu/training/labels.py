"""Label construction + LM loss.

Parity target: magma/utils.py:334-364 (build_labels) and the HF
``labels=`` causal-LM loss the reference relies on (magma/magma.py:270-274):
shift-by-one cross entropy, ignore_index=-100, mean over non-ignored
positions.

The reference masks everything after the first EOS with an O(b*s) python
double loop (utils.py:357-362); here it's a vectorized cumulative mask —
one XLA op chain, runs on device inside the jitted train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IGNORE = -100


def build_labels(
    image_seq_len: int,
    captions: jnp.ndarray,  # (b, seq_len) int32, right-padded with EOS
    eos_token: int,
) -> jnp.ndarray:
    """(b, seq_len) labels: IGNORE over the image-prefix positions, then the
    caption truncated so total length == seq_len; every position *after*
    the first EOS is IGNORE (the first EOS itself is learned).
    """
    b, s = captions.shape
    prefix = jnp.full((b, image_seq_len), IGNORE, jnp.int32)
    labels = jnp.concatenate(
        [prefix, captions[:, : s - image_seq_len].astype(jnp.int32)], axis=1
    )

    # vectorized "mask strictly after the first EOS":
    is_eos = labels == eos_token
    seen_eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos.astype(
        jnp.int32
    )  # count of EOS in positions < current
    return jnp.where(seen_eos_before > 0, IGNORE, labels)


def causal_lm_loss_chunked(
    cfg,
    lm_params,
    hidden: jnp.ndarray,   # (b, s, D) post-ln_f hidden states
    labels: jnp.ndarray,   # (b, s) int32 with IGNORE
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Shifted cross entropy computed per sequence chunk so the full
    (b, s, 50304) fp32 logits tensor never materializes — the chunk's
    logits are produced, consumed, and (via remat) recomputed in the
    backward pass.  Saves >1 GB peak HBM for GPT-J at seq 2048, which is
    the margin that lets full-scale adapter finetuning fit one 16 GB chip.
    """
    from magma_tpu.models import gptj

    b, s, d = hidden.shape
    h = hidden[:, :-1]
    targets = labels[:, 1:]

    pad = (-h.shape[1]) % chunk_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
        targets = jnp.pad(targets, ((0, 0), (0, pad)), constant_values=IGNORE)
    n_chunks = h.shape[1] // chunk_size
    h = h.reshape(b, n_chunks, chunk_size, d).swapaxes(0, 1)
    targets = targets.reshape(b, n_chunks, chunk_size).swapaxes(0, 1)

    @jax.checkpoint
    def chunk_nll(h_c, t_c):
        logits = gptj.lm_head(cfg, lm_params, h_c)       # (b, c, V) fp32
        col = jnp.arange(logits.shape[-1])
        logits = jnp.where(col < cfg.vocab_size, logits, -1e30)
        valid = t_c != IGNORE
        safe_t = jnp.where(valid, t_c, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        true_logit = jnp.take_along_axis(logits, safe_t[..., None], axis=-1)[..., 0]
        return ((logz - true_logit) * valid).sum(), valid.sum()

    def body(carry, xs):
        nll, cnt = carry
        h_c, t_c = xs
        n, c = chunk_nll(h_c, t_c)
        return (nll + n, cnt + c), None

    (nll, count), _ = jax.lax.scan(body, (0.0, jnp.int32(0)), (h, targets))
    return nll / jnp.maximum(count, 1)


def causal_lm_loss(
    logits: jnp.ndarray,   # (b, s, V) fp32 (possibly vocab-padded)
    labels: jnp.ndarray,   # (b, s) int32 with IGNORE
    vocab_size: int,
) -> jnp.ndarray:
    """Shifted cross entropy, mean over valid positions.  Matches the HF
    CausalLM loss semantics the reference gets from ``labels=``."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]

    if logits.shape[-1] > vocab_size:
        col = jnp.arange(logits.shape[-1])
        logits = jnp.where(col < vocab_size, logits, -1e30)

    valid = targets != IGNORE
    safe_targets = jnp.where(valid, targets, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(
        logits, safe_targets[..., None], axis=-1
    )[..., 0]
    nll = (logz - true_logit) * valid
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count
