"""build_labels parity with the reference's python-loop semantics
(magma/utils.py:334-364)."""

import numpy as np
import jax.numpy as jnp

from magma_tpu.training.labels import IGNORE, build_labels, causal_lm_loss


def reference_build_labels(image_seq_len, captions, eos):
    """Direct O(b*s) transcription of the documented semantics, used as the
    oracle for the vectorized implementation."""
    b, s = captions.shape
    labels = np.concatenate(
        [np.full((b, image_seq_len), IGNORE), captions[:, : s - image_seq_len]],
        axis=1,
    )
    for row in labels:
        for k, token in enumerate(row):
            if token == eos:
                row[k + 1:] = IGNORE
                break
    return labels


def test_build_labels_matches_loop_oracle():
    rng = np.random.RandomState(0)
    for _ in range(5):
        b, s, img = 3, 32, 5
        eos = 50256
        cap = rng.randint(0, 100, (b, s)).astype(np.int32)
        # place eos in random positions + right padding
        for row in cap:
            k = rng.randint(3, s - 2)
            row[k:] = eos
        expected = reference_build_labels(img, cap.copy(), eos)
        got = np.asarray(build_labels(img, jnp.asarray(cap), eos))
        np.testing.assert_array_equal(got, expected)


def test_image_positions_ignored():
    cap = np.full((1, 16), 50256, np.int32)
    cap[0, :4] = [1, 2, 3, 4]
    labels = np.asarray(build_labels(6, jnp.asarray(cap), 50256))
    assert (labels[0, :6] == IGNORE).all()
    # first real eos (position 6+4=10) is kept as a learning target
    assert labels[0, 10] == 50256
    assert (labels[0, 11:] == IGNORE).all()


def test_loss_ignores_masked_positions():
    b, s, v = 2, 8, 16
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(b, s, v).astype(np.float32))
    labels = np.full((b, s), IGNORE, np.int32)
    labels[:, 3] = 5
    loss = causal_lm_loss(logits, jnp.asarray(labels), vocab_size=v)
    # manual: only target at shifted position 3 counts (predicted from pos 2)
    lg = np.asarray(logits)[:, 2]
    expected = np.mean(
        [np.log(np.exp(row).sum()) - row[5] for row in lg]
    )
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_loss_masks_padded_vocab():
    b, s = 1, 4
    logits = np.zeros((b, s, 10), np.float32)
    logits[..., 8:] = 50.0  # huge logits in padded columns
    labels = np.array([[1, 1, 1, 1]], np.int32)
    loss_masked = causal_lm_loss(jnp.asarray(logits), jnp.asarray(labels), vocab_size=8)
    # with padding masked the distribution is uniform over 8
    np.testing.assert_allclose(float(loss_masked), np.log(8), rtol=1e-5)
