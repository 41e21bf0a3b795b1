"""End-to-end Magma facade tests on a tiny config."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from magma_tpu.data.image_input import ImageInput
from magma_tpu.utils import count_parameters


def _fake_image_input(w=120, h=80, seed=0):
    rng = np.random.RandomState(seed)
    img = Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8))
    fake = ImageInput.__new__(ImageInput)
    fake.pil_image = img
    fake.path_or_url = "<synthetic>"
    return fake


def test_preprocess_inputs_order_preserving(tiny_magma):
    """Mixed image/text prompts embed in order (magma.py:195-212);
    1 image (4 tokens at 64px/RN) + text -> (1, 4 + n_text, d)."""
    embs = tiny_magma.preprocess_inputs(
        [_fake_image_input(), "Describe the painting:"]
    )
    n_text = tiny_magma.tokenizer.encode("Describe the painting:").shape[1]
    assert embs.shape == (1, 4 + n_text, tiny_magma.lm_config.d_model)


def test_preprocess_inputs_rejects_bad_type(tiny_magma):
    with pytest.raises(Exception):
        tiny_magma.preprocess_inputs([42])


def test_generate_returns_strings(tiny_magma):
    embs = tiny_magma.preprocess_inputs([_fake_image_input(), "hi"])
    out = tiny_magma.generate(embs, max_steps=4, temperature=0.7, top_k=5,
                              top_p=0.9, rng=jax.random.PRNGKey(0))
    assert isinstance(out, list) and len(out) == 1
    assert isinstance(out[0], str)
    toks = tiny_magma.generate(embs, max_steps=4, temperature=0.0,
                               decode=False)
    assert toks.shape == (1, 4)


def test_loss_at_init_is_log_vocab(tiny_magma, caption_batch):
    """Untrained model -> loss ~ ln(vocab_size)."""
    images = np.random.RandomState(0).rand(2, 3, 64, 64).astype(np.float32)
    loss, logits = tiny_magma.forward(images, caption_batch)
    assert logits.shape[1] == tiny_magma.seq_len
    assert abs(float(loss) - np.log(50258)) < 1.0


def test_forward_asserts(tiny_magma, caption_batch):
    images = np.zeros((2, 3, 64, 64), np.float32)
    with pytest.raises(AssertionError):
        tiny_magma.forward(None, caption_batch)  # neither images nor embeds
    with pytest.raises(AssertionError):
        tiny_magma.forward(images, caption_batch[:, :64])  # wrong seq len


def test_trainable_mask_freezing(tiny_magma):
    mask = tiny_magma.trainable_mask()
    total = count_parameters(tiny_magma.params)
    trainable = count_parameters(tiny_magma.params, mask)
    assert 0 < trainable < total
    # adapters trainable, LM frozen
    assert mask["lm"]["wte"] is False
    assert mask["lm"]["blocks"]["attn"]["q"] is False

    def all_true(tree):
        return all(jax.tree_util.tree_leaves(tree))

    assert all_true(mask["lm"]["blocks"]["adapter_mlp"])
    assert all_true(mask["lm"]["blocks"]["adapter_attn"])
    assert all_true(mask["image_prefix"]["proj"])
    # encoder frozen by default (freeze_img_encoder=True)
    assert not any(jax.tree_util.tree_leaves(mask["image_prefix"]["enc"]))


def test_embed_rejects_3d(tiny_magma):
    with pytest.raises(ValueError):
        tiny_magma.embed([jnp.zeros((1, 2, 3))])
