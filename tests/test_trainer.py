"""Trainer integration tests on the 8-device virtual CPU mesh: sharded
train step (dp x tp), grad accumulation, frozen-LM partition, overfit,
checkpoint resume, loader."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from magma_tpu.config import MultimodalConfig
from magma_tpu.models.magma import Magma
from magma_tpu.parallel.mesh import make_mesh
from magma_tpu.parallel.partition import combine, partition
from magma_tpu.training.train_loop import Trainer


def _config(**kw):
    base = dict(
        batch_size=8, train_steps=10, gradient_accumulation_steps=2,
        lr=2e-3, warmup_num_steps=2,
        encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal", "downsample_factor": 4}},
        use_image_embed_layernorm=True,
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=64,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=32),
        mesh_dp=4, mesh_tp=2, image_size=32,
    )
    base.update(kw)
    return MultimodalConfig(**base)


def _batch(seed=0, b=8, s=64):
    rng = np.random.RandomState(seed)
    images = rng.rand(b, 3, 32, 32).astype(np.float32)
    caps = np.full((b, s), 50256, np.int32)
    for i in range(b):
        caps[i, :6] = rng.randint(0, 50000, 6)
    return images, caps


@pytest.fixture(scope="module")
def trainer():
    cfg = _config()
    return Trainer(Magma(cfg), cfg)


def test_partition_combine_roundtrip():
    params = {"a": jnp.ones(2), "b": {"c": jnp.zeros(3), "d": jnp.ones(1)}}
    mask = {"a": True, "b": {"c": False, "d": True}}
    t, f = partition(params, mask)
    assert t["b"]["c"] is None and f["a"] is None
    merged = combine(t, f)
    assert jax.tree_util.tree_structure(merged) == jax.tree_util.tree_structure(params)
    np.testing.assert_array_equal(np.asarray(merged["b"]["c"]), np.zeros(3))


@pytest.mark.slow  # ~200 s on the 1-core sandbox: the 10-step overfit gate
def test_train_loss_decreases(trainer):
    images, caps = _batch()
    losses = [trainer.train_step(images, caps) for _ in range(5)]
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] - 0.1, losses


def test_frozen_lm_not_updated(trainer):
    """The frozen tree must be byte-identical after training steps."""
    before = np.asarray(trainer.frozen["lm"]["wte"]).copy()
    images, caps = _batch(seed=1)
    trainer.train_step(images, caps)
    np.testing.assert_array_equal(np.asarray(trainer.frozen["lm"]["wte"]), before)


def test_eval_step(trainer):
    images, caps = _batch(seed=2)

    def loader():
        while True:
            yield images, caps

    loss = trainer.eval_step(loader(), eval_steps=2)
    assert np.isfinite(loss)


def test_run_blind_changes_loss():
    cfg = _config(run_blind=True)
    tr = Trainer(Magma(cfg), cfg)
    images, caps = _batch()
    loss_blind = tr.train_step(images, caps)
    assert np.isfinite(loss_blind)


def test_save_load_resume(tmp_path, trainer):
    images, caps = _batch(seed=3)

    def loader():
        while True:
            yield images, caps

    ref_eval = trainer.eval_step(loader(), eval_steps=1)
    trainer.save(str(tmp_path))

    cfg = _config()
    tr2 = Trainer(Magma(cfg), cfg)
    step = tr2.load(str(tmp_path))
    assert step == trainer.global_step
    resumed_eval = tr2.eval_step(loader(), eval_steps=1)
    assert abs(resumed_eval - ref_eval) < 1e-3


def test_inference_step_generates(trainer):
    images, caps = _batch(seed=4)

    def loader():
        while True:
            yield images, caps

    imgs, text = trainer.inference_step(loader(), max_images=1, max_steps=3,
                                        temperature=0.0)
    assert "Caption 0:" in text


def test_batch_loader(tmp_path):
    """BatchLoader assembles (ga, micro, ...) batches from a dataset."""
    from magma_tpu.data.loader import BatchLoader

    class FakeDS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            img = np.full((1, 3, 8, 8), i, np.float32)
            cap = np.full((1, 32), i, np.int32)
            return img, cap

    loader = BatchLoader(FakeDS(), batch_size=8, gradient_accumulation_steps=2,
                         seq_len=32, num_workers=2)
    images, captions = next(loader)
    assert images.shape == (2, 4, 3, 8, 8)
    assert captions.shape == (2, 4, 32)
    loader.close()


def test_batch_loader_slow_consumer_drops_nothing():
    """A full prefetch queue must block the producer, not discard built
    batches: with shuffle off, consumed batches stay in dataset order."""
    import time

    from magma_tpu.data.loader import BatchLoader

    class FakeDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            img = np.full((1, 3, 4, 4), i, np.float32)
            cap = np.full((1, 8), i, np.int32)
            return img, cap

    loader = BatchLoader(FakeDS(), batch_size=4, gradient_accumulation_steps=1,
                         seq_len=8, num_workers=2, shuffle=False, prefetch=1)
    time.sleep(2.0)  # let the producer build ahead and hit queue.Full
    seen = []
    for _ in range(4):
        _, captions = next(loader)
        seen.extend(captions[0, :, 0].tolist())
    loader.close()
    assert seen == list(range(16)), f"batches dropped or reordered: {seen}"


def test_grad_accum_with_bf16_adapters_qlora():
    """ga>1 + train_lm_int8 (bf16 adapter params): the fp32 grad
    accumulators must be cast back to param dtype before the optimizer —
    fp32 grads against bf16 Adam state promote the updated mu/nu and trip
    optax.apply_if_finite's cond dtype check (regression: bench.py stage
    6, the seq-2048 ga=2 recipe step, failed to trace)."""
    cfg = _config(
        gradient_accumulation_steps=2, train_steps=2,
        freeze_lm=True, freeze_img_encoder=True, train_lm_int8=True,
    )
    tr = Trainer(Magma(cfg), cfg)
    images, caps = _batch(b=8)
    l0 = tr.train_step(images, caps)
    l1 = tr.train_step(images, caps)
    assert np.isfinite(l0) and np.isfinite(l1)
