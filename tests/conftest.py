"""Test fixtures: force an 8-device virtual CPU mesh.

Multi-device behavior (pjit sharding, psum reductions, checkpoint
resharding) is tested portably via XLA's host-device virtualization —
no TPU needed, per SURVEY.md §4.
"""

import os

# must run before jax is imported anywhere in the test process
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# hide XLA:CPU AOT cache-load machine-feature warnings (benign: the cache
# stores AOT results keyed on the exact host; mismatches just re-compile)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

import jax  # noqa: E402

# the env var alone is not honored when a TPU plugin (axon) is attached;
# the config update is authoritative
jax.config.update("jax_platforms", "cpu")

# XLA:CPU compiles are expensive on this single-core sandbox (~20 s for a
# tiny tower init); a persistent on-disk cache makes every re-run — and
# every repeated identical program within one run — near-instant
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_lm_config():
    from magma_tpu.models.gptj import GPTJConfig

    return GPTJConfig.tiny()


@pytest.fixture(scope="session")
def tiny_multimodal_config():
    from magma_tpu.config import MultimodalConfig

    return MultimodalConfig(
        batch_size=2,
        train_steps=4,
        encoder_name="clip_resnet_large",
        adapter_config={
            "mlp": {"adapter_type": "normal", "downsample_factor": 4},
            "attention": {"adapter_type": "scaled_parallel", "downsample_factor": 8},
        },
        use_image_embed_layernorm=True,
        image_embed_dropout_prob=0.1,
        lm_overrides=dict(
            n_layers=2, n_heads=4, d_model=128, d_ff=512, rotary_dim=16,
            max_seq_len=128, attention_impl="xla", remat=False,
        ),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1), input_resolution=64),
        image_size=64,
    )


@pytest.fixture(scope="session")
def tiny_magma(tiny_multimodal_config):
    from magma_tpu.models.magma import Magma

    return Magma(tiny_multimodal_config)


@pytest.fixture()
def caption_batch():
    """(b=2, seq=128) captions: a few real tokens then EOS padding."""
    cap = np.full((2, 128), 50256, np.int32)
    cap[0, :5] = [10, 20, 30, 40, 50]
    cap[1, :3] = [7, 8, 9]
    return cap
