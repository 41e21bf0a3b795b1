"""Observability utility tests."""

import numpy as np

from magma_tpu.observability import StepTimer, log_table, make_grid


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            pass
    assert len(t._times) == 3  # window respected
    s = t.summary()
    assert {"step_time_p50", "step_time_p95", "steps_per_sec"} <= set(s)
    assert s["steps_per_sec"] > 0


def test_make_grid_shapes():
    g = make_grid(np.zeros((5, 3, 10, 12), np.float32), pad=1)
    assert g.shape[0] == 3
    # 3 cols x 2 rows of 10x12 tiles with 1px padding
    assert g.shape == (3, 2 * 11 + 1, 3 * 13 + 1)


def test_log_table_plaintext(capsys):
    log_table("vqa", ["a cat"], [["cat", "kitty"]], global_step=7)
    out = capsys.readouterr().out
    assert "a cat" in out and "step 7" in out


def test_quantize_for_serving_facade():
    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma

    cfg = MultimodalConfig(
        batch_size=1, train_steps=1, encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal",
                                "downsample_factor": 4}},
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=128,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=32),
        image_size=32,
    )
    m = Magma(cfg)
    emb = m.embed([np.zeros((1, 3, 32, 32), np.float32)])
    greedy_before = m.generate(emb, max_steps=3, temperature=0.0,
                               decode=False)
    m.quantize_for_serving()
    assert "lm_head_q" in m.params["lm"]
    greedy_after = m.generate(emb, max_steps=3, temperature=0.0,
                              decode=False)
    # int8 weight-only is ~lossless: greedy tokens unchanged on a tiny model
    np.testing.assert_array_equal(np.asarray(greedy_before),
                                  np.asarray(greedy_after))


def test_metric_logger_image_grid(tmp_path):
    """MetricLogger.log_image writes a PNG grid + JSONL record (parity:
    reference train.py:176-180 wandb.Image of eval captions)."""
    import json

    from magma_tpu.config import MultimodalConfig
    from magma_tpu.observability import make_grid
    from train import MetricLogger

    cfg = MultimodalConfig(batch_size=1, train_steps=1,
                           save=str(tmp_path), wandb_project=None)
    logger = MetricLogger(cfg)
    images = np.random.RandomState(0).rand(4, 3, 8, 8).astype(np.float32)
    grid = make_grid(images)
    assert grid.shape[0] == 3
    logger.log_image("inference/images", grid, step=5, caption="cap text")

    pngs = list(tmp_path.glob("*.png"))
    assert len(pngs) == 1 and "step5" in pngs[0].name
    records = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    rec = [r for r in records if "inference/images" in r]
    assert rec and rec[0]["inference/images/caption"] == "cap text"


def test_summarize_trace_cpu(tmp_path):
    """profile_trace + summarize_trace round-trip on the CPU backend."""
    import jax
    import jax.numpy as jnp
    import pytest

    from magma_tpu.observability import profile_trace, summarize_trace

    logdir = str(tmp_path / "trace")
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((256, 256))
    float(f(x))  # compile outside the trace
    with profile_trace(logdir):
        for _ in range(3):
            float(f(x))
    try:
        rows = summarize_trace(logdir, top=5)
    except ImportError:
        pytest.skip("tensorflow xplane protos unavailable")
    assert rows and all(
        {"plane", "line", "op", "total_ms", "count"} <= set(r) for r in rows
    )
    assert rows[0]["total_ms"] >= rows[-1]["total_ms"]


def test_quantize_for_serving_int4_facade():
    from magma_tpu.config import MultimodalConfig
    from magma_tpu.models.magma import Magma

    cfg = MultimodalConfig(
        batch_size=1, train_steps=1, encoder_name="clip_resnet_large",
        adapter_config={"mlp": {"adapter_type": "normal",
                                "downsample_factor": 4}},
        lm_overrides=dict(n_layers=2, n_heads=4, d_model=128, d_ff=512,
                          rotary_dim=16, max_seq_len=128,
                          attention_impl="xla", remat=False),
        encoder_overrides=dict(width=16, blocks=(1, 1, 1, 1),
                               input_resolution=32),
        image_size=32,
    )
    m = Magma(cfg)
    emb = m.embed([np.zeros((1, 3, 32, 32), np.float32)])
    m.quantize_for_serving(bits=4)
    assert "q4" in m.params["lm"]["blocks"]["attn"]["in_proj"]
    toks = m.generate(emb, max_steps=3, temperature=0.0, decode=False)
    assert np.asarray(toks).shape == (1, 3)
