"""Orbax checkpoint save/resume round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from magma_tpu.training import checkpoint as ckpt


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "lm": {"wte": jax.random.normal(k, (8, 4))},
        "image_prefix": {"proj": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)}},
    }


def test_save_restore_roundtrip(tmp_path):
    params = _tree(1)
    state = {"image_prefix": {"enc": {"bn": {"mean": jnp.ones(3)}}}}
    opt_state = {"mu": jnp.full((2,), 0.5)}

    ckpt.save_checkpoint(str(tmp_path), 42, params, state, opt_state)
    assert (tmp_path / "latest").read_text() == "step_42"

    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    state_t = jax.tree_util.tree_map(jnp.zeros_like, state)
    opt_t = jax.tree_util.tree_map(jnp.zeros_like, opt_state)
    p2, s2, o2, step = ckpt.load_checkpoint(str(tmp_path), template, state_t, opt_t)
    assert step == 42
    np.testing.assert_array_equal(
        np.asarray(p2["lm"]["wte"]), np.asarray(params["lm"]["wte"])
    )
    np.testing.assert_array_equal(
        np.asarray(o2["mu"]), np.asarray(opt_state["mu"])
    )


def test_load_missing_returns_step_zero(tmp_path):
    p, s, o, step = ckpt.load_checkpoint(str(tmp_path / "nope"), _tree(), None, None)
    assert step == 0 and p is None


def test_latest_tag_picks_newest(tmp_path):
    params = _tree(1)
    ckpt.save_checkpoint(str(tmp_path), 1, params)
    params2 = jax.tree_util.tree_map(lambda x: x + 1, params)
    ckpt.save_checkpoint(str(tmp_path), 2, params2)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    p, _, _, step = ckpt.load_checkpoint(str(tmp_path), template)
    assert step == 2
    np.testing.assert_array_equal(
        np.asarray(p["lm"]["wte"]), np.asarray(params2["lm"]["wte"])
    )


def test_restore_params_inference(tmp_path):
    params = _tree(3)
    ckpt.save_checkpoint(str(tmp_path), 7, params)
    template = jax.tree_util.tree_map(jnp.zeros_like, params)
    p, s = ckpt.restore_params(str(tmp_path), template, None)
    np.testing.assert_array_equal(
        np.asarray(p["lm"]["wte"]), np.asarray(params["lm"]["wte"])
    )
