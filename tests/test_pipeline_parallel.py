"""Pipeline parallelism (GPipe over the YOHO encoder stack) on the faked
8-device mesh: exactness vs the sequential stack, exact-gradient training,
and DP x PP composition. SURVEY.md §2.3 extension (reference has none)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from yoho_tpu.core.config import YOHOConfig
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.parallel.pipeline import (
    make_pipeline_train_step,
    pipeline_encode,
    stack_block_params,
    unstack_block_params,
)


def _setup(n_blocks, batch=4, vocab=64):
    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=n_blocks, n_text_heads=4,
        n_text_blocks=1,
    )
    model = YOHOModel(cfg, vocab_size=vocab)
    g = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, cfg.max_audio_len, 8), jnp.float32))
    mel = jnp.asarray(
        g.standard_normal((batch, cfg.max_audio_len, 8)).astype(np.float32))
    return cfg, model, variables, mel


def _pipe_mesh(n=4):
    return Mesh(np.array(jax.devices()[:n]), ("pipe",))


@pytest.mark.parametrize("n_blocks", [4, 8])
def test_pipeline_encode_matches_single_device(n_blocks):
    """GPipe over 4 stages (1 and 2 blocks per stage) computes the SAME
    function as the sequential block stack — identical encoder output."""
    cfg, model, variables, mel = _setup(n_blocks)
    mesh = _pipe_mesh(4)

    out = np.asarray(pipeline_encode(model, variables, mel, mesh,
                                     n_microbatches=2))
    ref = np.asarray(model.apply(variables, mel,
                                 method=YOHOModel.encode_audio))
    assert out.shape == ref.shape == (4, cfg.max_audio_len // 2, cfg.dims)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pipeline_encode_guards():
    cfg, model, variables, mel = _setup(n_blocks=3)
    mesh = _pipe_mesh(4)
    with pytest.raises(ValueError, match="pipeline stages"):
        pipeline_encode(model, variables, mel, mesh, n_microbatches=2)

    cfg, model, variables, mel = _setup(n_blocks=4, batch=3)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_encode(model, variables, mel, mesh, n_microbatches=2)


def test_pipeline_train_guards():
    """The training path raises the same clear errors as pipeline_encode
    (block/stage and batch/microbatch divisibility) instead of cryptic
    reshape or shard_map failures."""
    cfg, model, variables, mel = _setup(n_blocks=3)
    mesh = _pipe_mesh(4)
    with pytest.raises(ValueError, match="pipeline stages"):
        make_pipeline_train_step(model, mesh, n_microbatches=2)

    cfg, model, variables, mel = _setup(n_blocks=4, batch=3)
    import optax
    from flax.training.train_state import TrainState

    step = make_pipeline_train_step(model, mesh, n_microbatches=2)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"],
                              tx=optax.sgd(0.1))
    tokens = jnp.zeros((3, 8), jnp.int32)
    mask = jnp.ones((3, 8), jnp.uint8)
    with pytest.raises(ValueError, match="microbatches"):
        step(state, mel, tokens, mask)


def test_stack_unstack_roundtrip():
    _, _, variables, _ = _setup(n_blocks=4)
    enc = variables["params"]["encoder"]
    stacked = stack_block_params(enc, 4)
    back = unstack_block_params(stacked, 4)
    for i in range(4):
        a = jax.tree_util.tree_leaves(enc[f"blocks_{i}"])
        b = jax.tree_util.tree_leaves(back[f"blocks_{i}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pipeline_train_step_grads_match_single_device():
    """One pipelined training step takes EXACTLY the step the single-device
    program takes: identical loss and updated params (the GPipe schedule is
    the same function; ppermute's transpose is the reverse permutation)."""
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.train.trainer import masked_ce_loss

    cfg, model, variables, mel = _setup(n_blocks=4)
    params = variables["params"]
    g = np.random.default_rng(1)
    tokens = jnp.asarray(g.integers(0, 64, size=(4, 8)).astype(np.int32))
    mask = jnp.ones((4, 8), jnp.uint8)

    tx = optax.sgd(0.1)
    mesh = _pipe_mesh(4)
    step = make_pipeline_train_step(model, mesh, n_microbatches=2)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    new_state, loss = step(state, mel, tokens, mask)

    def ref_loss(p):
        logits = model.apply({"params": p}, tokens, mel)
        return masked_ce_loss(logits, tokens, mask)

    ref_l, ref_grads = jax.value_and_grad(ref_loss)(params)
    ref_state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    ref_state = ref_state.apply_gradients(grads=ref_grads)

    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-5)
    flat_a = jax.tree_util.tree_leaves(new_state.params)
    flat_b = jax.tree_util.tree_leaves(ref_state.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_pipeline_composes_with_data_parallel():
    """A (data=2, pipe=4) mesh runs DP x PP in one shard_map: same loss and
    updated params as the single-device step (gradient psum over ``data``
    inserted by the shard_map transpose)."""
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.train.trainer import masked_ce_loss

    cfg, model, variables, mel = _setup(n_blocks=4)
    params = variables["params"]
    g = np.random.default_rng(2)
    tokens = jnp.asarray(g.integers(0, 64, size=(4, 8)).astype(np.int32))
    mask = jnp.ones((4, 8), jnp.uint8)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "pipe"))
    tx = optax.sgd(0.1)
    step = make_pipeline_train_step(model, mesh, n_microbatches=2)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    new_state, loss = step(state, mel, tokens, mask)

    def ref_loss(p):
        logits = model.apply({"params": p}, tokens, mel)
        return masked_ce_loss(logits, tokens, mask)

    ref_l, ref_grads = jax.value_and_grad(ref_loss)(params)
    ref_state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    ref_state = ref_state.apply_gradients(grads=ref_grads)

    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
