"""Gradient checkpointing (remat) is EXACT: same params, same loss, same
grads, same decode — only the backward-pass memory/FLOP trade changes.

The reference has no training-memory lever at all (torch defaults,
``train/run_train_session.py``); remat is the TPU-first one — jax.checkpoint
per transformer block keeps activation memory O(1) in depth so bigger
batches fit a fixed HBM budget.
"""

import jax
import jax.numpy as jnp
import numpy as np

from yoho_tpu.core.config import WhisperConfig, YOHOConfig
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.nn.yoho import YOHOModel
from yoho_tpu.train.trainer import masked_ce_loss


def _yoho_cfg(**overrides):
    kw = dict(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=2,
    )
    kw.update(overrides)
    return YOHOConfig(**kw)


def _loss_and_grads(model, params, tokens, mel, loss_mask):
    def loss_fn(p):
        logits = model.apply({"params": p}, tokens, mel)
        return masked_ce_loss(logits, tokens, loss_mask)

    return jax.jit(jax.value_and_grad(loss_fn))(params)


def test_yoho_remat_is_exact():
    cfg = _yoho_cfg()
    plain = YOHOModel(cfg, vocab_size=64)
    remat = YOHOModel(cfg, vocab_size=64, remat=True)

    g = np.random.default_rng(0)
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    loss_mask = jnp.ones((2, 8), jnp.uint8)

    p0 = plain.init(jax.random.PRNGKey(0), tokens, mel)["params"]
    p1 = remat.init(jax.random.PRNGKey(0), tokens, mel)["params"]

    # Lifted remat must not rename or reshape anything: checkpoints are
    # interchangeable between remat on/off.
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))
    jax.tree_util.tree_map(np.testing.assert_array_equal, p0, p1)

    l0, g0 = _loss_and_grads(plain, p0, tokens, mel, loss_mask)
    l1, g1 = _loss_and_grads(remat, p0, tokens, mel, loss_mask)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g0, g1)


def test_yoho_remat_moe_aux_losses_survive():
    """remat lifts the MoE blocks' sown aux losses too (trainer path)."""
    from yoho_tpu.nn.moe import collect_aux_losses

    cfg = _yoho_cfg(n_experts=2, moe_every_n=2, moe_top_k=1)
    g = np.random.default_rng(1)
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    loss_mask = jnp.ones((2, 8), jnp.uint8)

    results = {}
    for flag in (False, True):
        model = YOHOModel(cfg, vocab_size=64, remat=flag)
        params = model.init(jax.random.PRNGKey(0), tokens, mel)["params"]

        def loss_fn(p):
            logits, st = model.apply({"params": p}, tokens, mel,
                                     mutable=["intermediates"])
            aux = collect_aux_losses(st["intermediates"])
            return masked_ce_loss(logits, tokens, loss_mask) + 0.01 * aux

        results[flag] = jax.jit(jax.value_and_grad(loss_fn))(params)

    np.testing.assert_allclose(np.asarray(results[False][0]),
                               np.asarray(results[True][0]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        results[False][1], results[True][1])


def test_yoho_remat_decode_path_unchanged():
    """The KV-cached decode methods (step/cross_kv — never differentiated)
    still run on a remat model and match the plain model token-for-token."""
    from yoho_tpu.infer.decode import greedy_decode, make_yoho_step_fn

    cfg = _yoho_cfg()
    g = np.random.default_rng(2)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    prompt = jnp.zeros((2, 1), jnp.int32)

    outs = {}
    for flag in (False, True):
        model = YOHOModel(cfg, vocab_size=64, remat=flag)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 8), jnp.int32),
                               jnp.zeros((1, 32, 8), jnp.float32),
                               method=YOHOModel.forward_with_voiceprints)
        xa = model.apply(variables, mel, method=YOHOModel.encode_audio)
        ckv = model.apply(variables, xa, method=YOHOModel.cross_kvs)
        caches = model.apply(variables, 2, jnp.float32,
                             method=YOHOModel.init_caches)
        step = make_yoho_step_fn(model, variables, ckv)
        tokens, lengths = greedy_decode(step, caches, prompt,
                                        cfg.max_text_len, eot_id=63)
        outs[flag] = (np.asarray(tokens), np.asarray(lengths))

    np.testing.assert_array_equal(outs[False][0], outs[True][0])
    np.testing.assert_array_equal(outs[False][1], outs[True][1])


def test_long_context_remat_is_exact():
    """The sequence-parallel (ring) training path honors model.remat and
    stays the same function: identical loss and grads on the faked mesh."""
    from jax.sharding import Mesh

    from yoho_tpu.parallel.long_encoder import make_long_context_loss_fn

    cfg = _yoho_cfg(n_audio_blocks=1, n_text_blocks=1)
    g = np.random.default_rng(4)
    mel = jnp.asarray(g.standard_normal((2, cfg.max_audio_len * 2, 8))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.uint8)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))

    results = {}
    for flag in (False, True):
        model = YOHOModel(cfg, vocab_size=64, remat=flag)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 8), jnp.int32),
                            jnp.zeros((1, cfg.max_audio_len, 8),
                                      jnp.float32))["params"]
        loss_fn = make_long_context_loss_fn(model, mesh)
        results[flag] = jax.jit(jax.value_and_grad(loss_fn))(
            params, mel, tokens, mask)

    np.testing.assert_allclose(np.asarray(results[False][0]),
                               np.asarray(results[True][0]), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5),
        results[False][1], results[True][1])


def test_whisper_remat_is_exact():
    cfg = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=4,
        n_audio_layer=2, n_vocab=50, n_text_ctx=32, n_text_state=32,
        n_text_head=4, n_text_layer=2,
    )
    g = np.random.default_rng(3)
    mel = jnp.asarray(g.standard_normal((2, cfg.n_audio_ctx * 2, 8))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 50, size=(2, 6)).astype(np.int32))
    loss_mask = jnp.ones((2, 6), jnp.uint8)

    plain = Whisper(cfg)
    remat = Whisper(cfg, remat=True)
    p0 = plain.init(jax.random.PRNGKey(0), mel, tokens)["params"]
    p1 = remat.init(jax.random.PRNGKey(0), mel, tokens)["params"]
    assert (jax.tree_util.tree_structure(p0)
            == jax.tree_util.tree_structure(p1))

    def make_loss(model):
        def loss_fn(p):
            logits = model.apply({"params": p}, mel, tokens)
            return masked_ce_loss(logits, tokens, loss_mask)
        return jax.jit(jax.value_and_grad(loss_fn))

    l0, g0 = make_loss(plain)(p0)
    l1, g1 = make_loss(remat)(p0)
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5), g0, g1)


def test_training_hp_parses_remat():
    from yoho_tpu.core.config import TrainingASRHP

    hp = TrainingASRHP.model_validate({"remat": True})
    assert hp.remat is True
    assert TrainingASRHP().remat is False
