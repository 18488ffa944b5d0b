"""Distributed paths without a cluster (SURVEY.md §4): tensor/data-parallel
inference and the graft entry multichip dryrun on the faked 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.parallel.mesh import make_mesh, shard_batch
from yoho_tpu.parallel.sharding import WHISPER_RULES, shard_params


@pytest.fixture(scope="module")
def setup():
    cfg = WhisperConfig(
        n_mels=8, n_audio_ctx=16, n_audio_state=32, n_audio_head=4, n_audio_layer=2,
        n_vocab=64, n_text_ctx=16, n_text_state=32, n_text_head=4, n_text_layer=2,
    )
    model = Whisper(cfg)
    g = np.random.default_rng(0)
    mel = g.standard_normal((4, cfg.n_audio_ctx * 2, cfg.n_mels)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(mel[:1]),
                           jnp.zeros((1, 4), jnp.int32))
    return cfg, model, variables, mel


def _decode(model, variables, mel, batch):
    prompt = jnp.ones((batch, 2), jnp.int32)

    def run(variables, mel):
        xa = model.apply(variables, mel, method=Whisper.encode_audio)
        ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
        caches = model.apply(variables, batch, jnp.float32, method=Whisper.init_caches)
        step = make_whisper_step_fn(model, variables, ckv)
        return greedy_decode(step, caches, prompt, 12, eot_id=63)

    return jax.jit(run)(variables, mel)


def test_tp_dp_inference_matches_single_device(setup):
    """Model sharded over a (data=2, model=4) mesh decodes the exact same
    tokens as the unsharded model — the whisper-large-on-v5e-8 serving
    config exercised on fake devices."""
    cfg, model, variables, mel = setup

    ref_tokens, ref_lengths = _decode(model, variables, jnp.asarray(mel), 4)

    mesh = make_mesh(data=2, model=4)
    sharded_vars = {"params": shard_params(variables["params"], mesh, WHISPER_RULES)}
    mel_sharded = shard_batch(mesh, mel)
    out_tokens, out_lengths = _decode(model, sharded_vars, mel_sharded, 4)

    np.testing.assert_array_equal(np.asarray(ref_tokens), np.asarray(out_tokens))
    np.testing.assert_array_equal(np.asarray(ref_lengths), np.asarray(out_lengths))


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.ndim == 3
