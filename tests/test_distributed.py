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


def test_ring_attention_matches_full_softmax():
    """Sequence-parallel ring attention over an 8-way 'seq' axis is EXACT
    (to f32 accumulation tolerance) vs single-device softmax attention."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from yoho_tpu.parallel.ring_attention import ring_attention

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("seq",))
    b, h, s, d = 2, 3, 64, 16  # s divisible by 8 -> 8 frames per shard
    g = np.random.default_rng(0)
    q = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(g.standard_normal((b, h, s, d)).astype(np.float32))

    spec = P(None, None, "seq", None)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec)
    def ring(q, k, v):
        return ring_attention(q, k, v, axis_name="seq")

    out = np.asarray(ring(q, k, v))

    scale = d ** -0.5
    scores = np.einsum("bhsd,bhtd->bhst", np.asarray(q) * scale, np.asarray(k))
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bhst,bhtd->bhsd", w, np.asarray(v))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_ring_attention_bf16_stats_in_f32():
    """bf16 inputs still accumulate softmax statistics in f32: the result
    matches the f32 reference to bf16 resolution."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    from yoho_tpu.parallel.ring_attention import ring_attention

    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    b, h, s, d = 1, 2, 32, 8
    g = np.random.default_rng(1)
    q = g.standard_normal((b, h, s, d)).astype(np.float32)
    k = g.standard_normal((b, h, s, d)).astype(np.float32)
    v = g.standard_normal((b, h, s, d)).astype(np.float32)

    spec = P(None, None, "seq", None)

    @jax.jit
    @partial(shard_map, mesh=mesh, in_specs=(spec, spec, spec),
             out_specs=spec)
    def ring(q, k, v):
        return ring_attention(q, k, v, axis_name="seq")

    out_bf16 = np.asarray(ring(jnp.asarray(q, jnp.bfloat16),
                               jnp.asarray(k, jnp.bfloat16),
                               jnp.asarray(v, jnp.bfloat16)).astype(jnp.float32))
    scale = d ** -0.5
    scores = np.einsum("bhsd,bhtd->bhst", q * scale, k)
    w = np.exp(scores - scores.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bhst,bhtd->bhsd", w, v)
    np.testing.assert_allclose(out_bf16, ref, atol=0.05, rtol=0.05)


def test_yoho_long_encoder_matches_single_device():
    """Sequence-parallel YOHO encoding (ring attention + global RoPE
    offsets, time axis sharded 8 ways) equals the single-device encode of
    the same long sequence — same checkpoint, same function."""
    from jax.sharding import Mesh

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.long_encoder import yoho_encode_long

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=1,
    )
    model = YOHOModel(cfg, vocab_size=300)
    g = np.random.default_rng(0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, cfg.max_audio_len, 8), jnp.float32))

    # 4x the trained window: RoPE extends, learned tables would not.
    long_mel = jnp.asarray(
        g.standard_normal((2, cfg.max_audio_len * 4, 8)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    sharded = np.asarray(yoho_encode_long(model, variables, long_mel, mesh))

    ref = np.asarray(model.apply(variables, long_mel,
                                 method=YOHOModel.encode_audio))
    assert sharded.shape == ref.shape == (2, cfg.max_audio_len * 2, cfg.dims)
    np.testing.assert_allclose(sharded, ref, atol=2e-5)

    # Divisibility guard: a length the axis cannot split evenly raises.
    import pytest as _pytest
    bad = jnp.zeros((1, cfg.max_audio_len + 2, 8), jnp.float32)
    with _pytest.raises(ValueError, match="must divide"):
        yoho_encode_long(model, variables, bad, mesh)


def test_long_context_train_step_grads_match_single_device():
    """One long-context training step (ring-encoder under shard_map) takes
    EXACTLY the step the single-device program takes: identical loss and
    updated params (ppermute's transpose is the reverse permutation)."""
    import optax
    from flax.training.train_state import TrainState
    from jax.sharding import Mesh

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.long_encoder import make_long_context_train_step
    from yoho_tpu.train.trainer import masked_ce_loss

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
    )
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(0)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.zeros((1, cfg.max_audio_len, 8), jnp.float32))["params"]
    # 2x the trained window, sharded 4 ways.
    mel = jnp.asarray(g.standard_normal((2, cfg.max_audio_len * 2, 8))
                      .astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    mask = jnp.ones((2, 8), jnp.uint8)

    tx = optax.sgd(0.1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    step = make_long_context_train_step(model, mesh)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    new_state, loss = step(state, mel, tokens, mask)

    # Single-device reference step on the same long clip.
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


def test_sharded_quantized_serving_matches_single_device():
    """The claimed large-v3-on-v5e-8 serving config — TPxDP mesh WITH int8
    cross-KV and quantized decode caches (``infer/pipeline.py:132-137``) —
    decodes the exact tokens of the unsharded quantized Transcriber, and
    the quantized cross-KV is genuinely sharded (not silently replicated)."""
    from yoho_tpu.core.config import WhisperConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=16, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    g = np.random.default_rng(1)
    audio = (0.1 * g.standard_normal(cfg.n_samples * 2)).astype(np.float32)

    kw = dict(family="whisper", token_table=table, batch_size=2,
              quantized_cross_kv="int8", quantized_cache=True)
    plain = Transcriber(model, variables, **kw)
    mesh = make_mesh(data=2, model=4)
    sharded = Transcriber(model, variables, mesh=mesh, **kw)

    r_plain = plain.transcribe(audio)
    r_shard = sharded.transcribe(audio)
    assert [s.tokens for s in r_plain.segments] == \
           [s.tokens for s in r_shard.segments]
    assert [round(s.start, 3) for s in r_plain.segments] == \
           [round(s.start, 3) for s in r_shard.segments]

    # Sharding inspection: the int8 cross-KV computed from TP-sharded
    # params must itself be sharded over the mesh, not replicated.
    from yoho_tpu.nn.layers import QuantizedKV

    mel = jnp.zeros((8, 32, 8), jnp.float32)

    @jax.jit
    def ckv_fn(v, mel):
        xa = model.apply(v, mel, method=Whisper.encode_audio)
        return model.apply(v, xa, "int8", method=Whisper.cross_kvs)

    with mesh:
        ckvs = ckv_fn(sharded.variables, shard_batch(mesh, mel))
    assert ckvs and all(isinstance(c, QuantizedKV) for c in ckvs)
    n_dev = len(mesh.devices.flatten())
    for c in ckvs:
        for name in ("k_q", "v_q", "k_scale", "v_scale"):
            leaf = getattr(c, name)
            # Replicated over all 8 devices would mean one identical shard
            # everywhere; require the array to be split at least 2-ways.
            shard_shapes = {s.data.shape for s in leaf.addressable_shards}
            total = np.prod(leaf.shape)
            per_shard = np.prod(next(iter(shard_shapes)))
            assert per_shard * n_dev <= total * (n_dev // 2), (
                f"{name} is replicated: shape {leaf.shape}, "
                f"shard {shard_shapes}, sharding {leaf.sharding}")


def test_continuous_batching_tensor_parallel():
    """The slot engine composes with TP-sharded params (GSPMD lays out
    both the admit and chunk programs from the operand shardings): a
    (1,4)-mesh int8-quantized continuous server decodes the exact tokens
    of the unsharded batched path — multi-chip continuous serving."""
    from yoho_tpu.infer.continuous import ContinuousBatcher
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=16, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=1, n_vocab=51865,
                        n_text_ctx=24, n_text_state=32, n_text_head=4,
                        n_text_layer=1, chunk_seconds=0.32)
    model = Whisper(cfg)
    table = WhisperTokenTable(multilingual=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           jnp.zeros((1, 4), jnp.int32))
    g = np.random.default_rng(1)
    audios = [(0.1 * g.standard_normal(cfg.n_samples)).astype(np.float32)
              for _ in range(3)]
    kw = dict(family="whisper", token_table=table, timestamps=True,
              quantized_cross_kv="int8", quantized_cache=True)
    want = Transcriber(model, variables, batch_size=2,
                       **kw).transcribe_many(audios)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    sharded = Transcriber(model, variables, mesh=mesh, batch_size=2, **kw)
    batcher = ContinuousBatcher(sharded, max_batch=2, chunk_tokens=4)
    try:
        got = [batcher.submit(a) for a in audios]
    finally:
        batcher.close()
    for w, g_res in zip(want, got):
        assert [s.tokens for s in w.segments] == \
               [s.tokens for s in g_res.segments]


def test_parse_mesh_specs():
    """CLI mesh specs map onto the (data, model) mesh; -1 absorbs the
    remaining devices (8 faked CPU devices here)."""
    import pytest

    from yoho_tpu.parallel.mesh import parse_mesh

    assert dict(parse_mesh("2x4").shape) == {"data": 2, "model": 4}
    assert dict(parse_mesh("-1x4").shape) == {"data": 2, "model": 4}
    assert dict(parse_mesh("1x8").shape) == {"data": 1, "model": 8}
    with pytest.raises(ValueError, match="DATAxMODEL"):
        parse_mesh("8")
    with pytest.raises(ValueError, match="DATAxMODEL"):
        parse_mesh("2x2x2")
    with pytest.raises(ValueError):
        parse_mesh("3x3")  # does not divide 8 devices
