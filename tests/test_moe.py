"""MoE SwiGLU + expert parallelism: dispatch invariants, brute-force
exactness, capacity drops, and ep-sharded == single-device on the faked
8-device mesh. SURVEY.md §2.3 extension (reference has none)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from yoho_tpu.nn.layers import SwiGLU
from yoho_tpu.nn.moe import MoESwiGLU, moe_dispatch


def _gates(t, e, seed=0):
    g = np.random.default_rng(seed)
    logits = g.standard_normal((t, e)).astype(np.float32)
    return jnp.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))


def test_dispatch_top1_ample_capacity():
    """With capacity >= T every token lands exactly in its argmax expert,
    weighted by its gate value."""
    t, e = 16, 4
    gates = _gates(t, e)
    dispatch, combine, aux, kept = moe_dispatch(gates, top_k=1, capacity=t)

    d = np.asarray(dispatch)
    c = np.asarray(combine)
    g = np.asarray(gates)
    assert d.sum() == t  # every token exactly once
    np.testing.assert_array_equal(np.asarray(kept), np.ones(t))
    idx = g.argmax(-1)
    for ti in range(t):
        assert d[ti, idx[ti]].sum() == 1.0
        np.testing.assert_allclose(c[ti].sum(), g[ti, idx[ti]], rtol=1e-6)
    # Each (expert, slot) pair used at most once.
    assert (d.sum(axis=0) <= 1.0 + 1e-6).all()
    # Balanced-uniform gates would give aux == 1; any routing stays >= 1
    # in expectation — just check finiteness and scale here.
    assert 0.5 < float(aux) < e + 1e-6


def test_dispatch_capacity_drops_in_token_order():
    """capacity=1: only the FIRST token routed to each expert keeps its
    slot; later ones are dropped (kept == 0)."""
    gates = jnp.asarray([
        [0.9, 0.1],
        [0.8, 0.2],   # second token to expert 0 -> dropped
        [0.1, 0.9],
    ], jnp.float32)
    dispatch, combine, aux, kept = moe_dispatch(gates, top_k=1, capacity=1)
    np.testing.assert_array_equal(np.asarray(kept), [1, 0, 1])
    assert float(np.asarray(combine)[1].sum()) == 0.0


def test_dispatch_top2_renormalizes():
    """top-2 with ample capacity: per-token combine weights sum to 1
    (gates renormalized over the two chosen experts)."""
    t, e = 12, 4
    gates = _gates(t, e, seed=1)
    dispatch, combine, aux, kept = moe_dispatch(gates, top_k=2, capacity=t)
    np.testing.assert_array_equal(np.asarray(kept), np.full(t, 2))
    np.testing.assert_allclose(np.asarray(combine).sum(axis=(1, 2)),
                               np.ones(t), rtol=1e-5)
    # No (expert, slot) double-occupancy across the two rounds.
    assert (np.asarray(dispatch).sum(axis=0) <= 1.0 + 1e-6).all()


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_layer_matches_bruteforce(top_k):
    """With ample capacity the MoE layer equals the brute-force per-token
    computation: sum over the chosen experts of (renormalized) gate *
    SwiGLU_e(x) with that expert's param slice."""
    b, s, d, e, h = 2, 6, 16, 4, 24
    layer = MoESwiGLU(n_experts=e, hidden_dim=h, top_k=top_k,
                      capacity_factor=float(e))  # capacity == T
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((b, s, d)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)

    out = np.asarray(layer.apply(variables, x))

    # Brute force: route each token by the router's softmax.
    router_kernel = np.asarray(variables["params"]["router"]["kernel"])
    xt = np.asarray(x).reshape(-1, d)
    gates = np.asarray(jax.nn.softmax(jnp.asarray(xt @ router_kernel), -1))
    expert_params = variables["params"]["experts"]
    single = SwiGLU(h)
    per_expert = []
    for ei in range(e):
        p = jax.tree_util.tree_map(lambda l, ei=ei: l[ei], expert_params)
        per_expert.append(np.asarray(single.apply({"params": p},
                                                  jnp.asarray(xt))))
    ref = np.zeros_like(xt)
    for ti in range(xt.shape[0]):
        order = np.argsort(-gates[ti])[:top_k]
        denom = gates[ti, order].sum() if top_k > 1 else 1.0
        for ei in order:
            ref[ti] += gates[ti, ei] / denom * per_expert[ei][ti]
    np.testing.assert_allclose(out.reshape(-1, d), ref, atol=2e-5)


def test_moe_sows_aux_loss_and_dropped_fraction():
    layer = MoESwiGLU(n_experts=4, hidden_dim=8, capacity_factor=0.25,
                      top_k=1)
    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((1, 16, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, state = layer.apply(variables, x, mutable=["intermediates"])
    inter = state["intermediates"]
    (aux,) = inter["moe_aux_loss"]
    (dropped,) = inter["moe_dropped_fraction"]
    assert np.isfinite(float(aux)) and float(aux) >= 0.9
    # capacity_factor 0.25 over 16 tokens / 4 experts = capacity 1: with
    # any imbalance some tokens must drop.
    assert 0.0 <= float(dropped) <= 1.0


def test_yoho_moe_model_forward_and_grads():
    """YOHOConfig.n_experts wires MoE into every moe_every_n-th encoder
    block: the model forwards, sows aux losses, and grads flow to experts
    AND router."""
    import optax

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.moe import collect_aux_losses
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=1,
        n_experts=4, moe_every_n=2,
    )
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(5)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel)
    enc = variables["params"]["encoder"]
    assert "experts" in enc["blocks_1"]["mlp"]  # block 1 is MoE
    assert "experts" not in enc["blocks_0"]["mlp"]  # block 0 stays dense
    assert enc["blocks_1"]["mlp"]["experts"]["gate"]["kernel"].shape[0] == 4

    def loss(p):
        logits, st = model.apply({"params": p}, tokens, mel,
                                 mutable=["intermediates"])
        aux = collect_aux_losses(st["intermediates"])
        ce = jnp.mean(logits ** 2)
        return ce + cfg.moe_aux_weight * aux

    grads = jax.grad(loss)(variables["params"])
    moe = grads["encoder"]["blocks_1"]["mlp"]
    assert float(optax.global_norm(moe["experts"])) > 0
    assert float(optax.global_norm(moe["router"])) > 0


def test_partition_specs_shard_experts_over_model():
    """YOHO_RULES lead the stacked expert axis with ``model`` and keep the
    router replicated."""
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.sharding import YOHO_RULES, partition_specs

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=1,
        n_experts=8, moe_every_n=2,
    )
    model = YOHOModel(cfg, vocab_size=64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32))
    specs = partition_specs(variables["params"], YOHO_RULES)
    mlp = specs["encoder"]["blocks_1"]["mlp"]
    assert mlp["experts"]["gate"]["kernel"] == P("model")
    assert mlp["experts"]["down"]["kernel"] == P("model")
    assert mlp["router"]["kernel"] == P()


def test_pipeline_rejects_mixed_dense_moe_stack():
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.pipeline import pipeline_encode

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=4, n_text_heads=4, n_text_blocks=1,
        n_experts=4, moe_every_n=2,
    )
    model = YOHOModel(cfg, vocab_size=64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    mel = jnp.zeros((4, 32, 8), jnp.float32)
    with pytest.raises(ValueError, match="homogeneous"):
        pipeline_encode(model, variables, mel, mesh, n_microbatches=2)


def test_pipeline_runs_all_moe_stack():
    """An all-MoE stack (moe_every_n=1) IS homogeneous: GPipe over it
    matches the sequential forward exactly — with a TIGHT capacity that
    forces drops (per-sample routing makes the microbatch split
    irrelevant to which tokens drop)."""
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.pipeline import pipeline_encode

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=4, n_text_heads=4, n_text_blocks=1,
        n_experts=2, moe_every_n=1, expert_capacity_factor=0.6,
    )
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(6)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32))
    # Drops really occur at this capacity (otherwise the test is vacuous).
    _, st = model.apply(variables, jnp.zeros((4, 8), jnp.int32),
                        jnp.asarray(g.standard_normal((4, 32, 8))
                                    .astype(np.float32)),
                        mutable=["intermediates"])
    dropped = [float(np.asarray(v[0])) for k, v in _collect(
        st["intermediates"], "moe_dropped_fraction")]
    assert any(d > 0 for d in dropped), "capacity never bound; raise S"

    mel = jnp.asarray(g.standard_normal((4, 32, 8)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    out = np.asarray(pipeline_encode(model, variables, mel, mesh,
                                     n_microbatches=2))
    from yoho_tpu.nn.yoho import YOHOModel as YM
    ref = np.asarray(model.apply(variables, mel, method=YM.encode_audio))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def _collect(node, key, path=""):
    out = []
    if isinstance(node, dict):
        for k, v in node.items():
            if k == key:
                out.append((path, v))
            else:
                out.extend(_collect(v, key, f"{path}/{k}"))
    return out


def test_moe_batch_invariance_under_capacity_drops():
    """Per-sample routing: a row's output is IDENTICAL whether it is
    processed alone or co-batched — even when capacity binds and tokens
    drop. (Capacity competition never crosses batch rows.)"""
    b, s, d, e, h = 4, 16, 16, 4, 24
    layer = MoESwiGLU(n_experts=e, hidden_dim=h, top_k=2,
                      capacity_factor=0.5)  # tight: forces drops
    g = np.random.default_rng(7)
    x = jnp.asarray(g.standard_normal((b, s, d)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)

    full = np.asarray(layer.apply(variables, x))
    for i in range(b):
        solo = np.asarray(layer.apply(variables, x[i:i + 1]))
        np.testing.assert_allclose(solo[0], full[i], atol=1e-6,
                                   err_msg=f"row {i} depends on co-batch")


def test_pipeline_moe_train_step_matches_single_device():
    """Pipelined MoE training keeps the Switch aux loss: one GPipe step
    on an all-MoE stack takes EXACTLY the single-device step (CE +
    moe_aux_weight * mean aux), per-sample routing making the microbatch
    split immaterial."""
    import optax
    from flax.training.train_state import TrainState

    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.moe import collect_aux_losses
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.pipeline import make_pipeline_train_step
    from yoho_tpu.train.trainer import masked_ce_loss

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=4, n_text_heads=4, n_text_blocks=1,
        n_experts=2, moe_every_n=1, expert_capacity_factor=0.6,
    )
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(8)
    mel = jnp.asarray(g.standard_normal((4, 32, 8)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(4, 8)).astype(np.int32))
    mask = jnp.ones((4, 8), jnp.uint8)
    params = model.init(jax.random.PRNGKey(0), tokens, mel)["params"]

    tx = optax.sgd(0.1)
    mesh = Mesh(np.array(jax.devices()[:4]), ("pipe",))
    step = make_pipeline_train_step(model, mesh, n_microbatches=2)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    new_state, loss = step(state, mel, tokens, mask)

    def ref_loss(p):
        logits, st = model.apply({"params": p}, tokens, mel,
                                 mutable=["intermediates"])
        aux = collect_aux_losses(st["intermediates"])
        return (masked_ce_loss(logits, tokens, mask)
                + cfg.moe_aux_weight * aux)

    ref_l, ref_grads = jax.value_and_grad(ref_loss)(params)
    ref_state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    ref_state = ref_state.apply_gradients(grads=ref_grads)

    np.testing.assert_allclose(float(loss), float(ref_l), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(ref_state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_transcriber_serves_moe_checkpoint():
    """The serving pipeline handles an MoE yoho checkpoint end-to-end,
    and transcripts are identical across serving batch sizes (per-sample
    routing keeps capacity competition inside each row)."""
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.text.tokenizer import train_tokenizer

    cfg = YOHOConfig(
        n_mel_bands=16, max_audio_len=32, max_text_len=24, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=1,
        n_experts=2, moe_every_n=2, expert_capacity_factor=0.6,
    )
    corpus = ["hello world this is a test", "the quick brown fox"] * 5
    tok = train_tokenizer(corpus, vocab_size=cfg.max_audio_len + 3 + 256 + 200,
                          max_audio_len=cfg.max_audio_len, backend="python")
    model = YOHOModel(cfg, vocab_size=tok.vocab_size)
    g = np.random.default_rng(9)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.max_text_len), jnp.int32),
        jnp.zeros((1, cfg.max_audio_len, 16), jnp.float32),
        method=model.forward_with_voiceprints)

    audio = (0.1 * g.standard_normal(int(cfg.n_samples * 1.5))
             ).astype(np.float32)
    r1 = Transcriber(model, variables, family="yoho", tokenizer=tok,
                     batch_size=1).transcribe(audio)
    r2 = Transcriber(model, variables, family="yoho", tokenizer=tok,
                     batch_size=4).transcribe(audio)
    assert [s.tokens for s in r1.segments] == [s.tokens for s in r2.segments]


def test_moe_config_validation():
    from yoho_tpu.core.config import YOHOConfig

    with pytest.raises(ValueError, match="moe_every_n"):
        YOHOConfig(n_experts=4, moe_every_n=0)
    with pytest.raises(ValueError, match="moe_top_k"):
        YOHOConfig(n_experts=2, moe_top_k=3)
    with pytest.raises(ValueError, match="capacity_factor"):
        YOHOConfig(n_experts=2, expert_capacity_factor=0.0)
    YOHOConfig(moe_every_n=0)  # fields unchecked while MoE is off


def test_ring_encoder_rejects_moe():
    """The sequence-parallel encoder refuses MoE configs at the library
    level (per-time-shard routing would silently diverge)."""
    from yoho_tpu.core.config import YOHOConfig
    from yoho_tpu.nn.yoho import YOHOModel
    from yoho_tpu.parallel.long_encoder import (
        make_long_context_loss_fn, yoho_encode_long)

    cfg = YOHOConfig(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=1,
        n_experts=2, moe_every_n=1,
    )
    model = YOHOModel(cfg, vocab_size=64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32))
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    with pytest.raises(ValueError, match="n_experts"):
        yoho_encode_long(model, variables,
                         jnp.zeros((1, 64, 8), jnp.float32), mesh)
    with pytest.raises(ValueError, match="n_experts"):
        make_long_context_loss_fn(model, mesh)


def test_moe_expert_parallel_matches_single_device():
    """Expert params sharded over an 8-way 'model' axis (leading expert
    dim) produce the exact same output as the unsharded layer — expert
    parallelism via GSPMD on the dense dispatch einsums."""
    b, s, d, e, h = 2, 8, 16, 8, 24
    layer = MoESwiGLU(n_experts=e, hidden_dim=h, top_k=2,
                      capacity_factor=2.0)
    g = np.random.default_rng(4)
    x = jnp.asarray(g.standard_normal((b, s, d)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x)

    ref = np.asarray(jax.jit(layer.apply)(variables, x))

    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))

    def _put(path, leaf):
        names = [getattr(k, "key", "") for k in path]
        if "experts" in names:
            spec = P("model", *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    sharded = jax.tree_util.tree_map_with_path(_put, variables)
    out = np.asarray(jax.jit(layer.apply)(sharded, x))
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # The stacked expert leaves really are split 8 ways.
    lead = sharded["params"]["experts"]["gate"]["kernel"]
    shapes = {sh.data.shape for sh in lead.addressable_shards}
    assert shapes == {(1, d, h)}


# ------------------------------------------------------------- decoder MoE
def _decoder_moe_cfg(**kw):
    from yoho_tpu.core.config import YOHOConfig

    base = dict(
        n_mel_bands=8, max_audio_len=32, max_text_len=8, dims=32,
        n_audio_heads=4, n_audio_blocks=2, n_text_heads=4, n_text_blocks=2,
        n_experts=2, moe_in_decoder=True, moe_every_n=2,
    )
    base.update(kw)
    return YOHOConfig(**base)


def test_decoder_moe_wiring_and_grads():
    """moe_in_decoder routes every moe_every_n-th DECODER MLP through MoE:
    params appear, aux losses sow from both stacks, grads reach decoder
    experts and router (VERDICT r2 item 8)."""
    import optax

    from yoho_tpu.nn.moe import collect_aux_losses
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = _decoder_moe_cfg()
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(7)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    variables = model.init(jax.random.PRNGKey(0), tokens, mel)
    dec = variables["params"]["decoder"]
    assert "experts" in dec["blocks_1"]["mlp"]
    assert "experts" not in dec["blocks_0"]["mlp"]

    def loss(p):
        logits, st = model.apply({"params": p}, tokens, mel,
                                 mutable=["intermediates"])
        aux = collect_aux_losses(st["intermediates"])
        return jnp.mean(logits ** 2) + cfg.moe_aux_weight * aux

    grads = jax.grad(loss)(variables["params"])
    moe = grads["decoder"]["blocks_1"]["mlp"]
    assert float(optax.global_norm(moe["experts"])) > 0
    assert float(optax.global_norm(moe["router"])) > 0
    # sharding rules cover decoder experts identically to encoder ones
    from yoho_tpu.parallel.sharding import YOHO_RULES, partition_specs

    specs = partition_specs(variables["params"], YOHO_RULES)
    assert specs["decoder"]["blocks_1"]["mlp"]["experts"]["gate"]["kernel"] \
        == P("model")
    assert specs["decoder"]["blocks_1"]["mlp"]["router"]["kernel"] == P()


def test_decoder_moe_cached_decode_matches_forward():
    """KV-cached decode_step through an MoE decoder reproduces the
    teacher-forced forward logits exactly (default capacity_factor=2.0
    guarantees no drops at top_k=2, so per-token routing is identical
    whether tokens arrive all at once or one per step)."""
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = _decoder_moe_cfg(moe_every_n=1)
    model = YOHOModel(cfg, vocab_size=64)
    g = np.random.default_rng(8)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    # init through the voiceprint forward so decode_step's head exists
    variables = model.init(jax.random.PRNGKey(0), tokens, mel,
                           method=YOHOModel.forward_with_voiceprints)

    want = model.apply(variables, tokens, mel)  # (B, S, V)

    xa = model.apply(variables, mel, method=YOHOModel.encode_audio)
    ckvs = model.apply(variables, xa, method=YOHOModel.cross_kvs)
    caches = model.apply(variables, 2, method=YOHOModel.init_caches)
    got = []
    for i in range(tokens.shape[1]):
        logits, _vp, caches = model.apply(
            variables, tokens[:, i:i + 1], caches, ckvs, i,
            method=YOHOModel.decode_step)
        got.append(np.asarray(logits[:, 0]))
    np.testing.assert_allclose(np.stack(got, axis=1), np.asarray(want),
                               atol=2e-4)


def test_decoder_moe_identical_experts_equal_dense():
    """With every expert initialized to the dense MLP's weights and no
    drops, renormalized top-k combine sums to 1 — the MoE decoder is
    EXACTLY the dense decoder. Pins dispatch/combine correctness on the
    decoder path end-to-end."""
    from yoho_tpu.nn.yoho import YOHOModel

    cfg_dense = _decoder_moe_cfg(n_experts=0, moe_in_decoder=False)
    cfg_moe = _decoder_moe_cfg(moe_every_n=1, moe_top_k=2)
    dense = YOHOModel(cfg_dense, vocab_size=64)
    moe = YOHOModel(cfg_moe, vocab_size=64)
    g = np.random.default_rng(9)
    mel = jnp.asarray(g.standard_normal((2, 32, 8)).astype(np.float32))
    tokens = jnp.asarray(g.integers(0, 64, size=(2, 8)).astype(np.int32))
    vd = dense.init(jax.random.PRNGKey(0), tokens, mel)
    vm = moe.init(jax.random.PRNGKey(1), tokens, mel)

    # Graft dense params into the MoE tree: every MoE MLP (encoder AND
    # decoder — moe_every_n=1 routes both stacks) gets its dense
    # counterpart tiled into all experts; routers keep their init.
    pd = vd["params"]
    pm = {}
    for side in ("encoder", "decoder"):
        out = {}
        for name, block in pd[side].items():
            if (name.startswith("blocks_")
                    and "experts" in vm["params"][side][name]["mlp"]):
                nb = dict(block)
                nb["mlp"] = {
                    "router": vm["params"][side][name]["mlp"]["router"],
                    "experts": jax.tree_util.tree_map(
                        lambda x: jnp.stack([x] * cfg_moe.n_experts),
                        block["mlp"]),
                }
                out[name] = nb
            else:
                out[name] = block
        pm[side] = out

    want = dense.apply({"params": pd}, tokens, mel)
    got = moe.apply({"params": pm}, tokens, mel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_decoder_moe_rejects_int8_serving():
    from yoho_tpu.nn.quantize import quantize_yoho_decoder
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = _decoder_moe_cfg()
    model = YOHOModel(cfg, vocab_size=64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           method=YOHOModel.forward_with_voiceprints)
    with pytest.raises(ValueError, match="moe_in_decoder"):
        quantize_yoho_decoder(variables)


def test_decoder_moe_rejects_speculative_serving():
    """S>1 verify changes MoE capacity routing (tokens in a verify block
    compete for per-expert capacity where S=1 steps never do), so the
    speculative exactness contract cannot hold — Transcriber must refuse
    the combination up front (infer/pipeline.py guard)."""
    from yoho_tpu.infer.pipeline import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel

    cfg = _decoder_moe_cfg()
    model = YOHOModel(cfg, vocab_size=64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 8), jnp.int32),
                           jnp.zeros((1, 32, 8), jnp.float32),
                           method=YOHOModel.forward_with_voiceprints)
    class _Tok:
        eot_id = 1

    with pytest.raises(ValueError, match="moe_in_decoder"):
        Transcriber(model, variables, family="yoho", tokenizer=_Tok(),
                    batch_size=1, draft_model=model,
                    draft_variables=variables)

    # Encoder-only MoE keeps its exactness proof (routing is outside the
    # decode loop) — the guard must NOT fire there.
    cfg_enc = _decoder_moe_cfg(moe_in_decoder=False)
    enc_model = YOHOModel(cfg_enc, vocab_size=64)
    t = Transcriber(enc_model, variables, family="yoho", tokenizer=_Tok(),
                    batch_size=1, draft_model=enc_model,
                    draft_variables=variables)
    assert t.draft_model is not None
