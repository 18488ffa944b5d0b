"""LoRA parameter-efficient fine-tuning (nn/lora.py).

The reference cannot adapt a pretrained checkpoint at all (frozen
inference demo, ``yoho/src/nn/whisper.py:206-285``); LoRA is a framework
addition layered on the full fine-tune path. These tests pin the
adapter math (golden numpy), the zero-init identity, that training
moves ONLY the adapters, and that both exported artifacts (merged HF
checkpoint, bare adapter) reproduce the same weights.
"""

import datetime as dt
import json
import wave
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yoho_tpu.core.config import WhisperConfig
from yoho_tpu.nn import lora as L
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.text.srt import Subtitle, compose_srt
from yoho_tpu.text.whisper_tokens import WhisperTokenTable

TINY = dict(n_mels=16, n_audio_ctx=32, n_audio_state=32, n_audio_head=4,
            n_audio_layer=1, n_text_ctx=48, n_text_state=32, n_text_head=4,
            n_text_layer=1, chunk_seconds=0.64)

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]


class _WordBackend:
    def __init__(self, words):
        self.word_ids = {w: 100 + i for i, w in enumerate(words)}
        self.id_words = {v: k for k, v in self.word_ids.items()}

    def encode(self, text, add_special_tokens=False):
        return [self.word_ids[w] for w in text.split()]

    def decode(self, ids):
        return " ".join(self.id_words[int(i)] for i in ids
                        if int(i) in self.id_words)


@pytest.fixture(scope="module")
def tiny_params():
    cfg = WhisperConfig(**TINY)
    model = Whisper(cfg, dtype=jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    return cfg, params


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Same tone-per-word recipe as test_whisper_finetune's corpus."""
    root = tmp_path_factory.mktemp("lora_corpus")
    (root / "transcripts").mkdir()
    (root / "audio").mkdir()
    g = np.random.default_rng(0)
    for f in range(3):
        subs, t = [], 0.05
        audio = g.standard_normal(16000).astype(np.float32) * 0.003
        for u in range(3):
            w = (f + 2 * u) % len(WORDS)
            start, end = t, t + 0.15
            tone = 0.4 * np.sin(2 * np.pi * (300 + 120 * w)
                                * np.arange(int(0.15 * 16000)) / 16000)
            audio[int(start * 16000):int(start * 16000) + len(tone)] += \
                tone.astype(np.float32)
            subs.append(Subtitle(u + 1, dt.timedelta(seconds=start),
                                 dt.timedelta(seconds=end), WORDS[w]))
            t = end + 0.08
        (root / "transcripts" / f"t{f}.srt").write_text(compose_srt(subs))
        pcm = np.clip(audio * 32768, -32768, 32767).astype(np.int16)
        with wave.open(str(root / "audio" / f"t{f}.wav"), "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(2)
            wv.setframerate(16000)
            wv.writeframes(pcm.tobytes())
    return root


@pytest.fixture(scope="module")
def table():
    return WhisperTokenTable(multilingual=True,
                             text_backend=_WordBackend(WORDS))


# ---------------------------------------------------------------------------
# Adapter math
# ---------------------------------------------------------------------------

def test_default_targets_are_qv_projections(tiny_params):
    _cfg, params = tiny_params
    got = L.select_lora_targets(params)
    assert got == [
        "decoder/blocks_0/attn/q_proj", "decoder/blocks_0/attn/v_proj",
        "decoder/blocks_0/cross_attn/q_proj",
        "decoder/blocks_0/cross_attn/v_proj",
        "encoder/blocks_0/attn/q_proj", "encoder/blocks_0/attn/v_proj"]


def test_zero_init_merge_is_identity(tiny_params):
    _cfg, params = tiny_params
    lora = L.init_lora(jax.random.PRNGKey(1), params, rank=4)
    merged = L.merge_lora(params, lora, L.lora_scale(4))
    same = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(np.asarray(a), np.asarray(b))),
        params, merged)
    assert all(jax.tree_util.tree_leaves(same))
    # and the caller's tree is never aliased by the merge
    assert merged is not params


def test_merge_golden_vs_numpy(tiny_params):
    _cfg, params = tiny_params
    lora = L.init_lora(jax.random.PRNGKey(2), params, rank=4)
    key = "decoder/blocks_0/attn/q_proj"
    lora[key]["b"] = jax.random.normal(jax.random.PRNGKey(3),
                                       lora[key]["b"].shape, jnp.float32)
    scale = 0.5
    merged = L.merge_lora(params, lora, scale)
    base = np.asarray(params["decoder"]["blocks_0"]["attn"]["q_proj"]["kernel"])
    want = base + scale * (np.asarray(lora[key]["a"])
                           @ np.asarray(lora[key]["b"]))
    got = np.asarray(merged["decoder"]["blocks_0"]["attn"]["q_proj"]["kernel"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    # untargeted kernels pass through untouched
    np.testing.assert_array_equal(
        np.asarray(merged["decoder"]["blocks_0"]["attn"]["k_proj"]["kernel"]),
        np.asarray(params["decoder"]["blocks_0"]["attn"]["k_proj"]["kernel"]))


def test_rank_and_target_validation(tiny_params):
    _cfg, params = tiny_params
    with pytest.raises(ValueError, match="matched no kernel"):
        L.select_lora_targets(params, r"no/such/module")
    with pytest.raises(ValueError, match="rank"):
        L.init_lora(jax.random.PRNGKey(0), params, rank=0)
    with pytest.raises(ValueError, match="exceeds"):
        L.init_lora(jax.random.PRNGKey(0), params, rank=64)


def test_adapter_artifact_roundtrip(tiny_params, tmp_path):
    _cfg, params = tiny_params
    lora = L.init_lora(jax.random.PRNGKey(4), params, rank=4)
    key = "encoder/blocks_0/attn/v_proj"
    lora[key]["b"] = jnp.ones_like(lora[key]["b"])
    L.save_adapter(tmp_path, lora, rank=4, alpha=8.0,
                   targets=L.DEFAULT_TARGETS)
    meta = json.loads((tmp_path / L.ADAPTER_META_FILE).read_text())
    assert meta["scale"] == 2.0 and meta["rank"] == 4
    assert meta["n_params"] == L.count_lora_params(lora)

    host = jax.tree_util.tree_map(np.asarray, params)
    applied = L.apply_adapter(host, tmp_path)
    want = L.merge_lora(host, jax.device_get(lora), 2.0)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(applied)[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(want)[0])
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat2[k]), atol=1e-6,
                                   err_msg=str(k))


def test_apply_adapter_rejects_wrong_architecture(tiny_params, tmp_path):
    _cfg, params = tiny_params
    lora = L.init_lora(jax.random.PRNGKey(5), params, rank=4)
    L.save_adapter(tmp_path, lora, rank=4, alpha=None,
                   targets=L.DEFAULT_TARGETS)

    other = WhisperConfig(**{**TINY, "n_audio_state": 64,
                             "n_text_state": 64, "n_audio_head": 4,
                             "n_text_head": 4})
    model = Whisper(other, dtype=jnp.float32)
    params64 = jax.jit(model.init)(
        jax.random.PRNGKey(6),
        jnp.zeros((1, other.n_frames, other.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    with pytest.raises(ValueError, match="different architecture"):
        L.apply_adapter(jax.device_get(params64), tmp_path)
    with pytest.raises(FileNotFoundError):
        L.load_adapter(tmp_path / "nonexistent")


def test_apply_adapter_refuses_unknown_scale(tiny_params, tmp_path):
    """Missing meta json must NOT silently merge at scale 1.0 — that
    would serve half the trained delta under the default alpha=2*rank."""
    _cfg, params = tiny_params
    lora = L.init_lora(jax.random.PRNGKey(7), params, rank=4)
    key = "encoder/blocks_0/attn/v_proj"
    lora[key]["b"] = jnp.ones_like(lora[key]["b"])
    L.save_adapter(tmp_path, lora, rank=4, alpha=None,
                   targets=L.DEFAULT_TARGETS)
    (tmp_path / L.ADAPTER_META_FILE).unlink()

    host = jax.tree_util.tree_map(np.asarray, params)
    with pytest.raises(ValueError, match="scale"):
        L.apply_adapter(host, tmp_path)
    # An explicit scale= substitutes for the lost meta.
    applied = L.apply_adapter(host, tmp_path, scale=2.0)
    want = L.merge_lora(host, jax.device_get(lora), 2.0)
    np.testing.assert_allclose(
        np.asarray(L._node(applied, key)["kernel"]),
        np.asarray(L._node(want, key)["kernel"]), atol=1e-6)


# ---------------------------------------------------------------------------
# Fine-tuning integration
# ---------------------------------------------------------------------------

def test_lora_finetune_trains_adapters_only_and_exports(
        tiny_params, corpus, table, tmp_path):
    """One run proves: loss drops, the frozen base is bit-identical
    after training, and BOTH artifacts (merged safetensors, bare
    adapter) reconstruct the same served weights."""
    from safetensors.numpy import load_file

    from yoho_tpu.nn.convert import convert_hf_whisper
    from yoho_tpu.train.whisper_finetune import WhisperFinetuner

    cfg, params = tiny_params
    out = tmp_path / "lora_tuned"
    tuner = WhisperFinetuner(
        cfg, params, table, corpus, out,
        batch_size=8, updates=40, warmup_updates=4, learning_rate=2e-2,
        accumulated_batches=1, timestamps=False, augment=False,
        language_whitelist=["en"], compute_dtype=jnp.float32,
        validation_frequency=20, validation_samples=2, seed=0,
        lora_rank=8)
    assert set(tuner.state.params) == set(L.select_lora_targets(params))

    first = tuner.train_dataloader.get_prepared_batch()
    loss0 = float(tuner._val_loss(tuner._eval_params(),
                                  *map(jnp.asarray, first[:3])))
    base_before = jax.device_get(tuner.base_params)
    tuner.run()
    lossN = float(tuner._val_loss(tuner._eval_params(),
                                  *map(jnp.asarray, first[:3])))
    assert lossN < 0.8 * loss0, (loss0, lossN)

    same = jax.tree_util.tree_map(
        lambda a, b: bool(np.array_equal(a, b)),
        base_before, jax.device_get(tuner.base_params))
    assert all(jax.tree_util.tree_leaves(same)), "frozen base moved"

    # adapters actually moved (B started at zero)
    assert any(np.abs(np.asarray(ab["b"])).max() > 0
               for ab in jax.device_get(tuner.state.params).values())

    assert (out / L.ADAPTER_FILE).exists()
    meta = json.loads((out / L.ADAPTER_META_FILE).read_text())
    assert meta["rank"] == 8

    # merged export == adapter re-applied to the pristine base
    exported = convert_hf_whisper(load_file(out / "model.safetensors"), cfg)
    applied = L.apply_adapter(jax.device_get(params), out)
    flat1 = dict(jax.tree_util.tree_flatten_with_path(exported)[0])
    flat2 = dict(jax.tree_util.tree_flatten_with_path(applied)[0])
    assert flat1.keys() == flat2.keys()
    for k in flat1:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat2[k]), atol=1e-5,
                                   err_msg=str(k))

    # resume restores the adapter state (same source => no refusal)
    again = WhisperFinetuner(
        cfg, params, table, corpus, out,
        batch_size=8, updates=40, warmup_updates=4, learning_rate=2e-2,
        accumulated_batches=1, timestamps=False, augment=False,
        language_whitelist=["en"], compute_dtype=jnp.float32,
        validation_frequency=20, validation_samples=2, seed=0,
        lora_rank=8)
    assert int(again.state.step) == 40
    again.train_dataloader.terminate()
    again.val_dataloader.terminate()


def test_lora_freeze_encoder_restricts_to_decoder(
        tiny_params, corpus, table, tmp_path):
    from yoho_tpu.train.whisper_finetune import WhisperFinetuner

    cfg, params = tiny_params
    tuner = WhisperFinetuner(
        cfg, params, table, corpus, tmp_path / "dec_only",
        batch_size=8, updates=1, warmup_updates=0, learning_rate=1e-3,
        timestamps=False, augment=False, language_whitelist=["en"],
        compute_dtype=jnp.float32, validation_frequency=0, seed=0,
        lora_rank=4, freeze_encoder=True)
    assert tuner.state.params, "no adapters"
    assert all(k.startswith("decoder/") for k in tuner.state.params)
    tuner.train_dataloader.terminate()
    tuner.val_dataloader.terminate()


def test_distiller_rejects_lora(corpus, table, tmp_path):
    from yoho_tpu.train.distill import WhisperDistiller

    cfg = WhisperConfig(**TINY)
    model = Whisper(cfg, dtype=jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(7),
        jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32),
        jnp.zeros((1, 4), jnp.int32))["params"]
    with pytest.raises(ValueError, match="PRETRAINED"):
        WhisperDistiller(cfg, params, cfg, params, table, corpus,
                         tmp_path / "d", lora_rank=4)
