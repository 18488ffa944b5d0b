"""HBM capacity model (infer/capacity.py) — batch_size="auto".

The measured v5e fit boundaries from PERFORMANCE.md "Choosing batch size"
(224-token horizon, int8 KV + int8 cache) pin the model:

    whisper-small     B=320 fits, B=352 OOMs
    whisper-large-v3  B=40 fits,  B=48 OOMs
    large-v3-turbo    B=160 fits (no OOM boundary measured)

The suggestion must NEVER cross a measured OOM boundary, and must not be
uselessly conservative (>= half the measured fit).
"""

from pathlib import Path

import numpy as np
import pytest

from yoho_tpu.core.config import WHISPER_PRESETS, YOHOConfig
from yoho_tpu.infer.capacity import (
    DEFAULT_HBM_BYTES,
    resolve_auto_batch,
    stream_bytes,
    suggest_batch_size,
    whisper_param_count,
    yoho_param_count,
)

FIXROOT = Path(__file__).parent / "fixtures" / "sessions"


def _suggest_bench(name, **kw):
    """Suggestion under the PERFORMANCE.md measurement settings."""
    args = dict(horizon=224, kv_bytes=1.0, cache_bytes=1.0,
                hbm_bytes=DEFAULT_HBM_BYTES)
    args.update(kw)
    return suggest_batch_size(WHISPER_PRESETS[name], **args)


# --------------------------------------------------------------------------
# Parameter counts vs published checkpoint sizes
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name,published_m", [
    ("tiny", 39), ("base", 74), ("small", 244), ("medium", 769),
    ("large-v3", 1550), ("large-v3-turbo", 809),
])
def test_whisper_param_count_matches_published(name, published_m):
    est = whisper_param_count(WHISPER_PRESETS[name]) / 1e6
    assert est == pytest.approx(published_m, rel=0.06), name


def test_param_count_matches_real_init():
    """Analytic count within 2% of an actually-initialized tiny model."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.nn.whisper import Whisper

    cfg = WHISPER_PRESETS["tiny"]
    model = Whisper(cfg)
    mel = jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32)
    tok = jnp.zeros((1, 4), jnp.int32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), mel, tok)
    real = sum(int(np.prod(l.shape))
               for l in jax.tree_util.tree_leaves(variables))
    assert whisper_param_count(cfg) == pytest.approx(real, rel=0.02)


# --------------------------------------------------------------------------
# Measured-boundary pins (the model's contract)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("name,fits,ooms,floor", [
    ("small", 320, 352, 256),
    ("large-v3", 40, 48, 40),
    ("large-v3-turbo", 160, None, 96),
])
def test_never_crosses_measured_boundaries(name, fits, ooms, floor):
    """Both sides of the contract (VERDICT r4 item 6): never past a
    measured boundary, AND within ~one batch quantum of the hand-tuned
    fit (floors: small >= 256 of 320, large-v3 >= 40 of 40, turbo >= 96
    of the B=128 bench point) so ``batch_size="auto"`` reproduces >= 95%
    of the published headline throughput, not half of it."""
    b = _suggest_bench(name)
    assert b <= fits, f"{name}: suggested {b} past the measured fit {fits}"
    if ooms is not None:
        assert b < ooms
    assert b >= floor, (f"{name}: {b} underprovisions the measured-safe "
                        f"batch (floor {floor})")


def test_default_f32_horizon448_is_smaller_than_int8():
    """The Transcriber default (f32 caches, full 448 horizon) needs more
    HBM per stream than the int8 bench config, so suggests fewer."""
    cfg = WHISPER_PRESETS["small"]
    b_f32 = suggest_batch_size(cfg, hbm_bytes=DEFAULT_HBM_BYTES)
    b_int8 = _suggest_bench("small")
    assert 1 <= b_f32 < b_int8


# --------------------------------------------------------------------------
# Model behavior
# --------------------------------------------------------------------------

def test_monotonic_in_hbm():
    cfg = WHISPER_PRESETS["small"]
    sizes = [suggest_batch_size(cfg, hbm_bytes=int(g * 1e9),
                                kv_bytes=1.0, cache_bytes=1.0, horizon=224)
             for g in (4, 8, 16, 32)]
    assert sizes == sorted(sizes)
    assert sizes[-1] > sizes[0]


def test_int4_cross_kv_buys_batch_on_large():
    b8 = _suggest_bench("large-v3")
    b4 = _suggest_bench("large-v3", kv_bytes=0.5)
    assert b4 > b8  # the capacity lever (PERFORMANCE.md int4 finding)


def test_beams_divide_streams():
    b1 = _suggest_bench("large-v3")
    b5 = _suggest_bench("large-v3", beams=5)
    # batch*beams cache streams: beam=5 batch should be ~1/5 of greedy.
    assert b5 <= -(-b1 // 5) + 8
    assert b5 >= 1


def test_mesh_shards_scale_suggestion():
    # 4-way tensor parallel shards each stream's caches across chips.
    b1 = _suggest_bench("large-v3")
    b_tp = _suggest_bench("large-v3", model_shards=4)
    assert b_tp > b1
    # data parallelism multiplies the global batch.
    b_dp = _suggest_bench("large-v3", data_shards=4)
    assert b_dp == 4 * b1


def test_min_batch_is_one():
    assert suggest_batch_size(WHISPER_PRESETS["large-v3"],
                              hbm_bytes=int(4e9)) >= 1


def test_stream_bytes_dominated_by_cross_kv():
    cfg = WHISPER_PRESETS["large-v3"]
    s = stream_bytes(cfg, horizon=224, kv_bytes=1.0, cache_bytes=1.0)
    cross = 2 * cfg.n_text_layer * cfg.n_text_state * cfg.n_audio_ctx
    assert cross == 122_880_000  # PERFORMANCE.md: large-v3 123 MB
    assert s > cross


def test_yoho_family_suggestion():
    cfg = YOHOConfig()
    p = yoho_param_count(cfg, vocab_size=16000)
    assert 10e6 < p < 60e6  # default 384-dim model is tens of millions
    b = suggest_batch_size(cfg, family="yoho", hbm_bytes=DEFAULT_HBM_BYTES)
    assert b >= 64  # short contexts + small dims -> large batches fit


def test_yoho_stream_bytes_use_gqa_kv_width():
    """YOHO caches hold kv_heads * head_dim = dims/2 cells per position
    (nn/yoho.py init_caches: kvh = n_text_heads // 2) — the capacity model
    must price the GQA width, not the full residual width."""
    import jax
    import jax.numpy as jnp

    from yoho_tpu.nn.yoho import YOHOModel

    cfg = YOHOConfig()
    s = stream_bytes(cfg, family="yoho", kv_bytes=4.0, cache_bytes=4.0)
    # The dominant cache terms must reflect dims/2, so the total estimate
    # sits well under a full-width pricing of cross + self caches.
    full_width = (2 * cfg.n_text_blocks * cfg.dims
                  * (cfg.encoder_positions + cfg.max_text_len) * 4)
    assert s < full_width

    # Byte-exact on the real allocation: init_caches' self cache.
    model = YOHOModel(cfg, vocab_size=512, voiceprint_dim=32)
    caches = model.apply({"params": {}}, 2, jnp.float32, 128,
                         method=YOHOModel.init_caches)
    leaf_bytes = sum(np.prod(leaf.shape) * leaf.dtype.itemsize
                     for leaf in jax.tree_util.tree_leaves(caches)) // 2
    kvh = max(1, cfg.n_text_heads // 2)
    head_dim = cfg.dims // cfg.n_text_heads
    expect = 2 * cfg.n_text_blocks * kvh * head_dim * 128 * 4
    assert leaf_bytes == expect


def test_int8_weights_accounts_bf16_encoder():
    """weights_int8 only quantizes the DECODER; auto-batch must budget the
    encoder at bf16 (whisper_encoder_param_count split)."""
    from yoho_tpu.infer.capacity import whisper_encoder_param_count

    cfg = WHISPER_PRESETS["large-v3"]
    enc = whisper_encoder_param_count(cfg)
    assert 600e6 < enc < 700e6  # large-v3 encoder ~635M params
    flat = _suggest_bench("large-v3", weights_dtype_bytes=1.0)
    split = _suggest_bench("large-v3", weights_dtype_bytes=1.0,
                           extra_fixed_bytes=enc)
    assert split <= flat  # never MORE optimistic than the flat pricing
    assert flat - split >= 0  # and the encoder surcharge costs streams


def test_draft_model_shrinks_auto_batch():
    """A speculative draft must reduce the suggestion: its weights and
    per-stream caches are real HBM the target no longer has."""
    cfg = WHISPER_PRESETS["small"]
    draft = WHISPER_PRESETS["tiny"]
    plain = suggest_batch_size(cfg, horizon=224, kv_bytes=1.0,
                               cache_bytes=1.0, hbm_bytes=DEFAULT_HBM_BYTES)
    with_draft = suggest_batch_size(
        cfg, horizon=230, kv_bytes=1.0, cache_bytes=1.0,
        hbm_bytes=DEFAULT_HBM_BYTES,
        extra_fixed_bytes=whisper_param_count(draft) * 2,
        extra_stream_bytes=stream_bytes(draft, horizon=230, kv_bytes=1.0,
                                        cache_bytes=1.0))
    assert with_draft < plain
    assert with_draft >= 1


# --------------------------------------------------------------------------
# End-to-end resolution through the serving objects
# --------------------------------------------------------------------------

def test_transcriber_auto_batch_resolves():
    import yoho_tpu

    t = yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  batch="auto")
    assert isinstance(t.batch_size, int) and t.batch_size >= 1
    # Matches the pure function under the same settings.
    assert t.batch_size == resolve_auto_batch(t)


def test_transcriber_rejects_unknown_batch_string():
    import yoho_tpu

    with pytest.raises(ValueError, match="int or 'auto'"):
        yoho_tpu.load_transcriber(session="tiny", root=str(FIXROOT),
                                  batch="big")


def test_cli_batch_arg():
    import argparse

    from yoho_tpu.cli.transcribe import batch_size_arg

    assert batch_size_arg("auto") == "auto"
    assert batch_size_arg("16") == 16
    with pytest.raises(argparse.ArgumentTypeError):
        batch_size_arg("zero")
    with pytest.raises(argparse.ArgumentTypeError):
        batch_size_arg("0")
