"""Configuration system: model + session configs (pydantic over TOML).

Capability parity with the reference's config layer
(``yoho/src/config.py:4-29`` + ``train/utils/config.py:9-89`` +
``train/config.toml``), redesigned for TPU: hardware selection is a mesh
topology (axis names + sizes) instead of ``CUDA_VISIBLE_DEVICES``, and the
reference's ``config.devices`` attribute bug (``run_train_session.py:31``)
has no analog here.
"""

from __future__ import annotations

import tomllib
from pathlib import Path
from typing import List, Union

from pydantic import BaseModel, Field, model_validator


class YOHOConfig(BaseModel):
    """Hyperparameters of the custom YOHO model + its audio frontend.

    Field-for-field the same contract as the reference ``YOHOConfig``
    (``yoho/src/config.py:4-29``) including the derived sample-count
    identity ``n_samples = n_fft + (max_audio_len - 1) * stft_hop``
    (default 164,080 samples ~= 10.25 s).
    """

    sample_rate: int = 16000
    n_mel_bands: int = 128
    n_fft: int = 400
    stft_hop: int = 160

    # Training context lengths; exceeding them degrades accuracy.
    max_audio_len: int = 1024  # STFT frames fed to the encoder
    max_text_len: int = 256  # decoder tokens

    dims: int = 384

    n_audio_heads: int = 6
    n_audio_blocks: int = 4

    n_text_heads: int = 6
    n_text_blocks: int = 4

    # Mixture-of-Experts (0 = dense, the reference architecture). When
    # n_experts > 0, every ``moe_every_n``-th ENCODER block (1-based from
    # the top: blocks with index % moe_every_n == moe_every_n - 1)
    # replaces its SwiGLU with a top-k MoE (``yoho_tpu.nn.moe``); expert
    # params shard over the mesh ``model`` axis (expert parallelism).
    # DECODER blocks stay dense unless ``moe_in_decoder`` is also set, in
    # which case the same every-n pattern routes the decoder MLPs too
    # (composes with cached decode_step; NOT with weights_int8 decoder
    # serving — quantize_yoho_decoder rejects expert params).
    n_experts: int = 0
    moe_in_decoder: bool = False
    moe_every_n: int = 2
    moe_top_k: int = 2
    expert_capacity_factor: float = 2.0
    moe_aux_weight: float = 0.01  # Switch load-balancing loss weight

    @model_validator(mode="after")
    def _check_moe(self) -> "YOHOConfig":
        if self.n_experts > 0:
            if self.moe_every_n < 1:
                raise ValueError(
                    f"moe_every_n must be >= 1, got {self.moe_every_n}")
            if not 1 <= self.moe_top_k <= self.n_experts:
                raise ValueError(
                    f"moe_top_k ({self.moe_top_k}) must be in "
                    f"[1, n_experts={self.n_experts}]")
            if self.expert_capacity_factor <= 0:
                raise ValueError(
                    "expert_capacity_factor must be > 0, got "
                    f"{self.expert_capacity_factor}")
        return self

    @property
    def n_samples(self) -> int:
        return self.n_fft + (self.max_audio_len - 1) * self.stft_hop

    @property
    def max_input_seconds(self) -> float:
        return self.n_samples / self.sample_rate

    @property
    def encoder_positions(self) -> int:
        # The audio encoder halves time once (stride-2 pooling), cf.
        # reference ``yoho/src/nn/model.py:21``.
        return self.max_audio_len // 2


class WhisperConfig(BaseModel):
    """Whisper architecture hyperparameters (OpenAI naming).

    The reference hard-codes base-size values inline
    (``yoho/src/nn/whisper.py:215-230``); here every released size is a
    preset so the framework serves tiny..large-v3.
    """

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 512
    n_audio_head: int = 8
    n_audio_layer: int = 6
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 512
    n_text_head: int = 8
    n_text_layer: int = 6

    # Audio frontend constants (fixed across all Whisper sizes).
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    chunk_seconds: float = 30.0

    @property
    def n_samples(self) -> int:
        return int(self.chunk_seconds * self.sample_rate)  # 480_000

    @property
    def n_frames(self) -> int:
        return self.n_samples // self.hop_length  # 3000


def _wcfg(mels, ctx, state, head, layer, vocab=51865, tctx=448,
          text_layer=None) -> WhisperConfig:
    return WhisperConfig(
        n_mels=mels,
        n_audio_ctx=ctx,
        n_audio_state=state,
        n_audio_head=head,
        n_audio_layer=layer,
        n_vocab=vocab,
        n_text_ctx=tctx,
        n_text_state=state,
        n_text_head=head,
        n_text_layer=text_layer if text_layer is not None else layer,
    )


WHISPER_PRESETS: dict[str, WhisperConfig] = {
    "tiny": _wcfg(80, 1500, 384, 6, 4),
    "tiny.en": _wcfg(80, 1500, 384, 6, 4, vocab=51864),
    "base": _wcfg(80, 1500, 512, 8, 6),
    "base.en": _wcfg(80, 1500, 512, 8, 6, vocab=51864),
    "small": _wcfg(80, 1500, 768, 12, 12),
    "small.en": _wcfg(80, 1500, 768, 12, 12, vocab=51864),
    "medium": _wcfg(80, 1500, 1024, 16, 24),
    "medium.en": _wcfg(80, 1500, 1024, 16, 24, vocab=51864),
    "large-v2": _wcfg(80, 1500, 1280, 20, 32),
    "large-v3": _wcfg(128, 1500, 1280, 20, 32, vocab=51866),
    # Distilled serving variant: full encoder, 4-layer decoder.
    "large-v3-turbo": _wcfg(128, 1500, 1280, 20, 32, vocab=51866,
                            text_layer=4),
    # distil-whisper family (Gandhi et al.): full teacher encoder, 2-layer
    # decoder — the cheapest serving decoders of the lineup.
    "distil-large-v2": _wcfg(80, 1500, 1280, 20, 32, text_layer=2),
    "distil-large-v3": _wcfg(128, 1500, 1280, 20, 32, vocab=51866,
                             text_layer=2),
    "distil-medium.en": _wcfg(80, 1500, 1024, 16, 24, vocab=51864,
                              text_layer=2),
    "distil-small.en": _wcfg(80, 1500, 768, 12, 12, vocab=51864,
                             text_layer=4),
}


class DatasetConfig(BaseModel):
    """Corpus directory slots (parity: ``train/utils/config.py:9-14``)."""

    noisy: Path = Path("./asr_dataset/noisy")
    clean: Path = Path("./asr_dataset/clean")
    finetune: Path = Path("./asr_dataset/finetune")
    ambient: Path = Path("./asr_dataset/ambient")
    speakers: Path = Path("./asr_dataset/speakers")


class TokenizerHP(BaseModel):
    max_token_length: int = 32
    vocab_size: int = 16000


class TrainingHP(BaseModel):
    """Per-stage training hyperparameters (``train/utils/config.py:21-30``)."""

    learning_rate: float = 1e-3
    final_learning_rate: float = 1e-5
    batch_size: int = 16
    accumulated_batches: int = 16
    updates: int = 250_000
    warmup_updates: int = 2500
    validation_frequency: int = 25
    validation_samples: int = 8
    # Gradient-checkpoint every transformer block (jax.checkpoint): exact
    # same loss/grads, ~one extra forward of FLOPs, activation memory drops
    # from O(depth) to O(1) blocks — the lever for bigger batches on a
    # fixed HBM budget. Honored by every stage that trains an encoder.
    remat: bool = False


class TrainingASRHP(TrainingHP):
    # Fraction of samples drawn without any speech (negative samples). The
    # reference declares but never consumes this (``train/utils/config.py:33``);
    # here it is actually honored by the transcription dataloader.
    speechless_sample_ratio: float = 0.1
    # Train on clips N× the model's base window (RoPE YOHO encoder only;
    # the reference caps clips at max_input_seconds by construction,
    # ``dataloaders.py:100-106``). N > 1 switches the stage to the
    # sequence-parallel ring-attention train step
    # (yoho_tpu.parallel.long_encoder) over the mesh's ``seq`` axis; the
    # dataloader packs utterances into N×-long clips and stage 0 mints
    # N× the timestamp specials. Exact vs the single-device step.
    long_context_factor: int = 1

    @model_validator(mode="after")
    def _check_factor(self):
        if self.long_context_factor < 1:
            raise ValueError("long_context_factor must be >= 1")
        return self


class TrainingReconstructionHP(TrainingHP):
    kl_weight: float = 1e-3
    latent_dim: int = 64


class TrainingVoicePrintsHP(TrainingHP):
    temperature: float = 0.07
    embedding_dim: int = 256


class Hyperparameters(BaseModel):
    tokenizer: TokenizerHP = TokenizerHP()
    transcribe_pretrain: TrainingASRHP = TrainingASRHP()
    reconstruct_pretrain: TrainingReconstructionHP = TrainingReconstructionHP()
    voiceprint_finetune: TrainingVoicePrintsHP = TrainingVoicePrintsHP(
        updates=100_000, warmup_updates=1000
    )
    transcribe_finetune: TrainingASRHP = TrainingASRHP()


class WeightsConfig(BaseModel):
    """Artifact slots per stage (``train/utils/config.py:51-57``)."""

    tokenizer: Path = Path("./weights/tokenizer.model")
    asr: Path = Path("./weights/asr.ckpt")
    voice_reconstruction: Path = Path("./weights/voice_reconstruction.ckpt")
    voiceprint: Path = Path("./weights/voiceprint.ckpt")
    yoho: Path = Path("./weights/yoho.ckpt")


class MeshConfig(BaseModel):
    """TPU topology: named mesh axes replacing CUDA_VISIBLE_DEVICES.

    ``data``/``model`` sizes of -1 mean "infer from available devices"
    (data absorbs whatever model does not use).
    """

    data: int = -1
    model: int = 1
    # Sequence-parallel axis for long-context training (ring attention
    # over clip time; see hyperparameters.*.long_context_factor). -1 =
    # all devices the data axis does not use; ignored unless a stage
    # sets long_context_factor > 1.
    seq: int = -1
    allowed_mem_fraction: float = 0.9

    @model_validator(mode="after")
    def _check(self):
        if self.model < 1:
            raise ValueError("mesh.model must be >= 1")
        if self.seq < 1 and self.seq != -1:
            raise ValueError("mesh.seq must be >= 1 (or -1 = infer)")
        return self


class SessionConfig(BaseModel):
    """One training session = config + artifact directory tree.

    Parity with ``train/utils/config.py:64-89`` (including weight-path
    re-rooting into the session dir) plus the mesh block.
    """

    name: str
    yoho: YOHOConfig = YOHOConfig()
    dataset: DatasetConfig = DatasetConfig()
    hyperparameters: Hyperparameters = Hyperparameters()
    weights: WeightsConfig = WeightsConfig()
    language_whitelist: List[str] = Field(default_factory=lambda: ["en"])
    mesh: MeshConfig = MeshConfig()
    sessions_root: Path = Path("./sessions")

    @property
    def path(self) -> Path:
        return self.sessions_root / self.name

    def reroot_weights(self) -> "SessionConfig":
        """Re-root relative weight paths into the session directory.

        Idempotent: with a RELATIVE sessions_root the rerooted paths
        stay relative, so a second call must not re-prefix them
        (sessions/x/sessions/x/...)."""
        base = self.path
        for attr in type(self.weights).model_fields:
            cur = getattr(self.weights, attr)
            if not cur.is_absolute() and not cur.is_relative_to(base):
                setattr(self.weights, attr, base / cur)
        return self


DEFAULT_SESSION_TOML = """\
language_whitelist = ['en']

[mesh]
data = -1
model = 1
# seq: ring-attention axis for long-context training (-1 = infer);
# used only when a stage sets long_context_factor > 1.
seq = -1
allowed_mem_fraction = 0.90

[yoho]
sample_rate = 16000
n_mel_bands = 128
n_fft = 400
stft_hop = 160
max_audio_len = 1024
max_text_len = 256
dims = 384
n_audio_heads = 6
n_audio_blocks = 4
n_text_heads = 6
n_text_blocks = 4

[dataset]
noisy = './asr_dataset/noisy'
clean = './asr_dataset/clean'
finetune = './asr_dataset/finetune'
ambient = './asr_dataset/ambient'
speakers = './asr_dataset/speakers'

[weights]
tokenizer = './weights/tokenizer.model'
asr = './weights/asr.ckpt'
voice_reconstruction = './weights/voice_reconstruction.ckpt'
voiceprint = './weights/voiceprint.ckpt'
yoho = './weights/yoho.ckpt'

[hyperparameters.tokenizer]
max_token_length = 32
vocab_size = 16000

[hyperparameters.transcribe_pretrain]
learning_rate = 0.001
final_learning_rate = 0.00001
batch_size = 16
accumulated_batches = 16
updates = 250000
warmup_updates = 2500
validation_frequency = 25
validation_samples = 8
speechless_sample_ratio = 0.1
# Gradient-checkpoint every transformer block: exact, ~one extra forward,
# O(depth) less activation memory (any [hyperparameters.*] section).
remat = false
# Train on clips N x the base window via sequence-parallel ring
# attention over the mesh's seq axis (1 = off).
long_context_factor = 1

[hyperparameters.reconstruct_pretrain]
learning_rate = 0.001
final_learning_rate = 0.00001
batch_size = 16
accumulated_batches = 16
updates = 250000
warmup_updates = 2500
validation_frequency = 25
validation_samples = 8
kl_weight = 0.001
latent_dim = 64

[hyperparameters.voiceprint_finetune]
learning_rate = 0.001
final_learning_rate = 0.00001
batch_size = 16
accumulated_batches = 16
updates = 100000
warmup_updates = 1000
validation_frequency = 25
validation_samples = 8
temperature = 0.07
embedding_dim = 256

[hyperparameters.transcribe_finetune]
learning_rate = 0.001
final_learning_rate = 0.00001
batch_size = 16
accumulated_batches = 16
updates = 250000
warmup_updates = 2500
validation_frequency = 25
validation_samples = 8
speechless_sample_ratio = 0.1
"""


def load_session_config(
    name: str, sessions_root: Union[str, Path] = "./sessions"
) -> SessionConfig:
    """Load ``<sessions_root>/<name>/config.toml`` and re-root weight paths."""
    sessions_root = Path(sessions_root)
    path = sessions_root / name
    cfg_file = path / "config.toml"
    if not cfg_file.exists():
        raise FileNotFoundError(
            f"Cannot load session config; session '{name}' does not exist at {path}"
        )
    with open(cfg_file, "rb") as f:
        raw = tomllib.load(f)
    for reserved in ("name", "sessions_root"):
        if reserved in raw:
            raise ValueError(
                f"{cfg_file}: top-level '{reserved}' is reserved (it is "
                "derived from the session directory) — remove it")
    config = SessionConfig(name=name, sessions_root=sessions_root, **raw)
    return config.reroot_weights()
