"""TPU-native Whisper fine-tuning on an SRT corpus.

The reference treats Whisper as a frozen inference demo
(``yoho/src/nn/whisper.py``) — it cannot adapt a checkpoint to a domain.
This module closes that gap the TPU way: the same (data, model) mesh /
GSPMD machinery as the YOHO trainer (``train/trainer.py``), one jitted
donated ``train_step`` (on-device mel -> encoder/decoder fwd+bwd -> CE),
optax warmup-cosine AdamW with MultiSteps accumulation, and an exporter
that writes the tuned params back as a standard HF checkpoint dir
(``nn/export.py``) so the result serves anywhere — including this
framework's ``--hf`` serving path.

``lora_rank > 0`` switches to parameter-efficient fine-tuning: the base
stays frozen (and sharded) while rank-r adapters train via
merge-on-the-fly inside the same jitted step (``nn/lora.py``).

Data recipe: reuses ``TranscriptionDataloader``'s corpus indexing,
utterance packing, context randomization, augmentation and
reject-and-advance (parity chain back to reference
``train/utils/dataloaders.py:77-218``), but renders Whisper-native
targets: ``<|sot|><|lang|><|task|>[<|ts|>] text [<|ts|>] ... <|eot|>``
with 0.02 s timestamp tokens, loss-masked so only post-prompt tokens
(incl. EOT) carry CE.
"""

from __future__ import annotations

import bisect
from functools import partial
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax.training.train_state import TrainState

from yoho_tpu.audio.frontend import whisper_log_mel
from yoho_tpu.core.config import (
    DatasetConfig,
    SessionConfig,
    WhisperConfig,
    YOHOConfig,
)
from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn
from yoho_tpu.nn.whisper import Whisper
from yoho_tpu.parallel.mesh import (
    barrier,
    fetch_to_host,
    is_coordinator,
    local_batch_size,
    make_mesh,
    process_shard,
    shard_batch,
)
from yoho_tpu.parallel.sharding import WHISPER_RULES, shard_params
from yoho_tpu.text.whisper_tokens import WhisperTokenTable
from yoho_tpu.train.checkpoint import AsyncCheckpointer, save_train_state
from yoho_tpu.train.dataloader import TranscriptionDataloader
from yoho_tpu.train.metrics import MetricsWriter
from yoho_tpu.train.trainer import masked_ce_loss


def _shim_session(data_dir, cfg: WhisperConfig,
                  language_whitelist: Optional[List[str]],
                  max_target_len: int, ambient_dir=None) -> SessionConfig:
    """SessionConfig whose ``yoho`` block carries Whisper's window
    numbers, so TranscriptionDataloader's sample recipe (which reads
    ``config.yoho.{n_samples,max_input_seconds,sample_rate}``) cuts
    Whisper-sized clips. YOHOConfig's sample-count identity
    ``n_samples = n_fft + (L-1)*hop`` cannot hit 480 000 exactly
    (2998.5 frames), so the shim clips to the nearest smaller length and
    ``get_batch`` zero-pads the batch to the exact Whisper window.

    ``ambient_dir`` feeds speechless negatives; without one, the slot
    points INSIDE the corpus at a (normally absent) ``ambient`` subdir so
    negatives fall back to synthesized low noise — NEVER to random
    windows of the transcribed speech itself, which would teach the
    model to emit silence on speech."""
    frames = max(1, (cfg.n_samples - cfg.n_fft) // cfg.hop_length + 1)
    shim = YOHOConfig(
        sample_rate=cfg.sample_rate,
        n_mel_bands=cfg.n_mels,
        n_fft=cfg.n_fft,
        stft_hop=cfg.hop_length,
        max_audio_len=frames,
        max_text_len=max_target_len,
    )
    return SessionConfig(
        name="whisper_finetune",
        yoho=shim,
        dataset=DatasetConfig(
            noisy=Path(data_dir),
            ambient=Path(ambient_dir) if ambient_dir is not None
            else Path(data_dir) / "ambient"),
        language_whitelist=list(language_whitelist or []),
    )


class WhisperFinetuneDataloader(TranscriptionDataloader):
    """SRT+audio corpus -> (audio, whisper tokens, loss_mask) batches."""

    def __init__(self, data_slice: Tuple[float, float], data_dir,
                 cfg: WhisperConfig, table: WhisperTokenTable,
                 batch_size: int, task: str = "transcribe",
                 timestamps: bool = True,
                 max_target_len: Optional[int] = None,
                 language_whitelist: Optional[List[str]] = None,
                 speechless_ratio: float = 0.0, ambient_dir=None, **kwargs):
        if table.text_backend is None:
            raise RuntimeError(
                "fine-tuning needs a text backend to ENCODE transcripts — "
                "the checkpoint dir must carry vocab.json+merges.txt or "
                "tokenizer.json (text/gpt2_bpe.load_text_backend)")
        self.table = table
        self.task = task
        self.timestamps = timestamps
        self.max_target_len = int(max_target_len or cfg.n_text_ctx)
        prompt_len = len(table.sot_sequence("en" if table.multilingual
                                            else table.languages[0],
                                            task, timestamps=timestamps))
        if self.max_target_len < prompt_len + 3:
            raise ValueError(
                f"max_target_len={self.max_target_len} leaves no room for "
                f"targets after the {prompt_len}-token prompt — every loss "
                "mask would be empty and training a silent no-op")
        self.n_samples_out = cfg.n_samples
        session = _shim_session(data_dir, cfg, language_whitelist,
                                self.max_target_len, ambient_dir=ambient_dir)
        super().__init__(data_slice, session, tokenizer=None,
                         batch_size=batch_size,
                         speechless_ratio=speechless_ratio, **kwargs)

    # ------------------------------------------------------------------
    def _ts_token(self, seconds: float) -> int:
        tick = int(round(seconds / 0.02))
        return self.table.timestamp_begin + min(
            max(tick, 0), self.table.num_timestamps - 1)

    def _target_ids(self, utts, lang: str) -> Tuple[List[int], int]:
        """-> (ids, prompt_len). Whisper training targets: the sot
        sequence is prompt (no loss), then per utterance
        ``[<|ts_start|>] text [<|ts_end|>]``, then EOT (with loss)."""
        table = self.table
        if lang not in table.languages:
            lang = table.languages[0]
        prompt = table.sot_sequence(lang, self.task,
                                    timestamps=self.timestamps)
        ids = list(prompt)
        sr = self.config.yoho.sample_rate
        for start, end, text in utts:
            text = text.strip()
            if self.timestamps:
                ids.append(self._ts_token(start / sr))
            if text:
                # Leading space: GPT-2 byte-BPE merges are trained on
                # space-prefixed words (OpenAI's convention for segment
                # starts).
                ids.extend(table.encode_text(" " + text))
            if self.timestamps:
                ids.append(self._ts_token(end / sr))
        ids.append(table.eot)
        T = self.max_target_len
        if len(ids) > T:
            ids = ids[:T - 1] + [table.eot]
        return ids, len(prompt)

    # ------------------------------------------------------------------
    def get_batch(self, idx: int):
        cfg = self.config.yoho
        rng = np.random.default_rng((self.seed, self._epoch, idx))
        i = idx * self.batch_size

        samples = []
        fallback_lang = (self.config.language_whitelist[0]
                         if self.config.language_whitelist else "en")
        for k in range(self.batch_size):
            if self.speechless_ratio > 0 and rng.uniform() < self.speechless_ratio:
                audio, utts = self._speechless_sample(rng)
                samples.append((audio, utts, fallback_lang))
                continue
            sample_idx = int(self.index_table[(i + k) % len(self.index_table)])
            for _attempt in range(int(self.sizes[-1])):
                audio, utts = self._load_sample(rng, sample_idx)
                if audio is not None:
                    break
                sample_idx = int((sample_idx + 1) % self.sizes[-1])
            else:
                raise RuntimeError(
                    "every sample in the corpus exceeded n_samples after "
                    "augmentation — clips are too long for "
                    f"max_input_seconds={cfg.max_input_seconds:.1f}s")
            lang = self.langs[bisect.bisect_right(self.sizes, sample_idx)]
            samples.append((audio, utts, lang))

        audio_batch = np.stack([s[0] for s in samples])
        pad = self.n_samples_out - audio_batch.shape[1]
        if pad > 0:  # shim identity undershoot (docstring above)
            audio_batch = np.pad(audio_batch, ((0, 0), (0, pad)))

        T = self.max_target_len
        tokens = np.full((self.batch_size, T), self.table.eot, np.int32)
        loss_mask = np.zeros((self.batch_size, T), np.uint8)
        for r, (_audio, utts, lang) in enumerate(samples):
            ids, prompt_len = self._target_ids(utts, lang)
            tokens[r, :len(ids)] = ids
            loss_mask[r, prompt_len:len(ids)] = 1
        return audio_batch.astype(np.float32), tokens, loss_mask


class WhisperFinetuner:
    """Fine-tune a (converted) HF Whisper checkpoint on an SRT corpus."""

    def __init__(self, cfg: WhisperConfig, params, table: WhisperTokenTable,
                 data_dir, out_dir, *,
                 batch_size: int = 8, updates: int = 1000,
                 warmup_updates: int = 50, learning_rate: float = 1e-5,
                 final_learning_rate: float = 1e-7,
                 accumulated_batches: int = 1,
                 freeze_encoder: bool = False,
                 task: str = "transcribe", timestamps: bool = True,
                 language_whitelist: Optional[List[str]] = None,
                 speechless_ratio: float = 0.0, augment: bool = True,
                 mesh=None, compute_dtype=jnp.bfloat16,
                 validation_frequency: int = 100,
                 validation_samples: int = 4,
                 max_target_len: Optional[int] = None,
                 use_multiprocessing: bool = False,
                 src_dir=None, ambient_dir=None, seed: int = 0,
                 remat: bool = False, optimizer: str = "adamw",
                 lora_rank: int = 0, lora_alpha: Optional[float] = None,
                 lora_targets: Optional[str] = None):
        from yoho_tpu.nn import lora as lora_mod

        self.cfg = cfg
        self.table = table
        self.out_dir = Path(out_dir)
        self.src_dir = src_dir
        self.updates = updates
        self.accumulated_batches = accumulated_batches
        # <= 0 means "never validate" (the CLI spells it --val-every 0).
        self.validation_frequency = validation_frequency
        self.validation_samples = validation_samples
        self.freeze_encoder = freeze_encoder
        # LoRA: train rank-r adapters on frozen base weights
        # (nn/lora.py). freeze_encoder composes by restricting the
        # adapters to the decoder; the base is frozen either way.
        self.lora_rank = int(lora_rank)
        self.lora_alpha = lora_alpha
        self.lora_targets = lora_targets or lora_mod.DEFAULT_TARGETS
        self.lora_scale = (lora_mod.lora_scale(self.lora_rank, lora_alpha)
                           if self.lora_rank else 0.0)
        self.base_params = None
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.checkpoint_path = self.out_dir / "finetune_checkpoint.msgpack"
        # Multi-host (same contract as ASRTrainer): batch_size is GLOBAL,
        # each process loads a disjoint corpus shard, writers are
        # coordinator-only.
        self.process_index, self.n_processes = process_shard()
        local_batch = local_batch_size(batch_size)
        self.metrics = (MetricsWriter(self.out_dir / "metrics.csv",
                                      self.out_dir / "validations.jsonl")
                        if is_coordinator() else None)

        self.compute_dtype = compute_dtype
        # remat: gradient-checkpoint every block — exact, ~one extra
        # forward, O(depth) less activation memory (bigger batches on the
        # big checkpoints; see yoho_tpu.nn.whisper.Whisper.remat).
        self.model = Whisper(cfg, dtype=compute_dtype, remat=remat)
        self.mesh = mesh or make_mesh(-1, 1)

        dl_kwargs = dict(
            data_dir=data_dir, cfg=cfg, table=table,
            batch_size=local_batch,
            shard=(self.process_index, self.n_processes),
            task=task, timestamps=timestamps, max_target_len=max_target_len,
            language_whitelist=language_whitelist,
            speechless_ratio=speechless_ratio, ambient_dir=ambient_dir,
            augment=augment,
            shuffle=True, use_multiprocessing=use_multiprocessing,
            disable_warnings=True, warmup_queue=False,
        )
        try:
            self.train_dataloader = WhisperFinetuneDataloader(
                (0.0, 0.9), seed=seed, **dl_kwargs)
        except FileNotFoundError:
            # Single-file corpora: int(0.9 * 1) == 0 files in the train
            # slice — adapt-to-one-recording is a legitimate use.
            self.train_dataloader = WhisperFinetuneDataloader(
                (0.0, 1.0), seed=seed, **dl_kwargs)
        try:
            self.val_dataloader = WhisperFinetuneDataloader(
                (0.9, 1.0), seed=seed + 1, **dl_kwargs)
        except FileNotFoundError:
            # Tiny corpora: fall back to a reshuffled train slice.
            self.val_dataloader = WhisperFinetuneDataloader(
                (0.0, 1.0), seed=seed + 1, **dl_kwargs)

        warmup = min(warmup_updates, max(updates - 1, 0))
        total = max(updates, warmup + 1)
        self.lr_schedule = optax.schedules.warmup_cosine_decay_schedule(
            0.0, learning_rate, warmup, total, final_learning_rate)
        # Optimizer-state HBM is the binding term for full-parameter
        # finetunes of the big checkpoints on one chip: AdamW holds two
        # param-sized moment trees, and with grads + updates transient
        # the step peaks at ~5 param trees — measured on a v5e, large-v3
        # bf16 AdamW OOMs at batch 2 EVEN WITH remat
        # (experiments/large_finetune_probe.py). adafactor keeps factored
        # second moments (rank-1, ~1/1000th the size) and no first
        # moment, which is what admits full large-v3 finetune
        # single-chip; it is the standard large-model choice (T5 et al).
        if optimizer == "adamw":
            inner = optax.adamw(self.lr_schedule)
        elif optimizer == "adafactor":
            inner = optax.adafactor(self.lr_schedule)
        else:
            raise ValueError(f"unknown optimizer {optimizer!r} "
                             "(adamw | adafactor)")
        if freeze_encoder and not self.lora_rank:
            # The encoder is usually the part worth preserving (domain
            # shift lives in the text side); freezing it also halves
            # optimizer memory and most of the backward FLOPs.
            inner = optax.multi_transform(
                {"train": inner, "freeze": optax.set_to_zero()},
                param_labels=lambda params: {
                    k: ("freeze" if k == "encoder" else "train")
                    for k in params})
        self.optimizer = optax.MultiSteps(inner, accumulated_batches)

        self.state = self._init_state(params)
        self._build_steps()

    # ------------------------------------------------------------------
    @property
    def _provenance_path(self) -> Path:
        return self.out_dir / "finetune_checkpoint.meta.json"

    def _check_provenance(self) -> None:
        """A checkpoint in --out silently overriding a DIFFERENT --hf
        source would re-export stale weights (resume-from-checkpoint is
        per (source, architecture) run). Refuse loudly on mismatch."""
        import json

        meta = {"src": str(self.src_dir) if self.src_dir else None,
                "cfg": self.cfg.model_dump(),
                "lora": ({"rank": self.lora_rank, "alpha": self.lora_alpha,
                          "targets": self.lora_targets}
                         if self.lora_rank else None)}
        if self.checkpoint_path.exists() and self._provenance_path.exists():
            prev = json.loads(self._provenance_path.read_text())
            if prev != meta:
                raise ValueError(
                    f"{self.checkpoint_path} was written by a different "
                    f"fine-tune run (source {prev.get('src')!r}, now "
                    f"{meta['src']!r}) — resuming would silently ignore "
                    "the new --hf weights. Delete the checkpoint (or pick "
                    "a fresh --out) to start over.")
        # All processes must finish READING the old provenance before the
        # coordinator rewrites it (shared filesystem): a slow process
        # reading the fresh file would compare meta against itself and
        # miss a genuine mismatch.
        barrier("whisper-finetune-provenance")
        if is_coordinator():
            self._provenance_path.write_text(json.dumps(meta))

    def _init_state(self, params) -> TrainState:
        from yoho_tpu.train.trainer import restore_train_state

        self._check_provenance()
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, dtype=np.float32), params)
        params = shard_params(params, self.mesh, WHISPER_RULES)
        if self.lora_rank:
            from yoho_tpu.nn import lora as lora_mod

            # Frozen sharded base + a tiny trainable adapter tree. The
            # TrainState (and so the optimizer + checkpoint) holds ONLY
            # the adapters; adapters replicate (rank-r factors are a few
            # hundred KB — sharding them would just add collectives).
            self.base_params = params
            adapters = lora_mod.init_lora(
                jax.random.PRNGKey(0x10_4a), params, self.lora_rank,
                self.lora_targets)
            if self.freeze_encoder:
                adapters = {k: v for k, v in adapters.items()
                            if not k.startswith("encoder/")}
                if not adapters:
                    raise ValueError(
                        "--freeze-encoder left no LoRA targets (the "
                        f"targets regex {self.lora_targets!r} only "
                        "matched encoder modules)")
            adapters = shard_params(adapters, self.mesh, ())
            state = jax.jit(lambda p: TrainState.create(
                apply_fn=self.model.apply, params=p,
                tx=self.optimizer))(adapters)
            return restore_train_state(state, self.checkpoint_path,
                                       self.mesh, (), self.model.apply,
                                       self.optimizer)
        state = jax.jit(lambda p: TrainState.create(
            apply_fn=self.model.apply, params=p, tx=self.optimizer))(params)
        return restore_train_state(state, self.checkpoint_path, self.mesh,
                                   WHISPER_RULES, self.model.apply,
                                   self.optimizer)

    # ------------------------------------------------------------------
    def _build_steps(self) -> None:
        model, cfg = self.model, self.cfg
        mel_fn = partial(whisper_log_mel, n_mels=cfg.n_mels,
                         sample_rate=cfg.sample_rate, n_fft=cfg.n_fft,
                         hop=cfg.hop_length)

        freeze = self.freeze_encoder and not self.lora_rank

        def loss_fn(params, mel, tokens, loss_mask):
            if freeze:
                # Structural freeze, not just zeroed updates: without
                # stop_gradient the encoder stays in the grad graph
                # (multi_transform only discards its grads AFTER they
                # are computed), and on large-v3 the encoder backward's
                # activations + grad buffers alone push the step past
                # HBM — measured: freeze-b4 OOMed at compile (17.7 GB)
                # before this, fits after.
                params = dict(params, encoder=jax.lax.stop_gradient(
                    params["encoder"]))
            logits = model.apply({"params": params}, mel, tokens)
            return masked_ce_loss(logits, tokens, loss_mask)

        if self.lora_rank:
            from yoho_tpu.nn.lora import merge_lora

            scale = self.lora_scale

            def lora_train_step(state, base_params, audio, tokens,
                                loss_mask):
                mel = mel_fn(audio.astype(jnp.float32))

                def adapter_loss(adapters):
                    # Merge-on-the-fly: O(d^2 * r) extra FLOPs, grads
                    # flow only into the adapters (nn/lora.py docstring).
                    merged = merge_lora(base_params, adapters, scale)
                    return loss_fn(merged, mel, tokens.astype(jnp.int32),
                                   loss_mask.astype(jnp.uint8))

                loss, grads = jax.value_and_grad(adapter_loss)(state.params)
                return state.apply_gradients(grads=grads), loss

            # base_params is an ARGUMENT, not a closure: closed-over
            # arrays bake into the program as constants, which the axon
            # relay re-ships per compile (CLAUDE.md).
            self._train_step = jax.jit(lora_train_step, donate_argnums=(0,))
            self._step_extra = (self.base_params,)
            self._merge = jax.jit(partial(merge_lora, scale=scale))
        else:
            def train_step(state, audio, tokens, loss_mask):
                mel = mel_fn(audio.astype(jnp.float32))
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, mel, tokens.astype(jnp.int32),
                    loss_mask.astype(jnp.uint8))
                # No explicit pmean: grads of data-sharded batches are
                # reduced by XLA through the sharded ops (GSPMD).
                return state.apply_gradients(grads=grads), loss

            self._train_step = jax.jit(train_step, donate_argnums=(0,))
            self._step_extra = ()

        def val_loss_fn(params, audio, tokens, loss_mask):
            mel = mel_fn(audio.astype(jnp.float32))
            return loss_fn(params, mel, tokens.astype(jnp.int32),
                           loss_mask.astype(jnp.uint8))

        self._val_loss = jax.jit(val_loss_fn)

        def decode_samples(params, audio, prompt):
            mel = mel_fn(audio.astype(jnp.float32))
            variables = {"params": params}
            xa = model.apply(variables, mel, method=Whisper.encode_audio)
            ckv = model.apply(variables, xa, method=Whisper.cross_kvs)
            caches = model.apply(variables, prompt.shape[0], jnp.float32,
                                 method=Whisper.init_caches)
            step = make_whisper_step_fn(model, variables, ckv)
            return greedy_decode(step, caches, prompt,
                                 min(cfg.n_text_ctx,
                                     self.train_dataloader.max_target_len),
                                 self.table.eot)

        self._decode_samples = jax.jit(decode_samples)

    # ------------------------------------------------------------------
    def _render(self, row, mask=None) -> str:
        ids = [int(t) for t in row]
        if mask is not None:
            nz = np.nonzero(mask)[0]
            ids = ids[:int(nz[-1]) + 1] if len(nz) else []
        if self.table.eot in ids:
            ids = ids[:ids.index(self.table.eot)]
        return self.table.decode_text(ids)

    def _eval_params(self):
        """Params for full forward passes: merged base+adapters under
        LoRA, else the trained params themselves."""
        if self.lora_rank:
            return self._merge(self.base_params, self.state.params)
        return self.state.params

    def _validate(self, update: int) -> float:
        val_batch = self.val_dataloader.get_prepared_batch()
        # Exposed so subclasses (the distiller's agreement metric) can
        # report on the SAME batch as val_loss instead of consuming
        # another one. Under multi-host this is the LOCAL shard; pair it
        # with _place_batch.
        self._last_val_batch = val_batch
        eval_params = self._eval_params()
        val_loss = float(self._val_loss(
            eval_params, *self._place_batch(val_batch[:3])))

        n = min(self.validation_samples, len(val_batch[0]))
        # Decode under each sample's OWN prompt (sot/language/task as the
        # dataloader built it — per-file detected language included), not
        # a fixed whitelist/"en" prompt that would mis-prompt multilingual
        # corpora. The prompt length is constant across samples.
        plen = len(self.table.sot_sequence(
            self.table.languages[0], self.train_dataloader.task,
            timestamps=self.train_dataloader.timestamps))
        if self.n_processes == 1:
            decoded, _lengths = self._decode_samples(
                eval_params, jnp.asarray(val_batch[0][:n]),
                jnp.asarray(val_batch[1][:n, :plen], jnp.int32))
            decoded = np.asarray(decoded)
        else:
            # Collective: all processes decode their rows in one global
            # batch (wrap-padded to the per-process data extent); the
            # coordinator keeps its own — the first n of the
            # process-major order.
            extent = max(1, self.mesh.shape["data"] // self.n_processes)
            idx = np.arange(n + (-n) % extent) % n
            audio_g, prompt_g = shard_batch(self.mesh, (
                np.asarray(val_batch[0][idx]),
                np.asarray(val_batch[1][idx][:, :plen], np.int32)))
            decoded_g, _lengths = self._decode_samples(
                eval_params, audio_g, prompt_g)
            decoded = np.asarray(fetch_to_host(self.mesh, decoded_g))[:n]
            if self.metrics is None:
                return val_loss
        correct = [self._render(t[plen:], m[plen:])
                   for t, m in zip(val_batch[1][:n], val_batch[2][:n])]
        predicted = [self._render(row[plen:]) for row in decoded]
        self.metrics.write_validation(correct, predicted, [], [])
        return val_loss

    def _place_batch(self, batch):
        """Local rows -> device arrays: plain asarray single-process,
        global assembly (collective) under multi-host."""
        if self.n_processes == 1:
            return tuple(map(jnp.asarray, batch))
        return shard_batch(self.mesh, tuple(np.asarray(x) for x in batch))

    # ------------------------------------------------------------------
    def run(self, progress: bool = False) -> Path:
        acc = self.accumulated_batches
        target_steps = self.updates * acc
        ckpt = (AsyncCheckpointer(self.checkpoint_path, install_sigterm=True)
                if self.metrics is not None else None)
        pbar = None
        if progress:
            from tqdm import tqdm

            pbar = tqdm(initial=int(self.state.step) // acc,
                        total=self.updates)
        acc_loss, seen = 0.0, 0
        completed = False
        try:
            while int(self.state.step) < target_steps:
                step = int(self.state.step)
                batch = self.train_dataloader.get_prepared_batch()
                batch = shard_batch(self.mesh,
                                    tuple(np.asarray(x) for x in batch))
                self.state, loss = self._train_step(
                    self.state, *self._step_extra, *batch)
                acc_loss += float(loss)
                seen += 1
                if step % acc == acc - 1:
                    update = (step + 1) // acc
                    batch_loss = acc_loss / max(seen, 1)
                    acc_loss, seen = 0.0, 0
                    if pbar is not None:
                        pbar.update()
                        pbar.set_postfix_str(f"loss {batch_loss:.4e}")
                    val_loss = None
                    if (self.validation_frequency > 0
                            and update % self.validation_frequency == 0):
                        val_loss = self._validate(update)
                        self._save_checkpoint(ckpt)
                    if self.metrics is not None:
                        self.metrics.log(update,
                                         float(self.lr_schedule(update)),
                                         batch_loss, val_loss)
            completed = True
        finally:
            self._save_checkpoint(ckpt)
            if ckpt is not None:
                ckpt.close()
            self.train_dataloader.terminate()
            self.val_dataloader.terminate()
            if completed:
                self.export()
            if pbar is not None:
                pbar.close()
        return self.out_dir

    def _save_checkpoint(self, ckpt: Optional[AsyncCheckpointer]) -> None:
        """Collective on all processes; coordinator writes."""
        save_train_state(self.mesh, self.state, ckpt)

    def export(self) -> Path:
        """Write the tuned params as an HF checkpoint dir (nn/export.py).

        Under LoRA, two artifacts: the merged full checkpoint (serves
        anywhere, zero runtime cost) AND the bare adapter
        (``lora_adapter.msgpack`` + meta — re-applicable to the same base
        via ``--lora``, shippable at <1% of the checkpoint size)."""
        from yoho_tpu.nn.export import export_hf_whisper

        if self.lora_rank:
            from yoho_tpu.nn.lora import save_adapter

            params = fetch_to_host(self.mesh, self._eval_params())
            adapters = fetch_to_host(self.mesh, self.state.params)
            if self.metrics is None:
                return self.out_dir  # non-coordinator: gathered above
            save_adapter(self.out_dir, adapters, rank=self.lora_rank,
                         alpha=self.lora_alpha, targets=self.lora_targets,
                         extra_meta={"src": str(self.src_dir)
                                     if self.src_dir else None})
            return export_hf_whisper(params, self.cfg, self.out_dir,
                                     src_dir=self.src_dir)
        params = fetch_to_host(self.mesh, self.state.params)
        if self.metrics is None:
            return self.out_dir  # non-coordinator: participated in the gather
        return export_hf_whisper(params, self.cfg, self.out_dir,
                                 src_dir=self.src_dir)
