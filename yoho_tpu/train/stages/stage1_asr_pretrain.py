"""Stage 1: transcription pretraining without voiceprint supervision
(parity entry point for ``train/stages/transcription_pretrain_no_voiceprints.py``)."""

from __future__ import annotations

from yoho_tpu.core.config import SessionConfig
from yoho_tpu.train.trainer import ASRTrainer


def main(config: SessionConfig, max_updates=None, use_multiprocessing: bool = True) -> None:
    trainer = ASRTrainer(config, stage=1, use_multiprocessing=use_multiprocessing)
    trainer.run(max_updates=max_updates, progress=True)
