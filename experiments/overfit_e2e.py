"""End-to-end functional proof: train a tiny YOHO model on 3 synthetic
tone-coded sentences (each sentence announced by a distinct tone) until the
full serving pipeline — session tokenizer -> on-device frontend -> encoder
-> KV-cached greedy decode -> timestamped text — transcribes all three.

Exercises stage 0 + stage 1 + checkpointing + the Transcriber in one run
(~5 minutes on CPU). Expected final line: "RESULT: 3/3 sentences
transcribed correctly".

Usage: python experiments/overfit_e2e.py [workdir]
"""
import sys

import jax
import numpy as np, wave, datetime as dt, io, contextlib
from pathlib import Path
import os
os.makedirs(sys.argv[1] if len(sys.argv) > 1 else "/tmp/yoho_overfit", exist_ok=True)
os.chdir(sys.argv[1] if len(sys.argv) > 1 else "/tmp/yoho_overfit")

from yoho_tpu.text.srt import Subtitle, compose_srt

SENTS = ["hello world", "good morning", "thank you"]
TONES = [440, 880, 1320]

def write_wav(path, data, sr=16000):
    pcm = np.clip(data*32768,-32768,32767).astype(np.int16)
    with wave.open(str(path),"wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr); w.writeframes(pcm.tobytes())

if __name__ == "__main__":
    g = np.random.default_rng(0)
    for d in ("noisy","clean","finetune","ambient","speakers"):
        Path(f"asr_dataset/{d}/transcripts").mkdir(parents=True, exist_ok=True)
        Path(f"asr_dataset/{d}/audio").mkdir(parents=True, exist_ok=True)
    # Each track: one tone-coded sentence repeated; tone identifies the sentence.
    for f in range(6):
        s = f % 3
        subs, t = [], 0.05
        audio = (g.standard_normal(16000)*0.002).astype(np.float32)
        tone = 0.4*np.sin(2*np.pi*TONES[s]*np.arange(int(0.25*16000))/16000)
        for u in range(2):
            a = int(t*16000)
            audio[a:a+len(tone)] += tone.astype(np.float32)
            subs.append(Subtitle(u+1, dt.timedelta(seconds=t), dt.timedelta(seconds=t+0.25), SENTS[s]))
            t += 0.45
        Path(f"asr_dataset/noisy/transcripts/tr{f}.srt").write_text(compose_srt(subs))
        write_wav(f"asr_dataset/noisy/audio/tr{f}.wav", audio)

    from yoho_tpu.cli.create_session import main as create_main
    import re
    if not Path("sessions/ov").exists():
        create_main(["ov"])
        cfgp = Path("sessions/ov/config.toml")
        toml = cfgp.read_text()
        for a,b in [("max_audio_len = 1024","max_audio_len = 64"),("max_text_len = 256","max_text_len = 16"),
                    ("dims = 384","dims = 64"),("n_audio_blocks = 4","n_audio_blocks = 2"),
                    ("n_text_blocks = 4","n_text_blocks = 2"),("n_mel_bands = 128","n_mel_bands = 32"),
                    ("n_audio_heads = 6","n_audio_heads = 4"),("n_text_heads = 6","n_text_heads = 4"),
                    ("vocab_size = 16000","vocab_size = 400"),
                    ("learning_rate = 0.001","learning_rate = 0.003"),
                    ("batch_size = 16","batch_size = 8"),("accumulated_batches = 16","accumulated_batches = 1"),
                    ("warmup_updates = 2500","warmup_updates = 20"),
                    ("validation_frequency = 25","validation_frequency = 100"),("validation_samples = 8","validation_samples = 2"),
                    ("speechless_sample_ratio = 0.1","speechless_sample_ratio = 0.0")]:
            toml = toml.replace(a,b)
        toml = toml.replace("updates = 250000","updates = 300")
        cfgp.write_text(toml)
        from yoho_tpu.cli.run_session import main as run_main
        with contextlib.redirect_stdout(io.StringIO()):
            run_main(["ov","0"])

    # Train stage 1 without augmentation (deterministic tones).
    from yoho_tpu.core.config import load_session_config
    from yoho_tpu.text.tokenizer import YOHOTokenizer
    from yoho_tpu.train.trainer import ASRTrainer
    config = load_session_config("ov")
    tok = YOHOTokenizer.load(config.weights.tokenizer)
    trainer = ASRTrainer(config, tokenizer=tok, stage=1, use_multiprocessing=False)
    trainer.train_dataloader.augment = False
    trainer.train_dataloader.speechless_ratio = 0.0
    trainer.val_dataloader.augment = False
    trainer.run(max_updates=300)
    last = Path("sessions/ov/stages/1/metrics.csv").read_text().strip().splitlines()[-1]
    print("final metrics:", last, flush=True)

    # Serve: transcribe each tone-sentence through the full pipeline.
    import jax.numpy as jnp
    from yoho_tpu.infer import Transcriber
    from yoho_tpu.nn.yoho import YOHOModel
    model = trainer.model
    variables = {"params": trainer.state.params}
    t = Transcriber(model, variables, family="yoho", tokenizer=tok, batch_size=1)
    ok = 0
    for s in range(3):
        audio = (np.random.default_rng(9).standard_normal(config.yoho.n_samples)*0.002).astype(np.float32)
        tone = 0.4*np.sin(2*np.pi*TONES[s]*np.arange(int(0.25*16000))/16000)
        audio[800:800+len(tone)] += tone.astype(np.float32)
        res = t.transcribe(audio)
        hit = SENTS[s] in res.text
        ok += hit
        print(f"tone {TONES[s]} -> {res.text!r} (expect {SENTS[s]!r}) {'OK' if hit else 'MISS'}", flush=True)
        for seg in res.segments:
            print(f"   [{seg.start:.2f}-{seg.end:.2f}] spk={seg.speaker} {seg.text!r}", flush=True)
    print(f"RESULT: {ok}/3 sentences transcribed correctly", flush=True)
