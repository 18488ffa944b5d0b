"""Training-harness tests on synthetic SRT+WAV fixtures (SURVEY.md §4)."""

import datetime as dt
import wave

import numpy as np
import pytest

import jax

from yoho_tpu.core.config import (
    DatasetConfig,
    Hyperparameters,
    MeshConfig,
    SessionConfig,
    TrainingASRHP,
    YOHOConfig,
)
from yoho_tpu.parallel.mesh import make_mesh
from yoho_tpu.text.srt import Subtitle, compose_srt
from yoho_tpu.text.tokenizer import train_tokenizer
from yoho_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint, save_checkpoint
from yoho_tpu.train.dataloader import TranscriptionDataloader
from yoho_tpu.train.metrics import MetricsWriter
from yoho_tpu.train.session import create_session

TINY_YOHO = dict(
    sample_rate=16000, n_mel_bands=16, n_fft=400, stft_hop=160,
    max_audio_len=64, max_text_len=32, dims=32,
    n_audio_heads=4, n_audio_blocks=1, n_text_heads=4, n_text_blocks=1,
)

SENTENCES = [
    "hello there friend", "this is a test", "the quick brown fox",
    "we are training a model", "speech goes in text comes out",
    "one more utterance here",
]


def _write_wav(path, data, sr=16000):
    pcm = np.clip(data * 32768, -32768, 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    """3 tracks x ~4 utterances of 0.2 s speech each, tiny chunk model."""
    root = tmp_path_factory.mktemp("corpus")
    cfg = YOHOConfig(**TINY_YOHO)
    g = np.random.default_rng(0)
    for d in ("noisy", "clean", "finetune", "ambient", "speakers"):
        (root / d / "transcripts").mkdir(parents=True)
        (root / d / "audio").mkdir(parents=True)
    for f in range(3):
        subs, t = [], 0.1
        n_total = int(16000 * 2.5)
        audio = g.standard_normal(n_total).astype(np.float32) * 0.01
        for u in range(4):
            start, end = t, t + 0.2
            tone = 0.3 * np.sin(2 * np.pi * (300 + 100 * u) *
                                np.arange(int(0.2 * 16000)) / 16000)
            audio[int(start * 16000): int(start * 16000) + len(tone)] += tone
            subs.append(Subtitle(u + 1, dt.timedelta(seconds=start),
                                 dt.timedelta(seconds=end),
                                 SENTENCES[(f + u) % len(SENTENCES)]))
            t = end + 0.3
        (root / "noisy" / "transcripts" / f"track{f}.srt").write_text(compose_srt(subs))
        _write_wav(root / "noisy" / "audio" / f"track{f}.wav", audio)
    # ambient noise file for speechless samples
    _write_wav(root / "ambient" / "audio" / "amb.wav",
               g.standard_normal(16000).astype(np.float32) * 0.01)
    return root, cfg


@pytest.fixture(scope="module")
def session_config(dataset, tmp_path_factory):
    root, cfg = dataset
    sess_root = tmp_path_factory.mktemp("sessions")
    hp = Hyperparameters()
    hp.transcribe_pretrain = TrainingASRHP(
        learning_rate=1e-3, final_learning_rate=1e-5, batch_size=4,
        accumulated_batches=2, updates=50, warmup_updates=2,
        validation_frequency=1, validation_samples=2, speechless_sample_ratio=0.0,
    )
    config = SessionConfig(
        name="t", yoho=cfg,
        dataset=DatasetConfig(**{k: root / k for k in
                                 ("noisy", "clean", "finetune", "ambient", "speakers")}),
        hyperparameters=hp, sessions_root=sess_root,
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()
    return config


@pytest.fixture(scope="module")
def tokenizer(session_config):
    cfg = session_config
    tok = train_tokenizer(SENTENCES * 5, vocab_size=cfg.yoho.max_audio_len + 3 + 256 + 200,
                          max_audio_len=cfg.yoho.max_audio_len, backend="python")
    return tok


def test_dataloader_batch_contract(session_config, tokenizer):
    dl = TranscriptionDataloader((0, 1), session_config, tokenizer, batch_size=4,
                                 use_multiprocessing=False, shuffle=True)
    audio, tokens, mask = dl.get_prepared_batch()
    cfg = session_config.yoho
    assert audio.shape == (4, cfg.n_samples) and audio.dtype == np.float32
    assert tokens.shape == (4, cfg.max_text_len) and tokens.dtype == np.int32
    assert mask.shape == (4, cfg.max_text_len) and mask.dtype == np.uint8

    for r in range(4):
        toks = tokens[r]
        assert toks[0] == tokenizer.sot_id
        # mask is 1 on real tokens, 0 on padding and voiceprint slots
        L = mask[r].sum() + (toks == tokenizer.voiceprint_id).sum()
        assert L > 0
        vp_positions = np.nonzero(toks == tokenizer.voiceprint_id)[0]
        assert np.all(mask[r][vp_positions] == 0)
        # timestamp tokens within range and paired around text
        ts = [t for t in toks if tokenizer.is_timestamp(int(t))]
        assert len(ts) % 2 == 0 and len(ts) >= 2


def test_dataloader_deterministic(session_config, tokenizer):
    a = TranscriptionDataloader((0, 1), session_config, tokenizer, batch_size=2,
                                use_multiprocessing=False, seed=7)
    b = TranscriptionDataloader((0, 1), session_config, tokenizer, batch_size=2,
                                use_multiprocessing=False, seed=7)
    batch_a, batch_b = a.get_batch(0), b.get_batch(0)
    for x, y in zip(batch_a, batch_b):
        np.testing.assert_array_equal(x, y)


def test_dataloader_speechless(session_config, tokenizer):
    dl = TranscriptionDataloader((0, 1), session_config, tokenizer, batch_size=3,
                                 use_multiprocessing=False, speechless_ratio=1.0)
    audio, tokens, mask = dl.get_batch(0)
    for r in range(3):
        # empty transcript: SOT then EOT, no timestamps
        assert tokens[r][0] == tokenizer.sot_id
        assert tokens[r][1] == tokenizer.eot_id
        assert mask[r].sum() == 2


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    opt = {"mu": {"w": np.zeros((2, 3), np.float32)}, "count": np.asarray(3)}
    path = tmp_path / "c.msgpack"
    save_checkpoint(path, 17, params, opt)
    restored = load_checkpoint(path, params, opt)
    assert restored is not None
    step, p, o = restored
    assert step == 17
    np.testing.assert_array_equal(p["w"], params["w"])
    np.testing.assert_array_equal(o["count"], 3)
    assert load_checkpoint(tmp_path / "missing", params, opt) is None


def test_async_checkpointer_coalesces(tmp_path):
    path = tmp_path / "c.msgpack"
    ck = AsyncCheckpointer(path)
    params = {"w": np.ones(4, np.float32)}
    for step in range(5):
        ck.save(step, {"w": params["w"] * step}, {})
    ck.close()
    restored = load_checkpoint(path, params, {})
    assert restored is not None
    step, p, _ = restored
    assert step == 4  # latest snapshot wins
    np.testing.assert_array_equal(p["w"], np.ones(4) * 4)


def test_metrics_writer(tmp_path):
    m = MetricsWriter(tmp_path / "metrics.csv", tmp_path / "val.jsonl")
    m.log(1, 1e-3, 2.5)
    m.log(2, 1e-3, 2.0, val_loss=1.9)
    lines = (tmp_path / "metrics.csv").read_text().strip().split("\n")
    assert lines[0] == "update,learning_rate,loss,val_loss"
    assert lines[1].startswith("1,0.001,2.5,")
    assert lines[2].endswith("1.9")

    m.write_validation(["<|startoftranscript|>hi<|endoftranscript|>junk"],
                       ["<|t-3|>x<|voiceprint|>"], ["a"], ["b"])
    import json

    rec = json.loads((tmp_path / "val.jsonl").read_text())[0]
    assert rec["val_correct"] == "🚀hi🏁"
    assert rec["val_predicted"] == "⏱️x🎙️"

    # Callers without train-sample decoding (whisper finetune/distill)
    # pass empty train lists: the VAL rows must still be written (a
    # plain 4-way zip dropped everything to the empty sequence).
    m.write_validation(["a correct"], ["a predicted"], [], [])
    rows = (tmp_path / "val.jsonl").read_text().strip().split("\n")
    rec2 = json.loads(rows[-1])
    assert rec2 == [{"val_correct": "a correct",
                     "val_predicted": "a predicted",
                     "train_correct": None, "train_predicted": None}]
    # Post-EOT junk spanning newlines is stripped (re.S).
    assert MetricsWriter.humanify(
        "x<|endoftranscript|>junk\nmore") == "x🏁"


def test_create_session(tmp_path):
    from yoho_tpu.core.config import load_session_config

    path = create_session("demo", tmp_path)
    assert (path / "config.toml").exists()
    assert (path / "weights").is_dir() and (path / "stages").is_dir()
    cfg = load_session_config("demo", tmp_path)
    assert cfg.name == "demo"
    with pytest.raises(FileExistsError):
        create_session("demo", tmp_path)


def test_trainer_short_run_and_resume(session_config, tokenizer):
    from yoho_tpu.train.trainer import ASRTrainer

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    trainer = ASRTrainer(session_config, tokenizer=tokenizer, stage=1, mesh=mesh,
                         use_multiprocessing=False)
    assert int(trainer.state.step) == 0
    trainer.run(max_updates=2)

    metrics = (trainer.stage_path / "metrics.csv").read_text().strip().split("\n")
    assert len(metrics) >= 3  # header + 2 updates
    assert (trainer.stage_path / "checkpoint.msgpack").exists()
    assert (trainer.stage_path / "validations.jsonl").exists()
    final_step = int(trainer.state.step)
    assert final_step == 2 * session_config.hyperparameters.transcribe_pretrain.accumulated_batches

    # Resume: a fresh trainer picks up the checkpointed step.
    resumed = ASRTrainer(session_config, tokenizer=tokenizer, stage=1, mesh=mesh,
                         use_multiprocessing=False)
    assert int(resumed.state.step) == final_step


def test_sharded_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from yoho_tpu.train.sharded_checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    params = {"w": jnp.arange(8, dtype=jnp.float32).reshape(2, 4)}
    opt = {"mu": {"w": jnp.zeros((2, 4))}, "count": jnp.asarray(5)}
    path = tmp_path / "ckpt"
    save_checkpoint_sharded(path, 42, params, opt)
    restored = load_checkpoint_sharded(path, params, opt)
    assert restored is not None
    step, p, o = restored
    assert step == 42
    np.testing.assert_array_equal(np.asarray(p["w"]), np.asarray(params["w"]))
    assert load_checkpoint_sharded(tmp_path / "none", params, opt) is None


def test_sharded_checkpoint_preserves_sharding(tmp_path):
    import jax
    import jax.numpy as jnp

    from yoho_tpu.parallel.mesh import make_mesh
    from yoho_tpu.parallel.sharding import shard_params
    from yoho_tpu.train.sharded_checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    params = {"attn": {"q_proj": {"kernel": jnp.ones((8, 8), jnp.float32)}}}
    sharded = shard_params(params, mesh)
    path = tmp_path / "ckpt"
    save_checkpoint_sharded(path, 1, sharded, {})
    restored = load_checkpoint_sharded(path, sharded, {})
    assert restored is not None
    _step, p, _o = restored
    assert p["attn"]["q_proj"]["kernel"].sharding == sharded["attn"]["q_proj"]["kernel"].sharding


def test_trainer_bf16_compute(session_config, tokenizer):
    import jax.numpy as jnp

    from yoho_tpu.train.trainer import ASRTrainer

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    tr = ASRTrainer(session_config, tokenizer=tokenizer, stage=1, mesh=mesh,
                    use_multiprocessing=False, compute_dtype=jnp.bfloat16,
                    checkpoint_name="bf16.msgpack")
    # params stay f32 even with bf16 compute
    leaf = jax.tree_util.tree_leaves(tr.state.params)[0]
    assert leaf.dtype == jnp.float32
    tr.run(max_updates=1)


def test_metrics_writer_concurrent(tmp_path):
    """Many threads appending concurrently never interleave rows."""
    import threading

    m = MetricsWriter(tmp_path / "m.csv")

    def work(k):
        for i in range(50):
            m.log(k * 1000 + i, 1e-3, float(i))

    threads = [threading.Thread(target=work, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    lines = (tmp_path / "m.csv").read_text().strip().split("\n")
    assert len(lines) == 1 + 8 * 50
    for ln in lines[1:]:
        parts = ln.split(",")
        assert len(parts) == 4 and parts[0].isdigit()


def test_sigterm_flushes_checkpoint(tmp_path):
    """Preemption safety: SIGTERM triggers a checkpoint flush (SURVEY §5)."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap

    script = textwrap.dedent(f"""
        import os, signal, sys, time
        import numpy as np
        from yoho_tpu.train.checkpoint import AsyncCheckpointer, load_checkpoint

        ck = AsyncCheckpointer({str(repr(str(tmp_path / 'c.msgpack')))}, install_sigterm=True)
        # block the writer so the pending snapshot survives until SIGTERM
        import threading
        ck._cv.acquire()  # starve the worker loop
        ck._pending = (1, (7, {{"w": np.ones(3, np.float32)}}, {{}}))
        os.kill(os.getpid(), signal.SIGTERM)
    """)
    proc = subprocess.run([sys.executable, "-c", script], timeout=120,
                          capture_output=True,
                          env={**os.environ, "JAX_PLATFORMS": "cpu"})
    restored = load_checkpoint(tmp_path / "c.msgpack",
                               {"w": np.zeros(3, np.float32)}, {})
    assert restored is not None
    step, p, _ = restored
    assert step == 7
    np.testing.assert_array_equal(p["w"], np.ones(3))


def test_flush_waits_for_inflight_write(tmp_path, monkeypatch):
    """The preemption path (ADVICE r1): if the writer thread is mid-write
    of an OLDER snapshot when flush(timeout=...) runs, the flush must wait
    for it and then write the NEWEST snapshot — not drop it."""
    import threading
    import time

    import yoho_tpu.train.checkpoint as ckpt_mod

    real_save = ckpt_mod.save_checkpoint
    in_write = threading.Event()
    release = threading.Event()

    def slow_save(path, step, params, opt_state):
        in_write.set()
        release.wait(timeout=30)
        real_save(path, step, params, opt_state)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", slow_save)
    ck = AsyncCheckpointer(tmp_path / "c.msgpack")
    try:
        ck.save(1, {"w": np.ones(3, np.float32)}, {})
        assert in_write.wait(timeout=30)  # writer thread is mid-write of #1
        ck.save(2, {"w": np.full(3, 2.0, np.float32)}, {})
        t = threading.Thread(target=ck.flush, kwargs={"timeout": 30.0})
        t.start()
        time.sleep(0.1)  # flush is now blocked on the write lock
        release.set()
        t.join(timeout=30)
        assert not t.is_alive()
        restored = load_checkpoint(tmp_path / "c.msgpack",
                                   {"w": np.zeros(3, np.float32)}, {})
        step, p, _ = restored
        assert step == 2
        np.testing.assert_array_equal(p["w"], np.full(3, 2.0))
    finally:
        release.set()
        ck.close()


def test_flush_restages_on_self_deadlock(tmp_path):
    """If the lock holder is the flushing thread itself (handler
    interrupted a frame inside _write), flush re-stages the snapshot
    instead of deadlocking or dropping it."""
    import threading

    ck = AsyncCheckpointer(tmp_path / "c.msgpack")
    try:
        # Freeze the worker loop so pending stays staged.
        ck._cv.acquire()
        ck._pending = (5, (5, {"w": np.ones(1, np.float32)}, {}))
        ck._write_owner = threading.current_thread()  # simulate interrupt
        ck.flush(timeout=1.0)
        assert ck._pending is not None and ck._pending[0] == 5  # re-staged
        ck._write_owner = None
        ck.flush()
        assert ck._pending is None
        restored = load_checkpoint(tmp_path / "c.msgpack",
                                   {"w": np.zeros(1, np.float32)}, {})
        assert restored is not None and restored[0] == 5
    finally:
        try:
            ck._cv.release()
        except RuntimeError:
            pass
        ck.close()


def test_flush_waits_for_midwrite_of_newest(tmp_path, monkeypatch):
    """SIGTERM path, no staged snapshot: the writer is MID-WRITE of the
    newest snapshot (pending already popped). flush() must wait for that
    write to become durable, not return instantly and let the handler
    kill the process mid os.replace."""
    import threading
    import time

    import yoho_tpu.train.checkpoint as ckpt_mod

    real_save = ckpt_mod.save_checkpoint
    in_write = threading.Event()
    release = threading.Event()

    def slow_save(path, step, params, opt_state):
        in_write.set()
        release.wait(timeout=30)
        real_save(path, step, params, opt_state)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", slow_save)
    ck = AsyncCheckpointer(tmp_path / "c.msgpack")
    try:
        ck.save(1, {"w": np.ones(2, np.float32)}, {})
        assert in_write.wait(timeout=30)
        assert ck._pending is None  # popped: the old flush returned here
        done = threading.Event()

        def run_flush():
            ck.flush(timeout=30.0)
            done.set()

        t = threading.Thread(target=run_flush)
        t.start()
        time.sleep(0.2)
        assert not done.is_set()  # flush is WAITING on the in-flight write
        release.set()
        t.join(timeout=30)
        assert done.is_set()
        restored = load_checkpoint(tmp_path / "c.msgpack",
                                   {"w": np.zeros(2, np.float32)}, {})
        assert restored is not None and restored[0] == 1
    finally:
        release.set()
        ck.close()


def test_writer_thread_survives_write_failure(tmp_path, monkeypatch):
    """A transient write error must not kill the background writer:
    later saves still reach disk (the old thread died on first raise,
    silently turning every subsequent save into a no-op)."""
    import yoho_tpu.train.checkpoint as ckpt_mod

    real_save = ckpt_mod.save_checkpoint
    fail_once = {"armed": True}

    def flaky_save(path, step, params, opt_state):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise OSError("disk full")
        real_save(path, step, params, opt_state)

    monkeypatch.setattr(ckpt_mod, "save_checkpoint", flaky_save)
    ck = AsyncCheckpointer(tmp_path / "c.msgpack")
    try:
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ck.save(1, {"w": np.ones(2, np.float32)}, {})
            for _ in range(100):  # let the failing write drain
                if not fail_once["armed"]:
                    break
                import time

                time.sleep(0.05)
        ck.save(2, {"w": np.full(2, 2.0, np.float32)}, {})
        ck.flush(timeout=30.0)
        restored = load_checkpoint(tmp_path / "c.msgpack",
                                   {"w": np.zeros(2, np.float32)}, {})
        assert restored is not None and restored[0] == 2
    finally:
        ck.close()


def test_workers_see_epoch_reshuffle(session_config, tokenizer):
    """Spawned workers hold a pickled-at-spawn copy of the loader; the
    epoch tag on every task lets them re-derive each epoch's shuffle —
    without it every epoch replays byte-identical batches."""
    dl = TranscriptionDataloader((0, 1), session_config, tokenizer,
                                 batch_size=4, shuffle=True,
                                 use_multiprocessing=True, num_workers=1,
                                 max_queued_batches=2, warmup_queue=False,
                                 disable_warnings=True)
    try:
        n = dl.num_batches
        epoch0 = [dl.get_prepared_batch() for _ in range(n)]
        epoch1 = [dl.get_prepared_batch() for _ in range(n)]
    finally:
        dl.terminate()
    flat0 = np.concatenate([b[1].ravel() for b in epoch0])  # token ids
    flat1 = np.concatenate([b[1].ravel() for b in epoch1])
    assert not np.array_equal(flat0, flat1), (
        "epoch 2 replayed epoch 1 byte-for-byte — reshuffle not reaching "
        "workers")


class _ExplodingLoader(TranscriptionDataloader):
    """Module-level so the spawn pickle can find it."""

    def get_batch(self, idx):
        raise ValueError("corrupt audio file")


def test_worker_errors_surface_instead_of_hanging(session_config, tokenizer):
    """A worker whose get_batch raises must surface the error to the
    training loop, not die silently and hang the queue forever."""
    dl = _ExplodingLoader((0, 1), session_config, tokenizer, batch_size=2,
                   use_multiprocessing=True, num_workers=1,
                   max_queued_batches=2, warmup_queue=False,
                   disable_warnings=True)
    try:
        with pytest.raises(RuntimeError, match="corrupt audio file"):
            dl.get_prepared_batch()
    finally:
        dl.terminate()


class _ExplodingFirstLoader(TranscriptionDataloader):
    """Module-level so the spawn pickle can find it. Only batch 0 fails —
    one worker dies, the others stay alive."""

    def get_batch(self, idx):
        if idx == 0:
            raise ValueError("corrupt audio file")
        return super().get_batch(idx)


def test_partial_worker_death_does_not_hang_warmup(session_config, tokenizer):
    """With warmup_queue=True, ONE worker dying (its queued tasks lost)
    must not spin __init__ forever waiting for a queue that can never
    fill; the dead worker's error then surfaces on get."""
    dl = _ExplodingFirstLoader((0, 1), session_config, tokenizer,
                               batch_size=2, use_multiprocessing=True,
                               num_workers=2, max_queued_batches=4,
                               warmup_queue=True, disable_warnings=True)
    try:
        with pytest.raises(RuntimeError, match="corrupt audio file"):
            for _ in range(4):
                dl.get_prepared_batch()
    finally:
        dl.terminate()


# ------------------------------------------------- long-context sessions
def test_long_context_toml_turns_it_on(tmp_path):
    """A session TOML alone configures long-context training (VERDICT r1
    item 6): [mesh] seq + long_context_factor parse into the config."""
    from yoho_tpu.core.config import load_session_config

    sess = tmp_path / "lc"
    sess.mkdir()
    (sess / "config.toml").write_text(
        "[mesh]\ndata = 2\nmodel = 1\nseq = 4\n"
        "[hyperparameters.transcribe_pretrain]\nlong_context_factor = 2\n")
    cfg = load_session_config("lc", tmp_path)
    assert cfg.mesh.seq == 4
    assert cfg.hyperparameters.transcribe_pretrain.long_context_factor == 2
    with pytest.raises(ValueError):
        TrainingASRHP(long_context_factor=0)


def test_long_context_session_training(dataset, tmp_path_factory):
    """ASRTrainer with long_context_factor=2: the dataloader packs clips
    2x the base window, the step runs ring attention over the mesh's seq
    axis, and the loss MATCHES the plain single-device step on the same
    batch (sequence parallelism changes wall layout, never math)."""
    import jax.numpy as jnp

    from yoho_tpu.audio.frontend import yoho_log_mel
    from yoho_tpu.train.trainer import ASRTrainer, masked_ce_loss

    root, cfg = dataset
    sess_root = tmp_path_factory.mktemp("lc_sessions")
    hp = Hyperparameters()
    hp.transcribe_pretrain = TrainingASRHP(
        learning_rate=1e-3, final_learning_rate=1e-5, batch_size=2,
        accumulated_batches=1, updates=4, warmup_updates=1,
        validation_frequency=4, validation_samples=1,
        speechless_sample_ratio=0.0, long_context_factor=2,
    )
    config = SessionConfig(
        name="lc", yoho=YOHOConfig(**TINY_YOHO),
        dataset=DatasetConfig(**{k: root / k for k in
                                 ("noisy", "clean", "finetune", "ambient",
                                  "speakers")}),
        hyperparameters=hp, sessions_root=sess_root,
        mesh=MeshConfig(data=2, model=1, seq=4),
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()
    # Stage-0 contract: specials cover the SCALED frame range.
    tok = train_tokenizer(SENTENCES * 5,
                          vocab_size=2 * cfg.max_audio_len + 3 + 256 + 200,
                          max_audio_len=2 * cfg.max_audio_len,
                          backend="python")

    trainer = ASRTrainer(config, tokenizer=tok, stage=1,
                         use_multiprocessing=False)
    assert trainer.mesh.shape == {"data": 2, "seq": 4}

    # Dataloader produces 2x-window clips with 2x-range timestamps.
    audio, tokens, mask = trainer.train_dataloader.get_prepared_batch()
    scaled = trainer.data_config.yoho
    assert scaled.max_audio_len == 2 * cfg.max_audio_len
    assert audio.shape == (2, scaled.n_samples)
    assert tokens.shape == (2, 2 * cfg.max_text_len)

    # Loss parity: sequence-parallel ring step == plain replicated math.
    params = trainer.state.params
    ring_loss = float(trainer._val_loss(params, jnp.asarray(audio),
                                        jnp.asarray(tokens),
                                        jnp.asarray(mask)))
    mel = yoho_log_mel(jnp.asarray(audio, jnp.float32), scaled)
    logits = trainer.model.apply({"params": params},
                                 jnp.asarray(tokens, jnp.int32), mel)
    plain_loss = float(masked_ce_loss(logits, jnp.asarray(tokens, jnp.int32),
                                      jnp.asarray(mask)))
    np.testing.assert_allclose(ring_loss, plain_loss, rtol=2e-5)

    # And the full loop runs: 2 applied updates, metrics written.
    trainer.run(max_updates=2)
    lines = (trainer.stage_path / "metrics.csv").read_text().strip().splitlines()
    assert len(lines) >= 3


def test_moe_session_training(dataset, tmp_path_factory):
    """ASRTrainer with an MoE encoder (n_experts=2): expert params shard
    over the mesh ``model`` axis, the loss carries the Switch aux term,
    and two updates run end-to-end with metrics written."""
    from yoho_tpu.train.trainer import ASRTrainer

    root, _ = dataset
    sess_root = tmp_path_factory.mktemp("moe_sessions")
    moe_cfg = YOHOConfig(**{**TINY_YOHO, "n_audio_blocks": 2},
                         n_experts=2, moe_every_n=2)
    hp = Hyperparameters()
    hp.transcribe_pretrain = TrainingASRHP(
        learning_rate=1e-3, final_learning_rate=1e-5, batch_size=4,
        accumulated_batches=1, updates=4, warmup_updates=1,
        validation_frequency=4, validation_samples=1,
        speechless_sample_ratio=0.0,
    )
    config = SessionConfig(
        name="moe", yoho=moe_cfg,
        dataset=DatasetConfig(**{k: root / k for k in
                                 ("noisy", "clean", "finetune", "ambient",
                                  "speakers")}),
        hyperparameters=hp, sessions_root=sess_root,
        mesh=MeshConfig(data=-1, model=2),  # (4, 2) over the 8 fake devices
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()
    tok = train_tokenizer(SENTENCES * 5,
                          vocab_size=moe_cfg.max_audio_len + 3 + 256 + 200,
                          max_audio_len=moe_cfg.max_audio_len,
                          backend="python")

    trainer = ASRTrainer(config, tokenizer=tok, stage=1,
                         use_multiprocessing=False)
    # Expert leaves exist and are split over the model axis.
    moe_leaf = trainer.state.params["encoder"]["blocks_1"]["mlp"][
        "experts"]["gate"]["kernel"]
    assert moe_leaf.shape[0] == 2
    shard_shapes = {s.data.shape for s in moe_leaf.addressable_shards}
    assert all(sh[0] == 1 for sh in shard_shapes), (
        f"experts not sharded: {moe_leaf.sharding}")

    trainer.run(max_updates=2)
    lines = (trainer.stage_path / "metrics.csv").read_text().strip().splitlines()
    assert len(lines) >= 3
    losses = [float(l.split(",")[2]) for l in lines[1:]]
    assert all(np.isfinite(l) for l in losses)


def test_trainer_rejects_long_context_with_moe(dataset, tmp_path_factory):
    """long_context_factor x MoE is unsupported (the ring encoder drops
    sown aux losses) — the trainer refuses loudly."""
    from yoho_tpu.train.trainer import ASRTrainer

    root, _ = dataset
    sess_root = tmp_path_factory.mktemp("moe_lc_sessions")
    moe_cfg = YOHOConfig(**{**TINY_YOHO, "n_audio_blocks": 2},
                         n_experts=2, moe_every_n=2)
    hp = Hyperparameters()
    hp.transcribe_pretrain = TrainingASRHP(
        learning_rate=1e-3, final_learning_rate=1e-5, batch_size=2,
        accumulated_batches=1, updates=4, warmup_updates=1,
        validation_frequency=4, validation_samples=1,
        speechless_sample_ratio=0.0, long_context_factor=2,
    )
    config = SessionConfig(
        name="moelc", yoho=moe_cfg,
        dataset=DatasetConfig(**{k: root / k for k in
                                 ("noisy", "clean", "finetune", "ambient",
                                  "speakers")}),
        hyperparameters=hp, sessions_root=sess_root,
        mesh=MeshConfig(data=2, model=1, seq=4),
    )
    config.path.mkdir(parents=True, exist_ok=True)
    config.reroot_weights()
    tok = train_tokenizer(SENTENCES * 5,
                          vocab_size=2 * moe_cfg.max_audio_len + 3 + 256 + 200,
                          max_audio_len=2 * moe_cfg.max_audio_len,
                          backend="python")
    with pytest.raises(ValueError, match="n_experts"):
        ASRTrainer(config, tokenizer=tok, stage=1,
                   use_multiprocessing=False)


def test_dataloader_compressed_corpus(dataset, tokenizer, tmp_path):
    """A corpus of FLAC + m4a audio (no WAV anywhere, no ffmpeg binary)
    flows through the TranscriptionDataloader end-to-end — the decode
    paths this framework owns (audio/flac.py, native/avdecode.cpp)."""
    from yoho_tpu.audio.flac import encode_flac
    from yoho_tpu.native import av_encode_m4a_native, get_av_lib

    root, cfg = dataset
    new_root = tmp_path / "compressed"
    for d in ("noisy", "clean", "finetune", "ambient", "speakers"):
        (new_root / d / "transcripts").mkdir(parents=True)
        (new_root / d / "audio").mkdir(parents=True)
    g = np.random.default_rng(0)
    have_av = get_av_lib() is not None
    for i, src in enumerate(sorted((root / "noisy" / "transcripts").iterdir())):
        (new_root / "noisy" / "transcripts" / src.name).write_text(
            src.read_text())
        audio = g.standard_normal(int(16000 * 2.5)).astype(np.float32) * 0.05
        pcm = np.clip(audio * 32768, -32768, 32767).astype(np.int32)
        stem = src.stem
        if i % 2 == 0 or not have_av:
            (new_root / "noisy" / "audio" / f"{stem}.flac").write_bytes(
                encode_flac(pcm[:, None], 16000))
        else:
            av_encode_m4a_native(new_root / "noisy" / "audio" / f"{stem}.m4a",
                                 pcm.astype(np.int16), 16000)

    config = SessionConfig(
        name="comp", yoho=cfg,
        dataset=DatasetConfig(**{k: new_root / k for k in
                                 ("noisy", "clean", "finetune", "ambient",
                                  "speakers")}),
        sessions_root=tmp_path / "sessions",
    )
    dl = TranscriptionDataloader((0, 1), config, tokenizer, batch_size=4,
                                 use_multiprocessing=False, shuffle=True,
                                 speechless_ratio=0.0, augment=False)
    audio, tokens, mask = dl.get_prepared_batch()
    assert audio.shape == (4, cfg.n_samples) and audio.dtype == np.float32
    assert np.abs(audio).max() > 0.001  # decoded real samples, not silence
