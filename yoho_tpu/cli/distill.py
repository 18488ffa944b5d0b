"""Distill a small same-vocab draft Whisper for speculative decoding.

``yoho distill --hf <teacher> --student-preset tiny --data <corpus>
--out <dir>`` (or ``--student-hf <small_ckpt>`` to start from existing
small weights). The exported dir plugs straight into
``yoho serve --hf <teacher> --draft-hf <dir>`` — the printed
teacher-agreement number is the projected speculative acceptance rate.

See ``train/distill.py`` for the loss design; no reference counterpart.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from yoho_tpu.parallel.mesh import init_distributed
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    init_distributed()  # no-op single-process; pods launch one per host
    parser = argparse.ArgumentParser(
        description="Distill a small draft Whisper from a teacher "
                    "checkpoint on an SRT corpus")
    parser.add_argument("--hf", type=str, required=True,
                        help="teacher checkpoint dir (frozen)")
    student = parser.add_mutually_exclusive_group(required=True)
    student.add_argument("--student-hf", type=str,
                         help="initialize the student from an existing "
                              "small checkpoint (e.g. a local whisper-tiny)")
    student.add_argument("--student-preset", type=str,
                         help="random-init student from a size preset "
                              "(tiny/base/small/...), vocab matched to "
                              "the teacher")
    parser.add_argument("--data", type=str, required=True,
                        help="corpus dir with transcripts/*.srt + audio/*")
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--alpha", type=float, default=0.5,
                        help="CE weight: loss = alpha*CE + (1-alpha)*KL")
    parser.add_argument("--tau", type=float, default=2.0,
                        help="distillation temperature")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--updates", type=int, default=2000)
    parser.add_argument("--warmup", type=int, default=100)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--final-lr", type=float, default=1e-6)
    parser.add_argument("--accum", type=int, default=1)
    parser.add_argument("--remat", action="store_true",
                        help="gradient-checkpoint the student's blocks "
                             "(same grads, less activation memory)")
    parser.add_argument("--no-timestamps", action="store_true")
    parser.add_argument("--language", type=str, action="append", default=None)
    parser.add_argument("--no-augment", action="store_true")
    parser.add_argument("--val-every", type=int, default=100,
                        help="updates between validations (0 = never); "
                             "each validation prints teacher-agreement")
    parser.add_argument("--max-target-len", type=int, default=None)
    parser.add_argument("--workers", action="store_true")
    parser.add_argument("--f32", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    if args.updates < 1:
        parser.error("--updates must be >= 1")
    if args.accum < 1:
        parser.error("--accum must be >= 1")
    if args.tau <= 0:
        parser.error("--tau must be > 0")

    import jax
    import jax.numpy as jnp

    from yoho_tpu.core.config import WHISPER_PRESETS
    from yoho_tpu.nn.convert import load_hf_whisper
    from yoho_tpu.nn.whisper import Whisper
    from yoho_tpu.text.gpt2_bpe import load_text_backend
    from yoho_tpu.text.whisper_tokens import WhisperTokenTable
    from yoho_tpu.train.distill import WhisperDistiller

    t_cfg, t_params = load_hf_whisper(args.hf)
    table = WhisperTokenTable(multilingual=t_cfg.n_vocab != 51864,
                              v3=t_cfg.n_vocab == 51866,
                              text_backend=load_text_backend(args.hf))
    if table.text_backend is None:
        print(f"error: no tokenizer files found at {args.hf!r} — "
              "distillation must ENCODE transcripts; add vocab.json+"
              "merges.txt or tokenizer.json to the teacher dir.",
              file=sys.stderr)
        return 2

    if args.student_hf:
        s_cfg, s_params = load_hf_whisper(args.student_hf)
        if s_cfg.n_vocab != t_cfg.n_vocab:
            print(f"error: student vocab {s_cfg.n_vocab} != teacher vocab "
                  f"{t_cfg.n_vocab} — speculative verify compares token "
                  "ids, so the draft must share the tokenizer (e.g. a "
                  "large-v3 teacher needs a v3-vocab student).",
                  file=sys.stderr)
            return 2
    else:
        if args.student_preset not in WHISPER_PRESETS:
            parser.error(f"unknown preset {args.student_preset!r}; "
                         f"choose from {sorted(WHISPER_PRESETS)}")
        # Vocab matched (speculative verify compares ids) AND mel matched
        # (the speculative Transcriber feeds ONE shared mel to both
        # models — e.g. a large-v3 teacher needs a 128-mel draft even
        # though public tiny uses 80).
        s_cfg = WHISPER_PRESETS[args.student_preset].model_copy(
            update={"n_vocab": t_cfg.n_vocab, "n_mels": t_cfg.n_mels})
        model = Whisper(s_cfg, dtype=jnp.float32)
        s_params = jax.jit(model.init)(
            jax.random.PRNGKey(args.seed),
            jnp.zeros((1, s_cfg.n_frames, s_cfg.n_mels), jnp.float32),
            jnp.zeros((1, 4), jnp.int32))["params"]

    distiller = WhisperDistiller(
        t_cfg, t_params, s_cfg, s_params, table, args.data, args.out,
        alpha=args.alpha, tau=args.tau,
        batch_size=args.batch, updates=args.updates,
        warmup_updates=args.warmup, learning_rate=args.lr,
        final_learning_rate=args.final_lr,
        accumulated_batches=args.accum,
        timestamps=not args.no_timestamps,
        language_whitelist=args.language,
        augment=not args.no_augment,
        compute_dtype=jnp.float32 if args.f32 else jnp.bfloat16,
        validation_frequency=args.val_every,
        max_target_len=args.max_target_len,
        use_multiprocessing=args.workers,
        src_dir=args.hf, seed=args.seed,
        remat=args.remat,
    )
    out = distiller.run(progress=True)
    if distiller.last_agreement is not None:
        print(f"final teacher-agreement: {distiller.last_agreement:.3f}")
    print(f"exported draft checkpoint to {out} — serve with "
          f"`yoho serve --hf {args.hf} --draft-hf {out}`")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
