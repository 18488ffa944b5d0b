"""Umbrella CLI: ``yoho <command> ...`` (also ``python -m yoho_tpu.cli``).

One dispatcher over the per-task CLIs so the framework installs a single
discoverable command (the reference drives everything through bare
scripts — ``train/run_train_session.py:7-27``); each subcommand is also
installed as its own ``yoho-<command>`` console script.
"""

from __future__ import annotations

import importlib
import sys

COMMANDS = {
    "transcribe": ("yoho_tpu.cli.transcribe", "Transcribe audio files"),
    "serve": ("yoho_tpu.cli.serve", "HTTP transcription server"),
    "evaluate": ("yoho_tpu.cli.evaluate", "WER/CER evaluation over a corpus"),
    "finetune": ("yoho_tpu.cli.finetune",
                 "Fine-tune a Whisper checkpoint on an SRT corpus"),
    "distill": ("yoho_tpu.cli.distill",
                "Distill a small draft Whisper for speculative decoding"),
    "create-session": ("yoho_tpu.cli.create_session",
                       "Scaffold a training session"),
    "run-session": ("yoho_tpu.cli.run_session", "Run a training stage (0-4)"),
    "plot-metrics": ("yoho_tpu.cli.plot_metrics",
                     "Live metrics dashboard for a session"),
    "split-tracks": ("yoho_tpu.cli.split_tracks",
                     "Split long (audio, SRT) pairs into chunks"),
    "cache-corpus": ("yoho_tpu.cli.cache_corpus",
                     "Transcode a corpus to FLAC for fast decode"),
    "import-corpus": ("yoho_tpu.cli.import_corpus",
                      "Import CommonVoice/LibriSpeech/LJSpeech/CSV "
                      "corpora into the SRT training layout"),
    "summary": ("yoho_tpu.cli.summary", "Model/param summary"),
    "enroll": ("yoho_tpu.cli.enroll",
               "Enroll speaker voiceprints for recognition"),
    "align": ("yoho_tpu.cli.align",
              "Forced alignment: word timings for known transcripts"),
    "score-diarization": ("yoho_tpu.cli.score_diarization",
                          "DER between reference and hypothesis RTTM"),
    "doctor": ("yoho_tpu.cli.doctor",
               "Environment self-check (devices, codecs, checkpoints)"),
}


def _usage() -> str:
    lines = ["usage: yoho <command> [args...]", "", "commands:"]
    width = max(map(len, COMMANDS))
    for name, (_mod, desc) in COMMANDS.items():
        lines.append(f"  {name:<{width}}  {desc}")
    lines.append("")
    lines.append("run 'yoho <command> --help' for command arguments")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    try:
        if not argv or argv[0] in ("-h", "--help"):
            print(_usage())
            return 0
        name = argv[0]
        if name not in COMMANDS:
            print(f"yoho: unknown command {name!r}\n\n{_usage()}",
                  file=sys.stderr)
            return 2
        module = importlib.import_module(COMMANDS[name][0])
        return module.main(argv[1:]) or 0
    except BrokenPipeError:  # e.g. `yoho --help | head`
        return 0


if __name__ == "__main__":
    raise SystemExit(main())
