"""CLI: evaluate transcription quality (WER/CER/exact-match) on a dataset.

Dataset layout (LibriSpeech-style flat dir): ``<dir>/*.wav`` with sibling
``<stem>.txt`` reference transcripts, OR a ``transcripts/*.srt`` +
``audio/*`` corpus (the training layout).

Usage: ``python -m yoho_tpu.cli.evaluate <dir>
          (--hf openai/whisper-small | --session main)
          [--limit N] [--beams 5] [--json]``
"""

import argparse
import json as jsonlib
from pathlib import Path


def collect_pairs(root: Path, limit=None):
    """-> [(audio_path, reference_text)]."""
    pairs = []
    if (root / "transcripts").exists():
        from yoho_tpu.text.srt import parse_srt

        for srt_path in sorted((root / "transcripts").iterdir()):
            stem = srt_path.stem
            for suf in (".wav", ".npy", ".mp3", ".flac"):
                cand = root / "audio" / (stem + suf)
                if cand.exists():
                    subs = list(parse_srt(srt_path.read_text(encoding="utf-8")))
                    pairs.append((cand, " ".join(s.content for s in subs)))
                    break
    else:
        for wav in sorted(root.glob("*.wav")):
            txt = wav.with_suffix(".txt")
            if txt.exists():
                pairs.append((wav, txt.read_text(encoding="utf-8").strip()))
    return pairs[:limit] if limit else pairs


def main(argv=None):
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="WER/CER evaluation")
    parser.add_argument("dataset", type=str)
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--hf", type=str)
    src.add_argument("--session", type=str)
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--language", type=str, default="en")
    parser.add_argument("--beams", type=int, default=0)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--json", action="store_true")
    parser.add_argument("--int8-kv", action="store_true",
                        help="evaluate with int8 KV caches")
    parser.add_argument("--int8-weights", action="store_true",
                        help="evaluate with the weight-only int8 decoder "
                             "(measure the quantization quality delta)")
    parser.add_argument("--vad", action="store_true",
                        help="collapse silence before decoding (measures "
                             "the quality impact of VAD on this corpus)")
    parser.add_argument("--normalizer", choices=("basic", "english"),
                        default="basic",
                        help="'english' applies whisper-style normalization "
                             "(contractions, spelled numbers -> digits) so "
                             "WER is comparable to published numbers")
    args = parser.parse_args(argv)

    from yoho_tpu.cli.transcribe import (
        build_whisper_transcriber,
        build_yoho_transcriber,
    )
    from yoho_tpu.eval.wer import cer, normalize_for_wer, wer

    if args.hf:
        t = build_whisper_transcriber(args.hf, args.beams, args.batch,
                                      None if args.language == "auto" else args.language,
                                      True,
                                      quantized=args.int8_kv,
                                      int8_weights=args.int8_weights,
                                      vad_filter=args.vad)
    else:
        t = build_yoho_transcriber(args.session, args.root, args.beams,
                                   args.batch,
                                   int8_weights=args.int8_weights,
                                   vad_filter=args.vad)

    pairs = collect_pairs(Path(args.dataset), args.limit)
    if not pairs:
        print("no (audio, transcript) pairs found")
        return 1

    if args.normalizer == "english":
        from yoho_tpu.eval.english_normalizer import normalize_english as norm
    else:
        norm = normalize_for_wer

    refs, hyps, exact = [], [], 0
    # Pool every utterance's windows into shared decode batches — corpus
    # evaluation is exactly the many-short-files shape transcribe_many
    # exists for (a lone 5 s clip would otherwise pad a whole batch).
    results = t.transcribe_many([str(a) for a, _ref in pairs])
    for (_audio_path, ref), result in zip(pairs, results):
        refs.append(norm(ref))
        hyps.append(norm(result.text))
        exact += refs[-1] == hyps[-1]

    # refs/hyps are already normalized above; don't re-normalize inside
    # (the basic pass would split english-normalized decimals like 3.14).
    wer_rate, wst = wer(refs, hyps, normalize=False)
    cer_rate, _ = cer(refs, hyps, normalize=False)
    report = {
        "utterances": len(pairs),
        "wer": round(wer_rate, 4),
        "cer": round(cer_rate, 4),
        "exact_match": round(exact / len(pairs), 4),
        "substitutions": wst.substitutions,
        "insertions": wst.insertions,
        "deletions": wst.deletions,
    }
    if args.json:
        print(jsonlib.dumps(report))
    else:
        for k, v in report.items():
            print(f"{k:14s} {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
