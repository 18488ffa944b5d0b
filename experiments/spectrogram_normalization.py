"""Visual sanity check of the dataloader + normalization chain (parity:
``experiments/spectorgram_normalization.py``): pull a real batch, print
decoded target tokens, and dump normalized mel slices as PNGs.

Usage: python experiments/spectrogram_normalization.py <session> [--root ...]
"""

import argparse
from pathlib import Path

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("session", type=str)
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--out", type=str, default="/tmp/spectrograms")
    args = parser.parse_args(argv)

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from yoho_tpu.audio.frontend import yoho_log_mel
    from yoho_tpu.core.config import load_session_config
    from yoho_tpu.text.tokenizer import YOHOTokenizer
    from yoho_tpu.train.dataloader import TranscriptionDataloader

    config = load_session_config(args.session, args.root)
    tokenizer = YOHOTokenizer.load(config.weights.tokenizer)
    dataloader = TranscriptionDataloader(
        (0, 1), config, tokenizer, batch_size=4, use_multiprocessing=False,
        disable_warnings=True,
    )
    audio, tokens, loss_mask = dataloader.get_prepared_batch()[:3]

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    spec = np.asarray(yoho_log_mel(jnp.asarray(audio), config.yoho))
    for i, (s, toks, mask) in enumerate(zip(spec, tokens, loss_mask)):
        nz = np.nonzero(mask)[0]
        length = int(nz[-1]) + 1 if len(nz) else 0
        print(f"[{i}] {tokenizer.decode(toks[:length])}")
        fig, ax = plt.subplots(figsize=(10, 4))
        ax.imshow(s.T, aspect="auto", origin="lower")
        ax.set_xlabel("frame")
        ax.set_ylabel("mel band")
        fig.savefig(out_dir / f"spec_{i}.png", dpi=80)
        plt.close(fig)
    print(f"wrote {len(spec)} spectrogram PNGs to {out_dir}")
    print(f"normalized stats: mean={spec.mean():.4f} std={spec.std():.4f}")


if __name__ == "__main__":
    main()
