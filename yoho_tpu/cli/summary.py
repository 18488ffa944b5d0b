"""CLI: model architecture summary + parameter counts.

Parity with the reference's ``__main__`` tabulate blocks
(``yoho/src/nn/model.py:89-98``, trainer ``load_state`` tabulate) as a
proper command.

Usage: ``python -m yoho_tpu.cli.summary (--whisper small | --session main)``
"""

import argparse


def _param_count(tree) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(tree))


def main(argv=None):
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Model summary")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--whisper", type=str,
                     help="Whisper preset name (tiny..large-v3)")
    src.add_argument("--session", type=str, help="YOHO session name")
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--tabulate", action="store_true",
                        help="Full flax tabulate (slow for big models)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.whisper:
        from yoho_tpu.core.config import WHISPER_PRESETS
        from yoho_tpu.nn.whisper import Whisper

        cfg = WHISPER_PRESETS[args.whisper]
        model = Whisper(cfg)
        mel = jnp.zeros((1, cfg.n_frames, cfg.n_mels), jnp.float32)
        tokens = jnp.zeros((1, 8), jnp.int32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), mel, tokens)
        print(f"whisper-{args.whisper}: {cfg.n_audio_layer} enc + "
              f"{cfg.n_text_layer} dec layers, d={cfg.n_audio_state}, "
              f"vocab={cfg.n_vocab}")
        print(f"parameters: {_param_count(shapes['params']) / 1e6:.1f} M")
        if args.tabulate:
            print(model.tabulate(jax.random.PRNGKey(0), mel, tokens))
    else:
        from yoho_tpu.core.config import load_session_config
        from yoho_tpu.nn.yoho import YOHOModel
        from yoho_tpu.text.tokenizer import YOHOTokenizer

        config = load_session_config(args.session, args.root)
        cfg = config.yoho
        tok = YOHOTokenizer.load(config.weights.tokenizer)
        model = YOHOModel(cfg, tok.vocab_size)
        tokens = jnp.zeros((1, cfg.max_text_len), jnp.int32)
        mel = jnp.zeros((1, cfg.max_audio_len, cfg.n_mel_bands), jnp.float32)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), tokens, mel,
                               method=YOHOModel.forward_with_voiceprints)
        )
        print(f"YOHO {args.session}: {cfg.n_audio_blocks} enc + "
              f"{cfg.n_text_blocks} dec blocks, d={cfg.dims}, "
              f"vocab={tok.vocab_size}")
        print(f"parameters: {_param_count(shapes['params']) / 1e6:.2f} M")
        if args.tabulate:
            print(model.tabulate(jax.random.PRNGKey(0), tokens, mel,
                                 method=YOHOModel.forward_with_voiceprints))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
