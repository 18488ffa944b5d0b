"""CLI: start/resume a training session stage
(parity: ``train/run_train_session.py`` — with the mesh replacing
CUDA_VISIBLE_DEVICES selection, and all five stages implemented).

Usage: ``python -m yoho_tpu.cli.run_session <name> <stage 0-4>``
"""

import argparse

from yoho_tpu.core.config import load_session_config

STAGE_HELP = (
    "Stage of training to start/resume:\n"
    "\t0 - Train tokenizer\n"
    "\t1 - Pretrain transcription without voiceprints\n"
    "\t2 - Train voice reconstruction\n"
    "\t3 - Finetune voiceprint encoder\n"
    "\t4 - Finetune transcription with voiceprints"
)


def main(argv=None):
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(
        description="Starts/Resumes the training of a session",
        formatter_class=argparse.RawTextHelpFormatter,
    )
    parser.add_argument("name", type=str, help="Name of the session")
    parser.add_argument("stage", type=int, choices=[0, 1, 2, 3, 4], help=STAGE_HELP)
    parser.add_argument("--root", type=str, default="./sessions")
    parser.add_argument("--max-updates", type=int, default=None)
    args = parser.parse_args(argv)

    # Multi-host: no-op on one host, joins the pod slice when launched
    # under a multi-process coordinator.
    from yoho_tpu.parallel.mesh import init_distributed

    init_distributed()
    config = load_session_config(args.name, args.root)
    print("Loaded config:")
    print(config.model_dump_json(indent=4))

    if args.stage == 0:
        from yoho_tpu.train.stages.stage0_tokenizer import main as stage_main

        stage_main(config)
    elif args.stage == 1:
        from yoho_tpu.train.stages.stage1_asr_pretrain import main as stage_main

        stage_main(config, max_updates=args.max_updates)
    elif args.stage == 2:
        from yoho_tpu.train.stages.stage2_reconstruction import main as stage_main

        stage_main(config, max_updates=args.max_updates)
    elif args.stage == 3:
        from yoho_tpu.train.stages.stage3_voiceprint import main as stage_main

        stage_main(config, max_updates=args.max_updates)
    elif args.stage == 4:
        from yoho_tpu.train.stages.stage4_joint_finetune import main as stage_main

        stage_main(config, max_updates=args.max_updates)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
