"""CLI: create a training session (parity: ``train/create_training_session.py``).

Usage: ``python -m yoho_tpu.cli.create_session [name] [--root ./sessions]``
"""

import argparse

from yoho_tpu.train.session import create_session


def main(argv=None):
    from yoho_tpu.utils.platform import apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description="Create a new YOHO training session")
    parser.add_argument("name", type=str, nargs="?", default="main",
                        help="Name of the session")
    parser.add_argument("--root", type=str, default="./sessions")
    args = parser.parse_args(argv)
    try:
        path = create_session(args.name, args.root)
    except FileExistsError:
        print("Session with this name already exists!")
        return 1
    print(f"Created session at {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
