"""``python -m yoho_tpu`` == the ``yoho`` umbrella CLI."""

from yoho_tpu.cli.__main__ import main

if __name__ == "__main__":
    raise SystemExit(main())
