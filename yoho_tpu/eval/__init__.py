from yoho_tpu.eval.wer import cer, edit_distance, normalize_for_wer, wer  # noqa: F401
