from yoho_tpu.text.srt import Subtitle, parse_srt, compose_srt, sort_and_reindex  # noqa: F401
from yoho_tpu.text.standardize import standardize_text  # noqa: F401
from yoho_tpu.text.langdetect import detect_language  # noqa: F401
from yoho_tpu.text.bpe import ByteBPE  # noqa: F401
from yoho_tpu.text.tokenizer import YOHOTokenizer, train_tokenizer, load_tokenizer  # noqa: F401
from yoho_tpu.text.whisper_tokens import WhisperTokenTable  # noqa: F401
