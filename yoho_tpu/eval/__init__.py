from yoho_tpu.eval.wer import (  # noqa: F401
    cer,
    cp_wer,
    edit_distance,
    normalize_for_wer,
    parse_stm,
    texts_by_speaker,
    wer,
)
from yoho_tpu.eval.english_normalizer import normalize_english  # noqa: F401
from yoho_tpu.eval.diarization import (  # noqa: F401
    SpeakerTurn,
    cosine_scores,
    diarization_error_rate,
    equal_error_rate,
    verification_pairs,
)
