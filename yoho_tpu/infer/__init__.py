from yoho_tpu.infer.decode import greedy_decode, make_whisper_step_fn, make_yoho_step_fn  # noqa: F401
from yoho_tpu.infer.beam import beam_search, tile_beams  # noqa: F401
from yoho_tpu.infer.longform import Segment, chunk_audio, stitch_segments  # noqa: F401
from yoho_tpu.infer.pipeline import Transcriber, TranscriptionResult  # noqa: F401
from yoho_tpu.infer.streaming import StreamingTranscriber  # noqa: F401
from yoho_tpu.infer.diarize import (  # noqa: F401
    OnlineSpeakerTracker,
    cluster_voiceprints,
    embed_clip,
    identify_speaker,
    load_enrolled,
    name_speakers,
    save_enrolled,
)
from yoho_tpu.infer.word_timestamps import WordTiming  # noqa: F401
from yoho_tpu.infer.speculative import speculative_greedy_decode, make_verify_step_fn  # noqa: F401
from yoho_tpu.infer.batching import MicroBatcher  # noqa: F401
from yoho_tpu.infer.capacity import suggest_batch_size  # noqa: F401
