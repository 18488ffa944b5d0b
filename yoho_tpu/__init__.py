"""yoho_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech framework.

From-scratch rebuild of the capabilities of JirkaKlimes/YOHO (joint ASR +
speaker diarization + speaker recognition with one encoder-decoder
transformer), designed TPU-first: static shapes, fully jitted decode with a
KV cache, mesh/shard_map parallelism, Pallas kernels on the hot paths, and
native C++ for the host-side runtime (tokenizer, audio decode).
"""

__version__ = "0.1.0"
