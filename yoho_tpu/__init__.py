"""yoho_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech framework.

From-scratch rebuild of the capabilities of JirkaKlimes/YOHO (joint ASR +
speaker diarization + speaker recognition with one encoder-decoder
transformer), designed TPU-first: static shapes, fully jitted decode with a
KV cache, mesh/shard_map parallelism, Pallas kernels on the hot paths, and
native C++ for the host-side runtime (tokenizer, audio decode).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy: `import yoho_tpu` stays dependency-light (no jax/model imports
    # until a loader is actually used).
    if name == "load_transcriber":
        from yoho_tpu.load import load_transcriber

        return load_transcriber
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
