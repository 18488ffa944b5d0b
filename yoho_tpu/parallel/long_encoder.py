"""Sequence-parallel long-audio encoding for the YOHO (RoPE) encoder.

Single-pass encoding of audio LONGER than the trained window — the
capability SURVEY.md §2.3 lists as the TPU-native answer to long context
(the reference bounds context by construction; Whisper cannot leave its
1500 learned positions, but the YOHO encoder is RoPE-only and
length-agnostic). The quadratic transformer stack is sharded over the
TIME axis of a mesh and attends globally via
:func:`yoho_tpu.parallel.ring_attention.ring_attention`; the linear conv
stem runs unsharded (O(S) memory, no S^2 term).

Exactness: every shard passes its global frame offset as the RoPE
position base, so the sharded computation is the SAME function as a
single-device encode of the full sequence (tested to f32 tolerance on
the faked 8-device mesh).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from yoho_tpu.parallel.ring_attention import ring_attention


def yoho_encode_long(
    model,
    variables,
    mel: jnp.ndarray,  # (B, S_frames, n_mels); S_frames may exceed cfg.max_audio_len
    mesh: Mesh,
    axis_name: str = "seq",
):
    """Encode a long mel sequence with the time axis sharded over ``mesh``.

    ``model`` is a :class:`yoho_tpu.nn.yoho.YOHOModel` (its checkpoint
    ``variables`` are reused as-is — the ring construction has the same
    parameter tree). S_frames // 2 (the post-pool length) must divide
    evenly by the mesh axis size. Returns (B, S_frames // 2, dims).
    """
    from yoho_tpu.nn.yoho import YOHOAudioEncoder

    _reject_moe(model.cfg)
    n = mesh.shape[axis_name]
    enc_params = {"params": variables["params"]["encoder"]}

    plain = YOHOAudioEncoder(model.cfg, dtype=model.dtype)
    x = plain.apply(enc_params, mel, method=YOHOAudioEncoder.stem)
    s2 = x.shape[1]
    if s2 % n:
        raise ValueError(
            f"post-stem length {s2} must divide by the {axis_name} axis ({n}); "
            f"pad the audio to a multiple of {2 * n} frames")

    run = _block_runner(model.cfg, model.dtype, mesh, axis_name, s2 // n)
    return run(enc_params, x)


def _reject_moe(cfg) -> None:
    # MoE routes per sample over the FULL time axis; a time-sharded run
    # would route per shard (different capacity pool -> different drops,
    # breaking this module's exactness contract) and would silently drop
    # the sown aux losses. Refuse rather than diverge quietly.
    if getattr(cfg, "n_experts", 0) > 0:
        raise ValueError(
            "sequence-parallel (ring) encoding does not support MoE "
            f"configs (n_experts={cfg.n_experts}): routing is per time "
            "shard, which changes capacity drops and loses aux losses")


_RUNNERS: dict = {}


def _block_runner(cfg, dtype, mesh: Mesh, axis_name: str, s_local: int):
    """Memoized jitted shard_map runner — repeated calls with the same
    (config, dtype, mesh, shard length) reuse one compiled executable
    instead of paying a fresh multi-minute TPU compile per call."""
    key = (repr(cfg), jnp.dtype(dtype).name, mesh, axis_name, s_local)
    if key in _RUNNERS:
        return _RUNNERS[key]

    from yoho_tpu.nn.yoho import YOHOAudioEncoder

    ring = YOHOAudioEncoder(
        cfg, dtype=dtype,
        attention_fn=partial(ring_attention, axis_name=axis_name, scale=1.0),
    )

    @jax.jit
    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(None, axis_name, None)),
             out_specs=P(None, axis_name, None))
    def run(params, x):
        pos = jax.lax.axis_index(axis_name) * s_local
        return ring.apply(params, x, pos, method=YOHOAudioEncoder.run_blocks)

    _RUNNERS[key] = run
    return run


def make_long_context_loss_fn(model, mesh: Mesh, axis_name: str = "seq"):
    """``loss_fn(params, mel, tokens, loss_mask) -> scalar`` with the
    encoder's quadratic attention sequence-parallel over ``axis_name``.

    When the mesh also has a ``data`` axis (the session-trainer layout,
    see ``ASRTrainer``), batches additionally shard over it — DP x SP in
    one shard_map. The linear pieces (stem, decoder, loss) stay outside
    the shard_map; GSPMD lays them out from the operand shardings. The
    gradient of the replicated params transposes through shard_map as a
    psum over both axes, so gradients are EXACT vs the single-device step
    (tested on the faked mesh)."""
    from yoho_tpu.nn.yoho import YOHOAudioEncoder, YOHOModel

    _reject_moe(model.cfg)
    n = mesh.shape[axis_name]
    batch_axis = "data" if "data" in mesh.axis_names else None

    # model.remat carries through to the ring construction: long-context
    # clips are exactly where O(depth) activation memory hurts most, and
    # the decoder already honors it via model's own setup. jax.checkpoint
    # recomputes the in-block ppermute collectives in the backward pass —
    # still exact (ppermute differentiates to the reverse permutation).
    ring = YOHOAudioEncoder(
        model.cfg, dtype=model.dtype,
        attention_fn=partial(ring_attention, axis_name=axis_name,
                             scale=1.0),
        remat=model.remat,
    )

    def loss_fn(params, mel, tokens, loss_mask):
        from yoho_tpu.train.trainer import masked_ce_loss

        enc_params = {"params": params["encoder"]}
        plain = YOHOAudioEncoder(model.cfg, dtype=model.dtype)
        x = plain.apply(enc_params, mel, method=YOHOAudioEncoder.stem)
        s_local = x.shape[1] // n

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(batch_axis, axis_name, None)),
                 out_specs=P(batch_axis, axis_name, None))
        def blocks(p, xs):
            pos = jax.lax.axis_index(axis_name) * s_local
            return ring.apply(p, xs, pos, method=YOHOAudioEncoder.run_blocks)

        xa = blocks(enc_params, x)
        logits = model.apply({"params": params}, tokens, xa,
                             method=YOHOModel.decode_text)
        return masked_ce_loss(logits, tokens, loss_mask)

    return loss_fn


def make_long_context_train_step(model, mesh: Mesh,
                                 axis_name: str = "seq"):
    """Training step for clips LONGER than one device can attend alone.

    Returns ``step(state, mel, tokens, loss_mask) -> (state, loss)`` where
    ``mel`` is (B, S_frames, n_mels) with the post-stem length divisible
    by the mesh's ``axis_name`` size. The encoder's quadratic attention
    runs sequence-parallel (ring); ppermute differentiates to the reverse
    permutation, so gradients are EXACT vs the single-device step (tested
    on the faked mesh). The decoder cross-attends the gathered encoder
    output, which is O(S·D), not O(S^2).

    The reference caps training clips at ``max_input_seconds`` by
    construction (``dataloaders.py:100-106``); this removes the cap for
    the RoPE model family the TPU-native way. Session wiring: set
    ``[hyperparameters.transcribe_pretrain] long_context_factor = N`` —
    see :class:`yoho_tpu.train.trainer.ASRTrainer`.
    """
    loss_fn = make_long_context_loss_fn(model, mesh, axis_name)

    @jax.jit
    def step(state, mel, tokens, loss_mask):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, mel, tokens,
                                                  loss_mask)
        return state.apply_gradients(grads=grads), loss

    return step
