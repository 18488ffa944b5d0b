"""Fused Pallas log-mel frontend: framing -> window -> DFT -> power -> mel
-> log10 in one kernel, no HBM frame intermediate.

The XLA path (``yoho_tpu.audio.frontend``) materializes the overlapped
frame matrix (B, T, n_fft) in HBM (~4.8 MB per 30 s stream) before its two
matmuls. This kernel keeps frames entirely in VMEM: each grid program DMAs
a contiguous strip of audio (reshaped host-side to (rows, hop) so the
overlapping-window gather becomes static row slices), builds its frame tile
with register concatenation, and runs windowed-DFT + mel projection on the
MXU, writing only the (tile, n_mels) log-mel block.

Numerics match ``stft_power``+mel+log10 exactly (same DFT bases, same
window, same scaling) — asserted by tests against the XLA oracle. The
normalization stage (whisper clamp / per-sample standardization) needs
global statistics and stays outside.

Runs in interpreter mode off-TPU so CPU tests exercise the same code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yoho_tpu.audio.filters import mel_filter_bank
from yoho_tpu.audio.frontend import _dft_bases, _hann_periodic, n_frames_scipy

_LOG10_INV = 1.0 / np.log(10.0)


def _mel_kernel(audio_ref, cos_ref, sin_ref, mel_ref, out_ref, scratch, sem,
                *, tile_f: int, row_w: int, n_chunks: int,
                span_rows: int, log_floor: float):
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(i * tile_f, span_rows), :],
        scratch,
        sem,
    )
    copy.start()
    copy.wait()

    x = scratch[...]  # (span_rows, row_w) — one hop per row, lane-padded
    # frame i = concat_kk(x[i+kk]) along features; the DFT matmul is linear
    # over that concat, so compute partial products per row-chunk and sum
    # (Mosaic supports neither unaligned concat nor unaligned lane slices —
    # the lane padding is folded into zero rows of the DFT matrices).
    # HIGHEST precision: the TPU MXU's default f32 matmul is single-pass
    # bf16, which costs ~2 decimal digits through the power+log chain.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.zeros((tile_f, cos_ref.shape[1]), jnp.float32)
    im = jnp.zeros((tile_f, sin_ref.shape[1]), jnp.float32)
    for kk in range(n_chunks):
        piece = x[kk : kk + tile_f, :]
        re += jnp.dot(piece, cos_ref[kk * row_w : (kk + 1) * row_w, :],
                      preferred_element_type=jnp.float32, precision=hi)
        im += jnp.dot(piece, sin_ref[kk * row_w : (kk + 1) * row_w, :],
                      preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32,
                  precision=hi)
    out_ref[0] = jnp.log(jnp.maximum(mel, log_floor)) * _LOG10_INV


@functools.lru_cache(maxsize=None)
def _constants(sample_rate: int, n_fft: int, hop: int, n_mels: int,
               mel_scale: str, scaled: bool):
    """Chunked windowed-DFT bases: rows regrouped per lane-padded audio
    row (row_w = hop padded to a 128 multiple; padding rows are zero), plus
    the (freq-padded) mel projection."""
    win = _hann_periodic(n_fft).astype(np.float64)
    if scaled:  # scipy scaling="spectrum": amplitude scale 1/sum(win)
        win = win / win.sum()
    cos_b, sin_b = _dft_bases(n_fft)
    cos_w = (win[:, None] * cos_b.astype(np.float64)).astype(np.float32)
    sin_w = (win[:, None] * sin_b.astype(np.float64)).astype(np.float32)
    n_freq = n_fft // 2 + 1
    freq_pad = -n_freq % 128
    cos_w = np.pad(cos_w, ((0, 0), (0, freq_pad)))
    sin_w = np.pad(sin_w, ((0, 0), (0, freq_pad)))

    row_w = hop + (-hop % 128)
    n_chunks = -(-n_fft // hop)
    f_pad = cos_w.shape[1]
    cos_c = np.zeros((n_chunks * row_w, f_pad), np.float32)
    sin_c = np.zeros((n_chunks * row_w, f_pad), np.float32)
    for kk in range(n_chunks):
        lo, hi = kk * hop, min((kk + 1) * hop, n_fft)
        cos_c[kk * row_w : kk * row_w + (hi - lo)] = cos_w[lo:hi]
        sin_c[kk * row_w : kk * row_w + (hi - lo)] = sin_w[lo:hi]

    filt = mel_filter_bank(sample_rate, n_fft, n_mels, mel_scale=mel_scale).T
    filt = np.pad(filt, ((0, freq_pad), (0, -n_mels % 128))).astype(np.float32)
    return cos_c, sin_c, filt, row_w, n_chunks


def fused_log_mel(
    audio: jnp.ndarray,  # (B, n_samples) f32
    *,
    sample_rate: int = 16000,
    n_fft: int = 400,
    hop: int = 160,
    n_mels: int = 80,
    mel_scale: str = "slaney",
    convention: str = "whisper",
    log_floor: float = 1e-10,
    tile_f: int = 600,
) -> jnp.ndarray:
    """Un-normalized log10-mel, (B, frames, n_mels) — fused Pallas path.

    ``convention="whisper"``: reflect-pad + center frames (B, n//hop, M).
    ``convention="scipy"``: boundary=None framing with 1/sum(win) scaling.
    """
    audio = jnp.asarray(audio, jnp.float32)
    # Accept any (..., samples) shape like the XLA frontends (a 1-D
    # waveform or nested batch would otherwise die on the 2-D unpack).
    lead = audio.shape[:-1]
    audio = audio.reshape(-1, audio.shape[-1])
    b, n_samples = audio.shape

    if convention == "whisper":
        half = n_fft // 2
        if n_samples <= max(half, hop):
            # reflect needs width < axis size; frame count needs >= hop.
            grow = max(half + 1, hop) - n_samples
            audio = jnp.pad(audio, ((0, 0), (0, grow)))
            n_samples += grow
        audio = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
        num_frames = n_samples // hop
        scaled = False
    elif convention == "scipy":
        num_frames = n_frames_scipy(n_samples, n_fft, hop)
        scaled = True
    else:
        raise ValueError(f"unknown convention {convention!r}")

    # Mosaic requires the output block's sublane dim (frames) divisible by 8.
    tile_f = max(8, (tile_f + 7) // 8 * 8)

    cos_c, sin_c, filt, row_w, n_chunks = _constants(
        sample_rate, n_fft, hop, n_mels, mel_scale, scaled
    )
    span_rows_needed = tile_f + n_chunks
    # Mosaic DMA slices must be 8-aligned in the sublane dim.
    span_rows_needed = (span_rows_needed + 7) // 8 * 8

    # Frame grid: pad frames to a tile multiple; rows = frames + overlap tail
    # (enough that the last tile's full span stays in bounds).
    frames_pad = -num_frames % tile_f
    total_frames = num_frames + frames_pad
    rows = total_frames + (span_rows_needed - tile_f)
    need = rows * hop
    audio = jnp.pad(audio, ((0, 0), (0, max(0, need - audio.shape[1]))))
    audio = audio[:, :need].reshape(b, rows, hop)
    # Lane-pad each hop row to row_w (the DFT chunk matrices have zero rows
    # at the padded lanes, so the padding contributes nothing).
    audio = jnp.pad(audio, ((0, 0), (0, 0), (0, row_w - hop)))

    m_pad = filt.shape[1]
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _mel_kernel, tile_f=tile_f, row_w=row_w, n_chunks=n_chunks,
        span_rows=span_rows_needed, log_floor=log_floor,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, total_frames // tile_f),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # audio stays in HBM
            pl.BlockSpec(cos_c.shape, lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_c.shape, lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(filt.shape, lambda bb, ii: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_f, m_pad), lambda bb, ii: (bb, ii, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, total_frames, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((span_rows_needed, row_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio, jnp.asarray(cos_c), jnp.asarray(sin_c), jnp.asarray(filt))

    return out[:, :num_frames, :n_mels].reshape(*lead, num_frames, n_mels)


def _require_batched(audio) -> None:
    """Same (batch, n_samples) guard as the XLA frontends
    (``audio.frontend.log_mel_spectrogram``): the fused entry points are
    documented drop-ins, so they must reject wrong-rank audio identically
    instead of silently reshaping it."""
    if getattr(audio, "ndim", None) != 2:
        raise ValueError(
            "expected audio of shape (batch, n_samples), got "
            f"{getattr(audio, 'shape', type(audio))}"
        )


def fused_whisper_log_mel(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """Whisper-normalized fused frontend: drop-in for
    ``yoho_tpu.audio.frontend.whisper_log_mel``."""
    from yoho_tpu.audio.frontend import normalize_whisper

    _require_batched(audio)
    return normalize_whisper(
        fused_log_mel(audio, n_mels=n_mels, mel_scale="slaney",
                      convention="whisper", log_floor=1e-10)
    )


def fused_yoho_log_mel(audio: jnp.ndarray, config) -> jnp.ndarray:
    """Reference-convention fused frontend: drop-in for ``yoho_log_mel``."""
    from yoho_tpu.audio.frontend import normalize_standardize

    _require_batched(audio)
    return normalize_standardize(
        fused_log_mel(
            audio,
            sample_rate=config.sample_rate,
            n_fft=config.n_fft,
            hop=config.stft_hop,
            n_mels=config.n_mel_bands,
            mel_scale="htk",
            convention="scipy",
            log_floor=1e-13,
            tile_f=min(512, config.max_audio_len),
        )
    )
