"""Word-level timestamps via cross-attention DTW alignment.

Neither the reference nor its roadmap has this; it is table stakes for
modern Whisper serving (cf. WhisperKit/whisper-timestamped). Method: after
decoding, one teacher-forced pass collects cross-attention weights from the
alignment layers; dynamic time warping over the (text-token x audio-frame)
attention matrix yields a monotonic token->frame alignment; word boundaries
come from the tokenizer's word pieces.

Without a per-checkpoint alignment-head mask (OpenAI ships them per model),
the standard heuristic applies: average the heads of the upper half of the
decoder layers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class WordTiming:
    word: str
    start: float
    end: float
    # Mean realized-token probability of the word's tokens from the same
    # teacher-forced pass that produced the alignment (faster-whisper's
    # word.probability). 1.0 when the caller supplied no probabilities.
    probability: float = 1.0


def dtw_path(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through an (N, M) cost matrix.

    Returns (text_indices, time_indices) of the optimal path with steps
    (i+1, j), (i, j+1), (i+1, j+1) — the standard whisper alignment DTW.
    Dispatches to the C++ kernel (yoho_tpu/native/dtw.cpp — the Python DP
    is ~670k iterations per 448x1500 window, the host bottleneck of
    batched word-timestamp serving); bit-identical fallback below.
    """
    from yoho_tpu.native import dtw_path_native

    native = dtw_path_native(np.asarray(cost, np.float32))
    if native is not None:
        return native
    n, m = cost.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    trace = np.zeros((n + 1, m + 1), dtype=np.int8)
    for i in range(1, n + 1):
        row_c = cost[i - 1]
        for j in range(1, m + 1):
            c0 = acc[i - 1, j - 1]
            c1 = acc[i - 1, j]
            c2 = acc[i, j - 1]
            if c0 <= c1 and c0 <= c2:
                acc[i, j] = c0 + row_c[j - 1]
                trace[i, j] = 0
            elif c1 <= c2:
                acc[i, j] = c1 + row_c[j - 1]
                trace[i, j] = 1
            else:
                acc[i, j] = c2 + row_c[j - 1]
                trace[i, j] = 2

    i, j = n, m
    text_idx, time_idx = [], []
    while i > 0 or j > 0:
        text_idx.append(i - 1)
        time_idx.append(j - 1)
        if i > 0 and j > 0:
            t = trace[i, j]
        elif i > 0:
            t = 1
        else:
            t = 2
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(text_idx[::-1]), np.asarray(time_idx[::-1])


def token_frame_alignment(attn: np.ndarray) -> np.ndarray:
    """(S_text, T_audio) averaged attention -> first aligned frame per token.

    The attention matrix is z-normalized per text position before DTW
    (whisper convention) so loud frames don't dominate.
    """
    a = attn.astype(np.float64)
    std = a.std(axis=-1, keepdims=True)
    a = (a - a.mean(axis=-1, keepdims=True)) / np.where(std > 0, std, 1.0)
    text_idx, time_idx = dtw_path(-a)
    frames = np.zeros(attn.shape[0], dtype=np.int64)
    seen = set()
    for ti, fj in zip(text_idx, time_idx):
        if ti not in seen:
            frames[ti] = fj
            seen.add(ti)
    return frames


def split_words(token_ids: Sequence[int], decode_pieces,
                decode_group=None) -> List[Tuple[str, List[int]]]:
    """Group BPE token ids into words using the space-marker convention.

    ``decode_pieces(ids)`` must return the piece string of each id (with
    leading spaces intact) — used only for BOUNDARY detection. Word TEXT
    comes from ``decode_group(ids)`` when given: per-token pieces are
    byte-level fragments, so concatenating them mojibakes any non-ASCII
    word ('café' -> 'cafÃ©'); decoding the group's ids together
    reassembles multi-byte characters. Returns [(word, [token indices])].
    """
    groups: List[List[int]] = []
    cur_idx: List[int] = []
    for pos, tid in enumerate(token_ids):
        piece = decode_pieces([tid])
        if piece.startswith(" ") and cur_idx:
            groups.append(cur_idx)
            cur_idx = []
        cur_idx.append(pos)
    if cur_idx:
        groups.append(cur_idx)

    render = decode_group or decode_pieces
    words: List[Tuple[str, List[int]]] = []
    for idxs in groups:
        text = render([token_ids[i] for i in idxs]).strip()
        if text:
            words.append((text, idxs))
    return words


def words_from_alignment(
    token_ids: Sequence[int],
    frames: np.ndarray,
    seconds_per_frame: float,
    decode_pieces,
    max_duration: Optional[float] = None,
    decode_group=None,
    probs: Optional[np.ndarray] = None,
) -> List[WordTiming]:
    """Combine the token->frame alignment with word grouping.

    ``probs`` (len(token_ids),): per-token realized probabilities; a
    word's ``probability`` is the mean over its tokens (faster-whisper's
    convention)."""
    words = split_words(token_ids, decode_pieces, decode_group)
    out: List[WordTiming] = []
    n = len(token_ids)
    for word, idxs in words:
        start_f = frames[idxs[0]]
        end_f = frames[idxs[-1] + 1] if idxs[-1] + 1 < n else frames[idxs[-1]] + 1
        start = float(start_f) * seconds_per_frame
        if max_duration is not None:
            # Clamp BOTH ends: DTW can drift trailing tokens into the
            # zero-padded tail, and clamping only the end produced
            # WordTiming(start > end).
            start = min(start, max(max_duration - seconds_per_frame, 0.0))
        end = max(float(end_f) * seconds_per_frame, start + seconds_per_frame)
        if max_duration is not None:
            end = min(end, max_duration)
            end = max(end, start)
        p = (1.0 if probs is None
             else float(np.mean([probs[i] for i in idxs])))
        out.append(WordTiming(word=word, start=round(start, 3),
                              end=round(end, 3), probability=round(p, 4)))
    return out
