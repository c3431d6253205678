"""Randomized differential oracle for the span-decode post-processing.

`select_spans_from_token_probs` (models/highlighter.py) implements the
reference extractor's decode (ref `extractors.py:85-104`): threshold →
contiguous regions → gap-merge → min-length filter. The production code is
a single ordered scan with a second merge pass; the oracle here shares no
code with it — select every above-threshold token interval, union-merge
intervals whose gap ≤ merge_gap, drop short ones. For monotonic
non-overlapping token offsets (what real tokenizers produce) the two are
the same function; the fuzz pins that across random probs, offsets, and
decode parameters.
"""

from __future__ import annotations

import numpy as np

from verbatim_rag_tpu.models.highlighter import select_spans_from_token_probs


def _oracle(probs, offsets, threshold, min_span, merge_gap):
    picked = [
        (s, e)
        for p, (s, e) in zip(probs, offsets)
        if e > s and p >= threshold
    ]
    merged: list[list[int]] = []
    for s, e in sorted(picked):
        if merged and s - merged[-1][1] <= merge_gap:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged if e - s >= min_span]


def _random_offsets(rng, t):
    """Monotonic, non-overlapping char offsets with occasional specials
    (empty [0,0) offsets, like CLS/SEP) and variable token widths/gaps."""
    offsets = []
    pos = 0
    for _ in range(t):
        if rng.random() < 0.08:
            offsets.append((0, 0))  # special token
            continue
        pos += int(rng.integers(0, 3))  # inter-token gap (spaces)
        width = int(rng.integers(1, 12))
        offsets.append((pos, pos + width))
        pos += width
    return offsets


def test_decode_matches_interval_union_oracle():
    rng = np.random.default_rng(41)
    for trial in range(200):
        t = int(rng.integers(1, 120))
        probs = rng.random(t).astype(np.float32)
        offsets = _random_offsets(rng, t)
        threshold = float(rng.uniform(0.05, 0.9))
        min_span = int(rng.integers(0, 25))
        merge_gap = int(rng.integers(0, 15))
        got = select_spans_from_token_probs(
            probs, offsets, threshold=threshold,
            min_span_chars=min_span, merge_gap_chars=merge_gap,
        )
        want = _oracle(probs, offsets, threshold, min_span, merge_gap)
        assert got == want, (
            f"trial {trial}: t={t} th={threshold:.3f} "
            f"min={min_span} gap={merge_gap}: {got} != {want}"
        )


def test_decode_headline_config_fuzz():
    """Same oracle at the published headline decode config (threshold 0.2,
    min_span 30, merge_gap 20 — ref extractors.py:85-104)."""
    rng = np.random.default_rng(43)
    for _ in range(100):
        t = int(rng.integers(5, 300))
        # Blocky probabilities: runs of high/low, the realistic regime.
        probs = np.empty(t, np.float32)
        i = 0
        while i < t:
            run = min(int(rng.integers(1, 20)), t - i)
            probs[i : i + run] = rng.choice([0.02, 0.15, 0.25, 0.9])
            i += run
        offsets = _random_offsets(rng, t)
        got = select_spans_from_token_probs(probs, offsets)
        want = _oracle(probs, offsets, 0.2, 30, 20)
        assert got == want
