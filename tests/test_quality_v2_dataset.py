"""Regression pins for the discriminative quality benchmark's dataset.

`benchmarks/quality_synthetic_v2.py` is the quality regression gate (VERDICT
r2 weak #2): its score band is set by TASK design — dev rows must be
irreducibly out-of-distribution so a fully-converged model cannot saturate.
These tests pin the two OOD properties (held-out keyword forms, dev-only
corruption alphabet) plus span integrity, so a refactor that silently leaks
dev vocabulary into training — which would push the benchmark back to the
100.0 ceiling — fails here instead of in a multi-hour training run.
"""

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "benchmarks"))

from quality_synthetic_v2 import TOPICS, make_dataset  # noqa: E402


def _split(data):
    train = [e for e in data if e.split == "train"]
    dev = [e for e in data if e.split == "dev"]
    return train, dev


def test_gold_spans_slice_to_finding_clauses():
    data = make_dataset(260, seed=3)
    assert data, "empty dataset"
    n_spans = 0
    for e in data:
        for s, t in e.spans:
            clause = e.context[s:t]
            n_spans += 1
            # Clause shape survives both corruption alphabets: " output " can
            # become " 0utput " / " 0v7pv7 " etc., but the numeric tail and
            # clause-internal structure keep a " by " or digit signature.
            assert 20 < len(clause) < 120, clause
            assert not clause.startswith(" ") and not clause.endswith(" ")
    assert n_spans >= 260  # ≥1 gold per context by construction


def test_dev_keywords_never_appear_in_train_rows():
    """Property 5: train draws keywords 0-2, dev only the held-out 3-4."""
    data = make_dataset(520, seed=3)
    train, dev = _split(data)
    held_out = [w for words in TOPICS.values() for w in words[3:]]
    train_text = " ".join(e.context + " " + e.question for e in train)
    for word in held_out:
        assert word not in train_text, f"held-out keyword {word!r} leaked into train"
    # ... and the dev rows actually use them (the split is not vacuous).
    dev_text = " ".join(e.context for e in dev)
    assert any(w in dev_text for w in held_out)


def test_dev_noise_alphabet_is_train_disjoint():
    """Property 6: digits 4/5/7 inside words occur only via the dev table."""
    data = make_dataset(780, seed=5)
    train, dev = _split(data)
    in_word_dev_digit = re.compile(r"[a-z][457]|[457][a-z]")
    for e in train:
        m = in_word_dev_digit.search(e.context)
        assert m is None, f"dev-only corruption in train row: ...{m.group()}..."
    assert any(in_word_dev_digit.search(e.context) for e in dev), (
        "no dev row carries the dev-only corruption alphabet"
    )


def test_dataset_is_deterministic():
    a = make_dataset(130, seed=9)
    b = make_dataset(130, seed=9)
    assert [e.context for e in a] == [e.context for e in b]
    assert [e.spans for e in a] == [e.spans for e in b]
