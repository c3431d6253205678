"""Capacity modes: the quantization tier ladder, with live HBM accounting.

Per-row quantization knobs shrink the device arrays (`docs/scaling.md`):
`dense_dtype`/`sketch_dtype` "int8" halve the two matrices, "int4" packs
two codes per byte for another 2x; `sparse_weight_dtype="float16"` +
`sparse_ids_dtype="int16"` halve the forward index (4 B/slot). Reported
sparse scores stay EXACT in every mode — sketches only select rescore
candidates, and ids are exact integers. This demo indexes the same
corpus at three tiers, prints the per-array device bytes, and shows the
hybrid results agree.
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()

from pathlib import Path

import numpy as np

from verbatim_rag_tpu.engine import VerbatimIndex
from verbatim_rag_tpu.ingestion.schema import DocumentSchema
from verbatim_rag_tpu.models.config import tiny_test_config
from verbatim_rag_tpu.models.providers import JaxDenseProvider, JaxSpladeProvider


def store_bytes(store) -> dict[str, int]:
    out = {}
    for name in ("_dense", "_dense_scale", "_sp_ids", "_sp_w", "_sp_proj", "_sp_proj_scale"):
        arr = getattr(store, name)
        if arr is not None:
            out[name.lstrip("_")] = arr.size * arr.dtype.itemsize
    return out


def build(dense_dtype: str, sketch_dtype: str | None, **store_kwargs):
    config = tiny_test_config()
    index = VerbatimIndex(
        dense_provider=JaxDenseProvider(config=config, max_length=128),
        sparse_provider=JaxSpladeProvider(config=config, max_length=128, max_nnz=16),
        dense_dtype=dense_dtype,
        sketch_dtype=sketch_dtype,
        **store_kwargs,
    )
    docs_dir = Path(__file__).parent / "example_docs"
    index.add_documents(
        [DocumentSchema.from_file(str(p)) for p in sorted(docs_dir.glob("*.md"))]
    )
    return index


def main() -> None:
    tiers = {
        "bf16": build("bfloat16", None),
        "int8": build("int8", "int8"),
        "int4+slim": build(
            "int4", "int4",
            sparse_weight_dtype="float16", sparse_ids_dtype="int16",
        ),
    }

    print("device bytes per array (same corpus):")
    per_tier = {label: store_bytes(ix.store) for label, ix in tiers.items()}
    names = sorted(set().union(*per_tier.values()))
    header = "".join(f"{label:>12}" for label in per_tier)
    print(f"  {'array':>16}{header}")
    for name in names:
        row = "".join(f"{per_tier[label].get(name, 0):>12}" for label in per_tier)
        print(f"  {name:>16}{row}")
    totals = "".join(f"{sum(b.values()):>12}" for b in per_tier.values())
    print(f"  {'TOTAL':>16}{totals}")

    question = "How efficient are solar panels?"
    hits = {label: ix.query(question, k=3) for label, ix in tiers.items()}
    print(f"\nhybrid top-3 for {question!r} (ids are per-index uuids; compare text):")
    base = hits["bf16"]
    for label, h in hits.items():
        agree = np.mean([a.text == b.text for a, b in zip(base, h)])
        print(f"  {label:>10}: agreement vs bf16 {agree:.0%}  top hit {h[0].text[:48]!r}")
    print("(at serving scale: int8 top-10 overlap ~0.99 at 1M — RESULTS.md;")
    print(" int4 quality gates: benchmarks/recall_1m.py --dense-dtype int4)")


if __name__ == "__main__":
    main()
