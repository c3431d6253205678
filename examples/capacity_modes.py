"""Capacity modes: int8 dense + int8 sketches, with live HBM accounting.

The two per-row quantization knobs halve the two largest device arrays
(`docs/scaling.md`): `dense_dtype="int8"` the dense matrix,
`sketch_dtype="int8"` the sketch matrices (the largest array at serving
scale). Reported sparse scores stay EXACT in every mode — sketches only
select rescore candidates. This demo indexes the same corpus in both
configurations, prints the per-array device bytes, and shows the hybrid
results agree.
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


def build(dense_dtype: str, sketch_dtype: str | None):
    config = tiny_test_config()
    index = VerbatimIndex(
        dense_provider=JaxDenseProvider(config=config, max_length=128),
        sparse_provider=JaxSpladeProvider(config=config, max_length=128, max_nnz=16),
        dense_dtype=dense_dtype,
        sketch_dtype=sketch_dtype,
    )
    docs_dir = Path(__file__).parent / "example_docs"
    index.add_documents(
        [DocumentSchema.from_file(str(p)) for p in sorted(docs_dir.glob("*.md"))]
    )
    return index


def main() -> None:
    full = build("bfloat16", None)
    compact = build("int8", "int8")

    print("device bytes per array (same corpus):")
    fb, cb = store_bytes(full.store), store_bytes(compact.store)
    for name in sorted(set(fb) | set(cb)):
        print(f"  {name:>16}: bf16/float {fb.get(name, 0):>8}  int8 {cb.get(name, 0):>8}")
    print(f"  {'TOTAL':>16}: bf16/float {sum(fb.values()):>8}  int8 {sum(cb.values()):>8}")

    question = "How efficient are solar panels?"
    hits_full = full.query(question, k=3)
    hits_compact = compact.query(question, k=3)
    print(f"\nhybrid top-3 for {question!r} (ids are per-index uuids; compare text):")
    for hf, hc in zip(hits_full, hits_compact):
        mark = "==" if hf.text == hc.text else "!="
        print(f"  {mark}  {hf.text[:56]!r}")
    agree = np.mean([hf.text == hc.text for hf, hc in zip(hits_full, hits_compact)])
    print(f"agreement: {agree:.0%} (at serving scale: top-10 overlap 1.0 at 1M — RESULTS.md)")


if __name__ == "__main__":
    main()
