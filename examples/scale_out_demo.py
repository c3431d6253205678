"""Scale-out demo: the same index, single-device and mesh-sharded.

Runs anywhere via a virtual 8-device CPU mesh (the same trick the test
suite uses); on a real TPU slice the identical code shards over the chips
and the merge traffic rides ICI. See docs/scaling.md.

Run: python examples/scale_out_demo.py
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden(virtual_devices=8)

import numpy as np  # noqa: E402

from verbatim_rag_tpu.engine.embedding_providers import (  # noqa: E402
    HashedBowDenseProvider,
    HashedSparseProvider,
)
from verbatim_rag_tpu.engine.index import VerbatimIndex  # noqa: E402
from verbatim_rag_tpu.parallel.mesh import make_mesh  # noqa: E402

TOPICS = {
    "solar": "Photovoltaic cells convert sunlight directly into electricity.",
    "wind": "Turbine blades capture kinetic energy from moving air masses.",
    "hydro": "Falling water spins generators behind large storage dams.",
    "geothermal": "Heat from the planet's interior drives steam turbines.",
}


def build(mesh):
    index = VerbatimIndex(
        dense_provider=HashedBowDenseProvider(dim=128),
        sparse_provider=HashedSparseProvider(vocab_size=1024),
        mesh=mesh,
    )
    index.store.block = 64  # small corpus; keep shards tiny
    # Distinct term multiplicities per doc — exactly tied scores would make
    # top-k order ambiguous on any backend (single-device included).
    docs = [
        {
            "content": f"{sentence} " + f"{topic} " * (i + 1)
            + f"Report section{i} depth{i * 3} coverage.",
            "title": f"{topic}-{i}",
        }
        for topic, sentence in TOPICS.items()
        for i in range(10)
    ]
    index.add_documents(docs)
    return index


def main() -> None:
    mesh = make_mesh(dp=4, tp=2)
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))} "
          f"over {mesh.size} devices")

    single = build(mesh=None)
    sharded = build(mesh=mesh)

    for question in ("how do photovoltaic cells work?", "kinetic energy from air"):
        hits_single = single.query(question, k=3)
        hits_sharded = sharded.query(question, k=3)
        print(f"\nQ: {question}")
        for a, b in zip(hits_single, hits_sharded):
            match = "==" if abs(a.score - b.score) < 1e-4 else "~~"
            print(f"  single {a.score:7.4f} {a.metadata['title']:<14} "
                  f"{match} sharded {b.score:7.4f} {b.metadata['title']}")
        # Top hit matches exactly; tail ranks may permute where raw scores
        # tie (near-duplicate template sentences) — the same ambiguity any
        # backend has. Bit-exact parity on tie-free data is test-pinned
        # (tests/test_parallel.py::TestMeshStore).
        assert hits_single[0].text == hits_sharded[0].text
        overlap = {h.text for h in hits_single} & {h.text for h in hits_sharded}
        assert len(overlap) >= 2
    print("\nsharded top hits match single-device — scale-out is free.")
    # Per-query quality/speed knobs ride search_params end to end:
    tuned = sharded.query(
        "photovoltaic", k=3, search_params={"rescore_depth": 64, "approx_topk": False}
    )
    print(f"search_params override returned {len(tuned)} hits")


if __name__ == "__main__":
    main()
