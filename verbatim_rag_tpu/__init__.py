"""verbatim-rag-tpu: TPU-native extractive RAG framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
KRLabsOrg/verbatim-rag: hybrid dense+sparse retrieval over a device-resident
index, verbatim span extraction (prompted or neural token classification),
and templated, cited answers — engineered TPU-first (SPMD meshes, fused
kernels, static shapes) rather than as a port.

Layering (mirrors the reference's core/engine split, SURVEY.md §1):
- ``verbatim_rag_tpu.core``      device-free extraction/templating/citations
- ``verbatim_rag_tpu.models``    JAX encoders (dense, SPLADE, extractor, reranker)
- ``verbatim_rag_tpu.ops``       Pallas kernels + jitted retrieval ops
- ``verbatim_rag_tpu.engine``    device-resident index + search
- ``verbatim_rag_tpu.parallel``  meshes, sharded search, collectives
- ``verbatim_rag_tpu.ingestion`` chunking + document processing
- ``verbatim_rag_tpu.rag``       orchestration (VerbatimRAG, streaming, intent)
- ``verbatim_rag_tpu.training``  extractor-model training (optax/pjit)
- ``verbatim_rag_tpu.api``       HTTP service
"""

__version__ = "0.5.2"
