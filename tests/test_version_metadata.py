"""Version lockstep without importing heavy modules (parity with the
reference's tests/test_version_metadata.py approach)."""

import re
from pathlib import Path

ROOT = Path(__file__).parent.parent


def test_pyproject_and_package_versions_match():
    pyproject = (ROOT / "pyproject.toml").read_text()
    [project_version] = re.findall(r'^version = "([^"]+)"', pyproject, re.MULTILINE)

    pkg_init = (ROOT / "verbatim_rag_tpu" / "__init__.py").read_text()
    [pkg_version] = re.findall(r'^__version__ = "([^"]+)"', pkg_init, re.MULTILINE)

    core_init = (ROOT / "verbatim_rag_tpu" / "core" / "__init__.py").read_text()
    [core_version] = re.findall(r'^__version__ = "([^"]+)"', core_init, re.MULTILINE)

    assert project_version == pkg_version == core_version


def test_rag_compat_shims_mirror_reference_import_surface():
    """Reference users import extractor/template/model names from the
    orchestration package (`verbatim_rag.extractors` etc. are compat shims
    over verbatim_core); the same import paths must work here."""
    from verbatim_rag_tpu.rag import (
        extractors,
        llm_client,
        models,
        response_builder,
        templates,
        transform,
        universal_document,
    )

    assert extractors.LLMSpanExtractor and extractors.ModelSpanExtractor
    assert llm_client.LLMClient
    assert models.QueryResponse and models.Highlight
    assert response_builder.ResponseBuilder
    assert templates.TemplateManager and templates.StaticTemplate
    assert transform.VerbatimTransform and transform.verbatim_query
    assert universal_document.UniversalDocument
