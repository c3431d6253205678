"""Milvus-syntax filter-expression strings (reference parity).

The reference passes filter *strings* through the whole stack
(`milvus_base.py:315-353`; backend-specific syntax at `index.py:734-739`:
`document_id == "x"` on Cloud, `metadata["document_id"] == "x"` on Local).
A client ported from the reference must get identical rows from the string
and dict forms; unparseable strings must fail loudly.
"""

import numpy as np
import pytest

pytest.importorskip("jax")

from verbatim_rag_tpu.engine.filters import (
    FilterExpressionError,
    compile_filter,
    parse_filter_expr,
)
from tests.test_engine_store import _unit, fill, make_store


ROWS = [
    {"document_id": "d0", "topic": "solar", "year": 2020, "flag": True},
    {"document_id": "d1", "topic": "wind", "year": 2021, "flag": False},
    {"document_id": "d1", "topic": "solar", "year": 2022},
    {"document_id": "d2", "topic": "hydro", "year": 2019},
]


def _mask(expr, promoted=None):
    promoted = promoted or {}
    return compile_filter(expr, len(ROWS), promoted, ROWS)


class TestParser:
    def test_equality_string(self):
        assert parse_filter_expr('topic == "solar"') == ("cmp", "topic", "==", "solar")

    def test_metadata_subscript(self):
        assert parse_filter_expr('metadata["document_id"] == "x"') == (
            "cmp", "document_id", "==", "x",
        )

    def test_single_quotes_and_escapes(self):
        assert parse_filter_expr("topic == 'it\\'s'") == ("cmp", "topic", "==", "it's")

    def test_in_list(self):
        assert parse_filter_expr('topic in ["a", "b"]') == (
            "cmp", "topic", "in", ["a", "b"],
        )

    def test_not_in(self):
        assert parse_filter_expr('topic not in ["a"]') == (
            "not", ("cmp", "topic", "in", ["a"]),
        )

    def test_precedence_and_parens(self):
        ast = parse_filter_expr('a == 1 or b == 2 and c == 3')
        assert ast[0] == "or" and ast[2][0] == "and"
        ast2 = parse_filter_expr('(a == 1 or b == 2) and c == 3')
        assert ast2[0] == "and" and ast2[1][0] == "or"

    def test_numbers_bools_null(self):
        assert parse_filter_expr("year >= 2020") == ("cmp", "year", ">=", 2020)
        assert parse_filter_expr("score < 0.5") == ("cmp", "score", "<", 0.5)
        assert parse_filter_expr("flag == true") == ("cmp", "flag", "==", True)
        assert parse_filter_expr("x == null") == ("cmp", "x", "==", None)

    def test_empty_is_no_filter(self):
        assert parse_filter_expr("   ") is None

    @pytest.mark.parametrize(
        "bad",
        [
            'topic == ',
            '== "x"',
            'topic = "x"',
            'topic == "x" garbage',
            'metadata[topic] == "x"',
            'topic in "x"',
            'topic ~ "x"',
        ],
    )
    def test_unparseable_raises_loudly(self, bad):
        with pytest.raises(FilterExpressionError):
            parse_filter_expr(bad)


class TestMaskEvaluation:
    def test_equality(self):
        np.testing.assert_array_equal(
            _mask('topic == "solar"'), [True, False, True, False]
        )

    def test_inequality(self):
        np.testing.assert_array_equal(
            _mask('topic != "solar"'), [False, True, False, True]
        )

    def test_in(self):
        np.testing.assert_array_equal(
            _mask('topic in ["wind", "hydro"]'), [False, True, False, True]
        )

    def test_not_in(self):
        np.testing.assert_array_equal(
            _mask('topic not in ["wind", "hydro"]'), [True, False, True, False]
        )

    def test_numeric_comparison_missing_field_false(self):
        np.testing.assert_array_equal(_mask("year >= 2021"), [False, True, True, False])
        np.testing.assert_array_equal(_mask("missing > 1"), [False] * 4)

    def test_neq_excludes_rows_lacking_the_field(self):
        """Milvus null semantics: a row without the field matches neither a
        comparison nor its negation (row 2 has no `flag`)."""
        np.testing.assert_array_equal(_mask("flag != true"), [False, True, False, False])
        np.testing.assert_array_equal(
            _mask('not (topic == "solar")'), [False, True, False, True]
        )
        np.testing.assert_array_equal(_mask("missing != 7"), [False] * 4)
        np.testing.assert_array_equal(_mask("not (missing == 7)"), [False] * 4)

    def test_eq_null_selects_missing_rows(self):
        np.testing.assert_array_equal(_mask("flag == null"), [False, False, True, True])

    def test_in_tolerates_unhashable_row_values(self):
        """List/dict-valued metadata must evaluate as a non-match, not raise
        (the Mapping branch uses list membership; parity)."""
        rows = [{"tags": ["a", "b"]}, {"tags": "a"}, {"tags": {"k": 1}}]
        mask = compile_filter('tags in ["a", "b"]', len(rows), {}, rows)
        np.testing.assert_array_equal(mask, [False, True, False])

    def test_and_or_not(self):
        np.testing.assert_array_equal(
            _mask('topic == "solar" and year >= 2021'), [False, False, True, False]
        )
        np.testing.assert_array_equal(
            _mask('topic == "wind" or year == 2019'), [False, True, False, True]
        )
        np.testing.assert_array_equal(
            _mask('not (topic == "solar")'), [False, True, False, True]
        )

    def test_bool_literal(self):
        np.testing.assert_array_equal(_mask("flag == true"), [True, False, False, False])


class TestStoreIntegration:
    def test_string_matches_dict_spec_promoted_field(self):
        """Ported-reference client: string filter returns the same rows as
        the dict spec, on a promoted (hash-column) field."""
        store = fill(make_store())
        want = store.query(dense_query=_unit(2), top_k=5, filter={"document_id": "d1"})
        for expr in ('document_id == "d1"', 'metadata["document_id"] == "d1"'):
            got = store.query(dense_query=_unit(2), top_k=5, filter=expr)
            assert [h.id for h in got] == [h.id for h in want]

    def test_string_on_non_promoted_field(self):
        store = fill(make_store())
        hits = store.query(top_k=100, filter="position >= 8")
        assert {h.id for h in hits} == {"c8", "c9"}

    def test_promoted_in_uses_hash_columns(self):
        store = fill(make_store())
        hits = store.query(top_k=100, filter='document_id in ["d0"]')
        assert len(hits) == 5

    def test_bad_string_raises(self):
        store = fill(make_store())
        with pytest.raises(FilterExpressionError):
            store.query(top_k=5, filter='document_id === "d1"')
