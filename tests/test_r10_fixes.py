"""Round-10 fixes: case-insensitive HTML tag handling (uppercase
<SCRIPT> bodies must never leak into clean text), the linearized
dup_stats fold (no O(lines²) per-row cliff on pathological documents),
the blocklist-table overload of url_features, and 8/24-bit PCM +
channel remix in the WAV codec."""

import time

import pyspark.sql.functions as F
import pytest


class TestHtmlCaseInsensitive:
    def test_uppercase_script_body_never_in_clean_text(self, spark):
        from easydb_server_spark.operators.text import html_extract

        df = spark.createDataFrame(
            [
                (1, "<SCRIPT>var x = 1;</SCRIPT><P>Hello</P><BR>Bye"),
                (2, "<STYLE>p {color:red}</STYLE><DIV>kept</DIV>"),
                (3, "<ScRiPt type='T'>mixed body</sCrIpT>tail"),
            ],
            "doc_id long, html string",
        )
        rows = {r.doc_id: r for r in html_extract(df, "html", "doc_id").collect()}
        # the r9-verdict replay: script body leaked as 'var x = 1;HelloBye'
        assert "var x" not in rows[1].clean_text
        # </P> then <BR> is two breaks → collapses to ONE paragraph break
        assert rows[1].clean_text == "Hello\n\nBye"
        assert "color" not in rows[2].clean_text
        assert rows[2].clean_text == "kept"
        assert "mixed body" not in rows[3].clean_text
        assert rows[3].clean_text == "tail"

    def test_uppercase_block_closers_make_newlines(self, spark):
        from easydb_server_spark.operators.text import html_extract

        df = spark.createDataFrame(
            [(1, "<LI>a</LI><li>b</li><H2>c</H2><TR>d</TR>")],
            "doc_id long, html string",
        )
        r = html_extract(df, "html", "doc_id").collect()[0]
        assert r.clean_text == "a\nb\nc\nd"


class TestDupStatsLinear:
    def test_pathological_10k_duplicate_lines_bounded_time(self, spark):
        """The pre-r10 per-distinct filter scan was O(lines ×
        distinct_lines) in-row; 10k duplicate lines with ~5k distinct
        values cost ~5·10⁷ string comparisons on ONE row. The sorted
        adjacent-equals fold is O(lines log lines)."""
        from easydb_server_spark.operators.text import gopher_repetition_rules

        lines = [f"line {i % 5000}" for i in range(10_000)]
        doc = "\n".join(lines)
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        t0 = time.time()
        r = gopher_repetition_rules(df, "text", "doc_id").collect()[0]
        assert time.time() - t0 < 60
        # every line value occurs exactly twice → 5000 duplicates
        assert r.dup_line_frac == pytest.approx(5000 / 10_000)
        dup_chars = sum(len(f"line {i}") for i in range(5000))
        assert r.dup_line_char_frac == pytest.approx(round(dup_chars / len(doc), 6))

    def test_dup_char_semantics_unchanged(self, spark):
        from easydb_server_spark.operators.text import gopher_repetition_rules

        # 'aa' ×3 (dup chars 2·2=4), 'b' ×1, 'ccc' ×2 (dup chars 3)
        doc = "aa\nb\naa\nccc\naa\nccc"
        df = spark.createDataFrame([(1, doc)], "doc_id long, text string")
        r = gopher_repetition_rules(df, "text", "doc_id").collect()[0]
        assert r.dup_line_frac == pytest.approx(round(3 / 6, 6))
        assert r.dup_line_char_frac == pytest.approx(round(7 / len(doc), 6))
