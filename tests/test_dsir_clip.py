"""Semantics of the r8 curation additions: DSIR importance resampling
(operators/text.py) and contamination span CLIPPING (operators/
dedup.py) — behavior the oracle hash-compare alone doesn't explain."""

import pyspark.sql.functions as F  # noqa: F401


class TestDsir:
    def _frames(self, spark):
        target = spark.createDataFrame(
            [
                (1, "machine learning models train on text data"),
                (2, "neural networks learn from training data"),
            ],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                (10, "machine learning models need lots of training data to learn"),
                (11, "the cake recipe calls for two cups of flour and sugar"),
                (12, "neural networks and machine learning text models"),
                (13, "football season starts in autumn with the first match"),
            ],
            "doc_id long, text string",
        )
        return corpus, target

    def test_weights_rank_target_like_docs_higher(self, spark):
        from easydb_server_spark.operators.text import dsir_weights

        corpus, target = self._frames(spark)
        w = {r.doc_id: r.log_ratio for r in dsir_weights(corpus, target, "text", "doc_id").collect()}
        # ML docs (10, 12) must out-score cake (11) and football (13)
        assert min(w[10], w[12]) > max(w[11], w[13])

    def test_select_is_deterministic_and_seed_sensitive(self, spark):
        from easydb_server_spark.operators.text import dsir_select

        corpus, target = self._frames(spark)
        a = [r.doc_id for r in dsir_select(corpus, target, "text", "doc_id", k=2).collect()]
        b = [r.doc_id for r in dsir_select(corpus, target, "text", "doc_id", k=2).collect()]
        assert a == b  # same seed → identical selection
        keys1 = {r.doc_id: r.key for r in dsir_select(corpus, target, "text", "doc_id", k=4).collect()}
        keys2 = {r.doc_id: r.key for r in dsir_select(corpus, target, "text", "doc_id", k=4, seed="other").collect()}
        assert keys1 != keys2  # seed perturbs the Gumbel keys

    def test_low_temperature_approaches_argmax(self, spark):
        """T → 0 scales the weights up against the O(1) Gumbel noise, so
        selection converges to the top-k by weight alone."""
        from easydb_server_spark.operators.text import dsir_select, dsir_weights

        corpus, target = self._frames(spark)
        w = {r.doc_id: r.log_ratio for r in dsir_weights(corpus, target, "text", "doc_id").collect()}
        want = sorted(w, key=lambda d: -w[d])[:2]
        got = [
            r.doc_id
            for r in dsir_select(corpus, target, "text", "doc_id", k=2, temperature=1e-6).collect()
        ]
        assert sorted(got) == sorted(want)

    def test_null_and_empty_text_rows_drop_from_weights(self, spark):
        from easydb_server_spark.operators.text import dsir_weights

        corpus = spark.createDataFrame(
            [(1, None), (2, ""), (3, "real text here")], "doc_id long, text string"
        )
        target = spark.createDataFrame([(9, "real text")], "doc_id long, text string")
        ids = {r.doc_id for r in dsir_weights(corpus, target, "text", "doc_id").collect()}
        assert ids == {3}


class TestClipSpans:
    def _clip(self, spark, corpus_rows, bench_rows, n=3):
        from easydb_server_spark.operators.dedup import clip_contaminated_spans

        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in clip_contaminated_spans(corpus, bench, "text", "doc_id", n=n).collect()
        }

    def test_only_the_overlapping_span_is_removed(self, spark):
        out = self._clip(
            spark,
            [(1, "prefix words here the secret eval answer and a long suffix tail")],
            [(9, "the secret eval answer")],
        )
        r = out[1]
        # flagged 3-gram starts: "the secret eval", "secret eval answer"
        # → covered tokens 3..6 ("the secret eval answer")
        assert r.clean_text == "prefix words here and a long suffix tail"
        assert r.n_removed == 4 and r.n_words == 12

    def test_overlapping_spans_merge_not_double_count(self, spark):
        out = self._clip(
            spark,
            [(1, "a b c d e")],
            [(9, "a b c d e")],  # every 3-gram flagged
        )
        r = out[1]
        assert r.clean_text == "" and r.n_removed == 5  # fully clipped, once each

    def test_clean_docs_pass_through_unchanged(self, spark):
        out = self._clip(
            spark,
            [(1, "totally unrelated words in this document")],
            [(9, "the secret eval answer")],
        )
        r = out[1]
        assert r.n_removed == 0
        assert r.clean_text == "totally unrelated words in this document"

    def test_span_at_document_end(self, spark):
        out = self._clip(
            spark,
            [(1, "keep these words the secret answer")],
            [(9, "the secret answer")],
        )
        r = out[1]
        assert r.clean_text == "keep these words"
        assert r.n_removed == 3


class TestGopherRules:
    def test_each_rule_fires_on_its_violation(self, spark):
        from easydb_server_spark.operators.text import gopher_rules

        good = " ".join(
            ["the quick brown fox jumps over that lazy dog and it runs to be with friends of mine have fun"]
            * 4
        )
        rows = [
            (1, good),                                   # passes all
            (2, "short text"),                           # word count
            (3, "# " * 60 + good),                       # hash symbol ratio
            (4, "\n".join(["- item one here"] * 10)),    # bullet lines
            (5, good.replace(" ", "... ")),              # ellipsis symbol ratio
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in gopher_rules(df, "text", "doc_id").collect()}
        assert out[1].pass_gopher
        assert not out[2].word_count_ok and not out[2].pass_gopher
        assert not out[3].symbol_ratio_ok and not out[3].mean_word_len_ok
        assert not out[4].bullet_lines_ok
        assert not out[5].symbol_ratio_ok
        # passing doc's metrics are exact
        assert out[1].n_words == 80 and out[1].n_stopwords == 8

    def test_thresholds_are_overridable(self, spark):
        from easydb_server_spark.operators.text import gopher_rules

        df = spark.createDataFrame(
            [(1, "the of and " * 5)], "doc_id long, text string"
        )
        strict = gopher_rules(df, "text", "doc_id").collect()[0]
        loose = gopher_rules(
            df, "text", "doc_id", min_words=5, min_mean_word_len=2.0
        ).collect()[0]
        assert not strict.word_count_ok and loose.word_count_ok
        assert not strict.mean_word_len_ok and loose.mean_word_len_ok


class TestKeepersByPriority:
    def test_priority_keeper_beats_min_id(self, spark):
        from easydb_server_spark.operators.clusters import keepers_by_priority

        cc = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], "doc_id long, component long"
        )
        pr = spark.createDataFrame(
            [(1, 0.2), (2, 0.9), (3, 0.9), (7, 0.5), (8, 0.1)],
            "doc_id long, priority double",
        )
        out = {r.component: r.keeper for r in keepers_by_priority(cc, pr).collect()}
        # component 1: docs 2 and 3 tie at 0.9 → min id 2 (NOT min-id 1)
        assert out == {1: 2, 7: 7}


class TestLineDedupAndNovelty:
    def test_line_dedup_keeps_first_occurrence_in_order(self, spark):
        from easydb_server_spark.operators.text import line_dedup

        df = spark.createDataFrame(
            [
                (1, "header\nbody one\nheader\nbody two\nheader"),
                (2, "a\nb\nc"),  # no dups → unchanged
                (3, "x\nx\nx\nx"),  # all dup of first
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in line_dedup(df, "text", "doc_id").collect()}
        assert out[1].clean_text == "header\nbody one\nbody two"
        assert (out[1].n_lines, out[1].n_removed) == (5, 2)
        assert out[2].clean_text == "a\nb\nc" and out[2].n_removed == 0
        assert out[3].clean_text == "x" and out[3].n_removed == 3

    def test_novelty_bounds_and_duals(self, spark):
        from easydb_server_spark.operators.text import ngram_novelty

        ref = spark.createDataFrame(
            [(9, "the quick brown fox jumps")], "doc_id long, text string"
        )
        cor = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps"),  # identical → 0 novelty
                (2, "entirely different words compose this one"),  # all novel
                (3, "the quick brown fox sleeps today ok"),  # partial
                (4, "xy"),  # < n words → no grams → 0/0/0
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in ngram_novelty(cor, ref, "text", "doc_id", n=3).collect()}
        assert out[1].novelty_frac == 0.0 and out[1].n_novel == 0
        assert out[2].novelty_frac == 1.0 and out[2].n_novel == out[2].n_grams
        assert 0.0 < out[3].novelty_frac < 1.0
        assert (out[4].n_grams, out[4].n_novel, out[4].novelty_frac) == (0, 0, 0.0)
