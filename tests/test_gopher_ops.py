"""operators/gopher_ops.py: rule semantics the sf corpus can't pin
(it has no newlines, bullets, ellipses, or 6 of the 8 Gopher
stopwords) — crafted documents exercising each rule's trip wire and
the all-pass path. Oracle parity at sf0.01 runs separately via
tests/test_oracle_parity.py like every other query."""

from __future__ import annotations

from aichemy_data_pipelines_spark.operators.gopher_ops import (
    docs_gopher_quality,
)

_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

# 60 words, all alphabetic, mean length in [3,10], >=2 Gopher stops,
# no symbols/bullets/ellipses: passes all 7 rules
_GOOD = " ".join(["the quick brown fox jumps over that lazy dog with"] * 6)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def _run(spark, tmp_path, rows):
    sf = _write_docs(spark, tmp_path, rows)
    return {r.doc_id: r for r in docs_gopher_quality(spark, sf).collect()}


def test_conforming_document_passes_all_rules(spark, tmp_path):
    got = _run(spark, tmp_path, [(1, _GOOD, "en", "a", len(_GOOD))])
    r = got[1]
    assert r.n_words == 60
    assert r.n_stop_hits == 3  # the, that, with
    assert r.n_failures == 0
    assert r.pass_gopher == 1


def test_word_count_and_stopword_rules_trip(spark, tmp_path):
    short = "the cat sat on that mat with milk"  # 8 words, 3 stops
    nostop = " ".join(["lorem ipsum dolor sit amet"] * 12)  # 60 w, 0 stops
    got = _run(
        spark,
        tmp_path,
        [
            (1, short, "en", "a", len(short)),
            (2, nostop, "en", "a", len(nostop)),
        ],
    )
    assert (got[1].pass_words, got[1].pass_stops) == (0, 1)
    assert got[1].n_failures == 1 and got[1].pass_gopher == 0
    assert (got[2].pass_words, got[2].pass_stops) == (1, 0)
    assert got[2].n_failures == 1 and got[2].pass_gopher == 0


def test_line_level_rules_count_nonblank_lines(spark, tmp_path):
    # 4 non-blank lines (blank line ignored): 2 bullets, 2 ellipsis
    text = "- first point\n\n* second point\nplain line...\ntrailing…"
    got = _run(spark, tmp_path, [(1, text, "en", "a", len(text))])
    r = got[1]
    assert r.bullet_line_frac == 0.5
    assert r.ellipsis_line_frac == 0.5
    assert r.pass_bullets == 1  # 0.5 <= 0.9
    assert r.pass_ellipsis == 0  # 0.5 > 0.3


def test_crlf_lines_leave_no_trailing_cr(spark, tmp_path):
    # CRLF text: the \r must be consumed by the line split, or the
    # ellipsis-end regex diverges between Java regex and RE2
    text = "- bullet\r\nends here...\r\nplain tail"
    got = _run(spark, tmp_path, [(1, text, "en", "a", len(text))])
    r = got[1]
    assert r.bullet_line_frac == round(1 / 3, 6)
    assert r.ellipsis_line_frac == round(1 / 3, 6)


def test_symbol_and_alpha_rules(spark, tmp_path):
    # 10 words, 2 '#' and one '...': symbol ratio 0.3 > 0.1
    sym = "# one # two ... three four five six seven"
    # 10 words, 4 numeric: alpha fraction 0.6 < 0.8
    num = "1 2 3 4 alpha beta gamma delta epsilon zeta"
    got = _run(
        spark,
        tmp_path,
        [(1, sym, "en", "a", len(sym)), (2, num, "en", "a", len(num))],
    )
    assert got[1].symbol_ratio == 0.3
    assert got[1].pass_symbols == 0
    assert got[2].alpha_word_frac == 0.6
    assert got[2].pass_alpha == 0


def test_mean_word_length_bounds(spark, tmp_path):
    tiny = " ".join(["a b cd"] * 20)  # mwl = 4/3 < 3
    longw = " ".join(["extraordinarily incomprehensible"] * 30)  # > 10
    got = _run(
        spark,
        tmp_path,
        [(1, tiny, "en", "a", len(tiny)), (2, longw, "en", "a", len(longw))],
    )
    assert got[1].pass_word_len == 0
    assert got[2].pass_word_len == 0


def test_empty_document_fails_closed_in_both_engines(spark, tmp_path):
    """r8 verdict #5 / r9 carried nit: a consumer filtering
    ``pass_gopher = 0`` must DROP an unscoreable document, never
    silently keep it. Empty / whitespace-only text tokenizes to [""]
    (split never returns an empty array, so the n_words = 0
    divide-by-zero is unreachable through SPARK_TOKENS — the flag
    coalesce in gopher_ops guards the contract if the tokenizer ever
    filters empties): every rule row is complete and non-NULL, the
    word-statistics rules FAIL, and Spark and DuckDB agree on the
    full row, so hash parity holds with the guard in place."""
    import duckdb

    from aichemy_data_pipelines_spark.operators.gopher_ops import ORACLE

    rows = [
        (1, "", "en", "a", 0),
        (2, "\n \n", "en", "a", 3),
        (3, _GOOD, "en", "a", len(_GOOD)),
    ]
    sf = _write_docs(spark, tmp_path, rows)
    df = docs_gopher_quality(spark, sf).orderBy("doc_id")
    got = df.collect()
    for r in got[:2]:
        # complete row: no NULL flags anywhere
        assert None not in tuple(r), r
        assert r.pass_words == 0
        assert r.pass_word_len == 0  # mwl 0 < 3
        assert r.pass_alpha == 0
        assert r.pass_gopher == 0
    assert got[2].pass_gopher == 1
    duck = duckdb.connect()
    duck.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = duck.sql(
        f"SELECT * FROM ({ORACLE['docs_gopher_quality']}) ORDER BY doc_id"
    ).fetchall()
    assert [tuple(r) for r in got] == [tuple(w) for w in want]
