"""Invariant tests for the corpus-pipeline operators (operators/corpus.py).

Oracle hash-parity is covered by test_oracle_parity; these pin the semantic
invariants a hash can't express: cluster transitivity, status partitioning,
normalization idempotence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from phabricator_etl_spark.operators.corpus import (
    corpus_incremental_new_docs,
    corpus_normalize_text,
    dedup_cluster_canonical,
)


def test_cluster_labels_are_transitive_and_canonical(spark, sf_smoke):
    out = dedup_cluster_canonical(spark, sf_smoke)
    rows = out.collect()
    by_id = {r.doc_id: r for r in rows}
    # every cluster_id is itself a member of the cluster and is its min id
    for r in rows:
        assert r.cluster_id in by_id, "cluster label must be a real doc_id"
        assert r.cluster_id <= r.doc_id, "label is the min id of the component"
        assert by_id[r.cluster_id].is_canonical
    # cluster_size is consistent: count of members per label
    from collections import Counter

    sizes = Counter(r.cluster_id for r in rows)
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
    # exactly one canonical per cluster
    assert sum(1 for r in rows if r.is_canonical) == len(sizes)


def test_incremental_statuses_partition_the_batch(spark, sf_smoke):
    out = corpus_incremental_new_docs(spark, sf_smoke)
    agg = {r.status: r.n for r in out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    n_batch = out.count()
    assert sum(agg.values()) == n_batch  # statuses are exhaustive + disjoint
    # every batch doc got exactly one row
    assert out.select("doc_id").distinct().count() == n_batch
    # a 'new' doc's hash appears exactly once among new docs
    new = out.filter(F.col("status") == "new")
    assert new.count() == new.select("h").distinct().count()


def test_normalize_is_idempotent(spark, sf_smoke):
    """Normalizing already-normalized text must be a fixpoint: re-applying
    the projection to the normalized string yields the same hash."""
    from phabricator_etl_spark.functions.hashing import md5_long
    from phabricator_etl_spark.sources.catalog import load_table

    d = load_table(spark, sf_smoke, "documents")
    norm1 = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )
    once = d.select(F.col("doc_id"), norm1.alias("text"))
    norm2 = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", " "), r"\s+", " "
        )
    )
    twice = once.select("doc_id", norm2.alias("text2"))
    joined = once.join(twice, "doc_id").filter(
        md5_long(F.col("text")) != md5_long(F.col("text2"))
    )
    assert joined.count() == 0

    out = corpus_normalize_text(spark, sf_smoke)
    assert out.filter(F.col("n_chars_norm") > F.col("n_chars_raw")).count() == 0


def test_nb_classifier_learns_separable_corpus(spark, tmp_path):
    """text_nb_classifier on a corpus whose classes have genuinely distinct
    vocabularies must (a) reach >= 0.95 train accuracy (the driver corpus
    can't show this: every lang draws from one shared vocabulary, ~0.62
    ceiling) and (b) agree with the DuckDB oracle on this second corpus."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from phabricator_etl_spark.functions.text import (
        NB_CLASSIFIER_ORACLE,
        text_nb_classifier,
    )

    en_vocab = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    de_vocab = ["der", "schnelle", "braune", "fuchs", "springt", "ueber", "faule", "hund"]
    shared = ["data", "table", "row"]
    rows = []
    for i in range(300):
        pos = i % 3 != 0  # 200 en, 100 de
        vocab = en_vocab if pos else de_vocab
        # deterministic word mix: mostly class vocab, some shared noise
        words = [vocab[(i + j) % len(vocab)] for j in range(12)]
        words += [shared[(i + j) % len(shared)] for j in range(4)]
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(words),
                "lang": "en" if pos else "de",
                "source": "srcA",
                "n_chars": 0,
            }
        )
    out = str(tmp_path / "sep")
    import os

    os.makedirs(out, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(rows), f"{out}/documents.parquet")

    spdf = text_nb_classifier(spark, out).toPandas()
    spdf["true_pos"] = (spdf["lang_true"] == "en").astype(int)
    acc = float((spdf["pred_pos"] == spdf["true_pos"]).mean())
    assert acc >= 0.95, f"separable-corpus train accuracy {acc:.2f} below floor"

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{out}/documents.parquet'")
    orc = con.sql(NB_CLASSIFIER_ORACLE).df()
    k = lambda p: sorted(  # noqa: E731
        tuple(str(v) for v in t)
        for t in p[sorted(["doc_id", "lang_true", "n_tokens", "score_milli", "pred_pos"])]
        .itertuples(index=False, name=None)
    )
    assert k(spdf.astype({"doc_id": "int64"})[["doc_id", "lang_true", "n_tokens", "score_milli", "pred_pos"]]) == k(
        orc.astype({"doc_id": "int64"})[["doc_id", "lang_true", "n_tokens", "score_milli", "pred_pos"]]
    )


def test_bpe_pretokenizer_agrees_on_adversarial_strings(spark):
    """The BPE pre-tokenizer regex runs on two different engines (Java
    regex in Spark, RE2 in DuckDB); pin the actual TOKEN SEQUENCES on
    adversarial strings — contractions, multi-space runs, mixed
    alnum, empty text — not just the counts the registry query hashes."""
    import duckdb

    from phabricator_etl_spark.functions.text import BPE_PRETOKEN_RE

    texts = [
        "The quick brown fox's 42 jumps, over!  the lazy-dog... 3.14",
        "hello   world",
        "",
        "a1b2 c3",
        "don't you'll we're I'd it's 'tis",
        "...!!!???",
        "   leading and trailing   ",
        "tab\there\nnewline",
        # \x0b (vertical tab): Java \s includes it, RE2's does not — the
        # explicit ASCII whitespace class makes both engines call it punct
        "a\x0b b",
        "\x0b\x0b",
        "mixed \x0b\ttail",
    ]
    sdf = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: list(r["toks"])
        for r in sdf.select(
            "i", F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), 0).alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT regexp_extract_all(?, ?)", [t, BPE_PRETOKEN_RE]
        ).fetchone()[0]
        assert got[i] == want, f"engines tokenize {t!r} differently"
        # lossless partition: tokens concatenate back to the original
        assert "".join(want) == t
