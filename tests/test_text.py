"""Text-operator unit tests on literal inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from durable_functions_cosmosdb_etl_spark.operators import text as tx


def _one(spark, text: str, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first().v


def test_word_and_token_counts(spark):
    t = F.col("text")
    assert _one(spark, "hello world  foo", tx.word_count(t)) == 3
    # BPE-ish: "don't" → don + ' + t ; "a1" → a + 1
    assert _one(spark, "don't stop", tx.token_count(t)) == 4
    assert _one(spark, "a1", tx.token_count(t)) == 2


def test_lang_id_markers(spark):
    t = F.col("text")
    assert _one(spark, "the cat and the dog is here", tx.lang_id(t)) == "en"
    assert _one(spark, "el gato y la casa de los perros", tx.lang_id(t)) == "es"
    assert _one(spark, "der hund und die katze ist da", tx.lang_id(t)) == "de"
    assert _one(spark, "这是在了的一个测试", tx.lang_id(t)) == "zh"


def test_shingles(spark):
    t = F.col("text")
    got = _one(spark, "a b c d", tx.shingles(t, 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", tx.shingles(t, 3)) == []


def test_fingerprint_deterministic_and_order_sensitive(spark):
    t = F.col("text")
    f1 = _one(spark, "alpha beta gamma", tx.fingerprint(t))
    f2 = _one(spark, "alpha beta gamma", tx.fingerprint(t))
    f3 = _one(spark, "gamma beta alpha", tx.fingerprint(t))
    assert f1 == f2
    assert f1 != f3  # positional weighting → order matters


def test_quality_score_ranges(spark, sf_dir):
    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(tx.quality_score(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")
    ).first()
    assert stats[0] >= 0.0 and stats[1] <= 1.5


def test_quality_features_empty_text_survives_ansi(spark):
    """An empty-text doc has n_chars = 0; the alpha_ratio division must
    yield NULL (try_divide), not a job-killing ANSI DIVIDE_BY_ZERO —
    the same failure class as the minhash 0/0 verify. Degenerate docs
    get null ratios and filter out of quality gates like any null."""
    docs = spark.createDataFrame(
        [(1, ""), (2, None), (3, "real text here")],
        "doc_id long, text string",
    )
    f = tx.quality_features(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", f["alpha_ratio"].alias("ar"), f["stop_ratio"].alias("sr")
        ).collect()
    }
    assert rows[1]["ar"] is None          # 0-char doc: null, no crash
    assert rows[2]["ar"] is None          # null text propagates
    assert rows[3]["ar"] is not None
    # quality_score composes the null through (null ⇒ filtered by gates)
    q = docs.select(
        "doc_id", tx.quality_score(F.col("text")).alias("q")
    ).collect()
    assert {r["doc_id"]: r["q"] is None for r in q} == {
        1: True, 2: True, 3: False,
    }


def test_stratified_sample_proportions(spark):
    """sampleBy draws ≈ the requested fraction per stratum (±40% rel at
    sf0.01 counts)."""
    from pyspark.sql import functions as FF

    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    fractions = {"en": 0.5, "es": 0.25, "de": 0.25, "zh": 0.1}
    sampled = d.sampleBy("lang", fractions, seed=42)
    totals = {r.lang: r.n for r in d.groupBy("lang").agg(
        FF.count("*").alias("n")
    ).collect()}
    got = {r.lang: r.n for r in sampled.groupBy("lang").agg(
        FF.count("*").alias("n")
    ).collect()}
    for lang, frac in fractions.items():
        if totals.get(lang, 0) >= 40:
            ratio = got.get(lang, 0) / totals[lang]
            assert abs(ratio - frac) <= 0.4 * frac + 0.05, (lang, ratio, frac)
    # deterministic for a fixed seed + layout
    again = {r.lang: r.n for r in d.sampleBy("lang", fractions, seed=42)
             .groupBy("lang").agg(
        FF.count("*").alias("n")
    ).collect()}
    assert got == again


def test_contamination_collapse_equivalence(spark):
    """dedup_contamination's identical-content collapse branch (train
    membership expansion + bench set dedup) is byte-identical to the
    plain inverted-index join on a copy-heavy corpus where copies land
    on BOTH sides of the %10 train/bench split."""
    from pyspark.sql import functions as F

    from durable_functions_cosmosdb_etl_spark.plans.llm_ops import (
        contamination_check,
    )

    base = [
        "the quick brown fox jumps over the lazy dog again and again",
        "a completely different document about spark physical planning",
        "say the quick brown fox jumps over",
    ]
    # ids i + 100c: copies of one text hit several residues mod 10
    rows = [(i + 100 * c + 7 * i, t) for i, t in enumerate(base) for c in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = contamination_check(docs, collapse_identical=False)
    b = contamination_check(docs, collapse_identical=True)
    ra = sorted((r.doc_id, round(r.max_containment, 9)) for r in a.collect())
    rb = sorted((r.doc_id, round(r.max_containment, 9)) for r in b.collect())
    assert ra == rb
    assert len(ra) > 0


def test_lang_identifier_seam(spark):
    """get_lang_identifier mirrors multimodal.get_decoder: marker is the
    deterministic default (the expression itself, oracle paths pinned),
    a callable is bring-your-own (Arrow-batched), auto degrades to the
    marker heuristic when no model library exists, unknown raises."""
    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el perro y la casa de los gatos"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    # marker: the seam returns the expression function itself
    marker = tx.get_lang_identifier("marker")
    assert marker is tx.lang_id
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", marker(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[1] == "en" and got[2] == "es"
    # callable pass-through: wrapped in a pandas UDF, applied batched
    fake = tx.get_lang_identifier(
        lambda texts: [f"xx{len(t) % 2}" for t in texts]
    )
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", fake(F.col("text")).alias("lang")
        ).collect()
    }
    assert set(got.values()) <= {"xx0", "xx1"} and len(got) == 3
    with _pytest.raises(ValueError, match="unknown identifier"):
        tx.get_lang_identifier("babel")


def test_lang_identifier_auto_fallback():
    """In an environment without fasttext/lingua, auto resolves to the
    marker heuristic (the get_decoder degradation contract)."""
    import importlib.util

    import pytest as _pytest

    has_model_lib = any(
        importlib.util.find_spec(m) is not None
        for m in ("fasttext", "lingua")
    )
    if has_model_lib:
        _pytest.skip("a model library is installed; fallback not reachable")
    assert tx.get_lang_identifier("auto") is tx.lang_id


def test_lang_identifier_lingua_real():
    """Real lingua path — runs only where lingua-py is installed."""
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("lingua") is None:
        _pytest.skip("lingua not installed in this environment")
    ident = tx.get_lang_identifier("lingua")
    assert callable(ident)


def test_lang_identifier_fasttext_requires_model_env(monkeypatch):
    """fasttext backend fails fast on the driver when the model path env
    is unset — only when the library itself is importable."""
    import importlib.util

    import pytest as _pytest

    if importlib.util.find_spec("fasttext") is None:
        _pytest.skip("fasttext not installed in this environment")
    monkeypatch.delenv("FASTTEXT_LID_MODEL", raising=False)
    with _pytest.raises(KeyError, match="FASTTEXT_LID_MODEL"):
        tx.get_lang_identifier("fasttext")
