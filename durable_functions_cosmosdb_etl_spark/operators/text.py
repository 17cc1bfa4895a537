"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in Spark expressions (JVM, whole-stage
codegen) — no Python UDFs. Each function returns Columns / DataFrames
composed of `pyspark.sql.functions`, so at 100 TB these run inside the
scan-project pipeline with zero extra shuffles.

Capabilities (north-star additions; absent from the reference, which has
no text ops beyond string interpolation, EtlProcess.cs:233-236):
- whitespace + BPE-ish regex token counting
- n-gram word shingles (shared with dedup)
- language ID via stopword-marker scoring (deterministic heuristic)
- quality scoring (length / word-length / stopword / alpha ratios)
- polynomial rolling-hash document fingerprint
"""

from __future__ import annotations

# Module-level so pandas_udf can resolve the (stringified, PEP 563)
# ``pd.Series`` type hints of the model-backend wrapper against this
# module's globals; the expression hot path below never touches it.
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish tokenization: letter runs, single digits, single punctuation.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"

# Tiny public stopword marker lists per language (heuristic lang-id).
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is|in)\b",
    "es": r"\b(el|la|de|los|que|y)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "zh": r"(的|是|在|了)",
}


def words(text: Column) -> Column:
    """Whitespace word split (empty input → empty array)."""
    return F.split(F.trim(text), r"\s+")


def word_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def token_count(text: Column) -> Column:
    """BPE-ish token estimate: count of TOKEN_PATTERN matches."""
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_PATTERN), 0)).cast("long")


def marker_score(text: Column, lang: str) -> Column:
    """Number of stopword-marker hits for `lang` (lowercased input)."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(LANG_MARKERS[lang]), 0)
    ).cast("long")


def lang_id(text: Column) -> Column:
    """Deterministic argmax of marker scores, tie order en>es>de>zh."""
    s = {k: marker_score(text, k) for k in LANG_MARKERS}
    return (
        F.when(
            (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]), "en"
        )
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )


# --- pluggable language-ID seam (mirrors multimodal.get_decoder) --------

# Per-worker model caches: named backends load their model LAZILY inside
# the UDF (once per Python worker), so the heavy model object never
# rides in the task closure and never needs to pickle.
_LANG_MODEL_CACHE: dict = {}


def _fasttext_predict(texts: list) -> list:
    import os

    if "fasttext" not in _LANG_MODEL_CACHE:
        import fasttext

        path = os.environ["FASTTEXT_LID_MODEL"]
        _LANG_MODEL_CACHE["fasttext"] = fasttext.load_model(path)
    model = _LANG_MODEL_CACHE["fasttext"]
    labels, _scores = model.predict([t.replace("\n", " ") for t in texts])
    return [
        (ls[0].replace("__label__", "") if ls else None) for ls in labels
    ]


def _lingua_predict(texts: list) -> list:
    if "lingua" not in _LANG_MODEL_CACHE:
        from lingua import LanguageDetectorBuilder

        _LANG_MODEL_CACHE["lingua"] = (
            LanguageDetectorBuilder.from_all_languages().build()
        )
    det = _LANG_MODEL_CACHE["lingua"]
    out = []
    for t in texts:
        lang = det.detect_language_of(t)
        out.append(lang.iso_code_639_1.name.lower() if lang else None)
    return out


def _batched_lang_udf(predict):
    """Wrap a ``list[str] -> list[str|None]`` predictor as a Column →
    Column function via an Arrow-batched pandas UDF (never per-row)."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def ident(texts: pd.Series) -> pd.Series:
        if len(texts) == 0:
            return pd.Series([], dtype=object)
        return pd.Series(predict(texts.fillna("").tolist()), dtype=object)

    return lambda col: ident(col)


def get_lang_identifier(identifier="marker"):
    """Resolve the language-ID implementation → a Column → Column fn.

    - ``"marker"`` (default) — the deterministic stopword-marker
      heuristic above (pure JVM expression, whole-stage codegen; what
      every oracle-backed query pins — those are unchanged by this
      seam).
    - ``"fasttext"`` — fastText lid model (``FASTTEXT_LID_MODEL`` env
      var names the .bin); ImportError/KeyError fails fast ON THE
      DRIVER, the model itself loads lazily once per Python worker.
    - ``"lingua"`` — lingua-py detector, same lazy-per-worker load.
    - ``"auto"`` — best available model backend (fasttext, then
      lingua), else the marker heuristic — the ``get_decoder`` pattern
      (operators/multimodal.py): real library when the environment has
      one, deterministic fallback when it doesn't.
    - a callable ``list[str] -> list[str|None]`` passes through
      (bring-your-own model), wrapped in the same Arrow-batched UDF.

    The marker path stays the oracle/default because a MODEL's labels
    are neither SQL-replicable nor stable across library versions; a
    real curation pipeline flips to ``"auto"`` at the call site and
    keeps the identical plan shape (one projected column, no shuffle).
    """
    if callable(identifier):
        return _batched_lang_udf(identifier)
    if identifier == "marker":
        return lang_id
    if identifier == "fasttext":
        import os

        import fasttext  # noqa: F401  (fail fast with the real ImportError)

        if "FASTTEXT_LID_MODEL" not in os.environ:
            raise KeyError(
                "FASTTEXT_LID_MODEL must name the lid model .bin"
            )
        return _batched_lang_udf(_fasttext_predict)
    if identifier == "lingua":
        import lingua  # noqa: F401

        return _batched_lang_udf(_lingua_predict)
    if identifier == "auto":
        for name, resolve in (("fasttext", "fasttext"), ("lingua", "lingua")):
            try:
                return get_lang_identifier(resolve)
            except (ImportError, KeyError):
                continue
        return lang_id
    raise ValueError(f"unknown identifier: {identifier!r}")


def quality_features(text: Column) -> dict[str, Column]:
    """Quality-signal columns; combine with `quality_score`."""
    n_words = word_count(text)
    n_chars = F.length(text).cast("long")
    non_space = F.length(F.replace(text, F.lit(" "), F.lit(""))).cast("long")
    alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    stop_hits = marker_score(text, "en")
    # try_divide: an EMPTY text has n_chars = 0, and a plain division
    # is a job-killing DIVIDE_BY_ZERO under ANSI mode (Spark 4 default)
    # — the same failure class as the minhash 0/0 verify. Null ratios
    # for degenerate docs, matched by NULLIF on the DuckDB oracle side
    # (DuckDB would otherwise yield IEEE inf, not an error). n_words
    # cannot currently be 0 (split('') yields ['']), but the guard
    # costs nothing and survives a tokenizer change.
    return {
        "n_words": n_words,
        "n_chars": n_chars,
        "avg_word_len": F.try_divide(non_space.cast("double"), n_words),
        "stop_ratio": F.try_divide(stop_hits.cast("double"), n_words),
        "alpha_ratio": F.try_divide(alpha.cast("double"), n_chars),
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0, ~1.5]: stopword density + alpha purity
    + a length factor. Deterministic arithmetic only (cross-engine safe)."""
    f = quality_features(text)
    length_factor = F.least(f["n_words"].cast("double") / F.lit(100.0), F.lit(1.0))
    return f["stop_ratio"] * 0.5 + f["alpha_ratio"] * 0.5 + length_factor * 0.5


def shingles_from_words(w: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an ALREADY-MATERIALIZED word
    array column (the near-dup unit).

    Pure array expressions: sequence over start offsets → concat_ws of
    the n words → array_distinct. Docs shorter than n words → empty.

    `w` must be an attribute reference (a real column), not an inline
    `split(...)` expression: lambdas inside higher-order functions are
    evaluated interpreted with NO common-subexpression elimination, so an
    inline split would re-run its regex for every element_at of every
    shingle — measured 17× slower at 5k docs. Use `shingles()` below only
    when that cost is acceptable (single-row tests).
    """
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(-1)))
    # slice+array_join: one interpreted call per gram instead of n
    # element_at lookups + concat_ws (measured 2.4× at 5k docs; both
    # skip nulls identically, and split() never yields nulls anyway).
    gram = lambda i: F.array_join(F.slice(w, i + 1, n), " ")  # noqa: E731
    return F.when(F.size(w) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(idx, gram))
    )


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles straight from a text column.

    Convenience form — re-evaluates the word split per shingle element
    (see `shingles_from_words`); prefer the two-step select in any plan
    that shingles more than a handful of rows.
    """
    return shingles_from_words(words(text), n)


def fingerprint(text: Column, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling fingerprint over words.

    fp = sum_i( i * (100*len(w_i) + ascii(w_i[0]) ) ) mod M, i 1-based.
    Weak by design but fully portable (same integer arithmetic in any
    engine); the scale path for content-defined chunking would swap in
    xxhash64 per shingle (engine-specific, see dedup.minhash)."""
    w = words(text)
    terms = F.transform(
        w,
        lambda x, i: (i + 1).cast("long")
        * (F.lit(100) * F.length(x) + F.ascii(x)).cast("long"),
    )
    return F.aggregate(terms, F.lit(0).cast("long"), lambda a, x: a + x) % mod
