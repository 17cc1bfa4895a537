"""Similarity-search tests: IVF recall vs exact brute force; math sanity."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from durable_functions_cosmosdb_etl_spark.operators import similarity as sim
from durable_functions_cosmosdb_etl_spark.sources.tables import load_table


def test_cosine_expression_matches_python(spark):
    rows = [(1, [1.0, 0.0, 2.0]), (2, [0.5, 1.0, -1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = df.filter("vec_id=1").select(F.col("embedding").alias("a"))
    b = df.filter("vec_id=2").select(F.col("embedding").alias("b"))
    got = a.crossJoin(b).select(sim.cosine(F.col("a"), F.col("b")).alias("c")).first().c
    expect = (1 * 0.5 + 0 + 2 * -1) / (math.sqrt(5) * math.sqrt(0.25 + 1 + 1))
    assert abs(got - expect) < 1e-12


def test_brute_force_topk_shape(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    out = sim.brute_force_topk(
        em.filter("vec_id >= 5"), em.filter("vec_id < 5"), k=10
    ).collect()
    assert len(out) == 5 * 10
    for r in out:
        assert 1 <= r.rank <= 10 and -1.0 <= r.sim <= 1.0


def test_brute_force_prereduce_in_plan_and_exact(spark, sf_dir):
    """The local top-k pre-reduce must (a) appear in the physical plan
    BEFORE the rank window's exchange — it is what caps the window input
    at O(partitions × |Q| × k) instead of |Q| × |corpus| — and (b) not
    change results vs the reduction-free form."""
    em = load_table(spark, sf_dir, "embeddings")
    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")
    reduced = sim.brute_force_topk(corpus, queries, k=10)
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    # Tree prints parents (later stages) first: the window's hash
    # exchange must appear ABOVE MapInPandas, i.e. consume its output.
    # (The BroadcastExchange of the query side sits below — expected.)
    ipd = plan.index("MapInPandas")
    assert "Exchange hashpartitioning" in plan[:ipd], (
        "rank-window exchange does not consume the pre-reduce output"
    )
    assert "Exchange hashpartitioning" not in plan[ipd:], (
        "a hash exchange runs before the pre-reduce"
    )
    plain = sim.brute_force_topk(corpus, queries, k=10, prereduce=False)
    assert sorted(map(tuple, reduced.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_brute_force_sim_floor_filters(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")
    out = sim.brute_force_topk(corpus, queries, k=10, sim_floor=0.99).collect()
    assert all(r.sim >= 0.99 for r in out)


def test_ivf_fit_sample_deterministic(spark, sf_dir):
    """The hash-sampled fit set is partitioning-independent: fitting on
    a repartitioned corpus selects the same rows and yields the same
    codebook (centroid means compared at 1e-6 — double aggregation
    order may differ at ULP level across partitionings)."""
    em = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 5")
    a = sim.fit_ivf_centroids(em, n_centroids=5, min_fit_rows=10).collect()
    b = sim.fit_ivf_centroids(
        em.repartition(7), n_centroids=5, min_fit_rows=10
    ).collect()
    ka = {r.centroid_id: r.centroid for r in a}
    kb = {r.centroid_id: r.centroid for r in b}
    assert set(ka) == set(kb)
    for cid in ka:
        assert all(
            abs(x - y) < 1e-6 for x, y in zip(ka[cid], kb[cid])
        ), f"centroid {cid} differs"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(corpus, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(corpus, queries, k=10, n_centroids=10, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    # near-random embeddings are the worst case for IVF; still expect
    # well above the 3/10-cells-scanned floor
    assert recall >= 0.3, f"recall@10 = {recall}"


def test_cosine_pairs_threshold(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings").limit(100)
    pairs = sim.cosine_pairs(em, threshold=0.3).collect()
    for r in pairs:
        assert r.vec_id_a < r.vec_id_b


def test_ml_brp_lsh_recall_vs_brute_force(spark, sf_dir):
    from durable_functions_cosmosdb_etl_spark.operators.ml_lsh import (
        ml_brp_lsh_neighbors,
    )
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        brute_force_topk,
    )
    from durable_functions_cosmosdb_etl_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    em = load_table(spark, sf_dir, "embeddings")
    corpus, queries = em.filter(F.col("vec_id") >= 5), em.filter(
        F.col("vec_id") < 5
    )
    exact = brute_force_topk(corpus, queries, k=10).collect()
    approx = ml_brp_lsh_neighbors(corpus, queries, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(approx_sets) == set(exact_sets)
    recalls = [
        len(approx_sets[q] & exact_sets[q]) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.8


def test_blocked_exact_pairs_match_fold_join(spark, sf_dir):
    """Block-GEMM all-pairs must equal the fold-expression exact join,
    across multiple blocks (forces cross-block pair handling)."""
    em = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in sim.cosine_pairs_exact_blocked(
            em, threshold=0.35, block_size=64
        ).collect()
    }
    want = {
        (r.vec_id_a, r.vec_id_b)
        for r in sim.cosine_pairs(em, threshold=0.35).collect()
    }
    assert got == want and len(want) > 0


def test_lsh_auto_mode_falls_back_below_pruning_cutoff(spark, sf_dir):
    """τ=0.35 banding cannot prune (128 bands × 4 bits collide a random
    pair ~8× in expectation) — auto mode must choose the blocked-exact
    plan: no band-join exchange, and results equal the exact join."""
    em = load_table(spark, sf_dir, "embeddings").limit(150)
    auto = sim.cosine_pairs_lsh(em, threshold=0.35)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "posexplode" not in plan.lower()
    got = {(r.vec_id_a, r.vec_id_b) for r in auto.collect()}
    want = {
        (r.vec_id_a, r.vec_id_b)
        for r in sim.cosine_pairs(em, threshold=0.35).collect()
    }
    assert got == want


def test_blocked_exact_pairs_preserve_string_ids(spark, sf_dir):
    """auto mode swaps the LSH band join for the blocked-exact path, so
    the exact path must accept every id type the band join accepted —
    string ids round-trip with their type preserved."""
    from pyspark.sql import functions as F

    em = (
        load_table(spark, sf_dir, "embeddings")
        .limit(80)
        .select(
            F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
            "embedding",
        )
    )
    out = sim.cosine_pairs_lsh(em, threshold=0.35, id_col="vec_id")
    assert dict(out.dtypes)["vec_id_a"] == "string"
    rows = out.collect()
    assert len(rows) > 0
    assert all(
        r.vec_id_a.startswith("doc-") and r.vec_id_a < r.vec_id_b
        for r in rows
    )


def test_ivf_multi_step_fit_deterministic(spark, sf_dir):
    """n_iters>1 runs extra assign->mean Lloyd steps: still exactly
    n_centroids deterministic centroids, and the refinement does not
    degrade recall vs the single-step codebook."""
    em = load_table(spark, sf_dir, "embeddings")
    two_a = sim.fit_ivf_centroids(em, n_centroids=8, n_iters=2).collect()
    two_b = sim.fit_ivf_centroids(em, n_centroids=8, n_iters=2).collect()
    assert len(two_a) == 8
    assert sorted((r.centroid_id, r.centroid) for r in two_a) == sorted(
        (r.centroid_id, r.centroid) for r in two_b
    )
    one = {
        r.centroid_id: r.centroid
        for r in sim.fit_ivf_centroids(em, n_centroids=8, n_iters=1).collect()
    }
    # at least one centroid must actually move on the second step
    assert any(one[r.centroid_id] != r.centroid for r in two_a)


def test_ivf_kcenter_init_deterministic_and_spread(spark, sf_dir):
    """init="kcenter": greedy farthest-point seeding is deterministic,
    yields the full codebook, and its IVF recall is not worse than the
    recall gate the default init carries."""
    em = load_table(spark, sf_dir, "embeddings")
    a = sim.fit_ivf_centroids(em, n_centroids=6, init="kcenter").collect()
    b = sim.fit_ivf_centroids(em, n_centroids=6, init="kcenter").collect()
    assert len(a) == 6
    assert sorted((r.centroid_id, r.centroid) for r in a) == sorted(
        (r.centroid_id, r.centroid) for r in b
    )
    # spread: farthest-point seeds must not collapse to one cell — every
    # centroid ends up owning at least one fit vector
    owners = (
        sim.assign_to_centroids(
            em, spark.createDataFrame(a), "vec_id", "embedding"
        )
        .select("centroid_id")
        .distinct()
        .count()
    )
    assert owners == 6

    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(corpus, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in sim.ivf_topk(
            corpus, queries, k=10, n_centroids=10, nprobe=3, init="kcenter"
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"kcenter recall@10 = {recall}"


def test_ivf_unknown_init_rejected(spark, sf_dir):
    em = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="unknown init"):
        sim.fit_ivf_centroids(em, n_centroids=4, init="random").collect()


def test_null_embeddings_dropped_not_crashed(spark):
    """A null embedding (failed encoder row) must be dropped by every
    vector operator, not crash the Python worker mid-stack."""
    import pyspark.sql.types as T

    vecs = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0]), (2, [1.0, 0.01]), (3, [0.0, 1.0])],
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
            ]
        ),
    )
    pairs = sim.cosine_pairs_lsh(vecs, threshold=0.9).collect()
    assert {(r.vec_id_a, r.vec_id_b) for r in pairs} == {(1, 2)}
    sd = sim.semantic_dedup(vecs, threshold=0.9, n_clusters=2)
    assert {r.vec_id for r in sd.collect()} == {1, 2, 3}
    tk = sim.brute_force_topk(vecs, vecs, k=2)
    assert tk.filter("query_id = 0 OR neighbor_id = 0").count() == 0


def test_assign_scorer_arrow_bit_identical_to_expr(spark, sf_dir):
    """The Arrow scorer must agree with the interpreted expression
    scorer row for row — including zero-norm vectors (NULL-sim tier),
    exact ties (lowest centroid id), and a NaN-producing row. The dots
    use the same sequential fold (cumsum, not GEMM), so this holds
    bitwise, not just approximately."""
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        assign_to_centroids,
    )

    edge = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),            # zero norm → NULL tier
            (1, [1.0, 0.0, 0.0]),
            (2, [2.0, 0.0, 0.0]),            # exact tie with centroid 1 dup
            (3, [0.3, 0.3, 0.9]),
            (4, [float("nan"), 1.0, 0.0]),   # NaN sim tier
            (5, [1e-300, 1e-300, 1e-300]),   # denormal-range norms
        ],
        "vec_id long, embedding array<float>",
    )
    cen = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0]),            # duplicate centroid → tie
            (3, [0.0, 0.0, 1.0]),
            (4, [0.0, 0.0, 0.0]),            # zero-norm centroid
        ],
        "centroid_id int, centroid array<float>",
    )
    emb = load_table(spark, sf_dir, "embeddings")
    emb_cen = spark.createDataFrame(
        [
            (i + 1, r["embedding"])
            for i, r in enumerate(emb.orderBy("vec_id").limit(8).collect())
        ],
        "centroid_id int, centroid array<float>",
    )
    for corpus, cb in [(edge, cen), (emb, emb_cen)]:
        a = {
            r["vec_id"]: r["centroid_id"]
            for r in assign_to_centroids(corpus, cb, scorer="arrow").collect()
        }
        e = {
            r["vec_id"]: r["centroid_id"]
            for r in assign_to_centroids(corpus, cb, scorer="expr").collect()
        }
        assert a == e
    with pytest.raises(ValueError, match="unknown scorer"):
        assign_to_centroids(edge, cen, scorer="gemm")


def test_topk_arrow_scorer_bit_identical_to_expr(spark, sf_dir):
    """brute_force_topk and ivf_topk with the fused Arrow scorer must
    return exactly the expression plan's rows — ids, ranks AND raw sim
    doubles (sequential-fold bit-identity), including the sim_floor
    path."""
    em = load_table(spark, sf_dir, "embeddings")
    corpus, queries = em.filter("vec_id >= 5"), em.filter("vec_id < 5")

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
            for r in df.collect()
        )

    assert rows(
        sim.brute_force_topk(corpus, queries, k=10, scorer="arrow")
    ) == rows(sim.brute_force_topk(corpus, queries, k=10, scorer="expr"))
    assert rows(
        sim.brute_force_topk(
            corpus, queries, k=10, sim_floor=0.8, scorer="arrow"
        )
    ) == rows(
        sim.brute_force_topk(
            corpus, queries, k=10, sim_floor=0.8, scorer="expr"
        )
    )
    assert rows(
        sim.ivf_topk(
            corpus, queries, k=10, n_centroids=10, nprobe=3, scorer="arrow"
        )
    ) == rows(
        sim.ivf_topk(
            corpus, queries, k=10, n_centroids=10, nprobe=3, scorer="expr"
        )
    )
    with pytest.raises(ValueError, match="unknown scorer"):
        sim.brute_force_topk(corpus, queries, scorer="gemm")
    with pytest.raises(ValueError, match="unknown scorer"):
        sim.ivf_topk(corpus, queries, scorer="gemm")
    # degenerate: empty query set yields an empty, well-typed result
    assert (
        sim.brute_force_topk(
            corpus, queries.filter("vec_id < 0"), k=5
        ).count()
        == 0
    )


def test_topk_undefined_sim_contract(spark):
    """Undefined-similarity contract: a pair whose cosine is not a real
    number — zero-norm operand (try_divide NULL) or NaN operands —
    emits NO neighbor row, identically in both scorers, both prereduce
    modes, and IVF. Previously 0/0 = NaN in the arrow scorer took sort
    key +inf, so a degenerate corpus vector ranked #1 for EVERY query
    and passed sim_floor; and component-NaN sims flipped to NULL
    crossing the Arrow boundary, ranking last in pandas-backed plans
    but first in the pure-JVM one."""
    corpus = spark.createDataFrame(
        [
            (10, [0.0, 0.0, 0.0]),           # zero norm → NULL sim
            (11, [1.0, 0.0, 0.0]),
            (12, [0.9, 0.1, 0.0]),
            (13, [0.0, 1.0, 0.0]),
            (14, [float("nan"), 1.0, 0.0]),  # NaN operands → NaN sim
        ],
        "vec_id long, embedding array<float>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )

    def rows(df):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
            for r in df.collect()
        )

    variants = [
        dict(scorer="arrow"),
        dict(scorer="expr"),
        dict(scorer="expr", prereduce=False),
    ]
    for floor in (None, 0.5):
        results = [
            rows(
                sim.brute_force_topk(
                    corpus, queries, k=3, sim_floor=floor, **kw
                )
            )
            for kw in variants
        ]
        assert results[0] == results[1] == results[2], f"sim_floor={floor}"
        a = results[0]
        # neither degenerate corpus vector ever appears; the zero-norm
        # query gets no rows at all
        assert all(r[2] not in (10, 14) for r in a)
        assert all(r[0] != 1 for r in a)
        expect = [11, 12, 13] if floor is None else [11, 12]
        assert [r[2] for r in a if r[0] == 0] == expect
    # ivf: a zero-norm CENTROID must not be probed first, and the two
    # scorers' probe selection + rescore must agree under the contract
    ia = rows(
        sim.ivf_topk(corpus, queries, k=3, n_centroids=3, nprobe=2,
                     scorer="arrow")
    )
    ie = rows(
        sim.ivf_topk(corpus, queries, k=3, n_centroids=3, nprobe=2,
                     scorer="expr")
    )
    assert ia == ie
    assert all(r[2] not in (10, 14) and r[0] != 1 for r in ia)


def test_assign_to_centroids_empty_codebook_yields_zero_rows(spark):
    """Degenerate-codebook contract: an empty centroid table assigns
    nothing (not a corpus of NULL centroid ids)."""
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        assign_to_centroids,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    empty = spark.createDataFrame([], "centroid_id int, centroid array<float>")
    assert assign_to_centroids(corpus, empty).count() == 0
    assert assign_to_centroids(corpus, empty, scorer="expr").count() == 0


def test_semantic_dedup_collapse_identical_equivalence(spark):
    """semantic_dedup with collapse_identical matches the full
    within-cell GEMM on a corpus of exact vector copies — including the
    zero-norm group, whose members must all stay kept (NaN cosine)."""
    import random

    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        semantic_dedup,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(40)]
    base.append([0.0] * 8)  # zero-norm vector
    rows = [
        (i + 1000 * c, [float(x) for x in v])
        for i, v in enumerate(base)
        for c in range(4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = semantic_dedup(emb, threshold=0.35, n_clusters=4,
                       collapse_identical=False)
    b = semantic_dedup(emb, threshold=0.35, n_clusters=4,
                       collapse_identical=True)
    ra = sorted((r.vec_id, r.centroid_id, r.kept) for r in a.collect())
    rb = sorted((r.vec_id, r.centroid_id, r.kept) for r in b.collect())
    assert ra == rb
    # zero-norm copies: all kept
    zero_ids = {40 + 1000 * c for c in range(4)}
    kept = {r[0]: r[2] for r in rb}
    assert all(kept[z] for z in zero_ids)


def test_cosine_pairs_lsh_collapse_identical_equivalence(spark):
    """cosine_pairs_lsh collapse path (group on the raw vector, pairs
    expanded through membership) matches the uncollapsed path in BOTH
    regimes — blocked-exact (low threshold) and banded LSH (high
    threshold) — on a corpus of exact embedding copies, including the
    zero-norm group whose self-cosine is null and must emit nothing."""
    import random

    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        cosine_pairs_lsh,
    )

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    base.append([0.0] * 8)
    rows = [
        (i + 1000 * c, [float(x) for x in v])
        for i, v in enumerate(base)
        for c in range(4)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for thresh in (0.35, 0.9):
        a = cosine_pairs_lsh(emb, threshold=thresh, collapse_identical=False)
        b = cosine_pairs_lsh(emb, threshold=thresh, collapse_identical=True)
        ra = sorted((r.vec_id_a, r.vec_id_b) for r in a.collect())
        rb = sorted((r.vec_id_a, r.vec_id_b) for r in b.collect())
        assert ra == rb, f"threshold={thresh}: collapse path diverged"
        assert len(ra) > 0
        # zero-norm copies never pair, even with each other
        zeros = {30 + 1000 * c for c in range(4)}
        assert all(
            p[0] not in zeros and p[1] not in zeros for p in rb
        )


def test_codebook_persist_roundtrip_bit_identical(spark, sf_dir, tmp_path):
    """Cross-session fit/serving split (VERDICT r6 #7): fit → persist →
    "new session" (in-session memos cleared) → load. The loaded
    codebook must be BIT-identical (float32 through parquet is exact)
    and produce identical IVF top-k; a changed fit param or mutated
    corpus must refuse the stale artifact and refit."""
    em = load_table(spark, sf_dir, "embeddings").filter("vec_id >= 5")
    queries = load_table(spark, sf_dir, "embeddings").filter("vec_id < 5")
    cb_path = str(tmp_path / "codebook")
    fresh = sim.fit_or_load_ivf_centroids(
        em, cb_path, n_centroids=5, min_fit_rows=10
    ).collect()
    assert (tmp_path / "codebook" / "meta.json").exists()
    # "restart": wipe the in-session memos so resolution must hit disk
    sim.invalidate_fit_memos()
    loaded = sim.fit_or_load_ivf_centroids(
        em, cb_path, n_centroids=5, min_fit_rows=10
    ).collect()
    fa = {r.centroid_id: [float(x) for x in r.centroid] for r in fresh}
    fb = {r.centroid_id: [float(x) for x in r.centroid] for r in loaded}
    assert fa == fb  # bit-identical float32 values, not approx
    # serving equality end-to-end on the same params
    topk = sim.ivf_topk(em, queries, k=5, n_centroids=5, nprobe=2)
    got = sorted(map(tuple, topk.collect()))
    sim.invalidate_fit_memos()
    got2 = sorted(map(tuple, sim.ivf_topk(
        em, queries, k=5, n_centroids=5, nprobe=2
    ).collect()))
    assert got == got2
    # changed fit params → persisted artifact is stale → refit (and
    # the meta now records the new params)
    import json as _json

    sim.invalidate_fit_memos()
    other = sim.fit_or_load_ivf_centroids(
        em, cb_path, n_centroids=3, min_fit_rows=10
    ).collect()
    assert len(other) == 3
    with open(tmp_path / "codebook" / "meta.json") as f:
        assert _json.load(f)["params"]["n_centroids"] == 3
    # in-memory corpus (no file fingerprint) → fit works, nothing
    # persisted (a load could never prove freshness)
    mem = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    mem_path = str(tmp_path / "cb_mem")
    got_mem = sim.fit_or_load_ivf_centroids(
        mem, mem_path, n_centroids=2, min_fit_rows=2
    ).collect()
    assert len(got_mem) == 2
    import os as _os

    assert not _os.path.exists(mem_path)


def test_codebook_memo_detects_mutated_data(spark, tmp_path):
    """ADVICE r6 regression: the codebook memo key folds in an
    input-file fingerprint, so the SAME plan over MUTATED data (file
    rewritten in place — identical semanticHash) must refit instead of
    silently serving stale centroids."""
    p = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    first = sim.fit_ivf_centroids(
        spark.read.parquet(p), n_centroids=3, min_fit_rows=2
    ).collect()
    # rewrite the file under the same path: same plan, different data
    spark.createDataFrame(
        [(i, [0.0, 1.0, float(i * 7 + 1)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    second = sim.fit_ivf_centroids(
        spark.read.parquet(p), n_centroids=3, min_fit_rows=2
    ).collect()
    a = {r.centroid_id: list(r.centroid) for r in first}
    b = {r.centroid_id: list(r.centroid) for r in second}
    assert a != b, "stale memoized codebook served for mutated data"
    # and identical data under the same plan still hits the memo
    third = sim.fit_ivf_centroids(
        spark.read.parquet(p), n_centroids=3, min_fit_rows=2
    ).collect()
    assert {r.centroid_id: list(r.centroid) for r in third} == b


def test_codebook_persist_crash_windows(spark, tmp_path, monkeypatch):
    """Failure injection at each codebook-persist stage (VERDICT r7
    #6): the meta names the exact token dir it validates, so NO crash
    can pair a meta with a parquet it wasn't written for — after any
    injected crash, a fresh session either loads the old consistent
    artifact or refits. Complements the PYTHONHASHSEED subprocess test
    (which covered the cross-process fingerprint half)."""
    import json as _json
    import os as _os

    p = str(tmp_path / "corpus.parquet")

    def write_corpus(seed):
        spark.createDataFrame(
            [(i, [float((i * seed) % 17), 1.0]) for i in range(30)],
            "vec_id long, embedding array<float>",
        ).coalesce(1).write.mode("overwrite").parquet(p)

    def fresh_fit():
        sim.invalidate_fit_memos()
        return {
            r.centroid_id: [float(x) for x in r.centroid]
            for r in sim.fit_or_load_ivf_centroids(
                spark.read.parquet(p), cb_path,
                n_centroids=3, min_fit_rows=2,
            ).collect()
        }

    cb_path = str(tmp_path / "cb")
    meta_path = _os.path.join(cb_path, "meta.json")
    write_corpus(1)
    fresh_fit()
    with open(meta_path) as f:
        meta0 = _json.load(f)
    assert _os.path.isdir(_os.path.join(cb_path, meta0["data"]))

    # stage 1/2: crash after the new token dir is written but before
    # (or during) the meta replace — the OLD meta + OLD dir survive
    # untouched; the half-published dir is an unreferenced orphan
    write_corpus(2)
    sim.invalidate_fit_memos()
    real_replace = _os.replace

    def crash_on_meta(src, dst):
        if dst.endswith("meta.json"):
            raise RuntimeError("injected crash before meta replace")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crash_on_meta)
    with pytest.raises(RuntimeError, match="injected crash"):
        fresh_fit()
    monkeypatch.setattr(_os, "replace", real_replace)
    with open(meta_path) as f:
        assert _json.load(f) == meta0  # old meta intact, still
    assert _os.path.isdir(_os.path.join(cb_path, meta0["data"]))
    # recovery: the old meta's fingerprint no longer matches the
    # mutated corpus → refit + complete persist, never a stale load
    got = fresh_fit()
    with open(meta_path) as f:
        meta2 = _json.load(f)
    assert meta2["fingerprint"] != meta0["fingerprint"]
    assert _os.path.isdir(_os.path.join(cb_path, meta2["data"]))
    assert fresh_fit() == got  # now served by a consistent load

    # stage 3: crash after the meta replace but before the orphan GC —
    # the NEW artifact is complete; extra dirs are harmless orphans
    write_corpus(3)
    sim.invalidate_fit_memos()
    real_listdir = _os.listdir

    def crash_on_gc(path):
        if str(path) == cb_path:
            raise RuntimeError("injected crash before GC")
        return real_listdir(path)

    monkeypatch.setattr(_os, "listdir", crash_on_gc)
    with pytest.raises(RuntimeError, match="injected crash"):
        fresh_fit()
    monkeypatch.setattr(_os, "listdir", real_listdir)
    with open(meta_path) as f:
        meta3 = _json.load(f)
    assert meta3["fingerprint"] != meta2["fingerprint"]
    assert _os.path.isdir(_os.path.join(cb_path, meta3["data"]))
    after_crash = fresh_fit()  # loads the completed artifact
    assert after_crash and fresh_fit() == after_crash


def test_codebook_persist_two_process_race(spark, tmp_path):
    """TRUE cross-process persist race (VERDICT r7 #3, style of the
    LogTable commit race): two separate driver processes race
    fit_or_load_ivf_centroids on ONE codebook path. Both must return
    identical centroids, the surviving meta must reference an existing
    complete dir, and a later reader must load exactly that layout —
    readers never see a torn artifact."""
    import json as _json
    import os as _os
    import subprocess
    import sys
    import time

    work = str(tmp_path)
    # corpus parquet shared by both workers (file fingerprint source)
    spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3), 1.0]) for i in range(60)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{work}/corpus.parquet")
    worker = _os.path.join(
        _os.path.dirname(__file__), "_codebook_race_worker.py"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, work, str(w)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.PIPE,
        )
        for w in range(2)
    ]
    deadline = time.time() + 120
    while time.time() < deadline and not all(
        _os.path.exists(f"{work}/ready_{w}") for w in range(2)
    ):
        time.sleep(0.1)
    assert all(
        _os.path.exists(f"{work}/ready_{w}") for w in range(2)
    ), "workers failed to start"
    open(f"{work}/go", "w").close()
    for p in procs:
        err = p.communicate(timeout=300)[1]
        assert p.returncode == 0, err.decode()[-2000:]
    results = []
    for w in range(2):
        with open(f"{work}/attempted_{w}") as f:
            results.append(_json.load(f))
    # both fit (or loaded) the SAME deterministic codebook
    assert results[0] == results[1] and len(results[0]) == 3
    # exactly one persisted layout survives as THE artifact: the meta
    # validates and references one existing complete dir
    with open(f"{work}/cb/meta.json") as f:
        meta = _json.load(f)
    assert _os.path.isdir(_os.path.join(work, "cb", meta["data"]))
    # a later reader loads exactly that layout, bit-identical
    sim.invalidate_fit_memos()
    loaded = {
        str(r.centroid_id): [float(x) for x in r.centroid]
        for r in sim.fit_or_load_ivf_centroids(
            spark.read.parquet(f"{work}/corpus.parquet"),
            f"{work}/cb", n_centroids=3, min_fit_rows=2,
        ).collect()
    }
    assert loaded == results[0]


def test_fingerprint_digest_deterministic_across_processes(tmp_path):
    """Code-review regression (round 7): the persisted-codebook
    fingerprint must be identical across Python PROCESSES — the
    builtin hash() is seed-randomized for strings per process, which
    silently disabled every cross-session load (the persisted
    fingerprint never matched after a real restart; the in-process
    round-trip test could not see it). Computed under two different
    explicit PYTHONHASHSEEDs in fresh interpreters, the digest must
    agree with the in-process value."""
    import os as _os
    import subprocess
    import sys

    prog = (
        "import sys; sys.path.insert(0, %r); "
        "from durable_functions_cosmosdb_etl_spark.operators.similarity "
        "import _digest_parts; "
        "print(_digest_parts([('file:///a.parquet', 123, 456), "
        "('file:///b.parquet', None, None)]))"
        % _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    outs = []
    for seed in ("0", "12345"):
        env = dict(_os.environ, PYTHONHASHSEED=seed)
        outs.append(
            subprocess.run(
                [sys.executable, "-c", prog],
                capture_output=True, text=True, env=env, check=True,
            ).stdout.strip()
        )
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        _digest_parts,
    )

    local = _digest_parts(
        [("file:///a.parquet", 123, 456), ("file:///b.parquet", None, None)]
    )
    assert outs[0] == outs[1] == local and len(local) == 64


def test_codebook_gc_runs_on_load_path(spark, tmp_path):
    """VERDICT r8 #5: a corpus that loads forever but never refits used
    to keep a racing loser's orphan ``centroids-*.parquet`` dir
    indefinitely (GC only ran inside ``_persist_codebook``). A
    successful validated LOAD now runs the same keep-set GC: a stale
    orphan dir is reclaimed, the dir the meta references is untouched,
    and a YOUNG orphan (inside CODEBOOK_GC_GRACE_SECONDS — a racing
    persist mid-publish) survives."""
    import json as _json
    import os as _os
    import time as _time

    p = str(tmp_path / "corpus.parquet")
    spark.createDataFrame(
        [(i, [float(i % 7), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    cb_path = str(tmp_path / "codebook")
    fresh = sim.fit_or_load_ivf_centroids(
        spark.read.parquet(p), cb_path, n_centroids=3, min_fit_rows=2
    ).collect()
    with open(_os.path.join(cb_path, "meta.json")) as f:
        referenced = _json.load(f)["data"]
    # stage a stale orphan (a crashed/racing loser) + a young orphan
    stale = _os.path.join(cb_path, "centroids-stale0rphan.parquet")
    young = _os.path.join(cb_path, "centroids-young0rphan.parquet")
    for d in (stale, young):
        _os.makedirs(d)
    old = _time.time() - 2 * sim.CODEBOOK_GC_GRACE_SECONDS
    _os.utime(stale, (old, old))
    # "restart": the resolution must go through the disk-load path
    sim.invalidate_fit_memos()
    loaded = sim.fit_or_load_ivf_centroids(
        spark.read.parquet(p), cb_path, n_centroids=3, min_fit_rows=2
    ).collect()
    assert {r.centroid_id: list(r.centroid) for r in loaded} == {
        r.centroid_id: list(r.centroid) for r in fresh
    }
    assert not _os.path.exists(stale), "stale orphan survived the load GC"
    assert _os.path.exists(young), "young dir must ride the grace shield"
    assert _os.path.exists(_os.path.join(cb_path, referenced))
    # and the load really was a load, not a refit: meta still names the
    # original token dir
    with open(_os.path.join(cb_path, "meta.json")) as f:
        assert _json.load(f)["data"] == referenced


def test_codebook_arrow_fallback_warns_once(spark, monkeypatch, caplog):
    """VERDICT r8 #6: if the Arrow local-relation path ever regresses,
    the RDD-backed fallback must be OBSERVABLE — one WARNING per
    process (not per call), same contract as the capture tier's diff
    fallback — and still produce the correct codebook."""
    import logging as _logging

    import pyarrow

    def boom(*a, **k):
        raise RuntimeError("injected arrow failure")

    monkeypatch.setattr(pyarrow, "table", boom)
    monkeypatch.setattr(sim, "_ARROW_FALLBACK_LOGGED", False)
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    with caplog.at_level(
        _logging.WARNING,
        logger="durable_functions_cosmosdb_etl_spark.operators.similarity",
    ):
        got1 = sorted(
            (r.centroid_id, [float(x) for x in r.centroid])
            for r in sim._codebook_df(spark, rows).collect()
        )
        got2 = sorted(
            (r.centroid_id, [float(x) for x in r.centroid])
            for r in sim._codebook_df(spark, rows).collect()
        )
    assert got1 == got2 == [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    warned = [
        r for r in caplog.records if "RDD-backed" in r.getMessage()
    ]
    assert len(warned) == 1, "fallback warning must fire exactly once"
    assert "injected arrow failure" in warned[0].getMessage()


def test_codebook_gc_spares_dir_of_current_meta_even_if_stale_keep(tmp_path):
    """Code-review r9: the GC re-reads meta.json itself, so a caller
    whose keep set predates a racing persist's publish (loader read
    meta->D_old, racer published meta->D_new, loader's collect stalled
    past the grace) can NEVER reclaim the dir the current meta
    references — that dir is the one every subsequent reader
    validates."""
    import json as _json
    import os as _os
    import time as _time

    cb = tmp_path / "codebook"
    cb.mkdir()
    d_old = cb / "centroids-oldloader.parquet"
    d_new = cb / "centroids-newwinner.parquet"
    orphan = cb / "centroids-trueorphan.parquet"
    for d in (d_old, d_new, orphan):
        d.mkdir()
        old = _time.time() - 2 * sim.CODEBOOK_GC_GRACE_SECONDS
        _os.utime(d, (old, old))
    meta = cb / "meta.json"
    meta.write_text(_json.dumps({"data": d_new.name}))
    # the loader's stale keep set names only d_old
    sim._gc_codebook_dirs(str(cb), str(meta), {d_old.name})
    assert d_old.exists(), "caller's keep set must be honored"
    assert d_new.exists(), "current meta's dir must survive a stale keep"
    assert not orphan.exists(), "true orphan past the grace is reclaimed"


def test_assign_rows_fast_path_matches_collect_path(spark):
    """r14 serving refactor: assign_to_centroids with pre-collected
    codebook rows (``_rows``) is identical to the DataFrame-collect path
    — including the edge tiers (zero-norm, ties, NaN) and the degenerate
    empty codebook."""
    from durable_functions_cosmosdb_etl_spark.operators.similarity import (
        assign_to_centroids,
    )

    corpus = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),
            (1, [1.0, 0.0, 0.0]),
            (2, [0.3, 0.3, 0.9]),
            (3, [float("nan"), 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    cb = spark.createDataFrame(rows, "centroid_id int, centroid array<float>")
    via_df = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_to_centroids(corpus, cb).collect()
    }
    via_rows = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_to_centroids(corpus, None, _rows=rows).collect()
    }
    assert via_rows == via_df
    assert assign_to_centroids(corpus, None, _rows=[]).count() == 0
