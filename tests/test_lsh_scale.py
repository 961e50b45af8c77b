"""LSH scale-parameterization audits: the banded RHP paths must generate
candidate pairs LINEAR in N under the lsh_band_bits sizing rule, with
bucket occupancy matching the rule's 2^10-rows/bucket model -- otherwise
the "scale path" silently degenerates to the crossJoin it replaces."""

from pyspark.sql import functions as F

import pytest

from closure_html_spark.spark.relational import (
    _parquet_n_rows,
    _rhp_bands,
    connected_components,
    ivf_n_cells,
    lsh_band_bits,
)


def test_connected_components(spark):
    """Min-label propagation: correct components on a multi-component
    graph, and a LOUD failure (not a silent wrong clustering) when a
    component's diameter exceeds max_iter."""
    # two components: a triangle {0,1,2} and a chain {10..13}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (12, 13)],
        "a_id long, b_id long")
    got = {(r["id"], r["label"])
           for r in connected_components(pairs).collect()}
    assert got == {(0, 0), (1, 0), (2, 0),
                   (10, 10), (11, 10), (12, 10), (13, 10)}
    # a 30-edge path has diameter 30: propagation cannot finish in 5
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=5)
    full = connected_components(chain, max_iter=40).collect()
    assert {r["label"] for r in full} == {0}


def test_ivf_n_cells_sizing_rule():
    # ~sqrt(N) cells: occupancy sqrt(N) => probe cost n_probe*sqrt(N),
    # sublinear in N; floor for toy corpora, broadcast-bounded cap
    assert ivf_n_cells(0) == 16
    assert ivf_n_cells(500) == 22
    assert ivf_n_cells(10**6) == 1000
    assert ivf_n_cells(10**9) == 31623
    assert ivf_n_cells(10**12) == 1 << 16  # capped: 32 MB centroid bcast
    for n in (10**6, 10**8, 10**10):
        c = ivf_n_cells(n)
        occupancy = n / c
        # probes touch n_probe * occupancy rows -- must vanish vs N
        assert 4 * occupancy / n < 1e-2


def test_parquet_n_rows_matches_table(spark, sf_dir):
    """The footer-statistics N (used by the self-sizing ANN queries so no
    hidden count() job runs) must equal the true row count."""
    n_meta = _parquet_n_rows(sf_dir, "embeddings")
    n_true = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert n_meta == n_true
    assert _parquet_n_rows(sf_dir, "no_such_table") is None


def test_lsh_band_bits_sizing_rule():
    # floor at small N (the sf-scale fixtures), log growth, compile-bound cap
    assert lsh_band_bits(0) == 4
    assert lsh_band_bits(500) == 4
    assert lsh_band_bits(10**6) == 10
    assert lsh_band_bits(10**9) == 20
    assert lsh_band_bits(10**12) == 20  # capped: see docstring
    # the rule keeps expected occupancy ~2^10, so the analytic candidate
    # ratio n_bands * occupancy / N vanishes as N grows
    for n in (10**7, 10**8, 10**9):
        bb = lsh_band_bits(n)
        occupancy = n / 2**bb
        assert occupancy <= 2**10
        assert 8 * occupancy / n < 1e-3, "candidates not << N^2"


def test_lsh_bucket_occupancy_and_candidate_count(spark):
    """Empirical check at a synthetic N: observed bucket occupancy and the
    implied candidate-pair count must match the sizing model (no hidden
    skew: RHP over random vectors should fill buckets near-uniformly)."""
    N, n_bands = 20_000, 8
    bb = lsh_band_bits(N)
    assert bb == 5
    emb = F.array(*[F.rand(seed=i) - F.lit(0.5) for i in range(64)])
    df = spark.range(N).select(F.col("id").alias("vec_id"),
                               emb.alias("embedding"))
    banded = df.select(
        F.explode(_rhp_bands(F.col("embedding"), bb, n_bands)).alias("bk"))
    occ = (banded.groupBy("bk")
           .agg(F.count(F.lit(1)).alias("c"))
           .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
                F.max("c").alias("max_c"),
                F.count(F.lit(1)).alias("n_buckets"))
           .collect()[0])
    expected_occupancy = N / 2**bb
    # candidate pairs ~ n_bands * N * occupancy / 2 (linear-in-N model);
    # x3 slack for bucket imbalance of random projections
    model = n_bands * N * expected_occupancy / 2
    assert occ["pairs"] <= 3 * model, \
        f"candidates {occ['pairs']} blow the occupancy model {model}"
    # no degenerate hot bucket (skew would resurrect the N^2 join)
    assert occ["max_c"] <= 8 * expected_occupancy
    # and the model itself is far below all-pairs at this N
    assert occ["pairs"] < 0.5 * N * (N - 1) / 2


def test_lsh_hot_bucket_guard(spark, tmp_path):
    """Degenerate skew fixture: every vector IDENTICAL, so the whole table
    lands in ONE (band, val) bucket per band and the uncapped self-join is
    the full clique C(N,2) -- exactly the within-bucket N^2 the sizing
    rule cannot prevent.  max_bucket keeps the lowest-vec_id max_bucket
    members per bucket; identical vectors keep the SAME members in every
    band, so the result (all pairs at sim 1.0 >= threshold) is exactly
    C(max_bucket, 2): bounded, deterministic, and the mega-cluster keeps
    its kept-member core."""
    from closure_html_spark.spark import relational as R
    N, cap = 400, 30
    df = spark.range(N).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.37)] * 64).cast("array<float>").alias("embedding"))
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    capped = R.q_embedding_neardup_lsh(
        spark, str(tmp_path), band_bits=4, max_bucket=cap).count()
    assert capped == cap * (cap - 1) // 2
    uncapped = R.q_embedding_neardup_lsh(
        spark, str(tmp_path), band_bits=4, max_bucket=None).count()
    assert uncapped == N * (N - 1) // 2, "skew fixture lost its hot bucket"


def test_minhash_hot_bucket_guard(spark, tmp_path):
    """MinHash twin of test_lsh_hot_bucket_guard: a mega-dup cluster of
    byte-identical documents has ONE signature, so every band bucket holds
    the whole corpus and the uncapped band self-join is C(N,2) -- the
    within-bucket N^2 that banding cannot prevent.  max_bucket keeps the
    lowest-doc_id members; identical docs keep the SAME members in every
    band, so the estimated pairs (est_jaccard 1.0 >= threshold) are
    exactly C(cap,2) and the cluster keeps its kept-member core."""
    from closure_html_spark.spark import relational as R
    N, cap = 400, 30
    df = spark.range(N).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate error page text").alias("text"))
    df.write.parquet(str(tmp_path / "documents.parquet"))
    capped = R.q_minhash_est_pairs(
        spark, str(tmp_path), max_bucket=cap).count()
    assert capped == cap * (cap - 1) // 2
    uncapped = R.q_minhash_est_pairs(
        spark, str(tmp_path), max_bucket=None).count()
    assert uncapped == N * (N - 1) // 2, "skew fixture lost its hot bucket"


def test_ivf_kmeans_refinement_improves_recall(spark):
    """Lloyd refinement of the deterministic-sample IVF centroids must not
    lose recall at equal n_probe on the pinned corpus -- and on this
    corpus it strictly gains (0.533 -> 0.733 @ k=5, measured when the
    feature landed).  The gate itself pins kmeans_iters=0 so the DuckDB
    oracle replays the index bit-for-bit; this test owns the refined
    path."""
    from closure_html_spark.spark import relational as R
    SF = "/root/testdata/sf0.001"
    exact = {(r["q_id"], r["vec_id"])
             for r in R.q_ann_cosine_topk(spark, SF, k=5).collect()}
    base = {(r["q_id"], r["vec_id"])
            for r in R.q_ann_ivf_topk(spark, SF, k=5,
                                      kmeans_iters=0).collect()}
    refined = {(r["q_id"], r["vec_id"])
               for r in R.q_ann_ivf_topk(spark, SF, k=5,
                                         kmeans_iters=2).collect()}
    r0 = len(base & exact) / len(exact)
    r2 = len(refined & exact) / len(exact)
    assert r2 >= r0, f"refinement lost recall: {r2} < {r0}"
    assert r2 > 0.6, f"refined recall collapsed: {r2}"


def test_pq_encode_properties(spark):
    """Product-quantization audit (q_pq_encode): (a) a vector that IS a
    sub-centroid donor reconstructs itself exactly (qerr == 0 on every
    subspace); (b) every emitted code is a real centroid id; (c) round-8
    shape: the bounded codebook rides the numpy kernel's closure --
    embeddings stream through ONE MapInArrow pass with no join and no
    hash exchange at all (the r7 shape was a broadcast crossJoin + one
    groupBy argmin pass; the argmin is now an array_min projection)."""
    from closure_html_spark.spark import relational as R
    SF = "/root/testdata/sf0.001"
    df = R.q_pq_encode(spark, SF)
    rows = df.collect()
    n = R._parquet_n_rows(SF, "embeddings")
    assert len(rows) == n
    import math
    step = max(1, math.ceil(n / 16))
    cent_ids = {i for i in range(0, n, step)}
    code_cols = [c for c in df.columns if c.startswith("code")]
    assert len(code_cols) == 8
    for r in rows:
        for c in code_cols:
            assert r[c] in cent_ids, f"code {r[c]} not a centroid id"
    by_id = {r["vec_id"]: r for r in rows}
    for cid in cent_ids:
        r = by_id[cid]
        assert r["qerr"] == 0.0, f"centroid {cid} qerr {r['qerr']}"
        assert all(r[c] == cid for c in code_cols), \
            f"centroid {cid} codes {[r[c] for c in code_cols]}"
    # AQE toString prints Final + Initial sections; audit the final one
    plan = df._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    # the encode is a pure map (numpy kernel + array_min projection,
    # materialized once before the oracle orderBy): the visible plan is a
    # sort over the checkpointed RDD -- no join of the codebook, no hash
    # exchange anywhere (the r7 shape was a broadcast crossJoin + a
    # groupBy argmin exchange)
    assert "MapInArrow" in plan or "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan and "Join" not in plan, \
        "codebook must ride the kernel closure, not a join"
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_ann_pq_adc_and_rerank(spark):
    """ADC search audit (q_ann_pq_topk): (a) plain ADC hashes against
    its DuckDB oracle (covered by the aux replay; here we pin shape);
    (b) rerank=R recall@5 vs exact L2 equals the shortlist's
    containment of the exact top-5 and is monotonically >= plain ADC
    recall; (c) the LUT rides a broadcast (no shuffle of the codes
    side before the top-k window)."""
    import duckdb
    from closure_html_spark.spark import relational as R
    SF = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    exact = set(map(tuple, con.execute("""
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb
           FROM embeddings WHERE vec_id < 3),
s AS (SELECT q.q_id, e.vec_id,
        list_dot_product(q.q_emb, q.q_emb)
        - 2*list_dot_product(q.q_emb, e.embedding::DOUBLE[])
        + list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])
          AS d
      FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id),
r AS (SELECT q_id, vec_id,
        ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY d, vec_id) rnk
      FROM s)
SELECT q_id, vec_id FROM r WHERE rnk <= 5""").fetchall()))
    plain = R.q_ann_pq_topk(spark, SF, k=5)
    got_plain = {(r["q_id"], r["vec_id"]) for r in plain.collect()}
    rr = {(r["q_id"], r["vec_id"])
          for r in R.q_ann_pq_topk(spark, SF, k=5, rerank=100).collect()}
    rec_plain = len(got_plain & exact) / len(exact)
    rec_rr = len(rr & exact) / len(exact)
    assert rec_rr >= rec_plain, (rec_rr, rec_plain)
    # measured on the pinned corpus (docstring HONEST LIMIT numbers):
    # random embeddings are PQ's adversarial case, but rerank=100 must
    # stay at its measured 0.73 containment on this fixed input
    assert rec_rr >= 0.7, rec_rr
    plan = plain._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan, "LUT join not broadcast"


def test_pq_persisted_index_matches_inline(spark, tmp_path):
    """build_pq_index + q_ann_pq_index_topk must reproduce the inline
    q_ann_pq_topk EXACTLY (both plain ADC and the rerank tail) -- the
    encode-once/search-many serving flow cannot drift from the gated
    inline path."""
    from closure_html_spark.spark import relational as R
    SF = "/root/testdata/sf0.001"
    idx = R.build_pq_index(spark, SF, str(tmp_path / "pq_index"))
    for rerank in (None, 50):
        inline = [tuple(r) for r in
                  R.q_ann_pq_topk(spark, SF, k=5, rerank=rerank).collect()]
        from_idx = [tuple(r) for r in
                    R.q_ann_pq_index_topk(spark, idx, SF, k=5,
                                          rerank=rerank).collect()]
        assert inline == from_idx, rerank


def test_ivfadc_candidate_pruning(spark):
    """IVFADC audit: the scored candidate set must be exactly the probed
    cells' population (minus self) -- i.e. the coarse quantizer really
    prunes, no silent fallback to a full scan -- and the top-k is the
    ADC ranking restricted to those candidates."""
    import duckdb
    from closure_html_spark.spark import relational as R
    SF = "/root/testdata/sf0.001"
    n = R._parquet_n_rows(SF, "embeddings")
    got = R.q_ann_ivfadc_topk(spark, SF, k=5, n_probe=4).collect()
    assert len(got) == 15
    # per-query candidate count from the oracle's cand CTE: strictly
    # sublinear (4 of 16 cells ~= 25% of the corpus at this toy scale)
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{SF}/embeddings.parquet')")
    sql = R.ORACLE_ANN_IVFADC
    cand_sql = sql[:sql.index("pqstep")].rstrip().rstrip(",") + \
        "\nSELECT q_id, COUNT(*) AS n FROM cand GROUP BY q_id"
    for q_id, n_cand in con.execute(cand_sql).fetchall():
        assert 0 < n_cand < 0.6 * n, (q_id, n_cand, n)
    # the ADC scores of the returned rows agree with the plain-ADC
    # ranking restricted to the candidate set (same LUT conventions)
    full = {(r["q_id"], r["vec_id"]): r["adist"]
            for r in R.q_ann_pq_topk(spark, SF, k=n).collect()}
    for r in got:
        key = (r["q_id"], r["vec_id"])
        assert key in full and full[key] == r["adist"], key
