"""In-memory 10x scale-up sanity: replicate lineitem sf0.001 ten times
with shifted keys and verify aggregation/join results scale exactly —
catches anything whose correctness quietly depends on data volume or
partition layout (run at test scale so CI stays fast; bench covers
larger volumes)."""

from pyspark.sql import functions as F

from spear_spark.sources import load_table

from tests.scaleup_harness import (
    ID_SHIFT,
    attach_base_column,
    replicate_docs,
    replicate_embeddings,
)


def test_aggregates_scale_linearly(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    li10 = li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    base = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
    ).collect()[0]
    big = li10.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("q"),
    ).collect()[0]
    assert big.n == 10 * base.n
    assert big.q == 10 * base.q


def test_join_cardinality_scales(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    li10 = li.withColumn("rep", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    base = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    big = li10.join(orders, li10.l_orderkey == orders.o_orderkey).count()
    assert big == 10 * base


def test_exact_dedup_scales_linearly(spark, sf_dir):
    """10 perturbed replicas -> exactly 10x the keep decisions: exact-dup
    groups are replica-local by construction, so the hash-groupBy path
    must not merge or drop groups across the id-shifted copies."""
    from spear_spark.operators.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = exact_dedup(docs, "text", "doc_id").count()
    big = exact_dedup(replicate_docs(docs, 10), "text", "doc_id").count()
    assert big == 10 * base


def test_simhash_pairs_scale_at_least_linearly(spark, sf_dir):
    """Each rotated replica reproduces its internal near-pair set
    (token hashes differ but the distinct-token voting structure is
    isomorphic only per replica — pair membership within a replica can
    shift since SimHash depends on hash values, so the exact invariant
    is on the UNROTATED replica; here we assert the banding never
    loses the identity replica's pairs and the total stays >= the sum
    of replica-local near-pair sets minus cross-replica chance
    collisions, i.e. >= the identity replica's count)."""
    from spear_spark.operators.dedup import simhash_near_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base_pairs = simhash_near_pairs(docs, "text", "doc_id", max_hamming=3).count()
    big = replicate_docs(docs, 10)
    big_pairs_df = simhash_near_pairs(big, "text", "doc_id", max_hamming=3)
    # the rep-0 copy is byte-identical to the base corpus, so its pairs
    # must survive verbatim inside the 10x run (banding loses nothing
    # when the fingerprint space gets 10x denser)
    rep0 = big_pairs_df.filter(
        (F.col("doc_a") < 10_000_000) & (F.col("doc_b") < 10_000_000)
    ).count()
    assert rep0 == base_pairs


def test_jaccard_pairs_scale_exactly_linearly(spark, sf_dir):
    """Alphabet rotation keeps every replica's shingle sets isomorphic
    and per-replica document frequencies unchanged, and shingles never
    collide across replicas — so the capped inverted index must return
    EXACTLY 10x the base pair set (same jaccard values, ids shifted)."""
    from spear_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = ngram_jaccard_pairs(docs, "text", "doc_id", max_df=64).count()
    big = ngram_jaccard_pairs(
        replicate_docs(docs, 10), "text", "doc_id", max_df=64
    ).count()
    assert big == 10 * base


def test_df_cap_binds_under_replication(spark, sf_dir):
    """NEAR-IDENTICAL replication (append one token — deliberately NOT
    the rotation scheme) multiplies every shingle's document frequency
    by 10, pushing common shingles over a cap that was slack at 1x —
    the capped inverted index must still complete with a bounded pair
    space (every pair needs >= 1 surviving shared shingle, and
    survivors have df <= cap, so pairs <= n_shingles * C(cap, 2))."""
    from spear_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzrep"), F.col("rep").cast("string")).alias(
            "text"
        ),
    )
    cap = 8
    pairs = ngram_jaccard_pairs(big, "text", "doc_id", max_df=cap)
    n_pairs = pairs.count()
    distinct_shingles = (
        big.select(F.explode(F.expr(
            "transform(sequence(1, greatest(size(split(lower(trim(text)), '\\\\s+')) - 2, 0)),"
            " i -> concat_ws(' ', slice(split(lower(trim(text)), '\\\\s+'), i, 3)))"
        )).alias("s")).distinct().count()
    )
    assert n_pairs <= distinct_shingles * cap * (cap - 1) // 2


def test_cm_heavy_hitters_scale_invariant(spark, sf_dir):
    """10 identical-text replicas (ids shifted): every token count is
    exactly 10x, so with a 10x threshold the heavy-hitter SET and the
    per-token (est, exact) pairs must all scale exactly 10x — the
    sketch is linear in its input and the one-sided error structure
    does not depend on volume."""
    from spear_spark.operators.sketch import cm_heavy_hitters

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text")
    base = {
        r.tok: (r.est, r.exact)
        for r in cm_heavy_hitters(docs, "text", min_count=100).collect()
    }
    big = {
        r.tok: (r.est, r.exact)
        for r in cm_heavy_hitters(docs10, "text", min_count=1000).collect()
    }
    assert set(big) == set(base)
    for tok, (est, exact) in base.items():
        assert big[tok] == (10 * est, 10 * exact)


def test_interval_overlap_scales_linearly(spark, sf_dir):
    """Replicas with disjoint user-id ranges cannot pair across
    replicas, so the overlap-pair count must be exactly 10x — catches
    any bucket arithmetic that would leak pairs between key spaces."""
    from spear_spark.operators.rangejoin import interval_overlap_join

    ev = load_table(spark, sf_dir, "events")
    base_iv = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(3_600_000_000)).alias("e"),
        "event_type",
    )
    a = base_iv.filter(F.col("event_type") == "error")
    b = base_iv.filter(F.col("event_type") == "purchase")

    def rep10(df):
        return df.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
        ).select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
            "s",
            "e",
        )

    kw = dict(key="user_id", start="s", end="e", id_col="event_id",
              bucket_width=3_600_000_000)
    base_n = interval_overlap_join(a, b, **kw).count()
    big_n = interval_overlap_join(rep10(a), rep10(b), **kw).count()
    assert big_n == 10 * base_n


def test_global_row_numbers_scale(spark, sf_dir):
    """Ids stay dense and contiguous at 10x: the bucket offsets must
    compose correctly whatever the key range looks like."""
    from spear_spark.operators.ids import global_row_numbers

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select((F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"))
    n = docs10.count()
    out = global_row_numbers(spark, docs10, "doc_id")
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("global_id").alias("mn"),
        F.max("global_id").alias("mx"),
        F.count_distinct("global_id").alias("d"),
    ).collect()[0]
    assert (stats.n, stats.mn, stats.mx, stats.d) == (n, 1, n, n)


def test_segment_dedup_scales_linearly(spark, sf_dir):
    """Rotated replicas share no segments, so per-replica keep/drop
    structure must replicate exactly: total kept segments = 10x base.
    Catches any first-occurrence logic that quietly depends on global
    ordering or partition count rather than (id, pos)."""
    from spear_spark.operators.dedup import segment_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = segment_dedup(docs, "text", "doc_id").agg(
        F.sum("n_kept").alias("k"), F.sum("n_segments").alias("s")
    ).collect()[0]
    big = segment_dedup(replicate_docs(docs, 10), "text", "doc_id").agg(
        F.sum("n_kept").alias("k"), F.sum("n_segments").alias("s")
    ).collect()[0]
    assert big.s == 10 * base.s
    assert big.k == 10 * base.k


def test_cdc_state_scales_linearly(spark, sf_dir):
    """10 key-shifted replicas of the changelog -> exactly 10x the live
    state rows: the max_by compaction must stay per-key regardless of
    volume, and tombstone filtering must not leak across shifted keys."""
    from spear_spark.operators.cdc import cdc_latest_state

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    ev10 = ev.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        (F.col("user_id") + F.col("rep") * F.lit(10_000_000)).alias("user_id"),
        "ts",
        (F.col("event_id") + F.col("rep") * F.lit(100_000_000)).alias("event_id"),
        "event_type", "value",
    )
    args = dict(
        key_cols=["user_id"], order_cols=["ts", "event_id"],
        payload_cols=["event_type", "value"],
    )
    base = cdc_latest_state(ev, delete_expr=F.col("event_type") == "error", **args).count()
    big = cdc_latest_state(ev10, delete_expr=F.col("event_type") == "error", **args).count()
    assert big == 10 * base


def test_kmeans_step_counts_scale_linearly(spark, sf_dir):
    """Replicating every vector 10x must multiply each cell's
    n_assigned by exactly 10 and leave the recomputed centroids
    unchanged (the mean is replication-invariant) — catches any
    assignment or averaging step sensitive to data volume."""
    from spear_spark.operators.similarity import kmeans_lloyd_step

    emb = load_table(spark, sf_dir, "embeddings")
    cents = [
        list(map(float, r["embedding"]))
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    emb10 = emb.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    )
    base = {r["cell"]: r for r in kmeans_lloyd_step(emb, "embedding", cents).collect()}
    big = {r["cell"]: r for r in kmeans_lloyd_step(emb10, "embedding", cents).collect()}
    assert set(base) == set(big)
    for cell, b in base.items():
        assert big[cell]["n_assigned"] == 10 * b["n_assigned"]
        assert big[cell]["centroid"] == b["centroid"]


def test_surprisal_shifts_by_log2_reps_under_replication(spark, sf_dir):
    """Exact scale law: under 10 rotated replicas every token's corpus
    probability divides by 10 (replicas share no tokens, per-replica
    counts are preserved), so every doc's surprisal must rise by
    EXACTLY log2(10) bits — any deviation means the corpus counts or
    the per-doc aggregation leaked across replicas."""
    import math

    from spear_spark.operators.relevance import corpus_surprisal

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {
        r["doc_id"]: r["surprisal_bits"]
        for r in corpus_surprisal(docs, "text", "doc_id").collect()
    }
    big = {
        r["doc_id"]: r["surprisal_bits"]
        for r in corpus_surprisal(replicate_docs(docs, 10), "text", "doc_id").collect()
    }
    shift = math.log2(10)
    for doc_id, s in base.items():  # replica 0 keeps original ids
        assert abs(big[doc_id] - s - shift) < 2e-6, doc_id


def test_balanced_shards_balance_holds_at_10x(spark, sf_dir):
    """The LPT guarantee (per-shard totals within one max item) is
    volume-independent: it must hold identically on 10 id-shifted
    replicas of the corpus."""
    from spear_spark.operators.ids import balanced_shards

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
        "n_chars",
    )
    out = balanced_shards(spark, docs10, "doc_id", "n_chars", n_shards=8)
    totals = {
        r["shard"]: r["t"]
        for r in out.groupBy("shard").agg(F.sum("n_chars").alias("t")).collect()
    }
    mx_item = docs10.agg(F.max("n_chars")).collect()[0][0]
    assert len(totals) == 8
    assert max(totals.values()) - min(totals.values()) <= mx_item


def test_cdc_compaction_exchange_stays_keys_sized_under_skew(spark):
    """Adversarial skew: ONE hot key carrying 1e5 versions among 19
    cold keys.  The max_by formulation must (a) still produce exactly
    one winning row per live key with the max-order payload, and
    (b) collapse map-side so the aggregation exchange carries
    ~keys x partitions records, NOT the 100k-row change history —
    the row_number()-window formulation would ship every version of
    the hot key to one reducer."""
    from spear_spark.operators.cdc import cdc_latest_state
    from spear_spark.plans import exchange_record_counts

    n_hot = 100_000
    hot = spark.range(n_hot).select(
        F.lit(0).alias("k"), F.col("id").alias("v"), F.col("id").alias("p")
    )
    cold = spark.range(1, 20).select(
        F.col("id").alias("k"), F.lit(1).alias("v"), F.lit(7).alias("p")
    )
    changes = hot.unionByName(cold).repartition(32)
    out = cdc_latest_state(
        changes, ["k"], ["v"], ["p"], delete_expr=F.col("p") == F.lit(7)
    )
    rows = {r["k"]: (r["v"], r["p"]) for r in out.collect()}
    # cold keys' latest change is a delete (p=7) -> tombstoned away
    assert rows == {0: (n_hot - 1, n_hot - 1)}

    counts = exchange_record_counts(out, run=False)
    agg_exchange = counts[-1]  # the groupBy exchange is the last one
    assert agg_exchange < 20 * 32  # keys x input partitions bound
    assert agg_exchange < n_hot / 50  # and nowhere near the history


def test_winsorized_stats_replication_invariant(spark, sf_dir):
    """10x replication leaves quantiles/means unchanged and multiplies
    clamp counts exactly — catches volume-sensitive interpolation."""
    from spear_spark.operators.stats import winsorized_stats

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).drop("rep")
    base = {r["source"]: r for r in winsorized_stats(docs, "n_chars", ["source"]).collect()}
    big = {r["source"]: r for r in winsorized_stats(docs10, "n_chars", ["source"]).collect()}
    assert set(base) == set(big)
    for s, b in base.items():
        g = big[s]
        assert g["n_rows"] == 10 * b["n_rows"]
        assert g["mean_raw"] == b["mean_raw"]
        # R-7 interpolation ranks shift under replication ((n-1)p vs
        # (10n-1)p) and duplicate values sit exactly at the boundary,
        # so clamp COUNTS aren't exactly 10x.  The invariant that
        # matters at scale: clamping stays TAIL-sized (≤ ~2x the tail
        # probability plus one boundary tie group) at every volume —
        # winsorization must never start swallowing the body.
        for side, tail in (("n_clamped_lo", 0.05), ("n_clamped_hi", 0.05)):
            assert g[side] / g["n_rows"] <= 2 * tail + 1.0 / b["n_rows"]
        assert g["q_lo"] <= g["q_hi"]
        assert g["mean_winsor"] <= g["mean_raw"] + abs(g["q_hi"])  # sane scale


def test_bpe_pair_counts_scale_exactly_linearly(spark, sf_dir):
    """Replicating the corpus 10x multiplies every pair count by 10
    and preserves the (count desc, pair) ranking order."""
    from spear_spark.operators.text import bpe_pair_counts

    docs = load_table(spark, sf_dir, "documents").select("text")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).drop("rep")
    base = [(r["pair"], r["cnt"]) for r in bpe_pair_counts(docs, "text").collect()]
    big = [(r["pair"], r["cnt"]) for r in bpe_pair_counts(docs10, "text").collect()]
    assert big == [(p, 10 * c) for p, c in base]


def test_exchange_record_counts_run_path_populates_metrics(spark):
    """Guard against the count()-derived-execution trap: run=True must
    return real (nonzero) exchange metrics for a query that shuffles."""
    from spear_spark.plans import exchange_record_counts

    df = spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
    counts = exchange_record_counts(df, run=True)
    assert counts and all(c > 0 for c in counts)


def test_mix_reweight_replication_invariant(spark, sf_dir):
    """10x replication leaves every share and keep-rate unchanged and
    multiplies counts/expected rows exactly — the closed-form rate is
    a function of the MIX, not the volume."""
    from spear_spark.operators.sampling import mix_reweight

    docs = load_table(spark, sf_dir, "documents").select("source")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).drop("rep")
    targets = {f"src{i}": 0.05 for i in range(20)}
    base = {r["source"]: r for r in mix_reweight(docs, "source", targets).collect()}
    big = {r["source"]: r for r in mix_reweight(docs10, "source", targets).collect()}
    assert set(base) == set(big)
    for s, b in base.items():
        g = big[s]
        assert g["n_rows"] == 10 * b["n_rows"]
        assert g["actual_share"] == b["actual_share"]
        assert g["keep_rate"] == b["keep_rate"]
        assert g["expected_rows"] == 10 * b["expected_rows"]


def test_event_funnel_scales_with_user_replication(spark, sf_dir):
    """Replicating every user's event history under shifted user ids
    multiplies every funnel stage count by exactly 10 and leaves the
    conversion rate unchanged — the per-user windows must not leak
    across the disjoint id ranges."""
    from spear_spark.relational import QUERIES as REL

    base = REL["q79_event_funnel"][0](spark, sf_dir).collect()[0]

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    ev10 = ev.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        (F.col("user_id") + F.col("rep") * F.lit(10_000_000)).alias("user_id"),
        "ts", "event_type",
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id")
    t = F.col("event_type")
    e1 = ev10.withColumn("t_view", F.min(F.when(t == "view", F.col("ts"))).over(w))
    e2 = e1.withColumn(
        "t_click",
        F.min(F.when((t == "click") & (F.col("ts") > F.col("t_view")), F.col("ts"))).over(w),
    )
    e3 = e2.withColumn(
        "t_buy",
        F.min(F.when((t == "purchase") & (F.col("ts") > F.col("t_click")), F.col("ts"))).over(w),
    )
    pu = e3.groupBy("user_id").agg(
        F.max("t_view").alias("tv"), F.max("t_click").alias("tc"), F.max("t_buy").alias("tb")
    )
    big = pu.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("tv").alias("n_view"),
        F.count("tc").alias("n_click_after_view"),
        F.count("tb").alias("n_purchase_after_click"),
    ).collect()[0]
    assert big["n_users"] == 10 * base["n_users"]
    assert big["n_view"] == 10 * base["n_view"]
    assert big["n_click_after_view"] == 10 * base["n_click_after_view"]
    assert big["n_purchase_after_click"] == 10 * base["n_purchase_after_click"]


def test_centroid_shift_replication_invariant(spark, sf_dir):
    """Replicating every vector under EVEN id shifts preserves each
    id's parity, so the even/odd split sees 10 identical copies per
    side — the per-label centroid shift must be bit-identical and the
    side counts exactly 10x."""
    from spear_spark.operators.similarity import centroid_shift

    emb = load_table(spark, sf_dir, "embeddings")
    emb10 = emb.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        (F.col("vec_id") + F.col("rep") * F.lit(20_000_000)).alias("vec_id"),
        "embedding", "label",
    )
    split = F.col("vec_id") % 2 == 1
    base = {r["label"]: r for r in
            centroid_shift(emb, "embedding", "label", split).collect()}
    big = {r["label"]: r for r in
           centroid_shift(emb10, "embedding", "label", split).collect()}
    assert set(base) == set(big)
    for lbl, b in base.items():
        g = big[lbl]
        assert g["n_a"] == 10 * b["n_a"] and g["n_b"] == 10 * b["n_b"]
        assert g["l2_shift"] == b["l2_shift"]


def test_histogram_quantiles_replication_invariant(spark, sf_dir):
    """10x replication leaves every histogram quantile estimate
    unchanged (type-1 rank scales with n, bins are volume-free) and
    multiplies n_rows exactly — the estimate is a function of the
    DISTRIBUTION, not the volume."""
    from spear_spark.operators.stats import histogram_quantiles

    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).drop("rep")
    args = ("n_chars", "source", (0.5, 0.9, 0.99), 0.0, 640.0, 64)
    base = {(r["source"], r["q"]): r for r in histogram_quantiles(docs, *args).collect()}
    big = {(r["source"], r["q"]): r for r in histogram_quantiles(docs10, *args).collect()}
    assert set(base) == set(big)
    for k, b in base.items():
        g = big[k]
        assert g["est"] == b["est"]
        assert g["n_rows"] == 10 * b["n_rows"]


def test_bloom_filter_replication_invariant(spark, sf_dir):
    """10x replication leaves the Bloom bit array IDENTICAL (the
    filter is a pure function of the distinct key set) — and the
    decontamination survivor set scales exactly 10x."""
    from spear_spark.operators.dedup import bloom_build, bloom_decontaminate

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    docs10 = docs.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    )
    deny = docs.filter(F.col("source") == "src0").select("text")
    deny10 = docs10.filter(F.col("source") == "src0").select("text")
    n_bits, k = 1 << 14, 4
    a = sorted(map(tuple, bloom_build(deny, "text", n_bits, k).collect()))
    b = sorted(map(tuple, bloom_build(deny10, "text", n_bits, k).collect()))
    assert a == b and len(a) > 1
    kept = bloom_decontaminate(docs, "text", deny, "text", n_bits, k).count()
    kept10 = bloom_decontaminate(docs10, "text", deny10, "text", n_bits, k).count()
    assert kept10 == 10 * kept


def test_repeated_ngrams_self_union_saturates(spark, sf_dir):
    """Unioning the corpus with itself (fresh doc ids) makes EVERY
    n-gram corpus-duplicated, so n_dup == n_ngrams for every doc —
    the saturation limit of the Lee-et-al signal, and a 2× scale probe
    of the no-self-join window plan."""
    from pyspark.sql import functions as F

    from spear_spark.operators.dedup import repeated_ngram_profile
    from spear_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    rows = repeated_ngram_profile(doubled, "text", "doc_id").collect()
    assert rows and all(r.n_dup == r.n_ngrams and r.dup_frac == 1.0 for r in rows)


def test_cm_inner_product_scales_quadratically_under_duplication(spark, sf_dir):
    """Count-Min linearity through the inner product: duplicating every
    row doubles each (group, token) count, so every cell doubles and
    every pairwise inner product lands at EXACTLY 4x — the collision
    structure is identical (same tokens, same hashes), so this is an
    equality, not a bound.  The companion cosine (p96) is invariant
    under the same duplication (direction, not mass)."""
    from spear_spark.operators.relevance import group_lexical_cosine
    from spear_spark.operators.sketch import cm_inner_product_by, count_min_sketch_by

    docs = load_table(spark, sf_dir, "documents").select("source", "text").limit(200)
    doubled = docs.unionAll(docs)
    base = {(r.group_a, r.group_b): r.est_inner
            for r in cm_inner_product_by(
                count_min_sketch_by(docs, "source", "text"), "source").collect()}
    big = {(r.group_a, r.group_b): r.est_inner
           for r in cm_inner_product_by(
               count_min_sketch_by(doubled, "source", "text"), "source").collect()}
    assert set(base) == set(big)
    for k in base:
        assert big[k] == 4 * base[k], k
    cos_a = {(r.group_a, r.group_b): r.cos_sim
             for r in group_lexical_cosine(docs, "source", "text").collect()}
    cos_b = {(r.group_a, r.group_b): r.cos_sim
             for r in group_lexical_cosine(doubled, "source", "text").collect()}
    assert cos_a == cos_b


def test_max_dup_span_saturates_under_duplication(spark, sf_dir):
    """Duplicating the corpus makes EVERY gram corpus-repeated, so each
    doc with >= 1 gram must report exactly one island covering all its
    positions: max_dup_span == token_count, n_dup_spans == 1 — the
    saturation law that pins both the >= 2 rule and the island merge."""
    from spear_spark.operators.dedup import max_dup_span, repeated_ngram_profile
    from spear_spark.operators.text import tokens as tok_fn

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    spans = {r.doc_id: r for r in max_dup_span(doubled, "text", "doc_id").collect()}
    lens = {r.doc_id: r.n for r in
            doubled.select("doc_id", F.size(tok_fn("text")).alias("n")).collect()}
    grams = {r.doc_id: r.n_ngrams for r in
             repeated_ngram_profile(doubled, "text", "doc_id").collect()}
    assert set(spans) == set(grams)  # every doc with >= 1 gram saturates
    for d, r in spans.items():
        assert r.n_dup_spans == 1, d
        assert r.max_dup_span == lens[d] == grams[d] + 7, d


def test_novelty_profile_under_duplication(spark, sf_dir):
    """Appending an exact copy of the corpus under HIGHER ids leaves
    every original doc's novelty unchanged (the prefix it sees is
    identical) and gives every copy novelty 0 (nothing it contains is
    first-seen)."""
    from spear_spark.operators.dedup import ngram_novelty_profile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(80)
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    base = {r.doc_id: (r.n_novel, r.n_ngrams) for r in
            ngram_novelty_profile(docs, "text", "doc_id").collect()}
    big = {r.doc_id: (r.n_novel, r.n_ngrams) for r in
           ngram_novelty_profile(doubled, "text", "doc_id").collect()}
    for d, (novel, total) in base.items():
        assert big[d] == (novel, total), d
        assert big[d + 10_000_000] == (0, total), d


def test_jsd_invariant_under_corpus_duplication(spark, sf_dir):
    """Duplicating every document doubles every count and total, so
    each group's DISTRIBUTION — and therefore the whole JSD matrix —
    is exactly unchanged (the mass-vs-direction contrast with p93's
    CM inner product, which lands at 4x under the same duplication)."""
    from spear_spark.operators.relevance import group_js_divergence

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    doubled = docs.unionAll(docs)
    a = {(r.group_a, r.group_b): r.jsd
         for r in group_js_divergence(docs, "source", "text").collect()}
    b = {(r.group_a, r.group_b): r.jsd
         for r in group_js_divergence(doubled, "source", "text").collect()}
    assert a == b


def test_curriculum_order_invariant_under_score_translation(spark, sf_dir):
    """Shifting every difficulty score by a constant changes no rank,
    no stage, no position — the schedule depends on score ORDER only
    (the min-subtraction in the composite key makes this exact)."""
    from spear_spark.operators.ids import curriculum_order

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    shifted = docs.select(
        "doc_id", (F.col("n_chars") + 1000).alias("n_chars")
    )
    a = {(r.doc_id, r.stage, r.position)
         for r in curriculum_order(spark, docs, "doc_id", "n_chars").collect()}
    b = {(r.doc_id, r.stage, r.position)
         for r in curriculum_order(spark, shifted, "doc_id", "n_chars").collect()}
    assert a == b


def test_dup_cluster_profile_doubles_sizes_under_duplication(spark, sf_dir):
    """Appending an exact copy of the corpus under new ids merges each
    copy into its original's cluster (Jaccard 1) and adds no
    cross-cluster edges (pairwise Jaccards are unchanged), so the
    histogram maps size s → 2s with the SAME cluster counts."""
    from spear_spark.operators.dedup import dup_cluster_profile

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(150)
    doubled = docs.unionAll(
        docs.select((F.col("doc_id") + 10_000_000).alias("doc_id"), "text")
    )
    base = {r.cluster_size: r.n_clusters
            for r in dup_cluster_profile(docs, "text", "doc_id").collect()}
    big = {r.cluster_size: r.n_clusters
           for r in dup_cluster_profile(doubled, "text", "doc_id").collect()}
    assert big == {2 * s: n for s, n in base.items()}


def test_jaccard_df_cap_neutralizes_boilerplate_skew(spark):
    """Adversarial boilerplate skew for the round-9 two-phase df-count
    rewrite: ONE 8-token header planted in 50% of a 2,000-doc corpus
    (so its shingles have df=1,000 >> max_df=64) over unique per-pair
    bodies.  The law has two halves:

    (a) correctness under skew — the df-cap prunes every header
        shingle, so the output is EXACTLY the 1,000 planted body pairs
        (even doc 2i vs odd doc 2i+1; J = 10/18 >= 0.5): boilerplate
        neither invents an even-even pair (their only shared shingles
        are capped away) nor hides a real one;
    (b) pair-space bound — the hot shingle must never reach the
        posting-pair generator: uncapped it alone would emit
        ~6 * C(1000,2) ~= 3M candidate rows, so asserting EVERY
        executed exchange carries < 400k records (vs ~30k kept
        postings) proves the two-phase count + shuffle_hash join keeps
        the shuffle linear in the corpus, with the map-side partial
        collapsing the hot shingle to one row per task.
    """
    from spear_spark.operators.dedup import ngram_jaccard_pairs
    from spear_spark.plans import exchange_record_counts

    n = 2_000
    header = "subscribe to our newsletter for daily updates now"
    body = F.concat_ws(
        " ",
        *[
            F.concat(F.lit("w"), F.col("pair").cast("string"), F.lit(f"q{j}"))
            for j in range(12)
        ],
    )
    docs = (
        spark.range(n)
        .select(F.col("id").alias("doc_id"), F.floor(F.col("id") / 2).alias("pair"))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 2 == 0, F.concat(F.lit(header + " "), body)
            )
            .otherwise(body)
            .alias("text"),
        )
    )
    out = ngram_jaccard_pairs(docs, "text", "doc_id", max_df=64).filter(
        F.col("jaccard") >= 0.5
    )
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert got == {(2 * i, 2 * i + 1) for i in range(n // 2)}

    counts = exchange_record_counts(out, run=False)
    assert counts, "expected shuffle exchanges in the pair pipeline"
    assert max(counts) < 400_000, counts


# --- round-13 pins: the three slowest headliners (VERDICT r12 #6) ---------

def test_edit_distance_char_pairs_scale_linearly(spark, sf_dir):
    """p134's scale law under 10x isomorphic replication (alphabet
    rotation — see replicate_docs).  Levenshtein is invariant under a
    character bijection, so every replica carries exactly the base
    corpus's true near-pair set; rotation makes cross-replica texts
    differ in ~every alphabetic character, pushing their relative edit
    distance far above max_rel.  Pins:

    (a) rep-0 (byte-identical to base) reproduces the base pair set
        verbatim inside the 10x run — char-gram banding loses nothing
        when the signature space gets 10x denser;
    (b) zero cross-replica pairs — 10x really is 10x more corpus;
    (c) soundness bound: total pairs <= 10 * the brute-force true pair
        count (every emitted pair is a true pair of SOME replica, and
        each replica's true set is isomorphic to the base's).
    Observed at sf0.001: 28 base pairs, 280 total (exactly linear)."""
    from spear_spark.operators.dedup import edit_distance_pairs

    kw = dict(max_rel=0.3, k=12, bands=4, candidates="char", char_n=7)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = edit_distance_pairs(docs, "text", "doc_id", **kw).count()
    big = edit_distance_pairs(
        replicate_docs(docs, 10), "text", "doc_id", **kw
    ).select("doc_a", "doc_b").collect()
    shift = 10_000_000
    rep0 = sum(1 for r in big if r.doc_a < shift and r.doc_b < shift)
    cross = sum(1 for r in big if (r.doc_a // shift) != (r.doc_b // shift))
    assert rep0 == base
    assert cross == 0
    t = docs.select(F.col("doc_id").alias("i"), F.col("text").alias("ta"))
    u = docs.select(F.col("doc_id").alias("j"), F.col("text").alias("tb"))
    brute = (
        t.crossJoin(u)
        .filter(F.col("i") < F.col("j"))
        .filter(
            F.round(
                F.levenshtein("ta", "tb").cast("double")
                / F.greatest(F.length("ta"), F.length("tb"), F.lit(1)),
                6,
            )
            <= 0.3
        )
        .count()
    )
    assert len(big) <= 10 * brute


def test_semdedup_frozen_fit_preserves_base_drops_at_10x(spark, sf_dir):
    """p109/p122's deploy shape at 10x: fit on the BASE corpus (the
    ``fit_on`` knob — frozen centroids), assign + verify the 10x
    corpus.  rep-0 rows are byte-identical to base, so they land in
    identical IVF cells; pairs (a < b) with b in rep 0 force a in
    rep 0 (id shift), so the rep-0 slice of the drop list must equal
    the base run's drop list EXACTLY — growing the corpus 10x around
    the original documents changes none of their dedup decisions under
    a frozen fit."""
    from spear_spark.operators.dedup import semdedup

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = sorted(
        (r.drop_id, r.keep_id)
        for r in semdedup(
            emb, "embedding", "vec_id", k=8, threshold=0.35, tol=0.3, max_iters=10
        ).collect()
    )
    assert base, "expected a non-empty base drop list"
    big = semdedup(
        replicate_embeddings(emb, 10),
        "embedding",
        "vec_id",
        k=8,
        threshold=0.35,
        tol=0.3,
        max_iters=10,
        fit_on=emb,
    ).collect()
    rep0 = sorted(
        (r.drop_id, r.keep_id)
        for r in big
        if r.drop_id < ID_SHIFT and r.keep_id < ID_SHIFT
    )
    assert rep0 == base


def test_semdedup_pair_space_scales_linearly_with_k(spark, sf_dir):
    """The published SemDeDup scale knob (raise k with the corpus —
    the paper's k=50k web regime, dedup.semdedup's docstring): fitting
    10x the vectors with 10x the centroids must keep the blocked pair
    space SIGMA C(|cell|,2) — the only quadratic-in-cell-size cost in
    the plan — within ~linear growth.  Observed at sf0.001: ratio
    10.06 (k=8 -> 15,507 pairs; k=80 at 10x -> 156,058); pinned at
    <= 15x to absorb testdata regeneration, not implementation
    drift."""
    from spear_spark.operators.similarity import ivf_assign_fixed, kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def pair_space(e, k):
        info: dict = {}
        kmeans_lloyd(e, "embedding", "vec_id", k=k, tol=0.3, max_iters=50, info=info)
        sizes = (
            ivf_assign_fixed(e, "embedding", info["centroids"])
            .groupBy("_cell")
            .count()
            .collect()
        )
        return sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)

    s1 = pair_space(emb, 8)
    s10 = pair_space(replicate_embeddings(emb, 10).localCheckpoint(), 80)
    assert s1 > 0
    assert s10 <= 15 * s1, (s1, s10)


def test_dedup_report_scales_exactly_linearly(spark, sf_dir):
    """p102's scale law under 10x isomorphic replication: the Jaccard
    grade's every stage (raw-md5 exact keep, df-capped shingle pairs,
    connected components, per-source tallies) is invariant under the
    alphabet rotation, so each replica's per-source accounting is
    isomorphic to the base corpus's and cross-replica edges are
    impossible — the 10x report must be the base report with every
    count exactly 10x and retention BIT-IDENTICAL.  A sub-linear
    n_final_kept would mean phantom cross-replica merges; any
    retention drift would mean a stage stopped being content-local."""
    from spear_spark.operators.dedup import dedup_report

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rep = attach_base_column(
        replicate_docs(docs.select("doc_id", "text"), 10), docs, "source"
    ).localCheckpoint()
    base = {
        r["source"]: r
        for r in dedup_report(docs, "text", "doc_id", "source", threshold=0.5).collect()
    }
    big = dedup_report(rep, "text", "doc_id", "source", threshold=0.5).collect()
    assert len(big) == len(base) > 0
    for r in big:
        b = base[r["source"]]
        assert r["n_docs"] == 10 * b["n_docs"]
        assert r["n_exact_kept"] == 10 * b["n_exact_kept"]
        assert r["n_final_kept"] == 10 * b["n_final_kept"]
        assert r["retention"] == b["retention"]


def test_dedup_report_chunk_grade_stays_per_replica_at_10x(spark, sf_dir):
    """p137's scale law: CDC chunk BOUNDARIES are content-defined on
    token hashes, so the alphabet rotation moves them — per-replica
    final keeps legitimately differ from the base corpus's (observed
    retention deltas <= 0.07 per source at sf0.001).  What must NOT
    move: (a) zero cross-replica chunk-shared pairs — the pair space
    stays per-replica, the property that keeps the plan linear at 10x;
    (b) the rotation-invariant stages (n_docs, raw-md5 exact keeps)
    scale exactly; (c) rep 0 is byte-identical to base, so restricting
    the 10x pair table to rep-0 ids reproduces the base pair set
    verbatim — chunking loses nothing when the hash space gets 10x
    denser; (d) retention stays within the measured ±0.1 band."""
    from spear_spark.operators.dedup import chunk_shared_pairs, dedup_report

    kw = dict(chunk_grade=True, chunk_modulus=16, min_chunk_tokens=3)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    rep = attach_base_column(
        replicate_docs(docs.select("doc_id", "text"), 10), docs, "source"
    ).localCheckpoint()

    pairs = chunk_shared_pairs(
        docs, "text", "doc_id", modulus=16, min_tokens=3
    )
    base_pairs = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    big_pairs = chunk_shared_pairs(
        rep, "text", "doc_id", modulus=16, min_tokens=3
    ).collect()
    cross = [
        r for r in big_pairs if r["doc_a"] // ID_SHIFT != r["doc_b"] // ID_SHIFT
    ]
    assert not cross, f"cross-replica chunk pairs: {cross[:5]}"
    rep0 = {
        (r["doc_a"], r["doc_b"])
        for r in big_pairs
        if r["doc_a"] < ID_SHIFT and r["doc_b"] < ID_SHIFT
    }
    assert rep0 == base_pairs

    base = {
        r["source"]: r for r in dedup_report(docs, "text", "doc_id", "source", **kw).collect()
    }
    for r in dedup_report(rep, "text", "doc_id", "source", **kw).collect():
        b = base[r["source"]]
        assert r["n_docs"] == 10 * b["n_docs"]
        assert r["n_exact_kept"] == 10 * b["n_exact_kept"]
        assert abs(r["retention"] - b["retention"]) <= 0.1


def test_dedup_method_report_scales_per_grade_at_10x(spark, sf_dir):
    """p153's scale law: the three grades scale differently under 10x
    isomorphic replication and the report must say so.  ``exact``
    (content hash) and ``near_lsh`` (MinHash-banded + Jaccard-verified)
    are rotation-invariant end-to-end — every count exactly 10x,
    token_reduction bit-identical (near_lsh's band collisions DO move
    under rotation, but the verify recovers the same true-pair drop
    set; a kept-count drift here means banding recall regressed).
    ``chunk`` moves with the content-defined boundaries: corpus totals
    still exact 10x, kept counts within a ±5% band of linear (observed
    4979 vs 4970 docs, reduction 0.072 -> 0.063 at sf0.001)."""
    from spear_spark.operators.dedup import dedup_method_report

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {r["method"]: r for r in dedup_method_report(docs, "text", "doc_id").collect()}
    big = {
        r["method"]: r
        for r in dedup_method_report(
            replicate_docs(docs, 10).localCheckpoint(), "text", "doc_id"
        ).collect()
    }
    assert set(big) == set(base) == {"exact", "near_lsh", "chunk"}
    for m in ("exact", "near_lsh", "chunk"):
        assert big[m]["n_docs"] == 10 * base[m]["n_docs"]
        assert big[m]["n_tokens"] == 10 * base[m]["n_tokens"]
    for m in ("exact", "near_lsh"):
        assert big[m]["n_docs_kept"] == 10 * base[m]["n_docs_kept"]
        assert big[m]["n_tokens_kept"] == 10 * base[m]["n_tokens_kept"]
        assert big[m]["token_reduction"] == base[m]["token_reduction"]
    for col in ("n_docs_kept", "n_tokens_kept"):
        lo, hi = 9.5 * base["chunk"][col], 10.5 * base["chunk"][col]
        assert lo <= big["chunk"][col] <= hi, (col, base["chunk"][col], big["chunk"][col])


def test_pagerank_per_copy_invariance_at_10x(spark, sf_dir):
    """p59/p72's scale law under 10x disjoint graph replication: ten
    isomorphic copies of the bipartite customer-supplier graph (node
    ids suffixed per replica) iterate through the SAME rounded map, so
    (a) all ten copies produce bit-identical rank vectors — any
    cross-copy drift would mean the iteration stopped being
    component-local (a phantom global coupling); (b) each copy's ranks
    equal the base graph's divided by 10 within per-round rounding
    (init 1/n and base (1-d)/n are the only places total n enters, and
    both are linear); (c) total mass stays 1 — the symmetrized graph
    has no danglers, so the damped map conserves the rank sum up to
    the 9dp per-round rounding.  The weighted/converged variants share
    the same ``_iterate`` core, so the law transfers."""
    from spear_spark.operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("c"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("s"),
        )
        .distinct()
    )
    e = p.select(F.col("c").alias("src"), F.col("s").alias("dst")).unionAll(
        p.select(F.col("s").alias("src"), F.col("c").alias("dst"))
    )
    base = {
        r["node"]: r["rank"]
        for r in pagerank(e, "src", "dst", iters=5, edges_distinct=True).collect()
    }
    e10 = e.withColumn(
        "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
    ).select(
        F.concat_ws("_", "src", F.col("rep").cast("string")).alias("src"),
        F.concat_ws("_", "dst", F.col("rep").cast("string")).alias("dst"),
    )
    big = pagerank(e10, "src", "dst", iters=5, edges_distinct=True).collect()
    assert len(big) == 10 * len(base) > 0

    per_local: dict[str, set] = {}
    for r in big:
        local, _, _rep = r["node"].rpartition("_")
        per_local.setdefault(local, set()).add(r["rank"])
    assert set(per_local) == set(base)
    drifted = {k: v for k, v in per_local.items() if len(v) != 1}
    assert not drifted, f"cross-copy rank drift: {dict(list(drifted.items())[:3])}"
    for local, ranks in per_local.items():
        assert abs(next(iter(ranks)) - base[local] / 10) <= 2e-6, local
    assert abs(sum(r["rank"] for r in big) - 1.0) < 2e-3


def test_leakage_split_family_laws_at_10x(spark, sf_dir):
    """p131/p135's scale law under 10x VERBATIM duplication (ids
    doc_id*16+r, texts unchanged — every base doc becomes a 10-copy
    exact-dup group spanning both id parities).  Three laws: (a) the
    content-keyed constructor stays leak-free — auditing
    ``leakage_safe_split``'s output at the same granularity returns
    ZERO rows however duplicated the corpus gets, the guarantee that
    must not erode with volume; (b) the split is real (validation
    share near val_frac), so (a) isn't vacuously all-train; (c) the
    audit's SENSITIVITY scales exactly: an id-parity split leaks
    every content group — exactly |distinct normalized texts| report
    rows, each with n_train == n_val (5 odd + 5 even ids per base
    doc) and the row totals summing to the whole 10x corpus."""
    from spear_spark.operators.dedup import split_leakage_report
    from spear_spark.operators.sampling import leakage_safe_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rep = (
        docs.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
        )
        .select((F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text")
        .localCheckpoint()
    )
    n_rep = rep.count()

    split = leakage_safe_split(rep, "text", "doc_id", val_frac=0.3)
    joined = rep.join(split.select("doc_id", "split"), "doc_id")
    assert (
        split_leakage_report(
            joined, "text", "doc_id", F.col("split") == F.lit("validation")
        ).count()
        == 0
    )
    val_frac = split.filter(F.col("split") == "validation").count() / n_rep
    assert 0.15 < val_frac < 0.45, val_frac

    leaked = split_leakage_report(
        rep, "text", "doc_id", F.col("doc_id") % 2 == 1
    ).collect()
    n_groups = (
        docs.select(F.md5(F.lower(F.trim(F.col("text")))).alias("k"))
        .distinct()
        .count()
    )
    assert len(leaked) == n_groups > 0
    assert all(r["n_train"] == r["n_val"] for r in leaked)
    assert sum(r["n_train"] + r["n_val"] for r in leaked) == n_rep


def test_kcenter_family_verbatim_10x_invariance(spark, sf_dir):
    """p114/p121's scale law under 10x VERBATIM duplication (same
    vectors, ids + rep*ID_SHIFT — rep 0 keeps the original ids, which
    stay the per-copy minima).  Direct traversal: duplicating points
    changes neither the distinct vector set nor any rounded distance,
    and every min-id tie-break resolves to the rep-0 copy, so the
    selection table is BIT-IDENTICAL to the base run — seed, winner
    ids, and d2 trajectory.  2-pass: first_k_centroids picks the same
    8 seed vectors (rep-0 ids sort first), each Lloyd round's
    per-(cell, dim) mean is the mean of the same multiset duplicated
    10x, so the fit converges in the SAME number of rounds to
    centroids equal within the 6dp rounding, and pass 2's selection
    over that bounded table replays the same (sel_round, cell)
    sequence with d2 within rounding slack.  Any divergence means the
    traversal or the fit picked up a volume dependence (partition-
    order nondeterminism, unrounded comparisons) that 100x data would
    amplify."""
    from spear_spark.operators.similarity import (
        kcenter_coreset,
        kcenter_coreset_2pass,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rep = (
        emb.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
        )
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(ID_SHIFT)).alias("vec_id"),
            "embedding",
        )
        .localCheckpoint()
    )

    base = kcenter_coreset(emb, "embedding", "vec_id", k=6).orderBy("sel_round").collect()
    big = kcenter_coreset(rep, "embedding", "vec_id", k=6).orderBy("sel_round").collect()
    assert len(base) == 6 and any(r["d2"] > 0 for r in base)
    assert [tuple(r) for r in big] == [tuple(r) for r in base]

    info_b: dict = {}
    info_r: dict = {}
    b2 = (
        kcenter_coreset_2pass(
            emb, "embedding", "vec_id", k=4, n_cells=8, tol=0.3,
            max_iters=10, info=info_b,
        )
        .orderBy("sel_round")
        .collect()
    )
    r2 = (
        kcenter_coreset_2pass(
            rep, "embedding", "vec_id", k=4, n_cells=8, tol=0.3,
            max_iters=10, info=info_r,
        )
        .orderBy("sel_round")
        .collect()
    )
    assert info_b["iterations"] == info_r["iterations"]
    assert [r["vec_id"] for r in b2] == [r["vec_id"] for r in r2]
    assert len(b2) == 4 and any(r["d2"] > 0 for r in b2)
    assert max(abs(a["d2"] - b["d2"]) for a, b in zip(b2, r2)) <= 5e-6


def test_cluster_representatives_verbatim_10x_law(spark, sf_dir):
    """p88's scale law under 10x VERBATIM duplication (ids doc_id*16+r,
    texts unchanged): copies of a doc pair at Jaccard 1.0, so every
    base cluster — singletons included — becomes ONE big cluster
    holding all ten copies of each member.  quality_score depends only
    on the text, so the per-cluster argmax sees the same best score
    and its (score DESC, id ASC) struct tie-break must resolve to the
    rep-0 copy of the base winner: the big table must equal the base
    table mapped (cluster_id*16, keep_id*16, same keep_score,
    n_members*10).  Any drift means the two-phase MAX(struct) argmax
    picked up a volume or partition-order dependence."""
    from spear_spark.operators.dedup import (
        cluster_representatives,
        connected_components,
        ngram_jaccard_pairs,
    )
    from spear_spark.operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def reps(d):
        pairs = ngram_jaccard_pairs(d, "text", "doc_id").filter(
            F.col("jaccard") >= 0.5
        )
        labels = connected_components(pairs)
        scores = d.select("doc_id", quality_score("text").alias("score"))
        return {
            r["cluster_id"]: (r["keep_id"], r["keep_score"], r["n_members"])
            for r in cluster_representatives(labels, scores).collect()
        }

    base = reps(docs)
    big = reps(
        docs.withColumn(
            "rep", F.explode(F.array(*[F.lit(i) for i in range(10)]))
        ).select((F.col("doc_id") * 16 + F.col("rep")).alias("doc_id"), "text")
    )
    # base singletons never reach cluster_representatives (CC only
    # labels docs that matched something) but their 10-copy groups DO
    # appear in big — so big's key set is every base doc's cluster.
    assert len(base) > 0
    mapped = {
        cid * 16: (kid * 16, ks, n * 10) for cid, (kid, ks, n) in base.items()
    }
    # big's cluster count = base clusters + one 10-copy cluster per
    # base SINGLETON (CC only labels docs that matched something, so
    # singletons are absent from base but their copy-groups pair up)
    n_docs = docs.count()
    n_in_base_clusters = sum(n for _, (_, _, n) in base.items())
    n_singletons = n_docs - n_in_base_clusters
    assert len(big) == len(base) + n_singletons
    for cid, want in mapped.items():
        assert big[cid] == want, (cid, big[cid], want)
    # every big cluster not mapped from a base cluster is a singleton
    # 10-copy group: keep = its own min id, 10 members
    for cid, (kid, ks, n) in big.items():
        if cid not in mapped:
            assert kid == cid and n == 10, (cid, kid, n)
