"""Property-based tests (hypothesis) — the analog of the reference's
ScalaCheck generators (OptimizerSuite.scala:56-91, generators/
expressions/package.scala): random data + random predicate trees,
engine results compared against a pure-Python evaluator, plus
optimizer-law checks (merged filters ≡ conjunction)."""

from __future__ import annotations

import operator

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

# -- predicate tree: generate (Column expr, python fn) pairs ----------------

_COMPARES = [
    ("<", operator.lt), ("<=", operator.le), (">", operator.gt),
    (">=", operator.ge), ("=", operator.eq), ("!=", operator.ne),
]


@st.composite
def predicates(draw, depth: int = 2):
    """A random predicate over columns x, y (nullable ints)."""
    if depth == 0 or draw(st.booleans()):
        col = draw(st.sampled_from(["x", "y"]))
        rhs = draw(st.integers(-5, 5))
        name, fn = draw(st.sampled_from(_COMPARES))
        expr_map = {
            "<": F.col(col) < rhs, "<=": F.col(col) <= rhs,
            ">": F.col(col) > rhs, ">=": F.col(col) >= rhs,
            "=": F.col(col) == rhs, "!=": F.col(col) != rhs,
        }

        def py(row, col=col, fn=fn, rhs=rhs):
            v = row[0] if col == "x" else row[1]
            return None if v is None else fn(v, rhs)

        return expr_map[name], py
    a_expr, a_py = draw(predicates(depth=depth - 1))
    b_expr, b_py = draw(predicates(depth=depth - 1))
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "and":
        return a_expr & b_expr, lambda r: _and3(a_py(r), b_py(r))
    if kind == "or":
        return a_expr | b_expr, lambda r: _or3(a_py(r), b_py(r))
    return ~a_expr, lambda r: None if a_py(r) is None else not a_py(r)


def _and3(a, b):  # SQL three-valued logic
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def _or3(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False



def _key(t):
    return tuple((v is None, v if v is not None else 0) for v in t)

rows_st = st.lists(
    st.tuples(st.integers(-5, 5) | st.none(), st.integers(-5, 5) | st.none()),
    min_size=0,
    max_size=12,
)

PROP_SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


@given(data=rows_st, pred=predicates())
@PROP_SETTINGS
def test_filter_matches_three_valued_logic(ctx, data, pred):
    expr, py = pred
    df = ctx.lift(data, "x: int, y: int") if data else ctx.lift([], "x: int, y: int")
    got = sorted((tuple(r) for r in df.filter(expr).collect()), key=_key)
    expected = sorted((t for t in data if py(t) is True), key=_key)
    assert got == expected


@given(data=rows_st, pred=predicates(depth=1))
@PROP_SETTINGS
def test_merged_filters_equal_conjunction(ctx, data, pred):
    """Optimizer law (MergeFilters, Optimizer.scala:195-199 — built into
    Catalyst as CombineFilters): filter(a).filter(b) ≡ filter(a AND b)."""
    expr, _ = pred
    df = ctx.lift(data, "x: int, y: int") if data else ctx.lift([], "x: int, y: int")
    chained = sorted(
        (tuple(r) for r in df.filter(expr).filter(F.col("x").isNotNull()).collect()),
        key=_key,
    )
    combined = sorted(
        (tuple(r) for r in df.filter(expr & F.col("x").isNotNull()).collect()),
        key=_key,
    )
    assert chained == combined


@given(data=rows_st)
@PROP_SETTINGS
def test_union_is_bag(ctx, data):
    df = ctx.lift(data, "x: int, y: int") if data else ctx.lift([], "x: int, y: int")
    assert df.union(df).count() == 2 * len(data)


@given(data=rows_st, n=st.integers(0, 15))
@PROP_SETTINGS
def test_limit_bound(ctx, data, n):
    df = ctx.lift(data, "x: int, y: int") if data else ctx.lift([], "x: int, y: int")
    assert df.limit(n).count() == min(n, len(data))


@given(data=rows_st)
@PROP_SETTINGS
def test_distinct_is_set(ctx, data):
    df = ctx.lift(data, "x: int, y: int") if data else ctx.lift([], "x: int, y: int")
    got = sorted(
        (tuple(r) for r in df.distinct().collect()),
        key=lambda t: tuple((v is None, v if v is not None else 0) for v in t),
    )
    expected = sorted(
        set(data),
        key=lambda t: tuple((v is None, v if v is not None else 0) for v in t),
    )
    assert got == expected


kv_st = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-10, 10) | st.none()),
    min_size=0, max_size=15,
)


@given(data=kv_st)
@PROP_SETTINGS
def test_grouped_aggregates_match_python(ctx, data):
    df = ctx.lift(data, "k: int, v: int") if data else ctx.lift([], "k: int, v: int")
    got = {
        r.k: (r.s, r.c, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    expected = {}
    for k, v in data:
        expected.setdefault(k, [])
        if v is not None:
            expected[k].append(v)
    expected = {
        k: (sum(vs) if vs else None, len(vs),
            min(vs) if vs else None, max(vs) if vs else None)
        for k, vs in expected.items()
    }
    assert got == expected


@given(data=kv_st)
@PROP_SETTINGS
def test_running_sum_window_matches_prefix_sums(ctx, data):
    """ROWS unbounded→current running sum (spear default frame) vs
    python prefix sums per key, ordered by a unique index."""
    from spear_spark.windows import Window as SW

    indexed = [(k, v, i) for i, (k, v) in enumerate(data)]
    df = (
        ctx.lift(indexed, "k: int, v: int, i: int")
        if indexed
        else ctx.lift([], "k: int, v: int, i: int")
    )
    w = SW().partitionBy("k").orderBy("i").to_spark()
    got = {
        r.i: r.s
        for r in df.df.select("i", F.sum("v").over(w).alias("s")).collect()
    }
    acc: dict = {}
    expected = {}
    for k, v, i in indexed:
        prev = acc.get(k)
        cur = prev if v is None else (v if prev is None else prev + v)
        acc[k] = cur
        expected[i] = cur
    assert got == expected


# -- round 4: CDC compaction law, segment-dedup idempotence -----------------


@st.composite
def changelogs(draw):
    """Random changelog: (key, ts, cid, value, is_delete) with
    duplicate keys/timestamps; cid is globally unique so (ts, cid) is
    a total order within every key."""
    n = draw(st.integers(1, 30))
    rows = []
    for cid in range(n):
        rows.append(
            (
                draw(st.integers(0, 5)),            # key — deliberately colliding
                draw(st.integers(0, 10)),           # ts — ties within keys
                cid,
                float(draw(st.integers(-100, 100))),
                draw(st.booleans()),
            )
        )
    return rows


@settings(deadline=None, max_examples=15,
          suppress_health_check=[HealthCheck.too_slow])
@given(changelogs())
def test_cdc_latest_state_equals_window_formulation(spark, rows):
    """Law: the max_by aggregate compaction ≡ the row_number-window
    formulation, on arbitrary changelogs (colliding keys, tied
    timestamps, delete flags anywhere in the order)."""
    from pyspark.sql.window import Window as W

    from spear_spark.operators.cdc import cdc_latest_state

    df = spark.createDataFrame(
        rows, "k long, ts long, cid long, v double, is_delete boolean"
    )
    got = sorted(
        tuple(r)
        for r in cdc_latest_state(
            df, ["k"], ["ts", "cid"], ["v", "is_delete"],
            delete_expr=F.col("is_delete"),
        ).select("k", "ts", "cid", "v").collect()
    )
    w = W.partitionBy("k").orderBy(F.col("ts").desc(), F.col("cid").desc())
    want = sorted(
        tuple(r)
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & ~F.col("is_delete"))
        .select("k", "ts", "cid", "v")
        .collect()
    )
    assert got == want


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.lists(st.sampled_from("ab cd ef gh ij".split()), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_segment_dedup_idempotent(spark, docs):
    """Law: running segment dedup on its own cleaned output changes
    nothing (every surviving segment is already a first occurrence).
    Random corpora drawn from a tiny token alphabet force heavy
    cross-document segment collisions."""
    from spear_spark.operators.dedup import segment_dedup

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    once = segment_dedup(df, "text", "doc_id", seg_tokens=2)
    cleaned = once.filter(F.col("clean_text").isNotNull()).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    twice = segment_dedup(cleaned, "text", "doc_id", seg_tokens=2)
    # nothing removed on the second pass
    assert twice.filter(F.col("n_kept") != F.col("n_segments")).count() == 0


@st.composite
def weighted_sources(draw):
    n = draw(st.integers(1, 8))
    return [(f"s{i}", draw(st.integers(1, 200))) for i in range(n)]


@settings(deadline=None, max_examples=20,
          suppress_health_check=[HealthCheck.too_slow])
@given(weighted_sources(), st.integers(0, 2000))
def test_budget_waterfill_laws(spark, totals, budget):
    """Laws on arbitrary (source, weight) tables and budgets:
    (1) Σ alloc == min(budget, Σ T) exactly;
    (2) 0 <= alloc_s <= T_s;
    (3) fairness — capped allocations differ by at most 1, and every
        capped allocation <= every uncapped source's total;
    (4) capped flag is consistent with alloc < T."""
    from spear_spark.operators.sampling import budget_waterfill

    df = spark.createDataFrame(totals, "src string, w long")
    out = budget_waterfill(df, "src", "w", budget).collect()
    T = dict(totals)
    total = sum(T.values())
    assert sum(r["alloc"] for r in out) == min(budget, total)
    capped_allocs = []
    uncapped_totals = []
    for r in out:
        assert 0 <= r["alloc"] <= T[r["source"]]
        if r["capped"]:
            capped_allocs.append(r["alloc"])
            assert r["alloc"] <= T[r["source"]]
        else:
            assert r["alloc"] == T[r["source"]]
            uncapped_totals.append(r["alloc"])
    if capped_allocs:
        assert max(capped_allocs) - min(capped_allocs) <= 1
        if uncapped_totals:
            # water level: a source kept whole sits at or below the cap
            assert all(u <= min(capped_allocs) + 1 for u in uncapped_totals)


@st.composite
def keyed_values(draw):
    n = draw(st.integers(1, 60))
    return [
        (draw(st.integers(0, 300)), float(draw(st.integers(-50, 50))))
        for _ in range(n)
    ]


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(keyed_values(), st.integers(1, 20), st.integers(0, 20),
       st.integers(21, 80))
def test_partitioned_bounded_range_law(spark, rows, preceding, following,
                                       width):
    """Law: the halo-row partitioned evaluation ≡ the naive global
    RANGE window for ANY key multiset, frame [k-R, k+S], and bucket
    width (> each range) — duplicates, negative values, sparse and
    dense keys, trailing-only and symmetric frames."""
    from pyspark.sql.window import Window as SW

    from spear_spark.windows import partitioned_bounded_range

    df = spark.createDataFrame(rows, "k long, v double")
    got = partitioned_bounded_range(
        df, "k", {"s": (F.col("v"), F.sum)}, preceding_range=preceding,
        bucket_width=width, following_range=following,
    )
    naive = df.withColumn(
        "s", F.sum("v").over(SW.orderBy("k").rangeBetween(-preceding, following))
    )
    a = sorted(tuple(r) for r in got.select("k", "v", "s").collect())
    b = sorted(tuple(r) for r in naive.select("k", "v", "s").collect())
    assert a == b


# -- rolling-sketch merge laws over random corpora --------------------------

_doc_st = st.text(
    alphabet="ab cd", min_size=0, max_size=20
)  # tiny alphabet -> heavy token collisions, the interesting regime
_rolling_corpus_st = st.lists(
    st.tuples(st.integers(0, 6), _doc_st), min_size=1, max_size=18
)


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=_rolling_corpus_st, window=st.integers(1, 4))
def test_cm_rolling_equals_direct_window_sketch_prop(spark, rows, window):
    """∀ corpora, ∀ windows: rolling cells at period p == the direct
    sketch of rows in (p-window+1 .. p] — the hypothesis-widened form
    of the planted-case law (random period gaps, empty docs, token
    collisions)."""
    from pyspark.sql import functions as F

    from spear_spark.operators.sketch import (
        cm_rolling,
        count_min_sketch,
        count_min_sketch_by,
    )

    df = spark.createDataFrame(rows, "period int, text string")
    daily = count_min_sketch_by(df, "period", "text")
    rolled = cm_rolling(daily, window=window).collect()
    periods = {r[0] for r in rows}
    assert {r.period for r in rolled} <= periods
    by_p: dict[int, dict] = {}
    for r in rolled:
        by_p.setdefault(r.period, {})[(r.row, r.bucket)] = r.cnt
    for p in periods:
        direct = {
            (r.row, r.bucket): r.cnt
            for r in count_min_sketch(
                df.filter(
                    (F.col("period") > p - window) & (F.col("period") <= p)
                ),
                "text",
            ).collect()
        }
        assert by_p.get(p, {}) == direct


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 40)),
                     min_size=1, max_size=25),
       window=st.integers(1, 3))
def test_hll_rolling_equals_direct_window_registers_prop(spark, rows, window):
    """∀ corpora, ∀ windows: rolling registers at p == the register
    table of the window's rows — and merging the daily table with
    itself first never changes anything (MAX idempotence)."""
    from pyspark.sql import functions as F

    from spear_spark.operators.sketch import (
        hll_register_table,
        hll_register_table_by,
        hll_rolling,
    )

    df = spark.createDataFrame(rows, "period int, k int")
    key = F.col("k").cast("string")
    daily = hll_register_table_by(df, "period", key)
    rolled = hll_rolling(daily, window=window).collect()
    doubled = hll_rolling(daily.unionByName(daily), window=window).collect()
    assert sorted(map(tuple, rolled)) == sorted(map(tuple, doubled))
    by_p: dict[int, set] = {}
    for r in rolled:
        by_p.setdefault(r.period, set()).add((r.reg, r.max_rho))
    for p in {r[0] for r in rows}:
        direct = {
            (r.reg, r.max_rho)
            for r in hll_register_table(
                df.filter(
                    (F.col("period") > p - window) & (F.col("period") <= p)
                ),
                key,
            ).collect()
        }
        assert by_p.get(p, set()) == direct


# -- round-9 operator laws under random data --------------------------------


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8),
    min_size=2, max_size=6,
))
def test_cm_inner_product_one_sided_on_random_corpora(spark, docs):
    """CM inner product never undercounts the exact token-distribution
    overlap, for ANY corpus — the Cormode-Muthukrishnan one-sided law
    under random multisets."""
    from collections import Counter

    from spear_spark.operators.sketch import cm_inner_product_by, count_min_sketch_by

    rows = [(f"g{i}", " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "g string, text string")
    grid = count_min_sketch_by(df, "g", "text")
    got = {(r.group_a, r.group_b): r.est_inner
           for r in cm_inner_product_by(grid, "g").collect()}
    bags = {g: Counter(t.split()[0] for t in txt.split()) for g, txt in rows}
    names = sorted(bags)
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            exact = sum(bags[ga][t] * bags[gb][t] for t in bags[ga])
            assert got[(ga, gb)] >= exact, (ga, gb)


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 9)),
    min_size=1, max_size=30,
))
def test_group_ecdf_matches_python_on_random_values(spark, rows):
    """group_ecdf == the inclusive P(X <= v) definition for any
    multiset; closes at 1.0 per group."""
    from spear_spark.operators.stats import group_ecdf

    df = spark.createDataFrame(rows, "g string, v int")
    out = group_ecdf(df, "v", ["g"]).collect()
    from collections import defaultdict
    vals = defaultdict(list)
    for g, v in rows:
        vals[g].append(v)
    assert {(r.g, r.v) for r in out} == {(g, v) for g, v in rows}
    for r in out:
        below = sum(1 for x in vals[r.g] if x <= r.v)
        assert r.cum_n == below
        assert r.ecdf == round(below / len(vals[r.g]), 6)
    for g, xs in vals.items():
        top = max(xs)
        [last] = [r for r in out if r.g == g and r.v == top]
        assert last.ecdf == 1.0


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(0, 12), min_size=1, max_size=8, unique=True),
       st.integers(1, 4))
def test_rolling_densify_agrees_with_direct_sketch(spark, periods, window):
    """For ANY observed-period set and window size, every densified
    period's cells equal the direct sketch of the window's raw rows
    (and the period range is exactly [min, max])."""
    from spear_spark.operators.sketch import (
        cm_rolling,
        count_min_sketch,
        count_min_sketch_by,
    )

    rows = [(p, f"t{p} t{p} u{p % 3}") for p in periods]
    df = spark.createDataFrame(rows, "period int, text string")
    daily = count_min_sketch_by(df, "period", "text")
    rolled = cm_rolling(daily, window=window, densify=True).collect()
    lo, hi = min(periods), max(periods)
    got_periods = sorted({r.period for r in rolled})
    # a period inside [lo, hi] emits cells iff its window is non-empty
    expect = [p for p in range(lo, hi + 1)
              if any(p - window < q <= p for q in periods)]
    assert got_periods == expect
    for p in got_periods:
        got = {(r.row, r.bucket): r.cnt for r in rolled if r.period == p}
        direct = {
            (r.row, r.bucket): r.cnt
            for r in count_min_sketch(
                df.filter((F.col("period") > p - window) & (F.col("period") <= p)),
                "text",
            ).collect()
        }
        assert got == direct, (p, window)


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(1, 40), min_size=1, max_size=25))
def test_interval_islands_cover_exactly_the_positions(spark, raw_positions):
    """Island merging over ANY position set: interval coverage equals
    the union of per-position [pos, pos+n-1] ranges, intervals are
    disjoint and non-adjacent."""
    from pyspark.sql.window import Window as W

    n = 3
    positions = sorted(set(raw_positions))
    df = spark.createDataFrame([(1, p) for p in positions], "doc_id int, pos int")
    w = W.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") > F.lag("pos").over(w) + n, F.lit(1)).otherwise(F.lit(0))
    islands = df.withColumn("_brk", brk).withColumn(
        "_isl", F.sum("_brk").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    ivs = (
        islands.groupBy("doc_id", "_isl")
        .agg(F.min("pos").alias("s"), (F.max("pos") + n - 1).alias("e"))
        .collect()
    )
    want = {t for p in positions for t in range(p, p + n)}
    got = {t for r in ivs for t in range(r.s, r.e + 1)}
    assert got == want
    spans = sorted((r.s, r.e) for r in ivs)
    for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
        assert s2 > e1 + 1


# -- p104/p105/p106 laws under random data ----------------------------------


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from("abc"),
              st.lists(st.sampled_from(["u", "v", "w", "x", "y"]),
                       min_size=1, max_size=10)),
    min_size=2, max_size=8,
))
def test_group_jsd_matches_python_on_random_corpora(spark, docs):
    """The intersection-only identity equals the textbook
    union-vocabulary JSD for ANY multi-group corpus, every pair."""
    from collections import Counter
    from math import log2

    from spear_spark.operators.relevance import group_js_divergence

    rows = [(g, " ".join(toks)) for g, toks in docs]
    df = spark.createDataFrame(rows, "g string, text string")
    got = {(r.group_a, r.group_b): r.jsd
           for r in group_js_divergence(df, "g", "text").collect()}
    bags = {}
    for g, toks in docs:
        bags.setdefault(g, Counter()).update(toks)
    names = sorted(bags)
    assert set(got) == {(a, b) for i, a in enumerate(names) for b in names[i + 1:]}
    for (ga, gb), jsd in got.items():
        na, nb = sum(bags[ga].values()), sum(bags[gb].values())
        ref = 0.0
        for tok in set(bags[ga]) | set(bags[gb]):
            p, q = bags[ga][tok] / na, bags[gb][tok] / nb
            m = (p + q) / 2
            if p:
                ref += 0.5 * p * log2(p / m)
            if q:
                ref += 0.5 * q * log2(q / m)
        assert abs(jsd - ref) < 1e-6, (ga, gb)


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.integers(0, 500), st.integers(0, 50)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]),
       st.integers(1, 5))
def test_curriculum_order_matches_python_reference(spark, rows, k):
    """For ANY (id, score) set and stage count: positions equal the
    pure-Python replay (sort by (score, id) → stage arithmetic → sort
    by (stage, md5 key, id))."""
    import hashlib

    from spear_spark.operators.ids import curriculum_order

    df = spark.createDataFrame(rows, "doc_id int, score int")
    got = {r.doc_id: (r.stage, r.position)
           for r in curriculum_order(
               spark, df, "doc_id", "score", n_stages=k, seed=23).collect()}
    n = len(rows)
    ranked = sorted(rows, key=lambda t: (t[1], t[0]))
    stage = {d: (i * k) // n + 1 for i, (d, _) in enumerate(ranked)}
    def sk(d):
        return int(hashlib.md5(f"23_{d}".encode()).hexdigest()[:15], 16)
    final = sorted(rows, key=lambda t: (stage[t[0]], sk(t[0]), t[0]))
    want = {d: (stage[d], i + 1) for i, (d, _) in enumerate(final)}
    assert got == want


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.sampled_from(["red", "blue", "green", "gold", "iron", "clay"]),
             min_size=3, max_size=7),
    min_size=1, max_size=10,
))
def test_dup_cluster_profile_matches_union_find(spark, texts):
    """The size histogram equals a pure-Python union-find over the
    exact shingle-Jaccard >= 0.5 graph, for ANY random corpus —
    including docs whose shingle sets are empty or identical."""
    from collections import Counter

    from spear_spark.operators.dedup import dup_cluster_profile

    rows = [(i, " ".join(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.cluster_size: r.n_clusters
           for r in dup_cluster_profile(df, "text", "doc_id").collect()}
    sh = {
        i: {" ".join(t[j:j + 3]) for j in range(len(t) - 2)}
        for i, t in enumerate(texts)
    }
    parent = list(range(len(texts)))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            inter = len(sh[a] & sh[b])
            if inter and round(inter / len(sh[a] | sh[b]), 6) >= 0.5:
                parent[find(a)] = find(b)
    sizes = Counter(find(i) for i in range(len(texts)))
    want = dict(Counter(sizes.values()))
    assert got == want


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from("ab"), st.integers(0, 30)),
    min_size=2, max_size=25,
))
def test_mad_outliers_approx_matches_python_binned_rule(spark, rows):
    """mad_outliers_approx == a pure-Python replay of its histogram
    rule (type-1 bin median for the group median, then for the MAD over
    absolute deviations, score = 0.6745*delta/mad_est) on any random
    grouped multiset — compared away from the threshold boundary where
    6-decimal rounding could legitimately disagree."""
    import math
    from collections import defaultdict
    from itertools import groupby

    from spear_spark.operators.stats import mad_outliers_approx

    lo, hi, n_bins, threshold = 0.0, 31.0, 31, 1.0
    data = [(g, i, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, doc_id int, v int")
    out = {r.doc_id: r.mscore for r in mad_outliers_approx(
        df, "v", ["g"], "doc_id",
        lo=lo, hi=hi, n_bins=n_bins, threshold=threshold).collect()}

    def hist_med(vals, lo_, hi_, nb):
        w_ = (hi_ - lo_) / nb
        bins = sorted(
            min(max(math.floor((x - lo_) / w_), 0), nb - 1) for x in vals
        )
        target, cum = math.ceil(0.5 * len(bins)), 0
        for b, grp in groupby(bins):
            cum += len(list(grp))
            if cum >= target:
                return lo_ + (b + 1) * w_

    by_g = defaultdict(list)
    for g, i, v in data:
        by_g[g].append((i, v))
    scores = {}
    for g, pairs in by_g.items():
        med = hist_med([v for _, v in pairs], lo, hi, n_bins)
        mad = hist_med([abs(v - med) for _, v in pairs], 0.0, hi - lo, n_bins)
        for i, v in pairs:
            scores[i] = 0.6745 * (v - med) / mad
    for i, s in scores.items():
        if abs(s) >= threshold + 1e-5:
            assert i in out and abs(out[i] - s) <= 1e-6
    for i in out:
        assert abs(scores[i]) >= threshold - 1e-5


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(-5, 5), st.integers(-5, 5), st.integers(-5, 5))
    .filter(lambda t: any(t)),  # zero-norm vectors are outside the
    # cosine contract (0/0 — ANSI divide-by-zero, same in both engines)
    min_size=4, max_size=16,
))
def test_semdedup_sound_on_random_vectors(spark, rows):
    """SemDeDup soundness on arbitrary small corpora: cluster blocking
    can only MISS pairs, never invent them, so the drop set is a subset
    of the brute-force threshold drops for any non-zero vector multiset
    (exact duplicates and collinear clumps included)."""
    from hypothesis import assume

    from spear_spark.operators.dedup import near_dedup_embedding, semdedup

    df = spark.createDataFrame(
        [(i, [float(a), float(b), float(c)]) for i, (a, b, c) in enumerate(rows)],
        "vec_id long, embedding array<double>",
    )
    try:
        got = semdedup(
            df, "embedding", "vec_id", k=3, threshold=0.95,
            tol=1e-3, max_iters=60,
        ).collect()
    except RuntimeError:
        assume(False)  # oscillating Lloyd run — out of this law's scope
        return
    brute = near_dedup_embedding(
        df.withColumn("_one", F.lit(1)), "embedding", "vec_id", "_one",
        threshold=0.95,
    ).collect()
    assert {r.drop_id for r in got} <= {r.drop_id for r in brute}


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from("abc"), st.integers(0, 9)),
    min_size=1, max_size=30,
), st.integers(1, 5))
def test_cap_per_group_matches_python_topn(spark, rows, n):
    """cap_per_group == Python groupwise sorted[:n] under the same
    total order, for any grouped multiset and cap."""
    from spear_spark.operators.sampling import cap_per_group

    data = [(i, g, v) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "rid int, g string, v int")
    out = {(r.rid, r.g, r.v) for r in cap_per_group(
        df, ["g"], n, [F.desc("v"), F.col("rid")]).collect()}
    by_g: dict = {}
    for rid, g, v in data:
        by_g.setdefault(g, []).append((rid, v))
    want = {
        (rid, g, v)
        for g, rs in by_g.items()
        for rid, v in sorted(rs, key=lambda t: (-t[1], t[0]))[:n]
    }
    assert out == want


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    grp=st.lists(st.tuples(st.sampled_from("ab"), st.integers(0, 99)),
                 min_size=1, max_size=40),
    ref=st.lists(st.integers(0, 99), min_size=1, max_size=40),
    nb=st.integers(1, 8),
)
def test_psi_from_bins_matches_python_replay(spark, grp, ref, nb):
    """psi_from_bins == the pure-Python eps-floored PSI sum for any
    pair of count tables and any bin geometry — including empty bins,
    single-bin grids, and keys whose mass sits entirely outside the
    reference's occupied bins."""
    import math

    from spear_spark.operators.stats import psi_from_bins

    eps = 1e-6
    gc: dict = {}
    for g, v in grp:
        b = min(v % 10, nb - 1)
        gc[(g, b)] = gc.get((g, b), 0) + 1
    rc: dict = {}
    for v in ref:
        b = min(v % 10, nb - 1)
        rc[b] = rc.get(b, 0) + 1
    gdf = spark.createDataFrame(
        [(g, b, c) for (g, b), c in gc.items()], "g string, bin long, c long"
    )
    rdf = spark.createDataFrame(list(rc.items()), "bin long, c long")
    got = {r.g: r.psi for r in psi_from_bins(gdf, ["g"], rdf, nb).collect()}
    rn = sum(rc.values())
    want = {}
    for g in {g for g, _ in gc}:
        gn = sum(c for (gg, _), c in gc.items() if gg == g)
        psi = 0.0
        for b in range(nb):
            p = max(gc.get((g, b), 0) / gn, eps)
            q = max(rc.get(b, 0) / rn, eps)
            psi += (p - q) * math.log(p / q)
        want[g] = round(psi, 6)
    assert set(got) == set(want)
    for g in want:
        assert abs(got[g] - want[g]) <= 1e-6, (g, got[g], want[g])


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vecs=st.lists(
        st.tuples(st.integers(-8, 8), st.integers(-8, 8)),
        min_size=1, max_size=15,
    ),
    k=st.integers(1, 5),
)
def test_kcenter_coreset_matches_python_replay(spark, vecs, k):
    """kcenter_coreset == the pure-Python greedy farthest-point
    traversal (rounded d2, min-id tie-breaks, early stop) for any
    small vector multiset — duplicates, collinear sets, single
    points."""
    from spear_spark.operators.similarity import kcenter_coreset

    data = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vecs)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    got = [
        (r.sel_round, r.vec_id, r.d2)
        for r in kcenter_coreset(df, "embedding", "vec_id", k=k)
        .orderBy("sel_round").collect()
    ]
    pts = dict(data)

    def d2(a, b):
        return round((a[0]-b[0])**2 + (a[1]-b[1])**2, 6)

    chosen = [0]
    want = [(0, 0, 0.0)]
    for r in range(1, k):
        best = max(
            ((min(d2(v, pts[c]) for c in chosen), -i), i) for i, v in pts.items()
        )
        (dist, _), i = best
        if dist <= 0.0:
            break
        chosen.append(i)
        want.append((r, i, dist))
    assert got == want


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=25),
    min_size=1, max_size=8,
), st.sampled_from([1, 2, 4, 8]))
def test_cdc_chunks_matches_python_replay(spark, docs, modulus):
    """cdc_chunks == the pure-Python boundary replay for any small
    corpus and modulus — including empty docs, single-token docs, and
    moduli that cut after (almost) every token."""
    import hashlib

    from spear_spark.operators.text import cdc_chunks

    data = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got: dict = {}
    for r in cdc_chunks(df, "text", "doc_id", modulus=modulus).collect():
        got.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.n_tokens, r.chunk_hash, r.chunk_text)
        )
    for i, text in data:
        toks = text.strip().lower().split()
        if not toks:
            assert i not in got
            continue
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        cuts = [j for j in range(1, len(toks) + 1) if hs[j - 1] % modulus == 0]
        if not cuts or cuts[-1] != len(toks):
            cuts.append(len(toks))
        want, start = [], 0
        for j, e in enumerate(cuts):
            ch = " ".join(toks[start:e])
            want.append((j, e - start, hashlib.md5(ch.encode()).hexdigest(), ch))
            start = e
        assert sorted(got.get(i, [])) == want, (i, modulus)


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    grp=st.lists(st.tuples(st.sampled_from("ab"), st.integers(0, 20)),
                 min_size=1, max_size=30),
    ref=st.lists(st.integers(0, 20), min_size=1, max_size=30),
)
def test_ks_vs_reference_matches_python_replay(spark, grp, ref):
    """ks_vs_reference == the bisect ECDF max-gap for any two small
    integer samples — ties, disjoint supports, constant groups."""
    import bisect

    from spear_spark.operators.stats import ks_vs_reference

    gdf = spark.createDataFrame(grp, "g string, v long")
    rdf = spark.createDataFrame([(x,) for x in ref], "v long")
    got = {r.g: r.ks for r in ks_vs_reference(gdf, rdf, "v", ["g"]).collect()}
    sref = sorted(ref)
    want = {}
    for g in {g for g, _ in grp}:
        vs = sorted(v for gg, v in grp if gg == g)
        pts = set(vs) | set(sref)
        ks = max(
            abs(bisect.bisect_right(vs, p) / len(vs)
                - bisect.bisect_right(sref, p) / len(sref))
            for p in pts
        )
        want[g] = round(ks, 6)
    assert set(got) == set(want)
    for g in want:
        assert abs(got[g] - want[g]) <= 1e-6, (g, got[g], want[g])


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=25),
    min_size=1, max_size=8,
), st.sampled_from([1, 2, 4, 8]))
def test_chunk_dedup_report_matches_python_replay(spark, docs, modulus):
    """chunk_dedup_report == the pure-Python chunk+min-owner replay
    for any small corpus: heavy cross-doc repetition (5-word alphabet
    forces shared chunks), within-doc repeats, empty docs."""
    import hashlib

    from spear_spark.operators.dedup import chunk_dedup_report

    data = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(data, "doc_id long, text string")
    chunks = []  # (doc_id, n_tokens, hash)
    for i, text in data:
        toks = text.strip().lower().split()
        if not toks:
            continue
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        cuts = [j for j in range(1, len(toks) + 1) if hs[j - 1] % modulus == 0]
        if not cuts or cuts[-1] != len(toks):
            cuts.append(len(toks))
        start = 0
        for e in cuts:
            ch = " ".join(toks[start:e])
            chunks.append((i, e - start, hashlib.md5(ch.encode()).hexdigest()))
            start = e
    first: dict = {}
    for did, _, h in chunks:
        first[h] = min(first.get(h, did), did)
    want: dict = {}
    for did, nt, h in chunks:
        w = want.setdefault(did, [0, 0, 0, 0])
        dup = first[h] < did
        w[0] += 1
        w[1] += 1 if dup else 0
        w[2] += nt
        w[3] += nt if dup else 0
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.n_tokens, r.dup_tokens,
                   r.dup_token_share)
        for r in chunk_dedup_report(df, "text", "doc_id", modulus=modulus).collect()
    }
    assert set(got) == set(want)
    for did, (nc, nd, nt, dt) in want.items():
        assert got[did] == (nc, nd, nt, dt, round(dt / nt, 6)), (did, modulus)


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.floats(-1000.0, 1000.0, allow_nan=False), min_size=1,
             max_size=40, unique=True),
    st.integers(1, 10),
    st.integers(0, 5),
)
def test_gumbel_topk_matches_python_replay(spark, logws, k, seed):
    """gumbel_topk_sample == the pure-Python md5→uniform→Gumbel key
    replay for any log-weights (huge spans, negatives, k > n), any
    seed."""
    import hashlib
    import math

    from spear_spark.operators.sampling import gumbel_topk_sample

    rows = [(i, lw) for i, lw in enumerate(logws)]
    df = spark.createDataFrame(rows, "doc_id long, logw double")

    def key(i, lw):
        h = int(hashlib.md5(f"{seed}_{i}".encode()).hexdigest()[:13], 16)
        u = (h + 1) / float(1 << 52)
        return lw - math.log(-math.log(u))

    want = sorted(((key(i, lw), i) for i, lw in rows),
                  key=lambda t: (-t[0], t[1]))[:k]
    got = [
        (r.doc_id, r.gumbel_key)
        for r in gumbel_topk_sample(df, "doc_id", "logw", k=k, seed=seed)
        .orderBy(F.desc("gumbel_key"), "doc_id").collect()
    ]
    assert [i for _, i in want] == [i for i, _ in got]
    for (wk, _), (_, gk) in zip(want, got):
        assert abs(gk - round(wk, 6)) <= 1e-6


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.booleans(), st.booleans()),
                min_size=1, max_size=60))
def test_filter_agreement_matches_python_kappa(spark, rows):
    """filter_agreement == the textbook confusion/kappa arithmetic for
    any flag table — degenerate marginals, all-agree, all-disagree."""
    from spear_spark.operators.stats import filter_agreement

    df = spark.createDataFrame(rows, "a boolean, b boolean")
    [r] = filter_agreement(df, "a", "b").collect()
    n = len(rows)
    n11 = sum(1 for a, b in rows if a and b)
    n10 = sum(1 for a, b in rows if a and not b)
    n01 = sum(1 for a, b in rows if not a and b)
    n00 = n - n11 - n10 - n01
    assert (r.n, r.n_both, r.n_a_only, r.n_b_only, r.n_neither) == (
        n, n11, n10, n01, n00
    )
    po = (n11 + n00) / n
    pa, pb = (n11 + n10) / n, (n11 + n01) / n
    pe = pa * pb + (1 - pa) * (1 - pb)
    kappa = 1.0 if pe == 1.0 else (po - pe) / (1 - pe)
    assert abs(r.po - round(po, 6)) <= 1e-6
    assert abs(r.pe - round(pe, 6)) <= 1e-6
    assert abs(r.kappa - round(kappa, 6)) <= 1e-6


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from("ab"),
              st.lists(st.sampled_from(["xx", "yy", "zz"]),
                       min_size=1, max_size=6)),
    min_size=1, max_size=25,
))
def test_source_token_yield_matches_python_replay(spark, rows):
    """source_token_yield == the pure-Python min-id-keep replay for any
    small corpus — heavy duplication (3-word alphabet), single-doc
    sources, cross-source duplicate groups (the keep goes to ONE
    source; the other's yield drops)."""
    from spear_spark.operators.dedup import source_token_yield

    data = [(i, src, " ".join(ws)) for i, (src, ws) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, source string, text string")
    first: dict = {}
    for i, _, text in data:
        key = text.strip().lower()
        first[key] = min(first.get(key, i), i)
    want: dict = {}
    for i, src, text in data:
        nt = len(text.strip().lower().split())
        kept = first[text.strip().lower()] == i
        w = want.setdefault(src, [0, 0, 0, 0])
        w[0] += 1
        w[1] += 1 if kept else 0
        w[2] += nt
        w[3] += nt if kept else 0
    got = {
        r.source: (r.n_docs, r.n_kept, r.n_tokens, r.kept_tokens, r.yield_frac)
        for r in source_token_yield(df, "text", "doc_id", "source").collect()
    }
    assert set(got) == set(want)
    for src, (nd, nk, nt, kt) in want.items():
        assert got[src] == (nd, nk, nt, kt, round(kt / nt, 6)), src


@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(1, 40)),
        min_size=1, max_size=25,
    ),
    L=st.integers(1, 12),
)
@PROP_SETTINGS
def test_packing_preview_matches_python_replay(spark, rows, L):
    """p139 vs a pure-Python replay: packed/padded/overflow counts and
    the integer-half-up waste fraction on random token-count tables."""
    from spear_spark.operators.text import packing_preview

    df = spark.createDataFrame(
        [(g, " ".join(["w"] * n)) for g, n in rows], "g string, text string"
    )
    got = {
        r.g: (r.n_docs, r.n_tokens, r.n_overflow_docs,
              r.n_seq_packed, r.n_seq_padded, r.pad_waste_frac)
        for r in packing_preview(df, "text", "g", L).collect()
    }
    want: dict = {}
    for g, n in rows:
        w = want.setdefault(g, [0, 0, 0, 0])
        w[0] += 1
        w[1] += n
        w[2] += 1 if n > L else 0
        w[3] += -(-n // L)
    for g, (nd, nt, ov, padded) in want.items():
        packed = -(-nt // L)
        num, den = padded * L - nt, padded * L
        frac = ((num * 2_000_000 + den) // (2 * den)) / 1e6
        assert got[g] == (nd, nt, ov, packed, padded, frac), g


@given(
    flags=st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()),
        min_size=1, max_size=30,
    ),
)
@PROP_SETTINGS
def test_filter_agreement_matrix_matches_python_replay(spark, flags):
    """p138 vs a pure-Python kappa replay on random 3-flag tables —
    counts exact, po/pe/kappa to within rounding tolerance."""
    from spear_spark.operators.stats import filter_agreement_matrix

    df = spark.createDataFrame(flags, "fa boolean, fb boolean, fc boolean")
    got = {
        (r.filter_a, r.filter_b): r
        for r in filter_agreement_matrix(df, ["fa", "fb", "fc"]).collect()
    }
    names = ["fa", "fb", "fc"]
    n = len(flags)
    for i in range(3):
        for j in range(i + 1, 3):
            a = [row[i] for row in flags]
            b = [row[j] for row in flags]
            both = sum(x and y for x, y in zip(a, b))
            aon = sum(x and not y for x, y in zip(a, b))
            bon = sum(y and not x for x, y in zip(a, b))
            nei = n - both - aon - bon
            r = got[(names[i], names[j])]
            assert (r.n, r.n_both, r.n_a_only, r.n_b_only, r.n_neither) == (
                n, both, aon, bon, nei)
            po = (both + nei) / n
            pa, pb = (both + aon) / n, (both + bon) / n
            pe = pa * pb + (1 - pa) * (1 - pb)
            kappa = 1.0 if pe == 1.0 else (po - pe) / (1 - pe)
            assert abs(r.po - po) < 2e-6 and abs(r.pe - pe) < 2e-6
            assert abs(r.kappa - kappa) < 2e-6


@given(
    text=st.text(
        alphabet=st.sampled_from("abcDEF 123.,"), min_size=0, max_size=40
    ) | st.none(),
    n=st.integers(1, 6),
)
@PROP_SETTINGS
def test_char_shingles_match_python_replay(spark, text, n):
    """char_shingles (p134's gram unit) vs Python: distinct n-grams of
    the lower/trim normalization, order of first appearance ignored."""
    from spear_spark.operators.dedup import char_shingles

    df = spark.createDataFrame([(text,)], "text string")
    [row] = df.select(char_shingles("text", n).alias("g")).collect()
    norm = (text or "").strip().lower() if text is not None else ""
    want = list(dict.fromkeys(
        norm[i:i + n] for i in range(max(0, len(norm) - n + 1))
    ))
    assert sorted(row.g) == sorted(want)


@settings(deadline=None, max_examples=10,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=5), st.booleans()),
    min_size=2, max_size=40,
).filter(lambda rs: any(y for _, y in rs) and any(not y for _, y in rs)))
def test_score_auc_matches_pairwise_brute_force(spark, rows):
    """score_auc == the O(n_pos * n_neg) pairwise Mann-Whitney replay
    for any mixed-label table — heavy ties (6-value score grid),
    skewed marginals, tiny groups."""
    from spear_spark.operators.stats import score_auc

    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], "s double, y boolean"
    )
    [r] = score_auc(df, "s", "y").collect()
    pos = [s for s, y in rows if y]
    neg = [s for s, y in rows if not y]
    num = sum(
        1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
    )
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert r.n_scores == len(set(s for s, _ in rows))
    assert abs(r.auc - round(num / (len(pos) * len(neg)), 6)) <= 1e-6


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.booleans()),
    min_size=4, max_size=50,
).filter(lambda rs: any(y for _, y in rs) and any(not y for _, y in rs)))
def test_threshold_sweep_trapezoid_equals_score_auc(spark, rows):
    """Cross-operator consistency: trapezoid integration of the p147
    sweep's ROC points (TPR vs FPR, plus the implicit (0,0) corner)
    reproduces the p142 Mann-Whitney AUC exactly — the two operators
    are two readings of one curve."""
    from spear_spark.operators.stats import score_auc, threshold_sweep

    df = spark.createDataFrame(
        [(float(s), y) for s, y in rows], "s double, y boolean"
    )
    [a] = score_auc(df, "s", "y").collect()
    sweep = sorted(threshold_sweep(df, "s", "y").collect(),
                   key=lambda r: -r.threshold)
    P = sweep[0].tp + sweep[0].fn
    N = sweep[0].fp + sweep[0].tn
    pts = [(0.0, 0.0)] + [(r.fp / N, r.tp / P) for r in sweep]
    trap = sum(
        (x1 - x0) * (y0 + y1) / 2
        for (x0, y0), (x1, y1) in zip(pts, pts[1:])
    )
    assert abs(a.auc - round(trap, 6)) <= 2e-6


@settings(deadline=None, max_examples=8,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=50),
              st.integers(min_value=0, max_value=100)),
    min_size=1, max_size=30,
), st.integers(min_value=0, max_value=400))
def test_token_budget_select_matches_python_prefix(spark, rows, budget):
    """token_budget_select == the pure-Python greedy prefix replay for
    any (tokens, quality) table — zero-token docs, duplicate
    qualities (id tie-break), budget 0, budget beyond the corpus."""
    from spear_spark.operators.sampling import token_budget_select

    table = [(i, t, q / 10.0) for i, (t, q) in enumerate(rows)]
    df = spark.createDataFrame(table, "id long, tokens long, quality double")
    got = sorted(
        (r.id, r.cum_tokens)
        for r in token_budget_select(df, "id", "tokens", "quality", budget).collect()
    )
    exp, cum = [], 0
    for i, t, q in sorted(table, key=lambda r: (-r[2], r[0])):
        cum += t
        if cum > budget:
            break
        exp.append((i, cum))
    assert got == sorted(exp)
