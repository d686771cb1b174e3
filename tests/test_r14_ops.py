"""Referees for the round-14 operators, beyond the DuckDB oracle checks in
test_oracle_queries.py: invariant proofs and pure-Python recounts that would
catch a bug the (structurally similar) oracle might share.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.tables import load_table


def test_kanonymity_totality_and_flags(spark, sf_dir):
    """Every customer row lands in exactly one k-class; shares sum to
    ~10000 bp (floor rounding loses < #classes bp); at_risk marks exactly
    the classes under the threshold."""
    rows = registry.queries()["q_kanonymity_risk"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_records for r in rows) == n_total
    share = sum(r.share_bp for r in rows)
    assert 10000 - len(rows) <= share <= 10000, share
    for r in rows:
        assert r.at_risk == (1 if r.k_class in ("1", "2-4") else 0), r
        assert r.n_groups <= r.n_records, r


def test_mrr_identities(spark, sf_dir):
    """MRR must equal 1/first_rel_rank exactly; recall/precision re-derive
    from the integer counts; all bounded by construction."""
    [r] = registry.queries()["q_retrieval_mrr_eval"](spark, sf_dir).collect()
    assert r.k == 10
    if r.first_rel_rank > 0:
        assert abs(r.mrr - round(1.0 / r.first_rel_rank, 6)) < 1e-12
        assert 1 <= r.first_rel_rank <= r.k
    else:
        assert r.mrr == 0.0 and r.n_rel_at_k == 0
    assert r.n_rel_at_k <= min(r.k, r.total_rel)
    assert abs(r.recall_at_k - round(r.n_rel_at_k / r.total_rel, 6)) < 1e-12
    assert abs(r.precision_at_k - round(r.n_rel_at_k / r.k, 6)) < 1e-12


def test_hits_pure_python_referee(spark, sf_dir):
    """Recompute both HITS iterations from the raw capped edge list in
    plain Python dicts and require the top panel to agree exactly."""
    from changesetmd_spark.operators.cooccurrence import (
        _HITS_TOP,
        _capped_user_items,
    )

    edges = [
        (r.user_id, r.item_id)
        for r in _capped_user_items(spark, sf_dir).collect()
    ]
    a1 = Counter(i for _, i in edges)
    h1 = defaultdict(int)
    for u, i in edges:
        h1[u] += a1[i]
    a2 = defaultdict(int)
    for u, i in edges:
        a2[i] += h1[u]
    mx = max(a2.values())
    expect = sorted(a2.items(), key=lambda kv: (-kv[1], kv[0]))[:_HITS_TOP]
    got = registry.queries()["q_hits_bipartite"](spark, sf_dir).collect()
    assert [(r.item_id, r.authority2) for r in got] == expect
    for r in got:
        assert r.degree == a1[r.item_id]
        assert abs(r.score - round(r.authority2 / mx, 6)) < 1e-12
    assert max(r.score for r in got) == 1.0


def test_containment_invariants(spark, sf_dir):
    """Containment >= Jaccard always (|A∩B|/min >= |A∩B|/|A∪B|), every
    emitted pair clears the gate, and the orientation points at a doc
    whose FILTERED shingle set is no larger than its container's —
    checked by recomputing both sizes from the same postings."""
    from changesetmd_spark.operators.dedup import (
        _CONTAIN_MIN,
        _JACCARD_DF_CAP,
        hashed_shingle_docs,
    )
    from changesetmd_spark.operators.util import drop_oversized_groups

    rows = registry.queries()["q_containment_pairs"](spark, sf_dir).collect()
    assert rows, "fixture has no containment pairs: test is vacuous"
    for r in rows:
        assert r.containment >= r.jaccard - 1e-9, r
        assert r.containment >= _CONTAIN_MIN, r
    posts = hashed_shingle_docs(spark, sf_dir).select(
        "doc_id", F.explode("sh").alias("s")
    )
    sz = {
        r.doc_id: r.sz
        for r in drop_oversized_groups(posts, "s", _JACCARD_DF_CAP)
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
        .collect()
    }
    for r in rows:
        a, b = sz[r.contained_doc], sz[r.container_doc]
        assert a < b or (a == b and r.contained_doc < r.container_doc), r


def test_length_bucketing_partition_of_corpus(spark, sf_dir):
    """Buckets partition the (non-empty) corpus exactly once; capacity and
    both waste columns re-derive from the integer counts; bucket bounds
    are true powers of two."""
    rows = registry.queries()["q_length_bucket_packing"](
        spark, sf_dir
    ).collect()
    from changesetmd_spark.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        token_count(F.col("text")).alias("n")
    )
    n_docs = docs.filter(F.col("n") >= 1).count()
    max_n = docs.agg(F.max("n")).first()[0]
    tot = docs.filter(F.col("n") >= 1).agg(F.sum("n")).first()[0]
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.total_tokens for r in rows) == tot
    g_waste = (n_docs * max_n - tot) * 10000 // (n_docs * max_n)
    for r in rows:
        assert r.bucket_max & (r.bucket_max - 1) == 0, r
        assert r.capacity == r.n_docs * r.bucket_max
        assert (
            r.padding_waste_bp
            == (r.capacity - r.total_tokens) * 10000 // r.capacity
        )
        assert r.unbucketed_waste_bp == g_waste


def test_kneser_ney_pure_python_referee(spark, sf_dir):
    """Recompute every panel column from raw token lists in plain Python:
    integer columns must match exactly, probabilities to 1e-9, and the
    smoothing must actually transfer mass (p_kn != p_mle somewhere)."""
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    c2: Counter = Counter()
    for t in texts:
        toks = t.strip().lower().split()
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] += 1
    n1: Counter = Counter()
    fan: Counter = Counter()
    pre: Counter = Counter()
    for (a, b), n in c2.items():
        n1[a] += n
        fan[a] += 1
        pre[b] += 1
    n_types = len(c2)
    top = sorted(c2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = registry.queries()["q_kneser_ney_bigram"](spark, sf_dir).collect()
    got = sorted(got, key=lambda r: (-r.n2, r.a, r.b))
    assert [(r.a, r.b, r.n2) for r in got] == [
        (a, b, n) for (a, b), n in top
    ]
    moved = False
    for r in got:
        assert r.n1 == n1[r.a] and r.fanout_a == fan[r.a]
        assert r.precede_b == pre[r.b]
        pkn = (r.n2 - 0.75) / r.n1 + 0.75 * r.fanout_a / r.n1 * (
            r.precede_b / n_types
        )
        assert abs(r.p_kn - round(pkn, 6)) < 1e-9, r
        assert 0.0 < r.p_kn < 1.0
        if abs(r.p_kn - r.p_mle) > 1e-6:
            moved = True
    assert moved, "KN smoothing changed nothing: vacuous panel"


def test_r14_oracle_fidelity_sf001(spark):
    """Driver-fidelity pass at sf0.01 for all six r14 queries (the suite
    default sf0.001 can hide decimal/rounding divergences)."""
    names = [
        "q_kanonymity_risk",
        "q_retrieval_mrr_eval",
        "q_hits_bipartite",
        "q_containment_pairs",
        "q_length_bucket_packing",
        "q_kneser_ney_bigram",
        "q_pmi_collocations",
        "q_charclass_entropy",
        "q_semantic_outlier_docs",
        "q10_returned_item_revenue",
        "q14_promo_revenue_share",
        "q7_nation_volume_shipping",
        "q_ks_value_drift",
        "q_winsorized_stats",
        "q_gini_user_concentration",
        "q_funnel_time_to_convert",
        "q_multimodal_audio_stats",
        "q_hourly_ohlc",
    ]
    sf = "/root/testdata/sf0.01"
    qs, osql = registry.queries(), registry.oracles()
    con = duckdb.connect()
    for t in (
        "customer",
        "documents",
        "events",
        "embeddings",
        "orders",
        "lineitem",
        "nation",
        "part",
        "supplier",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    for name in names:
        got = sorted(
            map(
                lambda r: tuple(
                    round(v, 6) if isinstance(v, float) else v for v in r
                ),
                qs[name](spark, sf).collect(),
            )
        )
        want = sorted(
            map(
                lambda r: tuple(
                    round(v, 6) if isinstance(v, float) else v for v in r
                ),
                con.execute(osql[name]).fetchall(),
            )
        )
        assert got == want, name


def test_pmi_floor_and_rounded_ordering(spark, sf_dir):
    """Every panel row clears the hapax floor; the ordering key is the
    ROUNDED pmi (recompute and re-sort in Python); PMI re-derives from
    the integer counts."""
    rows = registry.queries()["q_pmi_collocations"](spark, sf_dir).collect()
    assert rows
    from changesetmd_spark.operators.curation import _PMI_MIN_N2

    docs = [
        r.text.strip().lower().split()
        for r in load_table(spark, sf_dir, "documents")
        .select("text")
        .collect()
    ]
    tb = sum(max(len(t) - 1, 0) for t in docs if len(t) >= 2)
    tu = sum(len(t) for t in docs if len(t) >= 2)
    for r in rows:
        assert r.n2 >= _PMI_MIN_N2
        expect = math.log(
            (r.n2 / tb) / ((r.n_a / tu) * (r.n_b / tu))
        )
        assert abs(r.pmi - round(expect, 6)) < 1e-9, r
    keys = [(-r.pmi, r.a, r.b) for r in rows]
    assert keys == sorted(keys)


def test_charclass_entropy_bounds_and_recount(spark, sf_dir):
    """Entropy over 4 classes is bounded by log2(4)=2; per-source doc
    counts must cover the corpus; recount one source's mean from raw
    text in pure Python."""
    rows = registry.queries()["q_charclass_entropy"](spark, sf_dir).collect()
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.length("text") > 0)
        .count()
    )
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r.min_entropy <= r.mean_entropy <= r.max_entropy <= 2.0
    src0 = min(r.source for r in rows)
    texts = [
        r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter((F.col("source") == src0) & (F.length("text") > 0))
        .select("text")
        .collect()
    ]

    def ent(t: str) -> float:
        import re as _re

        L = len(t)
        cl = len(_re.findall(r"[a-zA-Z]", t))
        cd = len(_re.findall(r"[0-9]", t))
        cs = len(_re.findall(r"[ \t\n]", t))
        co = L - cl - cd - cs
        h = 0.0
        for c in (cl, cd, cs, co):
            if c > 0:
                p = c / L
                h -= p * math.log2(p)
        return round(h, 6)

    want = sum(ent(t) for t in texts) / len(texts)
    got = next(r.mean_entropy for r in rows if r.source == src0)
    assert abs(got - want) < 1e-5, (got, want)


def test_semantic_outliers_numpy_referee(spark, sf_dir):
    """numpy recompute: for every label, the reported vecs must be the
    top-3 by distance to the label mean of the 1e6-quantized coords, and
    dist6 must match the closed form."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label: dict[int, list] = {}
    for r in emb:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.round(np.array(r.embedding, dtype=np.float64) * 1e6))
        )
    got = registry.queries()["q_semantic_outlier_docs"](
        spark, sf_dir
    ).collect()
    by_got: dict[int, list] = {}
    for r in got:
        by_got.setdefault(r.label, []).append(r)
    for label, vecs in by_label.items():
        n = len(vecs)
        s = np.sum([v for _, v in vecs], axis=0)
        scored = sorted(
            (
                (int(((n * v - s) ** 2).sum()), vid)
                for vid, v in vecs
            ),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        panel = sorted(by_got[label], key=lambda r: r.rnk)
        assert [r.vec_id for r in panel] == [vid for _, vid in scored], label
        for r, (dd, _) in zip(panel, scored):
            assert abs(r.dist6 - round(math.sqrt(dd) / (n * 1e6), 6)) < 1e-9


def test_ks_drift_pure_python_referee(spark, sf_dir):
    """Recompute the per-type KS statistic from raw events in pure
    Python (cent-quantized, cross-multiplied integers) and require exact
    agreement; KS must be in [0, 1]."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "value"
    ).collect()
    per: dict[str, Counter] = {}
    for r in ev:
        c = per.setdefault(r.event_type, Counter())
        c[(round(r.value * 100), r.event_id % 2)] += 1
    got = {
        r.event_type: r
        for r in registry.queries()["q_ks_value_drift"](
            spark, sf_dir
        ).collect()
    }
    for t, c in per.items():
        cents = sorted({k for k, _ in c})
        n1 = sum(v for (k, h), v in c.items() if h == 0)
        n2 = sum(v for (k, h), v in c.items() if h == 1)
        f1 = f2 = 0
        d = 0
        for k in cents:
            f1 += c.get((k, 0), 0)
            f2 += c.get((k, 1), 0)
            d = max(d, abs(n2 * f1 - n1 * f2))
        r = got[t]
        assert (r.n_base, r.n_incoming, r.d_num) == (n1, n2, d), t
        assert 0.0 <= r.ks <= 1.0
        assert abs(r.ks - round(d / (n1 * n2), 6)) < 1e-12


def test_gini_pure_python_referee(spark, sf_dir):
    """Recompute Gini + top-1% share from raw per-user counts."""
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").count()
    xs = sorted((r["count"], r.user_id) for r in ev.collect())
    n = len(xs)
    s = sum(x for x, _ in xs)
    ix = sum((i + 1) * x for i, (x, _) in enumerate(xs))
    gini = round((2 * ix - (n + 1) * s) / (n * s), 6)
    top = sum(x for x, _ in xs[n - (n + 99) // 100:])
    [r] = registry.queries()["q_gini_user_concentration"](
        spark, sf_dir
    ).collect()
    assert (r.n_users, r.total_events) == (n, s)
    assert abs(r.gini - gini) < 1e-12
    assert r.top1pct_share_bp == top * 10000 // s
    assert 0.0 <= r.gini < 1.0


def test_winsorized_mean_bounded_by_raw_extremes(spark, sf_dir):
    """The winsorized mean must sit inside [p01, p99]; clip counts are
    consistent with n; clipping must actually fire somewhere (the
    fixture has 1% tails by construction)."""
    rows = registry.queries()["q_winsorized_stats"](spark, sf_dir).collect()
    assert rows
    assert any(r.n_clipped_low + r.n_clipped_high > 0 for r in rows)
    for r in rows:
        assert r.p01 <= r.winsorized_mean <= r.p99, r
        assert r.n_clipped_low + r.n_clipped_high <= r.n


def test_funnel_ttc_consistency(spark, sf_dir):
    """Conversions + no-prior-view must cover all purchases; the
    percentiles are ordered; every delta is non-negative by the as-of
    contract (a prior view precedes its purchase)."""
    [r] = registry.queries()["q_funnel_time_to_convert"](
        spark, sf_dir
    ).collect()
    assert r.n_converted + r.n_no_prior_view == r.n_purchases
    assert 0 <= r.p50_sec <= r.p90_sec <= r.max_sec


def test_ohlc_invariants(spark, sf_dir):
    """low <= open, close <= high for every bar; bar event counts must
    cover the corpus exactly once; open==close wherever n==1."""
    rows = registry.queries()["q_hourly_ohlc"](spark, sf_dir).collect()
    assert sum(r.n for r in rows) == load_table(
        spark, sf_dir, "events"
    ).count()
    for r in rows:
        assert r.low <= r.open <= r.high, r
        assert r.low <= r.close <= r.high, r
        if r.n == 1:
            assert r.open == r.close == r.high == r.low, r
