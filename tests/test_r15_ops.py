"""Referees for the round-15 operators, beyond the DuckDB oracle checks in
test_oracle_queries.py: invariant proofs and pure-Python recounts that would
catch a bug the (structurally similar) oracle might share.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.tables import load_table

QS = registry.queries()


def test_q18_threshold_and_ordering(spark, sf_dir):
    """Every reported order's quantity sum exceeds the HAVING threshold,
    the cut agrees with a pandas recount, and the top-100 is ordered by
    (totalprice desc, orderkey)."""
    from changesetmd_spark.operators.relational import _Q18_MIN_QTY

    rows = QS["q18_large_volume_orders"](spark, sf_dir).collect()
    assert rows, "fixture must produce large-volume orders"
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_quantity")
        .toPandas()
    )
    sums = li.groupby("l_orderkey")["l_quantity"].sum()
    big = {int(k) for k, v in sums.items() if round(v, 2) > _Q18_MIN_QTY}
    assert all(r.sum_qty > _Q18_MIN_QTY for r in rows)
    assert {r.o_orderkey for r in rows} <= big
    if len(big) <= 100:
        assert {r.o_orderkey for r in rows} == big
    key = [(-r.o_totalprice, r.o_orderkey) for r in rows]
    assert key == sorted(key)
    for r in rows:
        assert abs(r.sum_qty - round(float(sums[r.o_orderkey]), 2)) < 1e-9


def test_part_value_share_cut_and_ppm(spark, sf_dir):
    """The share cut is exactly val·DEN > tot (so every survivor's ppm
    clears the 10⁶/DEN floor), shares can never exceed 10⁶ total, and the
    survivor set matches a pandas recount on exact cents."""
    from changesetmd_spark.operators.relational import _Q11_SHARE_DEN

    rows = QS["q_part_value_share"](spark, sf_dir).collect()
    assert rows
    floor_ppm = 1_000_000 // _Q11_SHARE_DEN
    assert all(r.share_ppm >= floor_ppm for r in rows)
    assert sum(r.share_ppm for r in rows) <= 1_000_000
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    cents = defaultdict(int)
    for pk, price, disc in zip(
        li["l_partkey"], li["l_extendedprice"], li["l_discount"]
    ):
        # money(18,2) * (1 - rate(6,4)) keeps 6 decimals exactly
        v = round(
            round(price * 100) * round((1 - round(disc, 4)) * 10000)
        )  # in 1e-6 units
        cents[int(pk)] += v
    tot = sum(cents.values())
    expect = {pk for pk, v in cents.items() if v * _Q11_SHARE_DEN > tot}
    assert {r.partkey for r in rows} == expect


def test_argmin_supplier_is_groupwise_minimum(spark, sf_dir):
    """The reported supplier's total cost is <= every other supplier's
    total for the same part (pandas recount), with the suppkey tie-break."""
    rows = QS["q_argmin_supplier_per_part"](spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem").toPandas()
    cost = defaultdict(int)
    for pk, sk, price, disc in zip(
        li["l_partkey"], li["l_suppkey"], li["l_extendedprice"], li["l_discount"]
    ):
        cost[(int(pk), int(sk))] += round(
            round(price * 100) * round((1 - round(disc, 4)) * 10000)
        )
    best: dict[int, tuple[int, int]] = {}
    for (pk, sk), c in cost.items():
        if pk not in best or (c, sk) < best[pk]:
            best[pk] = (c, sk)
    assert len(rows) == len(best)
    for r in rows:
        c, sk = best[r.partkey]
        assert r.suppkey == sk, (r.partkey, r.suppkey, sk)
        assert abs(r.min_cost - c / 1e6) < 1e-6


def test_interarrival_gap_accounting(spark, sf_dir):
    """Σ n_gaps over all types must equal N_events − N_users (one gap per
    event after each user's first), gaps are non-negative, and p50 ≤ p90
    ≤ max per type."""
    rows = QS["q_interarrival_stats"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_gaps for r in rows) == n_events - n_users
    for r in rows:
        assert 0 <= r.p50_sec <= r.p90_sec <= r.max_sec, r
        assert 0 <= r.mean_sec <= r.max_sec, r


def test_max_drawdown_bounds_and_argmax_hour(spark, sf_dir):
    """Drawdown bp lies in [0, 10000]; the reported hour reproduces the
    max drawdown in a pandas recount and is the EARLIEST such hour."""
    rows = QS["q_max_drawdown"](spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hr"
        ),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).toPandas()
    per = ev.groupby(["event_type", "hr"])["cents"].sum()
    for r in rows:
        assert 0 <= r.max_drawdown_bp <= 10000, r
        series = sorted(
            (hr, c) for (t, hr), c in per.items() if t == r.event_type
        )
        peak, best, best_hr = 0, -1, None
        for hr, c in series:
            peak = max(peak, c)
            dd = (peak - c) * 10000 // peak if peak > 0 else 0
            if dd > best:
                best, best_hr = dd, hr
        assert r.max_drawdown_bp == best, r
        assert r.drawdown_hour == best_hr, (r.drawdown_hour, best_hr)
        assert r.n_hours == len(series)


def test_ldiversity_totality_and_flags(spark, sf_dir):
    """Every customer lands in exactly one (l-class) bucket; l ≥ 1; the
    at_risk flag marks exactly l < threshold."""
    from changesetmd_spark.operators.privacy import _L_THRESHOLD

    rows = QS["q_ldiversity_risk"](spark, sf_dir).collect()
    n_total = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_records for r in rows) == n_total
    for r in rows:
        assert r.l >= 1
        assert r.min_group_size >= 1
        assert r.at_risk == (1 if r.l < _L_THRESHOLD else 0), r


def test_silhouette_bounds_and_totality(spark, sf_dir):
    """Silhouette means lie in [-1, 1], every vector is scored exactly
    once, and negative counts never exceed the label's size."""
    rows = QS["q_cluster_silhouette"](spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_vectors for r in rows) == n_vecs
    for r in rows:
        assert -1.0 <= r.mean_silhouette <= 1.0, r
        assert 0 <= r.n_negative <= r.n_vectors, r


def test_referential_integrity_on_clean_and_dirty_frames(spark, sf_dir):
    """The clean fixture must audit clean (orphans/violations all zero);
    the count identities hold; and the NaN / zero-norm / dimension
    predicates are proven non-vacuous on a constructed frame pushed
    through the same column expressions."""
    [r] = QS["q_referential_integrity_audit"](spark, sf_dir).collect()
    assert r.n_docs == r.n_vecs
    assert (
        r.docs_without_vec
        == r.vecs_without_doc
        == r.dim_violations
        == r.vecs_with_nan
        == r.zero_norm_vecs
        == 0
    )
    # non-vacuity: the same predicates on a planted-dirty frame
    from changesetmd_spark.operators.similarity import _DIM, dot, to_double_vec

    dirty = spark.createDataFrame(
        [
            (1, [1.0] * _DIM),
            (2, [0.0] * _DIM),
            (3, [float("nan")] + [1.0] * (_DIM - 1)),
            (4, [1.0] * (_DIM - 1)),
        ],
        "vec_id long, embedding array<double>",
    )
    got = dirty.select(
        F.size("embedding").alias("dim"),
        F.size(
            F.filter(to_double_vec(F.col("embedding")), lambda x: F.isnan(x))
        ).alias("n_nan"),
        dot(
            to_double_vec(F.col("embedding")), to_double_vec(F.col("embedding"))
        ).alias("sq"),
    ).collect()
    assert sum(1 for g in got if g.dim != _DIM) == 1
    assert sum(1 for g in got if g.n_nan > 0) == 1
    assert sum(1 for g in got if g.sq == 0.0) == 1


def test_cohens_kappa_pure_python_recount(spark, sf_dir):
    """κ re-derived in exact Python rationals from the raw documents."""
    [r] = QS["q_cohens_kappa_langid"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("lang", "text").toPandas()
    a = [1 if v == "en" else 0 for v in docs["lang"]]
    b = [1 if " the " in t.lower() else 0 for t in docs["text"]]
    n = len(a)
    a1, b1 = sum(a), sum(b)
    agree = sum(1 for x, y in zip(a, b) if x == y)
    pe_num = a1 * b1 + (n - a1) * (n - b1)
    kappa = round((n * agree - pe_num) / (n * n - pe_num), 6)
    assert (r.n_docs, r.label_en, r.heuristic_en, r.n_agree) == (
        n,
        a1,
        b1,
        agree,
    )
    assert abs(r.kappa - kappa) < 1e-12
    assert -1.0 <= r.kappa <= 1.0


def test_subsample_ci_well_formed(spark, sf_dir):
    """All 32 replicates materialize (the KM bit halves the corpus, it
    never empties it), the CI is ordered, and the replicate means bracket
    the full mean within the CI at this fixture size."""
    [r] = QS["q_subsample_stability_ci"](spark, sf_dir).collect()
    assert r.n_resamples == 32
    assert r.ci_low <= r.ci_high
    assert r.ci_low <= r.full_mean <= r.ci_high
    assert r.n_events > 0


def test_tokenizer_fertility_floor(spark, sf_dir):
    """Every whitespace token splits into ≥1 BPE pre-tokens, so fertility
    ≥ 1000 per-mille and bpe_tokens ≥ ws_tokens; chars-per-token ≥ 1000
    (a pre-token is at least one char)."""
    rows = QS["q_tokenizer_fertility"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.bpe_tokens >= r.ws_tokens > 0, r
        assert r.fertility_x1000 >= 1000, r
        assert r.chars_per_bpe_x1000 >= 1000, r


def test_chi2_identities_and_scipy_free_recount(spark, sf_dir):
    """χ² ≥ 0, dof = (r−1)(c−1), Cramér's V ∈ [0,1], and the statistic
    matches an exact pure-Python contingency recount (same micro-unit
    quantization)."""
    [r] = QS["q_chi2_independence"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("source", "lang").toPandas()
    obs: dict[tuple[str, str], int] = defaultdict(int)
    for s, lg in zip(docs["source"], docs["lang"]):
        obs[(s, lg)] += 1
    sources = sorted({s for s, _ in obs})
    langs = sorted({lg for _, lg in obs})
    n = len(docs)
    rt = {s: sum(v for (s2, _), v in obs.items() if s2 == s) for s in sources}
    ct = {lg: sum(v for (_, l2), v in obs.items() if l2 == lg) for lg in langs}
    t_u = 0
    for s in sources:
        for lg in langs:
            o = obs.get((s, lg), 0)
            diff = float(o * n - rt[s] * ct[lg])
            t_u += round(diff * diff / (float(n) * rt[s] * ct[lg]) * 1e6)
    chi2 = round(t_u / 1e6, 4)
    assert (r.n_sources, r.n_langs) == (len(sources), len(langs))
    assert r.dof == (len(sources) - 1) * (len(langs) - 1)
    assert abs(r.chi2 - chi2) < 1e-9
    v = round(
        math.sqrt(t_u / 1e6 / (n * (min(len(sources), len(langs)) - 1))), 6
    )
    assert abs(r.cramers_v - v) < 1e-9
    assert 0.0 <= r.cramers_v <= 1.0


def test_q13_totality_and_zero_bucket(spark, sf_dir):
    """Customer totality across buckets; the zero-order bucket exists iff
    some customer placed no orders (recount)."""
    rows = QS["q13_order_count_distribution"](spark, sf_dir).collect()
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(r.n_customers for r in rows) == n_cust
    n_with_orders = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    zero = {r.n_orders: r.n_customers for r in rows}.get(0, 0)
    assert zero == n_cust - n_with_orders


def test_fano_and_autocorr_recounts(spark, sf_dir):
    """Fano and lag-1 autocorrelation re-derived from a pandas hourly
    recount; Fano ≥ 0, r1 ∈ [-1, 1]."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).toPandas()
    per = ev.groupby(["event_type", "hr"]).size()
    fano_rows = {r.event_type: r for r in QS["q_fano_burstiness"](spark, sf_dir).collect()}
    ac_rows = {r.event_type: r for r in QS["q_autocorr_lag1"](spark, sf_dir).collect()}
    import pandas as pd

    for t in fano_rows:
        cs = per[t].sort_index()
        n, s, s2 = len(cs), int(cs.sum()), int((cs * cs).sum())
        r = fano_rows[t]
        assert r.n_hours == n and r.n_events == s
        assert abs(r.fano - round((n * s2 - s * s) / (n * s), 6)) < 1e-9
        assert r.fano >= 0
        # consecutive-present-hour pairs
        idx = list(cs.index)
        pairs = [
            (int(cs.iloc[i]), int(cs.iloc[i + 1]))
            for i in range(len(idx) - 1)
            if (idx[i + 1] - idx[i]) == pd.Timedelta(hours=1)
        ]
        a = ac_rows[t]
        assert a.n_pairs == len(pairs)
        if pairs:
            np_ = len(pairs)
            sx = sum(x for x, _ in pairs); sy = sum(y for _, y in pairs)
            sxx = sum(x * x for x, _ in pairs); syy = sum(y * y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            r1 = round(
                (np_ * sxy - sx * sy)
                / math.sqrt((np_ * sxx - sx * sx) * (np_ * syy - sy * sy)),
                6,
            )
            assert abs(a.r1 - r1) < 1e-9
            assert -1.0 <= a.r1 <= 1.0


def test_pareto_frontier_is_exactly_the_undominated_set(spark, sf_dir):
    """Brute-force O(n²) domination recount over (len, diversity)."""
    rows = QS["q_pareto_frontier_docs"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text").toPandas()
    pts = {}
    for did, ln, txt in zip(docs["doc_id"], docs["n_chars"], docs["text"]):
        toks = txt.lower().strip().split()
        if not toks:
            continue
        pts[int(did)] = (int(ln), len(set(toks)) * 1000 // len(toks))
    frontier = {
        d
        for d, (ln, q) in pts.items()
        if not any(
            (l2 >= ln and q2 >= q and (l2 > ln or q2 > q))
            for d2, (l2, q2) in pts.items()
            if d2 != d
        )
    }
    assert {r.doc_id for r in rows} == frontier
    for r in rows:
        assert pts[r.doc_id] == (r.n_chars, r.diversity_x1000)


def test_ess_closed_form_and_bounds(spark, sf_dir):
    """ESS = S²/Σ(1/n_s) recount; 0 < ESS ≤ N with equality iff balanced."""
    [r] = QS["q_effective_sample_size"](spark, sf_dir).collect()
    src = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .count()
        .collect()
    )
    ns = [x["count"] for x in src]
    inv_u = sum(round(1e12 / n) for n in ns)
    ess = round(len(ns) * len(ns) * 1e12 / inv_u, 4)
    assert r.n_sources == len(ns) and r.n_docs == sum(ns)
    assert abs(r.ess - ess) < 1e-9
    assert 0 < r.ess <= r.n_docs + 1e-6
    assert abs(r.ess_fraction - round(ess / sum(ns), 6)) < 1e-9


def test_stream_ohlc_agrees_with_batch(spark, sf_dir):
    """The streaming OHLC twin must reproduce the batch operator's bars
    exactly on complete data (availableNow processes everything)."""
    batch = {
        (r.event_type, r.bucket): (r.n, r.open, r.high, r.low, r.close)
        for r in QS["q_hourly_ohlc"](spark, sf_dir).collect()
    }
    stream = {
        (r.event_type, r.window_start): (r.n, r.open, r.high, r.low, r.close)
        for r in QS["q_stream_hourly_ohlc"](spark, sf_dir).collect()
    }
    assert stream == batch


def test_source_vocab_overlap_recount(spark, sf_dir):
    """Exact Jaccard recount in pure Python over source vocab sets."""
    rows = QS["q_source_vocab_overlap"](spark, sf_dir).collect()
    assert len(rows) == 30
    docs = load_table(spark, sf_dir, "documents").select("source", "text").toPandas()
    vocab: dict[str, set] = defaultdict(set)
    for s, t in zip(docs["source"], docs["text"]):
        if t.strip():
            vocab[s].update(t.lower().strip().split())
    pairs = []
    srcs = sorted(vocab)
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            inter = len(vocab[s1] & vocab[s2])
            j = round(inter / len(vocab[s1] | vocab[s2]), 6)
            pairs.append((j, s1, s2, inter))
    pairs.sort(key=lambda p: (-p[0], p[1], p[2]))
    for r, (j, s1, s2, inter) in zip(rows, pairs[:30]):
        assert (r.source_1, r.source_2, r.inter) == (s1, s2, inter)
        assert abs(r.jaccard - j) < 1e-12
        assert (r.v1, r.v2) == (len(vocab[s1]), len(vocab[s2]))


def test_rendezvous_minimal_disruption_property(spark, sf_dir):
    """The HRW defining property: dropping one shard relocates ONLY the
    keys assigned to it (pure-Python recount with the same md5 weights),
    and loads recount exactly."""
    import hashlib

    from changesetmd_spark.operators.layout import _HRW_SHARDS

    rows = QS["q_rendezvous_shard_balance"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()

    def weight(did, s):
        return int(hashlib.md5(f"{did}:{s}".encode()).hexdigest()[:15], 16)

    def assign(did, shards):
        return max(shards, key=lambda s: (weight(did, s), -s))

    full = {int(d): assign(int(d), range(_HRW_SHARDS)) for d in docs["doc_id"]}
    counts = defaultdict(int)
    for s in full.values():
        counts[s] += 1
    assert {r.shard: r.n_docs for r in rows} == dict(counts)
    # drop shard 0: every key NOT on shard 0 must keep its assignment
    reduced = {d: assign(d, range(1, _HRW_SHARDS)) for d in full}
    moved = {d for d in full if full[d] != reduced[d]}
    assert moved == {d for d, s in full.items() if s == 0}
    n = len(full)
    for r in rows:
        assert r.load_x10000 == r.n_docs * _HRW_SHARDS * 10000 // n
        assert r.imbalance_x10000 == max(counts.values()) * 10000 // min(counts.values())


def test_psi_pure_python_recount(spark, sf_dir):
    """PSI re-derived in pure Python with the same cut/smoothing recipe;
    PSI ≥ 0 only when distributions differ in the same direction per bin
    is NOT guaranteed — but PSI is always ≥ 0 since (p−q)·ln(p/q) ≥ 0
    per bin; identical halves give PSI ≈ 0."""
    rows = {r.event_type: r for r in QS["q_psi_value_drift"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        (F.col("event_id") % 2).alias("half"),
    ).toPandas()
    import numpy as np

    for t, grp in ev.groupby("event_type"):
        base = sorted(grp[grp["half"] == 0]["cents"])
        cuts = [
            round(float(np.percentile(base, p, method="linear")), 4)
            for p in range(10, 100, 10)
        ]
        nbins = None
        cb, ci = defaultdict(int), defaultdict(int)
        for cents, half in zip(grp["cents"], grp["half"]):
            b = sum(1 for c in cuts if cents > c)
            (cb if half == 0 else ci)[b] += 1
        bins = sorted(set(cb) | set(ci))
        nb, ni, k = sum(cb.values()), sum(ci.values()), len(bins)
        t_u = 0
        for b in bins:
            p = (cb.get(b, 0) + 1.0) / (nb + k)
            q = (ci.get(b, 0) + 1.0) / (ni + k)
            t_u += round((p - q) * math.log(p / q) * 1e9)
        r = rows[t]
        assert (r.n_base, r.n_incoming) == (nb, ni)
        assert abs(r.psi - round(t_u / 1e9, 6)) < 1e-9
        assert r.psi >= 0


def test_fellegi_sunter_weight_recount(spark, sf_dir):
    """FS weights recomputed in pure Python from exact u-rationals; the
    top-20 ordering and every field pattern's weight must agree."""
    rows = QS["q_fellegi_sunter_scores"](spark, sf_dir).collect()
    assert len(rows) == 20
    from changesetmd_spark.operators.fuzzy import _FS_M, _FUZZY_BLOCK_LEN

    c = load_table(spark, sf_dir, "customer").toPandas()
    recs = {
        int(r.c_custkey): (
            r.c_name,
            int(r.c_nationkey),
            r.c_mktsegment,
            math.floor(r.c_acctbal / 1000),
        )
        for r in c.itertuples()
    }
    n = len(recs)

    def u_rat(idx):
        counts = defaultdict(int)
        for v in recs.values():
            counts[v[idx]] += 1
        return sum(k * (k - 1) for k in counts.values()) / (n * (n - 1))

    us = {"nation": u_rat(1), "seg": u_rat(2), "bal": u_rat(3)}
    # verify each returned pair's weight from its agreement pattern
    for r in rows:
        a, b = recs[r.custkey_1], recs[r.custkey_2]
        assert a[0][:_FUZZY_BLOCK_LEN] == b[0][:_FUZZY_BLOCK_LEN]
        w = 0.0
        agree = 0
        for key, idx in (("nation", 1), ("seg", 2), ("bal", 3)):
            m, u = _FS_M[key], us[key]
            if a[idx] == b[idx]:
                w += math.log(m) - math.log(u)
                agree += 1
            else:
                w += math.log(1 - m) - math.log(1 - u)
        assert r.n_agree == agree
        assert abs(r.fs_weight - round(w, 6)) < 1e-9
    # descending weight with deterministic tie-break
    key = [(-r.fs_weight, r.custkey_1, r.custkey_2) for r in rows]
    assert key == sorted(key)


def test_cusum_pure_python_recount(spark, sf_dir):
    """Change-point hour and deviation recomputed exactly in Python ints."""
    rows = {r.event_type: r for r in QS["q_cusum_changepoint"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hr"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    ).toPandas()
    per = ev.groupby(["event_type", "hr"])["cents"].sum()
    for t in rows:
        series = sorted((hr, int(x)) for (t2, hr), x in per.items() if t2 == t)
        n, s = len(series), sum(x for _, x in series)
        cum, best, best_hr = 0, -1, None
        for k, (hr, x) in enumerate(series, start=1):
            cum += x
            adev = abs(n * cum - k * s)
            if adev > best:
                best, best_hr = adev, hr
        r = rows[t]
        assert r.n_hours == n
        assert r.changepoint_hour == best_hr
        assert r.max_dev_bp == best * 10000 // (n * s)


def test_temporal_split_identities(spark, sf_dir):
    """Presence-bit identities: u_both ≤ min(u_train, u_eval); event
    totality; shares recount from a pandas pass."""
    [r] = QS["q_temporal_split_audit"](spark, sf_dir).collect()
    from changesetmd_spark.operators.curation import _SPLIT_CUTOFF

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", F.get_json_object("props", "$.k").cast("long").alias("item")
    ).toPandas()
    import pandas as pd

    cutoff = pd.Timestamp(_SPLIT_CUTOFF)
    tr = ev[ev["ts"] < cutoff]
    evl = ev[ev["ts"] >= cutoff]
    assert (r.n_train, r.n_eval) == (len(tr), len(evl))
    ut, ue = set(tr["user_id"]), set(evl["user_id"])
    assert (r.u_train, r.u_eval, r.u_both) == (len(ut), len(ue), len(ut & ue))
    assert r.eval_users_seen_bp == len(ut & ue) * 10000 // len(ue)
    it, ie = set(tr["item"]), set(evl["item"])
    assert r.eval_items_seen_bp == len(it & ie) * 10000 // len(ie)


def test_welch_ttest_scipy_free_recount(spark, sf_dir):
    """t statistic and Welch dof recomputed from exact integer sums."""
    [r] = QS["q_welch_ttest_cohorts"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value").toPandas()
    stats = {}
    for c in (0, 1):
        xs = [round(v * 100) for u, v in zip(ev["user_id"], ev["value"]) if u % 2 == c]
        n, s, s2 = len(xs), sum(xs), sum(x * x for x in xs)
        stats[c] = (n, s, s2, (n * s2 - s * s) / (n * n * (n - 1)))
    (na, sa, _, va), (nb, sb, _, vb) = stats[0], stats[1]
    t = round((sa / na - sb / nb) / math.sqrt(va + vb), 6)
    dof = round((va + vb) ** 2 / (va**2 / (na - 1) + vb**2 / (nb - 1)), 4)
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.t_stat - t) < 1e-9
    assert abs(r.welch_dof - dof) < 1e-9
    assert min(na, nb) - 1 <= r.welch_dof <= na + nb - 2


def test_benford_totality_and_expectation(spark, sf_dir):
    """Digits 1-9 cover every positive value; expected bp sum to ~10000;
    observed bp recount."""
    rows = QS["q_benford_digit_audit"](spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    total = sum(r.n for r in rows)
    for r in rows:
        assert r.obs_bp == r.n * 10000 // total
        assert r.dev_bp == r.obs_bp - r.exp_bp
        assert abs(r.exp_bp - math.floor(math.log10(1 + 1 / r.digit) * 10000)) == 0
    assert 9991 <= sum(r.exp_bp for r in rows) <= 10000  # floor loses <9 bp


def test_mann_whitney_pure_python_recount(spark, sf_dir):
    """2U and the tie-corrected z recomputed from Counters (the direct
    pairwise definition), plus the U_A + U_B = n_a·n_b identity."""
    from collections import Counter

    [r] = QS["q_mann_whitney_u"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value").toPandas()
    ca, cb = Counter(), Counter()
    for u, v in zip(ev["user_id"], ev["value"]):
        (ca if u % 2 == 0 else cb)[round(v * 100)] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    u2 = 0
    for va, k in ca.items():
        for vb, m in cb.items():
            if va > vb:
                u2 += 2 * k * m
            elif va == vb:
                u2 += k * m
    assert (r.n_a, r.n_b, r.u2_a) == (na, nb, u2)
    n = na + nb
    tie3 = sum(
        (ca[v] + cb[v]) ** 3 - (ca[v] + cb[v]) for v in set(ca) | set(cb)
    )
    var = na * nb / 12 * ((n + 1) - tie3 / (n * (n - 1)))
    z = round((u2 / 2 - na * nb / 2) / math.sqrt(var), 6)
    assert abs(r.z_score - z) < 1e-9


def test_hhi_identities(spark, sf_dir):
    """HHI recount; uniform floor ≤ HHI ≤ 10000; item totality."""
    rows = QS["q_hhi_concentration"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("item")
    ).toPandas()
    for r in rows:
        grp = ev[ev["event_type"] == r.event_type]["item"].value_counts()
        s, s2 = int(grp.sum()), int((grp * grp).sum())
        assert (r.n_items, r.n_events) == (len(grp), s)
        assert r.hhi_x10000 == s2 * 10000 // (s * s)
        assert r.uniform_hhi_x10000 == 10000 // len(grp)
        assert r.uniform_hhi_x10000 <= r.hhi_x10000 <= 10000


def test_spearman_scipy_style_recount(spark, sf_dir):
    """ρ recomputed from midranks in pure Python; |ρ| ≤ 1."""
    [r] = QS["q_spearman_hourly_correlation"](spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("event_type", F.date_trunc("hour", "ts").alias("hr")).toPandas()
    hours = sorted(set(ev["hr"]))
    xs, ys = [], []
    vc = ev[ev["event_type"] == "view"]["hr"].value_counts()
    pc = ev[ev["event_type"] == "purchase"]["hr"].value_counts()
    for h in hours:
        xs.append(int(vc.get(h, 0)))
        ys.append(int(pc.get(h, 0)))

    def midrank2(vals):
        from collections import Counter

        cnt = Counter(vals)
        r2 = {}
        below = 0
        for v in sorted(cnt):
            r2[v] = 2 * below + cnt[v] + 1
            below += cnt[v]
        return [r2[v] for v in vals]

    a, b = midrank2(xs), midrank2(ys)
    n = len(a)
    sa, sb = sum(a), sum(b)
    saa = sum(x * x for x in a); sbb = sum(x * x for x in b)
    sab = sum(x * y for x, y in zip(a, b))
    rho = round(
        (n * sab - sa * sb)
        / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)),
        6,
    )
    assert r.n_hours == n
    assert abs(r.spearman_rho - rho) < 1e-9
    assert -1.0 <= r.spearman_rho <= 1.0
