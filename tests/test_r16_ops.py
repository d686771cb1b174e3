"""Referees for the round-16 operators, beyond the DuckDB oracle checks in
test_oracle_queries.py: invariant proofs and pure-Python recounts that would
catch a bug the (structurally similar) oracle might share.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from decimal import Decimal

from pyspark.sql import functions as F

from changesetmd_spark import registry
from changesetmd_spark.tables import load_table

QS = registry.queries()


def _round_like_engine(x: float, ndigits: int) -> float:
    """Spark/DuckDB-convention rounding of a double: HALF_UP over the
    SHORTEST decimal representation (Java Double.toString ==
    Python repr for round-trip-shortest), not Python's half-even over
    the exact binary value."""
    from decimal import ROUND_HALF_UP

    q = Decimal(1).scaleb(-ndigits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def test_q6_revenue_exact_recount(spark, sf_dir):
    """Q6's one-row revenue matches a Decimal recount of the same filter."""
    row = QS["q6_forecast_revenue"](spark, sf_dir).collect()[0]
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_discount", "l_quantity", "l_shipdate"
    ).toPandas()
    total = Decimal(0)
    n = 0
    for p, d, q, sd in zip(
        li["l_extendedprice"], li["l_discount"], li["l_quantity"],
        li["l_shipdate"],
    ):
        if not ("1997-01-01" <= str(sd)[:10] < "1998-01-01"):
            continue
        if not (0.02 <= d <= 0.06 and q < 24):
            continue
        total += (
            Decimal(str(p)).quantize(Decimal("0.01"))
            * Decimal(str(d)).quantize(Decimal("0.0001"))
        )
        n += 1
    assert n == row.n_items
    assert abs(float(total) - row.revenue) < 1e-6


def test_q4_priority_counts_recount(spark, sf_dir):
    """Q4's per-priority counts match a brute-force semijoin recount."""
    rows = {r.o_orderpriority: r.order_count
            for r in QS["q4_order_priority_check"](spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").toPandas()
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    ).toPandas()
    latest_ship = li.groupby("l_orderkey")["l_shipdate"].max()
    import pandas as pd

    expect = defaultdict(int)
    for ok, od, pr in zip(
        orders["o_orderkey"], orders["o_orderdate"], orders["o_orderpriority"]
    ):
        if not ("1997-01-01" <= str(od)[:10] < "1997-04-01"):
            continue
        if ok in latest_ship.index and latest_ship[ok] > od + pd.Timedelta(
            days=30
        ):
            expect[pr] += 1
    assert rows == dict(expect)


def test_q21_sole_late_supplier_recount(spark, sf_dir):
    """Each reported supplier's numwait matches the per-order recount of
    'sole late shipper on a multi-supplier order'."""
    rows = QS["q21_suppliers_kept_waiting"](spark, sf_dir).collect()
    assert rows
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).toPandas()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    ).toPandas().set_index("o_orderkey")["o_orderdate"]
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    ).toPandas().set_index("s_suppkey")["s_name"]
    import pandas as pd

    late = defaultdict(set)
    supps = defaultdict(set)
    for ok, sk, sd in zip(
        li["l_orderkey"], li["l_suppkey"], li["l_shipdate"]
    ):
        supps[ok].add(sk)
        if sd > orders[ok] + pd.Timedelta(days=60):
            late[ok].add(sk)
    numwait = Counter()
    for ok, ss in supps.items():
        if len(ss) >= 2 and len(late[ok]) == 1:
            numwait[supp[next(iter(late[ok]))]] += 1
    top = sorted(numwait.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.s_name, r.numwait) for r in rows] == top


def test_q22_boundary_is_division_free(spark, sf_dir):
    """Every counted customer clears the cleared-division average test and
    truly has zero orders."""
    out = QS["q22_dormant_high_balance"](spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    orders = set(
        load_table(spark, sf_dir, "orders").select("o_custkey").toPandas()[
            "o_custkey"
        ]
    )
    nation = load_table(spark, sf_dir, "nation").toPandas().set_index(
        "n_nationkey"
    )["n_name"]
    cents = [round(b * 100) for b in cust["c_acctbal"]]
    pos = [c for c in cents if c > 0]
    total, n = sum(pos), len(pos)
    expect = defaultdict(lambda: [0, 0])
    for ck, nk, c in zip(cust["c_custkey"], cust["c_nationkey"], cents):
        if c * n > total and ck not in orders:
            e = expect[nation[nk]]
            e[0] += 1
            e[1] += c
    got = {r.n_name: (r.numcust, r.total_acctbal) for r in out}
    assert got == {
        k: (v[0], round(v[1] / 100.0, 2)) for k, v in expect.items()
    }


_URL_RE = re.compile(r"^([a-zA-Z]+)://([^/:?#]+)(:[0-9]+)?([^#]*)")


def _py_canonical(url: str) -> str:
    nf = re.sub(r"#.*$", "", url)
    nf = re.sub(r"&utm_[a-z]+=[^&]*", "", nf)
    nf = re.sub(r"\?utm_[a-z]+=[^&]*&", "?", nf)
    nf = re.sub(r"\?utm_[a-z]+=[^&]*$", "", nf)
    m = _URL_RE.match(nf)
    scheme, host, port, rest = (
        m.group(1).lower(), m.group(2).lower(), m.group(3), m.group(4),
    )
    if port in (None, "") or (scheme, port) in (("http", ":80"), ("https", ":443")):
        port = ""
    return f"{scheme}://{host}{port}{rest}"


def test_domain_rollup_canonicalization_recount(spark, sf_dir):
    """The rollup's domains, doc counts and rewrite counts match a
    pure-Python regex canonicalizer over the same synthesized URLs."""
    rows = QS["q_domain_rollup"](spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id").toPandas()
    per = defaultdict(lambda: [0, 0])
    for d in docs["doc_id"]:
        d = int(d)
        scheme = "https" if d % 2 == 0 else "http"
        hostword = "SITE" if d % 3 == 0 else "site"
        tld = ".example.com" if d % 2 == 0 else ".example.org"
        port = (
            (":443" if scheme == "https" else ":80") if d % 5 == 0
            else ":8080" if d % 5 == 1 else ""
        )
        q = (
            f"?utm_source=feed&id={d % 7}" if d % 4 == 0
            else f"?id={d % 7}&utm_campaign=w" if d % 4 == 1
            else f"?id={d % 7}" if d % 4 == 2 else ""
        )
        frag = "#sec" if d % 6 == 0 else ""
        url = f"{scheme}://{hostword}{d % 23}{tld}{port}/p/{d % 101}{q}{frag}"
        canon = _py_canonical(url)
        dom = f"{hostword.lower()}{d % 23}{tld}"
        assert canon.startswith(f"{scheme}://{dom}")
        assert "utm_" not in canon and "#" not in canon
        assert ":80/" not in canon and ":443/" not in canon
        per[dom][0] += 1
        per[dom][1] += 1 if canon != url else 0
    got = {r.domain: (r.n_docs, r.n_urls_rewritten) for r in rows}
    assert got == {k: tuple(v) for k, v in per.items()}
    for r in rows:
        assert 0 <= r.dup_bp <= 10000
        assert r.n_unique_docs <= r.n_docs


def test_ivf_maintenance_conservation(spark, sf_dir):
    """Per-cell base + batch = after; totals cover the (guarded) corpus;
    the split flag is exactly the 2x-mean rule."""
    rows = QS["q_ivf_index_maintenance"](spark, sf_dir).collect()
    assert rows
    total = sum(r.n_after for r in rows)
    corpus = load_table(spark, sf_dir, "embeddings").count()
    assert total == corpus
    for r in rows:
        assert r.n_base + r.n_batch == r.n_after
        assert r.split_needed == (r.n_after * len(rows) > 2 * total)
        assert r.ingest_drift_bp == r.n_batch * 10000 // max(r.n_base, 1)


def test_jensen_shannon_recount_and_bounds(spark, sf_dir):
    """JS is within [0, ln 2], js_distance = sqrt(js), and the value
    matches a pure-Python recount with the same smoothing and fold."""
    row = QS["q_jensen_shannon_drift"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.js_nats <= math.log(2) + 1e-9
    assert abs(row.js_distance - math.sqrt(max(row.js_nats, 0.0))) < 1e-4
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).toPandas()
    cb, cd = Counter(), Counter()
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = re.split(r"\s+", text.strip().lower()) if text is not None else []
        (cb if did % 2 == 0 else cd).update(t for t in toks)
    top = sorted(cb.items(), key=lambda kv: (-kv[1], kv[0]))[:64]
    tb = sum(c for _, c in top)
    td = sum(cd.get(t, 0) for t, _ in top)
    js = 0.0
    for t, c in sorted(top):
        p = (c + 1) / (tb + 64)
        q = (cd.get(t, 0) + 1) / (td + 64)
        m = 0.5 * p + 0.5 * q
        js += round(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m), 6)
    assert abs(js - row.js_nats) < 2e-5


def test_theil_recount(spark, sf_dir):
    """Theil-T and MLD match a float recount over per-user cents, and both
    are non-negative (Jensen)."""
    row = QS["q_theil_index_concentration"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "value").toPandas()
    per = defaultdict(int)
    for u, v in zip(ev["user_id"], ev["value"]):
        per[u] += round(v * 100)
    n, s = len(per), sum(per.values())
    t = sum(x * math.log(x * n / s) for x in per.values()) / s
    ld = sum(math.log(s / (x * n)) for x in per.values()) / n
    assert row.n_users == n and row.total_cents == s
    assert abs(row.theil_t - t) < 1e-4 and abs(row.mld_l - ld) < 1e-4
    assert row.theil_t >= -1e-9 and row.mld_l >= -1e-9


def test_kendall_recount(spark, sf_dir):
    """tau-b matches the O(n^2) textbook recount over the hourly series."""
    row = QS["q_kendall_tau_hourly"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase")
    ).select("ts", "event_type").toPandas()
    per = defaultdict(lambda: [0, 0])
    for ts, et in zip(ev["ts"], ev["event_type"]):
        h = ts.replace(minute=0, second=0, microsecond=0)
        per[h][0 if et == "view" else 1] += 1
    pts = list(per.values())
    c = d = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            p = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            c += p > 0
            d += p < 0
    n = len(pts)
    n0 = n * (n - 1) // 2
    tx = Counter(x for x, _ in pts)
    ty = Counter(y for _, y in pts)
    n1 = sum(t * (t - 1) // 2 for t in tx.values())
    n2 = sum(t * (t - 1) // 2 for t in ty.values())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert (row.n_hours, row.concordant, row.discordant) == (n, c, d)
    assert abs(row.kendall_tau_b - tau) < 1e-5


def test_transition_entropy_consistency(spark, sf_dir):
    """Entropy recomputed from the transition MATRIX query's own counts
    agrees with the entropy query (two different plans, one definition)."""
    ent = {r.from_type: r for r in QS["q_transition_entropy"](spark, sf_dir).collect()}
    mat = QS["q_type_transition_matrix"](spark, sf_dir).collect()
    per = defaultdict(dict)
    for r in mat:
        per[r.from_type][r.to_type] = r.n
    for ft, cells in per.items():
        t = sum(cells.values())
        h = math.log(t) - sum(
            round(n * math.log(n), 9) for _, n in sorted(cells.items())
        ) / t
        assert ent[ft].n_transitions == t
        assert ent[ft].n_next_types == len(cells)
        assert abs(ent[ft].entropy_nats - h) < 1e-5
        assert 0.0 <= ent[ft].entropy_normalized <= 1.0 + 1e-9


def test_acf_lag1_matches_autocorr_query(spark, sf_dir):
    """ACF at lag 1 must equal q_autocorr_lag1's r1 (two plans, one
    definition)."""
    acf = {
        r.event_type: r.r
        for r in QS["q_acf_profile"](spark, sf_dir).collect()
        if r.lag == 1
    }
    r1 = {
        r.event_type: r.r1
        for r in QS["q_autocorr_lag1"](spark, sf_dir).collect()
    }
    assert acf == r1


def test_tcloseness_recount(spark, sf_dir):
    """max_t_bp per class matches a brute-force TVD recount over all QI
    groups."""
    from changesetmd_spark.operators.privacy import (
        _BAL_BUCKET,
        _T_THRESHOLD_BP,
    )

    rows = {r.t_class: r for r in QS["q_tcloseness_risk"](spark, sf_dir).collect()}
    cust = load_table(spark, sf_dir, "customer").toPandas()
    glob = Counter(cust["c_mktsegment"])
    big_n = len(cust)
    groups = defaultdict(Counter)
    for nk, bal, seg in zip(
        cust["c_nationkey"], cust["c_acctbal"], cust["c_mktsegment"]
    ):
        groups[(nk, math.floor(bal / _BAL_BUCKET))][seg] += 1
    cls = defaultdict(list)
    for cnts in groups.values():
        k = sum(cnts.values())
        num = sum(
            abs(cnts.get(s, 0) * big_n - g * k) for s, g in glob.items()
        )
        t_bp = num * 10000 // (2 * k * big_n)
        c = (
            "breach" if t_bp >= _T_THRESHOLD_BP
            else "watch" if t_bp >= _T_THRESHOLD_BP // 2 else "close"
        )
        cls[c].append((k, t_bp))
    for c, lst in cls.items():
        assert rows[c].n_groups == len(lst)
        assert rows[c].n_records == sum(k for k, _ in lst)
        assert rows[c].max_t_bp == max(t for _, t in lst)


def test_brier_decomposition_identity(spark, sf_dir):
    """brier ≈ reliability − resolution + uncertainty up to within-bin
    variance (bounded by the bin width squared), and every component is in
    its theoretical range."""
    row = QS["q_brier_decomposition"](spark, sf_dir).collect()[0]
    assert 0.0 <= row.brier <= 1.0
    assert row.reliability >= -1e-9
    assert row.resolution >= -1e-9
    assert 0.0 <= row.uncertainty <= 0.25 + 1e-9
    residual = row.brier - (row.reliability - row.resolution + row.uncertainty)
    assert abs(residual) <= 0.01 + 1e-6  # within-bin variance ≤ (1/10)²


def test_readability_recount(spark, sf_dir):
    """Per-source readability matches a pure-Python regex recount."""
    rows = {r.source: r for r in QS["q_readability_scores"](spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "text"
    ).toPandas()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for src, text in zip(docs["source"], docs["text"]):
        w = len(re.findall(r"\S+", text))
        if w == 0:
            continue
        s = max(len(re.findall(r"[.!?]+", text)), 1)
        y = len(re.findall(r"[aeiouy]+", text.lower()))
        a = agg[src]
        a[0] += 1
        a[1] += w
        a[2] += s
        a[3] += y
    for src, (n, w, s, y) in agg.items():
        r = rows[src]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (n, w, s, y)
        assert abs(r.flesch_ease - round(206.835 - 1.015 * w / s - 84.6 * y / w, 4)) < 1e-9


def test_adamic_adar_recount(spark, sf_dir):
    """AA scores match a brute-force recount with the same quantization."""
    import json as _json

    rows = {(r.item_1, r.item_2): r
            for r in QS["q_adamic_adar_linkpred"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "props"
    ).toPandas()
    ui = set()
    for u, p in zip(ev["user_id"], ev["props"]):
        try:
            item = _json.loads(p).get("k")
        except (ValueError, TypeError):
            item = None
        ui.add((u, item))
    deg = Counter(u for u, _ in ui)
    pairs = defaultdict(lambda: [0, 0])
    by_user = defaultdict(list)
    for u, i in ui:
        if deg[u] <= 500:
            by_user[u].append(i)
    for u, items in by_user.items():
        # mirror the ENGINE's rounding convention, not Python's: Spark
        # round(double) goes through the shortest decimal representation
        # (Double.toString -> BigDecimal, HALF_UP), while Python round()
        # rounds the exact binary value half-even — the two diverge when
        # the shortest repr ends in ...5 (r17: two boundary pairs appeared
        # with regenerated testdata).  DuckDB's ROUND agrees with Spark
        # here, so the oracle gate was green; only this referee differed.
        w = _round_like_engine(1e9 / math.log(deg[u]), 0) if deg[u] >= 2 else None
        items = sorted(x for x in items if x is not None)
        for a_i in range(len(items)):
            for b_i in range(a_i + 1, len(items)):
                p = pairs[(items[a_i], items[b_i])]
                p[0] += 1
                p[1] += w
    expect = {
        k: v for k, v in pairs.items() if v[0] >= 5
    }
    assert set(rows) == set(expect)
    for k, (n, units) in expect.items():
        assert rows[k].n_both == n
        assert abs(
            rows[k].adamic_adar - _round_like_engine(units / 1e9, 6)
        ) < 1e-9


def test_knn_accuracy_recount(spark, sf_dir):
    """1-NN labels match a numpy brute-force with the same rounding and
    tie-break."""
    import numpy as np

    row = QS["q_knn_label_accuracy"](spark, sf_dir).collect()[0]
    emb = load_table(spark, sf_dir, "embeddings").orderBy("vec_id").toPandas()
    vecs = np.array([np.array(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    correct = 0
    nq = 0
    for qi in range(len(ids)):
        if ids[qi] >= 5:
            continue
        nq += 1
        sims = np.round((vecs @ vecs[qi]) / (norms * norms[qi]), 5)
        best, best_id = None, None
        for ci in range(len(ids)):
            if ci == qi:
                continue
            key = (-sims[ci], ids[ci])
            if best is None or key < best:
                best, best_id = key, ci
        correct += labels[best_id] == labels[qi]
    assert row.n_queries == nq
    assert row.n_correct == correct
    assert row.accuracy_bp == correct * 10000 // nq


def test_data_quality_clean_on_driver_corpus(spark, sf_dir):
    """The driver corpus satisfies every expectation; the degenerate corpus
    must trip the blank-doc check (proving the audit detects, not rubber-
    stamps)."""
    rows = QS["q_data_quality_expectations"](spark, sf_dir).collect()
    assert rows and all(r.all_expectations_pass for r in rows)
    from .degen_corpus import build_degen_dir

    degen = QS["q_data_quality_expectations"](spark, build_degen_dir()).collect()
    # blank = zero \S+ tokens: the empty and ASCII-whitespace docs (the
    # NBSP/em-space doc is one \S token under ASCII \s — by design)
    assert sum(r.blank_docs for r in degen) >= 2
    assert any(not r.all_expectations_pass for r in degen)
