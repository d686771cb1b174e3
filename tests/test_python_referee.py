"""Independent pure-Python referees for the chunking/fingerprinting
operators: a THIRD implementation (besides the Spark plan and the DuckDB
oracle) computed with plain loops over the raw parquet text.  The Spark and
DuckDB versions share structural assumptions (same window/aggregate
decomposition); the referee shares none, so an error in the shared
decomposition itself — which engine-vs-engine hash parity can never catch —
fails here."""

from __future__ import annotations

import hashlib
import re

import duckdb

from changesetmd_spark import registry


def _docs(sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    return {
        doc_id: re.split(r"\s+", text.strip().lower()) for doc_id, text in rows
    }


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_cdc_chunk_dedup_matches_python_referee(spark, sf_dir):
    K, MOD = 4, 16
    docs = _docs(sf_dir)
    chunks = []  # (doc_id, chunk_hash)
    for doc_id, toks in docs.items():
        if len(toks) < K:
            continue
        n_grams = len(toks) - K + 1
        # boundary positions (1-based gram starts)
        starts = [
            i
            for i in range(1, n_grams + 1)
            if i == 1
            or _md5_long(" ".join(toks[i - 1 : i - 1 + K])) % MOD == 0
        ]
        for j, s in enumerate(starts):
            e = (starts[j + 1] - 1) if j + 1 < len(starts) else n_grams
            end_tok = e + (K - 1 if e == n_grams else 0)  # 1-based inclusive
            chunk_text = " ".join(toks[s - 1 : end_tok])
            chunks.append((doc_id, hashlib.md5(chunk_text.encode()).hexdigest()))
    from collections import Counter

    freq = Counter(h for _, h in chunks)
    expected = {}
    for doc_id in {d for d, _ in chunks}:
        mine = [h for d, h in chunks if d == doc_id]
        shared = sum(1 for h in mine if freq[h] > 1)
        expected[doc_id] = (
            len(mine),
            shared,
            round(shared / len(mine), 6),
        )

    got = {
        r.doc_id: (r.n_chunks, r.n_shared_chunks, float(r.shared_ratio))
        for r in registry.queries()["q_cdc_chunk_dedup"](spark, sf_dir).collect()
    }
    assert got == expected


def test_winnowing_matches_python_referee(spark, sf_dir):
    K, W, POS_BITS = 4, 4, 30
    docs = _docs(sf_dir)
    expected = {}
    for doc_id, toks in docs.items():
        if len(toks) < K + W - 1:
            continue
        n_grams = len(toks) - K + 1
        keys = [
            int(
                hashlib.md5(
                    " ".join(toks[i - 1 : i - 1 + K]).encode()
                ).hexdigest()[:8],
                16,
            )
            * (1 << POS_BITS)
            + ((1 << POS_BITS) - 1 - i)
            for i in range(1, n_grams + 1)
        ]
        n_windows = n_grams - W + 1
        sels = {min(keys[i : i + W]) for i in range(n_windows)}
        expected[doc_id] = (
            n_windows,
            len(sels),
            round(len(sels) / n_windows, 6),
        )

    got = {
        r.doc_id: (r.n_windows, r.n_fingerprints, float(r.density))
        for r in registry.queries()["q_winnowed_fingerprints"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # the winnowing guarantee surfaces as density strictly inside (0, 1]
    assert all(0 < d <= 1 for _, _, d in got.values())


def test_duplicate_substring_spans_matches_python_referee(spark, sf_dir):
    W = 15
    docs = _docs(sf_dir)
    hits = {}  # doc_id -> sorted duplicate-window positions (1-based)
    from collections import Counter

    window_count = Counter()
    windows = {}  # (doc_id, pos) -> h
    for doc_id, toks in docs.items():
        for i in range(1, len(toks) - W + 2):
            h = _md5_long(" ".join(toks[i - 1 : i - 1 + W]))
            windows[(doc_id, i)] = h
            window_count[h] += 1
    for (doc_id, pos), h in windows.items():
        if window_count[h] > 1:
            hits.setdefault(doc_id, []).append(pos)

    expected = {}
    for doc_id, poss in hits.items():
        poss.sort()
        spans = []
        s = e = None
        for p in poss:
            if s is None:
                s, e = p, p + W - 1
            elif p <= e:  # overlaps the open span -> extend
                e = p + W - 1
            else:
                spans.append((s, e))
                s, e = p, p + W - 1
        spans.append((s, e))
        expected[doc_id] = (
            len(spans),
            sum(e - s + 1 for s, e in spans),
        )

    got = {
        r.doc_id: (r.n_spans, r.dup_tokens)
        for r in registry.queries()["q_duplicate_substring_spans"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    assert got  # non-vacuous: the corpus contains duplicated windows


def test_sequence_packing_matches_python_referee(spark, sf_dir):
    CTX = 512
    rows = duckdb.sql(
        f"SELECT doc_id, text, source "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    by_source = {}
    for doc_id, text, source in rows:
        n_tok = len(re.split(r"\s+", text.strip().lower()))
        by_source.setdefault(source, []).append((doc_id, n_tok))
    expected = {}
    for source, docs in by_source.items():
        cum = 0
        for doc_id, n_tok in sorted(docs):
            pack = cum // CTX
            n_docs, n_tokens, first = expected.get(
                (source, pack), (0, 0, doc_id)
            )
            expected[(source, pack)] = (
                n_docs + 1,
                n_tokens + n_tok,
                min(first, doc_id),
            )
            cum += n_tok

    got = {
        (r.source, r.pack_id): (r.n_docs, r.n_tokens, r.first_doc)
        for r in registry.queries()["q_sequence_packing"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_dsir_importance_matches_python_referee(spark, sf_dir):
    from collections import Counter

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    toks = {
        doc_id: re.split(r"\s+", text.strip().lower())
        for doc_id, text, _ in rows
    }
    raw = Counter(t for ts in toks.values() for t in ts)
    tgt = Counter(
        t for doc_id, text, lang in rows if lang == "en"
        for t in toks[doc_id]
    )
    t_raw, t_tgt, v = sum(raw.values()), sum(tgt.values()), len(raw)
    expected = {}
    for doc_id, ts in toks.items():
        s_tgt = sum(tgt.get(t, 0) + 1 for t in ts)
        s_raw = sum(raw[t] + 1 for t in ts)
        expected[doc_id] = (
            len(ts),
            round((float(t_raw + v) * s_tgt) / (float(t_tgt + v) * s_raw), 6),
        )

    got = {
        r.doc_id: (r.n_toks, float(r.importance))
        for r in registry.queries()["q_dsir_importance_weights"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_line_dedup_c4_matches_python_referee(spark, sf_dir):
    docs = _docs(sf_dir)
    posts = []  # (chunk_text, doc_id, pos)
    for doc_id, toks in docs.items():
        n_chunks = -(-len(toks) // 10)
        for i in range(n_chunks):
            posts.append((" ".join(toks[i * 10 : i * 10 + 10]), doc_id, i))
    first = {}
    for chunk, doc_id, pos in posts:
        cur = first.get(chunk)
        if cur is None or (doc_id, pos) < cur:
            first[chunk] = (doc_id, pos)
    expected = {}
    for chunk, doc_id, pos in posts:
        n, kept = expected.get(doc_id, (0, 0))
        expected[doc_id] = (
            n + 1,
            kept + (1 if first[chunk] == (doc_id, pos) else 0),
        )
    expected = {
        d: (n, k, round(k / n, 4)) for d, (n, k) in expected.items()
    }

    got = {
        r.doc_id: (r.n_chunks, r.n_kept, float(r.kept_ratio))
        for r in registry.queries()["q_line_dedup_c4"](spark, sf_dir).collect()
    }
    assert got == expected


def test_unigram_prob_mass_matches_python_referee(spark, sf_dir):
    from collections import Counter

    docs = _docs(sf_dir)
    freq = Counter(t for ts in docs.values() for t in ts)
    n = sum(freq.values())
    expected = {
        doc_id: (
            len(ts),
            round(sum(freq[t] for t in ts) / (float(len(ts)) * n), 8),
        )
        for doc_id, ts in docs.items()
    }
    got = {
        r.doc_id: (r.n_tokens, float(r.prob_mass))
        for r in registry.queries()["q_unigram_prob_mass"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def _user_items(sf_dir, cap=500):
    import json as _json

    rows = duckdb.sql(
        f"SELECT DISTINCT user_id, "
        f"CAST(json_extract_string(props, '$.k') AS BIGINT) "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_user = {}
    for u, it in rows:
        by_user.setdefault(u, set()).add(it)
    return {u: its for u, its in by_user.items() if len(its) <= cap}


def test_item_cooccurrence_matches_python_referee(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    by_user = _user_items(sf_dir)
    both = Counter()
    sizes = Counter()
    for its in by_user.values():
        for it in its:
            sizes[it] += 1
        for a, b in combinations(sorted(its), 2):
            both[(a, b)] += 1
    expected = {
        (a, b): (n, round(n / (sizes[a] + sizes[b] - n), 4))
        for (a, b), n in both.items()
        if n >= 5
    }
    got = {
        (r.item_1, r.item_2): (r.n_both, float(r.jaccard))
        for r in registry.queries()["q_item_cooccurrence"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_pagerank_matches_python_referee(spark, sf_dir):
    from collections import Counter
    from itertools import combinations

    by_user = _user_items(sf_dir)
    w = Counter()
    for its in by_user.values():
        for a, b in combinations(sorted(its), 2):
            w[(a, b)] += 1
    edges = []  # directed both ways
    for (a, b), n in w.items():
        edges.append((a, b, n))
        edges.append((b, a, n))
    nodes = sorted({s for s, _, _ in edges})
    wout = Counter()
    for s, _, n in edges:
        wout[s] += n
    n_nodes = len(nodes)
    r = {v: 1.0 / n_nodes for v in nodes}
    from decimal import Decimal

    for _ in range(3):
        acc = {v: Decimal(0) for v in nodes}
        for s, d, n in edges:
            contrib = r[s] * n / wout[s]
            # mirror the engines' DECIMAL(38,18) fold of each contribution
            acc[d] += Decimal(contrib).quantize(Decimal(1).scaleb(-18))
        r = {
            v: (1.0 - 0.85) / n_nodes + 0.85 * float(acc[v]) for v in nodes
        }
    expected = {v: round(val, 8) for v, val in r.items()}
    got = {
        row.item_id: float(row.rank)
        for row in registry.queries()["q_pagerank_items"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_temperature_mixture_matches_python_referee(spark, sf_dir):
    import math
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT lang, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    n_tok = {}
    for lang, text in rows:
        n_tok[lang] = n_tok.get(lang, 0) + len(re.findall(r"\S+", text))
    total = sum(n_tok.values())
    sum_sqrt = float(
        sum(
            Decimal(math.sqrt(n)).quantize(Decimal(1).scaleb(-12))
            for n in n_tok.values()
        )
    )
    expected = {}
    for lang, n in n_tok.items():
        p_raw = n / float(total)
        p_temp = math.sqrt(n) / sum_sqrt
        expected[lang] = (n, round(p_raw, 6), round(p_temp, 6),
                          round(p_temp / p_raw, 4))
    got = {
        r.lang: (r.n_tokens, float(r.p_raw), float(r.p_temp), float(r.boost))
        for r in registry.queries()["q_temperature_mixture"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_kmeans_assign_update_matches_python_referee(spark, sf_dir):
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT vec_id, embedding "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    vecs = {vid: [float(x) for x in e] for vid, e in rows}
    seeds = {vid: vecs[vid] for vid in vecs if vid < 8}
    assign = {}
    for vid, e in vecs.items():
        best = None
        for cid in sorted(seeds):
            d = 0.0
            for a, b in zip(e, seeds[cid]):  # sequential fold, same order
                d += (a - b) * (a - b)
            if best is None or d < best[0]:
                best = (d, cid)
        assign[vid] = best
    expected = {}
    q12 = Decimal(1).scaleb(-12)
    for cid in sorted(seeds):
        members = [(vid, d) for vid, (d, c) in assign.items() if c == cid]
        if not members:
            continue
        n = len(members)
        sd = sum(Decimal(d).quantize(q12) for _, d in members)
        s0 = sum(Decimal(vecs[vid][0]).quantize(q12) for vid, _ in members)
        expected[cid] = (
            n,
            round(float(sd) / n, 6),
            round(float(s0) / n, 6),
        )
    got = {
        r.cluster_id: (r.n_vecs, float(r.avg_sq_dist), float(r.centroid_d0))
        for r in registry.queries()["q_kmeans_assign_update"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_series_linear_trend_matches_python_referee(spark, sf_dir):
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, "
        f"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y "
        f"FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    series = {}
    for et, h, y in rows:
        series.setdefault(et, []).append((h, y))
    q12 = Decimal(1).scaleb(-12)
    expected = {}
    for et, pts in series.items():
        pts.sort()
        n = len(pts)
        sx = sum(range(1, n + 1))
        sxx = sum(i * i for i in range(1, n + 1))
        sy = float(sum(Decimal(y).quantize(q12) for _, y in pts))
        sxy = float(
            sum(
                Decimal((i + 1) * y).quantize(q12)
                for i, (_, y) in enumerate(pts)
            )
        )
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        expected[et] = (n, round(slope, 8), round((sy - slope * sx) / n, 6))
    got = {
        r.event_type: (r.n_hours, float(r.slope), float(r.intercept))
        for r in registry.queries()["q_series_linear_trend"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def _hourly_totals(sf_dir):
    rows = duckdb.sql(
        f"SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS h, "
        f"CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS y "
        f"FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall()
    series = {}
    for et, h, y in rows:
        series.setdefault(et, {})[h] = y
    return series


def test_time_gapfill_locf_matches_python_referee(spark, sf_dir):
    import datetime

    counts = {}
    for et, h, n in duckdb.sql(
        f"SELECT event_type, time_bucket(INTERVAL '1 hour', ts), COUNT(*) "
        f"FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2"
    ).fetchall():
        counts[(et, h)] = n
    series = _hourly_totals(sf_dir)
    all_h = [h for s in series.values() for h in s]
    h0, h1 = min(all_h), max(all_h)
    hour = datetime.timedelta(hours=1)
    expected = {}
    for et, s in series.items():
        last = None
        h = h0
        while h <= h1:
            tv = s.get(h)
            if tv is not None:
                last = tv
            expected[(h.strftime("%Y-%m-%d %H:%M:%S"), et)] = (
                counts.get((et, h), 0),
                tv,
                last,
            )
            h += hour
    got = {
        (r.window_start, r.event_type): (
            r.n_events,
            None if r.total_value is None else float(r.total_value),
            None if r.locf_value is None else float(r.locf_value),
        )
        for r in registry.queries()["q_time_gapfill_locf"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_series_ewma_matches_python_referee(spark, sf_dir):
    import datetime
    from decimal import Decimal

    series = _hourly_totals(sf_dir)
    q12 = Decimal(1).scaleb(-12)
    hour = datetime.timedelta(hours=1)
    expected = {}
    for et, s in series.items():
        for h in s:  # only observed hours are emitted
            wy = Decimal(0)
            w = Decimal(0)
            for k in range(8):
                src = h - k * hour
                if src in s:
                    wk = 2.0 ** -k
                    wy += Decimal(s[src] * wk).quantize(q12)
                    w += Decimal(wk).quantize(q12)
            expected[(h.strftime("%Y-%m-%d %H:%M:%S"), et)] = round(
                float(wy) / float(w), 6
            )
    got = {
        (r.window_start, r.event_type): float(r.ewma)
        for r in registry.queries()["q_series_ewma"](spark, sf_dir).collect()
    }
    assert got == expected


def test_rag_chunk_overlap_matches_python_referee(spark, sf_dir):
    C, S = 128, 96
    docs = _docs(sf_dir)
    expected = set()
    for doc_id, toks in docs.items():
        n = len(toks)
        kmax = (max(n - C, 0) + S - 1) // S
        for k in range(kmax + 1):
            clen = C if k < kmax else n - k * S
            text = " ".join(toks[k * S : k * S + clen])
            expected.add(
                (doc_id, k, clen, hashlib.md5(text.encode()).hexdigest())
            )
    got = {
        (r.doc_id, r.chunk_id, r.n_tok_chunk, r.chunk_hash)
        for r in registry.queries()["q_rag_chunk_overlap"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_token_len_histogram_matches_python_referee(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT source, text "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    buckets = {}
    for source, text in rows:
        n = len(re.findall(r"\S+", text))
        bits = len(bin(n)) - 2  # '0b…' prefix; bin(0) -> 1 bit like conv/bin
        buckets.setdefault((source, bits), []).append(n)
    expected = {
        k: (len(v), sum(v), min(v), max(v)) for k, v in buckets.items()
    }
    got = {
        (r.source, r.bits): (
            r.n_docs,
            r.total_tokens,
            r.min_tokens,
            r.max_tokens,
        )
        for r in registry.queries()["q_token_len_histogram"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def _quantile_type7(vals):
    """Linear-interpolated (type-7) quantile at p=0.5, the formula both
    F.percentile and DuckDB quantile_cont implement."""
    v = sorted(vals)
    pos = 0.5 * (len(v) - 1)
    lo = int(pos)
    frac = pos - lo
    if frac == 0:
        return v[lo]
    return v[lo] + (v[lo + 1] - v[lo]) * frac


def test_value_mad_outliers_matches_python_referee(spark, sf_dir):
    K = 4.4478
    rows = duckdb.sql(
        f"SELECT event_type, value "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    series = {}
    for et, v in rows:
        series.setdefault(et, []).append(v)
    expected = {}
    for et, vals in series.items():
        med = _quantile_type7(vals)
        mad = _quantile_type7([abs(v - med) for v in vals])
        n_out = sum(1 for v in vals if abs(v - med) > K * mad)
        expected[et] = (
            len(vals),
            round(med, 6),
            round(mad, 6),
            n_out,
            round(n_out * 1.0 / len(vals), 6),
        )
    got = {
        r.event_type: (
            r.n,
            float(r.med),
            float(r.mad),
            r.n_outliers,
            float(r.outlier_ratio),
        )
        for r in registry.queries()["q_value_mad_outliers"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_bigram_lm_fluency_matches_python_referee(spark, sf_dir):
    from collections import Counter
    from decimal import Decimal

    docs = _docs(sf_dir)
    bigrams = {
        doc_id: list(zip(toks, toks[1:]))
        for doc_id, toks in docs.items()
        if len(toks) >= 2
    }
    c2 = Counter(p for ps in bigrams.values() for p in ps)
    c1 = Counter(a for ps in bigrams.values() for a, _ in ps)
    q12 = Decimal(1).scaleb(-12)
    expected = {}
    for doc_id, ps in bigrams.items():
        total = sum(
            Decimal(c2[p] * 1.0 / c1[p[0]]).quantize(q12) for p in ps
        )
        expected[doc_id] = (len(ps), round(float(total) / len(ps), 6))
    got = {
        r.doc_id: (r.n_bigrams, float(r.mean_cond_prob))
        for r in registry.queries()["q_bigram_lm_fluency"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_embedding_pca_power_matches_python_referee(spark, sf_dir):
    import math
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT label, embedding "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    by_label = {}
    for label, e in rows:
        by_label.setdefault(label, []).append([float(x) for x in e])
    q12 = Decimal(1).scaleb(-12)
    expected = {}
    for label, vecs in by_label.items():
        dim = len(vecs[0])

        def matvec(x):
            y = []
            for i in range(dim):
                total = Decimal(0)
                for e in vecs:
                    d = 0.0
                    for a, b in zip(e, x):  # sequential left fold
                        d += a * b
                    total += Decimal(d * e[i]).quantize(q12)
                y.append(float(total))
            return y

        ones = [1.0] * dim
        y1 = matvec(ones)
        n1 = math.sqrt(sum(w * w for w in y1))
        x1 = [w / n1 for w in y1]
        y2 = matvec(x1)
        n2 = math.sqrt(sum(w * w for w in y2))
        expected[label] = (
            round(n2, 6),
            round(y2[0] / n2, 6),
            round(y2[1] / n2, 6),
            round(y2[2] / n2, 6),
            round(y2[3] / n2, 6),
        )
    got = {
        r.label: (
            float(r.lambda_1),
            float(r.pc_1),
            float(r.pc_2),
            float(r.pc_3),
            float(r.pc_4),
        )
        for r in registry.queries()["q_embedding_pca_power"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_funnel_conversion_matches_python_referee(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    by_user = {}
    for uid, et, ts in rows:
        by_user.setdefault(uid, []).append((ts, et))
    stages = ("view", "click", "signup", "purchase")
    counts = []
    entered = {uid: None for uid in by_user}  # uid -> entry ts of prev stage
    for stage in stages:
        nxt = {}
        for uid, prev_t in entered.items():
            ts_list = [
                ts
                for ts, et in by_user[uid]
                if et == stage and (prev_t is None or ts > prev_t)
            ]
            if ts_list:
                nxt[uid] = min(ts_list)
        counts.append(len(nxt))
        entered = nxt
    expected = {}
    for i, stage in enumerate(stages):
        conv = (
            round(counts[i] * 1.0 / counts[i - 1], 6) if i > 0 else None
        )
        expected[i + 1] = (stage, counts[i], conv)
    got = {
        r.stage: (
            r.stage_name,
            r.n_users,
            float(r.conv_rate) if r.conv_rate is not None else None,
        )
        for r in registry.queries()["q_funnel_conversion"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_heavy_hitter_terms_matches_python_referee(spark, sf_dir):
    from collections import Counter

    docs = _docs(sf_dir)
    counts = Counter(t for toks in docs.values() for t in toks)
    total = sum(counts.values())
    expected = {
        term: (c, round(c * 1.0 / total, 6))
        for term, c in counts.items()
        if c >= 0.033 * total
    }
    assert expected, "threshold must select a non-empty set (vacuity guard)"
    got = {
        r.term: (r.cnt, float(r.freq))
        for r in registry.queries()["q_heavy_hitter_terms"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_cohort_retention_matches_python_referee(spark, sf_dir):
    import datetime

    rows = duckdb.sql(
        f"SELECT user_id, ts FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    epoch = datetime.date(2024, 1, 1)
    weeks = {}
    for uid, ts in rows:
        w = (ts.date() - epoch).days // 7
        weeks.setdefault(uid, set()).add(w)
    first = {uid: min(ws) for uid, ws in weeks.items()}
    sizes = {}
    for uid, cw in first.items():
        sizes[cw] = sizes.get(cw, 0) + 1
    cells = {}
    for uid, ws in weeks.items():
        cw = first[uid]
        for w in ws:
            cells[(cw, w - cw)] = cells.get((cw, w - cw), 0) + 1
    expected = {
        (cw, off): (n, round(n * 1.0 / sizes[cw], 6))
        for (cw, off), n in cells.items()
    }
    got = {
        (r.cohort_week, r.week_offset): (r.n_active, float(r.retention))
        for r in registry.queries()["q_cohort_retention"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_ngram_novelty_matches_python_referee(spark, sf_dir):
    docs = _docs(sf_dir)
    grams = {
        doc_id: {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for doc_id, toks in docs.items()
        if len(toks) >= 3
    }
    first = {}
    for doc_id in sorted(grams):
        for g in grams[doc_id]:
            first.setdefault(g, doc_id)
    expected = {}
    for doc_id, gs in grams.items():
        novel = sum(1 for g in gs if first[g] == doc_id)
        expected[doc_id] = (len(gs), novel, round(novel * 1.0 / len(gs), 6))
    got = {
        r.doc_id: (r.n_grams, r.n_novel, float(r.novelty))
        for r in registry.queries()["q_ngram_novelty"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_media_shard_manifest_matches_python_referee(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT doc_id, octet_length(CAST(text AS BLOB)) "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    budget = 64 * 1024
    by_mod = {}
    for doc_id, n_bytes in rows:
        mod = ("image", "audio", "video")[doc_id % 3]
        by_mod.setdefault(mod, []).append((doc_id, n_bytes))
    expected = {}
    for mod, files in by_mod.items():
        cum = 0
        for media_id, n_bytes in sorted(files):
            shard = cum // budget
            key = (mod, shard)
            n, tot, first = expected.get(key, (0, 0, media_id))
            expected[key] = (n + 1, tot + n_bytes, min(first, media_id))
            cum += n_bytes
    got = {
        (r.modality, r.shard_id): (r.n_files, r.total_bytes, r.first_id)
        for r in registry.queries()["q_media_shard_manifest"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_triangle_count_matches_python_referee(spark, sf_dir):
    import json as _json
    from itertools import combinations

    rows = duckdb.sql(
        f"SELECT user_id, props FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    items = {}
    for uid, props in rows:
        items.setdefault(uid, set()).add(int(_json.loads(props)["k"]))
    edges = set()
    for uid, its in items.items():
        if len(its) > 500:  # the shared user-degree cap
            continue
        for a, b in combinations(sorted(its), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    expected = {}
    for a, b in edges:
        for c in adj.get(b, ()):  # a < b < c by construction
            if (a, c) in edges:
                for v in (a, b, c):
                    expected[v] = expected.get(v, 0) + 1
    got = {
        r.item_id: r.n_triangles
        for r in registry.queries()["q_triangle_count"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    assert expected, "corpus must contain triangles (vacuity guard)"


def test_type_transition_matrix_matches_python_referee(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id "
        f"FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchall()
    seqs = {}
    for uid, et, ts, eid in rows:
        seqs.setdefault(uid, []).append((ts, eid, et))
    cells = {}
    totals = {}
    for uid, evs in seqs.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            cells[(a, b)] = cells.get((a, b), 0) + 1
            totals[a] = totals.get(a, 0) + 1
    expected = {
        (a, b): (n, round(n * 1.0 / totals[a], 6))
        for (a, b), n in cells.items()
    }
    got = {
        (r.from_type, r.to_type): (r.n, float(r.prob))
        for r in registry.queries()["q_type_transition_matrix"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_user_value_deciles_matches_python_referee(spark, sf_dir):
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT user_id, value FROM read_parquet('{sf_dir}/events.parquet') "
        f"WHERE event_type = 'purchase'"
    ).fetchall()
    q6 = Decimal(1).scaleb(-6)
    totals = {}
    for uid, v in rows:
        totals[uid] = totals.get(uid, Decimal(0)) + Decimal(v).quantize(q6)
    order = sorted(totals, key=lambda u: (-totals[u], u))
    n = len(order)
    deciles = {}
    # NTILE(10): first (n % 10) buckets get ceil(n/10), rest floor(n/10)
    big, base = n % 10, n // 10
    idx = 0
    for d in range(1, 11):
        size = base + (1 if d <= big else 0)
        for uid in order[idx : idx + size]:
            deciles.setdefault(d, []).append(uid)
        idx += size
    grand = sum(totals.values())
    expected = {
        d: (
            len(uids),
            float(sum(totals[u] for u in uids)),
            round(float(sum(totals[u] for u in uids)) / float(grand), 6),
        )
        for d, uids in deciles.items()
    }
    got = {
        r.decile: (r.n_users, float(r.decile_value), float(r.value_share))
        for r in registry.queries()["q_user_value_deciles"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_vocab_growth_matches_python_referee(spark, sf_dir):
    """Pure-Python Heaps curve: type-7 interpolated doc_id percentiles as
    cutoffs, vocabulary = terms whose first-bearing doc_id <= cutoff."""
    docs = _docs(sf_dir)
    ids = sorted(docs)
    n = len(ids)

    def quantile_type7(p):
        h = (n - 1) * p
        lo = int(h)
        hi = min(lo + 1, n - 1)
        return ids[lo] + (h - lo) * (ids[hi] - ids[lo])

    first = {}
    for d in ids:
        for t in docs[d]:
            if t not in first or d < first[t]:
                first[t] = d
    expected = {}
    prev_vocab = 0
    for c in range(1, 11):
        cut = quantile_type7(c / 10.0)
        n_docs = sum(1 for d in ids if d <= cut)
        vocab = sum(1 for fd in first.values() if fd <= cut)
        expected[c] = (n_docs, vocab, vocab - prev_vocab)
        prev_vocab = vocab
    got = {
        r.checkpoint: (r.n_docs, r.vocab_size, r.new_terms)
        for r in registry.queries()["q_vocab_growth"](spark, sf_dir).collect()
    }
    assert got == expected


def test_quality_percentile_gate_matches_python_referee(spark, sf_dir):
    """Pure-Python adaptive gate: per-source p25 of the rounded stopword
    ratio, keep-side stats recomputed exactly (Fraction-free: scores are
    6-dp decimals, so Python floats reproduce the DECIMAL fold)."""
    import re as _re
    from decimal import Decimal

    rows = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
        " WHERE length(text) > 0"
    ).fetchall()
    by_source = {}
    stop_re = _re.compile(r"\b(the|and|of|to|in)\b")
    for source, text in rows:
        toks = _re.findall(r"\S+", text)
        if not toks:
            continue
        score = round(len(stop_re.findall(text.lower())) * 1.0 / len(toks), 6)
        by_source.setdefault(source, []).append(score)

    def quantile_type7(vals, p):
        vs = sorted(vals)
        h = (len(vs) - 1) * p
        lo = int(h)
        hi = min(lo + 1, len(vs) - 1)
        return vs[lo] + (h - lo) * (vs[hi] - vs[lo])

    expected = {}
    for source, scores in by_source.items():
        thr = round(quantile_type7(scores, 0.25), 6)
        kept = [s for s in scores if s >= thr]
        avg = float(
            sum(Decimal(repr(s)).quantize(Decimal("1e-12")) for s in kept)
        ) / len(kept)
        expected[source] = (
            thr,
            len(scores),
            len(kept),
            round(len(kept) * 1.0 / len(scores), 6),
            round(avg, 6),
        )
    got = {
        r.source: (
            float(r.threshold),
            r.n_docs,
            r.n_kept,
            float(r.kept_ratio),
            float(r.avg_score_kept),
        )
        for r in registry.queries()["q_quality_percentile_gate"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected


def test_label_propagation_matches_python_referee(spark, sf_dir):
    from collections import Counter, defaultdict
    from itertools import combinations

    by_user = _user_items(sf_dir)
    w = Counter()
    for its in by_user.values():
        for a, b in combinations(sorted(its), 2):
            w[(a, b)] += 1
    adj = defaultdict(list)
    for (a, b), n in w.items():
        adj[a].append((b, n))
        adj[b].append((a, n))
    labels = {v: v for v in adj}
    for _ in range(3):
        new = {}
        for v, nbrs in adj.items():
            tw = Counter()
            for u, n in nbrs:
                tw[labels[u]] += n
            # greatest total incident weight, ties -> smallest label
            new[v] = max(tw.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        labels = new
    sizes = Counter(labels.values())
    expected = {v: (lab, sizes[lab]) for v, lab in labels.items()}
    got = {
        r.item_id: (r.community, r.n_members)
        for r in registry.queries()["q_label_propagation"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # vacuity guard: at least one label actually propagated (the dense
    # sf0.001 co-occurrence graph legitimately collapses to ONE community
    # by round 3, so "more than one community" would be corpus-dependent)
    assert len(sizes) < len(labels)


def test_kcore_matches_python_referee(spark, sf_dir):
    from collections import Counter, defaultdict
    from itertools import combinations

    by_user = _user_items(sf_dir)
    w = Counter()
    for its in by_user.values():
        for a, b in combinations(sorted(its), 2):
            w[(a, b)] += 1
    # type-7 interpolated p90, mirroring F.percentile / quantile_cont
    xs = sorted(w.values())
    pos = 0.9 * (len(xs) - 1)
    lo = int(pos)
    hi = min(lo + 1, len(xs) - 1)
    t = xs[lo] + (pos - lo) * (xs[hi] - xs[lo])
    adj = defaultdict(set)
    for (a, b), n in w.items():
        if n > t:
            adj[a].add(b)
            adj[b].add(a)
    surviving = set(adj)
    deg = {}
    for _ in range(4):
        deg = {
            v: sum(1 for u in adj[v] if u in surviving)
            for v in surviving
        }
        surviving = {v for v, d in deg.items() if d >= 4}
    expected = {v: d for v, d in deg.items() if d >= 4}
    got = {
        r.item_id: r.core_degree
        for r in registry.queries()["q_kcore_items"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # vacuity guards: the peel removed someone and kept someone
    assert expected
    assert len(expected) < len(adj)


def test_zorder_layout_matches_python_referee(spark, sf_dir):
    rows = duckdb.sql(
        f"SELECT l_partkey, l_suppkey "
        f"FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchall()

    def morton(a, b):
        z = 0
        for i in range(16):
            z += ((a >> i) & 1) << (2 * i + 1)
            z += ((b >> i) & 1) << (2 * i)
        return z

    zs = [(morton(p & 0xFFFF, s & 0xFFFF), p, s) for p, s in rows]
    width = max(z for z, _, _ in zs) // 64 + 1
    expected = {}
    for z, p, s in zs:
        f = z // width
        if f not in expected:
            expected[f] = [0, p, p, s, s]
        e = expected[f]
        e[0] += 1
        e[1], e[2] = min(e[1], p), max(e[2], p)
        e[3], e[4] = min(e[3], s), max(e[4], s)
    expected = {
        f: (n, pmin, pmax, smin, smax, pmax - pmin + 1, smax - smin + 1)
        for f, (n, pmin, pmax, smin, smax) in expected.items()
    }
    got = {
        r.file_id: (
            r.n_rows, r.part_min, r.part_max, r.supp_min, r.supp_max,
            r.part_span, r.supp_span,
        )
        for r in registry.queries()["q_zorder_layout"](
            spark, sf_dir
        ).collect()
    }
    assert got == expected
    # the layout property itself: every file's (partkey × suppkey)
    # bounding box must cover well under the full key plane — the
    # file-skipping win.  (Per-dimension tightness is only guaranteed when
    # the keys have comparable bit widths; at sf0.001 suppkey spans 4 bits
    # vs partkey's 8, so the top Morton bits — and hence the file cuts —
    # are partkey-dominated.  Area tightness holds regardless.)
    full_p = max(p for _, p, _ in zs) - min(p for _, p, _ in zs) + 1
    full_s = max(s for _, _, s in zs) - min(s for _, _, s in zs) + 1
    assert len(got) > 1
    for _, (_, _, _, _, _, pspan, sspan) in got.items():
        assert pspan * sspan <= full_p * full_s // 4


def test_bloom_prefilter_matches_python_referee(spark, sf_dir):
    M, K = 131072, 3
    urgent = {
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{sf_dir}/orders.parquet') "
            f"WHERE o_orderpriority = '1-URGENT'"
        ).fetchall()
    }
    fact = [
        r[0]
        for r in duckdb.sql(
            f"SELECT l_orderkey FROM read_parquet('{sf_dir}/lineitem.parquet')"
        ).fetchall()
    ]

    def pos(key, i):
        return int(
            hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16
        ) % M

    bits = {pos(k, i) for k in urgent for i in range(K)}
    n_bloom = n_exact = n_fp = 0
    for k in fact:
        bp = all(pos(k, i) in bits for i in range(K))
        ex = k in urgent
        n_bloom += bp
        n_exact += ex
        n_fp += bp and not ex
    expected = (
        len(fact), n_bloom, n_exact, n_fp,
        round(n_fp / (len(fact) - n_exact), 6),
    )
    row = registry.queries()["q_bloom_prefilter_join"](
        spark, sf_dir
    ).collect()[0]
    got = (
        row.n_fact, row.n_bloom_pass, row.n_exact, row.n_false_pos,
        float(row.fp_rate),
    )
    assert got == expected
    # the Bloom contract: never a false negative, and the filter filters
    assert row.n_exact <= row.n_bloom_pass
    assert row.n_bloom_pass < row.n_fact


def test_neardup_canonical_invariants(spark, sf_dir):
    """Keep-longest canonical selection: exactly one kept doc per group,
    every member points at it, and it maximizes (n_chars, -doc_id)."""
    n_chars = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars "
            f"FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    )
    rows = registry.queries()["q_neardup_canonical"](
        spark, sf_dir
    ).collect()
    assert rows
    by_group = {}
    for r in rows:
        by_group.setdefault(r.group_id, []).append(r)
    for gid, ms in by_group.items():
        assert len(ms) > 1  # singletons are excluded by definition
        kept = [m for m in ms if m.is_kept]
        assert len(kept) == 1
        best = max(ms, key=lambda m: (n_chars[m.doc_id], -m.doc_id))
        assert kept[0].doc_id == best.doc_id
        assert all(m.canonical_doc == best.doc_id for m in ms)


def test_random_projection_matches_python_referee(spark, sf_dir):
    from changesetmd_spark.operators.similarity import _rp_signs

    signs = _rp_signs()
    rows = duckdb.sql(
        f"SELECT vec_id, embedding "
        f"FROM read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    expected = {}
    for vec_id, emb in rows:
        proj = []
        for row in signs:
            acc = 0.0
            for x, sg in zip(emb, row):  # same left-fold order as engines
                acc += float(x) * sg
            proj.append(acc)
        expected[vec_id] = proj
    got = {
        r.vec_id: [r[f"p{j}"] for j in range(8)]
        for r in registry.queries()["q_embedding_random_projection"](
            spark, sf_dir
        ).collect()
    }
    assert set(got) == set(expected)
    for v in got:
        for a, b in zip(got[v], expected[v]):
            # engines round(…, 6); referee keeps full precision
            assert abs(a - b) <= 5e-7, (v, got[v], expected[v])
    # JL sanity: the ±1 projection preserves squared norms in expectation
    # (E‖Pv‖² = D/d·‖v‖² for Rademacher rows) — check the corpus average
    # is within 3x of the ideal ratio, which a sign/indexing bug breaks
    import math

    d_ratio = []
    for vec_id, emb in rows:
        full = sum(float(x) * float(x) for x in emb)
        proj = sum(p * p for p in expected[vec_id])
        if full > 0:
            d_ratio.append(proj / full)
    mean_ratio = sum(d_ratio) / len(d_ratio)
    ideal = 8.0  # D rows of unnormalized ±1 signs: E‖Pv‖² = D·‖v‖²
    assert ideal / 3 <= mean_ratio <= ideal * 3, mean_ratio
    assert math.isfinite(mean_ratio)


def test_ppjoin_matches_bruteforce_referee(spark, sf_dir):
    """PPJoin's claim is EXACTNESS at threshold: the prefix filter may not
    lose a single qualifying pair.  The referee ignores the prefix/size
    filters entirely and brute-forces every doc pair's shingle-set Jaccard
    — the result sets must be identical (pairs, sizes, intersection)."""
    docs = _docs(sf_dir)
    T_NUM, T_DEN = 3, 5

    def shingles(toks):
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    sets = {d: shingles(t) for d, t in docs.items()}
    ids = sorted(sets)
    exp = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * T_DEN >= T_NUM * union:
                exp[(a, b)] = (len(sets[a]), len(sets[b]), inter)

    got = {
        (r.doc_id_1, r.doc_id_2): (r.size_1, r.size_2, r.n_common)
        for r in registry.queries()["q_ppjoin_similar_docs"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    assert exp, "degenerate fixture: no qualifying pair exercised"


def test_ppjoin_positional_filter_funnel(spark, sf_dir):
    """Candidates → verified funnel referee for the positional filter: a
    pure-Python rebuild of the prefix pipeline shows (a) the positional
    bound prunes strictly more than prefix+size alone, and (b) every
    truly-qualifying pair still passes it (no false negatives) — the
    pigeonhole argument the operator's docstring makes, checked on data."""
    docs = _docs(sf_dir)
    T_NUM, T_DEN = 3, 5

    def shingles(toks):
        if len(toks) >= 3:
            return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        return {" ".join(toks)}

    sets = {d: shingles(t) for d, t in docs.items()}
    df = {}
    for sh in sets.values():
        for g in sh:
            df[g] = df.get(g, 0) + 1
    # global (df, token) order; per-doc ranked token list and prefix
    order = {g: i for i, g in enumerate(sorted(df, key=lambda g: (df[g], g)))}
    ranked = {
        d: sorted(sh, key=order.__getitem__) for d, sh in sets.items()
    }
    pref = {}
    for d, toks in ranked.items():
        sz = len(toks)
        plen = sz - -(-sz * T_NUM // T_DEN) + 1
        pref[d] = {g: i + 1 for i, g in enumerate(toks[:plen])}

    inv = {}
    for d, pg in pref.items():
        for g in pg:
            inv.setdefault(g, []).append(d)
    prefix_size_cands, positional_cands = set(), set()
    for g, ds in inv.items():
        for i, a in enumerate(ds):
            for b in ds[i + 1 :]:
                a2, b2 = min(a, b), max(a, b)
                sz1, sz2 = len(sets[a2]), len(sets[b2])
                if T_NUM * max(sz1, sz2) > T_DEN * min(sz1, sz2):
                    continue
                prefix_size_cands.add((a2, b2))
                bound = (
                    min(sz1 - pref[a2][g], sz2 - pref[b2][g]) + 1
                )
                if bound * (T_NUM + T_DEN) >= T_NUM * (sz1 + sz2):
                    positional_cands.add((a2, b2))

    truth = set()
    for a, b in prefix_size_cands:
        inter = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - inter
        if inter * T_DEN >= T_NUM * union:
            truth.add((a, b))

    assert positional_cands <= prefix_size_cands
    assert truth <= positional_cands, sorted(truth - positional_cands)
    assert len(positional_cands) < len(prefix_size_cands), (
        "positional filter pruned nothing on this fixture — "
        f"{len(prefix_size_cands)} candidates"
    )


def test_phrase_search_matches_python_referee(spark, sf_dir):
    """Brute-force referee: slide a length-3 window over every document's
    token list and count literal phrase occurrences — no index, no joins.
    The operator's positional-postings intersection must agree exactly."""
    from changesetmd_spark.operators.phrase import _PHRASES

    docs = _docs(sf_dir)
    exp = {}
    for doc_id, toks in docs.items():
        for ph in _PHRASES:
            w = ph.split(" ")
            hits = [
                i + 1
                for i in range(len(toks) - 2)
                if toks[i : i + 3] == w
            ]
            if hits:
                exp[(ph, doc_id)] = (len(hits), hits[0])

    got = {
        (r.phrase, r.doc_id): (r.n_matches, r.first_pos)
        for r in registry.queries()["q_phrase_search"](spark, sf_dir).collect()
    }
    assert got == exp
    assert exp, "degenerate fixture: no phrase occurrence exercised"


def test_pps_sample_matches_python_referee(spark, sf_dir):
    """Referee recomputes the systematic-PPS pin rule with plain Python
    ints; also pins the design invariants: total picks == n exactly (every
    pin lands in exactly one weight segment) and every pick multiplicity
    is positive."""
    import duckdb as _dd

    from changesetmd_spark.operators.sampling import _PPS_N

    rows = _dd.sql(
        "SELECT doc_id, n_chars FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    w = sum(n for _, n in rows)
    exp = {}
    cum = 0
    for doc_id, n in rows:
        lo = cum * _PPS_N // w
        cum += n
        hi = cum * _PPS_N // w
        if hi > lo:
            exp[doc_id] = (hi - lo, lo + 1)

    got = {
        r.doc_id: (r.n_picks, r.first_pin)
        for r in registry.queries()["q_pps_systematic_sample"](
            spark, sf_dir
        ).collect()
    }
    assert got == exp
    assert sum(p for p, _ in got.values()) == _PPS_N
    assert all(p >= 1 for p, _ in got.values())


def test_scd2_intervals_are_consistent(spark, sf_dir):
    """SCD2 structural invariants no single-row hash can express: per
    customer the runs tile the history (valid_to of run k == valid_from of
    run k+1, no gaps/overlaps), exactly ONE open (is_current) interval per
    customer, and n_orders sums to the customer's order count."""
    import duckdb as _dd

    out = (
        registry.queries()["q_scd2_priority_history"](spark, sf_dir)
        .orderBy("o_custkey", "run_id")
        .collect()
    )
    counts = dict(
        _dd.sql(
            "SELECT o_custkey, COUNT(*) FROM "
            f"read_parquet('{sf_dir}/orders.parquet') GROUP BY o_custkey"
        ).fetchall()
    )
    by_cust = {}
    for r in out:
        by_cust.setdefault(r.o_custkey, []).append(r)
    assert set(by_cust) == set(counts)
    for cust, runs in by_cust.items():
        assert [r.run_id for r in runs] == list(range(1, len(runs) + 1))
        for a, b in zip(runs, runs[1:]):
            assert a.valid_to == b.valid_from  # tiling, no gaps
            assert a.is_current == 0
            assert a.priority != b.priority  # runs are maximal
        assert runs[-1].is_current == 1 and runs[-1].valid_to is None
        assert sum(r.n_orders for r in runs) == counts[cust]
