"""BPE tokenizer training step (SURVEY §2.11 E4 extension — the
vocabulary-induction pass of a training-data pipeline).

Classic Sennrich-style byte-pair encoding, distributed the way it scales
to 100 TB: the corpus is touched ONCE to build the word-frequency table
(a vocab-sized aggregate with map-side combine), and every BPE iteration
after that runs on the *vocabulary*, not the corpus — symbol-pair counts
are weighted by word frequency, so a 100 TB corpus and its ~10 M-row
vocab produce identical merges at a tiny fraction of the scan cost.

The query materializes two iterations end-to-end:

* **iter 0** — adjacent symbol-pair counts over char-split words;
* **merge** — the argmax pair (count desc, pair asc — the deterministic
  BPE tie-break) is greedily applied left-to-right to every word via a
  sequential array fold (no Python, whole-stage codegen);
* **iter 1** — pair counts over the merged symbol arrays.

Both engines fold the merge with the same left-to-right greedy rule, so
the oracle is exact.  Reference parity: the reference has no tokenizer
tier; this extends it per the mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import load_table

_TOP = 20


def _pair_counts(syms_df: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over ``(syms array<string>, cnt)``."""
    pairs = syms_df.filter(F.size("syms") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> concat(syms[i - 1], '+', syms[i]))"
            )
        ).alias("pair"),
        "cnt",
    )
    return pairs.groupBy("pair").agg(F.sum("cnt").alias("pair_count"))


def _greedy_merge(syms: Column, p1: Column, p2: Column) -> Column:
    """Greedy left-to-right application of merge (p1, p2) to a symbol
    array — the exact BPE merge rule, as a sequential fold."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == p1)
            & (s == p2),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(p1, p2))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


@register(
    "q_bpe_train_step",
    oracle=f"""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS cnt
      FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
            FROM documents)
      GROUP BY 1
    ), wsyms AS (
      SELECT list_transform(generate_series(1, length(word)),
                            i -> word[i:i]) AS syms, cnt
      FROM words WHERE length(word) >= 2
    ), pairs0 AS (
      SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
                            i -> syms[i] || '+' || syms[i + 1])) AS pair, cnt
            FROM wsyms)
      GROUP BY 1
    ), top1 AS (
      SELECT string_split(pair, '+')[1] AS p1, string_split(pair, '+')[2] AS p2
      FROM pairs0 ORDER BY pair_count DESC, pair LIMIT 1
    ), merged AS (
      SELECT list_reduce(
               list_transform(syms, s -> [s]),
               (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = p1
                                     AND x[1] = p2
                                THEN list_append(acc[1:len(acc)-1], p1 || p2)
                                ELSE list_concat(acc, x) END
             ) AS syms, cnt
      FROM wsyms CROSS JOIN top1
    ), pairs1 AS (
      SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
                            i -> syms[i] || '+' || syms[i + 1])) AS pair, cnt
            FROM merged WHERE len(syms) >= 2)
      GROUP BY 1
    )
    SELECT * FROM (
      SELECT 0 AS iter, pair, pair_count FROM pairs0
      ORDER BY pair_count DESC, pair LIMIT {_TOP}
    )
    UNION ALL
    SELECT * FROM (
      SELECT 1 AS iter, pair, pair_count FROM pairs1
      ORDER BY pair_count DESC, pair LIMIT {_TOP}
    )
    """,
)
def q_bpe_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two BPE training iterations over ``documents``: char-pair counts,
    the argmax merge applied greedily to the vocabulary, and the
    post-merge pair counts — top-{_TOP} per iteration.

    Scale shape: ONE corpus scan builds the word-frequency table
    (map-side combined, vocab-sized); both pair-count iterations and the
    merge fold run over the vocab only, so per-iteration cost at 100 TB
    is O(vocab), not O(corpus).  The argmax merge is a 1-row broadcast
    cross join; the merge itself is a codegen'd sequential array fold —
    no Python, no shuffle beyond the vocab-sized pair aggregates."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    words = docs.select(
        F.explode(F.expr("regexp_extract_all(t, '[a-z]+', 0)")).alias("word")
    )
    wc = (
        words.groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .filter(F.length("word") >= 2)
    )
    wsyms = wc.select(
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
        "cnt",
    ).localCheckpoint(eager=False)

    pairs0 = _pair_counts(wsyms)

    def top(df: DataFrame, it: int) -> DataFrame:
        return (
            df.orderBy(F.desc("pair_count"), F.asc("pair"))
            .limit(_TOP)
            .select(F.lit(it).alias("iter"), "pair", "pair_count")
        )

    # the argmax merge is row 1 of the already-computed top-20 — deriving
    # it from the (lazily checkpointed, 20-row) frame aggregates the
    # iteration-0 pairs exactly once
    top0 = top(pairs0, 0).localCheckpoint(eager=False)
    top1 = (
        top0.orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(1)
        .select(
            F.split(F.col("pair"), r"\+").getItem(0).alias("p1"),
            F.split(F.col("pair"), r"\+").getItem(1).alias("p2"),
        )
    )
    merged = wsyms.crossJoin(F.broadcast(top1)).select(
        _greedy_merge(F.col("syms"), F.col("p1"), F.col("p2")).alias("syms"),
        "cnt",
    )
    pairs1 = _pair_counts(merged)
    return top0.unionByName(top(pairs1, 1))
