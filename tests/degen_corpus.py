"""Adversarial degenerate-input fixture corpus (VERDICT r15 next-round #1).

The driver's testdata is read-only and contains no degenerate rows (min
trimmed document length is 48 at sf0.01), so the whole class of
empty/whitespace/unicode-edge divergences between the Spark engine and the
DuckDB oracle is structurally unexercisable by the external gate — yet the
class is REAL: the r14 advisor caught ``q_length_bucket_packing`` diverging
on empty documents (fixed at ``curation.py:1418``).  This module builds a
local corpus that *forces* every such edge through both engines:

* ``documents``: blank text, whitespace-only (ASCII and unicode NBSP/em-space),
  single-token, unicode-confusable (Cyrillic/Latin mix), emoji-only,
  combining-accent, single-repeated-char, single-repeated-token docs —
  appended to the real sf0.001 corpus so every query still has its normal
  signal plus the adversarial tail.
* ``embeddings``: an all-zero (zero-norm) vector, a NaN-poisoned vector, and
  an exact duplicate of an existing vector.
* ``events``: empty JSON props (``{}``), empty-string values in props, and a
  whitespace-only props string — the "empty tag map" class for the
  hstore-parity operators.

All other tables are byte-identical copies of sf0.001, so the fixture dir is
a drop-in ``sf_dir`` for both ``queries()`` builders and DuckDB oracles.

Rebuild is automatic: the corpus is cached under /tmp keyed by
``_GEN_VERSION`` — bump it whenever the degenerate row set changes.
"""

from __future__ import annotations

import math
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

_GEN_VERSION = "v2"
_SRC_SF_DIR = "/root/testdata/sf0.001"

# documents degenerate rows: (text, lang, source).  doc_id and n_chars are
# derived (n_chars = codepoint length, matching the driver generator).
_DEGEN_DOCS: list[tuple[str, str, str]] = [
    ("", "en", "src0"),                                # blank
    ("   \t\n  ", "en", "src1"),                       # ASCII whitespace only
    ("   ", "es", "src0"),              # unicode whitespace only
    ("hello", "en", "src2"),                           # single token
    ("pаypаl аccount", "en", "src0"),   # Cyrillic-confusable mix
    ("\U0001f600\U0001f600 \U0001f389", "fr", "src1"),  # emoji only
    ("café café résumé", "fr", "src2"),  # combining accents
    ("a" * 100, "en", "src0"),                         # one repeated char
    ("word " * 50, "en", "src1"),                      # one repeated token
    ("\tTabs\tonly\there\t", "de", "src2"),            # tab-separated tokens
    (".", "en", "src0"),                               # lone punctuation
    ("1234567890", "en", "src1"),                      # digits only
]


def _append_rows(src_path: str, dst_path: str, rows: list[dict]) -> None:
    """Append rows to a parquet table preserving the exact arrow schema."""
    base = pq.read_table(src_path)
    cols = {
        name: [r[name] for r in rows] for name in base.schema.names
    }
    extra = pa.table(cols, schema=base.schema)
    pq.write_table(pa.concat_tables([base, extra]), dst_path)


def build_degen_dir() -> str:
    """Materialize (or reuse) the degenerate corpus; returns its path."""
    root = f"/tmp/changesetmd_degen_corpus_{_GEN_VERSION}"
    marker = os.path.join(root, "_DONE")
    if os.path.exists(marker):
        return root
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)

    passthrough = (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    )
    for t in passthrough:
        shutil.copyfile(
            os.path.join(_SRC_SF_DIR, f"{t}.parquet"),
            os.path.join(root, f"{t}.parquet"),
        )

    # --- documents -------------------------------------------------------
    docs_src = os.path.join(_SRC_SF_DIR, "documents.parquet")
    base_docs = pq.read_table(docs_src)
    next_doc_id = pa.compute.max(base_docs["doc_id"]).as_py() + 1
    doc_rows = [
        {
            "doc_id": next_doc_id + i,
            "text": text,
            "lang": lang,
            "source": source,
            "n_chars": len(text),
        }
        for i, (text, lang, source) in enumerate(_DEGEN_DOCS)
    ]
    _append_rows(docs_src, os.path.join(root, "documents.parquet"), doc_rows)

    # --- embeddings ------------------------------------------------------
    emb_src = os.path.join(_SRC_SF_DIR, "embeddings.parquet")
    base_emb = pq.read_table(emb_src)
    dim = len(base_emb["embedding"][0].as_py())
    first_vec = base_emb["embedding"][0].as_py()
    first_label = base_emb["label"][0].as_py()
    next_vec_id = pa.compute.max(base_emb["vec_id"]).as_py() + 1
    nan_vec = list(first_vec)
    nan_vec[0] = math.nan
    emb_rows = [
        # zero-norm: cosine denominators hit 0 — both engines must agree
        {"vec_id": next_vec_id, "embedding": [0.0] * dim, "label": first_label},
        # NaN poison: one NaN component propagates through dot/norm
        {"vec_id": next_vec_id + 1, "embedding": nan_vec, "label": first_label},
        # exact duplicate of row 0 (dedup / top-k tie paths)
        {"vec_id": next_vec_id + 2, "embedding": list(first_vec),
         "label": first_label},
    ]
    _append_rows(emb_src, os.path.join(root, "embeddings.parquet"), emb_rows)

    # --- events (empty tag maps) ------------------------------------------
    ev_src = os.path.join(_SRC_SF_DIR, "events.parquet")
    base_ev = pq.read_table(ev_src)
    next_ev_id = pa.compute.max(base_ev["event_id"]).as_py() + 1
    ts0 = base_ev["ts"][0].as_py()
    et0 = base_ev["event_type"][0].as_py()
    # v2 (VERDICT r16 #6, streaming degen classes): ids are residue-pinned
    # so the staged-batch queries route them deterministically —
    # q_stream_late_data_drop sends event_id % 4 == 1 in the LATE batch.
    import datetime as _dt

    def _with_residue(base: int, residue: int) -> int:
        return base + ((residue - base) % 4)

    late_ts = _dt.datetime(2023, 6, 1, 12, 0, 0)  # months before the span
    late_id0 = _with_residue(next_ev_id + 10, 1)
    dup_id0 = next_ev_id + 20
    ev_rows = [
        {"event_id": next_ev_id, "ts": ts0, "user_id": 999_001,
         "event_type": et0, "value": 1.0, "props": "{}"},
        {"event_id": next_ev_id + 1, "ts": ts0, "user_id": 999_002,
         "event_type": et0, "value": 1.0, "props": '{"device": "", "country": ""}'},
        {"event_id": next_ev_id + 2, "ts": ts0, "user_id": 999_003,
         "event_type": et0, "value": 1.0, "props": "  "},
        # v2: empty-STRING numeric value — the props-number try_cast
        # contract class ({"k": ""} killed both engines' CAST, differently)
        {"event_id": next_ev_id + 3, "ts": ts0, "user_id": 999_004,
         "event_type": et0, "value": 1.0, "props": '{"k": ""}'},
        # v2: all-late pair — windows expired months before the watermark;
        # the late-drop engine rule and its oracle must drop both
        {"event_id": late_id0, "ts": late_ts, "user_id": 999_005,
         "event_type": et0, "value": 1.0, "props": '{"k": 3}'},
        {"event_id": late_id0 + 4, "ts": late_ts, "user_id": 999_005,
         "event_type": et0, "value": 2.0, "props": '{"k": 3}'},
        # v2: exact duplicate pair (same user/ts/props, distinct ids) —
        # the dedup/distinct family must collapse them identically
        {"event_id": dup_id0, "ts": ts0, "user_id": 999_006,
         "event_type": et0, "value": 2.0, "props": '{"k": 7}'},
        {"event_id": dup_id0 + 1, "ts": ts0, "user_id": 999_006,
         "event_type": et0, "value": 2.0, "props": '{"k": 7}'},
    ]
    _append_rows(ev_src, os.path.join(root, "events.parquet"), ev_rows)

    with open(marker, "w") as f:
        f.write(_GEN_VERSION)
    return root
