"""changesetmd_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ToeBee/ChangesetMD.

The reference (``/root/reference/changesetmd.py``) is the ingest half of a
two-part system: it parses OSM changeset XML into PostgreSQL and delegates the
entire query surface to Postgres (hstore ops, B-tree/GIN/GiST indexes, PostGIS
bbox queries).  This engine provides both halves natively on Spark:

* ``sources``   — XML changeset ingest (ref changesetmd.py:78-125) and the
                  HTTP replication protocol (ref changesetmd.py:127-195).
* ``operators`` — the relational/aggregation/window/map/bbox query surface the
                  reference enables via Postgres (ref queries.py:43-56,
                  README.md:106-124), plus LLM-data-pipeline extensions
                  (dedup, similarity search, text analysis, multimodal).
* ``streaming`` — incremental replication + event-time windowing as
                  Structured Streaming.

Everything is DataFrame-first: logical plans are declared via the DataFrame /
Spark SQL API and physical strategy is left to Catalyst + AQE.
"""

__version__ = "0.1.0"

from .session import get_spark
from .tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
]
