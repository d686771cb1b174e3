"""Hand-declared schemas for the changeset data model (SURVEY.md §1).

Two layers, mirroring the reference's stringly-typed ingest
(ref changesetmd.py:108-113 passes raw XML attribute strings into the typed
Postgres columns of ref queries.py:8-18 and lets the server coerce):

* ``CHANGESET_XML_READ_SCHEMA`` — what the XML scanner emits: every attribute
  a plain string.  Declaring it (instead of letting the XML reader infer)
  matters twice at 100 TB: no sampling pass over the input, and no
  data-dependent type flapping (an all-integer-longitude file would otherwise
  infer ``long`` where the next file infers ``double``).
* ``CHANGESET_SCHEMA`` — the normalized engine schema after the explicit cast
  layer (SURVEY §2.8 F1): the Spark equivalent of ref queries.py:7-27.

Type choices (SURVEY §1.1): coordinates ``decimal(10,7)`` for exact parity
with Postgres ``numeric(10,7)`` (ref queries.py:11-14); timestamps
``timestamp_ntz`` for ``timestamp without time zone`` parity
(ref queries.py:10,15,25); ``tags`` is ``map<string,string>`` replacing
hstore (ref queries.py:19); comments ride along as an array-of-struct column
(the XML is already nested that way, ref changesetmd.py:94-103) and are
exploded to the flat child table on demand.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Raw shape produced by Spark's native XML reader for rowTag="changeset":
# attributes prefixed "_", <tag> children as an attribute-struct array,
# <discussion><comment> as a nested array, comment body text under "text".
CHANGESET_XML_READ_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType()),
        T.StructField("_uid", T.StringType()),
        T.StructField("_created_at", T.StringType()),
        T.StructField("_min_lat", T.StringType()),
        T.StructField("_max_lat", T.StringType()),
        T.StructField("_min_lon", T.StringType()),
        T.StructField("_max_lon", T.StringType()),
        T.StructField("_closed_at", T.StringType()),
        T.StructField("_open", T.StringType()),
        T.StructField("_num_changes", T.StringType()),
        T.StructField("_user", T.StringType()),
        T.StructField(
            "tag",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_k", T.StringType()),
                        T.StructField("_v", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "discussion",
            T.StructType(
                [
                    T.StructField(
                        "comment",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("_uid", T.StringType()),
                                    T.StructField("_user", T.StringType()),
                                    T.StructField("_date", T.StringType()),
                                    T.StructField("text", T.StringType()),
                                ]
                            )
                        ),
                    )
                ]
            ),
        ),
    ]
)

COMMENT_STRUCT = T.StructType(
    [
        T.StructField("comment_user_id", T.LongType()),
        T.StructField("comment_user_name", T.StringType()),
        T.StructField("comment_date", T.TimestampNTZType()),
        T.StructField("comment_text", T.StringType()),
    ]
)

# Normalized engine schema — ref queries.py:7-20 (osm_changeset) with the
# comment child table (ref queries.py:21-27) nested as an array column.
CHANGESET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("user_id", T.LongType()),
        T.StructField("created_at", T.TimestampNTZType()),
        T.StructField("min_lat", T.DecimalType(10, 7)),
        T.StructField("max_lat", T.DecimalType(10, 7)),
        T.StructField("min_lon", T.DecimalType(10, 7)),
        T.StructField("max_lon", T.DecimalType(10, 7)),
        T.StructField("closed_at", T.TimestampNTZType()),
        T.StructField("open", T.BooleanType()),
        T.StructField("num_changes", T.IntegerType()),
        T.StructField("user_name", T.StringType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
        T.StructField("comments", T.ArrayType(COMMENT_STRUCT)),
    ]
)

# Flat child table — ref queries.py:21-27 (osm_changeset_comment).
COMMENT_SCHEMA = T.StructType(
    [
        T.StructField("comment_changeset_id", T.LongType(), nullable=False),
        *COMMENT_STRUCT.fields,
    ]
)
