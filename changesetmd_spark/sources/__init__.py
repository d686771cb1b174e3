from .schema import (
    CHANGESET_SCHEMA,
    CHANGESET_XML_READ_SCHEMA,
    COMMENT_SCHEMA,
)
from .xml_source import (
    comments_table,
    normalize_changesets,
    parse_changeset_xml_strings,
    read_changeset_xml,
)

__all__ = [
    "CHANGESET_SCHEMA",
    "CHANGESET_XML_READ_SCHEMA",
    "COMMENT_SCHEMA",
    "comments_table",
    "normalize_changesets",
    "parse_changeset_xml_strings",
    "read_changeset_xml",
]
