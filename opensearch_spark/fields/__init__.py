"""Field-type analogs beyond the core text field (reference:
index/mapper/*FieldMapper). Range-field relations live in
relational/queries.py (pure Catalyst predicates); this package holds
field types that need their own storage/flattening shape."""

from opensearch_spark.fields.flat_object import (  # noqa: F401
    flat_exists,
    flat_term,
    flat_prefix,
    flatten_json,
)
