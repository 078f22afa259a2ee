"""Semi-structured data via Spark 4 VariantType.

The 100 TB reality of crawl/telemetry corpora is that a large share of
each record is schemaless JSON (page metadata, extraction annotations,
per-source sidecars). Casting it to string and regexing is slow and
lossy; exploding it into a fixed struct schema breaks on the first new
field. Spark 4's VARIANT type keeps the open document encoded in a
compact binary form, path access is evaluated JVM-side inside codegen
(``variant_get``), and Parquet writers can shred frequently-accessed
paths into real columns — so the open schema costs nothing until a new
path is touched.

Surface:

* :func:`to_variant` — parse a JSON string column into a VARIANT.
* :func:`variant_field` — typed path extraction (`$.a.b[0]` syntax);
  the strict form raises on type mismatch, ``strict=False`` yields null
  (``try_variant_get``) — the right default for dirty corpora.
* :func:`shred_variant` — project a dict of name -> (path, type) into
  typed top-level columns, the manual analogue of Parquet variant
  shredding and the step that turns an open document into
  filter/group-able columns.

No reference counterpart (the reference's type surface is
arrow-schema-fixed; SURVEY §1.2) — this is a beyond-reference extension
on the sources/types axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_variant(col: Column | str) -> Column:
    """Parse a JSON string column into a VARIANT value. Malformed JSON
    raises; use ``F.try_parse_json`` upstream for skip-and-null
    semantics on dirty inputs."""
    return F.parse_json(F.col(col) if isinstance(col, str) else col)


def variant_field(
    col: Column | str, path: str, dtype: str, strict: bool = False
) -> Column:
    """Extract ``path`` (``$.a.b[0]`` syntax) from a VARIANT column as
    ``dtype``. ``strict=True`` errors on a type mismatch; the default
    yields null for missing paths AND uncastable values — what a
    million-source corpus wants."""
    c = F.col(col) if isinstance(col, str) else col
    getter = F.variant_get if strict else F.try_variant_get
    return getter(c, path, dtype)


def shred_variant(
    df: DataFrame,
    variant_col: str,
    fields: dict[str, tuple[str, str]],
    keep: bool = False,
) -> DataFrame:
    """Shred a VARIANT column into typed top-level columns:
    ``fields`` maps output name -> (JSONPath, Spark DDL type). The
    projection is map-side codegen (zero shuffle, zero Python); after
    shredding, filters and aggregations on the extracted columns behave
    exactly like native columns (pushdown, pruning, partial agg). Drop
    the variant itself unless ``keep`` — carrying the full open document
    through downstream shuffles is the classic accidental 10x."""
    others = [c for c in df.columns if c != variant_col or keep]
    return df.select(
        *others,
        *[
            variant_field(variant_col, path, dtype).alias(name)
            for name, (path, dtype) in fields.items()
        ],
    )
