"""Schema evolution (reference §1.3: auto.evolve=true on the sink,
supported-changes matrix docs/guides-schema-evolution.md:499-508).

The reference supports ADDITIVE evolution only (new nullable columns);
type changes route to the DLQ. Mirrored here:

- ``diff_schemas``: classify added / removed / type-changed columns.
- ``align_to_evolved``: widen a frame to the union schema (missing
  columns as typed NULLs) — what a MERGE with mergeSchema does in Delta,
  expressed engine-neutrally.
- ``evolve_union``: union two frames across an additive schema change.

Incompatible changes raise; callers route those batches to the DLQ path
(streaming/apply.ParquetUpsertSink dlq_dir), matching the reference's
error contract (test_schema_evolution.py:187,235).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class SchemaDiff:
    added: list[tuple[str, str]] = field(default_factory=list)  # (name, type)
    removed: list[tuple[str, str]] = field(default_factory=list)
    type_changed: list[tuple[str, str, str]] = field(default_factory=list)

    @property
    def is_additive(self) -> bool:
        return not self.removed and not self.type_changed


def diff_schemas(old: T.StructType, new: T.StructType) -> SchemaDiff:
    o = {f.name: f.dataType.simpleString() for f in old.fields}
    n = {f.name: f.dataType.simpleString() for f in new.fields}
    d = SchemaDiff()
    for name, typ in n.items():
        if name not in o:
            d.added.append((name, typ))
        elif o[name] != typ:
            d.type_changed.append((name, o[name], typ))
    for name, typ in o.items():
        if name not in n:
            d.removed.append((name, typ))
    return d


def align_to_evolved(df: DataFrame, evolved: T.StructType) -> DataFrame:
    """Project ``df`` onto the evolved schema, adding NULLs for new
    columns. Raises on non-additive change."""
    d = diff_schemas(df.schema, evolved)
    if d.type_changed:
        raise ValueError(f"incompatible schema change (type): {d.type_changed}")
    if d.removed:
        # the evolved schema lacks columns the frame carries: projecting
        # would silently drop data — callers route such batches to the DLQ
        raise ValueError(f"incompatible schema change (dropped columns): {d.removed}")
    by_name = {f.name: f for f in df.schema.fields}
    cols = []
    for f in evolved.fields:
        if f.name in by_name:
            cols.append(F.col(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def evolve_union(old_df: DataFrame, new_df: DataFrame) -> DataFrame:
    """Union across an additive change: the old rows gain NULLs for the
    new columns (the reference's sink behavior with auto.evolve)."""
    d = diff_schemas(old_df.schema, new_df.schema)
    if not d.is_additive:
        raise ValueError(
            f"non-additive evolution: removed={d.removed} type_changed={d.type_changed}"
        )
    return align_to_evolved(old_df, new_df.schema).unionByName(new_df)
