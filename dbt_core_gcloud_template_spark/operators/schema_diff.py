"""Schema-diff operator (SURVEY.md §2 E15/J2; reference
scripts/pr_schema_diff.sh:134-152,308-359).

The reference computes added/removed/changed columns by jq'ing two
INFORMATION_SCHEMA.COLUMNS dumps.  Here schemas come straight from the
Spark catalog (``StructType``), and the diff is a driver-side set
operation — schemas are metadata, never data-plane work.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


@dataclass
class SchemaDiff:
    added: list[str] = field(default_factory=list)  # in dev, not prod
    removed: list[str] = field(default_factory=list)  # in prod, not dev
    type_changed: list[tuple[str, str, str]] = field(default_factory=list)
    nullability_changed: list[tuple[str, bool, bool]] = field(default_factory=list)

    @property
    def is_clean(self) -> bool:
        return not (
            self.added or self.removed or self.type_changed or self.nullability_changed
        )


def diff_schemas(dev: StructType, prod: StructType) -> SchemaDiff:
    """Compare two schemas the way pr_schema_diff.sh compares column dumps."""
    dev_cols = {f.name: f for f in dev.fields}
    prod_cols = {f.name: f for f in prod.fields}
    out = SchemaDiff()
    out.added = sorted(set(dev_cols) - set(prod_cols))
    out.removed = sorted(set(prod_cols) - set(dev_cols))
    for name in sorted(set(dev_cols) & set(prod_cols)):
        d, p = dev_cols[name], prod_cols[name]
        if d.dataType.simpleString() != p.dataType.simpleString():
            out.type_changed.append(
                (name, d.dataType.simpleString(), p.dataType.simpleString())
            )
        elif d.nullable != p.nullable:
            out.nullability_changed.append((name, d.nullable, p.nullable))
    return out


def schema_diff_frame(
    spark: SparkSession, dev: StructType, prod: StructType
) -> DataFrame:
    """Diff as a (column_name, diff_type) DataFrame (the CI report shape)."""
    d = diff_schemas(dev, prod)
    rows = (
        [(c, "added") for c in d.added]
        + [(c, "removed") for c in d.removed]
        + [(c, "type_changed") for c, _, _ in d.type_changed]
        + [(c, "nullability_changed") for c, _, _ in d.nullability_changed]
    )
    return spark.createDataFrame(rows or [], "column_name string, diff_type string")


def table_schema_diff(spark: SparkSession, dev_fqn: str, prod_fqn: str) -> SchemaDiff:
    """Diff two catalog tables by fully-qualified name."""
    return diff_schemas(spark.table(dev_fqn).schema, spark.table(prod_fqn).schema)


def orphan_relations(spark: SparkSession, schema: str, manifest) -> list[str]:
    """Relations in the schema the manifest doesn't know about
    (reference pr_schema_diff.sh:308-359 'orphaned prod tables'):
    leftovers from renamed/deleted models that keep serving stale data."""
    known = {
        n.fqn.lower()
        for n in manifest.nodes.values()
        if n.resource_type in ("model", "seed", "snapshot")
    }
    if not spark.catalog.databaseExists(schema):
        return []
    out = []
    for t in spark.catalog.listTables(schema):
        fqn = f"{schema}.{t.name}".lower()
        if fqn not in known and not t.isTemporary:
            out.append(f"{schema}.{t.name}")
    return sorted(out)
