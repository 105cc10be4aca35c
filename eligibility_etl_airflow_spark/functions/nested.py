"""Nested-schema utilities: recursive struct flattening.

The FHIR layer (functions/fhir.py) extracts KNOWN paths with declared
schemas; this module is the generic complement — "give me every leaf of
whatever structs this relation has as top-level columns", the standard
post-`from_json` / post-ingest normalization step before handing data to
tools that want flat tables (BI exports, JDBC sinks, feature stores).

Flattening is schema-driven (one walk of ``df.schema``, a single
projection — no data pass, no UDF): each struct leaf becomes
``parent_child`` (separator configurable). Arrays are left intact —
exploding is a row-multiplying decision the caller must make explicitly
(``F.explode``/``posexplode``); silently exploding inside a flatten
would change the relation's grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """All struct leaves as top-level columns named by their path.

    Name collisions (``a.b`` vs a literal ``a_b`` column, or two paths
    flattening to the same name) raise rather than silently shadow.
    """
    cols = []
    names: dict[str, str] = {}

    def walk(prefix_expr: str | None, prefix_name: str, schema: StructType) -> None:
        for field in schema.fields:
            expr = f"{prefix_expr}.`{field.name}`" if prefix_expr else f"`{field.name}`"
            name = f"{prefix_name}{sep}{field.name}" if prefix_name else field.name
            if isinstance(field.dataType, StructType):
                walk(expr, name, field.dataType)
            else:
                if name in names:
                    raise ValueError(
                        f"flatten_structs name collision: {names[name]!r} and "
                        f"{expr!r} both flatten to {name!r}; pick a different sep"
                    )
                names[name] = expr
                cols.append(F.expr(expr).alias(name))

    walk(None, "", df.schema)
    return df.select(*cols)
