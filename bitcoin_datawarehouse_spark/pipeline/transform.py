"""Declarative column-transform compiler.

Reference parity (SURVEY.md §2.3): the reference ships a YAML spec
(``data_integration/pull_raw/column_transform.yaml``) with, per table:

* ``columns`` — a select-list where ``src:`` keeps a column and
  ``src: dst`` renames it (P1);
* ``transform`` — derived columns in a bracket DSL naming SQL scalar
  functions over source columns, e.g.
  ``dimension_attribute_name: UPPER([entity])`` (P2, yaml:8).

The compiler turns one table spec into a DataFrame→DataFrame function:
the select-list becomes ``select`` with aliases (column pruning is
then visible to Catalyst, so unreferenced source columns never leave
the scan), and the bracket DSL compiles ``[col]`` references to
column names and hands the expression to ``F.expr`` — every scalar
function the DSL can name is a built-in, JVM-side, codegen-friendly.

Also here: column-name normalization (P3, reference
``load_metadata.ipynb`` lowercases before load) and the audit stamp
(P4, reference ``main.ipynb`` cell 7 ``df["ETL_updated_ts"] = now()``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

try:
    import yaml
except ImportError:  # pragma: no cover - PyYAML is available in CI
    yaml = None

_BRACKET = re.compile(r"\[([A-Za-z_][A-Za-z0-9_]*)\]")

AUDIT_COLUMN = "etl_updated_ts"


def compile_expr(dsl: str) -> F.Column:
    """``UPPER([entity])`` → ``F.expr("UPPER(entity)")``.

    The bracketed form exists so column references survive in SQL
    dialects where bare names could collide with function names; the
    compilation is a plain substitution with identifier validation
    (backticked to be safe against reserved words).
    """
    return F.expr(_BRACKET.sub(lambda m: f"`{m.group(1)}`", dsl))


class TableSpec:
    """One table's parsed spec: renames + derived columns."""

    def __init__(
        self,
        name: str,
        renames: dict[str, str | None],
        derived: dict[str, str],
    ) -> None:
        self.name = name
        self.renames = renames
        self.derived = derived

    def apply(self, df: DataFrame, strict: bool = False) -> DataFrame:
        """Project/rename per spec and add derived columns.

        Derived expressions are evaluated against the *source* column
        names (the DSL references pre-rename names, as the reference
        applies transforms alongside renames), then the output keeps
        exactly select-list + derived columns — one single ``select``,
        so Catalyst prunes unreferenced source columns at the scan.

        ``strict=False`` (default) skips spec columns absent from the
        input — the reference applies a uniform spec shape to every
        table and tolerates shape differences at load time.
        """
        cols = []
        for src, dst in self.renames.items():
            if src in df.columns:
                cols.append(F.col(src).alias(dst or src))
            elif strict:
                raise KeyError(f"{self.name}: missing column {src!r}")
        for name, dsl in self.derived.items():
            refs = _BRACKET.findall(dsl)
            if all(r in df.columns for r in refs):
                cols.append(compile_expr(dsl).alias(name))
            elif strict:
                raise KeyError(f"{self.name}: transform needs {refs}")
        return df.select(*cols) if cols else df


def parse_spec(text: str) -> dict[str, TableSpec]:
    """Parse the reference YAML layout into per-table specs."""
    if yaml is None:
        raise RuntimeError("PyYAML unavailable")
    doc = yaml.safe_load(text)
    specs: dict[str, TableSpec] = {}
    for t in doc.get("tables", []):
        renames: dict[str, str | None] = {}
        for block in t.get("columns", []) or []:
            for src, dst in (block or {}).items():
                renames[src] = dst
        derived: dict[str, str] = {}
        for block in t.get("transform", []) or []:
            for name, dsl in (block or {}).items():
                derived[name] = dsl
        specs[t["name"]] = TableSpec(t["name"], renames, derived)
    return specs


def lowercase_columns(df: DataFrame) -> DataFrame:
    """P3: normalize column names (reference load_metadata.ipynb)."""
    return df.toDF(*[c.lower() for c in df.columns])


def with_audit_column(df: DataFrame) -> DataFrame:
    """P4: stamp load time (reference main.ipynb cell 7)."""
    return df.withColumn(AUDIT_COLUMN, F.current_timestamp())
