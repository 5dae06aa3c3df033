"""Driver-mimic correctness gate: every registered query vs its DuckDB oracle.

Stricter than the driver's value-hash — compares the actual sorted cell
values (with a tight float tolerance to expose any nondeterminism early).
Run at sf0.01, the driver's correctness scale.
"""

from __future__ import annotations

import math

import pytest

from financial_transaction_data_warehouse_interactive_dashboard_spark.plans.queries import (
    REGISTRY,
)

from conftest import SF_ORACLE


def normalize(rows, columns):
    """Sort columns by name (driver semantics), then sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda r: tuple(str(x) for x in r)), [
        columns[i] for i in order
    ]


def cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        # BIT-exact, deliberately: every query's determinism rules
        # (decimal sums, portable hashing, rounded continuous scores)
        # exist precisely so Spark and DuckDB emit identical doubles, and
        # the driver's value-hash comparison is exact. A tolerance here
        # would hide regressions until the driver catches them.
        return fa == fb
    return str(a) == str(b)


ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


def _duck_type_class(t: str) -> str:
    """Coarse type class of a DuckDB DESCRIBE type string."""
    import re as _re

    t = t.upper()
    if "HUGEINT" in t:
        return "hugeint"
    if _re.match(r"(TINY|SMALL|BIG|U?INT|INTEGER)", t) or t == "UBIGINT":
        return "int"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if t in ("VARCHAR", "TEXT"):
        return "str"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]"):
        return "list"
    return "other:" + t


def _spark_type_class(dt) -> str:
    """Coarse type class of a Spark DataType (same partition as above)."""
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s.startswith("decimal"):
        return "decimal"
    if s in ("double", "float"):
        return "float"
    if s == "string":
        return "str"
    if s == "boolean":
        return "bool"
    if s == "date":
        return "date"
    if s.startswith("timestamp"):
        return "ts"
    if s.startswith("array"):
        return "list"
    return "other:" + s


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck_oracle, name):
    q = REGISTRY[name]
    sdf = q.spark(spark, SF_ORACLE)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_oracle.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )

    # Output TYPE-CLASS parity (r8, generalizing the HUGEINT audit): the
    # driver's value-hash canonicalizes by type, so a class divergence
    # (int vs decimal vs float...) can fail the hash on bit-identical
    # values — qa_wilson_ci's HUGEINT n_success was exactly this. A full
    # registry scan found ZERO class mismatches; keep it that way.
    duck_types = {
        r[0]: r[1]
        for r in duck_oracle.execute(f"DESCRIBE {q.oracle}").fetchall()
    }
    class_mismatch = [
        (c, duck_types[c], f.dataType.simpleString())
        for f in sdf.schema.fields
        if (c := f.name) in duck_types
        and _duck_type_class(duck_types[c]) != _spark_type_class(f.dataType)
    ]
    assert not class_mismatch, (
        f"{name}: output type-class divergence (col, duck, spark): "
        f"{class_mismatch}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )

    s_norm, cols = normalize(spark_rows, spark_cols)
    d_norm, _ = normalize(duck_rows, duck_cols)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            assert cells_equal(sv, dv), (
                f"{name}: row {i} col {cols[c]}: spark={sv!r} duck={dv!r}"
            )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["segment", "n"]


def test_registry_oracle_coverage():
    """Every query either has an oracle or is explicitly rows-only."""
    for name, q in REGISTRY.items():
        assert q.spark is not None
        assert q.oracle is None or "SELECT" in q.oracle.upper()


def test_oracle_output_types_have_no_hugeint(duck_smoke):
    """Registry-wide oracle output-type audit (VERDICT r7 ask #1b).

    DuckDB types an un-cast ``sum()`` over integers as HUGEINT, a width
    Spark has no analogue for; the driver's value-hash canonicalizes
    HUGEINT differently from Spark's bigint, so an oracle emitting one
    fails the hash gate even when every value is bit-identical (r7:
    ``qa_wilson_ci``'s ``n_success``, the registry's only raw-HUGEINT
    output). ``DESCRIBE`` binds and types the query without executing
    it, so scanning all 182 oracles costs seconds. Any integer sum an
    oracle outputs must be wrapped in ``CAST(... AS BIGINT)``.
    """
    offenders = {}
    for name in ORACLE_QUERIES:
        res = duck_smoke.execute(f"DESCRIBE {REGISTRY[name].oracle}")
        bad = [
            (col, typ)
            for col, typ, *_ in res.fetchall()
            if "HUGEINT" in typ.upper()
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles with HUGEINT/UHUGEINT output columns (cast them to "
        f"BIGINT): {offenders}"
    )
