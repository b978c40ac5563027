"""Meta-tests over the __spark_entry__ harness contract.

Why this exists (VERDICT r8 "What's wrong" #1): `agg_extended` and
`diff_datasets` returned ARRAY-typed columns and the driver's pandas
canonicalizer cannot hash list cells (`TypeError: unhashable type:
'list'` inside `sort_values`), so two value-correct queries failed
driver certification on a column SHAPE. The driver contract is thus:
every DataFrame returned from ``queries()`` carries only atomic-typed
columns — no Array/Map/Struct. Operators may (and do) emit complex
types; the ENTRY PROJECTION must scalarize them (e.g.
``F.array_join`` over an already-sorted array).

Second contract (VERDICT r8 next-round #9): every query either has an
``oracle_sql()`` entry (full hash certification) or carries an
explicit "rows-only" contract string in its docstring, so weaker
certification is a documented decision, never an accidental gap.

The schema check builds every query's plan at sf0.001 — analysis
only, no collect of the result — so it also smoke-guards that every
registry entry still resolves end-to-end against real table schemas.
"""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod
SF_DIR = "/root/testdata/sf0.001"


def _queries():
    return entrymod.queries()


@pytest.mark.parametrize("name", sorted(_queries()))
def test_entry_output_is_atomic_typed(spark, name):
    """The driver canonicalizer hashes cells via pandas sort_values;
    list/dict cells are unhashable. Ban complex types at the entry
    surface (the operators keep theirs)."""
    df = _queries()[name](spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, (
        f"queries()[{name!r}] returns complex-typed column(s) {bad}; "
        "the driver's pandas canonicalizer cannot hash list/dict "
        "cells — project to a scalar (e.g. array_join over a sorted "
        "array) in the ENTRY function, keeping the operator's output "
        "as-is"
    )


def test_every_query_has_oracle_or_documented_contract():
    """A query without oracle SQL gets only the weaker rows-only
    driver check — that must be an explicit, documented contract
    ('rows-only' in the docstring), not an oversight."""
    qs = _queries()
    oracles = set(entrymod.oracle_sql())
    assert not (oracles - set(qs)), "orphan oracle entries"
    missing = []
    for name, fn in qs.items():
        if name in oracles:
            continue
        doc = (fn.__doc__ or "").lower()
        if "rows-only" not in doc and "rows only" not in doc:
            missing.append(name)
    assert not missing, (
        f"queries {missing} have neither an oracle_sql() entry nor a "
        "documented 'rows-only' contract in their docstring"
    )
