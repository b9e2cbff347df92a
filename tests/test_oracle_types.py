"""Oracle-SQL type lint: no oracle may surface a DuckDB HUGEINT column.

DuckDB widens SUM over integer columns to HUGEINT (int128); pandas then
converts that to float64, and the driver's value-hash diverges from the
Spark bigint even when every value is numerically identical.  This is
exactly how ``l_corpus_stats`` stayed red for two rounds (VERDICT r6
"What's wrong" #1): the cure is ``CAST(SUM(...) AS BIGINT)`` in the
oracle, and this lint makes the whole class of red row unrepresentable.

The check compiles every registered oracle against the sf views WITHOUT
executing it (``con.sql(...)`` is lazy) and asserts none of its output
columns has logical type HUGEINT/UHUGEINT.
"""

from __future__ import annotations

import pytest

from bristle_spark.registry import all_specs

SPECS = all_specs()
WITH_ORACLE = sorted(n for n, s in SPECS.items() if s.oracle is not None)

BANNED = {"HUGEINT", "UHUGEINT"}


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_has_no_hugeint_columns(name, oracle):
    rel = oracle.sql(SPECS[name].oracle)
    offending = [
        (col, str(typ)) for col, typ in zip(rel.columns, rel.types) if str(typ) in BANNED
    ]
    assert not offending, (
        f"{name}: oracle column(s) {offending} are DuckDB HUGEINT — wrap the "
        f"aggregate in CAST(... AS BIGINT) so the driver's value-hash matches "
        f"Spark's bigint (see VERDICT r6 #1 / l_corpus_stats)"
    )
