"""Oracle-compare every registry query at sf0.001 (fast tier).

The driver does the same at sf0.01; this keeps the feedback loop local.
Queries without an oracle get a schema/determinism smoke check instead.
"""

import pytest

from pandas_to_postgres_spark.plans import REGISTRY
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare, duck_con

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if not s.oracle)


@pytest.fixture(scope="module")
def duck():
    con = duck_con(SF_SMOKE)
    yield con
    con.close()


#: queries allowed to carry error-severity lint findings: the X5 UDTF
#: coverage slot IS the row-Python table-function tier.
_LINT_ALLOW = {
    "udtf_sentences": ("python_udf",),
}


def _lint_gate(name, df):
    from pandas_to_postgres_spark.plans.lint import assert_scalable

    assert_scalable(df, allow=_LINT_ALLOW.get(name, ()))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, duck, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    got = df.toPandas()
    want = duck.sql(spec.oracle).df()
    diag = compare(got, want)
    assert diag is None, f"{name}: {diag}"
    # non-degeneracy floor: a silently-empty result (e.g. a join whose
    # key column went all-NULL) must not pass as a vacuous green
    assert len(got) >= spec.min_rows, (
        f"{name}: {len(got)} rows < declared floor {spec.min_rows}"
    )
    # every oracle-checked query must also clear the physical-plan scale
    # lint — the plan was just executed, so this is nearly free
    _lint_gate(name, df)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMOKE)
    n = df.count()
    assert n >= spec.min_rows, (
        f"{name}: {n} rows < declared floor {spec.min_rows}"
    )
    _lint_gate(name, df)
    # determinism: running twice yields the identical multiset
    a = sorted(map(str, df.collect()))
    b = sorted(map(str, spec.fn(spark, SF_SMOKE).collect()))
    assert a == b, f"{name} is not deterministic"
