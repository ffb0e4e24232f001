"""Driver-compare mimic: every queries() entry with an oracle must match
DuckDB bit-for-bit at sf0.01 (the t2 correctness gate)."""

from __future__ import annotations

import pytest

from tidb_lightning_spark.plans import queries as Q

from .conftest import SF_CORRECTNESS
from .oracle_util import assert_matches

SPECS = [s for s in Q.registry().values() if s.oracle is not None]


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_matches_oracle(spark, duck, spec):
    df = spec.spark(spark, SF_CORRECTNESS)
    assert_matches(df, duck, spec.oracle, name=spec.name)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(entrymod.queries()) >= len(SPECS)
