"""r13 regression pins."""

from __future__ import annotations

from tidb_lightning_spark.plans import queries as Q

from .conftest import SF_CORRECTNESS


def test_inverted_index_postings_scalar_schema(spark):
    """The postings column must stay a SCALAR (comma-joined string):
    an array<bigint> output crashed the driver's pandas canonicalizer
    (`unhashable type: 'list'`, r12 verdict item 1) and made the entry
    unverifiable for two rounds."""
    df = Q.registry()["inverted_index_postings"].spark(
        spark, SF_CORRECTNESS
    )
    types = dict(df.dtypes)
    assert types["postings"] == "string", types
    assert all(t in ("string", "bigint") for t in types.values()), types
