"""Driver-contract invariants over the WHOLE registry, checked from plan
schemas only (no execution): the driver's pandas canonicalizer factorizes
output columns and crashes on non-hashable cells, so no registered query
may emit array/struct/map-typed columns — the failure class that burned
text_inverted_index (r3) and vec_pca_project (r4). Library operators stay
free to return nested types; REGISTRATIONS must scalarize."""

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_no_nested_output_columns_anywhere(spark):
    bad = {}
    for name, fn in E.queries().items():
        schema = fn(spark, SF).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if nested:
            bad[name] = nested
    assert not bad, f"nested output columns would crash the driver canon: {bad}"


# the float-iterative / inherently-approximate tier — the ONLY names
# allowed to ship without a DuckDB oracle (the driver records a weaker
# rows-only check for these; everything else must hash-match)
ROWS_ONLY = {
    "graph_pagerank_custsupp",
    "multimodal_decode",
    "multimodal_features",
    "vec_ann_lsh",
    "vec_ivf_search",
    "vec_ivf_recall",
    "vec_ivfpq_search",
    "vec_mmr_diversify",
    "vec_pca_project",
    "vec_pq_search",
    "vector_semantic_dedup",
}


def test_every_oracle_has_a_query():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # adding a query without an oracle must be a deliberate decision:
    # extend ROWS_ONLY (with a docstring justification on the operator)
    # or write the oracle
    assert set(qs) - set(os_) == ROWS_ONLY
