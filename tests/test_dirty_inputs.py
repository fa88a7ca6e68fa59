"""Dirty-input robustness: every registered query must plan AND execute
against sources salted with the NULL/degenerate rows a 100 TB corpus
always contains — NULL text/ids/embeddings, empty strings, empty
arrays, NULL measures and dates — without raising.

ANSI mode (Spark 4 default) turns sloppy arithmetic into hard errors
(DIVIDE_BY_ZERO), and Arrow hands Python workers ``None`` where SQL has
NULL, so this gate catches exactly the crashes that would kill a
production DAG on its first real crawl batch: A-ES sampling keys
dividing by a NULL-weight row, cosine against a zero-norm vector,
``None.lower()`` inside a pandas UDF, ``bytes(None)`` payload digests.

Result VALUES on dirty rows are intentionally unconstrained here — the
semantic contracts (drop undefined rows, NULL out undefined stats) are
asserted by each operator's own unit tests; the oracle gate pins clean
data behavior.
"""

from __future__ import annotations

import duckdb
import pytest

from dbt_core_gcloud_template_spark.queries import queries
from dbt_core_gcloud_template_spark.sources.registry import TABLES

# NULLed-out columns per TPC-H table: every non-key measure/attribute
# (keys stay valid so the dirty rows flow through joins, not past them).
TPCH_NULL_COLS = {
    "orders": ["o_orderdate", "o_totalprice", "o_orderpriority", "o_comment",
               "o_orderstatus", "o_clerk"],
    "lineitem": ["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_shipdate", "l_commitdate", "l_receiptdate", "l_returnflag",
                 "l_linestatus", "l_shipmode", "l_shipinstruct", "l_comment"],
    "customer": ["c_name", "c_acctbal", "c_mktsegment", "c_comment",
                 "c_address", "c_phone"],
    "supplier": ["s_name", "s_acctbal", "s_comment", "s_address", "s_phone"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_container",
             "p_retailprice", "p_comment", "p_mfgr"],
    "nation": ["n_comment"],
    "region": ["r_comment"],
}


@pytest.fixture(scope="module")
def dirty_sf_dir(tmp_path_factory, sf_dir):
    """All original rows plus NULL/empty/degenerate rows per table."""
    d = tmp_path_factory.mktemp("dirty_sf")
    con = duckdb.connect()
    t = lambda name: f"'{sf_dir}/{name}.parquet'"
    specs = {
        "documents": f"""
            SELECT * FROM {t('documents')}
            UNION ALL SELECT (SELECT max(doc_id)+1 FROM {t('documents')}), NULL, NULL, NULL, NULL
            UNION ALL SELECT (SELECT max(doc_id)+2 FROM {t('documents')}), '', 'en', 'src0', 0
            UNION ALL SELECT (SELECT max(doc_id)+3 FROM {t('documents')}), '   ', NULL, '', NULL
            UNION ALL SELECT NULL, 'orphan row with null id', 'en', 'src1', 23
        """,
        "embeddings": f"""
            SELECT * FROM {t('embeddings')}
            UNION ALL SELECT (SELECT max(vec_id)+1 FROM {t('embeddings')}), NULL, NULL
            UNION ALL SELECT (SELECT max(vec_id)+2 FROM {t('embeddings')}), CAST([] AS FLOAT[]), 0
            UNION ALL SELECT (SELECT max(vec_id)+3 FROM {t('embeddings')}),
                             (SELECT list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                              FROM {t('embeddings')} LIMIT 1), 0
            UNION ALL SELECT NULL, (SELECT embedding FROM {t('embeddings')} LIMIT 1), 1
        """,
        "events": f"""
            SELECT * FROM {t('events')}
            UNION ALL SELECT (SELECT max(event_id)+1 FROM {t('events')}), NULL, NULL, NULL, NULL, NULL
            UNION ALL SELECT (SELECT max(event_id)+2 FROM {t('events')}),
                             (SELECT max(ts) FROM {t('events')}), 1, '', 0.0, '{{}}'
            UNION ALL SELECT NULL, (SELECT min(ts) FROM {t('events')}), NULL, 'view', NULL, 'not json'
        """,
    }
    for tbl, null_cols in TPCH_NULL_COLS.items():
        all_cols = [
            r[0] for r in con.execute(f"DESCRIBE SELECT * FROM {t(tbl)}").fetchall()
        ]
        proj = ", ".join(
            f"NULL AS {c}" if c in null_cols else c for c in all_cols
        )
        specs[tbl] = f"SELECT * FROM {t(tbl)} UNION ALL (SELECT {proj} FROM {t(tbl)} LIMIT 2)"
    assert set(specs) == set(TABLES)
    for tbl, q in specs.items():
        con.execute(f"COPY ({q}) TO '{d}/{tbl}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(d)


@pytest.mark.parametrize("name", sorted(queries()))
def test_query_survives_dirty_inputs(spark, dirty_sf_dir, name):
    df = queries()[name](spark, dirty_sf_dir)
    assert df.count() >= 0


def test_trained_codebook_cross_engine_on_dirty_corpus(spark, dirty_sf_dir):
    """The bit-identical-codebook gate must survive a DIRTY corpus, not
    just the clean driver fixture (r9 advice): kmeans_fit_replayable
    filters NULL/empty/zero-norm rows through _valid_vectors before
    seeding and assignment, so the embedding_semdedup_trained oracle's
    training CTEs carry the same validity predicate — without it, the
    dirty zero-vector row would join a DuckDB cluster, shift one mean,
    and produce a confusing cross-engine hash mismatch."""
    from dbt_core_gcloud_template_spark.operators.similarity import (
        kmeans_fit_replayable,
    )
    from dbt_core_gcloud_template_spark.queries.extra import _KM_TRAIN_CTES

    emb = spark.read.parquet(f"{dirty_sf_dir}/embeddings.parquet")
    cb = kmeans_fit_replayable(emb, "vec_id", "embedding", k=8, n_iter=2)
    spark_rows = sorted(
        (r.c_id, tuple(r.vector)) for r in cb.collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{dirty_sf_dir}/embeddings.parquet'"
        )
        duck_rows = sorted(
            (int(c), tuple(v))
            for c, v in con.execute(
                _KM_TRAIN_CTES + " SELECT c_id, cv FROM c2"
            ).fetchall()
        )
    finally:
        con.close()
    # bit-identical, no rounding: the trainer's integer-micro means are
    # exact in both engines
    assert spark_rows == duck_rows
    assert len(spark_rows) == 8
