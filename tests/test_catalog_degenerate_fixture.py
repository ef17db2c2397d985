"""Catalog-wide robustness sweep: EVERY query entry must execute (not
necessarily return rows) against a degenerate tiny corpus — empty
documents, single-word docs, 2-3-row fact tables, k-means/PQ sample
sizes below k, zero-token sources.  ANSI mode turns any unguarded
ratio into a job failure, and the real sf corpora contain none of
these edge rows, so this fixture is the only automated coverage for
them (it caught 4 divide-by-zero failures on first run: the stopword /
punct ratios on the empty doc and the zero-token-domain mixture
weight)."""

import datetime as dt

import pytest

from graphdb_for_drones_spark.plans import QUERIES


@pytest.fixture(scope="module")
def tiny_sf(spark, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("sf_tiny"))

    def w(name, rows, schema):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            f"{tmp}/{name}.parquet"
        )

    w("region", [(0, "ASIA", "x"), (1, "EUROPE", "y")],
      "r_regionkey long, r_name string, r_comment string")
    w("nation",
      [(0, "NATION_0", 0, "a"), (1, "NATION_1", 0, "a"),
       (2, "NATION_2", 1, "a"), (5, "NATION_5", 0, "a")],
      "n_nationkey long, n_name string, n_regionkey long, n_comment string")
    w("customer",
      [(1, "Customer#000000001", 1, "BUILDING"),
       (2, "Customer#000000002", 2, "AUTO")],
      "c_custkey long, c_name string, c_nationkey long, c_mktsegment string")
    w("supplier", [(1, "Supplier#1", 1), (2, "Supplier#2", 5)],
      "s_suppkey long, s_name string, s_nationkey long")
    w("part",
      [(1, "green thing", "B1", "ECONOMY", 1, 10.0),
       (2, "red thing", "B2", "SMALL", 2, 20.0)],
      "p_partkey long, p_name string, p_brand string, p_type string,"
      " p_size long, p_retailprice double")
    w("orders",
      [(10, 1, "O", 100.0, dt.datetime(2024, 1, 1), "1-URGENT"),
       (11, 2, "F", 200.0, dt.datetime(2024, 1, 2), "2-HIGH")],
      "o_orderkey long, o_custkey long, o_orderstatus string,"
      " o_totalprice double, o_orderdate timestamp, o_orderpriority string")
    w("lineitem",
      [(10, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 5)),
       (10, 2, 2, 2, 2.0, 20.0, 0.1, 0.0, "N", "O", dt.datetime(2024, 1, 6)),
       (11, 1, 2, 1, 3.0, 30.0, 0.05, 0.0, "R", "F", dt.datetime(2024, 1, 7))],
      "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
      " l_quantity double, l_extendedprice double, l_discount double,"
      " l_tax double, l_returnflag string, l_linestatus string,"
      " l_shipdate timestamp")
    w("events",
      [(1, dt.datetime(2024, 1, 1, 0, 0, 1), 1, "signup", 1.0, '{"a":1}'),
       (2, dt.datetime(2024, 1, 1, 0, 0, 2), 1, "click", 2.0, "{}"),
       (3, dt.datetime(2024, 1, 1, 1, 0, 0), 2, "error", 3.0, '{"b":"x"}'),
       # NULL type/value/props: malformed telemetry rows exist in every
       # real event stream; unguarded aggregates/windows over them are
       # latent job failures or silent NULL propagation
       (4, dt.datetime(2024, 1, 1, 2, 0, 0), 2, None, None, None)],
      "event_id long, ts timestamp, user_id long, event_type string,"
      " value double, props string")
    # the adversarial rows: an EMPTY doc (zero tokens/chars, in the eval
    # slice so src0 has zero tokens), a single-word doc, a normal doc
    w("documents",
      [(0, "", "en", "src0", 0),
       (1, "word", "en", "src1", 4),
       (2, "the a of and in to is common words here now ok", "en", "src1", 46),
       # NULL text (and NULL lang): real data lakes contain them, and
       # an unguarded tokenize/ratio/SUM over a NULL-text document (or
       # an all-NULL domain) is a latent 100 TB job failure
       (3, None, None, "src2", 0)],
      "doc_id long, text string, lang string, source string, n_chars long")
    w("embeddings",
      [(i, [float(j) / (64.0 + i) for j in range(1, 65)], i % 2)
       for i in range(3)]
      # NULL vector and NULL label: failed embedding jobs leave both
      + [(3, None, 0), (4, [float(j) / 70.0 for j in range(1, 65)], None)],
      "vec_id long, embedding array<float>, label long")
    return tmp


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_entry_survives_degenerate_corpus(spark, tiny_sf, name):
    QUERIES[name](spark, tiny_sf).collect()
