"""Cross-engine protocol regression tests — the rounding and hashing
contracts every oracle comparison depends on (see oracles.py docstring).
If any of these break, hash-gates fail nondeterministically."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F


def test_e4_floor_half_up_matches_duckdb():
    """floor(x*1e4 + 0.5) — including negative halves — is identical in
    Python (driver-side), DuckDB, and (by construction) numpy."""
    con = duckdb.connect()
    vals = [0.00005, -0.00005, 1.23455, -1.23455, 0.0, 2.5e-5, -3.2617, 0.9999499]
    for v in vals:
        d = con.execute(f"SELECT CAST(floor(({v!r})*10000 + 0.5) AS BIGINT)").fetchone()[0]
        p = math.floor(v * 10000 + 0.5)
        assert d == p, f"{v}: duckdb {d} vs python {p}"


def test_md5_int_matches_between_engines(spark):
    """Spark conv(substr(md5,1,15),16,10) == DuckDB ('0x'||substr)::BIGINT
    for arbitrary strings — the shared hash of minhash/fingerprints."""
    strs = [f"token {i} αβγ" for i in range(20)] + ["", " ", "a b c"]
    df = spark.createDataFrame([(s,) for s in strs], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select(
            "s",
            F.expr("cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)").alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    for s in strs:
        d = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [s]
        ).fetchone()[0]
        assert got[s] == d, f"{s!r}: spark {got[s]} vs duckdb {d}"


def test_minhash_perm_arithmetic_matches(spark):
    """(a*(h%M)+b)%M over int64 — identical in Spark SQL and DuckDB."""
    from scalablevectorsearch_spark.pipeline.dedup import MERSENNE, perm_coeffs

    hashes = [419982666956583591, 0, MERSENNE - 1, 2**59, 12345]
    a, b = perm_coeffs(4)[3]
    expr = f"({a} * (h % {MERSENNE}) + {b}) % {MERSENNE}"
    df = spark.createDataFrame([(h,) for h in hashes], "h long")
    got = {r["h"]: r["p"] for r in df.select("h", F.expr(expr).alias("p")).collect()}
    con = duckdb.connect()
    for h in hashes:
        # CAST the hash literal: in the real oracle h is a BIGINT column,
        # inline INT32 literals would overflow
        d = con.execute(
            f"SELECT ({a} * (CAST({h} AS BIGINT) % {MERSENNE}) + {b}) % {MERSENNE}"
        ).fetchone()[0]
        assert got[h] == d
        assert got[h] == (a * (h % MERSENNE) + b) % MERSENNE  # python too


def test_split_regex_tokenization_matches(spark):
    texts = ["  a  b c ", "one", "", "x\t y\n z", "a  b"]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = {
        r["t"]: r["n"]
        for r in df.select("t", F.size(F.split(F.trim("t"), r"\s+")).alias("n")).collect()
    }
    con = duckdb.connect()
    for t in texts:
        d = con.execute(
            "SELECT len(string_split_regex(trim(?), '\\s+'))", [t]
        ).fetchone()[0]
        assert got[t] == d, f"{t!r}: spark {got[t]} vs duckdb {d}"


def test_every_query_has_an_oracle():
    """Driver-contract hygiene: every queries() entry ships an
    oracle_sql() entry (zero rows-only gates left), and no oracle names
    a query that doesn't exist."""
    import __spark_entry__ as em

    q, o = set(em.queries()), set(em.oracle_sql())
    assert q - o == set(), f"queries without oracle: {sorted(q - o)}"
    assert o - q == set(), f"oracles without query: {sorted(o - q)}"


def test_oracle_sql_parses_in_duckdb():
    """Every oracle must at least PREPARE against empty views of the
    driver's table set — catches SQL syntax drift without running the
    full gate."""
    import __spark_entry__ as em

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INT)")
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    for name, sql in em.oracle_sql().items():
        try:
            con.execute(sql)
        except duckdb.Error as e:  # noqa: PERF203
            pytest.fail(f"oracle {name} failed on empty tables: {e}")
