"""Probe function-semantics parity between Spark SQL and DuckDB.

Determines which scalar functions produce bit-identical results in both
engines, so oracle_sql() entries can be trusted. Run once; results inform
which operators get a full DuckDB oracle vs a rows-only check.
"""
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("parity_probe")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()

CASES = [
    # name, spark_sql, duck_sql (None = same text)
    ("md5", "SELECT md5('hello world') AS v", None),
    ("concat_pipe", "SELECT 'a' || CAST(42 AS STRING) AS v", None),
    ("mod_bigint", "SELECT (1000003 * 999983 + 7 * 10007) % 1000000007 AS v", None),
    ("rint_tie", "SELECT rint(1843.5) AS v, rint(1842.5) AS v2, rint(1843.2) AS v3",
     "SELECT round_even(1843.5) AS v, round_even(1842.5) AS v2, round_even(1843.2) AS v3"),
    ("epoch", "SELECT unix_timestamp(TIMESTAMP '1995-03-15 12:30:00') AS v",
     "SELECT CAST(epoch(TIMESTAMP '1995-03-15 12:30:00') AS BIGINT) AS v"),
    ("decimal_sum", "SELECT CAST(123.456 AS DECIMAL(18,2)) + CAST(0.004 AS DECIMAL(18,2)) AS v", None),
    ("hex_to_int",
     "SELECT CAST(conv(substr(md5('abc'), 1, 15), 16, 10) AS BIGINT) AS v",
     "SELECT CAST(('0x' || substr(md5('abc'), 1, 15)) AS BIGINT) AS v"),
    ("regexp_count", "SELECT regexp_count('a,b,,c', '[a-z]') AS v", None),
    ("split_size",
     "SELECT size(split('a b  c', ' +')) AS v",
     "SELECT len(string_split_regex('a b  c', ' +')) AS v"),
    ("div10", "SELECT CAST(48271 % 100000 AS DOUBLE) / 10.0 + 1843000.0 AS v", None),
    ("lower_trim", "SELECT lower(trim('  AbC  ')) AS v", None),
    ("regexp_replace", "SELECT regexp_replace('a1b22c', '[0-9]+', '#') AS v", None),
    ("cos_sim_double",
     "SELECT aggregate(zip_with(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D), (a,b) -> a*b), 0.0D, (acc,x) -> acc+x) AS v",
     "SELECT list_dot_product([1.0,2.0,3.0]::DOUBLE[], [4.0,5.0,6.0]::DOUBLE[]) AS v"),
    ("sqrt_pow", "SELECT sqrt(2.0) + power(1.5, 3.0) AS v", None),
    ("substr_1idx", "SELECT substr('abcdef', 2, 3) AS v", None),
    ("like_count", "SELECT CAST((length(' the cat the ') - length(replace(' the cat the ', ' the ', ''))) / 5 AS BIGINT) AS v", None),
]

for name, s_sql, d_sql in CASES:
    d_sql = d_sql or s_sql
    try:
        sv = spark.sql(s_sql).collect()[0].asDict()
    except Exception as e:
        sv = f"SPARK_ERR: {str(e)[:120]}"
    try:
        dv = con.sql(d_sql).fetchall()[0]
        dcols = [c[0] for c in con.sql(f"DESCRIBE {d_sql}").fetchall()]
        dv = dict(zip(dcols, dv))
    except Exception as e:
        dv = f"DUCK_ERR: {str(e)[:120]}"
    match = "?"
    if isinstance(sv, dict) and isinstance(dv, dict):
        match = "MATCH" if list(sv.values()) == list(dv.values()) else "DIFF"
    print(f"{name:16s} {match:6s} spark={sv} duck={dv}")

spark.stop()
