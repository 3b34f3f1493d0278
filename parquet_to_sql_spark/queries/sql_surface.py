"""The user-facing SQL surface (sql.Engine) exercised inside the gate.

Every other gate query drives the DataFrame API; these go through
`Engine.register_fixtures` + `Engine.sql(...)` — plain SQL text in,
DataFrame out — pinning the path a user of the reference would
actually adopt (register parquet once, query with SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from parquet_to_sql_spark.queries.registry import query


@query(
    "sql_engine_nation_revenue",
    tags=("sql-surface", "joins", "aggregation"),
    oracle="""
    SELECT n_name,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, order_year
    """,
)
def sql_engine_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders revenue per (nation, year), computed from SQL TEXT via
    the Engine surface — parsing/planning is all Catalyst; the engine
    contributes table registration (incl. the events ns-timestamp
    shim) and the sink hookup. Decimal-sum float discipline as
    everywhere."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT n_name,
               CAST(year(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name, order_year
        """
    )


@query(
    "sql_engine_window_qualify",
    tags=("sql-surface", "window"),
    oracle="""
    SELECT * FROM (
      SELECT o_custkey,
             o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 2
    """,
)
def sql_engine_window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer via SQL text on the Engine surface —
    the SQL twin of window_topn_per_customer, proving the registered
    views + spark.sql path plans windows identically to the DataFrame
    API."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT * FROM (
          SELECT o_custkey,
                 o_orderkey,
                 CAST(o_totalprice AS DOUBLE) AS totalprice,
                 ROW_NUMBER() OVER (
                   PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
                 ) AS rn
          FROM orders
        ) WHERE rn <= 2
        """
    )


def _recursive_reach_oracle() -> str:
    from parquet_to_sql_spark.queries.dedup import duck_hashed_pair_ctes

    return f"""
    WITH RECURSIVE
    {duck_hashed_pair_ctes("documents").lstrip()},
    reach(src, dst) AS (
      SELECT doc1, doc2 FROM pairs
      UNION ALL
      SELECT r.src, p.doc2 FROM reach r JOIN pairs p ON p.doc1 = r.dst
    )
    SELECT src AS doc_id, COUNT(DISTINCT dst) AS n_reachable
    FROM reach GROUP BY src
    """


@query(
    "sql_engine_recursive_reach",
    tags=("sql-surface", "recursive-cte", "dedup", "spark4"),
    oracle=_recursive_reach_oracle(),
)
def sql_engine_recursive_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE surface (WITH RECURSIVE, new in Spark 4): walk the
    near-dup pair DAG (doc1 < doc2 edges from the hashed-ngram
    relation) and count reachable descendants per source doc.  The
    pair relation is built with the DataFrame operator and registered
    as a temp view — the documented mixed-API pattern — and the
    recursion itself is plain SQL text executed by Catalyst.

    Spark's recursive CTEs support UNION ALL only, so this walks an
    ACYCLIC (ordered-pair) graph; the cyclic closure lives in
    dedup_connected_components as an iterative DataFrame loop —
    between them both engine surfaces for transitive queries are
    pinned."""
    from parquet_to_sql_spark.catalog import load_table
    from parquet_to_sql_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, hashed=True
    ).select("doc1", "doc2")
    pairs.createOrReplaceTempView("nd_pairs_v")
    return spark.sql(
        """
        WITH RECURSIVE reach(src, dst) AS (
          SELECT doc1, doc2 FROM nd_pairs_v
          UNION ALL
          SELECT r.src, p.doc2 FROM reach r JOIN nd_pairs_v p ON p.doc1 = r.dst
        )
        SELECT src AS doc_id, COUNT(DISTINCT dst) AS n_reachable
        FROM reach GROUP BY src
        """
    )


@query(
    "sql_engine_group_by_all",
    tags=("sql-surface", "aggregation", "spark4"),
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    """,
)
def sql_engine_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL (modern SQL ergonomics, supported by both engines):
    every non-aggregate select item becomes a grouping key."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ALL
        """
    )


@query(
    "sql_engine_pivot_syntax",
    tags=("sql-surface", "pivot"),
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS o_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FILTER (o_orderstatus = 'O'), 0) AS DOUBLE)     AS o_total,
           CAST(COUNT(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS f_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FILTER (o_orderstatus = 'F'), 0) AS DOUBLE)     AS f_total,
           CAST(COUNT(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS p_n,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FILTER (o_orderstatus = 'P'), 0) AS DOUBLE)     AS p_total,
           CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P')) AS BIGINT)
                                                                 AS other_n
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_engine_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (Spark SQL syntax, distinct from the
    DataFrame .pivot() path pinned by agg_pivot_status): rotate order
    status into columns with two aggregates per status.  Plans as the
    same single-pass conditional aggregation the oracle spells out
    with FILTER clauses — one shuffle on the GROUP BY key, pivoted
    columns are map-side CASE aggregates, no join and no second pass.
    Status values are enumerated IN (...) as PIVOT requires: at scale
    that list is the (small, known) domain, never data-derived on the
    driver."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT o_orderpriority,
               COALESCE(o_n, 0)                        AS o_n,
               CAST(COALESCE(o_total, 0) AS DOUBLE)    AS o_total,
               COALESCE(f_n, 0)                        AS f_n,
               CAST(COALESCE(f_total, 0) AS DOUBLE)    AS f_total,
               COALESCE(p_n, 0)                        AS p_n,
               CAST(COALESCE(p_total, 0) AS DOUBLE)    AS p_total,
               n_all - COALESCE(o_n,0) - COALESCE(f_n,0) - COALESCE(p_n,0)
                                                       AS other_n
        FROM (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS price,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_all
          FROM orders
        )
        PIVOT (
          COUNT(*) AS n, SUM(price) AS total
          FOR o_orderstatus IN ('O' AS o, 'F' AS f, 'P' AS p)
        )
        """
    )


@query(
    "sql_engine_distribute_by",
    tags=("sql-surface", "partitioning", "scale-path"),
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 300000
    """,
)
def sql_engine_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-control SQL surface: DISTRIBUTE BY hash-partitions
    the output on the named key and SORT BY orders rows within each
    partition — the layout knob for writing co-located, sorted output
    a downstream co-partitioned join can consume shuffle-free (CLUSTER
    BY = both at once).  Row CONTENT is unchanged — the oracle is the
    bare SELECT, and the plan-shape test
    (tests/test_scale_features.py::test_distribute_by_controls_partitioning)
    asserts the hashpartitioning exchange + partition-local sort
    actually appear."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 300000
        DISTRIBUTE BY o_custkey SORT BY o_custkey, o_orderkey
        """
    )


@query(
    "sql_engine_pipe_syntax",
    tags=("sql-surface", "spark4", "aggregation"),
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
    FROM orders
    WHERE o_orderstatus <> 'P'
    GROUP BY o_orderpriority
    """,
)
def sql_engine_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`, Spark 4 / GoogleSQL 'Pipe Syntax in SQL'
    VLDB 2024, public): the same filtered aggregate written as a
    linear operator chain — the surface a user migrating from
    dataframe-style tools expects.  Catalyst lowers pipes to the
    identical logical plan as the nested form (the oracle is standard
    SQL), so parsing is the ONLY new code path being pinned."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        FROM orders
        |> WHERE o_orderstatus <> 'P'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue,
                     CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
           GROUP BY o_orderpriority
        |> SELECT o_orderpriority, n_orders, revenue, n_customers
        """
    )


@query(
    "sql_engine_parameterized",
    tags=("sql-surface", "parameterized"),
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_engine_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (named ``:param`` markers bound server-side,
    Spark 3.4+): the injection-safe templating surface an application
    uses instead of string interpolation.  Binding happens in the
    parser, so the plan is identical to the literal form — the oracle
    is the same query with the parameters inlined."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        FROM orders
        WHERE o_orderdate >= :since AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"since": "1997-01-01 00:00:00", "status": "O"},
    )


@query(
    "sql_engine_star_except",
    tags=("sql-surface", "spark4"),
    oracle="""
    SELECT * EXCLUDE (c_name, c_mktsegment)
    FROM customer
    WHERE c_acctbal < 0
    """,
)
def sql_engine_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT(...) + ORDER BY ALL — the wide-table ergonomics
    surface (DuckDB spells it EXCLUDE).  EXCEPT resolves during
    analysis to an explicit projection, so column pruning still
    reaches the scan: the reader materializes only the kept columns.
    ORDER BY ALL is a total order over every projected column —
    deterministic output without naming the columns twice."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return eng.sql(
        """
        SELECT * EXCEPT (c_name, c_mktsegment)
        FROM customer
        WHERE c_acctbal < 0
        ORDER BY ALL
        """
    )


@query(
    "sql_engine_sql_udf",
    tags=("sql-surface", "spark4", "udf"),
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(round(l_discount*100) AS BIGINT)) AS prod
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
    )
    SELECT l_returnflag,
           CAST(SUM(CAST((prod - prod % 10000) / 10000 AS BIGINT)) AS BIGINT)
             AS net_whole_units
    FROM c GROUP BY l_returnflag
    """,
)
def sql_engine_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI SQL scalar UDF (Spark 4 `CREATE TEMPORARY FUNCTION ...
    RETURNS ... RETURN expr`) — the declarative UDF path that stays
    entirely JVM-side: the function body is INLINED by the analyzer
    into the calling plan, so it codegens like any expression (no
    Python worker, no serialization; verify with .explain — no
    BatchEvalPython node exists).  The function computes whole net
    units per row in EXACT integer arithmetic (the exact-multiple
    floor-division trick, so each row contributes a BIGINT and the
    sum is order-independent — the house float discipline); the
    oracle inlines the same body, proving the analyzer's inlining is
    semantics-preserving."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION prod_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN "
        "CAST(round(p*100) AS BIGINT) * (100 - CAST(round(d*100) AS BIGINT))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_whole_units(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN "
        "CAST((prod_cents(p, d) - prod_cents(p, d) % 10000) / 10000 AS BIGINT)"
    )
    return eng.sql(
        """
        SELECT l_returnflag,
               CAST(SUM(net_whole_units(l_extendedprice, l_discount)) AS BIGINT)
                 AS net_whole_units
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        GROUP BY l_returnflag
        """
    )


@query(
    "sql_engine_sql_table_udf",
    tags=("sql-surface", "spark4", "udf", "tvf"),
    oracle="""
    SELECT l_returnflag AS flag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
             AS qty_cents
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag IN ('A', 'R')
    GROUP BY l_returnflag
    """,
)
def sql_engine_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI SQL TABLE function (Spark 4 `CREATE TEMPORARY FUNCTION ...
    RETURNS TABLE(...) RETURN SELECT ...`): a parameterized relation
    invoked in FROM position, inlined by the analyzer like a
    parameterized view — zero Python, full pushdown through the
    function body (the WHERE parameters reach the scan).  The query
    UNIONs two invocations with different arguments; the oracle is
    the equivalent direct SQL, proving the inlining.  (A parameterized
    LIMIT inside a SQL table function is rejected by the analyzer —
    INVALID_LIMIT_LIKE_EXPRESSION — so parameterization stays in
    WHERE, the pushdown-friendly place for it anyway.)"""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION flag_slice(flag STRING, min_qty INT)
        RETURNS TABLE(l_orderkey BIGINT, qty_cents BIGINT)
        RETURN SELECT l_orderkey, CAST(round(l_quantity*100) AS BIGINT)
               FROM lineitem
               WHERE l_returnflag = flag AND l_quantity >= min_qty
        """
    )
    return eng.sql(
        """
        SELECT 'A' AS flag, COUNT(*) AS n_lines,
               CAST(SUM(qty_cents) AS BIGINT) AS qty_cents
        FROM flag_slice('A', 45)
        UNION ALL
        SELECT 'R', COUNT(*), CAST(SUM(qty_cents) AS BIGINT)
        FROM flag_slice('R', 45)
        """
    )


@query(
    "sql_engine_identifier_clause",
    tags=("sql-surface", "spark4", "security"),
    oracle="""
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
             AS acctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def sql_engine_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``IDENTIFIER(:param)`` clause: table and column names
    supplied as PARAMETERS instead of string-concatenated SQL — the
    injection-safe dynamic-identifier surface (the reference's whole
    identifier-safety module exists because its PHP side concatenates
    names; here the engine validates them as identifiers by
    construction).  Table, join table, group column, and measure
    column all arrive via IDENTIFIER parameters; the oracle is the
    equivalent static SQL."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(CAST(round(IDENTIFIER(:measure)*100) AS BIGINT)) AS BIGINT)
                 AS acctbal_cents
        FROM IDENTIFIER(:fact) c
        JOIN IDENTIFIER(:dim) n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """,
        args={"fact": "customer", "dim": "nation", "measure": "c_acctbal"},
    )


@query(
    "sql_engine_execute_immediate",
    tags=("sql-surface", "spark4", "dynamic-sql"),
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
             AS retail_cents
    FROM part
    WHERE p_size >= 40
    GROUP BY p_brand
    """,
)
def sql_engine_execute_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``EXECUTE IMMEDIATE``: a SQL string executed with
    positional USING parameters — the stored-procedure-style dynamic
    SQL surface (parameters bind as literals, never concatenated, so
    it composes with IDENTIFIER() for fully injection-safe dynamic
    queries).  The oracle is the equivalent static SQL."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    return spark.sql(
        "EXECUTE IMMEDIATE "
        "'SELECT p_brand, COUNT(*) AS n_parts, "
        "CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) "
        "AS retail_cents FROM part WHERE p_size >= ? GROUP BY p_brand' "
        "USING 40"
    )


@query(
    "sql_engine_session_variables",
    tags=("sql-surface", "spark4", "dynamic-sql"),
    oracle="""
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_above,
           CAST(MIN(p_size) AS BIGINT) AS min_size
    FROM part
    WHERE p_retailprice >= (
      SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*)
      FROM part
    )
    GROUP BY p_brand
    """,
)
def sql_engine_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL session variables: DECLARE VARIABLE, assign it FROM
    A QUERY with SET VAR (the scalar handoff between statements that
    scripts otherwise smuggle through driver-side string formatting),
    then reference it by name in a later statement — the
    multi-statement workflow surface completing the dynamic-SQL family
    (EXECUTE IMMEDIATE, IDENTIFIER()).  The variable carries the
    corpus mean retail price computed with the engine's exact-decimal
    average recipe; the oracle inlines the same arithmetic as a scalar
    subquery, so the handoff is value-exact.  The assignment's scalar
    subquery is a 1-row aggregate — variables hold scalars, never
    relations, so nothing corpus-sized ever lands on the driver."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    spark.sql(
        "DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0"
    )
    spark.sql(
        "SET VAR price_floor = ("
        "SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)"
        " / COUNT(*) FROM part)"
    )
    return spark.sql(
        "SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_above, "
        "CAST(MIN(p_size) AS BIGINT) AS min_size "
        "FROM part WHERE p_retailprice >= price_floor GROUP BY p_brand"
    )


@query(
    "sql_engine_sql_scripting",
    tags=("sql-surface", "spark4", "dynamic-sql"),
    oracle="""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders)
    SELECT n_orders,
           CAST(CASE WHEN n_orders <= 1 THEN 1
                     ELSE 1 << length(bin(n_orders - 1)) END
                AS BIGINT) AS pow2_capacity,
           CAST(CASE WHEN n_orders <= 1 THEN 0
                     ELSE length(bin(n_orders - 1)) END
                AS BIGINT) AS n_doublings
    FROM n
    """,
)
def sql_engine_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL SCRIPTING (BEGIN ... END with DECLARE / SET /
    WHILE): procedural control flow INSIDE one spark.sql() call — the
    last piece of the dynamic-SQL family (EXECUTE IMMEDIATE,
    IDENTIFIER(), session variables).  The script seeds a scalar from
    a table aggregate, then a WHILE loop doubles a capacity until it
    covers the row count, counting iterations — the classic
    hash-table-sizing computation, here expressed entirely in SQL.
    Control flow runs on the driver over 1-row scalars (each SET's
    subquery is a bounded aggregate job); nothing corpus-sized ever
    leaves the executors.  The oracle computes the same power-of-two
    with the engine-neutral msb recipe (1 << length(bin(n-1)), the
    floor-log2 identity both engines share), CASE-guarded for n <= 1
    where the WHILE loop never runs (cap=1, iters=0) but the msb
    formula would say 2/1 — ADVICE r08: a degenerate fixture must not
    go hash-red.  The scripting conf is a RUNTIME conf set inside the
    build and RESTORED after (the script executes inside spark.sql),
    so the driver's plain shared session is left exactly as found."""
    from parquet_to_sql_spark.sql import Engine

    eng = Engine(spark)
    eng.register_fixtures(sf_dir)
    conf_key = "spark.sql.scripting.enabled"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "true")
    try:
        return spark.sql(
            """
            BEGIN
              DECLARE n BIGINT DEFAULT 0;
              DECLARE cap BIGINT DEFAULT 1;
              DECLARE iters BIGINT DEFAULT 0;
              SET n = (SELECT COUNT(*) FROM orders);
              WHILE cap < n DO
                SET cap = cap * 2;
                SET iters = iters + 1;
              END WHILE;
              SELECT n AS n_orders, cap AS pow2_capacity,
                     iters AS n_doublings;
            END
            """
        )
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
