package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Bloom, Graph}

/** Link-graph analytics + bloom-pruned membership joins (beyond the
  * reference — web-curation quality priors and the 100 TB blocklist gate).
  *
  * The graph under test is real relational structure: the customer ↔
  * supplier trading graph induced by orders ⋈ lineitem (suppkeys offset by
  * 1,000,000 into their own node-id space — custkey and suppkey ranges
  * overlap). PageRank runs in exact fixed-point integers, so the DuckDB
  * oracle replays the iterations bit-identically as unrolled CTEs.
  */
object GraphQueries extends QueryFamily {

  /** Offset keeping supplier node ids disjoint from customer node ids. */
  private val SuppOffset = 1000000L

  private def pageRankSql(iters: Int, dampingPct: Int, scale: Long): String = {
    val base = scale * (100 - dampingPct) / 100
    val head =
      s"""WITH raw AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + $SuppOffset AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM raw
         |      UNION ALL SELECT dst AS src, src AS dst FROM raw),
         |nodes AS (SELECT DISTINCT src AS node FROM e),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, $scale AS pr FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT n.node, $base + ($dampingPct * coalesce(s.s, 0)) // 100 AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr // d.deg)::BIGINT AS s
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }.mkString
    head + iterCtes + s"\nSELECT node, pr FROM r$iters ORDER BY node"
  }

  /** Unrolled-CTE oracle for trustRank: same skeleton as [[pageRankSql]]
    * with a seed-conditional base term and a seed-biased start vector. */
  private def trustRankSql(iters: Int, dampingPct: Int, scale: Long): String = {
    val base = scale * (100 - dampingPct) / 100
    val head =
      s"""WITH raw AS (
         |  SELECT DISTINCT o_custkey AS src, l_suppkey + $SuppOffset AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e AS (SELECT src, dst FROM raw
         |      UNION ALL SELECT dst AS src, src AS dst FROM raw),
         |nodes0 AS (SELECT DISTINCT src AS node FROM e),
         |seeds AS (SELECT DISTINCT c_custkey AS node FROM customer
         |          WHERE c_custkey % 50 = 0),
         |nodes AS (SELECT n.node,
         |    CASE WHEN s.node IS NOT NULL THEN $base ELSE 0 END AS node_base
         |  FROM nodes0 n LEFT JOIN seeds s ON n.node = s.node),
         |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node,
         |    CASE WHEN node_base > 0 THEN $scale ELSE 0 END AS pr FROM nodes)""".stripMargin
    val iterCtes = (1 to iters).map { i =>
      s""",
         |r$i AS (
         |  SELECT n.node, n.node_base + ($dampingPct * coalesce(s.s, 0)) // 100 AS pr
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.pr // d.deg)::BIGINT AS s
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |           JOIN deg d ON e.src = d.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    }.mkString
    head + iterCtes + s"\nSELECT node, pr FROM r$iters ORDER BY node"
  }

  def defs: Seq[QueryDef] = Seq(

    // Fixed-point PageRank, 3 iterations, over the symmetric trading
    // graph. Per iteration the corpus-sized edge relation stays put
    // (persisted partitioned on src); only (node, rank) pairs shuffle.
    QueryDef(
      "q_graph_pagerank",
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + SuppOffset).as("dst"))
          .distinct()
        // explode both directions from ONE scan: union(raw, raw-flipped)
        // re-executed the join+distinct once per branch (profiled: two
        // identical 5 MB edge-build stages; guide §2.4). Same edge multiset.
        val sym = raw.select(explode(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        Graph.pageRank(sym, "src", "dst", iters = 3)
          .select(col("node"), col("rank").as("pr"))
          .orderBy(col("node"))
      },
      Some(pageRankSql(iters = 3, dampingPct = 85, scale = 1000000000L))),

    // WEIGHTED PageRank on the custkey<=2000 subgraph: edge weight =
    // (customer, supplier) pair multiplicity, so heavy trading relations
    // carry proportionally more rank. 2 iterations, exact integer replay.
    QueryDef(
      "q_graph_pagerank_w",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
          .filter(col("o_custkey") <= 2000)
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_custkey").as("src"),
            (col("l_suppkey") + SuppOffset).as("dst"))
          .agg(count(lit(1)).as("w"))
        // one-scan symmetrization (see q_graph_pagerank)
        val sym = raw.select(explode(array(
            struct(col("src"), col("dst"), col("w")),
            struct(col("dst").as("src"), col("src").as("dst"), col("w")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"), col("e.w").as("w"))
        Graph.pageRank(sym, "src", "dst", iters = 2, weightCol = Some("w"))
          .select(col("node"), col("rank").as("pr"))
          .orderBy(col("node"))
      },
      Some {
        val base = 150000000L
        val head =
          s"""WITH raw AS (
             |  SELECT o_custkey AS src, l_suppkey + $SuppOffset AS dst,
             |    count(*)::BIGINT AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  WHERE o_custkey <= 2000 GROUP BY 1, 2),
             |e AS (SELECT src, dst, w FROM raw
             |      UNION ALL SELECT dst AS src, src AS dst, w FROM raw),
             |nodes AS (SELECT DISTINCT src AS node FROM e),
             |deg AS (SELECT src, sum(w)::BIGINT AS deg FROM e GROUP BY src),
             |r0 AS (SELECT node, 1000000000 AS pr FROM nodes)""".stripMargin
        val iterCtes = (1 to 2).map { i =>
          s""",
             |r$i AS (
             |  SELECT n.node, $base + (85 * coalesce(s.s, 0)) // 100 AS pr
             |  FROM nodes n LEFT JOIN (
             |    SELECT e.dst AS node, sum((r.pr // d.deg) * e.w)::BIGINT AS s
             |    FROM e JOIN r${i - 1} r ON e.src = r.node
             |           JOIN deg d ON e.src = d.src
             |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
        }.mkString
        head + iterCtes + "\nSELECT node, pr FROM r2 ORDER BY node"
      }),

    // TrustRank: teleport mass restricted to a vetted seed set (every
    // 50th customer stands in for the hand-curated trust list) — link
    // farms far from any seed converge to ~0 instead of the uniform base.
    QueryDef(
      "q_graph_trustrank",
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + SuppOffset).as("dst"))
          .distinct()
        // one-scan symmetrization (see q_graph_pagerank)
        val sym = raw.select(explode(array(
            struct(col("src"), col("dst")),
            struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
          .select(col("e.src").as("src"), col("e.dst").as("dst"))
        val seeds = Tables(s, dir, "customer")
          .filter(col("c_custkey") % 50 === 0)
          .select(col("c_custkey"))
        Graph.trustRank(sym, "src", "dst", seeds, "c_custkey", iters = 3)
          .select(col("node"), col("rank").as("pr"))
          .orderBy(col("node"))
      },
      Some(trustRankSql(iters = 3, dampingPct = 85, scale = 1000000000L))),

    // Degree table over the DIRECTED trading graph (customers point at
    // the suppliers they buy from): out-degree = distinct suppliers per
    // customer, in-degree = distinct customers per supplier.
    QueryDef(
      "q_graph_degrees",
      (s, dir) => {
        val o = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
        val li = Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        val raw = o.join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("src"),
            (col("l_suppkey") + SuppOffset).as("dst"))
          .distinct()
        Graph.degrees(raw, "src", "dst").orderBy(col("node"))
      },
      Some(
        s"""WITH raw AS (
           |  SELECT DISTINCT o_custkey AS src, l_suppkey + $SuppOffset AS dst
           |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
           |o AS (SELECT src AS node, count(*) AS out_deg FROM raw GROUP BY src),
           |i AS (SELECT dst AS node, count(*) AS in_deg FROM raw GROUP BY dst)
           |SELECT coalesce(o.node, i.node) AS node,
           |  coalesce(out_deg, 0) AS out_deg,
           |  coalesce(in_deg, 0) AS in_deg,
           |  coalesce(out_deg, 0) + coalesce(in_deg, 0) AS total_deg
           |FROM o FULL JOIN i ON o.node = i.node
           |ORDER BY node""".stripMargin)),

    // Bloom-pruned SEMI join: lineitems of high-value orders. The order-key
    // membership set aggregates into a distributed bloom filter; lineitem
    // probes it map-side and only bloom hits reach the exact confirm join.
    // Results are exact, so the oracle is the plain semi join.
    QueryDef(
      "q_join_bloom",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
        val hiOrders = Tables(s, dir, "orders")
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"))
        Bloom.semiJoin(li, "l_orderkey", hiOrders, "o_orderkey",
            expectedItems = 1000000L)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(
        """SELECT l_returnflag, count(*) AS n_items,
          |  round(sum(l_quantity), 2) AS sum_qty
          |FROM lineitem
          |WHERE l_orderkey IN (
          |  SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0)
          |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Bloom-pruned ANTI join — the blocklist REMOVE direction: documents
    // whose id is NOT in the blocklist pass through exchange-free (a bloom
    // miss is a definite non-member); only the hit sliver runs the exact
    // anti join. Blocklist = doc ids ending in 0 or 7.
    QueryDef(
      "q_text_blocklist",
      (s, dir) => {
        val d = Tables(s, dir, "documents").select(col("doc_id"), col("n_chars"))
        val block = Tables(s, dir, "documents")
          .filter(col("doc_id") % 10 === 0 || col("doc_id") % 10 === 7)
          .select(col("doc_id").as("blocked_id"))
        Bloom.antiJoin(d, "doc_id", block, "blocked_id", expectedItems = 100000L)
          .orderBy(col("doc_id"))
      },
      Some(
        """SELECT doc_id, n_chars FROM documents
          |WHERE doc_id NOT IN (
          |  SELECT doc_id FROM documents
          |  WHERE doc_id % 10 = 0 OR doc_id % 10 = 7)
          |ORDER BY doc_id""".stripMargin))
  )
}
