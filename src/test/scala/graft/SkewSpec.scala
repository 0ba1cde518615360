package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Spec for Skew.saltedJoin: result equality with the plain join on a
  * pathologically hot key, all supported join types, and the typed
  * rejection of replication-unsafe types.
  */
class SkewSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 10k rows, 90% on one hot key, plus keys with no match on either side
  private lazy val big = (1 to 10000)
    .map(i => (if (i % 10 == 0) i % 7L else 999L, i.toLong, i * 1.5))
    .toDF("k", "row_id", "v")
  private lazy val small = (0L to 6L).map(k => (k, s"dim_$k"))
    .toDF("k", "name").union(Seq((999L, "hot")).toDF("k", "name"))
    .union(Seq((1234L, "unmatched")).toDF("k", "name"))

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner/left/semi/anti joins equal their plain forms on a hot key") {
    for (jt <- Seq("inner", "left_outer", "left_semi", "left_anti")) {
      val plain = big.join(small, Seq("k"), jt)
      val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8, joinType = jt)
      assert(canon(salted) == canon(plain), s"join type $jt diverged")
      assert(!salted.columns.contains("__salt"))
    }
  }

  test("salt actually spreads the hot key across partitions") {
    val salts = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8L)))
      .filter(col("k") === 999L)
      .select(countDistinct(col("__salt"))).first().getLong(0)
    assert(salts == 8L, s"hot key only reached $salts of 8 salts")
  }

  test("replication-unsafe join types are rejected with a typed error") {
    for (jt <- Seq("right_outer", "full_outer", "cross"))
      intercept[IllegalArgumentException](
        Skew.saltedJoin(big, small, Seq("k"), salts = 4, joinType = jt))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, Seq("k"), salts = 0))
    intercept[IllegalArgumentException](
      Skew.saltedJoin(big, small, Seq.empty, salts = 4))
  }
}
