package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (the 100 TB posture, SURVEY.md §2).
  *
  * AQE's runtime skew-join splitting is the first line of defense (on by
  * default in graft.engine); salting is the explicit, planner-independent
  * fallback for joins whose skew is KNOWN up front (a handful of hot keys
  * owning a large fraction of the fact side):
  *
  *  - the fact side gets a deterministic salt in [0, n) derived from the
  *    whole row, spreading a hot key's rows across n reduce partitions;
  *  - the (small-ish) dim side is exploded n ways so every (key, salt)
  *    bucket still finds its match;
  *  - the join key becomes (key, salt) — same results, n-way finer shuffle
  *    granularity for every key.
  *
  * Cost model: dim side is replicated n× — use for dim tables far below
  * fact scale (the usual skew shape) and keep n small (8–32).
  */
object SkewOps {

  private val saltCol = "__graft_salt"

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways. Result is
    * row-identical to the plain inner join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Salt from seeded rand, NOT from hashing the row: hash() throws on
    // MapType columns, and byte-identical duplicate rows (common in raw
    // logs) would all land in ONE salt bucket — leaving the hot partition
    // hot. Any salt value joins correctly (the dim side is replicated to
    // every salt), so per-row uniformity is all that matters.
    val salted = fact.withColumn(saltCol, floor(rand(42) * salts).cast("int"))
    val exploded = dim
      .withColumn(saltCol, explode(sequence(lit(0), lit(salts - 1))))
      .withColumnRenamed(key, s"${key}__dim")
    salted
      .join(exploded,
        salted(key) === exploded(s"${key}__dim") &&
          salted(saltCol) === exploded(saltCol))
      .drop(saltCol).drop(s"${key}__dim")
  }
}
