package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit key-salting for skewed equi-joins — the manual mitigation for
 * the case AQE's skew-join split cannot handle: a single join key hot
 * enough that every row of it must land on one reducer (AQE splits
 * oversized PARTITIONS, but a one-key partition of a sort-merge join can
 * only split if the other side's matching rows are replicated — which is
 * exactly what salting arranges).
 *
 * The large side gets a deterministic per-row salt in [0, salts); the
 * small side is replicated once per salt value; the join runs on
 * (key, salt), spreading each hot key over `salts` reducers. The result
 * multiset is IDENTICAL to the plain equi-join (every large row meets
 * exactly one replica of each matching small row) — pinned by the q43
 * oracle, which is the plain join. Cost: |small| x salts replication —
 * keep `salts` modest (8-32) and the small side genuinely small.
 */
object SkewJoin {

  /**
   * Inner equi-join of `large` and `small` on `keyCols` (same names both
   * sides), salted with `salts` buckets. The salt derives from a hash of
   * the large row's full column tuple, so the operator stays
   * deterministic across retries and partitionings (no rand()).
   */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = large.withColumn("__graft_salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts.toLong)).cast("int"))
    val s = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, keyCols :+ "__graft_salt").drop("__graft_salt")
  }
}
