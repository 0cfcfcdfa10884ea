package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side's key into
  * `salts` subkeys and replicate the small side once per salt, so a hot
  * key's rows spread over `salts` reducers instead of one straggler task
  * (the classic hot-key fix; AQE's skew-join split handles moderate skew
  * automatically, salting is the explicit control for pathological keys —
  * e.g. one symbol carrying half the candle volume).
  *
  * Trade-off: the replicated side's shuffle volume grows ×`salts`; use
  * for joins where the replicated side is small but above the broadcast
  * threshold.
  */
object SaltedJoin {

  /** Inner equi-join `large ⋈ small` on `largeKey == smallKey`. */
  def join(large: DataFrame, small: DataFrame,
           largeKey: String, smallKey: String, salts: Int = 16): DataFrame = {
    // deterministic pseudo-random salt per large-side ROW (spreads each
    // hot key uniformly without an RNG: hash the full row id-ish cols)
    val saltedLarge = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.map(col): _*)), lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall,
        saltedLarge("__salt") === saltedSmall("__salt") &&
          col(largeKey) === col(smallKey))
      .drop("__salt")
  }
}
