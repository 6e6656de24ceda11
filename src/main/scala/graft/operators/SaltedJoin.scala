package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling equi-join via key salting — the manual fallback for
  * when AQE's skew-join splitting can't help (e.g. a single hot key
  * whose build side must replicate, or a non-shuffle join AQE won't
  * touch).
  *
  * Pattern: the large (skewed) side gets a deterministic salt in
  * [0, salts); the small side is replicated `salts` times with every
  * salt value; the join key becomes (key, salt), spreading each hot
  * key over `salts` reducers. Salt derivation hashes the caller-named
  * `saltCols` (default: every column), so it needs no random state and
  * replays identically — rows with identical salt-source values land
  * on the same reducer, which is acceptable: real skew comes from many
  * distinct rows sharing a key. Name a cheap unique-ish subset (an id
  * column) rather than the default when the fact side carries wide
  * text/array columns (per-row hashing of whole documents buys no
  * extra spread) or ANY map column (Spark rejects hash() on MapType
  * outright, so the all-columns default would fail analysis).
  *
  * Cost: the small side shuffles `salts`× its size — choose salts ≈
  * the factor by which the hottest key exceeds a healthy partition.
  */
object SaltedJoin {

  def inner(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs may not already have a _salt column")
    val srcCols = if (saltCols.nonEmpty) saltCols else skewed.columns.toSeq
    val missing = srcCols.filterNot(skewed.columns.contains)
    require(missing.isEmpty, s"salt columns not in the fact side: $missing")
    val saltedFact = skewed.withColumn("_salt",
      pmod(hash(srcCols.map(col): _*), lit(salts)))
    val replicatedDim = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
