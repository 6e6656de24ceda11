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
  * key over `salts` reducers. Salt derivation hashes the whole fact
  * row, so it needs no random state and replays identically — rows
  * with identical content land on the same reducer, which is
  * acceptable: real skew comes from many distinct rows sharing a key.
  *
  * Cost: the small side shuffles `salts`× its size — choose salts ≈
  * the factor by which the hottest key exceeds a healthy partition.
  */
object SaltedJoin {

  def inner(skewed: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!skewed.columns.contains("_salt") && !small.columns.contains("_salt"),
      "inputs may not already have a _salt column")
    val saltedFact = skewed.withColumn("_salt",
      pmod(hash(skewed.columns.map(col): _*), lit(salts)))
    val replicatedDim = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
