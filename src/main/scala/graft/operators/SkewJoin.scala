package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 AQE/skew row; the
  * manual version of what AQE's skew-join does, for engines/pipelines
  * that need a deterministic plan — e.g. a hot `null`-like key holding
  * 1% of a 100 TB fact table would otherwise pin one reducer).
  *
  * Fact rows get a deterministic salt = xxhash64(whole row) mod
  * `salts`; every dim row is replicated `salts` times; the join key
  * becomes (key, salt), spreading each hot key over `salts` reducers.
  * Result is row-identical to the plain inner equi-join for any key
  * multiplicity on either side — each fact row meets exactly the dim
  * copies carrying its own salt.
  */
object SkewJoin {

  def salted(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 8): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts.toLong)))
    val repl = dim.withColumn("_salt", explode(
      sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(repl, Seq(key, "_salt")).drop("_salt")
  }
}
