package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching: edit-distance pair generation with COMPLETE
  * blocking — the record-linkage primitive (dedup of customer/supplier
  * name registries, catalog reconciliation).
  *
  * Completeness argument: levenshtein(a, b) ≤ d implies
  * |len(a) − len(b)| ≤ d (each edit changes length by at most 1), so
  * joining on a length band loses NO true pair — unlike the common
  * first-letter/phonetic blocks, which are recall heuristics. One side
  * explodes to its 2d+1 admissible lengths, the other keys by its own
  * length, so the candidate join is a plain equi-join (never a cartesian)
  * and each pair arises exactly once (b's single length falls in a's band
  * once). Real deployments COMPOSE further blocking keys (first token,
  * q-grams) on top to cut within-band candidates — composition tightens
  * recall-preserving blocking only when the extra key is also implied by
  * the distance bound, so it is left to the caller.
  *
  * Skew note: natural-language name lengths concentrate, so a handful of
  * len_key values carry most rows — AQE skew-join splits those partitions;
  * the verify (levenshtein, codegen'd) runs only within bands.
  */
object EntityResolution {

  /** All unordered pairs with levenshtein(name_a, name_b) ≤ maxDist.
    * Output: (id_a, id_b, dist), id_a < id_b. */
  def fuzzyPairs(df: DataFrame, nameCol: String, idCol: String,
                 maxDist: Int): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      length(col(nameCol)).as("len"))
    val a = base
      .withColumn("len_key",
        explode(sequence(col("len") - maxDist, col("len") + maxDist)))
      .select(col("len_key"), col("id").as("id_a"), col("name").as("name_a"))
    val b = base.select(col("len").as("len_key"),
      col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, "len_key")
      .filter(col("id_a") < col("id_b"))
      // thresholded levenshtein = banded DP, O(d·n) per pair instead of
      // O(n²), and returns −1 past the bound — the verify is the dominant
      // cost at scale, so the band matters more than the blocking
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
