package graft.fic

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User/favorites seeding surface — the reference's ORM query surface
  * (/root/reference/src/scripts/usuarios_prueba.py, SURVEY U10/F6/J5/L1)
  * as idempotent DataFrame merges:
  *
  *  - users keyed by correo: existing rows win (the existence-check-
  *    before-insert), new ones append;
  *  - favorites keyed by (usuario_id, fic_id): the UNIQUE constraint
  *    (db.py:89) expressed as dropDuplicates + left-anti against the
  *    current state — re-seeding is a no-op;
  *  - the seed set takes the first-k fics by id (the reference's
  *    `limit(count)` sample, L1).
  */
object Favorites {

  /** Merge seed users into the current users table; correo is the key,
    * existing rows are kept untouched.
    */
  def seedUsers(current: DataFrame, seeds: DataFrame): DataFrame = {
    // First-seed-wins within a batch: the reference checks existence
    // sequentially, so the earliest row per correo survives. A bare
    // dropDuplicates keeps an arbitrary (partition-order-dependent) row;
    // rank by usuario_id to pin the deterministic winner.
    val w = Window.partitionBy(col("correo")).orderBy(col("usuario_id"))
    val fresh = seeds
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .join(current.select("correo"), Seq("correo"), "left_anti")
    current.unionByName(fresh)
  }

  /** Favorites for (user, first-k fics) pairs, deduplicated within the
    * batch and against current state — the unique-constraint semantics.
    */
  def seedFavorites(currentFavs: DataFrame, fics: DataFrame,
      userIds: Seq[(Long, Int)]): DataFrame = {
    if (userIds.isEmpty) return currentFavs
    val spark = fics.sparkSession
    import spark.implicits._
    val top = fics.select(col("fic_id")).orderBy(col("fic_id"))
      .limit(userIds.map(_._2).max)
      .collect().map(_.getLong(0))
    val pairs = userIds.flatMap { case (uid, k) =>
      top.take(k).map(fid => (uid, fid))
    }.toDF("usuario_id", "fic_id")
      .dropDuplicates("usuario_id", "fic_id")
    val fresh = pairs.join(currentFavs, Seq("usuario_id", "fic_id"), "left_anti")
    currentFavs.unionByName(fresh)
  }

  /** The verification queries of the reference script: favorites per
    * user joined to fic names (J5 inner join) plus counts (A8).
    */
  def favoritesReport(favs: DataFrame, fics: DataFrame, users: DataFrame): DataFrame = {
    favs
      .join(fics.select(col("fic_id"), col("nombre_fic")), Seq("fic_id"))
      .join(users.select(col("usuario_id"), col("correo")), Seq("usuario_id"))
      .groupBy(col("usuario_id"), col("correo"))
      .agg(count(lit(1)).as("n_favoritos"),
        sort_array(collect_list(col("nombre_fic"))).as("fics"))
      .orderBy(col("usuario_id"))
  }
}
