package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.fic.Favorites

/** Seeding semantics: existence checks, unique constraint, idempotence. */
class FavoritesSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("user seeding keeps existing rows, favorites respect uniqueness and rerun is a no-op") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val current = Seq((1L, "admin@owl.com", "Old Admin Name"))
      .toDF("usuario_id", "correo", "nombre")
    val seeds = Seq(
      (10L, "admin@owl.com", "Administrador OWL"), // exists -> ignored
      (11L, "usuario@owl.com", "Usuario Prueba"),
      (12L, "usuario2@owl.com", "Usuario Prueba 2"))
      .toDF("usuario_id", "correo", "nombre")
    val users = Favorites.seedUsers(current, seeds)
    assert(users.count() == 3)
    // the pre-existing admin row wins (existence check, no overwrite)
    assert(users.filter($"correo" === "admin@owl.com").head().getString(2) == "Old Admin Name")

    val fics = Seq(101L, 102L, 103L, 104L, 105L, 106L, 107L)
      .toDF("fic_id").withColumn("nombre_fic",
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("F"), $"fic_id"))
    val empty = Seq.empty[(Long, Long)].toDF("usuario_id", "fic_id")
    // admin gets all 7, user 11 the first 2, user 12 the first 3
    val favs = Favorites.seedFavorites(empty, fics, Seq((1L, 7), (11L, 2), (12L, 3)))
    assert(favs.count() == 12)

    // rerun: unique constraint -> nothing added
    val again = Favorites.seedFavorites(favs, fics, Seq((1L, 7), (11L, 2), (12L, 3)))
    assert(again.count() == 12)

    val report = Favorites.favoritesReport(favs, fics,
      users.select($"usuario_id", $"correo")).collect()
    assert(report.map(r => r.getLong(0) -> r.getLong(2)).toMap ==
      Map(1L -> 7L, 11L -> 2L, 12L -> 3L))
    assert(report.head.getSeq[String](3).head == "F101")
  }

  test("seed batch dedups within itself on correo — existing rows win") {
    import spark.implicits._
    val current = Seq((1L, "a@owl.com", "A")).toDF("usuario_id", "correo", "nombre")
    val seeds = Seq(
      (10L, "b@owl.com", "B v1"),
      (11L, "b@owl.com", "B v2"), // same correo within the batch
      (12L, "a@owl.com", "A v2")) // collides with current
      .toDF("usuario_id", "correo", "nombre")
    val users = Favorites.seedUsers(current, seeds)
    assert(users.count() == 2, users.collect().mkString(","))
    assert(users.filter($"correo" === "b@owl.com").count() == 1)
    // deterministic first-seed-wins within the batch (lowest usuario_id),
    // matching the reference's sequential existence check — not an
    // arbitrary partition-order survivor
    assert(users.filter($"correo" === "b@owl.com").head().getString(2) == "B v1")
    assert(users.filter($"correo" === "a@owl.com").head().getString(2) == "A")
  }

  test("seedFavorites with no users is a no-op, not an exception") {
    import spark.implicits._
    val favs = Seq((1L, 101L)).toDF("usuario_id", "fic_id")
    val fics = Seq(101L, 102L).toDF("fic_id")
    val out = Favorites.seedFavorites(favs, fics, Seq.empty)
    assert(out.count() == 1)
  }
}
