package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ForgetSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq((1L, "alice@x.com", "Alice"), (2L, "bob@y.org", "Bob"),
    (1L, "alice@x.com", "Alice A.")).toDF("uid", "email", "name")

  test("round trip: encrypt then decrypt restores plaintext; nulls stay null") {
    val withNull = rows.unionAll(
      Seq((3L, null.asInstanceOf[String], "Cara")).toDF("uid", "email", "name"))
    val keys = Forget.keyTable(withNull, col("uid"), "master")
    val enc = Forget.encryptColumns(withNull, col("uid"), keys, Seq("email", "name"))
    // ciphertext is binary and unequal to the plaintext bytes
    assert(enc.schema("email").dataType.typeName === "binary")
    val dec = Forget.decryptColumns(enc, col("uid"), keys, Seq("email", "name"))
      .select("uid", "email", "name", "__forgotten")
      .as[(Long, Option[String], Option[String], Boolean)].collect().toSet
    assert(dec === Set(
      (1L, Some("alice@x.com"), Some("Alice"), false),
      (1L, Some("alice@x.com"), Some("Alice A."), false),
      (2L, Some("bob@y.org"), Some("Bob"), false),
      (3L, None, Some("Cara"), false)))
  }

  test("forgetting = deleting the key row: rows survive, plaintext is gone") {
    val keys = Forget.keyTable(rows, col("uid"), "master")
    val enc = Forget.encryptColumns(rows, col("uid"), keys, Seq("email"))
    val afterErasure = keys.filter(col("entity") =!= 1L) // forget uid 1
    val dec = Forget.decryptColumns(enc, col("uid"), afterErasure, Seq("email"))
      .select("uid", "email", "__forgotten")
      .as[(Long, Option[String], Boolean)].collect().toSet
    assert(dec === Set((1L, None, true), (1L, None, true), (2L, Some("bob@y.org"), false))
      || dec === Set((1L, None, true), (2L, Some("bob@y.org"), false))) // set collapses dups
    assert(dec.exists(r => r._1 == 2L && r._2.contains("bob@y.org")))
    assert(dec.filter(_._1 == 1L).forall(r => r._2.isEmpty && r._3))
  }

  test("default GCM is randomized; deterministic mode makes equal plaintexts joinable") {
    val keys = Forget.keyTable(rows, col("uid"), "master")
    val rnd = Forget.encryptColumns(rows, col("uid"), keys, Seq("email"))
      .filter(col("uid") === 1L).select("email").as[Array[Byte]].collect()
    assert(!java.util.Arrays.equals(rnd(0), rnd(1)),
      "random-IV GCM must not repeat ciphertext")
    val det = Forget.encryptColumns(rows, col("uid"), keys, Seq("email"),
        deterministic = true)
      .filter(col("uid") === 1L).select("email").as[Array[Byte]].collect()
    assert(java.util.Arrays.equals(det(0), det(1)),
      "deterministic mode must make equal plaintexts collide")
    // and still decrypts
    val dec = Forget.decryptColumns(
        Forget.encryptColumns(rows, col("uid"), keys, Seq("email"), deterministic = true),
        col("uid"), keys, Seq("email"))
      .select("email").as[Option[String]].collect().flatten.toSet
    assert(dec === Set("alice@x.com", "bob@y.org"))
  }

  test("encrypting an entity with no key row fails loudly, never drops the row") {
    val keys = Forget.keyTable(rows.filter(col("uid") === 1L), col("uid"), "m")
    val e = intercept[Exception] {
      Forget.encryptColumns(rows, col("uid"), keys, Seq("email")).collect()
    }
    assert(e.getMessage != null)
  }
}
