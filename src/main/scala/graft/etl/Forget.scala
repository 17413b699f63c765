package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Crypto-shredding: the right-to-be-forgotten mechanism that works at
  * 100 TB. Rewriting a petabyte corpus to delete one user's rows is a
  * full-table write per erasure request; crypto-shredding instead
  * encrypts each entity's sensitive columns under a PER-ENTITY key
  * held in a small key table — "forget user X" is then ONE DELETE in
  * the key table (key-table-scale, data files untouched), after which
  * X's ciphertext is permanently undecryptable everywhere, including
  * in backups and downstream copies.
  *
  * Built on the engine's `aes_encrypt`/`aes_decrypt` (codegen'd, no
  * UDF). GCM mode with a random IV per value is the default — IND-CPA,
  * but nondeterministic (same plaintext ⇒ different ciphertext), so
  * encrypted columns cannot serve as join/dedup keys; pass
  * `deterministic = true` to derive a fixed per-row IV from the
  * entity+column (SIV-style determinism: equal plaintexts under the
  * same entity collide — exactly what joinability requires and a
  * DOCUMENTED leak; choose per column).
  *
  * Scale shape: one broadcast-or-hash join against the key table on
  * the entity (key table is |entities|-scale), then narrow codegen'd
  * crypto maps — no shuffle beyond the key join. [[decryptColumns]]
  * left-joins so FORGOTTEN entities survive with null plaintext (the
  * audit trail keeps its rows; the PII is gone), and a `__forgotten`
  * flag distinguishes "erased" from "was null".
  */
object Forget {

  /** Deterministic per-entity 256-bit key material from a master
    * secret — for tests and key-table bootstrap. Production key tables
    * should hold externally generated random keys; this derivation is
    * still sound (HKDF-ish: the key is opaque without the master). */
  def keyTable(entities: DataFrame, entity: Column, masterSecret: String): DataFrame =
    entities.select(entity.as("entity")).distinct()
      .withColumn("key", unhex(sha2(concat(col("entity").cast("string"),
        lit(":" + masterSecret)), 256)))

  /** Encrypt `cols` of `df` under each row's entity key (joined from
    * `keys(entity, key)`); output replaces each column `c` with binary
    * `c` ciphertext. Rows whose entity has NO key row fail loudly
    * (inner join would silently drop them; a missing key at encrypt
    * time is a pipeline bug, not an erasure). */
  def encryptColumns(df: DataFrame, entity: Column, keys: DataFrame,
                     cols: Seq[String], deterministic: Boolean = false): DataFrame = {
    val joined = df.withColumn("__fg_e", entity.cast("string"))
      .join(keys.select(col("entity").cast("string").as("__fg_e"),
        col("key").as("__fg_k")), Seq("__fg_e"), "left")
    val guarded = joined.withColumn("__fg_k",
      when(col("__fg_k").isNull,
        raise_error(concat(lit("Forget.encryptColumns: no key for entity "),
          col("__fg_e")))).otherwise(col("__fg_k")))
    val out = cols.foldLeft(guarded) { (acc, c) =>
      val iv =
        if (deterministic)
          // SIV-style: IV = first 12 bytes of sha2(entity:col:value) —
          // equal plaintexts under one entity encrypt identically
          substring(unhex(sha2(concat(col("__fg_e"), lit(":" + c + ":"),
            col(c).cast("string")), 256)), 1, 12)
        else lit("").cast("binary") // engine draws a random IV
      acc.withColumn(c,
        when(col(c).isNotNull,
          aes_encrypt(col(c).cast("string").cast("binary"), col("__fg_k"),
            lit("GCM"), lit("DEFAULT"), iv, lit("").cast("binary"))))
    }
    out.drop("__fg_e", "__fg_k")
  }

  /** Decrypt `cols` back to strings with a LEFT join on the key table:
    * forgotten entities (no key row) keep their rows with null
    * plaintext and `__forgotten = true` — erasure by key deletion. */
  def decryptColumns(df: DataFrame, entity: Column, keys: DataFrame,
                     cols: Seq[String]): DataFrame = {
    val joined = df.withColumn("__fg_e", entity.cast("string"))
      .join(keys.select(col("entity").cast("string").as("__fg_e"),
        col("key").as("__fg_k")), Seq("__fg_e"), "left")
    val out = cols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c,
        when(col("__fg_k").isNotNull && col(c).isNotNull,
          try_aes_decrypt(col(c), col("__fg_k"), lit("GCM"), lit("DEFAULT"),
            lit("").cast("binary")).cast("string")))
    }
    out.withColumn("__forgotten", col("__fg_k").isNull)
      .drop("__fg_e", "__fg_k")
  }
}
