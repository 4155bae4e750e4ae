package graft

import graft.operators.{DeltaStore, MorTable}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** MorTable: LSM merge-on-read last-write-wins table — fold order
  * across batches, replay idempotence, compaction covering rules, and
  * bucket-pruned point lookups. */
class MorTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft_mor_").toString

  private def mor(root: String, manifest: Boolean = false) =
    MorTable(DeltaStore(root, buckets = 8, manifest = manifest), Seq("k"))

  private def rows(df: DataFrame): Seq[(String, Int)] =
    df.select("k", "v").as[(String, Int)].collect().sorted.toSeq

  private val schema = Seq(("x", 0)).toDF("k", "v").schema

  test("later batches win per key; untouched keys survive") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 1), ("b", 1), ("c", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("b", 2)).toDF("k", "v"), 1)
    t.upsert(Seq(("a", 3), ("d", 3)).toDF("k", "v"), 2)
    assert(rows(t.snapshot(spark, schema)) ==
      Seq(("a", 3), ("b", 2), ("c", 1), ("d", 3)))
  }

  test("re-upserting a batch id replaces its own delta (replay idempotence)") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    val before = rows(t.snapshot(spark, schema))
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1) // checkpoint replay of batch 1
    assert(rows(t.snapshot(spark, schema)) == before)
    assert(before == Seq(("a", 2), ("b", 1)))
  }

  test("compaction preserves the snapshot and later deltas outrank the base") {
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    val before = rows(t.snapshot(spark, schema))
    t.compact(spark, schema)
    // deltas folded away: exactly one live base dir remains
    val names = new java.io.File(root).listFiles().map(_.getName).toSeq
    assert(names.count(_.startsWith("base=")) == 1)
    assert(!names.exists(_.startsWith("delta=")))
    assert(rows(t.snapshot(spark, schema)) == before)
    t.upsert(Seq(("a", 9)).toDF("k", "v"), 2)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 9), ("b", 1)))
  }

  test("lookup equals the snapshot restricted to the probe keys") {
    val t = mor(tmp())
    t.upsert((1 to 100).map(i => (s"k$i", i)).toDF("k", "v"), 0)
    t.upsert(Seq(("k7", 700)).toDF("k", "v"), 1)
    val probe = Seq("k7", "k42", "nope").toDF("k")
    assert(rows(t.lookup(spark, schema, probe)) ==
      Seq(("k42", 42), ("k7", 700)))
  }

  test("snapshotAsOf time-travels back to the last compact, not past it") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    t.upsert(Seq(("b", 3)).toDF("k", "v"), 2)
    assert(rows(t.snapshotAsOf(spark, schema, 1)) == Seq(("a", 2), ("b", 1)))
    assert(rows(t.snapshotAsOf(spark, schema, 0)) == Seq(("a", 1), ("b", 1)))
    t.compact(spark, schema) // folds through batch 2: history below is gone
    assert(rows(t.snapshotAsOf(spark, schema, 2)) == Seq(("a", 2), ("b", 3)))
    intercept[IllegalArgumentException] {
      t.snapshotAsOf(spark, schema, 1).collect()
    }
  }

  test("delete tombstones hide keys now, time travel still sees them, compaction removes the bytes") {
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.delete(Seq("a").toDF("k"), 1, schema)
    assert(rows(t.snapshot(spark, schema)) == Seq(("b", 1)))
    assert(rows(t.snapshotAsOf(spark, schema, 0)) == Seq(("a", 1), ("b", 1)))
    // a later upsert resurrects the key
    t.upsert(Seq(("a", 5)).toDF("k", "v"), 2)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 5), ("b", 1)))
    // delete again, then compact: the key's bytes physically leave storage
    t.delete(Seq("a").toDF("k"), 3, schema)
    t.compact(spark, schema)
    assert(rows(t.snapshot(spark, schema)) == Seq(("b", 1)))
    assert(spark.read.parquet(root + "/base=3")
      .where($"k" === "a").count() == 0, "no tombstone or version of 'a' survives compaction")
  }

  test("streaming sink drains, resumes with new data, and late batches win") {
    val root = tmp()
    val in = root + "/in"
    val t = mor(root + "/tbl")
    Seq(("a", 1), ("b", 1)).toDF("k", "v").write.parquet(in)
    val stream = () => spark.readStream.schema(schema).parquet(in)
    val q1 = t.sink(stream(), root + "/ckpt")
    q1.awaitTermination(120000)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 1), ("b", 1)))
    // second drain from the SAME checkpoint: only the new file, next batch id
    Seq(("a", 9), ("c", 9)).toDF("k", "v").write.mode("append").parquet(in)
    val q2 = t.sink(stream(), root + "/ckpt")
    q2.awaitTermination(120000)
    assert(rows(t.snapshot(spark, schema)) ==
      Seq(("a", 9), ("b", 1), ("c", 9)))
  }

  test("sink auto-compacts every n batches and the folded state stays right") {
    val root = tmp()
    val in = root + "/in"
    val tbl = root + "/tbl"
    val t = mor(tbl)
    Seq(("a", 1)).toDF("k", "v").write.parquet(in)
    val stream = () => spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(in)
    t.sink(stream(), root + "/ckpt", compactEvery = Some(2))
      .awaitTermination(120000)
    Seq(("b", 2)).toDF("k", "v").write.mode("append").parquet(in)
    Seq(("a", 3)).toDF("k", "v").write.mode("append").parquet(in)
    t.sink(stream(), root + "/ckpt", compactEvery = Some(2))
      .awaitTermination(120000)
    // batches 0,1,2 ran; compact fired after batch 1 → base=1 + delta=2
    val names = new java.io.File(tbl).listFiles().map(_.getName).toSet
    assert(names.contains("base=1"), s"expected base=1 in $names")
    assert(!names.contains("delta=0") && !names.contains("delta=1"), names.toString)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 3), ("b", 2)))
  }

  test("manifest protocol: same LWW/compact/as-of/replay semantics, zero renames of data") {
    val root = tmp()
    val t = mor(root, manifest = true)
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 2), ("b", 1)))
    assert(rows(t.snapshotAsOf(spark, schema, 0)) == Seq(("a", 1), ("b", 1)))
    // replay of batch 1 replaces its manifest entry (new epoch prefix)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 2), ("b", 1)))
    t.compact(spark, schema)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 2), ("b", 1)))
    // a replayed delta at/below the base id is ignored by the covering rule
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    t.upsert(Seq(("b", 9)).toDF("k", "v"), 2)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 2), ("b", 9)))
    // layout is pointer + manifests + data prefixes — no delta=/base= dirs
    val names = new java.io.File(root).listFiles().map(_.getName).toSet
    assert(names.contains("_current") && names.contains("data"), names.toString)
    assert(!names.exists(n => n.startsWith("delta=") || n.startsWith("base=")))
  }

  test("manifest protocol: unreferenced prefixes are invisible and GC'd by heal") {
    val root = tmp()
    val t = mor(root, manifest = true)
    t.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    // simulate a crash mid-append: a data prefix written but never committed
    val orphan = new java.io.File(root, "data/d9_e99/gbucket=0")
    orphan.mkdirs()
    Seq(("zz", 666)).toDF("k", "v").write.mode("overwrite")
      .parquet(orphan.getPath)
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 1)), "orphan invisible")
    t.store.heal()
    assert(!new java.io.File(root, "data/d9_e99").exists(), "orphan GC'd")
    assert(rows(t.snapshot(spark, schema)) == Seq(("a", 1)))
  }

  test("schema evolution: a column added in later deltas null-fills older ones") {
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    val wide = Seq(("b", 2, "x")).toDF("k", "v", "w")
    t.upsert(wide, 1)
    val got = t.snapshot(spark, wide.schema)
      .select("k", "v", "w").as[(String, Int, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(("a", 1, None), ("b", 2, Some("x"))))
    // as-of reads stay correct across the schema boundary, in both
    // directions: the wide schema over pre-widening history null-fills,
    // and the fold still orders by batch
    val asOf0 = t.snapshotAsOf(spark, wide.schema, 0)
      .select("k", "v", "w").as[(String, Int, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(asOf0 == Seq(("a", 1, None), ("b", 1, None)))
    // compaction folds across the boundary under the wide schema
    t.compact(spark, wide.schema)
    val folded = t.snapshot(spark, wide.schema)
      .select("k", "v", "w").as[(String, Int, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(folded == got)
  }

  test("schema evolution: SAFE WIDENING (int->long, decimal precision growth) is exact across the boundary") {
    import org.apache.spark.sql.types._
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1), ("b", 2)).toDF("k", "v"), 0) // v: int
    val wide = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    // batch 1 writes under the widened schema, with a value only the
    // wide type can hold
    t.upsert(Seq(("b", 3L), ("c", 9000000000L)).toDF("k", "v"), 1)
    def snap() = t.snapshot(spark, wide)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(snap() == Seq(("a", 1L), ("b", 3L), ("c", 9000000000L)),
      "int history must read exactly under the widened long schema")
    // as-of back across the widening boundary
    val asOf0 = t.snapshotAsOf(spark, wide, 0)
      .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(asOf0 == Seq(("a", 1L), ("b", 2L)))
    // compaction folds mixed-width history under the wide schema
    t.compact(spark, wide)
    assert(snap() == Seq(("a", 1L), ("b", 3L), ("c", 9000000000L)))

    // decimal precision growth: decimal(5,2) history under decimal(9,2)
    val root2 = tmp()
    val t2 = mor(root2)
    val d52 = Seq(("a", BigDecimal("123.45"))).toDF("k", "v")
      .select($"k", $"v".cast(DecimalType(5, 2)).as("v"))
    t2.upsert(d52, 0)
    val wideDec = StructType(Seq(
      StructField("k", StringType), StructField("v", DecimalType(9, 2))))
    val d92 = Seq(("b", BigDecimal("1234567.89"))).toDF("k", "v")
      .select($"k", $"v".cast(DecimalType(9, 2)).as("v"))
    t2.upsert(d92, 1)
    val got2 = t2.snapshot(spark, wideDec)
      .as[(String, BigDecimal)].collect().sortBy(_._1).toSeq
    assert(got2 == Seq(("a", BigDecimal("123.45")), ("b", BigDecimal("1234567.89"))),
      "decimal(5,2) history must read exactly under decimal(9,2)")
  }

  test("schema evolution rejects NARROWING loudly (long history under an int schema)") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 9000000000L)).toDF("k", "v"), 0) // v: long
    val narrow = Seq(("x", 0)).toDF("k", "v").schema    // v: int
    intercept[Exception] {
      t.snapshot(spark, narrow).collect()
    }
  }

  test("schema evolution rejects TYPE changes loudly at scan time (no silent coercion)") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    // reading the int column under a string schema must throw when the
    // rows are actually materialized — never silently coerce
    val retyped = Seq(("x", "s")).toDF("k", "v").schema
    intercept[Exception] {
      t.snapshot(spark, retyped).collect()
    }
  }

  test("sink with orderCol keeps the highest-version row when a micro-batch carries several versions of a key") {
    val root = tmp()
    val in = root + "/in"
    val t = MorTable(DeltaStore(root + "/tbl", buckets = 8), Seq("k"))
    // one file → one micro-batch holding THREE versions of key "a"
    val vschema = Seq(("x", 0, 0L)).toDF("k", "v", "ver").schema
    Seq(("a", 10, 1L), ("a", 30, 3L), ("a", 20, 2L), ("b", 1, 1L))
      .toDF("k", "v", "ver").write.parquet(in)
    t.sink(spark.readStream.schema(vschema).parquet(in), root + "/ckpt",
        orderCol = Some("ver"))
      .awaitTermination(120000)
    val got = t.snapshot(spark, vschema)
      .select("k", "v").as[(String, Int)].collect().sorted.toSeq
    assert(got == Seq(("a", 30), ("b", 1)),
      "the highest-ver row must win within the micro-batch")
  }

  test("opening a store under the wrong commit protocol fails loudly instead of reading empty") {
    val root = tmp()
    val t = mor(root) // rename protocol
    t.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    intercept[IllegalArgumentException] {
      mor(root, manifest = true).snapshot(spark, schema).collect()
    }
    val root2 = tmp()
    val t2 = mor(root2, manifest = true)
    t2.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    intercept[IllegalArgumentException] {
      mor(root2).snapshot(spark, schema).collect()
    }
    // DeltaStore.open detects the protocol either way
    assert(!DeltaStore.open(root).manifest && DeltaStore.open(root2).manifest)
    assert(MorTable(DeltaStore.open(root), Seq("k"))
      .snapshot(spark, schema).count() == 1)
    assert(MorTable(DeltaStore.open(root2), Seq("k"))
      .snapshot(spark, schema).count() == 1)
  }

  test("bloom sidecars skip deltas that cannot contain a probe key, without changing any result") {
    val root = tmp()
    val t = MorTable(DeltaStore(root, buckets = 8), Seq("k"),
      bloomItems = Some(1000L))
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("c", 2)).toDF("k", "v"), 1)
    t.upsert(Seq(("d", 3)).toDF("k", "v"), 2)
    t.delete(Seq("a").toDF("k"), 3, schema)
    // probing d keeps its own delta and drops the c-only delta
    // (xxhash64 and the bloom are deterministic, so this is a fixed
    // outcome, not a flaky 1%-fpp draw)
    val keptD = t.bloomLiveEntries(Seq("d").toDF("k"))
    assert(keptD.exists(e => !e._1 && e._2 == 2))
    assert(!keptD.exists(e => !e._1 && e._2 == 1),
      s"the c-only delta cannot contain 'd': $keptD")
    // a probe for a DELETED key must keep the tombstone delta — a
    // skipped tombstone would resurrect the old version
    val keptA = t.bloomLiveEntries(Seq("a").toDF("k"))
    assert(keptA.exists(e => !e._1 && e._2 == 3))
    assert(t.lookup(spark, schema, Seq("a").toDF("k")).count() == 0,
      "delta skipping must not hide the delete")
    // identical results to the same store read without blooms
    val plain = MorTable(DeltaStore(root, buckets = 8), Seq("k"))
    val probe = Seq("a", "b", "c", "d", "nope").toDF("k")
    assert(rows(t.lookup(spark, schema, probe)) ==
      rows(plain.lookup(spark, schema, probe)))
    // after compaction the base (no bloom) is always read
    t.compact(spark, schema)
    assert(rows(t.lookup(spark, schema, probe)) ==
      Seq(("b", 1), ("c", 2), ("d", 3)))
  }

  test("change feed labels inserts/updates/deletes between two batches and skips no-op rewrites") {
    val t = mor(tmp())
    t.upsert(Seq(("a", 1), ("b", 1), ("c", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("b", 2)).toDF("k", "v"), 1)
    t.delete(Seq("c").toDF("k"), 2, schema)
    // batch 3 re-upserts "a" with the SAME value — touched but unchanged
    t.upsert(Seq(("a", 1), ("d", 4)).toDF("k", "v"), 3)
    def feed(from: Int, to: Int): Seq[(String, String, Option[Int])] =
      t.changes(spark, schema, from, to)
        .select("k", "op", "v").as[(String, String, Option[Int])]
        .collect().sortBy(_._1).toSeq
    assert(feed(0, 3) == Seq(
      ("b", "update", Some(2)),
      ("c", "delete", Some(1)),
      ("d", "insert", Some(4))),
      "b updated, c deleted with its OLD value, d inserted; a's " +
        "same-value re-upsert must not appear")
    assert(feed(2, 3) == Seq(("d", "insert", Some(4))),
      "a's same-value rewrite is not a change")
    assert(feed(3, 3).isEmpty, "an empty range is an empty feed")
    // a key inserted AND deleted inside the range nets to nothing
    t.upsert(Seq(("e", 9)).toDF("k", "v"), 4)
    t.delete(Seq("e").toDF("k"), 5, schema)
    assert(feed(3, 5).isEmpty)
  }

  test("exportSnapshot hands off a plain-parquet snapshot with provenance, current and as-of") {
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1), ("b", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("a", 2)).toDF("k", "v"), 1)
    t.delete(Seq("b").toDF("k"), 2, schema)
    // current export: readable WITHOUT the library, fold already paid
    t.exportSnapshot(spark, schema, root + "/exp")
    val plain = spark.read.parquet(root + "/exp")
      .select("k", "v").as[(String, Int)].collect().sorted.toSeq
    assert(plain == Seq(("a", 2)))
    val prov = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(root + "/exp", "_PROVENANCE").toPath))
    assert(prov.contains("asOfBatch=2") && prov.contains("keys=k"), prov)
    // as-of export pins the pre-delete horizon
    t.exportSnapshot(spark, schema, root + "/exp1", asOf = Some(1))
    assert(spark.read.parquet(root + "/exp1")
      .select("k", "v").as[(String, Int)].collect().sorted.toSeq ==
      Seq(("a", 2), ("b", 1)))
    // partitioned layout for downstream pruning
    t.exportSnapshot(spark, schema, root + "/expp", partitionCols = Seq("k"))
    assert(new java.io.File(root + "/expp").listFiles()
      .exists(_.getName == "k=a"))
  }

  test("rename-protocol compact GCs replayed deltas already covered by an older base") {
    val root = tmp()
    val t = mor(root)
    t.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("b", 2)).toDF("k", "v"), 1)
    t.compact(spark, schema) // base=1
    // checkpoint replay of batch 0 after the compact: covered, dead bytes
    t.upsert(Seq(("a", 1)).toDF("k", "v"), 0)
    t.upsert(Seq(("c", 3)).toDF("k", "v"), 2)
    t.compact(spark, schema) // base=2 — must also GC the dead delta=0
    val names = new java.io.File(root).listFiles()
      .map(_.getName).filter(n => n.startsWith("delta=") || n.startsWith("base=")).toSeq
    assert(names.sorted == Seq("base=2"), names.toString)
    assert(rows(t.snapshot(spark, schema)) ==
      Seq(("a", 1), ("b", 2), ("c", 3)))
  }
}
