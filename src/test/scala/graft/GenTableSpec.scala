package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.GenTable

/** The one crash-safety protocol (r12 unification): generation dirs +
  * marker commits. Crash windows are reconstructed on disk exactly as an
  * interrupted writer would leave them; every test's invariant is that a
  * reader sees the LAST COMMITTED generation — never a missing or
  * half-written table. */
class GenTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String = java.nio.file.Files.createTempDirectory("graft_gt").toString

  test("replace commits generations; read resolves the latest; GC retires the old") {
    val root = s"${tmp()}/t"
    assert(GenTable.read(spark, root).isEmpty && !GenTable.exists(spark, root))
    GenTable.replace(spark, root, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(GenTable.read(spark, root).get.count() == 2)
    val n2 = GenTable.replace(spark, root, Seq((1L, "a2")).toDF("id", "v"))
    assert(n2 == 2L)
    assert(GenTable.read(spark, root).get.collect().map(_.getString(1)).toSeq == Seq("a2"))
    val gens = new java.io.File(root).listFiles().map(_.getName).filter(_.startsWith("gen-"))
    assert(gens.toSeq == Seq("gen-2"), s"superseded generation GC'd, got ${gens.toSeq}")
    val markers = new java.io.File(s"$root/_commits").listFiles()
      .map(_.getName).filter(_.forall(_.isDigit))
    assert(markers.toSeq == Seq("2"), s"superseded marker GC'd, got ${markers.toSeq}")
  }

  test("crash AFTER the generation write but BEFORE the marker publish: old table stays live") {
    val root = s"${tmp()}/t"
    GenTable.replace(spark, root, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"))
    // an interrupted writer: gen-2 fully written, marker never published
    Seq((9L, 99L)).toDF("id", "v").write.parquet(s"$root/gen-2")
    assert(GenTable.read(spark, root).get.agg(sum("v")).head().getLong(0) == 30L,
      "reader must resolve the committed generation, not the orphan")
    // the retried commit reuses the number, clearing the debris first
    GenTable.replace(spark, root, Seq((3L, 30L)).toDF("id", "v"))
    assert(GenTable.read(spark, root).get.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("crash DURING the generation write (half-written dir, no marker): old table stays live") {
    val root = s"${tmp()}/t"
    GenTable.replace(spark, root, Seq((1L, "keep")).toDF("id", "v"))
    // half-written: a directory with a stray non-parquet temp file only
    val debris = new java.io.File(s"$root/gen-2"); debris.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/gen-2/_temporary"),
      "junk".getBytes)
    assert(GenTable.read(spark, root).get.head().getString(1) == "keep")
  }

  test("a marker naming a vanished generation falls back to the previous committed one") {
    val root = s"${tmp()}/t"
    GenTable.replace(spark, root, Seq((1L, "old")).toDF("id", "v"))
    // forge a marker for a generation whose directory is gone (interrupted
    // GC of a corrupted store) — markers are tiny text files
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$root/_commits/2"),
      "gen-2".getBytes)
    assert(GenTable.read(spark, root).get.head().getString(1) == "old")
    // and the next commit heals past it (3 > the dangling 2)
    GenTable.replace(spark, root, Seq((1L, "new")).toDF("id", "v"))
    assert(GenTable.read(spark, root).get.head().getString(1) == "new")
  }

  test("compact collapses a many-file generation without changing rows; crash mid-compact is safe") {
    val root = s"${tmp()}/t"
    val df = (0L until 2000L).map(i => (i, s"payload-$i")).toDF("id", "v")
    GenTable.replace(spark, root, df.repartition(64))
    val genOf: () => java.io.File = () => new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("gen-")).head
    val before = genOf().listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"fixture should start fragmented, had $before files")
    GenTable.compact(spark, root, targetBytes = 1L << 20)
    val after = genOf().listFiles().count(_.getName.endsWith(".parquet"))
    assert(after < before && after >= 1)
    val back = GenTable.read(spark, root).get
    assert(back.count() == 2000)
    assert(back.agg(sum("id")).head().getLong(0) == (0L until 2000L).sum)
    // crash mid-compact replay: write compacted gen, never publish — the
    // live table is still the pre-compact generation
    val liveSum = 1999L * 2000L / 2
    GenTable.read(spark, root).get.repartition(1).write.parquet(s"$root/gen-99")
    // marker 3 is the live one (gen-3 after replace+compact); gen-99 is orphan
    assert(GenTable.read(spark, root).get.agg(sum("id")).head().getLong(0) == liveSum)
  }

  test("compact refuses hive-partitioned generations instead of flattening them") {
    val root = s"${tmp()}/t"
    GenTable.commit(spark, root) { dir =>
      Seq((1L, "a"), (2L, "b")).toDF("id", "part")
        .write.partitionBy("part").parquet(dir)
    }
    val e = intercept[IllegalArgumentException] { GenTable.compact(spark, root) }
    assert(e.getMessage.contains("hive-partitioned"))
  }

  test("rootFor rejects path-unsafe names and keys stable per-name roots") {
    intercept[IllegalArgumentException] { GenTable.rootFor(spark, "../evil") }
    val r = GenTable.rootFor(spark, "graft_state_x")
    assert(r == GenTable.rootFor(spark, "graft_state_x") && r.contains("genstore"))
  }

  test("retention + time travel: keep=2 retains history, readGeneration replays it, keep=1 stays lean") {
    val root = s"${tmp()}/tt"
    def v(n: Int) = (1 to n).map(i => (i.toLong, s"v$n")).toDF("id", "tag")
    val g1 = GenTable.replace(spark, root, v(1), keep = 2)
    val g2 = GenTable.replace(spark, root, v(2), keep = 2)
    val g3 = GenTable.replace(spark, root, v(3), keep = 2)
    // live = newest; history = newest 2 only
    assert(GenTable.read(spark, root).get.count() == 3)
    assert(GenTable.generations(spark, root).map(_._1) == Seq(g3, g2))
    assert(GenTable.readGeneration(spark, root, g2)
      .collect().map(_.getString(1)).forall(_ == "v2"))
    val err = intercept[IllegalArgumentException](
      GenTable.readGeneration(spark, root, g1))
    assert(err.getMessage.contains("not retained"))
    // default keep=1 collapses history back to the live generation
    val g4 = GenTable.replace(spark, root, v(4))
    assert(GenTable.generations(spark, root).map(_._1) == Seq(g4))
    assert(GenTable.read(spark, root).get.count() == 4)
    intercept[IllegalArgumentException](GenTable.readGeneration(spark, root, g3))
    // retention must keep at least the live generation
    intercept[IllegalArgumentException](GenTable.replace(spark, root, v(1), keep = 0))
  }

  test("reader during commit: probes mid-write see only FULL generations; retained readers survive the swap") {
    // the sketch_growth oracle row rides readGeneration exactness, so the
    // concurrent window matters: while generation N+1 is half-written on
    // disk and again right after its publish retires N-k, every read
    // surface (read / currentGen / readGeneration) must resolve a COMPLETE
    // generation — never the in-flight directory, never a half table.
    val root = s"${tmp()}/chaos"
    def v(n: Int) = (1 to n).map(i => (i.toLong, s"v$n")).toDF("id", "tag")
    val g1 = GenTable.replace(spark, root, v(10), keep = 2)
    val g2 = GenTable.replace(spark, root, v(20), keep = 2) // retained: {g1, g2}
    // a reader that resolved generation g2 BEFORE the next commit: its
    // files must survive the swap (keep=2 retention window)
    val preResolved = GenTable.readGeneration(spark, root, g2)
    val g3 = GenTable.commit(spark, root, keep = 2) { dir =>
      // half-written new generation on disk (real parquet, half the rows)
      v(30).limit(15).write.mode("append").parquet(dir)
      // probe the live surfaces MID-WRITE: still generation g2, complete
      assert(GenTable.currentGen(spark, root).get._1 == g2)
      assert(GenTable.read(spark, root).get.count() == 20)
      assert(GenTable.read(spark, root).get.collect().map(_.getString(1)).forall(_ == "v20"))
      // time travel to the generation about to be retired still works
      assert(GenTable.readGeneration(spark, root, g1).count() == 10)
      // the in-flight dir is invisible to the generation listing
      assert(GenTable.generations(spark, root).map(_._1) == Seq(g2, g1))
      // second half lands; only the marker publish (after this callback
      // returns) makes any of it visible
      v(30).except(v(30).limit(15)).write.mode("append").parquet(dir)
    }
    // after publish: g3 live and complete, g2 retained, g1 retired
    assert(GenTable.read(spark, root).get.count() == 30)
    assert(GenTable.generations(spark, root).map(_._1) == Seq(g3, g2))
    assert(preResolved.count() == 20, "retained-generation reader lost files mid-swap")
    val err = intercept[IllegalArgumentException](GenTable.readGeneration(spark, root, g1))
    assert(err.getMessage.contains("not retained"))
  }
}
