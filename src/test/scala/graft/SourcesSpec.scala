package graft

import java.nio.file.{Files, Paths}
import graft.corpus.{Corpus, Queries, Synth}
import graft.index.Builder

/** Sources/sinks + index equality (SURVEY §2.1 S2/S3/S5, §2.2 B12). */
class SourcesSpec extends SparkTestBase {

  test("JSONL reader produces the CodeDoc schema and round-trips") {
    val dir = tmpDir("jsonl")
    val f = Paths.get(dir, "corpus.jsonl")
    Files.writeString(f,
      """{"repo":"r1","path":"a/b.py","commit":"abc12345","lang":"py","content":"def foo(): return 1"}
        |{"repo":"r2","path":"c/d.c","commit":"def67890","lang":"c","content":"int main() { return 0; }"}
        |""".stripMargin)
    val df = Corpus.fromJsonl(spark, f.toString)
    assert(df.columns.toSeq == Seq("repo", "path", "commit", "lang", "content"))
    assert(df.count() == 2)
    // write (S2) and read back identical
    val out = tmpDir("corpus-out")
    Corpus.write(df, out)
    val back = spark.read.parquet(out)
    assert(back.except(df).count() == 0 && df.except(back).count() == 0)
  }

  test("query file reader honors the sentinel and skips blanks") {
    val f = Paths.get(tmpDir("ginq"), "q.txt")
    Files.writeString(f, "spark merge\n\nwindow\nexit();\nnever seen\n")
    val qs = Queries.fromFile(spark, f.toString)
    assert(qs.map(_.text) == Seq("spark merge", "window"))
    assert(qs.map(_.query_id) == Seq(1L, 2L))
  }

  test("indexEqual: true across layouts, false across corpora") {
    val corpus = Synth.corpus(spark, 150, seed = 11L).cache()
    val a = tmpDir("eq-a"); val b = tmpDir("eq-b"); val c = tmpDir("eq-c")
    Builder.build(spark, corpus, a,
      Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 2, saltTarget = 40))
    // different physical layout, same logical content
    Builder.build(spark, corpus, b,
      Builder.Config(blockSize = 64, nBuckets = 4, nSegments = 1, saltTarget = 1000))
    assert(Builder.indexEqual(spark, a, b))
    // different corpus -> not equal
    Builder.build(spark, Synth.corpus(spark, 151, seed = 11L), c,
      Builder.Config(blockSize = 16, nBuckets = 8, nSegments = 2, saltTarget = 40))
    assert(!Builder.indexEqual(spark, a, c))
  }

  test("renameOrHealed: tolerates a lost benign race, throws on real failure") {
    import graft.util.Fs
    val d = tmpDir("fs-heal")
    // benign race shape: the winner already moved the source to the
    // destination (source gone, destination present) -> no throw
    Fs.write(spark, s"$d/dest/marker", "x")
    Fs.renameOrHealed(spark, s"$d/gone", s"$d/dest")
    // real failure: rename rejected AND destination absent -> throw
    intercept[IllegalArgumentException] {
      Fs.renameOrHealed(spark, s"$d/gone", s"$d/never_created")
    }
  }
}
